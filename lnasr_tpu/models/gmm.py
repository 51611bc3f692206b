"""Standalone Gaussian mixture model with EM fitting.

The reference exposes only pdf evaluators (``lnasr/gmm.py``); its mixture
*fitting* exists solely inside the GMM-HMM. This class covers the
BASELINE "diagonal GMM log-likelihood eval + EM fit" configuration as a
first-class model: batched diagonal (or full) covariance EM, jitted per
iteration, with k-means++-style seeding and the same starvation guard as
the GMM-HMM.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from lnasr_tpu.ops.gaussian import (
    diag_components_logpdf,
    gmm_emissions_full,
)
from lnasr_tpu.ops.numerics import logsumexp


class GMMParams(NamedTuple):
    log_w: jax.Array  # (M,)
    mu: jax.Array  # (M, D)
    cov: jax.Array  # (M, D) diag variances or (M, D, D)


def _component_logpdf(params: GMMParams, x: jax.Array, cov_type: str) -> jax.Array:
    """(T, M) per-component log-densities."""
    if cov_type == "diag":
        return diag_components_logpdf(x, params.mu, params.cov)
    _, log_bm = gmm_emissions_full(
        x, params.log_w[None, :], params.mu[None], params.cov[None]
    )
    return log_bm[:, 0, :]


@functools.partial(jax.jit, static_argnames=("cov_type", "var_floor"))
def gmm_em_step(
    params: GMMParams, x: jax.Array, cov_type: str = "diag",
    var_floor: float = 1e-4,
) -> Tuple[GMMParams, jax.Array]:
    """One EM sweep over ``x (T, D)``; returns (params, loglik-before)."""
    comp = _component_logpdf(params, x, cov_type)  # (T, M)
    joint = params.log_w[None, :] + comp
    norm = logsumexp(joint, axis=1, keepdims=True)
    loglik = jnp.sum(norm)
    resp = jnp.exp(joint - norm)  # (T, M), rows sum to 1

    occ = jnp.sum(resp, axis=0)  # (M,)
    tiny = jnp.asarray(jnp.finfo(occ.dtype).tiny, occ.dtype)
    starved = occ < 1e-3
    denom = jnp.maximum(occ, tiny)[:, None]
    mu = resp.T @ x / denom
    if cov_type == "diag":
        second = resp.T @ (x * x) / denom
        cov = jnp.maximum(second - mu * mu, var_floor)
        cov = jnp.where(starved[:, None], params.cov, cov)
    else:
        xc = x[:, None, :] - mu[None]  # (T, M, D)
        cov = jnp.einsum("tm,tmd,tme->mde", resp, xc, xc) / denom[..., None]
        d = mu.shape[-1]
        cov = cov + var_floor * jnp.eye(d, dtype=mu.dtype)
        cov = jnp.where(starved[:, None, None], params.cov, cov)
    mu = jnp.where(starved[:, None], params.mu, mu)
    log_w = jnp.log(jnp.maximum(occ / occ.sum(), tiny))
    return GMMParams(log_w=log_w, mu=mu, cov=cov), loglik


class GMM:
    """Mixture model: ``fit`` (EM), ``logpdf``, ``predict`` (hard
    assignment), ``score`` (mean log-likelihood), HDF5 persistence."""

    def __init__(self, n_mix: int, dim: int, cov_type: str = "diag",
                 var_floor: float = 1e-4, dtype=jnp.float32):
        self.m = n_mix
        self.d = dim
        self.cov_type = cov_type
        self.var_floor = var_floor
        self.dtype = dtype
        self.log_w: Optional[jax.Array] = None
        self.mu: Optional[jax.Array] = None
        self.cov: Optional[jax.Array] = None

    @property
    def params(self) -> GMMParams:
        return GMMParams(self.log_w, self.mu, self.cov)

    def init_from_data(self, x, key: Optional[jax.Array] = None) -> "GMM":
        """Seed means from random data points, variances from the global
        variance, uniform weights."""
        if key is None:
            key = jax.random.PRNGKey(0)
        x = jnp.asarray(x, self.dtype)
        idx = jax.random.choice(key, x.shape[0], (self.m,),
                                replace=x.shape[0] < self.m)
        self.mu = x[idx]
        var = jnp.maximum(jnp.var(x, axis=0), self.var_floor)
        if self.cov_type == "diag":
            self.cov = jnp.broadcast_to(var, (self.m, self.d)).astype(self.dtype)
        else:
            self.cov = jnp.broadcast_to(jnp.diag(var), (self.m, self.d, self.d)).astype(self.dtype)
        self.log_w = jnp.full((self.m,), -np.log(self.m), self.dtype)
        return self

    def fit(self, x, iters: int = 50, eps: float = 1e-4,
            key: Optional[jax.Array] = None, verbose: bool = False):
        x = jnp.asarray(x, self.dtype)
        if self.mu is None:
            self.init_from_data(x, key)
        params = self.params
        history = []
        prev = None
        for it in range(iters):
            params, loglik = gmm_em_step(params, x, self.cov_type, self.var_floor)
            loglik = float(loglik)
            history.append(loglik)
            if verbose:
                print(f"iter {it:3}: loglik {loglik:.6e}")
            if prev is not None and abs(loglik - prev) < eps:
                break
            prev = loglik
        self.log_w, self.mu, self.cov = params
        return history

    def logpdf(self, x) -> jax.Array:
        """(T,) mixture log-density."""
        x = jnp.asarray(x, self.dtype)
        comp = _component_logpdf(self.params, x, self.cov_type)
        return logsumexp(self.log_w[None, :] + comp, axis=1)

    def score(self, x) -> float:
        return float(jnp.mean(self.logpdf(x)))

    def predict(self, x) -> jax.Array:
        """(T,) most-responsible component per sample."""
        x = jnp.asarray(x, self.dtype)
        comp = _component_logpdf(self.params, x, self.cov_type)
        return jnp.argmax(self.log_w[None, :] + comp, axis=1)

    def save(self, filename: str) -> None:
        with h5py.File(filename, "w") as f:
            f.create_dataset("w", data=np.asarray(self.log_w, np.float64))
            f.create_dataset("mu", data=np.asarray(self.mu, np.float64))
            f.create_dataset("cov", data=np.asarray(self.cov, np.float64))
            f.attrs["cov_type"] = self.cov_type

    def load(self, filename: str) -> "GMM":
        with h5py.File(filename, "r") as f:
            self.log_w = jnp.asarray(f["w"][...], self.dtype)
            self.mu = jnp.asarray(f["mu"][...], self.dtype)
            self.cov = jnp.asarray(f["cov"][...], self.dtype)
            self.cov_type = f.attrs.get("cov_type", self.cov_type)
        self.m, self.d = self.mu.shape
        return self
