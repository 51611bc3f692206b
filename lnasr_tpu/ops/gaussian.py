"""Gaussian and Gaussian-mixture log-densities, batched for TPU.

Functional equivalents of the reference's six pdf evaluators
(``lnasr/gmm.py:16-100``), plus the fused emission-scoring kernels used by
the GMM-HMM. The diagonal-covariance scorer is written as two GEMMs so the
hot path runs on the MXU:

    quad[t, k] = sum_d (o[t,d] - mu[k,d])^2 / var[k,d]
               = (o^2) @ ivar.T - 2 o @ (mu*ivar).T + sum_d mu^2 ivar

The full-covariance scorer exists for parity with the reference's math
(``gmm.py:59-68``: determinant + inverse + Mahalanobis) and for small
models; production configs use diagonal covariance.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lnasr_tpu.ops.numerics import logsumexp

_LOG_2PI = float(np.log(2.0 * np.pi))


# -- scalar / generic pdfs (reference gmm.py parity surface) -----------------

def gaussian_logpdf(x, mu, sigma2):
    """Univariate normal log-density (``gmm.py:28-30``)."""
    x = jnp.asarray(x)
    return -0.5 * (_LOG_2PI + jnp.log(sigma2) + (x - mu) * (x - mu) / sigma2)


def gaussian_pdf(x, mu, sigma2):
    """Univariate normal density (``gmm.py:16-26``)."""
    return jnp.exp(gaussian_logpdf(x, mu, sigma2))


def mvn_logpdf_full(x: jax.Array, mu: jax.Array, sigma: jax.Array) -> jax.Array:
    """Multivariate normal log-density with full covariance.

    ``x`` is ``(L, D)``; returns ``(L,)``. Same math as ``gmm.py:59-68``
    (log-determinant + explicit inverse + batched Mahalanobis form).
    """
    d = x.shape[-1]
    sign, logdet = jnp.linalg.slogdet(sigma)
    inv = jnp.linalg.inv(sigma)
    xc = x - mu
    maha = jnp.einsum("ld,de,le->l", xc, inv, xc,
                      precision=jax.lax.Precision.HIGHEST)
    return -0.5 * (d * _LOG_2PI + logdet + maha)


def mvn_pdf_full(x, mu, sigma):
    return jnp.exp(mvn_logpdf_full(x, mu, sigma))


def gmm_logpdf_full(log_w: jax.Array, x: jax.Array, mu: jax.Array, sigma: jax.Array):
    """Log-density of a full-covariance mixture: ``log_w (M,)``, ``mu (M, D)``,
    ``sigma (M, D, D)`` -> ``(L,)`` (``gmm.py:90-100``; weights in log space).
    """
    comp = jax.vmap(lambda m, s: mvn_logpdf_full(x, m, s))(mu, sigma)  # (M, L)
    return logsumexp(log_w[:, None] + comp, axis=0)


def gmm_pdf_full(w: jax.Array, x: jax.Array, mu: jax.Array, sigma: jax.Array):
    """Linear-space mixture density (``gmm.py:70-88``; weights linear)."""
    comp = jax.vmap(lambda m, s: mvn_pdf_full(x, m, s))(mu, sigma)  # (M, L)
    return w @ comp


# -- fused emission scorers --------------------------------------------------

def diag_components_logpdf(
    obs: jax.Array, mu: jax.Array, var: jax.Array
) -> jax.Array:
    """Per-component diagonal-Gaussian log-densities on the MXU.

    ``obs (T, D)``, ``mu (..., D)``, ``var (..., D)`` -> ``(T, ...)`` with the
    component axes flattened into one: callers reshape. Both GEMMs contract
    over D, so K = component count lands on the MXU lanes.
    """
    comp_shape = mu.shape[:-1]
    d = obs.shape[-1]
    mu2 = mu.reshape(-1, d)
    ivar = 1.0 / var.reshape(-1, d)
    const = -0.5 * (d * _LOG_2PI + jnp.sum(jnp.log(var.reshape(-1, d)), axis=-1))
    # One fused GEMM: stack [o^2, o, 1] against the matching component
    # rows so the whole log-density (quadratic + linear + constant terms)
    # is a single (T, 2D+1) x (2D+1, K) product with no epilogue. Full f32
    # matmul precision — the quadratic terms cancel against each other, so
    # bf16-pass matmuls (the TPU f32 default) corrupt the tails.
    lhs = jnp.concatenate(
        [obs * obs, obs, jnp.ones((obs.shape[0], 1), obs.dtype)], axis=1
    )
    rhs = jnp.concatenate(
        [
            -0.5 * ivar,
            mu2 * ivar,
            (const - 0.5 * jnp.sum(mu2 * mu2 * ivar, axis=-1))[:, None],
        ],
        axis=1,
    ).T  # (2D+1, K)
    out = jnp.dot(lhs, rhs, precision=jax.lax.Precision.HIGHEST)
    return out.reshape(obs.shape[0], *comp_shape)


def gmm_emissions_diag(
    obs: jax.Array, log_w: jax.Array, mu: jax.Array, var: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """GMM-HMM emission scores, diagonal covariance.

    ``obs (T, D)``, ``log_w (N, M)``, ``mu (N, M, D)``, ``var (N, M, D)``
    -> ``(log_b (T, N), log_bm (T, N, M))`` — the batched version of the
    reference's per-state/per-component loop (``gmmhmm.py:46-67``).
    """
    log_bm = diag_components_logpdf(obs, mu, var)  # (T, N, M)
    log_b = logsumexp(log_w[None] + log_bm, axis=-1)
    return log_b, log_bm


def gmm_emissions_full(
    obs: jax.Array, log_w: jax.Array, mu: jax.Array, sigma: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """GMM-HMM emission scores with full covariances (parity path).

    ``sigma (N, M, D, D)``; inverses/log-determinants are computed once per
    call and shared across frames.
    """
    n, m, d = mu.shape
    mu_f = mu.reshape(n * m, d)
    sig_f = sigma.reshape(n * m, d, d)
    _, logdet = jnp.linalg.slogdet(sig_f)
    inv = jnp.linalg.inv(sig_f)
    xc = obs[:, None, :] - mu_f[None, :, :]  # (T, NM, D)
    maha = jnp.einsum("tkd,kde,tke->tk", xc, inv, xc,
                      precision=jax.lax.Precision.HIGHEST)
    log_bm = (-0.5 * (d * _LOG_2PI + logdet[None, :] + maha)).reshape(
        obs.shape[0], n, m
    )
    log_b = logsumexp(log_w[None] + log_bm, axis=-1)
    return log_b, log_bm
