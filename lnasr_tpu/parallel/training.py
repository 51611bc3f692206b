"""Data-parallel Baum-Welch over a device mesh.

Utterance batches shard across the ``data`` axis; each shard computes its
E-step sufficient statistics locally (the same per-sequence code as the
single-chip path), the statistics reduce with ``jax.lax.psum``, and the
M-step runs replicated on every device — so parameters never leave the
devices and the only communication is one small ``psum`` per iteration
(O(N^2 + N·M·D) floats, independent of batch size and sequence length).

Statistics cross the collective in linear space (posterior masses are
bounded by the frame count, so ``exp`` of the log-space accumulators is
safe); the single-chip log-space path stays bit-accurate for parity tests
while this path trades ~1 ulp for psum-ability.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lnasr_tpu.config import GMMHMMConfig
from lnasr_tpu.models import gmmhmm as _g
from lnasr_tpu.models import hmm as _h
from lnasr_tpu.ops.numerics import safe_log


def _gmm_linear_stats(params, obs, mask, cov_type):
    """Per-shard E-step: vmapped sequence stats combined into linear-space
    psum-ready accumulators."""
    stats = jax.vmap(lambda o, mk: _g._sequence_stats(params, o, mk, cov_type))(
        obs, mask
    )
    return dict(
        xi=jnp.sum(jnp.exp(stats.log_xi_sum), axis=0),
        gamma=jnp.sum(jnp.exp(stats.log_gamma_sum), axis=0),
        pi=jnp.sum(jnp.exp(stats.log_pi_num), axis=0),
        w=jnp.sum(jnp.exp(stats.log_w_num), axis=0),
        occ=jnp.sum(stats.occ, axis=0),
        first=jnp.sum(stats.first, axis=0),
        second=jnp.sum(stats.second, axis=0),
        loglik=jnp.sum(stats.loglik),
        count=jnp.asarray(obs.shape[0], stats.occ.dtype),
    )


def make_dp_gmmhmm_em_step(
    mesh: Mesh, config: GMMHMMConfig
) -> Callable:
    """Build a jitted EM step: ``(params, obs (B, T, D), mask (B, T)) ->
    (params, loglik)`` with ``B`` sharded over the mesh's ``data`` axis and
    parameters replicated."""
    cov_type, min_std, var_floor = config.cov_type, config.min_std, config.var_floor

    def shard_fn(params, obs, mask):
        local = _gmm_linear_stats(params, obs, mask, cov_type)
        total = jax.lax.psum(local, "data")
        stats = _g.GMMEMStats(
            log_xi_sum=safe_log(total["xi"]),
            log_gamma_sum=safe_log(total["gamma"]),
            log_pi_num=safe_log(total["pi"] / total["count"]),
            log_w_num=safe_log(total["w"]),
            occ=total["occ"],
            first=total["first"],
            second=total["second"],
            loglik=total["loglik"],
        )
        new_params = _g._maximize(stats, params, cov_type, min_std, var_floor)
        return new_params, stats.loglik

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def make_dp_hmm_em_step(mesh: Mesh) -> Callable:
    """Same as :func:`make_dp_gmmhmm_em_step` for the discrete HMM."""

    def shard_fn(params, obs, mask):
        stats = jax.vmap(lambda o, mk: _h._sequence_stats(params, o, mk))(obs, mask)
        local = dict(
            xi=jnp.sum(jnp.exp(stats.log_xi_sum), axis=0),
            gamma=jnp.sum(jnp.exp(stats.log_gamma_sum), axis=0),
            b=jnp.sum(jnp.exp(stats.log_b_num), axis=0),
            pi=jnp.sum(jnp.exp(stats.log_pi_num), axis=0),
            loglik=jnp.sum(stats.loglik),
            count=jnp.asarray(obs.shape[0], jnp.float32).astype(stats.log_pi_num.dtype),
        )
        total = jax.lax.psum(local, "data")
        combined = _h.EMStats(
            log_xi_sum=safe_log(total["xi"]),
            log_gamma_sum=safe_log(total["gamma"]),
            log_b_num=safe_log(total["b"]),
            log_pi_num=safe_log(total["pi"] / total["count"]),
            loglik=total["loglik"],
        )
        return _h._maximize(combined), combined.loglik

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def train_data_parallel(
    model,
    obs,
    mask,
    mesh: Mesh,
    iters: int = 10,
    eps: float = 1e-4,
    verbose: bool = False,
):
    """Host-side EM loop over a jitted data-parallel step. ``model`` is an
    :class:`lnasr_tpu.models.gmmhmm.GMMHMM` or :class:`...hmm.HMM`; its
    parameters are updated in place and the loglik history returned.

    The batch is placed with a ``('data', None, ...)`` sharding so XLA
    splits it once; the batch size must divide by the data-axis size.
    """
    if isinstance(model, _g.GMMHMM):
        step = make_dp_gmmhmm_em_step(mesh, model.config)
        obs = jnp.asarray(obs, model.dtype)  # features are real-valued
    else:
        step = make_dp_hmm_em_step(mesh)
        obs = jnp.asarray(obs)  # discrete symbol ids stay integral
    mask = jnp.asarray(mask)
    batch_spec = P("data", *([None] * (obs.ndim - 1)))
    obs = jax.device_put(obs, NamedSharding(mesh, batch_spec))
    mask = jax.device_put(mask, NamedSharding(mesh, P("data", None)))

    params = model.params
    history = []
    prev = None
    for it in range(iters):
        params, loglik = step(params, obs, mask)
        loglik = float(loglik)
        history.append(loglik)
        if verbose:
            print(f"Iter {it:3}: loglik {loglik:.6e}")
        if prev is not None and abs(loglik - prev) < eps:
            break
        prev = loglik
    model._set_params(params)
    return history
