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


def _seq_trellis_stats(log_pi, log_a, log_b_c, mask_c, idx, seq_size,
                       shift_up):
    """Chunk-local alpha/beta rows and normalized xi/gamma for one long
    utterance sharded over the ``seq`` axis (shared by the continuous and
    discrete seq-parallel EM steps). Returns
    ``(alpha_c, beta_c, xi, gamma, gamma_m)``."""
    from lnasr_tpu.parallel.seqscan import (
        _after_product,
        _before_product,
        _chunk_ops,
        _identity_op,
        _suffix_scan,
    )
    from lnasr_tpu.ops.numerics import log_matmul
    from lnasr_tpu.ops.numerics import logsumexp as lse

    n = log_a.shape[0]
    dtype = log_b_c.dtype
    mats = _chunk_ops(log_a, log_b_c, mask_c, idx == 0)

    # forward: alpha rows for this chunk
    prefix = jax.lax.associative_scan(log_matmul, mats, axis=0)
    before = _before_product(prefix[-1], idx, log_matmul, n, dtype)
    first_b = jax.lax.all_gather(log_b_c[0], "seq")[0]  # global frame 0
    alpha0 = log_pi + first_b
    alpha_c = lse(
        alpha0[None, :, None] + log_matmul(before[None], prefix), axis=1
    )

    # backward: beta rows for this chunk
    suffix = _suffix_scan(log_matmul, mats)
    after = _after_product(suffix[0], idx, log_matmul, n, dtype)
    suffix_next = jnp.concatenate(
        [suffix[1:], _identity_op(n, dtype)[None]], axis=0
    )
    beta_c = lse(log_matmul(suffix_next, after[None]), axis=2)

    # boundary rows from the next chunk (device S-1 receives zeros and
    # masks them out: the global last frame has no outgoing transition)
    nb = jax.lax.ppermute(log_b_c[0], "seq", shift_up)
    nbeta = jax.lax.ppermute(beta_c[0], "seq", shift_up)
    nmask = jax.lax.ppermute(mask_c[0].astype(jnp.int32), "seq", shift_up)
    b_next = jnp.concatenate([log_b_c[1:], nb[None]], axis=0)
    beta_next = jnp.concatenate([beta_c[1:], nbeta[None]], axis=0)
    mask_next = jnp.concatenate(
        [mask_c[1:], (nmask > 0)[None]], axis=0
    )  # frame t+1 valid <=> transition t -> t+1 exists

    # xi / gamma (per-frame normalization is chunk-local)
    numer = (
        alpha_c[:, :, None] + log_a[None] + (b_next + beta_next)[:, None, :]
    )
    tc = numer.shape[0]
    denom = lse(numer.reshape(tc, n * n), axis=1)
    xi = numer - denom[:, None, None]
    xi = jnp.where(mask_next[:, None, None], xi, -jnp.inf)
    gamma = lse(xi, axis=2)
    gamma_m = jnp.where(mask_c[:, None], gamma, -jnp.inf)
    return alpha_c, beta_c, xi, gamma, gamma_m


def make_seq_gmmhmm_em_step(mesh: Mesh, config: GMMHMMConfig) -> Callable:
    """Baum-Welch for ONE long utterance with the *time* axis sharded over
    the mesh's ``seq`` axis: ``(params, obs (T, D), mask (T,)) ->
    (params, loglik)``.

    Each chunk computes emissions, the forward prefix and backward suffix
    operator products locally (associative scans over (N, N) operators —
    :mod:`lnasr_tpu.parallel.seqscan`), exchanges one (N, N) product per
    chunk over the ICI, shifts one boundary row with ``ppermute`` for the
    cross-chunk xi transitions, and psums the linear-space sufficient
    statistics. The M-step runs replicated. Statistics match the
    single-chip sweep up to float reassociation.

    This closes the round-1 gap: the ``seq`` axis could only run
    forward/Viterbi, so EM on a long utterance could not ride it.
    """
    from lnasr_tpu.ops.numerics import logsumexp as lse

    cov_type, min_std, var_floor = config.cov_type, config.min_std, config.var_floor
    seq_size = mesh.shape["seq"]
    shift_up = [(i, i - 1) for i in range(1, seq_size)]  # chunk c+1 -> c

    def shard_fn(params, obs_c, mask_c):
        idx = jax.lax.axis_index("seq")
        log_b_c, log_bm_c = _g._emissions(params, obs_c, cov_type)
        dtype = log_b_c.dtype
        alpha_c, beta_c, xi, gamma, gamma_m = _seq_trellis_stats(
            params.log_pi, params.log_a, log_b_c, mask_c, idx, seq_size,
            shift_up,
        )

        # mixture posteriors (gmmhmm.py:89-100 semantics, chunk-local)
        ab = alpha_c + beta_c
        log_state_post = ab - lse(ab, axis=1, keepdims=True)
        log_resp = (params.log_w[None] + log_bm_c) - log_b_c[..., None]
        xi_mix = log_state_post[..., None] + log_resp
        xi_mix = jnp.where(mask_c[:, None, None], xi_mix, -jnp.inf)
        p = jnp.exp(xi_mix)  # (Tc, N, M)

        if cov_type == "diag":
            second = jnp.einsum("tnm,td->nmd", p, obs_c * obs_c)
        else:
            xc = obs_c[:, None, None, :] - params.mu[None]
            second = jnp.einsum("tnm,tnmd,tnme->nmde", p, xc, xc)

        local = dict(
            xi=jnp.sum(jnp.exp(xi), axis=0),
            gamma=jnp.sum(jnp.exp(gamma_m), axis=0),
            pi=jnp.where(idx == 0, jnp.exp(gamma[0]), 0.0),
            w=jnp.sum(p, axis=0),
            occ=jnp.sum(p, axis=0),
            first=jnp.einsum("tnm,td->nmd", p, obs_c),
            second=second,
            loglik=jnp.where(
                idx == seq_size - 1, lse(alpha_c[-1]), jnp.asarray(0.0, dtype)
            ),
        )
        total = jax.lax.psum(local, "seq")
        stats = _g.GMMEMStats(
            log_xi_sum=safe_log(total["xi"]),
            log_gamma_sum=safe_log(total["gamma"]),
            log_pi_num=safe_log(total["pi"]),
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
        in_specs=(P(), P("seq"), P("seq")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def make_seq_hmm_em_step(mesh: Mesh) -> Callable:
    """Discrete-HMM Baum-Welch for ONE long observation sequence with the
    time axis sharded over ``seq``: ``(params, obs (T,) int, mask (T,)) ->
    (params, loglik)``. Same machinery as
    :func:`make_seq_gmmhmm_em_step`, with a table-gather emission model
    and a per-symbol segment-sum emission numerator."""
    from lnasr_tpu.ops.numerics import logsumexp as lse

    seq_size = mesh.shape["seq"]
    shift_up = [(i, i - 1) for i in range(1, seq_size)]

    def shard_fn(params, obs_c, mask_c):
        idx = jax.lax.axis_index("seq")
        n, m_sym = params.log_b.shape
        log_b_c = _h._emission_lookup(params.log_b, obs_c)
        dtype = log_b_c.dtype
        alpha_c, _, xi, gamma, gamma_m = _seq_trellis_stats(
            params.log_pi, params.log_a, log_b_c, mask_c, idx, seq_size,
            shift_up,
        )

        occ = jnp.where(mask_c[:, None], jnp.exp(gamma_m), 0.0)  # (Tc, N)
        b_num = jax.ops.segment_sum(occ, obs_c, num_segments=m_sym)  # (M, N)

        local = dict(
            xi=jnp.sum(jnp.exp(xi), axis=0),
            gamma=jnp.sum(jnp.exp(gamma_m), axis=0),
            pi=jnp.where(idx == 0, jnp.exp(gamma[0]), 0.0),
            b=b_num.T,
            loglik=jnp.where(
                idx == seq_size - 1, lse(alpha_c[-1]), jnp.asarray(0.0, dtype)
            ),
        )
        total = jax.lax.psum(local, "seq")
        combined = _h.EMStats(
            log_xi_sum=safe_log(total["xi"]),
            log_gamma_sum=safe_log(total["gamma"]),
            log_b_num=safe_log(total["b"]),
            log_pi_num=safe_log(total["pi"]),
            loglik=total["loglik"],
        )
        return _h._maximize(combined), combined.loglik

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P("seq"), P("seq")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def train_seq_parallel(
    model,
    obs,
    mesh: Mesh,
    iters: int = 10,
    mask=None,
    eps: float = 1e-4,
    verbose: bool = False,
    config=None,
):
    """EM over ONE long utterance, time-sharded across the ``seq`` axis.

    ``model`` may be a :class:`~lnasr_tpu.models.gmmhmm.GMMHMM`
    (``obs (T, D)`` float features) or a discrete
    :class:`~lnasr_tpu.models.hmm.HMM` (``obs (T,)`` symbol ids). T need
    not divide the axis size (auto-padded with masked frames). Updates
    ``model`` in place, returns loglik history. An optional
    :class:`~lnasr_tpu.config.TrainConfig` supplies the budget and
    periodic checkpoint/resume (multi-host runs restart from the last
    checkpoint — every process keeps the replicated params, so each can
    save/restore locally).
    """
    from lnasr_tpu.parallel.seqscan import _pad_time
    from lnasr_tpu.utils.checkpoints import checkpointer_from_config, em_loop

    if config is not None:
        iters, eps = config.max_iters, config.eps

    # GMMHMM subclasses HMM, so identify the discrete model by its params
    discrete = hasattr(model.params, "log_b")
    obs = jnp.asarray(obs) if discrete else jnp.asarray(obs, model.dtype)
    t = obs.shape[0]
    if mask is None:
        mask = jnp.ones((t,), bool)
    mask = jnp.asarray(mask).astype(bool)
    seq_size = mesh.shape["seq"]
    (obs_p, mask_p), t_pad = _pad_time([obs, mask], t, seq_size)
    mask_p = mask_p.astype(bool) & (jnp.arange(t_pad) < t)
    obs_sharding = P("seq") if discrete else P("seq", None)
    obs_p = jax.device_put(obs_p, NamedSharding(mesh, obs_sharding))
    mask_p = jax.device_put(mask_p, NamedSharding(mesh, P("seq")))

    step = (make_seq_hmm_em_step(mesh) if discrete
            else make_seq_gmmhmm_em_step(mesh, model.config))
    params, history = em_loop(
        lambda p: step(p, obs_p, mask_p),
        model.params,
        iters,
        eps,
        verbose=verbose,
        checkpointer=checkpointer_from_config(config),
        fmt="Iter {it:3}: loglik {loglik:.6e}",
    )
    model._set_params(params)
    return history


def train_data_parallel(
    model,
    obs,
    mask,
    mesh: Mesh,
    iters: int = 10,
    eps: float = 1e-4,
    verbose: bool = False,
    config=None,
):
    """Host-side EM loop over a jitted data-parallel step. ``model`` is an
    :class:`lnasr_tpu.models.gmmhmm.GMMHMM` or :class:`...hmm.HMM`; its
    parameters are updated in place and the loglik history returned.

    The batch is placed with a ``('data', None, ...)`` sharding so XLA
    splits it once; the batch size must divide by the data-axis size.
    An optional :class:`~lnasr_tpu.config.TrainConfig` supplies the
    budget and periodic checkpoint/resume.
    """
    from lnasr_tpu.utils.checkpoints import checkpointer_from_config, em_loop

    if config is not None:
        iters, eps = config.max_iters, config.eps
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

    params, history = em_loop(
        lambda p: step(p, obs, mask),
        model.params,
        iters,
        eps,
        verbose=verbose,
        checkpointer=checkpointer_from_config(config),
        fmt="Iter {it:3}: loglik {loglik:.6e}",
    )
    model._set_params(params)
    return history
