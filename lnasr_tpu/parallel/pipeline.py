"""Pipeline parallelism: streaming stage overlap across devices.

SURVEY.md §2.4: the reference has no pipeline of any kind — its intended
decode flow (audio → MFCC → AM scoring → trellis, ``doc/source/
basic.rst:14-21``) runs strictly sequentially in one process. The
TPU-native equivalent stages that flow across a ``stage`` mesh axis of
ANY size S >= 2:

  stages 0..S-2 (frontend): each holds 1/(S-1) of the GMM mixture
                 components and adds its partial emission log-probs
                 (``logaddexp`` accumulation) as a feature chunk's buffer
                 flows down the ring — the MXU-heavy GEMM
                 (ops/gaussian.py), sliced like model parallelism but
                 *pipelined*, so chunk k is in stage 1 while chunk k+1
                 is in stage 0;
  stage S-1 (decoder): forward (or max-plus) recursion over the completed
                 emissions — the bandwidth-bound scan — optionally
                 recording backpointers for a true Viterbi decode.

Buffers cross the ICI once per tick per stage via ``lax.ppermute`` (one
(Tc, N) chunk each), so steady-state throughput is set by the slowest
stage rather than the sum. Everything lives in ONE jitted ``shard_map``
program; per-device work is selected with ``lax.cond`` on
``axis_index('stage')`` (no collectives inside the branches, so the SPMD
program stays deadlock-free).

This is the streaming counterpart of :mod:`lnasr_tpu.parallel.seqscan`
(which parallelizes *within* one long utterance): seqscan needs the whole
sequence up front, the pipeline needs only one chunk of lookahead.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from lnasr_tpu.ops.gaussian import gmm_emissions_diag
from lnasr_tpu.ops.numerics import logsumexp

N_STAGES = 2  # default mesh size (one frontend + one decoder stage)


def make_stage_mesh(devices=None, n_stages: int = N_STAGES) -> Mesh:
    """A ``('stage',)`` mesh: ``n_stages - 1`` emission stages feeding one
    decoder stage."""
    if devices is None:
        devices = jax.devices()
    if n_stages < 2:
        raise ValueError("pipeline needs at least 2 stages")
    if len(devices) < n_stages:
        raise ValueError(f"pipeline needs {n_stages} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n_stages]), ("stage",))


def _pad_mixtures(log_w, mu, var, n_shards: int):
    """Pad the mixture axis so it splits evenly across emission stages;
    padded components carry -inf weight (no probability mass)."""
    n, m = log_w.shape
    m_pad = -(-m // n_shards) * n_shards
    if m_pad == m:
        return log_w, mu, var, m
    pw = jnp.full((n, m_pad - m), -jnp.inf, log_w.dtype)
    ones = jnp.ones((n, m_pad - m, mu.shape[-1]), mu.dtype)
    return (
        jnp.concatenate([log_w, pw], axis=1),
        jnp.concatenate([mu, ones], axis=1),
        jnp.concatenate([var, ones], axis=1),
        m,
    )


def _pipeline(
    log_pi, log_a, log_w, mu, var, feats, mesh, chunk, semiring, want_path
):
    """Shared S-stage machinery. Returns ``(alpha (N,), bt (T, N) int32)``;
    ``bt`` is all zeros when ``want_path`` is false."""
    t, _ = feats.shape
    n = log_a.shape[0]
    dtype = feats.dtype
    if chunk is None:
        chunk = t // 4 if t % 4 == 0 else t
    if t % chunk:
        raise ValueError(f"chunk {chunk} must divide T={t}")
    if semiring not in ("log", "max"):
        raise ValueError(f"unknown semiring: {semiring!r}")
    n_chunks = t // chunk
    feats3 = feats.reshape(n_chunks, chunk, -1)

    n_stages = mesh.shape["stage"]
    n_shards = n_stages - 1
    log_w_p, mu_p, var_p, _ = _pad_mixtures(log_w, mu, var, n_shards)
    m_per = log_w_p.shape[1] // n_shards
    ring = [(i, i + 1) for i in range(n_stages - 1)]
    n_ticks = n_chunks + n_stages - 1

    def shard_fn(log_pi, log_a, log_w_p, mu_p, var_p, feats3):
        idx = jax.lax.axis_index("stage")
        is_first = idx == 0
        is_last = idx == n_stages - 1
        # this device's mixture slice (decoder stage gets slice 0, unused)
        shard = jnp.clip(idx, 0, n_shards - 1)
        w_s = jax.lax.dynamic_slice_in_dim(log_w_p, shard * m_per, m_per, 1)
        mu_s = jax.lax.dynamic_slice_in_dim(mu_p, shard * m_per, m_per, 1)
        var_s = jax.lax.dynamic_slice_in_dim(var_p, shard * m_per, m_per, 1)

        def partial_emissions(k):
            # chunk this stage works on at tick k; clipped gathers are
            # discarded on fill/drain ticks
            ch = jax.lax.dynamic_index_in_dim(
                feats3, jnp.clip(k - idx, 0, n_chunks - 1), 0, keepdims=False
            )
            log_b, _ = gmm_emissions_diag(ch, w_s, mu_s, var_s)
            return log_b.astype(dtype)

        def trellis_step(carry, log_bt):
            alpha, pos = carry
            scores = alpha[:, None] + log_a
            if semiring == "log":
                adv = logsumexp(scores, axis=0)
            else:
                adv = jnp.max(scores, axis=0)
            new = jnp.where(pos == 0, log_pi, adv) + log_bt
            if want_path:
                bt = jnp.argmax(scores, axis=0).astype(jnp.int32)
                bt = jnp.where(pos == 0, jnp.arange(n, dtype=jnp.int32), bt)
            else:
                bt = jnp.zeros((n,), jnp.int32)
            return (new, pos + 1), bt

        def tick(carry, k):
            buf, alpha, pos = carry
            active = (k >= idx) & (k - idx < n_chunks)

            # emission stages: inject (stage 0) or accumulate a partial
            part = jax.lax.cond(
                ~is_last & active,
                partial_emissions,
                lambda _: jnp.full((chunk, n), -jnp.inf, dtype),
                k,
            )
            buf = jnp.where(is_first, jnp.full_like(buf, -jnp.inf), buf)
            out = jnp.where(is_last, buf, jnp.logaddexp(buf, part))

            # decoder stage: consume the arrived complete emissions
            (alpha, pos), bt = jax.lax.cond(
                is_last & active,
                lambda args: jax.lax.scan(trellis_step, args, buf),
                lambda args: (args, jnp.zeros((chunk, n), jnp.int32)),
                (alpha, pos),
            )
            new_buf = jax.lax.ppermute(out, "stage", perm=ring)
            bt = jnp.where(is_last & active, bt, 0)
            return (new_buf, alpha, pos), bt

        carry0 = (
            jnp.full((chunk, n), -jnp.inf, dtype),
            jnp.zeros((n,), dtype),
            jnp.zeros((), jnp.int32),
        )
        (_, alpha, _), bts = jax.lax.scan(
            tick, carry0, jnp.arange(n_ticks, dtype=jnp.int32)
        )
        # publish the decoder stage's results to every device
        alpha = jax.lax.pmax(jnp.where(is_last, alpha, -jnp.inf), "stage")
        bts = jax.lax.psum(bts, "stage")  # zeros everywhere but the decoder
        return alpha, bts

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(),) * 6,
        out_specs=(P(), P()),
        check_vma=False,
    )
    alpha, bts = fn(log_pi, log_a, log_w_p, mu_p, var_p, feats3)
    # decoder processes chunk k at tick k + S - 1
    bt = bts[n_stages - 1 :].reshape(t, n)
    return alpha, bt


def streaming_pipeline_scores(
    log_pi: jax.Array,
    log_a: jax.Array,
    log_w: jax.Array,
    mu: jax.Array,
    var: jax.Array,
    feats: jax.Array,
    mesh: Mesh,
    chunk: Optional[int] = None,
    semiring: str = "log",
) -> jax.Array:
    """Pipelined scoring of one utterance's features ``(T, D)``.

    ``semiring="log"`` returns the forward log-likelihood
    (= :func:`lnasr_tpu.ops.trellis.forward_scan` loglik); ``"max"``
    returns the best-path (Viterbi) score without a backtrace — the
    streaming keyword-scoring primitive. ``chunk`` must divide T
    (default: T/4 when divisible, else T).
    """
    alpha, _ = _pipeline(
        log_pi, log_a, log_w, mu, var, feats, mesh, chunk, semiring, False
    )
    reduce = logsumexp if semiring == "log" else jnp.max
    return reduce(alpha)


def streaming_pipeline_decode(
    log_pi: jax.Array,
    log_a: jax.Array,
    log_w: jax.Array,
    mu: jax.Array,
    var: jax.Array,
    feats: jax.Array,
    mesh: Mesh,
    chunk: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Pipelined Viterbi decode: ``(path (T,) int32, best score)``, equal
    to :func:`lnasr_tpu.ops.trellis.viterbi_scan` on the same emissions.
    Backpointers are recorded on the decoder stage as chunks stream
    through; the backtrace itself is the standard O(T) pointer chase.
    """
    alpha, bt = _pipeline(
        log_pi, log_a, log_w, mu, var, feats, mesh, chunk, "max", True
    )
    t = feats.shape[0]

    def step(state, bt_row):
        prev = bt_row[state]
        return prev, prev

    last = jnp.argmax(alpha).astype(jnp.int32)
    # path[t] = bt[t+1][path[t+1]]; scan the pointer chase right-to-left
    _, rev = jax.lax.scan(step, last, bt[1:], reverse=True)
    path = jnp.concatenate([rev, last[None]])
    return path, jnp.max(alpha)
