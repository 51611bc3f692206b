"""Pipeline parallelism: streaming stage overlap across devices.

SURVEY.md §2.4: the reference has no pipeline of any kind — its intended
decode flow (audio → MFCC → AM scoring → trellis, ``doc/source/
basic.rst:14-21``) runs strictly sequentially in one process. The
TPU-native equivalent stages that flow across a ``stage`` mesh axis so
chunk k's acoustic-model scoring overlaps chunk k-1's trellis recursion:

  stage 0 (frontend):  GMM emission log-probs of feature chunk k
                       — the MXU-heavy GEMM (ops/gaussian.py)
  stage 1 (decoder):   forward (or max-plus) recursion over the emissions
                       of chunk k-1 — the bandwidth-bound scan

Emissions cross the ICI once per chunk via ``lax.ppermute`` (one
(Tc, N) buffer), so steady-state throughput is set by the slower stage
rather than their sum. Both stages live in ONE jitted ``shard_map``
program; per-device work is selected with ``lax.cond`` on
``axis_index('stage')`` (no collectives inside the branches, so the SPMD
program stays deadlock-free).

This is the streaming counterpart of :mod:`lnasr_tpu.parallel.seqscan`
(which parallelizes *within* one long utterance): seqscan needs the whole
sequence up front, the pipeline needs only one chunk of lookahead.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from lnasr_tpu.ops.gaussian import gmm_emissions_diag
from lnasr_tpu.ops.numerics import logsumexp

N_STAGES = 2


def make_stage_mesh(devices=None) -> Mesh:
    """A ``('stage',)`` mesh over two devices (frontend, decoder)."""
    if devices is None:
        devices = jax.devices()
    if len(devices) < N_STAGES:
        raise ValueError(f"pipeline needs {N_STAGES} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:N_STAGES]), ("stage",))


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

    def shard_fn(log_pi, log_a, log_w, mu, var, feats3):
        is_front = jax.lax.axis_index("stage") == 0

        def front(_):
            # clip keeps the gather in range on the drain tick (k = K);
            # the result is discarded because stage 1 never sees it.
            def emit(k):
                ch = jax.lax.dynamic_index_in_dim(
                    feats3, jnp.clip(k, 0, n_chunks - 1), 0, keepdims=False
                )
                log_b, _ = gmm_emissions_diag(ch, log_w, mu, var)
                return log_b.astype(dtype)

            return emit

        def trellis_step(carry, log_bt):
            alpha, pos = carry
            if semiring == "log":
                adv = logsumexp(alpha[:, None] + log_a, axis=0)
            else:
                adv = jnp.max(alpha[:, None] + log_a, axis=0)
            new = jnp.where(pos == 0, log_pi, adv) + log_bt
            return (new, pos + 1), None

        def tick(carry, k):
            buf, alpha, pos = carry
            out0 = jax.lax.cond(
                is_front & (k < n_chunks),
                front(None),
                lambda _: jnp.zeros((chunk, n), dtype),
                k,
            )
            alpha, pos = jax.lax.cond(
                jnp.logical_and(~is_front, k >= 1),
                lambda args: jax.lax.scan(trellis_step, args, buf)[0],
                lambda args: args,
                (alpha, pos),
            )
            new_buf = jax.lax.ppermute(out0, "stage", perm=[(0, 1)])
            return (new_buf, alpha, pos), None

        carry0 = (
            jnp.zeros((chunk, n), dtype),
            jnp.zeros((n,), dtype),
            jnp.zeros((), jnp.int32),
        )
        # K + 1 ticks: the extra tick drains the last chunk through stage 1
        (_, alpha, _), _ = jax.lax.scan(
            tick, carry0, jnp.arange(n_chunks + 1, dtype=jnp.int32)
        )
        return jax.lax.all_gather(alpha, "stage")  # (2, N); row 1 is real

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(),) * 6,
        out_specs=P(),
        check_vma=False,
    )
    alpha = fn(log_pi, log_a, log_w, mu, var, feats3)[1]
    reduce = logsumexp if semiring == "log" else jnp.max
    return reduce(alpha)
