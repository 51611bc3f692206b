"""Sequence parallelism: the forward recursion across time chunks.

The HMM forward recursion composes (N, N) operators ``M_t[i, j] = A[i, j]
+ b[t, j]`` under (+, logsumexp) matmul (see
:func:`lnasr_tpu.ops.trellis.forward_assoc`). Operators are associative,
so a long utterance splits along a ``seq`` mesh axis: every chunk reduces
its operators locally (O(Tc N^3) on-device work), the per-chunk products —
one (N, N) matrix each — cross the ICI in a single ``all_gather``, and
each chunk applies the product of its predecessors. Communication is
O(S N^2) regardless of sequence length: the classical-ASR analogue of
ring-attention-style sequence parallelism (SURVEY.md §2.4).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lnasr_tpu.ops.numerics import log_matmul, logsumexp, maxplus_matmul


def _identity_op(n: int, dtype) -> jax.Array:
    return jnp.where(jnp.eye(n, dtype=bool), 0.0, -jnp.inf).astype(dtype)


def forward_seq_parallel(
    log_pi: jax.Array,
    log_a: jax.Array,
    log_b: jax.Array,
    mesh: Mesh,
) -> Tuple[jax.Array, jax.Array]:
    """Forward pass with the time axis sharded over the mesh's ``seq`` axis.

    ``log_b (T, N)`` with T divisible by the seq-axis size. Returns
    ``(alpha (T, N), loglik)`` equal (up to float reassociation) to
    :func:`lnasr_tpu.ops.trellis.forward_scan`.
    """
    t, n = log_b.shape
    dtype = log_b.dtype

    def shard_fn(alpha0, log_a, log_b_chunk):
        idx = jax.lax.axis_index("seq")
        tc = log_b_chunk.shape[0]
        # operator per local frame; the global frame 0 carries the identity
        # (its emission folds into alpha0 instead)
        mats = log_a[None, :, :] + log_b_chunk[:, None, :]
        mats = jnp.where(
            (jnp.arange(tc) == 0)[:, None, None] & (idx == 0),
            _identity_op(n, dtype)[None],
            mats,
        )
        # local inclusive prefix products and the chunk's total product
        prefix = jax.lax.associative_scan(log_matmul, mats, axis=0)
        chunk_total = prefix[-1]
        # exchange chunk products: one all_gather of (N, N) per chunk
        all_totals = jax.lax.all_gather(chunk_total, "seq")  # (S, N, N)
        s = all_totals.shape[0]
        # product of all chunks strictly before this one
        before = _identity_op(n, dtype)
        for c in range(s):  # S is small (mesh axis size); unrolled
            before = jnp.where(c < idx, log_matmul(before, all_totals[c]), before)
        full_prefix = log_matmul(before[None], prefix)  # (Tc, N, N)
        alpha_chunk = logsumexp(alpha0[None, :, None] + full_prefix, axis=1)
        return alpha_chunk

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P("seq")),
        out_specs=P("seq"),
        check_vma=False,
    )
    alpha0 = log_pi + log_b[0]
    log_b_sharded = jax.device_put(log_b, NamedSharding(mesh, P("seq", None)))
    alpha = fn(alpha0, log_a, log_b_sharded)
    return alpha, logsumexp(alpha[-1])


def viterbi_seq_parallel(
    log_pi: jax.Array,
    log_a: jax.Array,
    log_b: jax.Array,
    mesh: Mesh,
) -> Tuple[jax.Array, jax.Array]:
    """Viterbi decode with the time axis sharded over ``seq``.

    Same chunked-operator idea as :func:`forward_seq_parallel` in the
    (+, max) semiring, plus a *parallel backtrace*: every chunk computes,
    for each of the N possible states at its last frame, the full local
    path and the implied state at the previous chunk's boundary. Those
    N-entry boundary tables are all-gathered (O(S·N) communication) and
    composed right-to-left on the host side of the program; each chunk
    then selects its path column. Total cross-chip traffic is
    O(S·(N² + N·Tc_selects)) — independent of T for the trellis itself.

    Returns ``(path (T,) int32, best score)`` equal to
    :func:`lnasr_tpu.ops.trellis.viterbi_scan`.
    """
    t, n = log_b.shape
    dtype = log_b.dtype
    seq_size = mesh.shape["seq"]
    assert t % seq_size == 0, "T must divide the seq axis"

    def shard_fn(v0, log_a, log_b_chunk):
        idx = jax.lax.axis_index("seq")
        tc = log_b_chunk.shape[0]
        mats = log_a[None, :, :] + log_b_chunk[:, None, :]
        mats = jnp.where(
            (jnp.arange(tc) == 0)[:, None, None] & (idx == 0),
            _identity_op(n, dtype)[None],
            mats,
        )
        prefix = jax.lax.associative_scan(maxplus_matmul, mats, axis=0)
        all_totals = jax.lax.all_gather(prefix[-1], "seq")  # (S, N, N)
        s = all_totals.shape[0]
        before = _identity_op(n, dtype)
        for c in range(s):
            before = jnp.where(c < idx, maxplus_matmul(before, all_totals[c]), before)
        # v rows for this chunk, plus the previous chunk's last row
        full_prefix = maxplus_matmul(before[None], prefix)  # (Tc, N, N)
        v_chunk = jnp.max(v0[None, :, None] + full_prefix, axis=1)  # (Tc, N)
        v_prev_last = jnp.max(v0[:, None] + before, axis=0)  # (N,)

        # local backpointers: bt[t, j] = argmax_i(v[t-1, i] + A[i, j]);
        # frame 0 of the chunk points into the previous chunk
        v_prev = jnp.concatenate([v_prev_last[None], v_chunk[:-1]], axis=0)
        bt = jnp.argmax(v_prev[:, :, None] + log_a[None, :, :], axis=1)  # (Tc, N)
        first_chunk = idx == 0
        states = jnp.arange(n)
        bt = bt.at[0].set(jnp.where(first_chunk, states, bt[0]))

        # parallel backtrace: for all N exit hypotheses at once
        def back(state_vec, bt_row):
            prev = bt_row[state_vec]
            return prev, state_vec

        entry_states, paths_rev = jax.lax.scan(
            back, jnp.arange(n), bt, reverse=True
        )
        # paths_rev[t, h] = state at local frame t for exit hypothesis h
        boundary = jnp.where(first_chunk, jnp.arange(n), entry_states)
        return v_chunk, paths_rev.astype(jnp.int32), jax.lax.all_gather(boundary, "seq")

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P("seq")),
        out_specs=(P("seq"), P("seq"), P()),
        check_vma=False,
    )
    v0 = log_pi + log_b[0]
    log_b_sharded = jax.device_put(log_b, NamedSharding(mesh, P("seq", None)))
    v, paths, boundaries = fn(v0, log_a, log_b_sharded)
    # compose chunk exits right-to-left (S tiny sequential steps)
    exit_states = [jnp.argmax(v[-1]).astype(jnp.int32)]
    for c in range(seq_size - 1, 0, -1):
        exit_states.append(boundaries[c][exit_states[-1]].astype(jnp.int32))
    exit_states = jnp.stack(exit_states[::-1])  # (S,), exit state per chunk
    tc = t // seq_size
    col = jnp.repeat(exit_states, tc)  # (T,)
    path = jnp.take_along_axis(paths, col[:, None], axis=1)[:, 0]
    return path, jnp.max(v[-1])
