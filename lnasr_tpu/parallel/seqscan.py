"""Sequence parallelism: trellis recursions across time chunks.

The HMM forward/backward/Viterbi recursions compose (N, N) operators
``M_t[i, j] = A[i, j] + b[t, j]`` under (+, logsumexp) or (+, max) matmul
(see :func:`lnasr_tpu.ops.trellis.forward_assoc`). Operators are
associative, so a long utterance splits along a ``seq`` mesh axis: every
chunk reduces its operators locally (O(Tc N^3) on-device work), the
per-chunk products — one (N, N) matrix each — cross the ICI in a single
``all_gather``, and each chunk applies the product of its neighbours.
Communication is O(S N^2) regardless of sequence length: the
classical-ASR analogue of ring-attention-style sequence parallelism
(SURVEY.md §2.4).

Masked (padded) frames carry the identity operator, so results equal the
unpadded recursions (the same convention as :mod:`lnasr_tpu.ops.trellis`);
the public wrappers auto-pad T to a multiple of the axis size, so any
length decomposes onto any mesh.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lnasr_tpu.ops.numerics import log_matmul, logsumexp, maxplus_matmul


def _identity_op(n: int, dtype) -> jax.Array:
    return jnp.where(jnp.eye(n, dtype=bool), 0.0, -jnp.inf).astype(dtype)


def _chunk_ops(log_a, log_b_chunk, mask_chunk, is_global_first):
    """Per-frame operators: ``A + b[t]`` at valid frames, identity at
    masked frames and at the global first frame (whose emission folds into
    the initial vector instead)."""
    tc, n = log_b_chunk.shape
    mats = log_a[None, :, :] + log_b_chunk[:, None, :]
    use_id = (
        ((jnp.arange(tc) == 0)[:, None, None] & is_global_first)
        | ~mask_chunk[:, None, None]
    )
    return jnp.where(use_id, _identity_op(n, log_b_chunk.dtype)[None], mats)


def _before_product(chunk_total, idx, combine, n, dtype):
    """Product of all chunks strictly before this one (ascending order)."""
    all_totals = jax.lax.all_gather(chunk_total, "seq")  # (S, N, N)
    before = _identity_op(n, dtype)
    for c in range(all_totals.shape[0]):  # S is small; unrolled
        before = jnp.where(c < idx, combine(before, all_totals[c]), before)
    return before


def _after_product(chunk_total, idx, combine, n, dtype):
    """Product of all chunks strictly after this one (ascending order)."""
    all_totals = jax.lax.all_gather(chunk_total, "seq")
    after = _identity_op(n, dtype)
    for c in range(all_totals.shape[0]):
        after = jnp.where(c > idx, combine(after, all_totals[c]), after)
    return after


def _suffix_scan(combine, mats):
    """Inclusive ascending-order suffix products ``S_t = M_t * ... * M_last``
    via a reverse associative scan with flipped operands (the flip keeps
    the non-commutative product in ascending time order)."""
    return jax.lax.associative_scan(
        lambda a, b: combine(b, a), mats, axis=0, reverse=True
    )


def _pad_time(arrays, t: int, seq_size: int):
    """Pad leading time axes to a multiple of the seq axis; returns padded
    arrays plus the padded length."""
    t_pad = -(-t // seq_size) * seq_size
    if t_pad == t:
        return arrays, t
    out = []
    for a in arrays:
        widths = [(0, t_pad - t)] + [(0, 0)] * (a.ndim - 1)
        out.append(jnp.pad(a, widths))
    return out, t_pad


def forward_seq_parallel(
    log_pi: jax.Array,
    log_a: jax.Array,
    log_b: jax.Array,
    mesh: Mesh,
    mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Forward pass with the time axis sharded over the mesh's ``seq`` axis.

    ``log_b (T, N)`` for any T (auto-padded); optional ``mask (T,)``.
    Returns ``(alpha (T, N), loglik)`` equal (up to float reassociation) to
    :func:`lnasr_tpu.ops.trellis.forward_scan`.
    """
    t, n = log_b.shape
    dtype = log_b.dtype
    seq_size = mesh.shape["seq"]
    if mask is None:
        mask = jnp.ones((t,), bool)
    (log_b_p, mask_p), t_pad = _pad_time([log_b, mask.astype(bool)], t, seq_size)
    mask_p = mask_p.astype(bool) & (jnp.arange(t_pad) < t)

    def shard_fn(alpha0, log_a, log_b_chunk, mask_chunk):
        idx = jax.lax.axis_index("seq")
        mats = _chunk_ops(log_a, log_b_chunk, mask_chunk, idx == 0)
        prefix = jax.lax.associative_scan(log_matmul, mats, axis=0)
        before = _before_product(prefix[-1], idx, log_matmul, n, dtype)
        full_prefix = log_matmul(before[None], prefix)  # (Tc, N, N)
        return logsumexp(alpha0[None, :, None] + full_prefix, axis=1)

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P("seq"), P("seq")),
        out_specs=P("seq"),
        check_vma=False,
    )
    alpha0 = log_pi + log_b[0]
    log_b_sh = jax.device_put(log_b_p, NamedSharding(mesh, P("seq", None)))
    mask_sh = jax.device_put(mask_p, NamedSharding(mesh, P("seq")))
    alpha = fn(alpha0, log_a, log_b_sh, mask_sh)[:t]
    return alpha, logsumexp(alpha[-1])


def backward_seq_parallel(
    log_a: jax.Array,
    log_b: jax.Array,
    mesh: Mesh,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Backward pass over the ``seq`` axis: ``beta (T, N)`` equal (up to
    float reassociation) to :func:`lnasr_tpu.ops.trellis.backward_scan`.

    ``beta_t = lse_j [M_{t+1} ... M_{T-1}]_{:, j}`` — each chunk reduces
    its ascending suffix products locally and composes with the product of
    the chunks after it (one all_gather, same O(S N^2) traffic as forward).
    """
    t, n = log_b.shape
    dtype = log_b.dtype
    seq_size = mesh.shape["seq"]
    if mask is None:
        mask = jnp.ones((t,), bool)
    (log_b_p, mask_p), t_pad = _pad_time([log_b, mask.astype(bool)], t, seq_size)
    mask_p = mask_p.astype(bool) & (jnp.arange(t_pad) < t)

    def shard_fn(log_a, log_b_chunk, mask_chunk):
        idx = jax.lax.axis_index("seq")
        mats = _chunk_ops(log_a, log_b_chunk, mask_chunk, idx == 0)
        suffix = _suffix_scan(log_matmul, mats)  # S_t = M_t ... M_last
        after = _after_product(suffix[0], idx, log_matmul, n, dtype)
        # beta_t needs the suffix starting at t+1
        suffix_next = jnp.concatenate(
            [suffix[1:], _identity_op(n, dtype)[None]], axis=0
        )
        full = log_matmul(suffix_next, after[None])  # (Tc, N, N)
        return logsumexp(full, axis=2)

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P("seq"), P("seq")),
        out_specs=P("seq"),
        check_vma=False,
    )
    log_b_sh = jax.device_put(log_b_p, NamedSharding(mesh, P("seq", None)))
    mask_sh = jax.device_put(mask_p, NamedSharding(mesh, P("seq")))
    return fn(log_a, log_b_sh, mask_sh)[:t]


def viterbi_seq_parallel(
    log_pi: jax.Array,
    log_a: jax.Array,
    log_b: jax.Array,
    mesh: Mesh,
    mask: Optional[jax.Array] = None,
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

    Any T (auto-padded) and optional masks; masked frames repeat the last
    valid state, as in :func:`lnasr_tpu.ops.trellis.viterbi_scan`.

    Returns ``(path (T,) int32, best score)``.
    """
    t, n = log_b.shape
    dtype = log_b.dtype
    seq_size = mesh.shape["seq"]
    if mask is None:
        mask = jnp.ones((t,), bool)
    (log_b_p, mask_p), t_pad = _pad_time([log_b, mask.astype(bool)], t, seq_size)
    mask_p = mask_p.astype(bool) & (jnp.arange(t_pad) < t)

    def shard_fn(v0, log_a, log_b_chunk, mask_chunk):
        idx = jax.lax.axis_index("seq")
        mats = _chunk_ops(log_a, log_b_chunk, mask_chunk, idx == 0)
        prefix = jax.lax.associative_scan(maxplus_matmul, mats, axis=0)
        before = _before_product(prefix[-1], idx, maxplus_matmul, n, dtype)
        # v rows for this chunk, plus the previous chunk's last row
        full_prefix = maxplus_matmul(before[None], prefix)  # (Tc, N, N)
        v_chunk = jnp.max(v0[None, :, None] + full_prefix, axis=1)  # (Tc, N)
        v_prev_last = jnp.max(v0[:, None] + before, axis=0)  # (N,)

        # local backpointers against the *operator* matrices, so masked
        # frames point to themselves (identity), as in viterbi_scan;
        # frame 0 of the chunk points into the previous chunk
        v_prev = jnp.concatenate([v_prev_last[None], v_chunk[:-1]], axis=0)
        bt = jnp.argmax(v_prev[:, :, None] + mats, axis=1)  # (Tc, N)
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
        in_specs=(P(), P(), P("seq"), P("seq")),
        out_specs=(P("seq"), P("seq"), P()),
        check_vma=False,
    )
    v0 = log_pi + log_b[0]
    log_b_sh = jax.device_put(log_b_p, NamedSharding(mesh, P("seq", None)))
    mask_sh = jax.device_put(mask_p, NamedSharding(mesh, P("seq")))
    v, paths, boundaries = fn(v0, log_a, log_b_sh, mask_sh)
    # compose chunk exits right-to-left (S tiny sequential steps); the
    # best final state is read from the last *valid* frame's row
    exit_states = [jnp.argmax(v[t - 1]).astype(jnp.int32)]
    last_chunk = (t - 1) // (t_pad // seq_size)
    for c in range(seq_size - 1, 0, -1):
        if c > last_chunk:
            exit_states.append(exit_states[-1])  # padded chunks: unused
        else:
            exit_states.append(boundaries[c][exit_states[-1]].astype(jnp.int32))
    exit_states = jnp.stack(exit_states[::-1])  # (S,), exit state per chunk
    tc = t_pad // seq_size
    col = jnp.repeat(exit_states, tc)  # (T_pad,)
    path = jnp.take_along_axis(paths, col[:, None], axis=1)[:, 0]
    return path[:t], jnp.max(v[t - 1])
