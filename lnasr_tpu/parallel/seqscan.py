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

from lnasr_tpu.ops.numerics import log_matmul, logsumexp


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
