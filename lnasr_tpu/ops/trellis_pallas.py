"""Pallas TPU kernel for batched Viterbi decoding.

The ``lax.scan`` Viterbi (:func:`lnasr_tpu.ops.trellis.viterbi_scan`) pays
a fixed per-step cost for T sequential steps on tiny (B, N) operands —
the classic latency-bound trellis problem. This kernel runs the entire
trellis *and* the backtrace inside VMEM:

- layout: states on the sublane axis (N padded to 8), utterances on the
  lane axis (batch tiled by 128), time as the leading dimension — so one
  trellis step is a single (8, 8, 128) VPU max/argmax;
- the whole emission block, backpointer store, and output path live in
  VMEM (T*8*128 f32 + int32 ~ 8 MB at T=1000);
- the backtrace runs in the same kernel as a reverse ``fori_loop`` using a
  one-hot select over sublanes, so only the final (B, T) int32 path leaves
  the chip — the design target from BASELINE.json ("beam/Viterbi
  backpointer state stays device-resident with host transfer only at
  final traceback").

Grid: one program per 128-utterance tile. Falls back to the scan
implementation when N > 8 or T exceeds the VMEM budget (the composed
word-graph decoder with hundreds of states uses the scan path; this
kernel serves the small-N acoustic trellis at high batch).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30  # padding value: behaves like -inf under max without NaN risk

_LANES = 128
_SUB = 8  # state padding (f32 sublane tile)


def _viterbi_kernel(log_pi_ref, log_a_ref, log_b_ref, path_ref, score_ref,
                    v_ref, bt_ref):
    """One batch tile: forward max-plus trellis then in-VMEM backtrace.

    Shapes (all VMEM): log_pi (SUB, 1), log_a (SUB, SUB),
    log_b (T, SUB, LANES), path out (T, LANES) int32,
    score out (1, LANES), v scratch (SUB, LANES),
    bt scratch (T, SUB, LANES) int32.
    """
    t_len = log_b_ref.shape[0]

    v_ref[:, :] = log_pi_ref[:, :] + log_b_ref[0]

    log_a = log_a_ref[:, :]

    def fwd_step(t, _):
        v = v_ref[:, :]  # (SUB, LANES)
        # cand[i, j, b] = v[i, b] + A[i, j]
        cand = v[:, None, :] + log_a[:, :, None]
        v_ref[:, :] = jnp.max(cand, axis=0) + log_b_ref[t]
        bt_ref[t] = jnp.argmax(cand, axis=0).astype(jnp.int32)
        return 0

    jax.lax.fori_loop(1, t_len, fwd_step, 0)

    v = v_ref[:, :]
    score_ref[0, :] = jnp.max(v, axis=0)
    last = jnp.argmax(v, axis=0).astype(jnp.int32)  # (LANES,)
    path_ref[t_len - 1, :] = last

    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANES), 0)

    def back_step(k, state):
        # state: (LANES,) int32 path at time t+1; t runs T-2 .. 0
        t = t_len - 2 - k
        onehot = sub_iota == state[None, :]
        # keep the reduction in int32 (x64 mode would promote the sum)
        prev = jnp.sum(
            jnp.where(onehot, bt_ref[t + 1], 0), axis=0, dtype=jnp.int32
        )
        path_ref[t, :] = prev
        return prev

    jax.lax.fori_loop(0, t_len - 1, back_step, last)


def _pad_to(x: jax.Array, size: int, axis: int, value) -> jax.Array:
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(jax.jit, static_argnames=("interpret",))
def viterbi_pallas(
    log_pi: jax.Array,
    log_a: jax.Array,
    log_b: jax.Array,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Batched Viterbi decode: ``log_b (B, T, N)`` -> ``(path (B, T) int32,
    score (B,))``. Requires N <= 8; B is padded to a multiple of 128
    internally. Set ``interpret=True`` off-TPU (tests)."""
    b, t_len, n = log_b.shape
    if n > _SUB:
        raise ValueError(f"viterbi_pallas supports N <= {_SUB}, got {n}")
    dtype = log_b.dtype

    lanes = _LANES
    b_pad = -(-b // lanes) * lanes
    # pad states with NEG so they never win the max; pad batch with zeros
    pi_p = _pad_to(log_pi.astype(dtype), _SUB, 0, NEG)[:, None]  # (SUB, 1)
    a_p = _pad_to(_pad_to(log_a.astype(dtype), _SUB, 0, NEG), _SUB, 1, NEG)
    lb = _pad_to(log_b, _SUB, 2, NEG)
    lb = _pad_to(lb, b_pad, 0, 0.0)
    lb = jnp.transpose(lb, (1, 2, 0))  # (T, SUB, B)

    grid = (b_pad // lanes,)
    path, score = pl.pallas_call(
        _viterbi_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_SUB, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUB, _SUB), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t_len, _SUB, lanes), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((t_len, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_len, b_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, b_pad), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((_SUB, lanes), dtype),
            pltpu.VMEM((t_len, _SUB, lanes), jnp.int32),
        ],
        interpret=interpret,
    )(pi_p, a_p, lb)
    return jnp.transpose(path)[:b], score[0, :b]


def viterbi_batched(
    log_pi: jax.Array,
    log_a: jax.Array,
    log_b: jax.Array,
    interpret: bool = False,
    vmem_budget_bytes: int = 12 * 1024 * 1024,
) -> Tuple[jax.Array, jax.Array]:
    """Batched Viterbi with automatic kernel/scan dispatch.

    Uses the Pallas kernel when the state count fits the sublane tile and
    the trellis fits VMEM; otherwise falls back to the vmapped
    ``lax.scan`` implementation (identical results)."""
    from lnasr_tpu.ops.trellis import viterbi_scan

    b, t_len, n = log_b.shape
    # emissions + backpointers + path per tile
    vmem_needed = t_len * _SUB * _LANES * 4 * 2 + t_len * _LANES * 4
    if n <= _SUB and vmem_needed <= vmem_budget_bytes:
        return viterbi_pallas(log_pi, log_a, log_b, interpret=interpret)
    res = jax.vmap(lambda lb: viterbi_scan(log_pi, log_a, lb))(log_b)
    return res.path, res.score
