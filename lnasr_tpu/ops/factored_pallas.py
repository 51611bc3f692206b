"""Pallas TPU kernel for the factored word-graph Viterbi forward pass.

The recognizer's flagship search (:class:`lnasr_tpu.models.decoder.
FactoredDecodingGraph`) advances a (V, S) trellis grid per frame: a
batched within-word max-plus over (V, S, S) blocks plus a (V, V)
word-hop reduction. As a ``lax.scan`` every step re-touches the 4 MB hop
matrix and re-lays out the grid; this kernel keeps the graph (inner
blocks, hop matrix, masks) and the running grid resident in VMEM for the
whole utterance and streams only emissions in / trellis rows out.

Layout: words on the LANE axis (V padded to a multiple of 128), local
states on sublanes (S padded to 8). One frame is

  within[j, :] = max_s  grid[s, :] + inner_a[s, j, :]       (8x8 VPU max)
  exit_row     = max_s  grid[s, :] + exit_mask[s, :]        (1, V)
  exit_col     = eye @ exit_row^T       (MXU lane->sublane relayout)
  entry        = max over 'from' of exit_col + hop     (one fused (V,V) op)
  grid         = merge(within, entry at s=0) + emissions

No backpointers are stored: the kernel writes each frame's grid to HBM
and the backtrace re-derives every argmax — in a second Pallas kernel
(:func:`factored_decode_pallas`, the serving path: the T-step XLA scan
it replaced was 25.6 of the 28.9 ms 1k-word decode) or in the XLA scan
(:func:`factored_backtrace`, the hop-less / parity path). Max-plus is
EXACTLY associative, so the stored values are bitwise equal to the
``lax.scan`` reference and the replayed argmaxes recover the identical
path (same first-max and strict ``entry > within`` tie rules as
``FactoredDecodingGraph._decode_fn``).

Unreachable states carry the finite ``NEG`` sentinel instead of -inf
(0 * -inf in the MXU relayout would make NaNs); they sit ~1e26 below any
feasible path and can never win.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lnasr_tpu.ops.trellis_pallas import (
    NEG,
    _LANES,
    relayout_eye3,
    row_to_col_split3,
)

_SUB = 8
_TC = 16  # frames per grid step (dense hop; rank-1 adapts to V)


def _rank1_tc(v_pad: int) -> int:
    """Frames per grid step for the rank-1 hop kernels: the (TC, S, V)
    emission/grid blocks are the VMEM driver once the (V, V) matrix is
    gone, so TC shrinks as V grows. TC=8 is the floor — Pallas requires
    the 2-D output blocks' second-minor dim divisible by 8 (a TC=4 tier
    failed exactly that lowering check at V=10k on hardware)."""
    return 16 if v_pad <= 2048 else 8


def _rank1_entry_rows(exit_row, hopr_ref):
    """Rank-1 word entry on lane layout: ``hopr`` rows are 0=from_w,
    1=uni, 2=sil_from, 3=silence one-hot. Returns ``(entry (1, V),
    a1, m2, a2)`` — the rank-1 entry merged with the silence column,
    plus the argmax source lanes (a1 real words, a2 silence). No
    lane->sublane relayout exists in this mode at all (the dense
    kernel's measured top cost)."""
    v_pad = exit_row.shape[1]
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, v_pad), 1)
    big = jnp.int32(v_pad + 1)
    base = exit_row + hopr_ref[0:1, :]
    m1 = jnp.max(base)
    a1 = jnp.min(jnp.where(base == m1, lane1, big))
    entry = m1 + hopr_ref[1:2, :]
    base2 = exit_row + hopr_ref[2:3, :]
    m2 = jnp.max(base2)
    a2 = jnp.min(jnp.where(base2 == m2, lane1, big))
    entry = jnp.where(hopr_ref[3:4, :] > 0, m2, entry)
    return entry, a1, m2, a2


def _fwd_kernel(pi_ref, at_ref, exitm_ref, hop_ref, eye_ref, logb_ref,
                mask_ref, out_ref, v_ref, *, hop_kind: str):
    """One block of TC frames. Shapes: pi (S, V), at (S, S, V) with
    ``at[s, j, v] = inner_a[v, s, j]``, exitm (S, V), hop (V, V) dense /
    (S, V) packed rank-1 rows, eye (V, V), logb/out (TC, S, V) — all
    VMEM; mask (T_pad,) int32 lives UNBLOCKED in SMEM, indexed by the
    global frame id (newer Pallas rejects rank-1 SMEM block shapes that
    are neither the full array nor 128-multiples; masked frames are
    identity steps: grid unchanged). Scratch v (S, V) persists across
    grid steps. ``hop_kind``: "none" (loop-free), "dense", or "rank1"
    (backoff word-loop: entry = max(exit + from) + uni, silence column
    separate — see :func:`_rank1_entry_rows`)."""
    tc, s_pad, v_pad = logb_ref.shape
    blk = pl.program_id(0)
    dtype = v_ref.dtype

    def frame(i):
        t = blk * tc + i
        lb = logb_ref[i]
        valid = mask_ref[t] > 0

        @pl.when(t == 0)
        def _():
            v_ref[:, :] = pi_ref[:, :] + lb

        @pl.when((t > 0) & valid)
        def _():
            vg = v_ref[:, :]
            within = jnp.max(vg[:, None, :] + at_ref[:, :, :], axis=0)
            if hop_kind != "none":
                exit_row = jnp.max(vg + exitm_ref[:, :], axis=0,
                                   keepdims=True)  # (1, V)
                if hop_kind == "rank1":
                    entry, _, _, _ = _rank1_entry_rows(exit_row, hop_ref)
                else:
                    # lane->sublane relayout, bitwise exact (a plain-bf16
                    # matmul would round the values and break the bitwise
                    # replay backtrace; a HIGHEST (V,V) identity costs ~16x
                    # the MXU issue — measured as the kernel's top cost)
                    exit_col = row_to_col_split3(eye_ref, exit_row, dtype)  # (V, 1)
                    # one fused (V, V) add + full-axis max (a chunked fori_loop
                    # here ran slower than the lax.scan decoder: 128 tiny loop
                    # iterations starve the VPU)
                    entry = jnp.max(exit_col + hop_ref[:, :], axis=0,
                                    keepdims=True)  # (1, V)
                ridx = jax.lax.broadcasted_iota(jnp.int32, (s_pad, v_pad), 0)
                within = jnp.where(
                    ridx == 0, jnp.maximum(within, entry), within
                )
            v_ref[:, :] = within + lb

        out_ref[i] = v_ref[:, :]

    # 4-way unrolled: measured neutral at V=1024 (the (V,V) hop work
    # dominates loop control) but it helps smaller vocabularies, where
    # per-frame work shrinks toward the small-N kernel's regime
    unroll = 4
    assert tc % unroll == 0

    def frames(q, _):
        for r in range(unroll):
            frame(q * unroll + r)
        return 0

    jax.lax.fori_loop(0, tc // unroll, frames, 0)


def _finite(x, dtype):
    return jnp.maximum(jnp.asarray(x, dtype), NEG)


def _pad(x, target: int, axis: int):
    if x.shape[axis] == target:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, target - x.shape[axis])
    return jnp.pad(x, widths, constant_values=NEG)


def _is_factors(hop) -> bool:
    """Backoff :class:`~lnasr_tpu.models.decoder.HopFactors` duck-typed
    (ops must not import models)."""
    return hop is not None and hasattr(hop, "from_w")


def _pack_rank1_rows(hop, v_pad, dtype):
    """(S, V) packed rank-1 hop rows: 0=from_w, 1=uni, 2=sil_from,
    3=silence one-hot, rest NEG. Kernel-mode rank-1 requires the factors
    to carry no sparse edges (the word-loop serving realization); the
    decoder dispatch guarantees that."""
    rows = [
        _pad(_finite(hop.from_w, dtype), v_pad, 0),
        _pad(_finite(hop.uni, dtype), v_pad, 0),
        _pad(_finite(hop.sil_from, dtype), v_pad, 0),
        jnp.where(jnp.arange(v_pad) == hop.sil_idx, 1.0, 0.0).astype(dtype),
    ]
    filler = jnp.full((_SUB - len(rows), v_pad), NEG, dtype)
    return jnp.concatenate([jnp.stack(rows), filler], axis=0)


def _prep_forward_inputs(pi_grid, inner_a, exit_idx, hop, log_b_grid, mask):
    """Padded kernel-layout operands shared by the forward and fused
    decode entry points. Returns a dict of arrays plus the padded dims
    and the hop kind/frame-block size."""
    t_len, v_words, s_max = log_b_grid.shape
    dtype = log_b_grid.dtype
    if dtype != jnp.float32:
        # the exact-relayout decomposition (3 bf16 parts) covers exactly
        # the 24-bit f32 significand; wider dtypes would lose bits and
        # break the bitwise-replay backtrace
        raise ValueError(f"factored Pallas decode requires float32, got {dtype}")
    v_pad = max(_LANES, -(-v_words // _LANES) * _LANES)
    if hop is None:
        hop_kind = "none"
    elif _is_factors(hop):
        hop_kind = "rank1"
    else:
        hop_kind = "dense"
    tc = _rank1_tc(v_pad) if hop_kind == "rank1" else _TC
    t_pad = -(-t_len // tc) * tc

    pi = _pad(_pad(_finite(pi_grid, dtype), v_pad, 0).T, _SUB, 0)  # (S, V)
    at = jnp.transpose(
        _pad(_pad(_pad(_finite(inner_a, dtype), v_pad, 0), _SUB, 1), _SUB, 2),
        (1, 2, 0),
    )  # (S, S, V): at[s, j, v] = inner_a[v, s, j]
    exitm = jnp.where(
        jnp.arange(_SUB)[:, None] == _pad_idx(exit_idx, v_pad)[None, :],
        0.0, NEG,
    ).astype(dtype)  # (S, V); padded words have exit_idx sentinel -1 -> NEG
    if hop_kind == "dense":
        hop_p = _pad(_pad(_finite(hop, dtype), v_pad, 0), v_pad, 1)
    elif hop_kind == "rank1":
        hop_p = _pack_rank1_rows(hop, v_pad, dtype)
    else:
        hop_p = jnp.full((_SUB, v_pad), NEG, dtype)  # unused placeholder
    # [I|I|I] (128, 384) block for the chunked exact relayout (one
    # single-pass MXU product per 128-lane chunk)
    eye = relayout_eye3(dtype)
    lb = jnp.transpose(
        _pad(_pad(_finite(log_b_grid, dtype), v_pad, 1), _SUB, 2), (0, 2, 1)
    )
    if t_pad != t_len:
        lb = jnp.pad(lb, [(0, t_pad - t_len), (0, 0), (0, 0)],
                     constant_values=NEG)
    m = (jnp.ones((t_len,), jnp.int32) if mask is None
         else jnp.asarray(mask, jnp.int32))
    m = jnp.pad(m, (0, t_pad - t_len))  # T-padding frames are masked too
    return dict(pi=pi, at=at, exitm=exitm, hop_p=hop_p, eye=eye, lb=lb, m=m,
                t_len=t_len, t_pad=t_pad, v_pad=v_pad, v_words=v_words,
                s_max=s_max, dtype=dtype, hop_kind=hop_kind, tc=tc)


def _forward_raw(prep, interpret):
    """The forward pallas_call on padded operands; returns the raw
    ``(t_pad, _SUB, v_pad)`` grid buffer (kernel layout)."""
    t_pad, v_pad, dtype = prep["t_pad"], prep["v_pad"], prep["dtype"]
    tc = prep["tc"]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, hop_kind=prep["hop_kind"]),
        grid=(t_pad // tc,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # pi
            pl.BlockSpec(memory_space=pltpu.VMEM),  # at
            pl.BlockSpec(memory_space=pltpu.VMEM),  # exitm
            pl.BlockSpec(memory_space=pltpu.VMEM),  # hop
            pl.BlockSpec(memory_space=pltpu.VMEM),  # eye
            pl.BlockSpec((tc, _SUB, v_pad), lambda b: (b, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # whole mask, unblocked
        ],
        out_specs=pl.BlockSpec((tc, _SUB, v_pad), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((t_pad, _SUB, v_pad), dtype),
        scratch_shapes=[pltpu.VMEM((_SUB, v_pad), dtype)],
        interpret=interpret,
    )(prep["pi"], prep["at"], prep["exitm"], prep["hop_p"], prep["eye"],
      prep["lb"], prep["m"])


@functools.partial(jax.jit, static_argnames=("interpret",))
def factored_forward_pallas(
    pi_grid: jax.Array,  # (V, S) initial log-probs (NEG/-inf padded)
    inner_a: jax.Array,  # (V, S, S)
    exit_idx: jax.Array,  # (V,) int32
    hop: Optional[jax.Array],  # (V, V) or None (loop=False)
    log_b_grid: jax.Array,  # (T, V, S) emissions on the grid
    mask: Optional[jax.Array] = None,  # (T,) valid frames
    interpret: bool = False,
) -> jax.Array:
    """All trellis grids ``(T, V, S)`` of the factored search — bitwise
    equal (max-plus is exactly associative) to the ``lax.scan`` carry in
    :meth:`FactoredDecodingGraph._decode_fn` at every feasible state."""
    prep = _prep_forward_inputs(pi_grid, inner_a, exit_idx, hop, log_b_grid,
                                mask)
    out = _forward_raw(prep, interpret)
    return jnp.transpose(
        out[: prep["t_len"], : prep["s_max"], : prep["v_words"]], (0, 2, 1)
    )


def _bwd_kernel(vg_cur_ref, prev_last_ref, atb_ref, exitm_ref, hop_t_ref,
                eidx_ref, final_ref, mask_ref, path_ref, score_ref,
                state_ref, *, t_len: int, s_max: int, n_blocks: int,
                hop_kind: str):
    """In-kernel backtrace over the stored (reverse-blocked) grids.

    Replays the SAME argmax rules as the XLA :func:`factored_backtrace`
    (first-max ties within a word, first-word ties on hops, strict
    ``hop > within`` preference at local state 0, masked frames
    self-point), so the path is bit-identical — but the whole traceback
    is one sequential in-VMEM loop instead of a T-step XLA scan with
    per-step dispatch (measured 25.6 of the 28.9 ms 1k-word decode).

    Layouts: vg blocks (TC, S, V) + the previous block's last grid row
    (1, S, V); atb (S_j, S_from, V) with
    ``atb[j, s, v] = inner_a[v, s, j]``; hop_t (V_to, V_from) =
    ``hop.T``; eidx (1, V) int32 exit-state indices; final (S, V);
    mask (T_pad,) int32 in SMEM. Outputs: path (TC, 128) int32 blocks
    (column 0), score (1, 1) SMEM. state scratch: SMEM (1,) int32.
    """
    tc, s_pad, v_pad = vg_cur_ref.shape
    i = pl.program_id(0)
    rev_b = n_blocks - 1 - i
    b0 = rev_b * tc
    big = jnp.int32(v_pad * s_max + s_max)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, v_pad), 1)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (s_pad, v_pad), 1)
    sub2 = jax.lax.broadcasted_iota(jnp.int32, (s_pad, v_pad), 0)

    def frame_at(t, lt):

        @pl.when(t == t_len - 1)
        def _():
            vals = vg_cur_ref[lt] + final_ref[:, :]
            best = jnp.max(vals)
            score_ref[0, 0] = best
            lin = lane2 * s_max + sub2  # flat (v*S + s) ids, XLA argmax order
            state_ref[0] = jnp.min(jnp.where(vals == best, lin, big))

        @pl.when(t < t_len)
        def _():
            state = state_ref[0]
            path_ref[lt, :] = jnp.broadcast_to(state, (path_ref.shape[1],))

            @pl.when(t >= 1)
            def _():
                lp = lt - 1
                lpc = jnp.maximum(lp, 0)
                vprev = jnp.where(
                    lp >= 0, vg_cur_ref[lpc], prev_last_ref[0]
                )  # (S, V); frame 0 of a block reads the previous
                # block's LAST row (streamed as a tiny (1, S, V) block
                # instead of re-reading the whole previous grid block —
                # the overlapping double-read was ~half the backtrace's
                # HBM traffic)
                v_w = state // s_max
                j = state % s_max
                atb_j = atb_ref[pl.ds(j, 1)][0]  # (S_from, V)
                cand = jnp.where(lane2 == v_w, vprev + atb_j, NEG)
                m_val = jnp.max(cand)
                pred_s = jnp.min(jnp.where(cand == m_val, sub2, big))
                pred = v_w * s_max + pred_s

                exit_row = jnp.max(vprev + exitm_ref[:, :], axis=0,
                                   keepdims=True)  # (1, V) word exit scores
                if hop_kind == "rank1":
                    # packed rank-1 rows (see _rank1_entry_rows); same
                    # argmax-lane tie rules as the scan's _hop_entry
                    base = exit_row + hop_t_ref[0:1, :]
                    m1 = jnp.max(base)
                    a1 = jnp.min(jnp.where(base == m1, lane1, big))
                    uni_w = jnp.max(
                        jnp.where(lane1 == v_w, hop_t_ref[1:2, :], NEG)
                    )
                    base2 = exit_row + hop_t_ref[2:3, :]
                    m2 = jnp.max(base2)
                    a2 = jnp.min(jnp.where(base2 == m2, lane1, big))
                    is_sil = jnp.max(
                        jnp.where(lane1 == v_w, hop_t_ref[3:4, :], 0.0)
                    ) > 0
                    hmax = jnp.where(is_sil, m2, m1 + uni_w)
                    esrc = jnp.where(is_sil, a2, a1)
                else:
                    hop_row = hop_t_ref[pl.ds(v_w, 1), :]  # (1, V): hop[:, v_w]
                    hop_cand = exit_row + hop_row
                    hmax = jnp.max(hop_cand)
                    esrc = jnp.min(jnp.where(hop_cand == hmax, lane1, big))
                exit_s = jnp.sum(
                    jnp.where(lane1 == esrc, eidx_ref[:, :], 0),
                    dtype=jnp.int32,
                )
                use_hop = (j == 0) & (hmax > m_val)
                pred = jnp.where(use_hop, esrc * s_max + exit_s, pred)
                valid = mask_ref[t] > 0
                state_ref[0] = jnp.where(valid, pred, state)

    # 4-way unrolled descending loop (loop-control amortization, as in
    # the small-N Viterbi kernel; measured neutral at V=1024 where the
    # per-frame selects dominate, helpful below that)
    unroll = 4
    assert tc % unroll == 0

    def frames(q, _):
        for r in range(unroll):
            k = q * unroll + r
            lt = tc - 1 - k
            frame_at(b0 + lt, lt)
        return 0

    jax.lax.fori_loop(0, tc // unroll, frames, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def factored_decode_pallas(
    pi_grid: jax.Array,
    inner_a: jax.Array,
    exit_idx: jax.Array,
    hop: jax.Array,  # (V, V); the kernel backtrace requires a hop matrix
    log_b_grid: jax.Array,
    log_final_grid: jax.Array,  # (V, S)
    mask: Optional[jax.Array] = None,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Fused forward + backtrace, both as Pallas kernels: ``(path (T,)
    int32 in v*S+s ids, score)`` — bit-identical to
    :func:`factored_forward_pallas` + :func:`factored_backtrace` but
    without the T-step XLA backtrace scan (which dominated decode time)
    and without materializing the sliced/transposed grids in between."""
    prep = _prep_forward_inputs(pi_grid, inner_a, exit_idx, hop, log_b_grid,
                                mask)
    t_len, t_pad, tc = prep["t_len"], prep["t_pad"], prep["tc"]
    v_pad, s_max, dtype = prep["v_pad"], prep["s_max"], prep["dtype"]
    hop_kind = prep["hop_kind"]
    vgrids = _forward_raw(prep, interpret)

    atb = jnp.transpose(prep["at"], (1, 0, 2))  # (S_j, S_from, V)
    # dense mode indexes hop columns as rows (hop.T); rank-1 keeps its
    # packed (S, V) row layout
    hop_t = (prep["hop_p"] if hop_kind == "rank1"
             else jnp.transpose(prep["hop_p"]))
    eidx = jnp.maximum(_pad_idx(exit_idx, v_pad), 0)[None, :]  # (1, V) i32
    fin = _pad(_pad(_finite(log_final_grid, dtype), v_pad, 0).T, _SUB, 0)

    n_blocks = t_pad // tc
    # each block's LAST grid row, for the cross-block vprev at a block's
    # first frame — a (n_blocks, 1, S, V) side input instead of
    # re-streaming every previous grid block (halves backtrace reads)
    last_rows = vgrids[tc - 1 :: tc]  # (n_blocks, S, V)
    path, score = pl.pallas_call(
        functools.partial(_bwd_kernel, t_len=t_len, s_max=s_max,
                          n_blocks=n_blocks, hop_kind=hop_kind),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((tc, _SUB, v_pad),
                         lambda b: (n_blocks - 1 - b, 0, 0)),
            pl.BlockSpec((1, _SUB, v_pad),
                         lambda b: (jnp.maximum(n_blocks - 2 - b, 0),
                                    0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # atb
            pl.BlockSpec(memory_space=pltpu.VMEM),  # exitm
            pl.BlockSpec(memory_space=pltpu.VMEM),  # hop_t
            pl.BlockSpec(memory_space=pltpu.VMEM),  # exit idx
            pl.BlockSpec(memory_space=pltpu.VMEM),  # final
            pl.BlockSpec(memory_space=pltpu.SMEM),  # mask
        ],
        out_specs=[
            pl.BlockSpec((tc, _LANES), lambda b: (n_blocks - 1 - b, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), dtype),
        ],
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(vgrids, last_rows, atb, prep["exitm"], hop_t, eidx, fin, prep["m"])
    return path[:t_len, 0], score[0, 0]


def _pad_idx(exit_idx, v_pad):
    idx = jnp.asarray(exit_idx, jnp.int32)
    if idx.shape[0] < v_pad:
        idx = jnp.pad(idx, (0, v_pad - idx.shape[0]), constant_values=-1)
    return idx


def factored_backtrace(
    vgrids: jax.Array,  # (T, V, S)
    inner_a: jax.Array,  # (V, S, S)
    exit_idx: jax.Array,  # (V,)
    hop: Optional[jax.Array],  # (V, V) or None
    log_final_grid: jax.Array,  # (V, S) termination weights
    mask: Optional[jax.Array] = None,  # (T,) valid frames
) -> Tuple[jax.Array, jax.Array]:
    """Exact-replay backtrace over stored grids: ``(path (T,) int32 in
    v*S+s ids, score)``. Re-derives each step's argmax with the same
    first-max / strict ``entry > within`` rules as the scan decoder;
    masked frames self-point (the forward treated them as identity).
    ``hop`` must be a dense matrix or None (backoff-factored decodes
    ride :func:`factored_decode_pallas`'s in-kernel backtrace or the
    scan realization, which carries its own backpointers)."""
    t_len, v_words, s_max = vgrids.shape
    exit_idx = jnp.asarray(exit_idx, jnp.int32)
    valid = jnp.ones((t_len,), bool) if mask is None else jnp.asarray(mask, bool)

    flat = (vgrids[-1] + log_final_grid).reshape(-1)
    last = jnp.argmax(flat).astype(jnp.int32)
    score = flat[last]

    def backstep(state, inputs):
        vprev, v_t = inputs
        v_w = state // s_max
        j = state % s_max
        cand = vprev[v_w] + inner_a[v_w, :, j]  # (S,)
        m = jnp.max(cand)
        pred = (v_w * s_max + jnp.argmax(cand)).astype(jnp.int32)
        if hop is not None:
            exit_vals = jnp.take_along_axis(
                vprev, exit_idx[:, None], axis=1
            )[:, 0]
            hop_cand = exit_vals + hop[:, v_w]
            esrc = jnp.argmax(hop_cand).astype(jnp.int32)
            use_hop = (j == 0) & (jnp.max(hop_cand) > m)
            pred = jnp.where(use_hop, esrc * s_max + exit_idx[esrc], pred)
        pred = jnp.where(v_t, pred, state)
        return pred, pred

    _, head = jax.lax.scan(
        backstep, last, (vgrids[:-1], valid[1:]), reverse=True
    )
    return jnp.concatenate([head, last[None]]), score


def factored_pallas_ok(t_len: int, v_words: int,
                       vmem_budget: int = 13 * 1024 * 1024,
                       hbm_budget: int = 2 * 1024**3) -> bool:
    """Whether the kernel's resident graph (hop + blocks; the relayout
    identity is a fixed 128x128) fits VMEM and the stored grids fit a
    sane HBM budget."""
    v_pad = max(_LANES, -(-v_words // _LANES) * _LANES)
    vmem = (v_pad * v_pad + _SUB * _SUB * v_pad + 3 * _SUB * v_pad
            + 2 * _TC * _SUB * v_pad) * 4 + _LANES * _LANES * 2
    hbm = (-(-t_len // _TC) * _TC) * _SUB * v_pad * 4
    return vmem <= vmem_budget and hbm <= hbm_budget


def factored_rank1_ok(t_len: int, v_words: int,
                      vmem_budget: int = 15 * 1024 * 1024 + 512 * 1024,
                      hbm_budget: int = 2 * 1024**3) -> bool:
    """Capacity check for the rank-1 (word-loop) hop kernels: with no
    (V, V) matrix the VMEM drivers are the inner blocks and the
    double-buffered (TC, S, V) emission/grid pipeline blocks; TC shrinks
    with V (:func:`_rank1_tc`), so vocabularies ~6x past the dense cap
    fit (~10.7k words at TC=8; beyond that the scan realization takes
    over)."""
    v_pad = max(_LANES, -(-v_words // _LANES) * _LANES)
    tc = _rank1_tc(v_pad)
    vmem = (_SUB * _SUB * v_pad + 7 * _SUB * v_pad
            + 4 * tc * _SUB * v_pad) * 4 + _LANES * _LANES * 2
    hbm = (-(-t_len // tc) * tc) * _SUB * v_pad * 4
    return vmem <= vmem_budget and hbm <= hbm_budget


def _lattice_kernel(pi_ref, at_ref, exitm_ref, eidx_ref, hop_ref, eye_ref,
                    logb_ref, mask_ref, score_ref, start_ref_o, pred_ref_o,
                    v_ref, st_ref, pr_ref, *, hop_kind: str):
    """Lattice-recording forward: the :func:`_fwd_kernel` trellis PLUS
    token metadata — every grid state carries the frame its current word
    token was entered (``start``) and the word it was entered from
    (``pred``); per frame each word's exit-state record
    ``(score, start, pred)`` streams out. Bitwise/value-identical to
    ``models.decoder.factored_lattice_scan`` (same max-plus adds, same
    first-max argmax and strict ``entry > within`` rules, replicated here
    with masked min-index selects).

    Shapes: pi/exitm (S, V), at (S_from, S_to, V), eidx (1, V) int32,
    hop (V, V) [from-sublane, to-lane], eye (128, 384); logb blocks
    (TC, S, V); outputs per block (TC, V) f32/i32/i32; scratch v (S, V)
    f32 + start/pred (S, V) int32 persist across grid steps.
    """
    tc, s_pad, v_pad = logb_ref.shape
    blk = pl.program_id(0)
    dtype = v_ref.dtype
    big = jnp.int32(v_pad * s_pad + s_pad)
    sub2 = jax.lax.broadcasted_iota(jnp.int32, (s_pad, v_pad), 0)
    sub_col = jax.lax.broadcasted_iota(jnp.int32, (v_pad, 1), 0)
    emask = sub2 == eidx_ref[:, :]  # (S, V) one-hot of each word's exit

    def frame(i):
        t = blk * tc + i
        lb = logb_ref[i]
        valid = mask_ref[t] > 0

        @pl.when(t == 0)
        def _():
            v_ref[:, :] = pi_ref[:, :] + lb
            st_ref[:, :] = jnp.zeros((s_pad, v_pad), jnp.int32)
            pr_ref[:, :] = jnp.full((s_pad, v_pad), -1, jnp.int32)

        @pl.when((t > 0) & valid)
        def _():
            vg = v_ref[:, :]
            cand = vg[:, None, :] + at_ref[:, :, :]  # (S_from, S_to, V)
            within = jnp.max(cand, axis=0)  # (S_to, V)
            # first-max predecessor per (j, v), then gather start/pred
            # from that sublane via one-hot selects (S is tiny)
            wsrc = jnp.min(
                jnp.where(cand == within[None, :, :],
                          jax.lax.broadcasted_iota(
                              jnp.int32, (s_pad, s_pad, v_pad), 0),
                          big),
                axis=0,
            )  # (S_to, V)
            st, pr = st_ref[:, :], pr_ref[:, :]
            new_start = jnp.zeros((s_pad, v_pad), jnp.int32)
            new_pred = jnp.zeros((s_pad, v_pad), jnp.int32)
            for s in range(s_pad):
                new_start = jnp.where(wsrc == s, st[s : s + 1, :], new_start)
                new_pred = jnp.where(wsrc == s, pr[s : s + 1, :], new_pred)

            exit_row = jnp.max(vg + exitm_ref[:, :], axis=0, keepdims=True)
            if hop_kind == "rank1":
                entry, a1, _, a2 = _rank1_entry_rows(exit_row, hop_ref)
                esrc = jnp.where(hop_ref[3:4, :] > 0, a2, a1).astype(
                    jnp.int32
                )  # (1, V): rank-1 winner, silence's winner at its lane
            else:
                exit_col = row_to_col_split3(eye_ref, exit_row, dtype)  # (V, 1)
                cand_hop = exit_col + hop_ref[:, :]  # (V_from, V_to)
                entry = jnp.max(cand_hop, axis=0, keepdims=True)  # (1, V)
                esrc = jnp.min(
                    jnp.where(cand_hop == entry, sub_col, big), axis=0,
                    keepdims=True,
                ).astype(jnp.int32)  # (1, V) first-from-word
            hop_wins = entry > within[0:1, :]
            ridx = sub2 == 0
            row0 = jnp.broadcast_to(jnp.maximum(within[0:1, :], entry),
                                    (s_pad, v_pad))
            within = jnp.where(ridx, row0, within)
            new_start = jnp.where(
                ridx & jnp.broadcast_to(hop_wins, (s_pad, v_pad)),
                t, new_start,
            )
            new_pred = jnp.where(
                ridx & jnp.broadcast_to(hop_wins, (s_pad, v_pad)),
                jnp.broadcast_to(esrc, (s_pad, v_pad)), new_pred,
            )
            v_ref[:, :] = within + lb
            st_ref[:, :] = new_start
            pr_ref[:, :] = new_pred

        # per-frame exit records (masked frames repeat the carried state)
        @pl.when(t >= 0)
        def _():
            v = v_ref[:, :]
            score_ref[i, :] = jnp.max(v + exitm_ref[:, :], axis=0)
            start_ref_o[i, :] = jnp.sum(
                jnp.where(emask, st_ref[:, :], 0), axis=0, dtype=jnp.int32
            )
            pred_ref_o[i, :] = jnp.sum(
                jnp.where(emask, pr_ref[:, :], 0), axis=0, dtype=jnp.int32
            )

    unroll = 4
    assert tc % unroll == 0

    def frames(q, _):
        for r in range(unroll):
            frame(q * unroll + r)
        return 0

    jax.lax.fori_loop(0, tc // unroll, frames, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def factored_lattice_pallas(
    pi_grid: jax.Array,
    inner_a: jax.Array,
    exit_idx: jax.Array,
    hop: jax.Array,  # (V, V); lattices require a looped graph
    log_b_grid: jax.Array,
    mask: Optional[jax.Array] = None,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Lattice-recording forward pass as ONE Pallas kernel:
    ``(exit_score (T, V), exit_start (T, V) i32, exit_pred (T, V) i32)``
    — value-identical to :func:`models.decoder.factored_lattice_scan`'s
    first three outputs, at the trellis kernel's speed (the ``lax.scan``
    recording pass was the N-best serving path's dominant cost)."""
    prep = _prep_forward_inputs(pi_grid, inner_a, exit_idx, hop, log_b_grid,
                                mask)
    t_len, t_pad, tc = prep["t_len"], prep["t_pad"], prep["tc"]
    v_pad, v_words, dtype = prep["v_pad"], prep["v_words"], prep["dtype"]
    eidx = jnp.maximum(_pad_idx(exit_idx, v_pad), -1)[None, :]

    score, start, pred = pl.pallas_call(
        functools.partial(_lattice_kernel, hop_kind=prep["hop_kind"]),
        grid=(t_pad // tc,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # pi
            pl.BlockSpec(memory_space=pltpu.VMEM),  # at
            pl.BlockSpec(memory_space=pltpu.VMEM),  # exitm
            pl.BlockSpec(memory_space=pltpu.VMEM),  # eidx
            pl.BlockSpec(memory_space=pltpu.VMEM),  # hop
            pl.BlockSpec(memory_space=pltpu.VMEM),  # eye
            pl.BlockSpec((tc, _SUB, v_pad), lambda b: (b, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # mask
        ],
        out_specs=[
            pl.BlockSpec((tc, v_pad), lambda b: (b, 0)),
            pl.BlockSpec((tc, v_pad), lambda b: (b, 0)),
            pl.BlockSpec((tc, v_pad), lambda b: (b, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, v_pad), dtype),
            jax.ShapeDtypeStruct((t_pad, v_pad), jnp.int32),
            jax.ShapeDtypeStruct((t_pad, v_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_SUB, v_pad), dtype),
            pltpu.VMEM((_SUB, v_pad), jnp.int32),
            pltpu.VMEM((_SUB, v_pad), jnp.int32),
        ],
        interpret=interpret,
    )(prep["pi"], prep["at"], prep["exitm"], eidx, prep["hop_p"],
      prep["eye"], prep["lb"], prep["m"])
    return (score[:t_len, :v_words], start[:t_len, :v_words],
            pred[:t_len, :v_words])
