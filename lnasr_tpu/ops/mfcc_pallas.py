"""Fused Pallas MFCC frontend: framing -> windowed DFT -> power -> mel.

The XLA frontend (``models/mfcc.py``) is HBM-bound: it materializes the
overlapping frames (~2.5x the signal), the (T, fft/2+1) power spectrum,
and reads both back for the mel matmul. This kernel keeps the whole chain
for a tile of frames inside VMEM and writes only the (T, n_mels [+1])
mel energies — the signal is read once, everything else never touches HBM.

Per (utterance, frame-tile) program:
  1. slice ``TILE_T + p`` rows of the pre-emphasized signal, pre-reshaped
     host-side to ``(rows, frame_step)`` — frame t is rows t..t+p-1, so
     framing is p cheap sublane slices (no gather at all) — and
     lane-concatenate the p row-groups into a VMEM scratch (static
     lane-offset stores; cheap VPU relayout);
  2. the windowed DFT as *split-bf16* GEMMs (operands split into bf16
     hi/lo parts, accumulated over 3 MXU passes — relative error ~2^-18;
     ``passes=6`` is f32-faithful), through a radix ladder picked by
     lane-tile divisibility:
       - **radix-4** (fft_n % 512 == 0, the production case): two
         exact-f32 butterfly levels, then four quarter-size GEMMs (one
         real rFFT_Q + three complex DFT_Q sharing one basis) — 56%
         fewer DFT flops than direct, and the dominant cancellation
         happens before quantization so quiet-frame error drops ~1000x;
       - **radix-2** (fft_n % 256 == 0): one butterfly level, two
         half-size GEMMs;
       - **direct** (everything else): one K = p*step contraction
         against the window-folded ``[C | S]`` basis with the
         always-zero DC/Nyquist im columns dropped (packed 2*kf-2
         lanes);
  3. power spectrum via ``o*o`` and lane rolls (each packed block keeps
     im_k a fixed lane offset after re_k; iota masks zero the wrap
     lanes);
  4. mel energies and total frame energy in one small GEMM over the
     bin-PERMUTED filterbank (the radix interleave is a host-side row
     permutation of a constant — no device-side reorder exists), whose
     last column is the all-ones energy reducer; rows off the valid bins
     are zero, annihilating every roll's wrap-around garbage.

The dB / DCT / delta epilogue stays in XLA (``models/mfcc.py``): it is
(T, 40)-sized, fuses fine, and keeps this kernel output-format agnostic.

Replaces the hot path of the reference's ``calc_mfcc``
(``lnasr/mfcc.py:131-152``) — the rFFT and filterbank product the survey
flags as the frontend's hot loops (SURVEY.md §3.1).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lnasr_tpu.config import MFCCConfig
from lnasr_tpu.ops.framing import num_frames, preemphasis
from lnasr_tpu.ops.spectral import mel_filterbank, windowed_dft_basis

_LANE = 128
# frames per program. Swept on v5e per kernel revision: with the
# K-aligned single-GEMM layout 256 measures best (0.953 ms vs 0.971 at
# 128 and 0.968 at 512 for B=64 x 10 s); the old row-group layout
# preferred 128. Round-4 re-sweep (radix-4 + unrolled era): 128 -> 878,
# 256 -> 757, 512 -> 747 us — 512's 1.3% is inside tunnel jitter and
# would pad every 128-frame serving bucket to 512 frames, so 256 stays.
TILE_T = 256


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _bf16_parts(x: np.ndarray, n: int):
    """Split a float32 array into n bf16 terms summing to ~x (host side)."""
    parts = []
    rem = x.astype(np.float32)
    for _ in range(n):
        p = rem.astype(jnp.bfloat16)
        parts.append(p)
        rem = rem - np.asarray(p, np.float32)
    return parts


def _split_dot(x: jax.Array, y_parts, passes: int) -> jax.Array:
    """f32-accurate matmul from bf16 MXU passes.

    ``passes=3``: two-way splits, drop the lo*lo term (error ~2^-18 of the
    term-magnitude scale). ``passes=6``: three-way splits keeping all terms
    of order >= 2^-24 — f32-faithful, same pass count as XLA HIGHEST.
    """
    dims = (((1,), (0,)), ((), ()))
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=dims,
        preferred_element_type=jnp.float32,
    )
    n_x = 2 if passes == 3 else 3
    xs = []
    rem = x
    for _ in range(n_x):
        p = rem.astype(jnp.bfloat16)
        xs.append(p)
        rem = rem - p.astype(x.dtype)
    acc = None
    for i, xp in enumerate(xs):
        for j, yp in enumerate(y_parts):
            if i + j >= n_x:
                continue
            term = dot(xp, yp)
            acc = term if acc is None else acc + term
    return acc


def _make_kernel(cfg: MFCCConfig, p_rows: int, w_dft: int, kf: int,
                 pw: int, passes: int, dtype):
    step = cfg.frame_step
    inv_fftn = 1.0 / cfg.fft_n

    def kernel(x_ref, b1_ref, b2_ref, b3_ref, f1_ref, f2_ref, out_ref,
               cat_ref):
        j = pl.program_id(1)
        x = x_ref[0, pl.ds(j * TILE_T, TILE_T + p_rows), :]  # (T+p, step)
        for i in range(p_rows):  # lane-concat the frame's row-groups
            cat_ref[:, i * step : (i + 1) * step] = x[i : i + TILE_T, :]
        y_parts = [b1_ref[...], b2_ref[...]]
        if passes == 6:
            y_parts.append(b3_ref[...])
        o = _split_dot(cat_ref[:, :], y_parts, passes)  # (TILE_T, w_dft)
        osq = o * o
        # packed layout: im_k sits kf-1 lanes after re_k (the always-zero
        # DC/Nyquist im columns are not stored). Roll right by
        # (w - (kf-1)) == roll left by kf-1: brings im_k^2 onto re_k^2.
        osq_im = pltpu.roll(osq, w_dft - (kf - 1), axis=1)
        # the rotation wraps other lanes' values onto DC and Nyquist;
        # both have zero im for real input, so mask the rolled term there
        lane = jax.lax.broadcasted_iota(jnp.int32, osq.shape, 1)
        im_ok = jnp.logical_and(lane != 0, lane != kf - 1)
        power = (osq + jnp.where(im_ok, osq_im, 0.0))[:, :pw] * inv_fftn
        mel = _split_dot(power, [f1_ref[...], f2_ref[...]], 3)
        out_ref[0, :, :] = mel.astype(dtype)

    return kernel


@functools.lru_cache(maxsize=None)
def _frontend_constants(cfg: MFCCConfig, p_rows: int, w_dft: int, pw: int):
    """Host-side basis/filterbank constants, padded for the kernel layout."""
    kf = cfg.fft_n // 2 + 1
    c, s = windowed_dft_basis(cfg.frame_len, cfg.fft_n, "float32")
    assert np.max(np.abs(s[:, 0])) == 0.0  # DC im is identically zero
    assert np.max(np.abs(s[:, kf - 1])) < 1e-4  # Nyquist im ~ 0 (even N)
    basis = np.zeros((p_rows * cfg.frame_step, w_dft), np.float32)
    basis[: cfg.frame_len, :kf] = c
    # packed: im_k at lane (kf-1)+k for k = 1..kf-2; the zero DC/Nyquist
    # im columns are dropped so the fused width is 2*kf - 2 (512 for the
    # standard 512-pt rFFT) instead of 2*kf padded to 640
    basis[: cfg.frame_len, kf : 2 * kf - 2] = s[:, 1 : kf - 1]
    # flat (p_rows*step, w_dft): row i*step+s multiplies the frame's
    # in-kernel lane-concatenated sample at lane i*step+s
    b1, b2, b3 = _bf16_parts(basis, 3)

    fb = mel_filterbank(cfg.n_mels, cfg.fft_n, cfg.sample_rate)  # (M, kf)
    fbank = np.zeros((pw, _LANE), np.float32)
    fbank[:kf, : cfg.n_mels] = fb.T.astype(np.float32)
    fbank[:kf, cfg.n_mels] = 1.0  # energy column: sum over real bins
    f1, f2 = _bf16_parts(fbank, 2)
    # host numpy (not device arrays): this cache is shared across jit
    # traces, and arrays materialized inside one trace must not leak out
    return (np.asarray(b1), np.asarray(b2), np.asarray(b3),
            np.asarray(f1), np.asarray(f2))




# -- radix-2 decimation-in-frequency variant ---------------------------------
#
# X_{2k}   = DFT_half(y_n + y_{n+half})                    (real input)
# X_{2k+1} = DFT_half((y_n - y_{n+half}) * e^{-i pi n/half})  (complex)
#
# where y is the WINDOWED frame (the window cannot fold into the bases
# here — the butterfly add/sub happens first — so it is two explicit VPU
# multiplies). Two half-size GEMMs replace the full-size one: 3*2*T*
# (half^2 + 2*half*half/2... ) = 25% fewer DFT MXU flops at fft_n=512
# ((256,256) + (512,256) vs (512,512)). The even/odd bin interleave is
# absorbed into a PERMUTED mel filterbank (a host constant), so no
# device-side reordering exists at all.


def _make_kernel_radix2(cfg: MFCCConfig, p_rows: int, passes: int, dtype):
    step = cfg.frame_step
    fft_n = cfg.fft_n
    half = fft_n // 2
    row_len = p_rows * step
    inv_fftn = 1.0 / fft_n

    def kernel(x_ref, w1_ref, w2_ref, ct_ref, st_ref,
               a1_ref, a2_ref, a3_ref, b1_ref, b2_ref, b3_ref,
               f1_ref, f2_ref, out_ref, cat_ref):
        j = pl.program_id(1)
        x = x_ref[0, pl.ds(j * TILE_T, TILE_T + p_rows), :]
        for i in range(p_rows):  # lane-concat the frame's row-groups
            cat_ref[:, i * step : (i + 1) * step] = x[i : i + TILE_T, :]
        if row_len < fft_n:  # scratch tail is uninitialized; zero it
            cat_ref[:, row_len:] = jnp.zeros(
                (TILE_T, fft_n - row_len), dtype
            )
        y1 = cat_ref[:, :half] * w1_ref[...]
        y2 = cat_ref[:, half:] * w2_ref[...]
        u = y1 + y2
        d = y1 - y2
        v = jnp.concatenate([d * ct_ref[...], -d * st_ref[...]], axis=1)

        ya = [a1_ref[...], a2_ref[...]]
        yb = [b1_ref[...], b2_ref[...]]
        if passes == 6:
            ya.append(a3_ref[...])
            yb.append(b3_ref[...])
        o1 = _split_dot(u, ya, passes)  # (T, half): even bins, packed
        o2 = _split_dot(v, yb, passes)  # (T, half): odd bins re|im

        osq1 = o1 * o1
        lane = jax.lax.broadcasted_iota(jnp.int32, osq1.shape, 1)
        # packed rFFT_half: im_k sits half/2 lanes after re_k; DC and
        # half-Nyquist (= bin fft_n/2) have zero im -> mask the wrap
        im_ok = jnp.logical_and(lane != 0, lane != half // 2)
        rolled1 = pltpu.roll(osq1, half - half // 2, axis=1)
        pe = osq1 + jnp.where(im_ok, rolled1, 0.0)
        osq2 = o2 * o2
        # odd bins: im_k at lane half/2 + k for every k; wrap lanes land
        # past the valid half/2 outputs, where the filterbank rows are 0
        po = osq2 + pltpu.roll(osq2, half - half // 2, axis=1)
        pcat = jnp.concatenate([pe, po], axis=1) * inv_fftn
        mel = _split_dot(pcat, [f1_ref[...], f2_ref[...]], 3)
        out_ref[0, :, :] = mel.astype(dtype)

    return kernel


@functools.lru_cache(maxsize=None)
def _frontend_constants_radix2(cfg: MFCCConfig):
    """Window halves, twiddles, half-size DFT bases, and the even/odd-
    permuted mel filterbank (+ energy column)."""
    from lnasr_tpu.ops.framing import hamming_window

    fft_n = cfg.fft_n
    half = fft_n // 2
    hk = half // 2 + 1  # rFFT_half bin count
    kf = fft_n // 2 + 1

    win = np.zeros(fft_n, np.float32)
    win[: cfg.frame_len] = hamming_window(cfg.frame_len, np.float64)
    w1 = win[:half][None, :].astype(np.float32)
    w2 = win[half:][None, :].astype(np.float32)
    n = np.arange(half, dtype=np.float64)
    ct = np.cos(np.pi * n / half)[None, :].astype(np.float32)
    st = np.sin(np.pi * n / half)[None, :].astype(np.float32)

    k_e = np.arange(hk, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(n, k_e) / half  # (half, hk)
    b_even = np.zeros((half, half), np.float32)
    b_even[:, :hk] = np.cos(ang)
    b_even[:, hk - 1 + 1 : hk - 1 + hk - 1] = -np.sin(ang[:, 1 : hk - 1])
    a1, a2, a3 = _bf16_parts(b_even, 3)

    k_o = np.arange(half // 2, dtype=np.float64)
    ang_o = 2.0 * np.pi * np.outer(n, k_o) / half  # (half, half/2)
    b_odd = np.zeros((2 * half, half), np.float32)
    b_odd[:half, : half // 2] = np.cos(ang_o)
    b_odd[:half, half // 2 :] = -np.sin(ang_o)
    b_odd[half:, : half // 2] = np.sin(ang_o)
    b_odd[half:, half // 2 :] = np.cos(ang_o)
    c1, c2, c3 = _bf16_parts(b_odd, 3)

    fb = mel_filterbank(cfg.n_mels, fft_n, cfg.sample_rate)  # (M, kf)
    fbank = np.zeros((2 * half, _LANE), np.float32)
    for big_k in range(kf):
        row = big_k // 2 if big_k % 2 == 0 else half + (big_k - 1) // 2
        fbank[row, : cfg.n_mels] = fb[:, big_k].astype(np.float32)
        fbank[row, cfg.n_mels] = 1.0  # energy column
    f1, f2 = _bf16_parts(fbank, 2)
    return (w1, w2, ct, st, np.asarray(a1), np.asarray(a2), np.asarray(a3),
            np.asarray(c1), np.asarray(c2), np.asarray(c3),
            np.asarray(f1), np.asarray(f2))




# -- radix-4 decimation-in-frequency variant ---------------------------------
#
# Two butterfly levels in exact f32, then FOUR quarter-size DFT GEMMs:
#
#   X_{4k}   = rFFT_Q(u1),  u1 = (y_n+y_{n+H}) + (y_{n+Q}+y_{n+H+Q})
#   X_{4k+2} = DFT_Q(ub),   ub = (u_n - u_{n+Q}) e^{-i pi n/Q}
#   X_{4k+1} = DFT_Q(v1),   v  = (y_n - y_{n+H}) e^{-i pi n/H}, v1 = v_n+v_{n+Q}
#   X_{4k+3} = DFT_Q(vb),   vb = (v_n - v_{n+Q}) e^{-i pi n/Q}
#
# with H = fft_n/2, Q = fft_n/4. The three complex quarter-DFTs share ONE
# (2Q, Q) basis; per 3-pass frame-row the DFT costs 2*(Q*Q + 3*2Q*Q)*3
# MXU flops — 42% below radix-2, 56% below the direct kernel. The 4-way
# bin interleave is absorbed into the permuted mel filterbank.


def _make_kernel_radix4(cfg: MFCCConfig, p_rows: int, passes: int, dtype):
    step = cfg.frame_step
    fft_n = cfg.fft_n
    half = fft_n // 2
    q = fft_n // 4
    row_len = p_rows * step
    inv_fftn = 1.0 / fft_n

    def kernel(x_ref, w1_ref, w2_ref, ct1_ref, st1_ref, ct2_ref, st2_ref,
               a1_ref, a2_ref, a3_ref, q1_ref, q2_ref, q3_ref,
               f1_ref, f2_ref, out_ref, cat_ref):
        j = pl.program_id(1)
        x = x_ref[0, pl.ds(j * TILE_T, TILE_T + p_rows), :]
        for i in range(p_rows):  # lane-concat the frame's row-groups
            cat_ref[:, i * step : (i + 1) * step] = x[i : i + TILE_T, :]
        if row_len < fft_n:
            cat_ref[:, row_len:] = jnp.zeros(
                (TILE_T, fft_n - row_len), dtype
            )
        y1 = cat_ref[:, :half] * w1_ref[...]
        y2 = cat_ref[:, half:] * w2_ref[...]
        u = y1 + y2
        d0 = y1 - y2
        v_re = d0 * ct1_ref[...]
        v_im = -d0 * st1_ref[...]
        # level 2 (all slices are Q = lane-tile aligned)
        u1 = u[:, :q] + u[:, q:]
        du = u[:, :q] - u[:, q:]
        ub = jnp.concatenate([du * ct2_ref[...], -du * st2_ref[...]], axis=1)
        v1 = jnp.concatenate(
            [v_re[:, :q] + v_re[:, q:], v_im[:, :q] + v_im[:, q:]], axis=1
        )
        dr = v_re[:, :q] - v_re[:, q:]
        di = v_im[:, :q] - v_im[:, q:]
        vb = jnp.concatenate(
            [dr * ct2_ref[...] + di * st2_ref[...],
             di * ct2_ref[...] - dr * st2_ref[...]], axis=1
        )

        ya = [a1_ref[...], a2_ref[...]]
        yq = [q1_ref[...], q2_ref[...]]
        if passes == 6:
            ya.append(a3_ref[...])
            yq.append(q3_ref[...])
        o_a = _split_dot(u1, ya, passes)  # (T, Q): bins 4k, packed rFFT_Q
        o_b = _split_dot(ub, yq, passes)  # (T, Q): bins 4k+2, re|im
        o_c = _split_dot(v1, yq, passes)  # (T, Q): bins 4k+1
        o_d = _split_dot(vb, yq, passes)  # (T, Q): bins 4k+3

        sq_a = o_a * o_a
        lane = jax.lax.broadcasted_iota(jnp.int32, sq_a.shape, 1)
        im_ok = jnp.logical_and(lane != 0, lane != q // 2)
        p_a = sq_a + jnp.where(im_ok, pltpu.roll(sq_a, q - q // 2, axis=1), 0.0)

        def cpow(o):  # complex quarter-DFT: re at k, im at q/2 + k
            sq = o * o
            return sq + pltpu.roll(sq, q - q // 2, axis=1)

        pcat = jnp.concatenate(
            [p_a, cpow(o_b), cpow(o_c), cpow(o_d)], axis=1
        ) * inv_fftn
        mel = _split_dot(pcat, [f1_ref[...], f2_ref[...]], 3)
        out_ref[0, :, :] = mel.astype(dtype)

    return kernel


@functools.lru_cache(maxsize=None)
def _frontend_constants_radix4(cfg: MFCCConfig):
    """Window halves, both twiddle levels, the packed rFFT_Q basis, the
    SHARED complex DFT_Q basis, and the 4-way-permuted mel filterbank."""
    from lnasr_tpu.ops.framing import hamming_window

    fft_n = cfg.fft_n
    half = fft_n // 2
    q = fft_n // 4
    qk = q // 2 + 1  # rFFT_Q bin count
    kf = fft_n // 2 + 1

    win = np.zeros(fft_n, np.float32)
    win[: cfg.frame_len] = hamming_window(cfg.frame_len, np.float64)
    w1 = win[:half][None, :].astype(np.float32)
    w2 = win[half:][None, :].astype(np.float32)
    n_h = np.arange(half, dtype=np.float64)
    ct1 = np.cos(np.pi * n_h / half)[None, :].astype(np.float32)
    st1 = np.sin(np.pi * n_h / half)[None, :].astype(np.float32)
    n_q = np.arange(q, dtype=np.float64)
    ct2 = np.cos(np.pi * n_q / q)[None, :].astype(np.float32)
    st2 = np.sin(np.pi * n_q / q)[None, :].astype(np.float32)

    k_r = np.arange(qk, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(n_q, k_r) / q  # (Q, qk)
    b_real = np.zeros((q, q), np.float32)
    b_real[:, :qk] = np.cos(ang)
    b_real[:, qk : qk + qk - 2] = -np.sin(ang[:, 1 : qk - 1])
    a1, a2, a3 = _bf16_parts(b_real, 3)

    k_c = np.arange(q // 2, dtype=np.float64)
    ang_c = 2.0 * np.pi * np.outer(n_q, k_c) / q  # (Q, Q/2)
    b_cplx = np.zeros((2 * q, q), np.float32)
    b_cplx[:q, : q // 2] = np.cos(ang_c)
    b_cplx[:q, q // 2 :] = -np.sin(ang_c)
    b_cplx[q:, : q // 2] = np.sin(ang_c)
    b_cplx[q:, q // 2 :] = np.cos(ang_c)
    c1, c2, c3 = _bf16_parts(b_cplx, 3)

    fb = mel_filterbank(cfg.n_mels, fft_n, cfg.sample_rate)  # (M, kf)
    fbank = np.zeros((4 * q, _LANE), np.float32)
    for big_k in range(kf):
        block, idx = big_k % 4, big_k // 4
        # kernel block order: [4k | 4k+2 | 4k+1 | 4k+3]
        row = {0: 0, 2: q, 1: 2 * q, 3: 3 * q}[block] + idx
        fbank[row, : cfg.n_mels] = fb[:, big_k].astype(np.float32)
        fbank[row, cfg.n_mels] = 1.0  # energy column
    f1, f2 = _bf16_parts(fbank, 2)
    return (w1, w2, ct1, st1, ct2, st2,
            np.asarray(a1), np.asarray(a2), np.asarray(a3),
            np.asarray(c1), np.asarray(c2), np.asarray(c3),
            np.asarray(f1), np.asarray(f2))


@functools.partial(jax.jit, static_argnames=("cfg", "passes", "interpret"))
def mel_frontend_pallas(
    signals: jax.Array,
    cfg: MFCCConfig = MFCCConfig(),
    lengths: jax.Array = None,
    passes: int = 3,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Batched fused frontend: ``signals (B, S)`` -> ``(mel_energy
    (B, T, n_mels), frame_energy (B, T))`` where T = ``num_frames(S)``.

    Numerically equals the XLA ``matmul`` path (``ops/spectral.py``) up to
    the split-bf16 error (~2^-18 relative at ``passes=3``; f32-faithful at
    ``passes=6``). ``lengths`` (B,) zeroes each utterance past its true
    length *after* pre-emphasis, matching the reference's
    pre-emphasize-then-zero-pad order (``lnasr/mfcc.py:132-135``). Set
    ``interpret=True`` off-TPU.
    """
    if passes not in (3, 6):
        raise ValueError(f"passes must be 3 or 6, got {passes}")
    b, s_len = signals.shape
    step, flen = cfg.frame_step, cfg.frame_len
    kf = cfg.fft_n // 2 + 1
    if cfg.n_mels + 1 > _LANE:
        raise ValueError(f"n_mels must be < {_LANE}")
    if cfg.fft_n % 2:
        raise ValueError("fft_n must be even (packed rFFT basis layout)")
    t = num_frames(s_len, flen, step)
    t_pad = _ceil_to(t, TILE_T)
    n_tiles = t_pad // TILE_T
    p_rows = -(-flen // step)  # rows of `step` samples covering one frame
    w_dft = _ceil_to(2 * kf - 2, _LANE)  # packed: DC/Nyquist im dropped
    pw = _ceil_to(kf, _LANE)

    dtype = jnp.float32
    y = preemphasis(signals.astype(dtype), cfg.preemph)
    if lengths is not None:
        y = jnp.where(jnp.arange(s_len)[None, :] < lengths[:, None], y, 0)
    rows = t_pad + p_rows
    need = rows * step
    y = jnp.pad(y, ((0, 0), (0, need - s_len))) if need > s_len else y[:, :need]
    y = y.reshape(b, rows, step)

    # DFT decomposition ladder (each level needs lane-tile-aligned
    # sub-widths and the frame row-span inside one FFT length): radix-4
    # (56% fewer DFT MXU flops than direct) -> radix-2 (25%) -> the
    # direct single-GEMM kernel for everything else.
    fits = p_rows * step <= cfg.fft_n
    if cfg.fft_n % (4 * _LANE) == 0 and fits:
        consts = _frontend_constants_radix4(cfg)
        kernel = _make_kernel_radix4(cfg, p_rows, passes, dtype)
        scratch_w = cfg.fft_n
    elif cfg.fft_n % (2 * _LANE) == 0 and fits:
        consts = _frontend_constants_radix2(cfg)
        kernel = _make_kernel_radix2(cfg, p_rows, passes, dtype)
        scratch_w = cfg.fft_n
    else:
        consts = _frontend_constants(cfg, p_rows, w_dft, pw)
        kernel = _make_kernel(cfg, p_rows, w_dft, kf, pw, passes, dtype)
        scratch_w = p_rows * step
    const_specs = [
        pl.BlockSpec(c.shape, lambda bb, jj, nd=c.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for c in consts
    ]
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, rows, step), lambda bb, jj: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            *const_specs,
        ],
        out_specs=pl.BlockSpec((1, TILE_T, _LANE), lambda bb, jj: (bb, jj, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, _LANE), dtype),
        scratch_shapes=[pltpu.VMEM((TILE_T, scratch_w), dtype)],
        interpret=interpret,
    )(y, *consts)
    mel = out[:, :t, : cfg.n_mels]
    energy = out[:, :t, cfg.n_mels]
    return mel, energy
