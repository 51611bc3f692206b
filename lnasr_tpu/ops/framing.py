"""Signal framing, windowing, and pre-emphasis.

Mirrors the framing semantics of the reference (``lnasr/utils.py:106-138``):
frame count ``N = ceil(|len - (L - S)| / S)`` (at least one frame), the tail
zero-padded to ``N*S + (L - S)``, and the Hamming window
``0.54 - 0.46 cos(2 pi n / (N-1))``.

Shapes are static under ``jit``: the frame count is derived on the host from
the (padded) signal length, and callers carry a ``lengths`` array to mask
padding frames in batched code.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def num_frames(signal_length: int, frame_len: int, frame_step: int) -> int:
    """Frame count for the reference's padding rule (``utils.py:119``)."""
    return int(math.ceil(abs(signal_length - (frame_len - frame_step)) / frame_step))


def pad_length(signal_length: int, frame_len: int, frame_step: int) -> int:
    """Padded signal length so every frame is fully materialized."""
    n = num_frames(signal_length, frame_len, frame_step)
    return n * frame_step + (frame_len - frame_step)


def preemphasis(signal: jax.Array, alpha: float) -> jax.Array:
    """First-order high-pass: y(0)=x(0), y(t)=x(t) - alpha*x(t-1)
    (``lnasr/mfcc.py:50-64``)."""
    return jnp.concatenate([signal[..., :1], signal[..., 1:] - alpha * signal[..., :-1]], axis=-1)


def split_frames(signal: jax.Array, frame_len: int, frame_step: int) -> jax.Array:
    """Split a 1-D (or batched ``(..., S)``) signal into overlapping frames.

    Returns ``(..., N, frame_len)`` with the tail zero-padded, matching
    ``lnasr/utils.py:106-130``.

    Implementation: overlapping frames via *strided slices* of
    gcd(frame_len, frame_step)-sized blocks — frame t is the concatenation
    of blocks ``t*(S/g) .. t*(S/g) + L/g - 1`` — which XLA lowers to a few
    cheap slice/reshape ops. The naive per-frame gather was the single
    hottest op of the MFCC pipeline on TPU (a (B, N, L) dynamic gather
    costing more than the DFT matmuls combined); this formulation removes
    it. A gather fallback covers degenerate block sizes.
    """
    signal_length = signal.shape[-1]
    n = num_frames(signal_length, frame_len, frame_step)
    padded = pad_length(signal_length, frame_len, frame_step)
    if padded > signal_length:
        pad_widths = [(0, 0)] * (signal.ndim - 1) + [(0, padded - signal_length)]
        signal = jnp.pad(signal, pad_widths)
    elif padded < signal_length:
        signal = signal[..., :padded]

    g = math.gcd(frame_len, frame_step)
    if g >= 8:
        stride = frame_step // g
        parts = frame_len // g
        blocks = signal.reshape(*signal.shape[:-1], padded // g, g)
        cols = [
            blocks[..., k :: stride, :][..., :n, :] for k in range(parts)
        ]
        frames = jnp.stack(cols, axis=-2)  # (..., N, parts, g)
        return frames.reshape(*signal.shape[:-1], n, frame_len)

    idx = np.arange(frame_len)[None, :] + np.arange(n)[:, None] * frame_step
    return signal[..., idx]


def hamming_window(frame_len: int, dtype=np.float64) -> np.ndarray:
    """Hamming window as a host-side constant (``lnasr/utils.py:132-138``)."""
    n = np.arange(frame_len, dtype=dtype)
    return (0.54 - 0.46 * np.cos(2.0 * np.pi * n / (frame_len - 1))).astype(dtype)


def frame_mask(lengths: jax.Array, n: int, frame_len: int, frame_step: int) -> jax.Array:
    """Boolean mask ``(..., N)`` of frames that exist for each true signal
    length; frame count uses the same ceil rule as :func:`num_frames` so a
    batch padded to a common length can recover per-utterance frame counts."""
    counts = jnp.ceil(jnp.abs(lengths - (frame_len - frame_step)) / frame_step)
    counts = jnp.maximum(counts, 1).astype(jnp.int32)
    frame_ids = jnp.arange(n, dtype=jnp.int32)
    return frame_ids[None, :] < counts[..., None]
