"""Spectral transforms: windowed DFT/power spectrum, mel filterbank, DCT-II.

All transform matrices (windowed-DFT bases, mel filterbank, DCT) are built
once on the host as NumPy constants and closed over by ``jit`` — the
reference rebuilds its filterbank on every call (``lnasr/mfcc.py:145``),
which we constant-fold instead.

The mel scale uses the reference's convention ``2595 * ln(1 + hz/700)``
(natural log — ``lnasr/mfcc.py:72``; self-consistent with its inverse, so
filter placement equals standard mel spacing), and the filterbank bins are
``floor((fft_n / fs) * hz)`` triangles (``lnasr/mfcc.py:96-104``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def mel_from_hz(hz):
    return 2595.0 * np.log(1.0 + np.asarray(hz, dtype=np.float64) / 700.0)


def hz_from_mel(mel):
    return 700.0 * (np.exp(np.asarray(mel, dtype=np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=None)
def mel_filterbank(n_mels: int, fft_n: int, sample_rate: int) -> np.ndarray:
    """Triangular mel filterbank ``(n_mels, fft_n//2 + 1)`` as in
    ``lnasr/mfcc.py:78-106`` (bin edges floored onto the FFT grid)."""
    edges_hz = hz_from_mel(np.linspace(mel_from_hz(0.0), mel_from_hz(sample_rate / 2), n_mels + 2))
    bins = np.floor((fft_n / sample_rate) * edges_hz).astype(np.int64)
    fft_size = fft_n // 2 + 1
    fbank = np.zeros((n_mels, fft_size), dtype=np.float64)
    for m in range(1, n_mels + 1):
        lo, mi, hi = int(bins[m - 1]), int(bins[m]), int(bins[m + 1])
        if mi > lo:
            fbank[m - 1, lo:mi] = (np.arange(lo, mi) - lo) / (mi - lo)
        if hi > mi:
            fbank[m - 1, mi:hi] = (hi - np.arange(mi, hi)) / (hi - mi)
    return fbank


@functools.lru_cache(maxsize=None)
def windowed_dft_basis(frame_len: int, fft_n: int, dtype_str: str = "float32"):
    """Real/imag bases of the zero-padded, Hamming-windowed real DFT.

    Returns ``(C, S)`` each ``(frame_len, fft_n//2+1)`` with
    ``C[n,k] = w[n] cos(2 pi k n / fft_n)``, ``S[n,k] = -w[n] sin(...)``,
    so that for a frame ``x``: ``Re(rfft(w*x)) = x @ C`` and
    ``Im(rfft(w*x)) = x @ S``. Power spectrum then needs two GEMMs and an
    elementwise square — the GEMM-native STFT path that keeps the frontend
    on the MXU instead of the XLA FFT op.
    """
    from lnasr_tpu.ops.framing import hamming_window

    dtype = np.dtype(dtype_str)
    n = np.arange(frame_len, dtype=np.float64)[:, None]
    k = np.arange(fft_n // 2 + 1, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * n / fft_n
    w = hamming_window(frame_len)[:, None]
    c = (w * np.cos(ang)).astype(dtype)
    s = (-w * np.sin(ang)).astype(dtype)
    return c, s


def power_spectrum(frames: jax.Array, fft_n: int, method: str = "matmul") -> jax.Array:
    """Power spectrum ``|rfft(frames, fft_n)|^2 / fft_n`` (Parseval scaling,
    ``lnasr/mfcc.py:141-142``). ``frames`` is ``(..., frame_len)`` and must
    already be windowed for the FFT path; the matmul path applies the window
    internally via the precomputed basis, so pass *unwindowed* frames there.
    """
    if method == "fft":
        mag = jnp.abs(jnp.fft.rfft(frames, fft_n))
        return (mag * mag) / fft_n
    elif method == "matmul":
        frame_len = frames.shape[-1]
        c, s = windowed_dft_basis(frame_len, fft_n, str(frames.dtype))
        # TPU f32 matmuls default to bfloat16 passes — fine for neural
        # nets, ruinous for a DFT whose output feeds log10/DCT. Pin full
        # float32 precision here; the frontend is no longer matmul-bound.
        prec = jax.lax.Precision.HIGHEST
        re = jnp.dot(frames, jnp.asarray(c, dtype=frames.dtype), precision=prec)
        im = jnp.dot(frames, jnp.asarray(s, dtype=frames.dtype), precision=prec)
        return (re * re + im * im) / fft_n
    raise ValueError(f"unknown spectrum method: {method!r}")


@functools.lru_cache(maxsize=None)
def dct2_ortho_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix ``D`` with ``dct(x) = x @ D.T`` matching
    ``scipy.fftpack.dct(x, type=2, axis=1, norm='ortho')``
    (``lnasr/mfcc.py:152``)."""
    k = np.arange(n, dtype=np.float64)[:, None]
    j = np.arange(n, dtype=np.float64)[None, :]
    d = 2.0 * np.cos(np.pi * k * (2.0 * j + 1.0) / (2.0 * n))
    d[0] *= np.sqrt(1.0 / (4.0 * n))
    d[1:] *= np.sqrt(1.0 / (2.0 * n))
    return d
