"""Float64 NumPy oracle of the reference MFCC pipeline
(``/root/reference/lnasr/mfcc.py:108-175`` semantics, vectorized)."""

import math

import numpy as np
from scipy.fftpack import dct


def frame_signal(y: np.ndarray, frame_len: int, step: int) -> np.ndarray:
    n = int(math.ceil(abs(len(y) - (frame_len - step)) / step))
    padded_len = n * step + (frame_len - step)
    if padded_len > len(y):
        y = np.concatenate([y, np.zeros(padded_len - len(y))])
    starts = np.arange(n) * step
    return y[starts[:, None] + np.arange(frame_len)[None, :]]


def mel_bank(n_mels: int, fft_n: int, fs: int) -> np.ndarray:
    mel = lambda hz: 2595.0 * np.log(1.0 + hz / 700.0)
    imel = lambda m: 700.0 * (np.exp(m / 2595.0) - 1.0)
    edges = np.floor(fft_n / fs * imel(np.linspace(mel(0.0), mel(fs / 2.0), n_mels + 2)))
    bank = np.zeros((n_mels, fft_n // 2 + 1))
    for i in range(n_mels):
        lo, mid, hi = int(edges[i]), int(edges[i + 1]), int(edges[i + 2])
        bank[i, lo:mid] = (np.arange(lo, mid) - lo) / (mid - lo)
        bank[i, mid:hi] = (hi - np.arange(mid, hi)) / (hi - mid)
    return bank


def mfcc_ref(
    signal: np.ndarray,
    fs: int = 16000,
    frame_t: float = 25e-3,
    stride: float = 10e-3,
    alpha: float = 0.97,
    fft_n: int = 512,
    n_mels: int = 40,
    n_ceps: int = 12,
):
    """Returns (power, cepstrum, features) like the reference's
    ``calc_mfcc`` — including the delta quirk where the first delta row
    duplicates the second feature row."""
    x = signal.astype(np.float64)
    y = np.concatenate([x[:1], x[1:] - alpha * x[:-1]])
    frame_len = int(fs * frame_t)
    step = int(fs * stride)
    frames = frame_signal(y, frame_len, step)
    n = np.arange(frame_len)
    frames = frames * (0.54 - 0.46 * np.cos(2 * np.pi * n / (frame_len - 1)))
    spectrum = np.fft.rfft(frames, fft_n)
    power = (spectrum.real**2 + spectrum.imag**2) / fft_n

    mel_energy = power @ mel_bank(n_mels, fft_n, fs).T
    mel_energy[mel_energy == 0] = np.finfo(float).eps
    ceps = 20.0 * np.log10(mel_energy)
    ceps = ceps - (ceps.mean(axis=0) + 1e-8)
    ceps = dct(ceps, type=2, axis=1, norm="ortho")

    feats = ceps[:, 1 : 1 + n_ceps]
    feats = feats - (feats.mean(axis=0) + 1e-8)
    feats = np.column_stack([feats, np.log(power.sum(axis=1))])
    delta = np.vstack([feats[1], np.diff(feats, axis=0)])
    feats = np.column_stack([feats, delta])
    base = n_ceps + 1
    ddelta = np.vstack(
        [feats[1, base : 2 * base], np.diff(feats[:, base : 2 * base], axis=0)]
    )
    feats = np.column_stack([feats, ddelta])
    return power, ceps, feats
