"""Long-Term Spectral Divergence (LTSD) VAD as a batched JAX program.

Same algorithm as the reference's ``third/vadlstd/VadLstd.py:44-74``:
amplitude spectra per frame, a noise spectrum estimated from the first two
frames, LTSE (running max of amplitudes over a +/-order window), and
LTSD = 10 log10(sum(LTSE^2 / noise) / winsize) per frame, with optional
noise adaptation when the frame is classified silent.

TPU-first differences: framing/FFT/windowed-max are vectorized over the
whole signal (the running max is a single strided ``reduce_window``-style
max over stacked shifts), and without adaptation the whole computation is
one fused jit region — batched over utterances via ``vmap``. The noise
*adaptation* variant is inherently sequential per frame and runs as a
``lax.scan``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from lnasr_tpu.config import LTSDConfig
from lnasr_tpu.ops.framing import hamming_window, split_frames


class LTSDResult(NamedTuple):
    ltsd: jax.Array  # (T,) per-frame divergence (0 outside the valid band)
    is_speech: jax.Array  # (T,) bool, ltsd > threshold


def _amplitudes(signal: jax.Array, config: LTSDConfig, dtype) -> jax.Array:
    # prepend one stride of zeros (the reference mimics MATLAB buffer(),
    # VadLstd.py:52)
    padded = jnp.concatenate(
        [jnp.zeros((config.step_size,), dtype), signal.astype(dtype)]
    )
    frames = split_frames(padded, config.win_size, config.step_size)
    window = jnp.asarray(hamming_window(config.win_size), dtype)
    return jnp.abs(jnp.fft.rfft(frames * window, config.win_size))


def _ltse(amps: jax.Array, order: int) -> jax.Array:
    """Windowed max over frames t-order .. t+order-1 (the reference's
    asymmetric slice ``[k-order:k+order]``, VadLstd.py:66)."""
    n = amps.shape[0]
    # stack the 2*order shifts and reduce: O(order) tensor ops, no scan
    shifts = [
        jnp.roll(amps, -d, axis=0) for d in range(-order, order)
    ]
    ltse = jnp.max(jnp.stack(shifts), axis=0)
    t = jnp.arange(n)
    valid = (t >= order) & (t < n - order)
    return jnp.where(valid[:, None], ltse, 0.0)


def ltsd_scores(
    signal: jax.Array, config: LTSDConfig = LTSDConfig(), dtype=jnp.float32
) -> jax.Array:
    """Per-frame LTSD without noise adaptation — fully parallel."""
    amps = _amplitudes(signal, config, dtype)
    noise = jnp.mean(amps[:2], axis=0) ** 2
    ltse = _ltse(amps, config.order)
    n = amps.shape[0]
    t = jnp.arange(n)
    valid = (t >= config.order) & (t < n - config.order)
    ratio = jnp.sum(ltse * ltse / noise, axis=1)
    scores = 10.0 * jnp.log10(jnp.maximum(ratio / config.win_size, 1e-30))
    return jnp.where(valid, scores, 0.0)


def ltsd_scores_adaptive(
    signal: jax.Array, config: LTSDConfig, dtype=jnp.float32
) -> jax.Array:
    """LTSD with noise-spectrum adaptation below threshold
    (``VadLstd.py:72-74``): sequential over frames via ``lax.scan``."""
    assert config.alpha is not None
    amps = _amplitudes(signal, config, dtype)
    noise0 = jnp.mean(amps[:2], axis=0) ** 2
    ltse = _ltse(amps, config.order)
    n = amps.shape[0]
    t = jnp.arange(n)
    valid = (t >= config.order) & (t < n - config.order)
    alpha = config.alpha

    def step(noise, inputs):
        ltse_t, valid_t = inputs
        ratio = jnp.sum(ltse_t * ltse_t / noise)
        score = 10.0 * jnp.log10(jnp.maximum(ratio / config.win_size, 1e-30))
        adapt = valid_t & (score < config.threshold)
        new_noise = jnp.where(
            adapt,
            alpha * noise + (1.0 - alpha) * (jnp.sum(ltse_t) / config.win_size),
            noise,
        )
        return new_noise, jnp.where(valid_t, score, 0.0)

    _, scores = jax.lax.scan(step, noise0, (ltse, valid))
    return scores


class VadLtsd:
    """LTSD VAD with jitted single/batched entry points (the reference's
    ``VadLtsd.detect`` returns raw scores; ``detect`` here returns scores
    plus a thresholded decision)."""

    def __init__(self, config: LTSDConfig = LTSDConfig(), dtype=jnp.float32):
        self.config = config
        self.dtype = dtype

    @functools.cached_property
    def _scores(self):
        cfg, dtype = self.config, self.dtype
        if cfg.alpha is None:
            return jax.jit(lambda sig: ltsd_scores(sig, cfg, dtype))
        return jax.jit(lambda sig: ltsd_scores_adaptive(sig, cfg, dtype))

    def detect(self, signal) -> LTSDResult:
        scores = self._scores(jnp.asarray(signal))
        return LTSDResult(ltsd=scores, is_speech=scores > self.config.threshold)

    def detect_batch(self, signals) -> LTSDResult:
        fn = jax.vmap(self._scores)
        scores = fn(jnp.asarray(signals))
        return LTSDResult(ltsd=scores, is_speech=scores > self.config.threshold)
