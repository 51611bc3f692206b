"""WebRTC-style GMM VAD as a JAX program (offline/batch path).

Same algorithm as the native detector (``lnasr_tpu/native/vad/
vad_webrtc.cpp``; the reference ships the fixed-point C original under
``third/pywvad/libfvad`` and a float re-derivation in ``wvad.py``), with a
TPU-first decomposition:

- the entire filter frontend — 16->8 kHz allpass downsampler, the 5-level
  QMF halfband split tree, and the 80 Hz biquad — is *fully parallel over
  the signal*, because every IIR section is solved with the associative
  scans of :mod:`lnasr_tpu.ops.lfilter` (the reference loops per sample:
  ``wvad.py:104-259``);
- per-frame band energies are one reshape+reduction;
- only the 2-Gaussian noise/speech model adaptation is sequential, as a
  ``lax.scan`` over 10 ms frames with a small state.

Decisions match the float semantics of the native detector; tests
cross-check the two implementations frame-by-frame (allowing rare one-ulp
threshold flips between float orderings).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lnasr_tpu.ops.lfilter import allpass2, biquad, first_order_recurrence

FRAME_LEN_16K = 160
NUM_CHANNELS = 6
NUM_GAUSSIANS = 2

_C_UPPER = 20972.0 / 32768.0
_C_LOWER = 5571.0 / 32768.0
_HP_ZERO = (6631.0 / 16384.0, -13262.0 / 16384.0, 6631.0 / 16384.0)
_HP_POLE = (1.0, -7756.0 / 16384.0, 5620.0 / 16384.0)
_OFFSETS = np.array([368, 368, 272, 176, 176, 176], np.float32) / 16.0
_MIN_ENERGY = 10.0
_SPECTRUM_WEIGHT = np.array([6, 8, 10, 12, 14, 16], np.float32)
_NOISE_UPDATE = 655.0 / 32768.0
_SPEECH_UPDATE = 6554.0 / 32768.0
_BACK_ETA = 154.0 / 256.0
_MIN_DIFF = np.array([544, 544, 576, 576, 576, 576], np.float32) / 32.0
_MIN_MEAN = np.array([640, 768], np.float32) / 128.0
_MAX_NOISE = np.array([9216, 9088, 8960, 8832, 8704, 8576], np.float32) / 128.0
_MAX_SPEECH = np.array([11392, 11392, 11520, 11520, 11520, 11520], np.float32) / 128.0
_NOISE_W = np.array([34, 62, 72, 66, 53, 25, 94, 66, 56, 62, 75, 103],
                    np.float32).reshape(2, 6) / 128.0
_SPEECH_W = np.array([48, 82, 45, 87, 50, 47, 80, 46, 83, 41, 78, 81],
                     np.float32).reshape(2, 6) / 128.0
_NOISE_MEANS = np.array([6738, 4892, 7065, 6715, 6771, 3369,
                         7646, 3863, 7820, 7266, 5020, 4362],
                        np.float32).reshape(2, 6) / 128.0
_SPEECH_MEANS = np.array([8306, 10085, 10078, 11823, 11843, 6309,
                          9473, 9571, 10879, 7581, 8180, 7483],
                         np.float32).reshape(2, 6) / 128.0
_NOISE_STDS = np.array([378, 1064, 493, 582, 688, 593,
                        474, 697, 475, 688, 421, 455],
                       np.float32).reshape(2, 6) / 128.0
_SPEECH_STDS = np.array([555, 505, 567, 524, 585, 1231,
                         509, 828, 492, 1540, 1079, 850],
                        np.float32).reshape(2, 6) / 128.0
_MIN_STD = 384.0 / 128.0
_MAX_SPEECH_FRAMES = 6
_SMOOTH_DOWN = 6553.0 / 32768.0
_SMOOTH_UP = 32439.0 / 32768.0
_COMP_VAR = 22005.0 / 1024.0

# {overhang1, overhang2, local, global} per aggressiveness mode, 10 ms frames
MODE_TABLE = ((8, 14, 24.0, 57.0), (8, 14, 37.0, 100.0),
              (6, 9, 82.0, 285.0), (6, 9, 94.0, 1100.0))


class GmmState(NamedTuple):
    noise_means: jax.Array  # (2, 6)
    speech_means: jax.Array
    noise_stds: jax.Array
    speech_stds: jax.Array
    frame_count: jax.Array  # () int32
    over_hang: jax.Array  # () int32
    speech_run: jax.Array  # () int32
    low_values: jax.Array  # (6, 16)
    value_ages: jax.Array  # (6, 16) int32
    mean_values: jax.Array  # (6,)


def initial_gmm_state(dtype=jnp.float32) -> GmmState:
    return GmmState(
        noise_means=jnp.asarray(_NOISE_MEANS, dtype),
        speech_means=jnp.asarray(_SPEECH_MEANS, dtype),
        noise_stds=jnp.asarray(_NOISE_STDS, dtype),
        speech_stds=jnp.asarray(_SPEECH_STDS, dtype),
        frame_count=jnp.asarray(0, jnp.int32),
        over_hang=jnp.asarray(0, jnp.int32),
        speech_run=jnp.asarray(0, jnp.int32),
        low_values=jnp.full((6, 16), 10000.0 / 16.0, dtype),
        value_ages=jnp.zeros((6, 16), jnp.int32),
        mean_values=jnp.full((6,), 1600.0 / 16.0, dtype),
    )


# ---------------------------------------------------------------------------
# Filter frontend — fully parallel over the signal
# ---------------------------------------------------------------------------


def _downsample(signal: jax.Array, state: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """16 kHz -> 8 kHz halfband allpass pair (wvad.py:225-259); output
    truncated toward zero like the int16 conversion there."""
    xp = signal.reshape(-1, 2)
    drives = jnp.stack(
        [(1.0 - _C_UPPER**2) * xp[:, 0], (1.0 - _C_LOWER**2) * xp[:, 1]], axis=1
    )
    coefs = jnp.asarray([-_C_UPPER, -_C_LOWER], signal.dtype)
    s = jax.vmap(
        lambda c, b, h0: first_order_recurrence(c, b, h0), in_axes=(0, 1, 0),
        out_axes=1,
    )(coefs, drives, state)
    s_prev = jnp.concatenate([state[None, :], s[:-1]], axis=0)
    a0 = (s_prev[:, 0] + _C_UPPER * xp[:, 0]) * 0.5
    a1 = (s_prev[:, 1] + _C_LOWER * xp[:, 1]) * 0.5
    return jnp.trunc(a0 + a1), s[-1]


def _split(x, upper_state, lower_state):
    """QMF halfband split with decimation: both branches are full-signal
    allpass2 runs; hp/lp combine the upper branch's even outputs with the
    lower branch's odd outputs (wvad.py:160-191)."""
    a0, new_upper = allpass2(x, _C_UPPER, (upper_state[0], upper_state[1]))
    a1, new_lower = allpass2(x, _C_LOWER, (lower_state[0], lower_state[1]))
    hp = (a1[1::2] - a0[0::2]) * 0.5
    lp = (a1[1::2] + a0[0::2]) * 0.5
    return hp, lp, jnp.stack(new_upper), jnp.stack(new_lower)


class FilterState(NamedTuple):
    downsample: jax.Array  # (2,)
    upper: jax.Array  # (5, 2)
    lower: jax.Array  # (5, 2)
    hp: jax.Array  # (4,)


def initial_filter_state(dtype=jnp.float32) -> FilterState:
    return FilterState(
        downsample=jnp.zeros((2,), dtype),
        upper=jnp.zeros((5, 2), dtype),
        lower=jnp.zeros((5, 2), dtype),
        hp=jnp.zeros((4,), dtype),
    )


def extract_features(
    signal: jax.Array, state: FilterState
) -> Tuple[jax.Array, jax.Array, FilterState]:
    """Whole-signal feature extraction.

    ``signal`` is (S,) float with S a multiple of 160; returns per-frame
    ``features (F, 6)`` (log band energies), ``total_energy (F,)``, and the
    carried filter state. Identical to running the streaming detector
    frame-by-frame because every filter is causal and stateful.
    """
    x8, ds_state = _downsample(signal, state.downsample)
    hp2_4, lp0_2, u0, l0 = _split(x8, state.upper[0], state.lower[0])
    b5, b4, u1, l1 = _split(hp2_4, state.upper[1], state.lower[1])
    b3, lp0_1, u2, l2 = _split(lp0_2, state.upper[2], state.lower[2])
    b2, lp0_05, u3, l3 = _split(lp0_1, state.upper[3], state.lower[3])
    b1, lp0_025, u4, l4 = _split(lp0_05, state.upper[4], state.lower[4])
    b0, hp_state = biquad(lp0_025, _HP_ZERO, _HP_POLE, state.hp)

    n_frames = signal.shape[0] // FRAME_LEN_16K
    bands = [b0, b1, b2, b3, b4, b5]
    # accumulate band energies at the widest available precision (float64
    # needs the x64 flag; plain float32 otherwise — matches the C++ double
    # accumulator closely enough for decision parity)
    acc_dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    energies = [
        jnp.sum(b.reshape(n_frames, -1).astype(acc_dtype) ** 2, axis=1).astype(
            signal.dtype
        )
        for b in bands
    ]

    features = []
    total = jnp.zeros((n_frames,), signal.dtype)
    for band in (5, 4, 3, 2, 1, 0):
        e = energies[band]
        log_e = jnp.where(
            e > 0, 10.0 * jnp.log10(jnp.maximum(e, 1e-30)) + _OFFSETS[band],
            _OFFSETS[band],
        )
        inc = jnp.where(
            total <= _MIN_ENERGY,
            jnp.where(e >= 16384.0, _MIN_ENERGY + 1.0, e),
            0.0,
        )
        total = total + inc
        features.append(log_e)
    features = jnp.stack(features[::-1], axis=1)  # (F, 6), channel order 0..5
    new_state = FilterState(
        downsample=ds_state,
        upper=jnp.stack([u0, u1, u2, u3, u4]),
        lower=jnp.stack([l0, l1, l2, l3, l4]),
        hp=hp_state,
    )
    return features, total, new_state


# ---------------------------------------------------------------------------
# GMM decision — sequential scan over frames
# ---------------------------------------------------------------------------


def _find_minimum(state: GmmState, features: jax.Array):
    """Vectorized-over-channels port of the 16-smallest/100-frame minimum
    tracker (wvad.py:336-383). Returns (new state arrays, per-channel
    smoothed minima)."""
    lows, ages = state.low_values, state.value_ages

    # age update: entries hitting age 100 are evicted (shift left); the
    # sequential loop evicts in index order, which a left-packing of the
    # surviving entries reproduces.
    def age_step(k, carry):
        lows, ages = carry
        expired = ages[:, k] == 100
        # shift positions k..14 left by one where expired, blank slot 15;
        # k is traced inside fori_loop, so express the shift as a gather
        idx = jnp.arange(16)
        src = jnp.where(idx >= k, jnp.minimum(idx + 1, 15), idx)
        shifted_lows = lows[:, src].at[:, 15].set(10000.0 / 16.0)
        shifted_ages = ages[:, src].at[:, 15].set(101)
        new_lows = jnp.where(expired[:, None], shifted_lows, lows)
        new_ages = jnp.where(
            expired[:, None],
            shifted_ages,
            jnp.where((idx == k)[None, :], ages + 1, ages),
        )
        return new_lows, new_ages

    lows, ages = jax.lax.fori_loop(0, 16, age_step, (lows, ages))

    # insert the new value at its sorted position (shift right from there)
    idx = jnp.arange(16)[None, :]
    smaller = features[:, None] < lows  # (6, 16)
    has_slot = jnp.any(smaller, axis=1)
    pos = jnp.argmax(smaller, axis=1)  # first index where value fits
    shift_right = idx > pos[:, None]
    prev_lows = jnp.concatenate([lows[:, :1], lows[:, :-1]], axis=1)
    prev_ages = jnp.concatenate([ages[:, :1], ages[:, :-1]], axis=1)
    ins_lows = jnp.where(idx == pos[:, None], features[:, None],
                         jnp.where(shift_right, prev_lows, lows))
    ins_ages = jnp.where(idx == pos[:, None], 1,
                         jnp.where(shift_right, prev_ages, ages))
    lows = jnp.where(has_slot[:, None], ins_lows, lows)
    ages = jnp.where(has_slot[:, None], ins_ages, ages)

    median = jnp.where(
        state.frame_count > 2, lows[:, 2],
        jnp.where(state.frame_count > 0, lows[:, 0], 1600.0 / 16.0),
    )
    alpha = jnp.where(
        state.frame_count > 0,
        jnp.where(median < state.mean_values, _SMOOTH_DOWN, _SMOOTH_UP),
        0.0,
    )
    mean_values = ((alpha + 1.0 / 32768.0) * state.mean_values
                   + (1.0 - alpha) * median + 16384.0 / 524288.0)
    return lows, ages, mean_values


def gmm_step(state: GmmState, inputs, thresholds) -> Tuple[GmmState, jax.Array]:
    """One 10 ms frame of the GMM decision + adaptation (wvad.py:415-580)."""
    features, total_power = inputs
    oh_max1, oh_max2, local_thr, global_thr = thresholds
    dtype = features.dtype

    active = total_power > _MIN_ENERGY

    def gauss_prob(x, mean, std):
        q = (x - mean) ** 2 / (2.0 * std * std)
        return jnp.where(q < _COMP_VAR, jnp.exp(-jnp.minimum(q, 80.0)) / std, 0.0)

    noise_p = jnp.asarray(_NOISE_W, dtype) * gauss_prob(
        features[None, :], state.noise_means, state.noise_stds
    )  # (2, 6)
    speech_p = jnp.asarray(_SPEECH_W, dtype) * gauss_prob(
        features[None, :], state.speech_means, state.speech_stds
    )
    h0 = jnp.sum(noise_p, axis=0)  # (6,)
    h1 = jnp.sum(speech_p, axis=0)
    shift0 = jnp.where(h0 <= 0, 31.0, 31.0 - 27.0 - jnp.log2(jnp.maximum(h0, 1e-38)))
    shift1 = jnp.where(h1 <= 0, 31.0, 31.0 - 27.0 - jnp.log2(jnp.maximum(h1, 1e-38)))
    llr = shift0 - shift1  # log2(h1/h0) saturated like the fixed-point port
    sum_llr = jnp.sum(llr * jnp.asarray(_SPECTRUM_WEIGHT, dtype))
    raw_flag = jnp.any(llr * 4.0 > local_thr) | (sum_llr >= global_thr)
    vadflag = active & raw_flag

    ngpr0 = jnp.where(h0 > 0, noise_p[0] / jnp.maximum(h0, 1e-38), 1.0)
    ngpr = jnp.stack([ngpr0, 1.0 - ngpr0])
    sgpr0 = jnp.where(h1 > 0, speech_p[0] / jnp.maximum(h1, 1e-38), 0.0)
    sgpr1 = jnp.where(h1 > 0, 1.0 - sgpr0, 0.0)
    sgpr = jnp.stack([sgpr0, sgpr1])

    # ---- adaptation (only when the frame had enough power) ----
    lows, ages, mean_values = _find_minimum(state, features)
    noise_w = jnp.asarray(_NOISE_W, dtype)
    speech_w = jnp.asarray(_SPEECH_W, dtype)
    noise_gmean = jnp.sum(state.noise_means * noise_w, axis=0)  # (6,)

    delta_n = (features[None] - state.noise_means) / state.noise_stds**2
    delta_s = (features[None] - state.speech_means) / state.speech_stds**2

    nm = (state.noise_means
          + jnp.where(vadflag, 0.0, _NOISE_UPDATE * ngpr * delta_n)
          + _BACK_ETA * (mean_values - noise_gmean)[None])
    g_idx = jnp.arange(2, dtype=dtype)[:, None]
    ch_idx = jnp.arange(6, dtype=dtype)[None, :]
    nm = jnp.clip(nm, g_idx + 5.0, 72.0 + g_idx - ch_idx)

    sm = state.speech_means + _SPEECH_UPDATE * sgpr * delta_s
    sm = jnp.clip(sm, jnp.asarray(_MIN_MEAN, dtype)[:, None], (12800.0 + 640.0) / 128.0)
    sm = jnp.where(vadflag, sm, state.speech_means)

    ss = state.speech_stds + sgpr * (
        delta_s * (features[None] - state.speech_means) - 1.0
    ) * 0.1 / state.speech_stds
    ss = jnp.maximum(ss, _MIN_STD)
    ss = jnp.where(vadflag, ss, state.speech_stds)

    ns = state.noise_stds + ngpr * (
        delta_n * (features[None] - state.noise_means) - 1.0
    ) / state.noise_stds
    ns = jnp.maximum(ns, _MIN_STD)
    ns = jnp.where(vadflag, state.noise_stds, ns)

    # model separation + drift control; the separation offset is added into
    # the means themselves (the original's WeightedAverage mutates its input)
    noise_gmean = jnp.sum(nm * noise_w, axis=0)
    speech_gmean = jnp.sum(sm * speech_w, axis=0)
    diff = speech_gmean - noise_gmean
    t_sep = jnp.maximum(jnp.asarray(_MIN_DIFF, dtype) - diff, 0.0)
    sm = sm + 0.8 * t_sep[None]
    nm = nm - 0.2 * t_sep[None]
    speech_gmean = jnp.sum(sm * speech_w, axis=0)
    noise_gmean = jnp.sum(nm * noise_w, axis=0)
    sm = sm - jnp.maximum(speech_gmean - jnp.asarray(_MAX_SPEECH, dtype), 0.0)[None]
    nm = nm - jnp.maximum(noise_gmean - jnp.asarray(_MAX_NOISE, dtype), 0.0)[None]

    new_state = GmmState(
        noise_means=jnp.where(active, nm, state.noise_means),
        speech_means=jnp.where(active, sm, state.speech_means),
        noise_stds=jnp.where(active, ns, state.noise_stds),
        speech_stds=jnp.where(active, ss, state.speech_stds),
        frame_count=state.frame_count + active.astype(jnp.int32),
        over_hang=state.over_hang,
        speech_run=state.speech_run,
        low_values=jnp.where(active, lows, state.low_values),
        value_ages=jnp.where(active, ages, state.value_ages),
        mean_values=jnp.where(active, mean_values, state.mean_values),
    )

    # hangover hysteresis
    flag_i = vadflag.astype(jnp.int32)
    hang_flag = (flag_i == 0) & (state.over_hang > 0)
    out_flag = jnp.where(hang_flag, 2 + state.over_hang, flag_i)
    over_hang = jnp.where(hang_flag, state.over_hang - 1, state.over_hang)
    speech_run = jnp.where(flag_i == 0, 0, jnp.minimum(state.speech_run + 1, _MAX_SPEECH_FRAMES))
    over_hang = jnp.where(
        flag_i > 0,
        jnp.where(state.speech_run + 1 > _MAX_SPEECH_FRAMES, oh_max2, oh_max1),
        over_hang,
    )
    new_state = new_state._replace(over_hang=over_hang, speech_run=speech_run)
    return new_state, out_flag


def webrtc_vad_flags(
    signal: jax.Array, mode: int = 0, dtype=jnp.float32
) -> jax.Array:
    """Offline batch VAD: int16 samples -> per-10 ms flags.

    Whole-signal filterbank (parallel) + frame scan for the GMM. Trailing
    samples that do not fill a frame are dropped, like the streaming path.
    """
    thresholds = MODE_TABLE[mode]
    n_frames = signal.shape[0] // FRAME_LEN_16K
    x = signal[: n_frames * FRAME_LEN_16K].astype(dtype)
    features, total, _ = extract_features(x, initial_filter_state(dtype))
    step = functools.partial(gmm_step, thresholds=thresholds)
    _, flags = jax.lax.scan(step, initial_gmm_state(dtype), (features, total))
    return flags


class WebRtcVadJax:
    """Jit-wrapped offline WebRTC-style VAD with per-mode compilation."""

    def __init__(self, mode: int = 0, dtype=jnp.float32):
        self.mode = mode
        self.dtype = dtype

    @functools.cached_property
    def _fn(self):
        mode, dtype = self.mode, self.dtype
        return jax.jit(lambda sig: webrtc_vad_flags(sig, mode, dtype))

    def process(self, signal) -> np.ndarray:
        return np.asarray(self._fn(jnp.asarray(signal)))
