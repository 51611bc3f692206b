"""VAD subsystem: native C++ detectors, JAX ports, and cross-checks.

Follows the reference's own correctness technique (SURVEY.md §4):
cross-checking independent implementations of the same math — here the
streaming C++ detectors against the vectorized JAX programs.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lnasr_tpu.config import LTSDConfig
from lnasr_tpu.vad.ltsd import VadLtsd, ltsd_scores
from lnasr_tpu.vad.native import AmrWbVad, WebRtcVad
from lnasr_tpu.vad.webrtc import WebRtcVadJax, extract_features, initial_filter_state
from tests.conftest import synthetic_speech


# ---- LTSD ------------------------------------------------------------------


def _ltsd_oracle(data, winsize, stepsize, order, threshold, alpha):
    """NumPy oracle of the reference LTSD (VadLstd.py:44-74)."""
    from tests.reference_impl.mfcc_ref import frame_signal

    pad = np.concatenate([np.zeros(stepsize), data])
    frames = frame_signal(pad, winsize, stepsize)
    n = np.arange(winsize)
    frames = frames * (0.54 - 0.46 * np.cos(2 * np.pi * n / (winsize - 1)))
    amps = np.abs(np.fft.rfft(frames, winsize))
    noise = np.mean(amps[:2], axis=0) ** 2
    num = frames.shape[0]
    ltse = np.zeros_like(amps)
    for k in range(order, num - order):
        ltse[k] = amps[k - order : k + order].max(axis=0)
    out = np.zeros(num)
    for k in range(order, num - order):
        val = np.sum(ltse[k] ** 2 / noise)
        out[k] = 10 * np.log10(val / winsize)
        if alpha is not None and out[k] < threshold:
            noise = alpha * noise + (1 - alpha) * (np.sum(ltse[k]) / winsize)
    return out


@pytest.mark.parametrize("alpha", [None, 0.4])
def test_ltsd_parity(vad_audio, alpha):
    data = np.asarray(vad_audio[:60000], dtype=np.float64) / 32768.0
    cfg = LTSDConfig(win_size=1024, step_size=512, order=4, threshold=-6.0, alpha=alpha)
    ours = np.asarray(VadLtsd(cfg, dtype=jnp.float64).detect(data).ltsd)
    ref = _ltsd_oracle(data, 1024, 512, 4, -6.0, alpha)
    np.testing.assert_allclose(ours, ref, rtol=1e-8, atol=1e-10)


def test_ltsd_separates_speech_from_silence():
    speech = synthetic_speech(32000, seed=1).astype(np.float64) / 32768.0
    silence = np.random.default_rng(2).normal(0, 3e-4, 32000)
    sig = np.concatenate([silence, speech])
    cfg = LTSDConfig(win_size=1024, step_size=512, order=4, threshold=0.0)
    res = VadLtsd(cfg).detect(sig)
    scores = np.asarray(res.ltsd)
    n_half = len(scores) // 2
    assert scores[n_half + 4 : -4].mean() > scores[4:n_half - 4].mean() + 10.0


def test_ltsd_batch_matches_single(vad_audio):
    data = np.asarray(vad_audio[:40000], np.float64) / 32768.0
    cfg = LTSDConfig(win_size=1024, step_size=512, order=4)
    vad = VadLtsd(cfg, dtype=jnp.float64)
    single = np.asarray(vad.detect(data).ltsd)
    batch = np.asarray(vad.detect_batch(np.stack([data, data])).ltsd)
    np.testing.assert_allclose(batch[0], single)
    np.testing.assert_allclose(batch[1], single)


# ---- native WebRTC-style VAD ----------------------------------------------


def test_webrtc_native_runs(vad_audio):
    vad = WebRtcVad(mode=0)
    flags = vad.process(np.asarray(vad_audio))
    assert flags.shape[0] == len(vad_audio) // 160
    speech_ratio = np.mean(flags > 0)
    assert 0.05 < speech_ratio < 0.95  # real mixed audio: both classes present


def test_webrtc_native_modes_monotone(vad_audio):
    """More aggressive modes should flag no more speech than lax ones."""
    ratios = []
    for mode in range(4):
        vad = WebRtcVad(mode=mode)
        flags = vad.process(np.asarray(vad_audio))
        ratios.append(np.mean(flags > 0))
    assert ratios[0] >= ratios[2] - 0.02
    assert ratios[2] >= ratios[3] - 0.02


def test_webrtc_native_reset_deterministic(vad_audio):
    data = np.asarray(vad_audio[: 160 * 400])
    vad = WebRtcVad(mode=2)
    a = vad.process(data)
    vad.reset()
    b = vad.process(data)
    np.testing.assert_array_equal(a, b)


def test_webrtc_native_silence_all_zero():
    vad = WebRtcVad(mode=0)
    flags = vad.process(np.zeros(160 * 50, np.int16))
    assert np.all(flags == 0)


@pytest.mark.parametrize("mode", [0, 2])
def test_webrtc_native_matches_oracle(vad_audio, mode):
    """The C++ detector must reproduce the literal float-algorithm oracle
    decision-for-decision (same arithmetic order, so exact agreement)."""
    from tests.reference_impl.wvad_ref import WvadOracle

    data = np.asarray(vad_audio[: 160 * 300])
    oracle_flags = WvadOracle(mode=mode).process(data)
    native_flags = WebRtcVad(mode=mode).process(data)
    np.testing.assert_array_equal(native_flags, oracle_flags)


@pytest.mark.parametrize("rate", [8000, 32000, 48000])
def test_webrtc_native_multirate(vad_audio, rate):
    """8/32/48 kHz entries (reference vad_core.c:629-694): the same real
    recording resampled to another rate must yield near-identical per-10 ms
    decisions (not exact: resampling perturbs band energies)."""
    from lnasr_tpu.utils.audio import resample

    data16 = np.asarray(vad_audio)
    flags16 = WebRtcVad(mode=0).process(data16) > 0

    other = np.clip(resample(data16.astype(np.float64), 16000, rate),
                    -32768, 32767).astype(np.int16)
    vad = WebRtcVad(mode=0, sample_rate=rate)
    assert vad.FRAME_LEN == rate // 100
    flags = vad.process(other) > 0
    n = min(len(flags), len(flags16))
    agreement = np.mean(flags[:n] == flags16[:n])
    assert agreement > 0.9, f"{rate} Hz agreement {agreement:.3f}"


def test_webrtc_native_rejects_bad_rate():
    with pytest.raises(ValueError):
        WebRtcVad(sample_rate=44100)


# ---- JAX WebRTC-style VAD vs native ---------------------------------------


@pytest.mark.parametrize("mode", [0, 1, 2, 3])
def test_webrtc_jax_matches_native(vad_audio, mode):
    """The scan-based JAX port and the streaming C++ detector implement the
    same float algorithm. In principle a different float summation order
    could flip a knife-edge threshold comparison on some input; on the
    reference recording no frame sits on such an edge in ANY mode, so the
    gate is exact (the docs/parity.md claim, measured)."""
    data = np.asarray(vad_audio)
    native = WebRtcVad(mode=mode).process(data)
    jaxed = WebRtcVadJax(mode=mode).process(data)
    assert jaxed.shape == native.shape
    np.testing.assert_array_equal(np.asarray(jaxed) > 0, native > 0)


def test_webrtc_jax_features_finite(vad_audio):
    x = jnp.asarray(np.asarray(vad_audio[: 160 * 200], np.float32))
    feats, total, _ = extract_features(x, initial_filter_state())
    assert np.isfinite(np.asarray(feats)).all()
    assert np.asarray(total).min() >= 0


# ---- native AMR-WB-style VAD ----------------------------------------------


def test_amrwb_native_runs(vad_audio):
    vad = AmrWbVad()
    vad.set_pow_low(1e8)  # the reference test's operating point
    flags, power = vad.process(np.asarray(vad_audio))
    assert flags.shape[0] == len(vad_audio) // 256
    assert 0.05 < np.mean(flags) < 0.95
    # reported power sums match a direct two-frame energy computation
    frames = np.asarray(vad_audio[: flags.shape[0] * 256], np.float64).reshape(-1, 256)
    energy = 2.0 * np.sum(frames * frames, axis=1)
    expect = energy.copy()
    expect[1:] += energy[:-1]
    np.testing.assert_allclose(power, expect, rtol=1e-12)


def test_amrwb_power_gate():
    """With a power floor above the whole signal's energy, every frame must
    be classified noise."""
    vad = AmrWbVad()
    vad.set_pow_low(1e12)
    quiet = (synthetic_speech(256 * 80, seed=3) * 0.01).astype(np.int16)
    flags, _ = vad.process(quiet)
    assert np.all(flags == 0)


def test_amrwb_reset_deterministic(vad_audio):
    data = np.asarray(vad_audio[: 256 * 200])
    vad = AmrWbVad()
    a, pa = vad.process(data)
    vad.reset()
    vad.set_pow_low(30000.0)
    b, pb = vad.process(data)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(pa, pb)
