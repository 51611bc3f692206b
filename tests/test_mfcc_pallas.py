"""Fused Pallas MFCC frontend vs the XLA reference path (interpret mode).

The kernel must reproduce ``models/mfcc.py``'s features up to the
split-bf16 product error: ~2^-18 of the DFT magnitude scale at passes=3,
f32-faithful at passes=6. Reference parity of the XLA path itself against
the NumPy oracle is covered by test_mfcc.py; these tests pin the kernel to
the XLA path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lnasr_tpu.config import MFCCConfig
from lnasr_tpu.models.mfcc import mfcc_features, mfcc_features_fused
from lnasr_tpu.ops.mfcc_pallas import mel_frontend_pallas

CFG = MFCCConfig(energy_floor=1e-10)


def _signals(speech_audio, batch=3, n=20800):
    base = np.asarray(speech_audio, np.float32)
    reps = int(np.ceil(n / base.size)) + 1
    long = np.tile(base, reps)
    return np.stack([long[i * 37 : i * 37 + n] for i in range(batch)])


@pytest.fixture(scope="module")
def batch_f32(speech_audio):
    return jnp.asarray(_signals(speech_audio))


def _xla_features(sigs, lengths=None):
    if lengths is None:
        return jax.vmap(lambda s: mfcc_features(s, CFG, dtype=jnp.float32).features)(sigs)
    return jax.vmap(
        lambda s, l: mfcc_features(s, CFG, length=l, dtype=jnp.float32).features
    )(sigs, jnp.asarray(lengths))


def test_mel_frontend_matches_xla_mel(batch_f32):
    """Raw kernel outputs (mel energies, frame energy) against the XLA
    spectral chain, relative to the per-frame energy scale."""
    from lnasr_tpu.ops.spectral import mel_filterbank

    mel, energy = mel_frontend_pallas(batch_f32, CFG, passes=6, interpret=True)
    fbank = jnp.asarray(mel_filterbank(CFG.n_mels, CFG.fft_n, CFG.sample_rate), jnp.float32)
    ref = jax.vmap(lambda s: mfcc_features(s, CFG, dtype=jnp.float32).power)(batch_f32)
    ref_mel = jnp.einsum("btk,mk->btm", ref, fbank)
    ref_energy = ref.sum(-1)
    scale = float(jnp.max(ref_energy))
    np.testing.assert_allclose(np.asarray(mel), np.asarray(ref_mel),
                               atol=2e-6 * scale, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(energy), np.asarray(ref_energy),
                               atol=2e-6 * scale, rtol=1e-4)


@pytest.mark.parametrize("passes,tol", [(3, 0.1), (6, 0.01)])
def test_fused_features_match_xla(batch_f32, passes, tol):
    ref = _xla_features(batch_f32)
    got, mask = mfcc_features_fused(batch_f32, CFG, passes=passes, interpret=True)
    assert got.shape == ref.shape and bool(mask.all())
    err = np.max(np.abs(np.asarray(got) - np.asarray(ref)))
    assert err < tol, f"feature err {err} at passes={passes}"


def test_fused_variable_lengths(batch_f32):
    lengths = np.array([20800, 18000, 16123])
    ref = _xla_features(batch_f32, lengths)
    ref_mask = jax.vmap(
        lambda s, l: mfcc_features(s, CFG, length=l, dtype=jnp.float32).mask
    )(batch_f32, jnp.asarray(lengths))
    got, mask = mfcc_features_fused(
        batch_f32, CFG, lengths=lengths, passes=6, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(ref_mask))
    m = np.asarray(mask)[:, :, None]
    err = np.max(np.abs(np.asarray(got) - np.asarray(ref)) * m)
    assert err < 0.01, f"masked feature err {err}"


def test_fused_rejects_bad_passes(batch_f32):
    with pytest.raises(ValueError, match="passes"):
        mel_frontend_pallas(batch_f32, CFG, passes=4, interpret=True)


def test_fused_nonstandard_config(speech_audio):
    """Geometry generalizes: different frame/step/fft/n_mels still matches."""
    cfg = MFCCConfig(frame_t=20e-3, frame_stride=10e-3, fft_n=512, n_mels=26,
                     energy_floor=1e-10)
    sigs = jnp.asarray(_signals(speech_audio, batch=2, n=8000))
    ref = jax.vmap(lambda s: mfcc_features(s, cfg, dtype=jnp.float32).features)(sigs)
    got, _ = mfcc_features_fused(sigs, cfg, passes=6, interpret=True)
    err = np.max(np.abs(np.asarray(got) - np.asarray(ref)))
    assert got.shape == ref.shape
    assert err < 0.01, f"feature err {err}"
