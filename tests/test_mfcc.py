"""MFCC frontend parity vs the float64 NumPy oracle (BASELINE.md requires
allclose per-frame MFCCs against the reference math)."""

import numpy as np
import jax.numpy as jnp
import pytest

from lnasr_tpu.config import MFCCConfig
from lnasr_tpu.models.mfcc import MFCC, mfcc_features
from tests.reference_impl.mfcc_ref import mfcc_ref


@pytest.fixture(scope="module")
def oracle(speech_audio):
    return mfcc_ref(speech_audio)


@pytest.mark.parametrize("method", ["fft", "matmul"])
def test_mfcc_parity(speech_audio, oracle, method):
    cfg = MFCCConfig(spectrum_method=method)
    result = mfcc_features(jnp.asarray(speech_audio), cfg, dtype=jnp.float64)
    power_ref, ceps_ref, feats_ref = oracle
    np.testing.assert_allclose(np.asarray(result.power), power_ref, rtol=1e-9, atol=1e-6)
    np.testing.assert_allclose(np.asarray(result.cepstrum), ceps_ref, rtol=1e-7, atol=1e-7)
    np.testing.assert_allclose(np.asarray(result.features), feats_ref, rtol=1e-7, atol=1e-7)
    assert result.features.shape[1] == 39


def test_mfcc_f32_close(speech_audio, oracle):
    """The fast float32 path stays close to the float64 oracle."""
    result = mfcc_features(jnp.asarray(speech_audio), MFCCConfig(), dtype=jnp.float32)
    _, _, feats_ref = oracle
    err = np.abs(np.asarray(result.features) - feats_ref)
    scale = np.maximum(np.abs(feats_ref), 1.0)
    assert np.quantile(err / scale, 0.999) < 5e-2


def test_mfcc_batch_padding_invariance(speech_audio):
    """A zero-padded batched utterance must produce the same valid frames as
    the unpadded single-utterance path."""
    sig = np.asarray(speech_audio[:8000], dtype=np.float64)
    single = mfcc_features(jnp.asarray(sig), MFCCConfig(), dtype=jnp.float64)

    padded = np.zeros(12000)
    padded[:8000] = sig
    mfcc = MFCC(MFCCConfig(), dtype=jnp.float64)
    batch = mfcc.extract_batch(padded[None], np.asarray([8000]))
    n_valid = int(np.asarray(batch.mask[0]).sum())
    assert n_valid == single.features.shape[0]
    np.testing.assert_allclose(
        np.asarray(batch.features[0][:n_valid]),
        np.asarray(single.features),
        rtol=1e-9,
        atol=1e-9,
    )


def test_mfcc_standard_delta(speech_audio):
    cfg = MFCCConfig(delta_mode="standard")
    result = mfcc_features(jnp.asarray(speech_audio), cfg, dtype=jnp.float64)
    feats = np.asarray(result.features)
    # standard delta: first row is f[1] - f[0]
    np.testing.assert_allclose(
        feats[0, 13:26], feats[1, :13] - feats[0, :13], rtol=1e-12
    )


def test_mfcc_wrapper_matches_fn(speech_audio):
    mfcc = MFCC(MFCCConfig(), dtype=jnp.float64)
    a = mfcc(speech_audio)
    b = mfcc_features(jnp.asarray(speech_audio), MFCCConfig(), dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(a.features), np.asarray(b.features))
