"""The flagship kernels must SERVE, not just bench (round-3 verdict).

Covers the serving-path dispatch: ``MFCC.features_fast`` /
``AcousticModel.features`` ride the fused Pallas frontend wherever it is
available (forced via ``frontend="fused"`` + interpret mode here, since
tests run on CPU), the XLA pipeline otherwise — and both produce the same
features, so the whole Recognizer decodes identically either way.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lnasr_tpu.config import GMMHMMConfig, MFCCConfig
from lnasr_tpu.models.mfcc import MFCC, use_fused_frontend
from lnasr_tpu.models.recognizer import AcousticModel

FUSED = MFCCConfig(energy_floor=1e-10, mean_norm=False, frontend="fused")
XLA = MFCCConfig(energy_floor=1e-10, mean_norm=False, frontend="xla")


def test_auto_dispatch_is_backend_keyed():
    auto = MFCCConfig()
    assert use_fused_frontend(auto) == (jax.default_backend() == "tpu")
    assert use_fused_frontend(FUSED) is True
    assert use_fused_frontend(XLA) is False
    with pytest.raises(ValueError, match="frontend"):
        use_fused_frontend(MFCCConfig(frontend="cuda"))


def test_default_passes_is_f32_faithful():
    """Serving default: fused_passes=6 (f32-faithful), per the verdict."""
    assert MFCCConfig().fused_passes == 6


def test_features_fast_fused_matches_xla(speech_audio):
    sig = np.asarray(speech_audio[:16000], np.float32)
    ref, ref_mask = MFCC(XLA).features_fast(sig)
    got, got_mask = MFCC(FUSED).features_fast(sig)
    assert ref_mask is None and got_mask is None
    assert got.shape == ref.shape
    err = np.max(np.abs(np.asarray(got) - np.asarray(ref)))
    assert err < 0.01, f"serving feature err {err}"


def test_features_fast_batched_with_lengths(speech_audio):
    sigs = np.stack([speech_audio[:16000], speech_audio[2000:18000]]).astype(
        np.float32
    )
    lengths = np.array([16000, 12345])
    ref, ref_mask = MFCC(XLA).features_fast(sigs, lengths)
    got, got_mask = MFCC(FUSED).features_fast(sigs, lengths)
    np.testing.assert_array_equal(np.asarray(got_mask), np.asarray(ref_mask))
    m = np.asarray(ref_mask)[:, :, None]
    err = np.max(np.abs(np.asarray(got) - np.asarray(ref)) * m)
    assert err < 0.01, f"masked serving feature err {err}"


def test_acoustic_model_features_ride_the_dispatch(speech_audio):
    sig = np.asarray(speech_audio[:12000])
    am_fused = AcousticModel(mfcc_config=FUSED)
    am_xla = AcousticModel(mfcc_config=XLA)
    f1, f2 = am_fused.features(sig), am_xla.features(sig)
    assert f1.shape == f2.shape
    assert np.max(np.abs(f1 - f2)) < 0.01
    bf, mask = am_fused.features_batch(sig[None].astype(np.float32))
    assert mask is None
    np.testing.assert_allclose(np.asarray(bf[0]), f1, atol=1e-5)


def test_recognizer_decodes_identically_on_both_frontends(speech_audio):
    """End-to-end: same words and (near-)same scores through either
    frontend — the fused kernel is a drop-in for the serving path."""
    from lnasr_tpu.models.lexicon import Lexicon
    from lnasr_tpu.models.recognizer import Recognizer, train_unit_models

    rng = np.random.default_rng(0)
    sig = np.asarray(speech_audio, np.float32)
    cfg = GMMHMMConfig(n_states=3, n_mix=2, dim=39)
    chunks = {
        "hi": [sig[:8000], sig[400:8400]],
        "yo": [sig[8000:16000], sig[8400:16400]],
    }

    def build(mfcc_cfg):
        am = AcousticModel(mfcc_config=mfcc_cfg)
        examples = {
            u: [np.asarray(am.mfcc.features_fast(c)[0]) for c in chunks[u]]
            for u in chunks
        }
        am.units = train_unit_models(examples, cfg, iters=3)
        lex = Lexicon({"hi": ["hi"], "yo": ["yo"]})
        return Recognizer(am, lex, graph="dense")

    test_sig = np.concatenate([sig[:8000], sig[8000:16000]])
    words_x, score_x = build(XLA).decode_segment(test_sig)
    words_f, score_f = build(FUSED).decode_segment(test_sig)
    assert words_x == words_f
    assert abs(score_x - score_f) < 1.0, (score_x, score_f)


def test_entry_rides_serving_kernels(speech_audio):
    """__graft_entry__.entry() must execute the serving stack (batched
    signals -> fused-or-XLA frontend -> viterbi_batched) under jit."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    paths, scores = jax.jit(fn)(*args)
    b, s = args[0].shape
    assert paths.shape[0] == b and scores.shape == (b,)
    assert np.isfinite(np.asarray(scores)).all()
    # and the path length matches the frame count of the signal
    from lnasr_tpu.ops.framing import num_frames

    cfg = MFCCConfig()
    assert paths.shape[1] == num_frames(s, cfg.frame_len, cfg.frame_step)
