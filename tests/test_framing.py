"""Framing/windowing semantics vs the reference's padding rule."""

import numpy as np
import jax.numpy as jnp
import pytest

from lnasr_tpu.ops import framing
from tests.reference_impl.mfcc_ref import frame_signal


@pytest.mark.parametrize("length", [400, 401, 399, 560, 7000, 100, 1])
def test_split_frames_matches_reference_rule(length):
    rng = np.random.default_rng(length)
    sig = rng.normal(size=length)
    ours = np.asarray(framing.split_frames(jnp.asarray(sig), 400, 160))
    ref = frame_signal(sig, 400, 160)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=0, atol=0)


def test_split_frames_batched():
    rng = np.random.default_rng(0)
    sig = rng.normal(size=(3, 1000))
    out = np.asarray(framing.split_frames(jnp.asarray(sig), 400, 160))
    for b in range(3):
        np.testing.assert_array_equal(out[b], frame_signal(sig[b], 400, 160))


def test_hamming_window():
    w = framing.hamming_window(400)
    n = np.arange(400)
    np.testing.assert_allclose(w, 0.54 - 0.46 * np.cos(2 * np.pi * n / 399))


def test_preemphasis():
    x = np.array([1.0, 2.0, 3.0, 4.0])
    y = np.asarray(framing.preemphasis(jnp.asarray(x), 0.97))
    np.testing.assert_allclose(y, [1.0, 2.0 - 0.97, 3.0 - 0.97 * 2, 4.0 - 0.97 * 3])


def test_frame_mask_counts():
    lengths = jnp.asarray([1, 100, 400, 560, 7000])
    n = framing.num_frames(7000, 400, 160)
    mask = np.asarray(framing.frame_mask(lengths, n, 400, 160))
    for i, ln in enumerate([1, 100, 400, 560, 7000]):
        assert mask[i].sum() == framing.num_frames(ln, 400, 160)
