"""Pallas Viterbi kernel vs the scan implementation (interpret mode on the
CPU backend; the real-TPU path is exercised by bench.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lnasr_tpu.ops.trellis import viterbi_scan
from lnasr_tpu.ops.trellis_pallas import viterbi_batched, viterbi_pallas


def _model(rng, n):
    log_a = np.log(rng.dirichlet(np.ones(n), size=n)).astype(np.float32)
    log_pi = np.log(rng.dirichlet(np.ones(n))).astype(np.float32)
    return jnp.asarray(log_pi), jnp.asarray(log_a)


def _ref(log_pi, log_a, log_b):
    return jax.vmap(lambda lb: viterbi_scan(log_pi, log_a, lb))(log_b)


@pytest.mark.parametrize("n,b,t", [(2, 3, 20), (5, 7, 50), (8, 130, 33)])
def test_pallas_matches_scan(n, b, t):
    rng = np.random.default_rng(n * 1000 + b)
    log_pi, log_a = _model(rng, n)
    log_b = jnp.asarray(rng.normal(size=(b, t, n)).astype(np.float32))
    path, score = viterbi_pallas(log_pi, log_a, log_b, interpret=True)
    ref = _ref(log_pi, log_a, log_b)
    np.testing.assert_array_equal(np.asarray(path), np.asarray(ref.path))
    np.testing.assert_allclose(np.asarray(score), np.asarray(ref.score), rtol=1e-5)


def test_pallas_rejects_large_n():
    rng = np.random.default_rng(0)
    log_pi, log_a = _model(rng, 9)
    log_b = jnp.asarray(rng.normal(size=(2, 10, 9)).astype(np.float32))
    with pytest.raises(ValueError):
        viterbi_pallas(log_pi, log_a, log_b, interpret=True)


def test_batched_dispatch_fallback():
    """viterbi_batched must fall back to the scan for N > 8 and for
    VMEM-exceeding T, with identical results."""
    rng = np.random.default_rng(1)
    # N = 12 > sublane tile -> scan path
    log_pi, log_a = _model(rng, 12)
    log_b = jnp.asarray(rng.normal(size=(3, 25, 12)).astype(np.float32))
    path, score = viterbi_batched(log_pi, log_a, log_b, interpret=True)
    ref = _ref(log_pi, log_a, log_b)
    np.testing.assert_array_equal(np.asarray(path), np.asarray(ref.path))

    # small model -> kernel path
    log_pi, log_a = _model(rng, 4)
    log_b = jnp.asarray(rng.normal(size=(5, 30, 4)).astype(np.float32))
    path, score = viterbi_batched(log_pi, log_a, log_b, interpret=True)
    ref = _ref(log_pi, log_a, log_b)
    np.testing.assert_array_equal(np.asarray(path), np.asarray(ref.path))
    np.testing.assert_allclose(np.asarray(score), np.asarray(ref.score), rtol=1e-5)
