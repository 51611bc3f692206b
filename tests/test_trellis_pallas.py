"""Pallas Viterbi kernel vs the scan implementation (interpret mode on the
CPU backend; the real-TPU path is exercised by bench.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lnasr_tpu.ops.trellis import viterbi_scan
from lnasr_tpu.ops.trellis_pallas import (
    viterbi_batched,
    viterbi_dense_vmem_ok,
    viterbi_pallas,
    viterbi_pallas_dense,
)


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
    log_pi, log_a = _model(rng, 33)
    log_b = jnp.asarray(rng.normal(size=(2, 10, 33)).astype(np.float32))
    with pytest.raises(ValueError):
        viterbi_pallas(log_pi, log_a, log_b, interpret=True)


@pytest.mark.parametrize("n", [9, 10, 17, 32])
def test_pallas_mid_n_states(n):
    """Round-3: 9..32-state topologies ride the kernel (round 2 silently
    fell back to the scan above N = 8)."""
    rng = np.random.default_rng(40 + n)
    log_pi, log_a = _model(rng, n)
    log_b = jnp.asarray(rng.normal(size=(3, 21, n)).astype(np.float32))
    path, score = viterbi_pallas(log_pi, log_a, log_b, interpret=True)
    ref = _ref(log_pi, log_a, log_b)
    np.testing.assert_array_equal(np.asarray(path), np.asarray(ref.path))
    np.testing.assert_allclose(np.asarray(score), np.asarray(ref.score),
                               rtol=1e-5)


# -- large-N dense kernel (the composed word-graph decoder's regime) ---------


@pytest.mark.parametrize("n,t", [(3, 12), (17, 30), (130, 25), (300, 14)])
def test_dense_kernel_matches_scan(n, t):
    """Path must be bit-identical (same max/argmax order and tie-break) and
    the score exactly equal — both run the same float32 op sequence."""
    rng = np.random.default_rng(n * 17 + t)
    log_pi, log_a = _model(rng, n)
    log_b = jnp.asarray(rng.normal(size=(t, n)).astype(np.float32))
    path, score = viterbi_pallas_dense(log_pi, log_a, log_b, interpret=True)
    ref = viterbi_scan(log_pi, log_a, log_b)
    np.testing.assert_array_equal(np.asarray(path), np.asarray(ref.path))
    np.testing.assert_allclose(float(score), float(ref.score), rtol=1e-6)


def test_dense_kernel_with_final_weights():
    """log_final must steer the terminal argmax exactly as in the scan."""
    rng = np.random.default_rng(7)
    n, t = 24, 18
    log_pi, log_a = _model(rng, n)
    log_b = jnp.asarray(rng.normal(size=(t, n)).astype(np.float32))
    # literal -inf finals: the wrapper must sanitize them to the finite
    # sentinel (0 * -inf in the MXU relayout would inject NaNs)
    log_final = jnp.asarray(
        np.where(rng.random(n) < 0.7, -np.inf, 0.0).astype(np.float32)
    )
    path, score = viterbi_pallas_dense(
        log_pi, log_a, log_b, log_final, interpret=True
    )
    ref = viterbi_scan(log_pi, log_a, log_b, log_final=log_final)
    np.testing.assert_array_equal(np.asarray(path), np.asarray(ref.path))
    np.testing.assert_allclose(float(score), float(ref.score), rtol=1e-6)


def test_dense_kernel_degenerate_lengths():
    rng = np.random.default_rng(8)
    log_pi, log_a = _model(rng, 5)
    log_b = jnp.asarray(rng.normal(size=(1, 5)).astype(np.float32))
    path, score = viterbi_pallas_dense(log_pi, log_a, log_b, interpret=True)
    ref = viterbi_scan(log_pi, log_a, log_b)
    np.testing.assert_array_equal(np.asarray(path), np.asarray(ref.path))


def test_dense_vmem_budget():
    assert viterbi_dense_vmem_ok(1000, 512)
    assert not viterbi_dense_vmem_ok(100000, 1024)


def test_batched_dispatch_fallback():
    """viterbi_batched must fall back to the scan for N > 32 and for
    VMEM-exceeding T, with identical results."""
    rng = np.random.default_rng(1)
    # N = 40 > widest kernel tile -> scan path
    log_pi, log_a = _model(rng, 40)
    log_b = jnp.asarray(rng.normal(size=(3, 25, 40)).astype(np.float32))
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


def test_kernels_under_exact_ties():
    """All-ties adversarial case for the small-N and dense kernels: zero
    emissions and symmetric transitions tie every max; paths must still
    match the scan's first-max selections bit for bit."""
    n, t, b = 6, 19, 5
    log_pi = jnp.zeros((n,), jnp.float32)
    log_a = jnp.zeros((n, n), jnp.float32)  # every transition ties
    log_b_b = jnp.zeros((b, t, n), jnp.float32)

    path, score = viterbi_pallas(log_pi, log_a, log_b_b, interpret=True)
    ref = jax.vmap(lambda lb: viterbi_scan(log_pi, log_a, lb))(log_b_b)
    np.testing.assert_array_equal(np.asarray(path), np.asarray(ref.path))

    log_b_d = jnp.zeros((t, n), jnp.float32)
    path_d, score_d = viterbi_pallas_dense(log_pi, log_a, log_b_d,
                                           interpret=True)
    ref_d = viterbi_scan(log_pi, log_a, log_b_d)
    np.testing.assert_array_equal(np.asarray(path_d), np.asarray(ref_d.path))
    assert float(score_d) == float(ref_d.score)
