"""Discrete HMM model: EM parity vs the oracle, convergence, persistence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lnasr_tpu.models.hmm import HMM, em_step, HMMParams
from tests.reference_impl import hmm_ref

A = np.log(np.array([[0.6, 0.4], [0.5, 0.5]]))
B = np.log(np.array([[0.2, 0.4, 0.4], [0.5, 0.4, 0.1]]))
PI = np.log(np.array([0.8, 0.2]))
OBS = np.array([2, 0, 2])


def test_calc_prob_and_decode():
    h = HMM(2, 3, A, B, PI, dtype=jnp.float64)
    log_b = B[:, OBS].T
    alpha_ref = hmm_ref.forward_ref(PI, A, log_b)
    from scipy.special import logsumexp

    np.testing.assert_allclose(float(h.calc_prob(OBS)), logsumexp(alpha_ref[-1]), rtol=1e-12)
    _, _, path_ref = hmm_ref.viterbi_ref(PI, A, log_b)
    np.testing.assert_array_equal(np.asarray(h.decode(OBS)), path_ref)


def test_em_step_parity_single_sequence():
    """One EM iteration must match the oracle's reference-convention M-step."""
    rng = np.random.default_rng(3)
    n, m, t = 4, 5, 60
    log_a = np.log(rng.dirichlet(np.ones(n), size=n))
    log_b = np.log(rng.dirichlet(np.ones(m), size=n))
    log_pi = np.log(rng.dirichlet(np.ones(n)))
    obs = rng.integers(0, m, size=t)

    params = HMMParams(jnp.asarray(log_a), jnp.asarray(log_b), jnp.asarray(log_pi))
    new_params, loglik = em_step(params, jnp.asarray(obs)[None], jnp.ones((1, t), bool))

    (pi_ref, a_ref, b_ref), ll_ref = hmm_ref.em_iteration_ref(log_pi, log_a, log_b, obs)
    np.testing.assert_allclose(float(loglik), ll_ref, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(new_params.log_a), a_ref, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(new_params.log_b), b_ref, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(new_params.log_pi), pi_ref, rtol=1e-9, atol=1e-12)


def test_train_monotone_loglik():
    """EM log-likelihood must be non-decreasing (the reference's training
    loop prints exactly this sequence, hmm.py:285-313)."""
    obs = np.array((0, 1, 1, 2, 0, 4, 2, 3, 4, 2, 0, 2, 3, 4, 4, 2, 1, 0, 1) * 10)
    h = HMM(4, 5, dtype=jnp.float64).reset("random", jax.random.PRNGKey(42))
    history = h.train(obs, iters=30)
    assert len(history) > 1
    diffs = np.diff(np.array(history))
    assert np.all(diffs > -1e-8)
    # distributions stay normalized
    np.testing.assert_allclose(np.exp(np.asarray(h.log_a)).sum(axis=1), 1.0, rtol=1e-8)
    np.testing.assert_allclose(np.exp(np.asarray(h.log_pi)).sum(), 1.0, rtol=1e-8)


def test_train_batch_equals_concat_stats():
    """Two sequences batched must differ from training on either alone and
    must keep rows normalized."""
    rng = np.random.default_rng(0)
    obs = rng.integers(0, 3, size=(4, 25))
    h = HMM(3, 3, dtype=jnp.float64).reset("random", jax.random.PRNGKey(1))
    history = h.train(obs, iters=10)
    assert np.all(np.diff(history) > -1e-8)
    np.testing.assert_allclose(np.exp(np.asarray(h.log_b)).sum(axis=1), 1.0, rtol=1e-8)


def test_batch_padding_invariance():
    """Identical sequences padded to different lengths give identical stats."""
    rng = np.random.default_rng(5)
    obs = rng.integers(0, 4, size=18)
    h1 = HMM(3, 4, dtype=jnp.float64).reset("random", jax.random.PRNGKey(2))
    h2 = HMM(3, 4, dtype=jnp.float64).reset("random", jax.random.PRNGKey(2))

    h1.train(obs, iters=3)
    padded = np.concatenate([obs, np.zeros(7, dtype=obs.dtype)])
    mask = np.arange(25) < 18
    h2.train(padded, iters=3, mask=mask)
    np.testing.assert_allclose(np.asarray(h1.log_a), np.asarray(h2.log_a), rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(h1.log_b), np.asarray(h2.log_b), rtol=1e-9, atol=1e-12)


def test_save_load_roundtrip(tmp_path):
    h = HMM(2, 3, A, B, PI, dtype=jnp.float64)
    path = str(tmp_path / "hmm.hdf5")
    h.save(path)
    h2 = HMM(dtype=jnp.float64).load(path)
    np.testing.assert_allclose(np.asarray(h2.log_a), A)
    np.testing.assert_allclose(np.asarray(h2.log_b), B)
    np.testing.assert_allclose(np.asarray(h2.log_pi), PI)
    assert (h2.n, h2.m) == (2, 3)


def test_from_counts():
    trans = np.array([[8.0, 2.0], [3.0, 7.0]])
    emit = np.array([[4.0, 0.0, 6.0], [1.0, 8.0, 1.0]])
    init = np.array([3.0, 1.0])
    h = HMM.from_counts(trans, emit, init)
    np.testing.assert_allclose(np.exp(np.asarray(h.log_a)), trans / trans.sum(1, keepdims=True))
    emit1 = emit + 1.0
    np.testing.assert_allclose(np.exp(np.asarray(h.log_b)), emit1 / emit1.sum(1, keepdims=True))
    np.testing.assert_allclose(np.exp(np.asarray(h.log_pi)), [0.75, 0.25])


def test_decode_batch():
    h = HMM(2, 3, A, B, PI, dtype=jnp.float64)
    obs = np.stack([OBS, OBS[::-1]])
    mask = np.ones_like(obs, dtype=bool)
    paths = np.asarray(h.decode_batch(obs, mask))
    for i in range(2):
        np.testing.assert_array_equal(paths[i], np.asarray(h.decode(obs[i])))
