"""Standalone GMM model: EM fit recovers planted mixtures; scoring APIs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.stats import multivariate_normal

from lnasr_tpu.models.gmm import GMM
from lnasr_tpu.ops.numerics import logsumexp2


def _planted_data(rng, n_per=400):
    centers = np.array([[-4.0, 0.0], [4.0, 0.0], [0.0, 5.0]])
    stds = np.array([0.5, 0.8, 0.6])
    x = np.concatenate(
        [rng.normal(c, s, size=(n_per, 2)) for c, s in zip(centers, stds)]
    )
    rng.shuffle(x)
    return x, centers, stds


def test_em_recovers_mixture():
    rng = np.random.default_rng(0)
    x, centers, stds = _planted_data(rng)
    gmm = GMM(3, 2, dtype=jnp.float64)
    history = gmm.fit(x, iters=100, key=jax.random.PRNGKey(1))
    assert history[-1] > history[0]
    # each planted center matched by some learned mean
    mu = np.asarray(gmm.mu)
    for c in centers:
        assert np.min(np.linalg.norm(mu - c, axis=1)) < 0.25
    w = np.exp(np.asarray(gmm.log_w))
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-9)
    np.testing.assert_allclose(w, 1 / 3, atol=0.05)


def test_logpdf_matches_scipy():
    rng = np.random.default_rng(1)
    gmm = GMM(2, 3, dtype=jnp.float64)
    gmm.log_w = jnp.log(jnp.asarray([0.3, 0.7]))
    gmm.mu = jnp.asarray(rng.normal(size=(2, 3)))
    gmm.cov = jnp.asarray(rng.uniform(0.5, 2.0, size=(2, 3)))
    x = rng.normal(size=(50, 3))
    expected = np.log(
        0.3 * multivariate_normal.pdf(x, np.asarray(gmm.mu[0]), np.diag(np.asarray(gmm.cov[0])))
        + 0.7 * multivariate_normal.pdf(x, np.asarray(gmm.mu[1]), np.diag(np.asarray(gmm.cov[1])))
    )
    np.testing.assert_allclose(np.asarray(gmm.logpdf(x)), expected, rtol=1e-9)


def test_predict_separates_clusters():
    rng = np.random.default_rng(2)
    x, _, _ = _planted_data(rng, n_per=200)
    gmm = GMM(3, 2, dtype=jnp.float64)
    gmm.fit(x, iters=60, key=jax.random.PRNGKey(3))
    labels = np.asarray(gmm.predict(x))
    assert len(np.unique(labels)) == 3


def test_full_covariance_fit():
    rng = np.random.default_rng(3)
    q = np.array([[1.0, 0.8], [0.0, 0.5]])
    x = rng.normal(size=(800, 2)) @ q.T + np.array([2.0, -1.0])
    gmm = GMM(1, 2, cov_type="full", dtype=jnp.float64)
    gmm.fit(x, iters=10, key=jax.random.PRNGKey(4))
    np.testing.assert_allclose(np.asarray(gmm.mu[0]), x.mean(axis=0), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(gmm.cov[0]), np.cov(x.T, bias=True), atol=0.02
    )


def test_save_load(tmp_path):
    rng = np.random.default_rng(4)
    x, _, _ = _planted_data(rng, n_per=100)
    gmm = GMM(3, 2, dtype=jnp.float64)
    gmm.fit(x, iters=20, key=jax.random.PRNGKey(5))
    path = str(tmp_path / "gmm.hdf5")
    gmm.save(path)
    gmm2 = GMM(3, 2, dtype=jnp.float64).load(path)
    np.testing.assert_allclose(gmm2.score(x), gmm.score(x), rtol=1e-12)


def test_logsumexp2():
    x = np.array([1.0, 2.0, 3.0])
    expected = np.log2(np.sum(2.0**x))
    np.testing.assert_allclose(float(logsumexp2(jnp.asarray(x))), expected, rtol=1e-12)
