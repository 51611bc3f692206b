"""Gaussian pdf surface vs scipy and the oracle (reference gmm.py parity)."""

import numpy as np
import jax.numpy as jnp
from scipy.stats import multivariate_normal, norm

from lnasr_tpu.ops import gaussian
from tests.reference_impl.gmmhmm_ref import mvn_logpdf_ref


def test_univariate():
    x = np.linspace(-3, 3, 50)
    ours = np.asarray(gaussian.gaussian_logpdf(jnp.asarray(x), 0.5, 2.0))
    np.testing.assert_allclose(ours, norm.logpdf(x, 0.5, np.sqrt(2.0)), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(gaussian.gaussian_pdf(jnp.asarray(x), 0.5, 2.0)),
        norm.pdf(x, 0.5, np.sqrt(2.0)),
        rtol=1e-10,
    )


def test_mvn_full():
    rng = np.random.default_rng(0)
    d = 4
    q = rng.normal(size=(d, d)) * 0.3
    sigma = q @ q.T + np.eye(d)
    mu = rng.normal(size=d)
    x = rng.normal(size=(20, d))
    ours = np.asarray(gaussian.mvn_logpdf_full(jnp.asarray(x), jnp.asarray(mu), jnp.asarray(sigma)))
    np.testing.assert_allclose(ours, multivariate_normal.logpdf(x, mu, sigma), rtol=1e-9)
    np.testing.assert_allclose(ours, mvn_logpdf_ref(x, mu, sigma), rtol=1e-9)


def test_mixture_full():
    rng = np.random.default_rng(1)
    m, d = 3, 2
    w = rng.dirichlet(np.ones(m))
    mu = rng.normal(size=(m, d))
    sigma = np.stack([np.eye(d) * s for s in [0.5, 1.0, 2.0]])
    x = rng.normal(size=(30, d))

    expected = np.zeros(30)
    for k in range(m):
        expected += w[k] * multivariate_normal.pdf(x, mu[k], sigma[k])

    lin = np.asarray(gaussian.gmm_pdf_full(jnp.asarray(w), jnp.asarray(x), jnp.asarray(mu), jnp.asarray(sigma)))
    np.testing.assert_allclose(lin, expected, rtol=1e-9)

    log = np.asarray(
        gaussian.gmm_logpdf_full(jnp.asarray(np.log(w)), jnp.asarray(x), jnp.asarray(mu), jnp.asarray(sigma))
    )
    np.testing.assert_allclose(np.exp(log), expected, rtol=1e-9)


def test_diag_components_logpdf():
    rng = np.random.default_rng(2)
    t, n, m, d = 15, 3, 2, 5
    mu = rng.normal(size=(n, m, d))
    var = rng.uniform(0.3, 2.0, size=(n, m, d))
    obs = rng.normal(size=(t, d))
    out = np.asarray(gaussian.diag_components_logpdf(jnp.asarray(obs), jnp.asarray(mu), jnp.asarray(var)))
    assert out.shape == (t, n, m)
    for j in range(n):
        for k in range(m):
            expected = multivariate_normal.logpdf(obs, mu[j, k], np.diag(var[j, k]))
            np.testing.assert_allclose(out[:, j, k], expected, rtol=1e-8)
