"""GMM-HMM: emission parity, full-covariance EM parity vs the oracle,
diagonal-covariance training behavior, persistence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lnasr_tpu.config import GMMHMMConfig
from lnasr_tpu.models.gmmhmm import GMMHMM, GMMHMMParams, gmmhmm_em_step
from lnasr_tpu.ops.gaussian import gmm_emissions_diag, gmm_emissions_full
from tests.reference_impl import gmmhmm_ref


def _random_full_model(rng, n, m, d):
    a = np.log(rng.dirichlet(np.ones(n), size=n))
    pi = np.log(rng.dirichlet(np.ones(n)))
    w = np.log(rng.dirichlet(np.ones(m), size=n))
    mu = rng.normal(scale=0.3, size=(n, m, d))
    si = np.zeros((n, m, d, d))
    for j in range(n):
        for k in range(m):
            q = rng.normal(size=(d, d)) * 0.1
            si[j, k] = q @ q.T + np.eye(d)
    return a, pi, w, mu, si


def test_full_emissions_parity():
    rng = np.random.default_rng(0)
    n, m, d, t = 3, 2, 4, 25
    a, pi, w, mu, si = _random_full_model(rng, n, m, d)
    obs = rng.normal(size=(t, d))
    log_b_ref, log_bm_ref = gmmhmm_ref.emissions_ref(obs, w, mu, si)

    log_b, log_bm = gmm_emissions_full(
        jnp.asarray(obs), jnp.asarray(w), jnp.asarray(mu), jnp.asarray(si)
    )
    np.testing.assert_allclose(np.asarray(log_b), log_b_ref.T, rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(log_bm), np.transpose(log_bm_ref, (2, 0, 1)), rtol=1e-9, atol=1e-10
    )


def test_diag_emissions_match_full_with_diagonal_cov():
    """The MXU diagonal scorer must agree with the full scorer on diagonal
    covariances."""
    rng = np.random.default_rng(1)
    n, m, d, t = 4, 3, 6, 30
    w = np.log(rng.dirichlet(np.ones(m), size=n))
    mu = rng.normal(size=(n, m, d))
    var = rng.uniform(0.5, 2.0, size=(n, m, d))
    si = np.zeros((n, m, d, d))
    idx = np.arange(d)
    si[:, :, idx, idx] = var
    obs = rng.normal(size=(t, d))

    b_diag, bm_diag = gmm_emissions_diag(
        jnp.asarray(obs), jnp.asarray(w), jnp.asarray(mu), jnp.asarray(var)
    )
    b_full, bm_full = gmm_emissions_full(
        jnp.asarray(obs), jnp.asarray(w), jnp.asarray(mu), jnp.asarray(si)
    )
    np.testing.assert_allclose(np.asarray(b_diag), np.asarray(b_full), rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(bm_diag), np.asarray(bm_full), rtol=1e-8, atol=1e-9)


def test_full_cov_em_step_parity():
    """One EM sweep in full-covariance mode reproduces the reference
    estimator (including its old-mean covariance centering)."""
    rng = np.random.default_rng(2)
    n, m, d, t = 3, 2, 3, 40
    a, pi, w, mu, si = _random_full_model(rng, n, m, d)
    obs = rng.normal(scale=0.4, size=(t, d))

    params = GMMHMMParams(
        jnp.asarray(a), jnp.asarray(pi), jnp.asarray(w), jnp.asarray(mu), jnp.asarray(si)
    )
    new_params, loglik = gmmhmm_em_step(
        params, jnp.asarray(obs)[None], jnp.ones((1, t), bool), cov_type="full"
    )
    (a_ref, pi_ref, w_ref, mu_ref, si_ref), ll_ref = gmmhmm_ref.em_iteration_ref(
        pi, a, w, mu, si, obs
    )
    np.testing.assert_allclose(float(loglik), ll_ref, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(new_params.log_a), a_ref, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(new_params.log_pi), pi_ref, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(new_params.log_w), w_ref, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(new_params.mu), mu_ref, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(new_params.cov), si_ref, rtol=1e-7, atol=1e-9)


def test_diag_train_monotone():
    rng = np.random.default_rng(4)
    obs = rng.normal(scale=0.3, size=(60, 5)) + np.repeat(
        rng.normal(scale=1.0, size=(3, 5)), 20, axis=0
    )
    gh = GMMHMM(GMMHMMConfig(n_states=3, n_mix=2, dim=5), dtype=jnp.float64)
    gh.reset("random", jax.random.PRNGKey(0))
    history = gh.train(obs, iters=15)
    assert len(history) >= 2
    assert history[-1] > history[0]
    np.testing.assert_allclose(np.exp(np.asarray(gh.log_w)).sum(axis=1), 1.0, rtol=1e-8)
    assert np.all(np.asarray(gh.cov) >= gh.config.var_floor - 1e-12)


def test_diag_batch_padding_invariance():
    rng = np.random.default_rng(6)
    obs = rng.normal(size=(30, 4))
    cfg = GMMHMMConfig(n_states=2, n_mix=2, dim=4)
    g1 = GMMHMM(cfg, dtype=jnp.float64).reset("random", jax.random.PRNGKey(3))
    g2 = GMMHMM(cfg, dtype=jnp.float64).reset("random", jax.random.PRNGKey(3))
    g1.train(obs, iters=3)
    padded = np.vstack([obs, rng.normal(size=(10, 4))])
    mask = np.arange(40) < 30
    g2.train(padded, iters=3, mask=mask)
    np.testing.assert_allclose(np.asarray(g1.mu), np.asarray(g2.mu), rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(g1.cov), np.asarray(g2.cov), rtol=1e-9, atol=1e-11)


def test_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(7)
    cfg = GMMHMMConfig(n_states=2, n_mix=2, dim=3)
    gh = GMMHMM(cfg, dtype=jnp.float64).reset("random", jax.random.PRNGKey(5))
    path = str(tmp_path / "gh.hdf5")
    gh.save(path)

    gh2 = GMMHMM(cfg, dtype=jnp.float64).load(path)
    np.testing.assert_allclose(np.asarray(gh2.mu), np.asarray(gh.mu))
    np.testing.assert_allclose(np.asarray(gh2.cov), np.asarray(gh.cov))

    # full-covariance model can read the same file via the expanded ``si``
    gh3 = GMMHMM(
        GMMHMMConfig(n_states=2, n_mix=2, dim=3, cov_type="full"), dtype=jnp.float64
    ).load(path)
    si = np.asarray(gh3.cov)
    idx = np.arange(3)
    np.testing.assert_allclose(si[:, :, idx, idx], np.asarray(gh.cov))


def test_decode_and_calc_prob():
    rng = np.random.default_rng(8)
    cfg = GMMHMMConfig(n_states=2, n_mix=2, dim=3)
    gh = GMMHMM(cfg, dtype=jnp.float64).reset("random", jax.random.PRNGKey(9))
    obs = rng.normal(size=(20, 3))
    ll = float(gh.calc_prob(obs))
    assert np.isfinite(ll)
    path = np.asarray(gh.decode(obs))
    assert path.shape == (20,)
    assert path.min() >= 0 and path.max() < 2
    paths = np.asarray(gh.decode_batch(obs[None], np.ones((1, 20), bool)))
    np.testing.assert_array_equal(paths[0], path)


def test_variance_floor_resolves_per_dim():
    """Data-driven init resolves ``var_floor`` to a per-dimension tuple
    (``var_floor_scale`` x global variance) and EM respects it — the
    round-4 WER artifact's deletions traced to a word-entry state whose
    variance collapsed to ~1e-3 on near-duplicate (digital-silence
    prefix) training frames, pricing the whole word out of the search."""
    rng = np.random.default_rng(0)
    obs = rng.normal(scale=[1.0, 10.0, 100.0], size=(3, 60, 3)).astype(
        np.float32
    )
    obs[:, :15, :] = 0.123  # near-duplicate frames: would collapse a state
    cfg = GMMHMMConfig(n_states=3, n_mix=2, dim=3)
    m = GMMHMM(cfg, dtype=jnp.float32)
    m.init_left_to_right(obs.reshape(-1, 3))
    floor = m.config.var_floor
    assert isinstance(floor, tuple) and len(floor) == 3
    # per-dim: the scale-100 dimension's floor is ~1e4x the scale-1 dim's
    assert floor[2] > 100 * floor[0]
    m.train(obs, iters=5)
    cov = np.asarray(m.cov)
    assert np.all(cov >= np.asarray(floor) * (1 - 1e-5) - 1e-6)
    # idempotent: re-resolving (checkpoint-resume re-init) changes nothing
    before = m.config.var_floor
    m._resolve_var_floor(obs.reshape(-1, 3))
    assert m.config.var_floor == before


def test_variance_floor_scale_zero_keeps_scalar():
    """``var_floor_scale=0`` preserves the absolute-scalar flooring (and
    the full-covariance parity path never resolves a tuple)."""
    rng = np.random.default_rng(1)
    obs = rng.normal(size=(40, 3)).astype(np.float32)
    cfg = GMMHMMConfig(n_states=2, n_mix=1, dim=3, var_floor_scale=0.0)
    m = GMMHMM(cfg, dtype=jnp.float32).init_from_data(obs)
    assert np.isscalar(m.config.var_floor)
    cfgf = GMMHMMConfig(n_states=2, n_mix=1, dim=3, cov_type="full")
    mf = GMMHMM(cfgf, dtype=jnp.float64).init_from_data(obs)
    assert np.isscalar(mf.config.var_floor)
