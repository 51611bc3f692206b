"""Trellis scan ops vs the NumPy oracle (ice-cream HMM from the reference's
hmm-test plus randomized models), including mask/padding invariance and the
associative-scan forward path."""

import numpy as np
import jax.numpy as jnp
import pytest

from lnasr_tpu.ops import trellis
from tests.reference_impl import hmm_ref

# the hand-traceable 2-state/3-symbol example (test/hmm-test.py:10-21)
A = np.log(np.array([[0.6, 0.4], [0.5, 0.5]]))
B = np.log(np.array([[0.2, 0.4, 0.4], [0.5, 0.4, 0.1]]))
PI = np.log(np.array([0.8, 0.2]))
OBS = np.array([2, 0, 2])


def _random_model(rng, n, m, t):
    a = rng.dirichlet(np.ones(n), size=n)
    b = rng.dirichlet(np.ones(m), size=n)
    pi = rng.dirichlet(np.ones(n))
    obs = rng.integers(0, m, size=t)
    return np.log(a), np.log(b), np.log(pi), obs


def test_forward_ice_cream():
    log_b = B[:, OBS].T
    res = trellis.forward_scan(jnp.asarray(PI), jnp.asarray(A), jnp.asarray(log_b))
    alpha_ref = hmm_ref.forward_ref(PI, A, log_b)
    np.testing.assert_allclose(np.asarray(res.alpha), alpha_ref, rtol=1e-12)
    # analytic check: P(O) sums the joint over all state paths
    total = 0.0
    for s0 in range(2):
        for s1 in range(2):
            for s2 in range(2):
                total += (
                    np.exp(PI[s0]) * np.exp(B[s0, 2])
                    * np.exp(A[s0, s1]) * np.exp(B[s1, 0])
                    * np.exp(A[s1, s2]) * np.exp(B[s2, 2])
                )
    np.testing.assert_allclose(np.exp(float(res.loglik)), total, rtol=1e-12)


@pytest.mark.parametrize("n,m,t", [(2, 3, 3), (5, 7, 50), (8, 4, 129)])
def test_forward_backward_viterbi_random(n, m, t):
    rng = np.random.default_rng(n * 100 + t)
    log_a, log_b_tab, log_pi, obs = _random_model(rng, n, m, t)
    log_b = log_b_tab[:, obs].T

    fwd = trellis.forward_scan(jnp.asarray(log_pi), jnp.asarray(log_a), jnp.asarray(log_b))
    np.testing.assert_allclose(
        np.asarray(fwd.alpha), hmm_ref.forward_ref(log_pi, log_a, log_b), rtol=1e-10
    )

    beta = trellis.backward_scan(jnp.asarray(log_a), jnp.asarray(log_b))
    np.testing.assert_allclose(
        np.asarray(beta), hmm_ref.backward_ref(log_a, log_b), rtol=1e-10, atol=1e-12
    )

    vit = trellis.viterbi_scan(jnp.asarray(log_pi), jnp.asarray(log_a), jnp.asarray(log_b))
    v_ref, bt_ref, path_ref = hmm_ref.viterbi_ref(log_pi, log_a, log_b)
    np.testing.assert_allclose(np.asarray(vit.scores), v_ref, rtol=1e-10)
    np.testing.assert_array_equal(np.asarray(vit.path), path_ref)

    xi, gamma = trellis.posteriors(fwd.alpha, beta, jnp.asarray(log_a), jnp.asarray(log_b))
    xi_ref, gamma_ref = hmm_ref.baumwelch_ref(
        log_a, log_b, np.asarray(fwd.alpha), np.asarray(beta)
    )
    np.testing.assert_allclose(np.asarray(xi), xi_ref, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(gamma), gamma_ref, rtol=1e-9, atol=1e-12)


def test_forward_assoc_matches_scan():
    rng = np.random.default_rng(7)
    log_a, log_b_tab, log_pi, obs = _random_model(rng, 6, 5, 200)
    log_b = log_b_tab[:, obs].T
    scan = trellis.forward_scan(jnp.asarray(log_pi), jnp.asarray(log_a), jnp.asarray(log_b))
    assoc = trellis.forward_assoc(jnp.asarray(log_pi), jnp.asarray(log_a), jnp.asarray(log_b))
    np.testing.assert_allclose(np.asarray(assoc.alpha), np.asarray(scan.alpha), rtol=1e-9)
    np.testing.assert_allclose(float(assoc.loglik), float(scan.loglik), rtol=1e-12)


def test_mask_padding_invariance():
    """Padded+masked sequences must reproduce the unpadded results."""
    rng = np.random.default_rng(11)
    log_a, log_b_tab, log_pi, obs = _random_model(rng, 4, 6, 30)
    log_b = log_b_tab[:, obs].T

    pad = 13
    log_b_padded = np.vstack([log_b, rng.normal(size=(pad, 4))])  # garbage tail
    mask = np.arange(30 + pad) < 30

    fwd = trellis.forward_scan(jnp.asarray(log_pi), jnp.asarray(log_a), jnp.asarray(log_b))
    fwd_p = trellis.forward_scan(
        jnp.asarray(log_pi), jnp.asarray(log_a), jnp.asarray(log_b_padded), jnp.asarray(mask)
    )
    np.testing.assert_allclose(np.asarray(fwd_p.alpha[:30]), np.asarray(fwd.alpha), rtol=1e-10)
    np.testing.assert_allclose(float(fwd_p.loglik), float(fwd.loglik), rtol=1e-12)

    beta = trellis.backward_scan(jnp.asarray(log_a), jnp.asarray(log_b))
    beta_p = trellis.backward_scan(
        jnp.asarray(log_a), jnp.asarray(log_b_padded), jnp.asarray(mask)
    )
    np.testing.assert_allclose(np.asarray(beta_p[:30]), np.asarray(beta), rtol=1e-10, atol=1e-12)

    vit = trellis.viterbi_scan(jnp.asarray(log_pi), jnp.asarray(log_a), jnp.asarray(log_b))
    vit_p = trellis.viterbi_scan(
        jnp.asarray(log_pi), jnp.asarray(log_a), jnp.asarray(log_b_padded), jnp.asarray(mask)
    )
    np.testing.assert_array_equal(np.asarray(vit_p.path[:30]), np.asarray(vit.path))
    np.testing.assert_allclose(float(vit_p.score), float(vit.score), rtol=1e-12)

    xi, gamma = trellis.posteriors(fwd.alpha, beta, jnp.asarray(log_a), jnp.asarray(log_b))
    xi_p, gamma_p = trellis.posteriors(
        fwd_p.alpha, beta_p, jnp.asarray(log_a), jnp.asarray(log_b_padded), jnp.asarray(mask)
    )
    np.testing.assert_allclose(np.asarray(xi_p[:29]), np.asarray(xi[:29]), rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(gamma_p[:29]), np.asarray(gamma[:29]), rtol=1e-9, atol=1e-12
    )
