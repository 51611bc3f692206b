"""Float64 NumPy oracle of the reference's GMM-HMM math
(``/root/reference/lnasr/gmm.py``, ``gmmhmm.py``), vectorized."""

import numpy as np
from scipy.special import logsumexp

from tests.reference_impl.hmm_ref import backward_ref, baumwelch_ref, forward_ref


def mvn_logpdf_ref(x, mu, sigma):
    """(L, D) x against one full-covariance Gaussian (gmm.py:59-68)."""
    d = x.shape[1]
    det = np.linalg.det(sigma)
    inv = np.linalg.inv(sigma)
    xc = x - mu
    maha = np.einsum("ld,de,le->l", xc, inv, xc)
    return -0.5 * (d * np.log(2 * np.pi) + np.log(det) + maha)


def emissions_ref(obs, log_w, mu, sigma):
    """log_bm (N, M, T) and log_b (N, T) (gmmhmm.py:46-67 layout)."""
    n, m, _ = mu.shape
    t_len = obs.shape[0]
    log_bm = np.zeros((n, m, t_len))
    for j in range(n):
        for k in range(m):
            log_bm[j, k] = mvn_logpdf_ref(obs, mu[j, k], sigma[j, k])
    log_b = logsumexp(log_w[:, :, None] + log_bm, axis=1)
    return log_b, log_bm


def estimate_ref(obs, log_w, mu_old, log_bm, alpha, beta, xi, gamma, min_std=0.01):
    """M-step exactly as gmmhmm.py:69-156 — including the covariance update
    centered on the OLD means."""
    t_len, d = obs.shape
    n, m = log_w.shape
    new_a = logsumexp(xi, axis=0) - logsumexp(gamma, axis=0)[:, None]
    new_pi = gamma[0]

    ab = alpha + beta  # (T, N)
    xi_mix = (
        ab[:, :, None]
        + log_w[None]
        + np.transpose(log_bm, (2, 0, 1))
        - logsumexp(ab, axis=1)[:, None, None]
        - logsumexp(log_w[None] + np.transpose(log_bm, (2, 0, 1)), axis=2)[:, :, None]
    )
    new_w = logsumexp(xi_mix, axis=0) - logsumexp(xi_mix, axis=(0, 2))[:, None]

    p = np.exp(xi_mix)  # (T, N, M)
    occ = p.sum(axis=0)  # (N, M)
    new_mu = np.einsum("tnm,td->nmd", p, obs) / occ[:, :, None]

    xc = obs[:, None, None, :] - mu_old[None]  # (T, N, M, D)
    new_si = np.einsum("tnm,tnmd,tnme->nmde", p, xc, xc) / occ[:, :, None, None]
    new_si = new_si + min_std * np.eye(d)
    return new_a, new_pi, new_w, new_mu, new_si


def em_iteration_ref(log_pi, log_a, log_w, mu, sigma, obs, min_std=0.01):
    log_b, log_bm = emissions_ref(obs, log_w, mu, sigma)
    alpha = forward_ref(log_pi, log_a, log_b.T)
    beta = backward_ref(log_a, log_b.T)
    xi, gamma = baumwelch_ref(log_a, log_b.T, alpha, beta)
    new = estimate_ref(obs, log_w, mu, log_bm, alpha, beta, xi, gamma, min_std)
    return new, logsumexp(alpha[-1])
