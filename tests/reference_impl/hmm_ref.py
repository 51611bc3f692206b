"""Float64 NumPy oracle of the reference's HMM math
(``/root/reference/lnasr/hmm.py``), vectorized over states."""

import numpy as np
from scipy.special import logsumexp


def forward_ref(log_pi, log_a, log_b):
    """log_b is time-major (T, N). Returns alpha (T, N)."""
    t_len, n = log_b.shape
    alpha = np.zeros((t_len, n))
    alpha[0] = log_pi + log_b[0]
    for t in range(1, t_len):
        alpha[t] = logsumexp(alpha[t - 1][:, None] + log_a, axis=0) + log_b[t]
    return alpha


def backward_ref(log_a, log_b):
    t_len, n = log_b.shape
    beta = np.zeros((t_len, n))
    for t in range(t_len - 2, -1, -1):
        beta[t] = logsumexp(log_a + (log_b[t + 1] + beta[t + 1])[None, :], axis=1)
    return beta


def viterbi_ref(log_pi, log_a, log_b):
    t_len, n = log_b.shape
    v = np.zeros((t_len, n))
    bt = np.zeros((t_len, n), dtype=np.int64)
    v[0] = log_pi + log_b[0]
    for t in range(1, t_len):
        cand = v[t - 1][:, None] + log_a
        v[t] = cand.max(axis=0) + log_b[t]
        bt[t] = cand.argmax(axis=0)
    path = np.zeros(t_len, dtype=np.int64)
    path[-1] = v[-1].argmax()
    for t in range(t_len - 2, -1, -1):
        path[t] = bt[t + 1, path[t + 1]]
    return v, bt, path


def baumwelch_ref(log_a, log_b, alpha, beta):
    """xi (T, N, N) with xi[T-1] = -inf, gamma = lse_j(xi) — the reference's
    convention (hmm.py:174-200)."""
    t_len, n = log_b.shape
    xi = np.full((t_len, n, n), -np.inf)
    for t in range(t_len - 1):
        numer = alpha[t][:, None] + log_a + (log_b[t + 1] + beta[t + 1])[None, :]
        xi[t] = numer - logsumexp(numer)
    gamma = logsumexp(xi, axis=2)
    return xi, gamma


def estimate_ref(obs, n_symbols, xi, gamma):
    """M-step (hmm.py:202-225)."""
    n = gamma.shape[1]
    denom = logsumexp(gamma, axis=0)
    new_a = logsumexp(xi, axis=0) - denom[:, None]
    new_b = np.zeros((n, n_symbols))
    for k in range(n_symbols):
        rows = gamma[obs == k]
        if rows.size:
            new_b[:, k] = logsumexp(rows, axis=0) - denom
        else:
            new_b[:, k] = -np.inf
    return new_a, new_b, gamma[0]


def em_iteration_ref(log_pi, log_a, log_b_table, obs):
    """One full Baum-Welch iteration on a single sequence; returns the new
    parameters and the data log-likelihood under the old ones."""
    log_b = log_b_table[:, obs].T
    alpha = forward_ref(log_pi, log_a, log_b)
    beta = backward_ref(log_a, log_b)
    xi, gamma = baumwelch_ref(log_a, log_b, alpha, beta)
    new_a, new_b, new_pi = estimate_ref(obs, log_b_table.shape[1], xi, gamma)
    return (new_pi, new_a, new_b), logsumexp(alpha[-1])
