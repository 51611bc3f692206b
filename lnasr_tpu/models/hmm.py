"""Discrete-emission hidden Markov model.

Re-designs ``lnasr/hmm.py`` for TPU: parameters are log-space device arrays
(same convention as the reference, ``hmm.py:28-34``), the trellis
recursions are the scans of :mod:`lnasr_tpu.ops.trellis`, the Baum-Welch
M-step is a vectorized segment-sum instead of a Python loop over the vocab
(``hmm.py:216-218``), and training supports *batches* of observation
sequences whose sufficient statistics are combined in one shot — the unit
of data parallelism for the mesh trainer in
:mod:`lnasr_tpu.parallel.training`.

The per-iteration convergence rule matches the reference
(|Δ log-likelihood| < eps, ``hmm.py:285-313``) but evaluates each
likelihood once instead of recomputing the forward pass after every update
(the reference's ``calc_prob`` re-run, ``hmm.py:303``, doubles the cost for
the same sequence of test values).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from lnasr_tpu.ops.numerics import logsumexp, safe_log
from lnasr_tpu.ops.trellis import (
    backward_scan,
    forward_scan,
    posteriors,
    viterbi_scan,
)


class HMMParams(NamedTuple):
    """Log-space parameters: transitions (N, N), emissions (N, M), initial (N,)."""

    log_a: jax.Array
    log_b: jax.Array
    log_pi: jax.Array

    @property
    def n_states(self) -> int:
        return self.log_a.shape[0]

    @property
    def n_symbols(self) -> int:
        return self.log_b.shape[1]


class EMStats(NamedTuple):
    """Log-space sufficient statistics of one EM sweep (batch-combined)."""

    log_xi_sum: jax.Array  # (N, N)   lse_t xi[t]
    log_gamma_sum: jax.Array  # (N,)  lse_t gamma[t]
    log_b_num: jax.Array  # (N, M)    lse_{t: o_t = k} gamma[t]
    log_pi_num: jax.Array  # (N,)     gamma[0] (lse over batch)
    loglik: jax.Array  # ()           sum of per-sequence log-likelihoods


def _emission_lookup(log_b_table: jax.Array, obs: jax.Array) -> jax.Array:
    """B (N, M) indexed by the observation sequence -> time-major (T, N)
    (the reference's ``_map_b``, ``hmm.py:47-61``, as one gather)."""
    return log_b_table.T[obs]


def _sequence_stats(
    params: HMMParams, obs: jax.Array, mask: jax.Array
) -> EMStats:
    """E-step statistics for a single (padded) sequence."""
    n, m = params.log_b.shape
    log_b = _emission_lookup(params.log_b, obs)
    alpha, loglik = forward_scan(params.log_pi, params.log_a, log_b, mask)
    beta = backward_scan(params.log_a, log_b, mask)
    xi, gamma = posteriors(alpha, beta, params.log_a, log_b, mask)
    gamma_masked = jnp.where(mask[:, None], gamma, -jnp.inf)
    # emission numerator via prob-space segment-sum over observed symbols:
    # exp(gamma) <= 1 so the exponentials are safe, and it avoids a
    # (T, N, M) one-hot blow-up for large vocabularies (e.g. the 65536-symbol
    # segmenter, scripts/seg/seg.py:115).
    occ = jnp.where(mask[:, None], jnp.exp(gamma_masked), 0.0)  # (T, N)
    b_num = jax.ops.segment_sum(occ, obs, num_segments=m)  # (M, N)
    # the last valid frame carries the loglik; masked forward keeps alpha
    # frozen past it, so alpha[-1] is correct.
    return EMStats(
        log_xi_sum=logsumexp(xi, axis=0),
        log_gamma_sum=logsumexp(gamma_masked, axis=0),
        log_b_num=safe_log(b_num.T),
        log_pi_num=gamma[0],
        loglik=loglik,
    )


def _combine_stats(stats: EMStats) -> EMStats:
    """Combine per-sequence stats (leading batch axis) by log-space sum."""
    return EMStats(
        log_xi_sum=logsumexp(stats.log_xi_sum, axis=0),
        log_gamma_sum=logsumexp(stats.log_gamma_sum, axis=0),
        log_b_num=logsumexp(stats.log_b_num, axis=0),
        log_pi_num=logsumexp(stats.log_pi_num, axis=0) - jnp.log(stats.log_pi_num.shape[0]),
        loglik=jnp.sum(stats.loglik),
    )


def _maximize(stats: EMStats) -> HMMParams:
    """M-step (``hmm.py:202-225``): row-normalized log-space re-estimates."""
    log_a = stats.log_xi_sum - stats.log_gamma_sum[:, None]
    log_b = stats.log_b_num - stats.log_gamma_sum[:, None]
    return HMMParams(log_a=log_a, log_b=log_b, log_pi=stats.log_pi_num)


@functools.partial(jax.jit, donate_argnums=())
def em_step(
    params: HMMParams, obs: jax.Array, mask: jax.Array
) -> Tuple[HMMParams, jax.Array]:
    """One Baum-Welch iteration over a batch ``obs (B, T)`` / ``mask (B, T)``.

    Returns updated parameters and the log-likelihood of the batch under the
    *pre-update* parameters.
    """
    stats = jax.vmap(_sequence_stats, in_axes=(None, 0, 0))(params, obs, mask)
    combined = _combine_stats(stats)
    return _maximize(combined), combined.loglik


class HMM:
    """Discrete HMM with the reference's API surface
    (``calc_prob`` / ``decode`` / ``train`` / ``reset`` / ``save`` / ``load``,
    ``hmm.py:268-313``) plus batched variants of each.
    """

    def __init__(
        self,
        n: int = 1,
        m: int = 1,
        log_a: Optional[jax.Array] = None,
        log_b: Optional[jax.Array] = None,
        log_pi: Optional[jax.Array] = None,
        dtype=jnp.float32,
    ):
        self.n = n
        self.m = m
        self.dtype = dtype
        self.log_a = None if log_a is None else jnp.asarray(log_a, dtype)
        self.log_b = None if log_b is None else jnp.asarray(log_b, dtype)
        self.log_pi = None if log_pi is None else jnp.asarray(log_pi, dtype)

    # -- parameters ---------------------------------------------------------

    @property
    def params(self) -> HMMParams:
        return HMMParams(self.log_a, self.log_b, self.log_pi)

    def _set_params(self, params: HMMParams) -> None:
        self.log_a, self.log_b, self.log_pi = params
        self.n, self.m = params.log_b.shape

    def reset(self, init_type: str = "uniform", key: Optional[jax.Array] = None):
        """Uniform or random (row-normalized) initialization
        (``hmm.py:233-250``); randomness is explicit via a JAX PRNG key."""
        n, m, dtype = self.n, self.m, self.dtype
        if init_type == "uniform":
            self.log_a = jnp.full((n, n), -np.log(n), dtype)
            self.log_b = jnp.full((n, m), -np.log(m), dtype)
            self.log_pi = jnp.full((n,), -np.log(n), dtype)
        elif init_type == "random":
            if key is None:
                key = jax.random.PRNGKey(0)
            ka, kb, kp = jax.random.split(key, 3)
            # uniform over (0, 1]: avoids log(0), as ``hmm.py:244-247``
            a = 1.0 - jax.random.uniform(ka, (n, n), dtype)
            b = 1.0 - jax.random.uniform(kb, (n, m), dtype)
            pi = 1.0 - jax.random.uniform(kp, (n,), dtype)
            self.log_a = jnp.log(a / a.sum(axis=1, keepdims=True))
            self.log_b = jnp.log(b / b.sum(axis=1, keepdims=True))
            self.log_pi = jnp.log(pi / pi.sum())
        else:
            raise ValueError(f"unknown init type: {init_type!r}")
        return self

    @classmethod
    def from_counts(
        cls,
        trans_counts: np.ndarray,
        emit_counts: np.ndarray,
        init_counts: np.ndarray,
        emit_add_one: bool = True,
        dtype=jnp.float64,
    ) -> "HMM":
        """Supervised estimation from raw counts (the properly-specified
        version of the segmenter's count trainer — ``scripts/seg/seg.py:
        132-149`` operates on linear counts against a log-space ``reset``,
        which only ever worked with an older zero-init; here counts are a
        first-class constructor)."""
        trans = np.asarray(trans_counts, np.float64)
        emit = np.asarray(emit_counts, np.float64)
        init = np.asarray(init_counts, np.float64)
        if emit_add_one:
            emit = emit + 1.0  # add-one smoothing as ``seg.py:147``
        with np.errstate(divide="ignore", invalid="ignore"):
            log_a = np.log(trans / trans.sum(axis=1, keepdims=True))
            log_b = np.log(emit / emit.sum(axis=1, keepdims=True))
            log_pi = np.log(init / init.sum())
        # states with zero outgoing counts are unreachable: 0/0 would give
        # NaN rows that poison the max/argmax trellis — log(0) is correct
        log_a[np.isnan(log_a)] = -np.inf
        log_b[np.isnan(log_b)] = -np.inf
        log_pi[np.isnan(log_pi)] = -np.inf
        model = cls(trans.shape[0], emit.shape[1], dtype=dtype)
        model.log_a = jnp.asarray(log_a, dtype)
        model.log_b = jnp.asarray(log_b, dtype)
        model.log_pi = jnp.asarray(log_pi, dtype)
        return model

    # -- inference ----------------------------------------------------------

    def emissions(self, obs) -> jax.Array:
        return _emission_lookup(self.log_b, jnp.asarray(obs))

    def forward(self, obs, mask=None):
        return forward_scan(self.log_pi, self.log_a, self.emissions(obs), mask)

    def backward(self, obs, mask=None):
        return backward_scan(self.log_a, self.emissions(obs), mask)

    def viterbi(self, obs, mask=None):
        return viterbi_scan(self.log_pi, self.log_a, self.emissions(obs), mask)

    def calc_prob(self, obs) -> jax.Array:
        """log P(O | model) (``hmm.py:268-274``)."""
        return self.forward(obs).loglik

    def decode(self, obs) -> jax.Array:
        """Most-likely state path (``hmm.py:276-283``)."""
        return self.viterbi(obs).path

    def decode_batch(self, obs, mask) -> jax.Array:
        """Batched Viterbi over padded ``(B, T)`` sequences."""
        fn = jax.vmap(
            lambda o, mk: viterbi_scan(
                self.log_pi, self.log_a, _emission_lookup(self.log_b, o), mk
            ).path
        )
        return fn(jnp.asarray(obs), jnp.asarray(mask))

    # -- training -----------------------------------------------------------

    def _ensure_batch(self, obs, mask):
        """Promote a single sequence to a batch of one; default masks."""
        obs = jnp.asarray(obs)
        if obs.ndim == 1:
            obs = obs[None]
        if mask is None:
            mask = jnp.ones(obs.shape[:2], dtype=bool)
        else:
            mask = jnp.asarray(mask)
            if mask.ndim == 1:
                mask = mask[None]
        return obs, mask

    def _em(self, params, obs, mask):
        """One EM sweep; subclasses plug in their own emission model."""
        return em_step(params, obs, mask)

    def train(
        self,
        obs,
        iters: int = 1,
        eps: float = 1e-4,
        verbose: bool = False,
        mask=None,
        config=None,
    ):
        """Baum-Welch EM until |Δ loglik| < eps or ``iters`` sweeps.

        ``obs`` may be a single sequence ``(T,)`` or a padded batch
        ``(B, T)`` with a matching boolean ``mask``. An optional
        :class:`~lnasr_tpu.config.TrainConfig` supplies the budget
        (``max_iters``/``eps``) and enables periodic checkpointing with
        deterministic resume (``checkpoint_every``/``checkpoint_dir``) —
        the training-state persistence the reference lacks (its HDF5
        save is parameters only, ``hmm.py:252-266``).
        """
        from lnasr_tpu.utils.checkpoints import checkpointer_from_config, em_loop

        if config is not None:
            iters, eps = config.max_iters, config.eps
        obs, mask = self._ensure_batch(obs, mask)
        params, history = em_loop(
            lambda p: self._em(p, obs, mask),
            self.params,
            iters,
            eps,
            verbose=verbose,
            checkpointer=checkpointer_from_config(config),
        )
        self._set_params(params)
        return history

    # -- persistence --------------------------------------------------------

    def save(self, filename: str) -> None:
        """HDF5 checkpoint, dataset names compatible with the reference
        (``hmm.py:252-258``: ``A``, ``B``, ``pi`` as log-probs)."""
        with h5py.File(filename, "w") as f:
            f.create_dataset("A", data=np.asarray(self.log_a, np.float64))
            f.create_dataset("B", data=np.asarray(self.log_b, np.float64))
            f.create_dataset("pi", data=np.asarray(self.log_pi, np.float64))

    def load(self, filename: str) -> "HMM":
        """Load a reference-format checkpoint; unlike ``hmm.py:260-266`` the
        file handle is closed and parameters are materialized as arrays."""
        with h5py.File(filename, "r") as f:
            self.log_a = jnp.asarray(f["A"][...], self.dtype)
            self.log_b = jnp.asarray(f["B"][...], self.dtype)
            self.log_pi = jnp.asarray(f["pi"][...], self.dtype)
        self.n, self.m = self.log_b.shape
        return self
