"""Continuous GMM-HMM acoustic model.

Re-designs ``lnasr/gmmhmm.py`` for TPU. Emission scoring is the fused
batched scorer of :mod:`lnasr_tpu.ops.gaussian` (the reference loops over
states and components calling a full-covariance pdf per pair,
``gmmhmm.py:64-66``). The M-step accumulates *streamed* sufficient
statistics — occupancy, first and second moments — instead of
materializing the reference's ``(N, M, T, D, D)`` outer-product tensor
(``gmmhmm.py:137-146``), so memory is O(N·M·D^2) regardless of T and the
statistics are exactly the quantities a data-parallel mesh ``psum``s.

Two covariance regimes:
  - ``cov_type="diag"`` (default): the TPU production path. Variances are
    re-estimated about the *new* means with a variance floor.
  - ``cov_type="full"``: parity with the reference's estimator, including
    its quirk of centering the covariance update on the *old* means
    (``gmmhmm.py:138`` uses ``self.mu`` after computing new ``mu``) and the
    ``min_std * I`` ridge (``gmmhmm.py:147``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from lnasr_tpu.config import GMMHMMConfig
from lnasr_tpu.models.hmm import HMM
from lnasr_tpu.ops.gaussian import gmm_emissions_diag, gmm_emissions_full
from lnasr_tpu.ops.numerics import logsumexp
from lnasr_tpu.ops.trellis import backward_scan, forward_scan, posteriors, viterbi_scan


class GMMHMMParams(NamedTuple):
    """Log-space transitions/initial/weights; linear-space means/covariances.

    ``cov`` is ``(N, M, D)`` variances for diagonal models or
    ``(N, M, D, D)`` covariance matrices for full models.
    """

    log_a: jax.Array
    log_pi: jax.Array
    log_w: jax.Array
    mu: jax.Array
    cov: jax.Array


class GMMEMStats(NamedTuple):
    log_xi_sum: jax.Array  # (N, N)
    log_gamma_sum: jax.Array  # (N,)
    log_pi_num: jax.Array  # (N,)
    log_w_num: jax.Array  # (N, M)   lse_t xi_mix
    occ: jax.Array  # (N, M)         sum_t p[t]
    first: jax.Array  # (N, M, D)    sum_t p[t] * o_t
    second: jax.Array  # diag: (N, M, D) sum p o^2; full: (N, M, D, D) centered
    loglik: jax.Array  # ()


def _emissions(params: GMMHMMParams, obs: jax.Array, cov_type: str):
    if cov_type == "diag":
        return gmm_emissions_diag(obs, params.log_w, params.mu, params.cov)
    return gmm_emissions_full(obs, params.log_w, params.mu, params.cov)


def _sequence_stats(
    params: GMMHMMParams, obs: jax.Array, mask: jax.Array, cov_type: str,
    emissions_fn=None,
) -> GMMEMStats:
    """E-step statistics for one (padded) sequence.

    ``emissions_fn`` overrides the emission scorer — the model-parallel
    step (:mod:`lnasr_tpu.parallel.model_parallel`) injects one whose
    ``log_b`` is a distributed logsumexp over mixture shards while
    ``log_bm`` stays shard-local, so every mixture statistic below is
    computed only for the shard's own components."""
    log_b, log_bm = (emissions_fn or _emissions)(params, obs, cov_type)
    alpha, loglik = forward_scan(params.log_pi, params.log_a, log_b, mask)
    beta = backward_scan(params.log_a, log_b, mask)
    xi, gamma = posteriors(alpha, beta, params.log_a, log_b, mask)
    gamma_masked = jnp.where(mask[:, None], gamma, -jnp.inf)

    # component posteriors (gmmhmm.py:89-100): state occupancy from
    # alpha+beta (normalized per frame — note this includes the final frame,
    # unlike the transition gamma) plus the in-state component responsibility.
    ab = alpha + beta  # (T, N)
    log_state_post = ab - logsumexp(ab, axis=1, keepdims=True)
    log_resp = (params.log_w[None] + log_bm) - log_b[..., None]
    xi_mix = log_state_post[..., None] + log_resp  # (T, N, M)
    xi_mix = jnp.where(mask[:, None, None], xi_mix, -jnp.inf)

    p = jnp.exp(xi_mix)  # posteriors <= 1; safe in linear space
    occ = jnp.sum(p, axis=0)  # (N, M)
    first = jnp.einsum("tnm,td->nmd", p, obs)
    if cov_type == "diag":
        second = jnp.einsum("tnm,td->nmd", p, obs * obs)
    else:
        # centered on the *old* means for parity with gmmhmm.py:137-146
        xc = obs[:, None, None, :] - params.mu[None]  # (T, N, M, D)
        second = jnp.einsum("tnm,tnmd,tnme->nmde", p, xc, xc)

    return GMMEMStats(
        log_xi_sum=logsumexp(xi, axis=0),
        log_gamma_sum=logsumexp(gamma_masked, axis=0),
        log_pi_num=gamma[0],
        log_w_num=logsumexp(xi_mix, axis=0),
        occ=occ,
        first=first,
        second=second,
        loglik=loglik,
    )


def _combine_stats(stats: GMMEMStats) -> GMMEMStats:
    return GMMEMStats(
        log_xi_sum=logsumexp(stats.log_xi_sum, axis=0),
        log_gamma_sum=logsumexp(stats.log_gamma_sum, axis=0),
        log_pi_num=logsumexp(stats.log_pi_num, axis=0)
        - jnp.log(stats.log_pi_num.shape[0]),
        log_w_num=logsumexp(stats.log_w_num, axis=0),
        occ=jnp.sum(stats.occ, axis=0),
        first=jnp.sum(stats.first, axis=0),
        second=jnp.sum(stats.second, axis=0),
        loglik=jnp.sum(stats.loglik),
    )


def _maximize(
    stats: GMMEMStats,
    old: GMMHMMParams,
    cov_type: str,
    min_std: float,
    var_floor: float,
    occ_floor: float = 1e-3,
    lse_m=None,
) -> GMMHMMParams:
    """M-step. ``lse_m`` computes the per-state logsumexp over the FULL
    mixture axis of an ``(N, M)`` table (keepdims); the model-parallel
    step injects a distributed version since its M axis is sharded."""
    if lse_m is None:
        lse_m = lambda x: logsumexp(x, axis=1, keepdims=True)  # noqa: E731
    log_a = stats.log_xi_sum - stats.log_gamma_sum[:, None]
    log_w = stats.log_w_num - lse_m(stats.log_w_num)
    # Starvation guard: a component with (near) zero occupancy would produce
    # 0/0 means and -inf weights (and did, on real MFCC features in float32);
    # freeze such components at their previous parameters instead. The
    # reference has no such guard — its EM NaNs the same way.
    tiny = jnp.asarray(jnp.finfo(stats.occ.dtype).tiny, stats.occ.dtype)
    starved = stats.occ < occ_floor  # (N, M)
    denom = jnp.maximum(stats.occ, tiny)[..., None]
    mu = jnp.where(starved[..., None], old.mu, stats.first / denom)
    if cov_type == "diag":
        var = stats.second / denom - mu * mu
        floor = jnp.asarray(var_floor, dtype=mu.dtype)  # scalar or (D,)
        cov = jnp.where(starved[..., None], old.cov, jnp.maximum(var, floor))
    else:
        d = mu.shape[-1]
        cov = stats.second / denom[..., None] + min_std * jnp.eye(d, dtype=mu.dtype)
        cov = jnp.where(starved[..., None, None], old.cov, cov)
    log_w = jnp.where(starved, jnp.log(tiny), log_w)
    log_w = log_w - lse_m(log_w)
    return GMMHMMParams(
        log_a=log_a, log_pi=stats.log_pi_num, log_w=log_w, mu=mu, cov=cov
    )


@functools.partial(jax.jit, static_argnames=("cov_type", "min_std", "var_floor"))
def gmmhmm_em_step(
    params: GMMHMMParams,
    obs: jax.Array,
    mask: jax.Array,
    cov_type: str = "diag",
    min_std: float = 0.01,
    var_floor=1e-3,
) -> Tuple[GMMHMMParams, jax.Array]:
    """One Baum-Welch sweep over ``obs (B, T, D)`` / ``mask (B, T)``.
    ``var_floor`` is a float or a per-dimension tuple (see
    :class:`~lnasr_tpu.config.GMMHMMConfig.var_floor_scale`)."""
    stats = jax.vmap(lambda o, mk: _sequence_stats(params, o, mk, cov_type))(
        obs, mask
    )
    combined = _combine_stats(stats)
    return _maximize(combined, params, cov_type, min_std, var_floor), combined.loglik


class GMMHMM(HMM):
    """GMM-emission HMM with the reference's API plus batched training.

    ``cov`` is diagonal variances ``(N, M, D)`` or full covariances
    ``(N, M, D, D)`` depending on ``config.cov_type``.
    """

    def __init__(self, config: GMMHMMConfig = GMMHMMConfig(), dtype=jnp.float32):
        super().__init__(config.n_states, config.n_mix, dtype=dtype)
        self.config = config
        self.d = config.dim
        self.log_w: Optional[jax.Array] = None
        self.mu: Optional[jax.Array] = None
        self.cov: Optional[jax.Array] = None
        self.log_b = None  # discrete emission table is unused here

    # -- parameters ---------------------------------------------------------

    @property
    def params(self) -> GMMHMMParams:
        return GMMHMMParams(self.log_a, self.log_pi, self.log_w, self.mu, self.cov)

    def _set_params(self, params: GMMHMMParams) -> None:
        self.log_a, self.log_pi, self.log_w, self.mu, self.cov = params
        self.n, self.m = params.log_w.shape
        self.d = params.mu.shape[-1]

    def reset(self, init_type: str = "uniform", key: Optional[jax.Array] = None):
        """Mirror of ``gmmhmm.py:166-188``: uniform/random log-probs, random
        means in [-0.3, 0.3), identity covariance (ones for diagonal)."""
        n, m, d, dtype = self.n, self.m, self.d, self.dtype
        cfg = self.config
        if init_type == "uniform":
            self.log_a = jnp.full((n, n), -np.log(n), dtype)
            self.log_pi = jnp.full((n,), -np.log(n), dtype)
            self.log_w = jnp.full((n, m), -np.log(m), dtype)
            self.mu = jnp.zeros((n, m, d), dtype)
        elif init_type == "random":
            if key is None:
                key = jax.random.PRNGKey(0)
            ka, kp, kw, km = jax.random.split(key, 4)
            a = jax.random.uniform(ka, (n, n), dtype)
            pi = jax.random.uniform(kp, (n,), dtype)
            w = jax.random.uniform(kw, (n, m), dtype)
            self.log_a = jnp.log(a / a.sum(axis=1, keepdims=True))
            self.log_pi = jnp.log(pi / pi.sum())
            self.log_w = jnp.log(w / w.sum(axis=1, keepdims=True))
            self.mu = 0.6 * jax.random.uniform(km, (n, m, d), dtype) - 0.3
        else:
            raise ValueError(f"unknown init type: {init_type!r}")
        if cfg.cov_type == "diag":
            self.cov = jnp.ones((n, m, d), dtype)
        else:
            self.cov = jnp.broadcast_to(jnp.eye(d, dtype=dtype), (n, m, d, d))
        return self

    def _resolve_var_floor(self, obs) -> None:
        """Resolve the diag-covariance variance floor against the training
        data (``var_floor_scale`` x per-dimension global variance, never
        below the absolute ``var_floor``) — the HTK/Kaldi-style relative
        floor. Idempotent: a tuple floor (already resolved, e.g. on
        checkpoint resume re-init from the same data) is left alone, so
        kill-and-resume runs floor identically."""
        cfg = self.config
        if (cfg.cov_type != "diag" or cfg.var_floor_scale <= 0
                or not np.isscalar(cfg.var_floor)):
            return
        gvar = np.var(np.asarray(obs, np.float64), axis=0)
        floor = tuple(
            float(v) for v in np.maximum(cfg.var_floor_scale * gvar,
                                         cfg.var_floor)
        )
        import dataclasses as _dc

        self.config = _dc.replace(cfg, var_floor=floor)

    def init_left_to_right(self, obs, key: Optional[jax.Array] = None,
                           self_loop: float = 0.5):
        """Left-to-right (Bakis) initialization for word/phone unit models:
        upper-bidiagonal transitions (stay/advance), entry pinned to state
        0, and means seeded by uniform time-segmentation of the training
        frames — the standard isolated-unit bootstrap that the reference
        lacks entirely."""
        if key is None:
            key = jax.random.PRNGKey(0)
        obs = jnp.asarray(obs, self.dtype)
        if obs.ndim == 3:
            obs = obs.reshape(-1, obs.shape[-1])
        n, m, d, dtype = self.n, self.m, self.d, self.dtype
        a = np.full((n, n), -np.inf)
        for i in range(n - 1):
            a[i, i] = np.log(self_loop)
            a[i, i + 1] = np.log(1.0 - self_loop)
        a[n - 1, n - 1] = 0.0  # exit handled by the decoding graph
        self.log_a = jnp.asarray(a, dtype)
        pi = np.full(n, -np.inf)
        pi[0] = 0.0
        self.log_pi = jnp.asarray(pi, dtype)
        self.log_w = jnp.full((n, m), -np.log(m), dtype)
        # uniform segmentation: state i owns the i-th time slice
        t_total = obs.shape[0]
        seg = np.array_split(np.arange(t_total), n)
        keys = jax.random.split(key, n)
        mus = []
        for i, idx in enumerate(seg):
            if len(idx) == 0:
                idx = np.arange(t_total)
            pick = jax.random.choice(keys[i], jnp.asarray(idx), (m,),
                                     replace=len(idx) < m)
            mus.append(obs[pick])
        self.mu = jnp.stack(mus)
        self._resolve_var_floor(obs)
        var = jnp.maximum(jnp.var(obs, axis=0),
                          jnp.asarray(self.config.var_floor, self.dtype))
        if self.config.cov_type == "diag":
            self.cov = jnp.broadcast_to(var, (n, m, d)).astype(dtype)
        else:
            self.cov = jnp.broadcast_to(jnp.diag(var), (n, m, d, d)).astype(dtype)
        return self

    def init_from_data(self, obs, key: Optional[jax.Array] = None):
        """Data-driven initialization: means sampled from real frames,
        covariance from the global feature variance, uniform A/pi/w.

        The reference only offers scale-blind random init (means in
        [-0.3, 0.3), unit covariance — ``gmmhmm.py:186-188``), which places
        every component hundreds of sigmas away from real MFCC features and
        makes the first E-step degenerate; initializing from the data is the
        standard fix."""
        if key is None:
            key = jax.random.PRNGKey(0)
        obs = jnp.asarray(obs, self.dtype)
        if obs.ndim == 3:
            obs = obs.reshape(-1, obs.shape[-1])
        n, m, d, dtype = self.n, self.m, self.d, self.dtype
        self.log_a = jnp.full((n, n), -np.log(n), dtype)
        self.log_pi = jnp.full((n,), -np.log(n), dtype)
        self.log_w = jnp.full((n, m), -np.log(m), dtype)
        idx = jax.random.choice(key, obs.shape[0], (n * m,), replace=obs.shape[0] < n * m)
        self.mu = obs[idx].reshape(n, m, d)
        self._resolve_var_floor(obs)
        var = jnp.maximum(jnp.var(obs, axis=0),
                          jnp.asarray(self.config.var_floor, self.dtype))
        if self.config.cov_type == "diag":
            self.cov = jnp.broadcast_to(var, (n, m, d)).astype(dtype)
        else:
            self.cov = jnp.broadcast_to(jnp.diag(var), (n, m, d, d)).astype(dtype)
        return self

    # -- inference ----------------------------------------------------------

    def emissions(self, obs) -> jax.Array:
        log_b, _ = _emissions(self.params, jnp.asarray(obs, self.dtype),
                              self.config.cov_type)
        return log_b

    def decode_batch(self, obs, mask) -> jax.Array:
        cov_type = self.config.cov_type
        params = self.params

        def one(o, mk):
            log_b, _ = _emissions(params, o, cov_type)
            return viterbi_scan(params.log_pi, params.log_a, log_b, mk).path

        return jax.vmap(one)(jnp.asarray(obs, self.dtype), jnp.asarray(mask))

    # -- training -----------------------------------------------------------

    def _ensure_batch(self, obs, mask):
        obs = jnp.asarray(obs, self.dtype)
        if obs.ndim == 2:
            obs = obs[None]
        if mask is None:
            mask = jnp.ones(obs.shape[:2], dtype=bool)
        else:
            mask = jnp.asarray(mask)
            if mask.ndim == 1:
                mask = mask[None]
        return obs, mask

    def _em(self, params, obs, mask):
        cfg = self.config
        return gmmhmm_em_step(
            params, obs, mask,
            cov_type=cfg.cov_type, min_std=cfg.min_std, var_floor=cfg.var_floor,
        )

    # -- persistence --------------------------------------------------------

    def save(self, filename: str) -> None:
        """Reference-compatible HDF5 (``gmmhmm.py:190-198``: ``A``, ``pi``,
        ``w``, ``mu``, ``si``). Diagonal models store ``si`` expanded to
        full matrices so reference tooling can read them, plus a ``var``
        dataset with the compact diagonal."""
        with h5py.File(filename, "w") as f:
            f.create_dataset("A", data=np.asarray(self.log_a, np.float64))
            f.create_dataset("pi", data=np.asarray(self.log_pi, np.float64))
            f.create_dataset("w", data=np.asarray(self.log_w, np.float64))
            f.create_dataset("mu", data=np.asarray(self.mu, np.float64))
            if self.config.cov_type == "diag":
                var = np.asarray(self.cov, np.float64)
                f.create_dataset("var", data=var)
                si = np.zeros((self.n, self.m, self.d, self.d))
                idx = np.arange(self.d)
                si[:, :, idx, idx] = var
                f.create_dataset("si", data=si)
            else:
                f.create_dataset("si", data=np.asarray(self.cov, np.float64))

    def load(self, filename: str) -> "GMMHMM":
        """Load our or the reference's checkpoints (``gmmhmm.py:200-208``).
        Diagonal models read ``var`` if present, else take the diagonal of
        ``si``."""
        with h5py.File(filename, "r") as f:
            self.log_a = jnp.asarray(f["A"][...], self.dtype)
            self.log_pi = jnp.asarray(f["pi"][...], self.dtype)
            self.log_w = jnp.asarray(f["w"][...], self.dtype)
            self.mu = jnp.asarray(f["mu"][...], self.dtype)
            if self.config.cov_type == "diag":
                if "var" in f:
                    self.cov = jnp.asarray(f["var"][...], self.dtype)
                else:
                    si = f["si"][...]
                    idx = np.arange(si.shape[-1])
                    self.cov = jnp.asarray(si[:, :, idx, idx], self.dtype)
            else:
                self.cov = jnp.asarray(f["si"][...], self.dtype)
        self.n, self.m, self.d = self.mu.shape
        return self
