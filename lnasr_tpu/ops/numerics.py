"""Log-space numerics.

All probabilistic state in the framework lives in natural-log space, as in
the reference (``lnasr/hmm.py:28-34``). The reference computes log-sum-exp
with a recursive/iterative pairwise ``logaddexp`` chain (``lnasr/utils.py:
140-204``); here we use the max-shifted closed form, which is vectorized,
XLA-fusable, and at least as accurate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -jnp.inf


def logsumexp(x: jax.Array, axis=None, keepdims: bool = False) -> jax.Array:
    """Max-shifted log-sum-exp that tolerates all--inf slices.

    ``jax.nn.logsumexp`` already handles the -inf edge cases; this wrapper
    pins the convention (natural log, -inf for empty mass) in one place.
    """
    return jax.nn.logsumexp(x, axis=axis, keepdims=keepdims)


def logsumexp2(x: jax.Array, axis=None, keepdims: bool = False) -> jax.Array:
    """Base-2 log-sum-exp (the reference's ``lse2``, ``utils.py:181-204``):
    log2(sum(2**x))."""
    ln2 = jnp.log(jnp.asarray(2.0, jnp.result_type(x)))
    return jax.nn.logsumexp(x * ln2, axis=axis, keepdims=keepdims) / ln2


def log_matvec(log_m: jax.Array, log_v: jax.Array) -> jax.Array:
    """(log M) @ (log v) in the (+, logsumexp) semiring.

    out[i] = logsumexp_j(log_m[i, j] + log_v[j]).
    """
    return logsumexp(log_m + log_v[None, :], axis=-1)


def log_matmul(log_a: jax.Array, log_b: jax.Array) -> jax.Array:
    """Matrix product in the (+, logsumexp) semiring, batched over leading dims.

    out[..., i, j] = logsumexp_k(log_a[..., i, k] + log_b[..., k, j]).

    This is the associative combine operator that turns the HMM forward
    recursion into an associative scan over time (the classical-ASR analogue
    of sequence parallelism; replaces the per-cell loops of
    ``lnasr/hmm.py:97-99``).
    """
    return logsumexp(log_a[..., :, :, None] + log_b[..., None, :, :], axis=-2)


def maxplus_matmul(log_a: jax.Array, log_b: jax.Array) -> jax.Array:
    """Matrix product in the (+, max) (tropical) semiring.

    The associative operator of the Viterbi recursion
    (``lnasr/hmm.py:162-166``).
    """
    return jnp.max(log_a[..., :, :, None] + log_b[..., None, :, :], axis=-2)


def normalize_log(x: jax.Array, axis=-1) -> jax.Array:
    """Normalize log-probabilities so logsumexp over ``axis`` is 0."""
    return x - logsumexp(x, axis=axis, keepdims=True)


def safe_log(x: jax.Array) -> jax.Array:
    """log with log(0) -> -inf and no NaN gradients for x == 0."""
    return jnp.where(x > 0, jnp.log(jnp.where(x > 0, x, 1.0)), NEG_INF)
