"""HMM trellis recursions as TPU-friendly scans.

The reference executes forward/backward/Viterbi as nested Python loops with
a log-sum-exp per cell (``lnasr/hmm.py:97-99``, ``128-130``, ``162-166``).
Here each recursion is a single ``lax.scan`` whose step is one vectorized
(+, logsumexp) or (+, max) matrix-vector product — and the forward pass is
also offered as a ``lax.associative_scan`` over (N, N) log-matrix operators,
which is the sequence-parallel formulation used to split long utterances
across a mesh axis.

Conventions:
  - all inputs are natural-log probabilities;
  - emissions are time-major ``log_b[t, j]`` (the reference stores the
    transpose, ``hmm.py:47-61``);
  - an optional boolean ``mask[t]`` marks real frames in padded batches;
    masked steps apply the identity operator so results equal those of the
    unpadded sequence.

Batch by wrapping with ``jax.vmap`` (see :mod:`lnasr_tpu.models.hmm`).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from lnasr_tpu.ops.numerics import logsumexp, log_matmul


class ForwardResult(NamedTuple):
    alpha: jax.Array  # (T, N) forward log-probabilities
    loglik: jax.Array  # () log P(O | model), from the last *valid* frame


def forward_scan(
    log_pi: jax.Array,
    log_a: jax.Array,
    log_b: jax.Array,
    mask: Optional[jax.Array] = None,
) -> ForwardResult:
    """Forward algorithm: ``alpha[t, j] = lse_i(alpha[t-1, i] + A[i, j]) + b[t, j]``."""
    alpha0 = log_pi + log_b[0]

    def step(alpha, inputs):
        log_bt, valid = inputs
        new = logsumexp(alpha[:, None] + log_a, axis=0) + log_bt
        new = jnp.where(valid, new, alpha)
        return new, new

    t = log_b.shape[0]
    valid = jnp.ones((t,), dtype=bool) if mask is None else mask
    _, alphas = jax.lax.scan(step, alpha0, (log_b[1:], valid[1:]))
    alpha = jnp.concatenate([alpha0[None], alphas], axis=0)
    return ForwardResult(alpha=alpha, loglik=logsumexp(alpha[-1]))


def backward_scan(
    log_a: jax.Array,
    log_b: jax.Array,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Backward algorithm: ``beta[t, i] = lse_j(A[i, j] + b[t+1, j] + beta[t+1, j])``.

    Masked (padded) steps propagate ``beta`` unchanged, so for a sequence of
    true length L, ``beta[:L]`` equals the unpadded result and ``beta[L-1:]``
    is zero.
    """
    t, n = log_b.shape
    beta_last = jnp.zeros((n,), dtype=log_b.dtype)

    def step(beta, inputs):
        log_bt1, valid = inputs
        new = logsumexp(log_a + (log_bt1 + beta)[None, :], axis=1)
        new = jnp.where(valid, new, beta)
        return new, new

    valid = jnp.ones((t,), dtype=bool) if mask is None else mask
    # step t consumes emissions/validity of frame t+1, iterating T-2 .. 0.
    _, betas = jax.lax.scan(step, beta_last, (log_b[1:], valid[1:]), reverse=True)
    return jnp.concatenate([betas, beta_last[None]], axis=0)


class ViterbiResult(NamedTuple):
    scores: jax.Array  # (T, N) Viterbi trellis
    backptr: jax.Array  # (T, N) int32 argmax predecessors (row 0 is zeros)
    path: jax.Array  # (T,) int32 best state sequence
    score: jax.Array  # () best final log-score


def viterbi_scan(
    log_pi: jax.Array,
    log_a: jax.Array,
    log_b: jax.Array,
    mask: Optional[jax.Array] = None,
    log_final: Optional[jax.Array] = None,
) -> ViterbiResult:
    """Max-plus trellis with device-resident backpointers and an in-``jit``
    backtrace (replaces ``lnasr/hmm.py:133-172``; only the final path ever
    needs to leave the device).

    Masked steps use the identity operator (``v`` unchanged, backpointer
    ``j -> j``), so the decoded prefix matches the unpadded sequence and the
    padded tail repeats the last valid state.

    ``log_final`` (N,) adds per-state termination weights before the final
    argmax (used by the word-graph decoder for end-of-sentence LM scores
    and to restrict endings to word-final states); the reported ``score``
    includes it.
    """
    t, n = log_b.shape
    v0 = log_pi + log_b[0]
    states = jnp.arange(n, dtype=jnp.int32)

    def step(v, inputs):
        log_bt, valid = inputs
        cand = v[:, None] + log_a  # cand[i, j]
        new_v = jnp.max(cand, axis=0) + log_bt
        new_bt = jnp.argmax(cand, axis=0).astype(jnp.int32)
        new_v = jnp.where(valid, new_v, v)
        new_bt = jnp.where(valid, new_bt, states)
        return new_v, (new_v, new_bt)

    valid = jnp.ones((t,), dtype=bool) if mask is None else mask
    v_last, (vs, bts) = jax.lax.scan(step, v0, (log_b[1:], valid[1:]))
    scores = jnp.concatenate([v0[None], vs], axis=0)
    backptr = jnp.concatenate([jnp.zeros((1, n), jnp.int32), bts], axis=0)

    v_final = v_last if log_final is None else v_last + log_final
    last_state = jnp.argmax(v_final).astype(jnp.int32)

    def backstep(state_next, bt_row):
        # state_next = path[t+1]; bt_row = backptr[t+1]; emits path[t].
        state_t = bt_row[state_next]
        return state_t, state_t

    _, head = jax.lax.scan(backstep, last_state, backptr[1:], reverse=True)
    path = jnp.concatenate([head, last_state[None]], axis=0)
    return ViterbiResult(scores=scores, backptr=backptr, path=path, score=jnp.max(v_final))


def forward_assoc(
    log_pi: jax.Array,
    log_a: jax.Array,
    log_b: jax.Array,
) -> ForwardResult:
    """Forward algorithm via ``lax.associative_scan`` over (N, N) operators.

    The step operator ``M_t[i, j] = A[i, j] + b[t, j]`` composes under
    (+, logsumexp) matmul; prefix products give every ``alpha[t]`` in
    O(log T) depth. Costs O(T N^3) work instead of O(T N^2) — the trade is
    worth it for long sequences on parallel hardware, and it is the building
    block for cross-chip sequence parallelism (chunk boundaries exchange an
    (N, N) operator instead of replaying the chunk).
    """
    alpha0 = log_pi + log_b[0]
    mats = log_a[None, :, :] + log_b[1:, None, :]  # (T-1, N, N)
    prefix = jax.lax.associative_scan(log_matmul, mats, axis=0)
    alphas = logsumexp(alpha0[None, :, None] + prefix, axis=1)
    alpha = jnp.concatenate([alpha0[None], alphas], axis=0)
    return ForwardResult(alpha=alpha, loglik=logsumexp(alpha[-1]))


def posteriors(
    alpha: jax.Array,
    beta: jax.Array,
    log_a: jax.Array,
    log_b: jax.Array,
    mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Baum-Welch E-step quantities ``xi (T, N, N)`` and ``gamma (T, N)``.

    Matches the reference's conventions (``lnasr/hmm.py:174-200``): each
    ``xi[t]`` is normalized by its own log-sum over (i, j); ``xi[T-1]`` is
    all -inf; and ``gamma = lse_j(xi)`` — so ``gamma[T-1]`` is -inf and the
    final frame carries no occupancy mass (that is the reference's estimator,
    which we reproduce for parity).

    With a ``mask``, transitions out of padded frames (and the final valid
    frame) get -inf, mirroring the unpadded computation.
    """
    t, n = log_b.shape
    numer = (
        alpha[:-1, :, None]
        + log_a[None, :, :]
        + log_b[1:, None, :]
        + beta[1:, None, :]
    )
    denom = logsumexp(numer.reshape(t - 1, n * n), axis=1)
    xi_body = numer - denom[:, None, None]
    if mask is not None:
        # a transition t -> t+1 exists only when frame t+1 is valid
        xi_body = jnp.where(mask[1:, None, None], xi_body, -jnp.inf)
    xi = jnp.concatenate([xi_body, jnp.full((1, n, n), -jnp.inf, xi_body.dtype)], axis=0)
    gamma = logsumexp(xi, axis=2)
    return xi, gamma
