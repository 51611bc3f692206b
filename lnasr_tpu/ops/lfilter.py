"""Linear recurrences (IIR filters) as associative scans.

Sequential filters are the classic TPU anti-pattern: a per-sample Python or
scan loop serializes the whole signal. But a linear time-invariant
recurrence is an *affine* map on its state, and affine maps compose
associatively — so any IIR filter runs in O(log T) depth via
``jax.lax.associative_scan``. This module provides:

- :func:`first_order_recurrence` — h[t] = a[t] * h[t-1] + b[t]
- :func:`affine_recurrence` — h[t] = A[t] @ h[t-1] + u[t] for small state
- :func:`allpass2` — the second-order allpass sections (state stride 2)
  used by the QMF/halfband split filters of the WebRTC-style VAD frontend.

These power the fully-parallel VAD filterbank in
:mod:`lnasr_tpu.vad.webrtc`; the reference runs the same filters as
per-sample Python/C loops (``third/pywvad/wvad.py:104-259``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def first_order_recurrence(a: jax.Array, b: jax.Array, h0) -> jax.Array:
    """Solve h[t] = a[t] * h[t-1] + b[t] (h[-1] = h0) for all t in parallel.

    ``a`` may be a scalar (broadcast) or a (T,) array; returns (T,)."""
    b = jnp.asarray(b)
    t = b.shape[0]
    a = jnp.broadcast_to(jnp.asarray(a, b.dtype), (t,))
    # fold the initial state into the first step
    b = b.at[0].add(a[0] * h0)

    def combine(x, y):
        a1, b1 = x
        a2, b2 = y
        return a1 * a2, a2 * b1 + b2

    _, h = jax.lax.associative_scan(combine, (a, b))
    return h


def affine_recurrence(mats: jax.Array, vecs: jax.Array, h0: jax.Array) -> jax.Array:
    """Solve h[t] = M[t] @ h[t-1] + u[t] in parallel.

    ``mats (T, D, D)``, ``vecs (T, D)``, ``h0 (D,)`` -> ``(T, D)``. D should
    be small (filter order); cost is O(T D^3 log T) work but O(log T) depth.
    """
    prec = jax.lax.Precision.HIGHEST  # filter states: bf16 passes drift
    vecs = vecs.at[0].add(jnp.dot(mats[0], h0, precision=prec))

    def combine(x, y):
        m1, v1 = x
        m2, v2 = y
        return (
            jnp.einsum("...ij,...jk->...ik", m2, m1, precision=prec),
            jnp.einsum("...ij,...j->...i", m2, v1, precision=prec) + v2,
        )

    _, h = jax.lax.associative_scan(combine, (mats, vecs))
    return h


def allpass2(
    x: jax.Array, c: float, state: Tuple[jax.Array, jax.Array]
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Second-order allpass y(n) = x(n-2) - c*y(n-2) + c*x(n), vectorized.

    The two sample phases are independent first-order recurrences in the
    internal state s(n) = x(n) - c*y(n):  s(n) = -c*s(n-2) + (1-c^2)*x(n),
    y(n) = s(n-2) + c*x(n) — each solved with an associative scan.

    ``state`` is (s[-2], s[-1]) (the reference's two-deep filter memory,
    ``wvad.py:137-157``); returns (y, new_state). ``x`` must have even
    length so phase alignment is stable across streamed chunks.
    """
    t = x.shape[0]
    assert t % 2 == 0, "allpass2 needs an even-length chunk"
    xp = x.reshape(t // 2, 2)  # columns: even phase, odd phase
    s_prev = jnp.stack(state)  # (2,)

    drive = (1.0 - c * c) * xp  # (T/2, 2)
    s = jax.vmap(
        lambda b, h0: first_order_recurrence(-c, b, h0), in_axes=(1, 0), out_axes=1
    )(drive, s_prev)
    # y(n) = s(n-2) + c*x(n): shift each phase's s by one chunk-step
    s_shifted = jnp.concatenate([s_prev[None, :], s[:-1]], axis=0)
    y = (s_shifted + c * xp).reshape(t)
    return y, (s[-1, 0], s[-1, 1])


def biquad(
    x: jax.Array, b_coefs, a_coefs, state: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Direct-form-I biquad with the reference's 4-element state layout
    (s = [x(n-1), x(n-2), y(n-1), y(n-2)], ``wvad.py:104-134``), solved in
    parallel via a 2x2 affine recurrence over [y(n), y(n-1)].
    """
    b0, b1, b2 = (jnp.asarray(v, x.dtype) for v in b_coefs)
    _, a1, a2 = (jnp.asarray(v, x.dtype) for v in a_coefs)
    t = x.shape[0]
    xm1 = jnp.concatenate([state[0][None], x[:-1]])
    xm2 = jnp.concatenate([state[1][None], state[0][None], x[:-2]]) if t >= 2 else (
        jnp.asarray([state[1]], x.dtype)
    )
    drive = b0 * x + b1 * xm1 + b2 * xm2  # feed-forward part, all-parallel
    mat = jnp.array([[-a1, -a2], [1.0, 0.0]], x.dtype)
    mats = jnp.broadcast_to(mat, (t, 2, 2))
    vecs = jnp.stack([drive, jnp.zeros_like(drive)], axis=1)
    h0 = jnp.stack([state[2], state[3]])
    h = affine_recurrence(mats, vecs, h0)
    y = h[:, 0]
    new_state = jnp.stack([x[-1], xm1[-1], y[-1], h[-1, 1]])
    return y, new_state
