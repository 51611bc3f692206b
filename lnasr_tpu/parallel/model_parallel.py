"""Model parallelism: GMM mixture components sharded over the ``model``
mesh axis.

When N·M·D outgrows one chip (large codebooks, many states), the mixture
axis shards: every device scores its own component slice — the two GEMMs
of :func:`lnasr_tpu.ops.gaussian.diag_components_logpdf` on an M/S-wide
slab — and the per-state logsumexp over components completes with one
``pmax`` + ``psum`` pair (a numerically-stable distributed logsumexp).
This is the expert-parallel analogue for classical models (SURVEY.md
§2.4): components never materialize on one chip, and the collective
payload is O(T·N), independent of M.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lnasr_tpu.ops.gaussian import diag_components_logpdf
from lnasr_tpu.ops.numerics import logsumexp


def distributed_logsumexp(local: jax.Array, axis_name: str) -> jax.Array:
    """logsumexp across an axis of the mesh: elements of ``local`` hold each
    shard's partial logsumexp; result is replicated."""
    m = jax.lax.pmax(local, axis_name)
    safe = jnp.where(jnp.isfinite(m), m, 0.0)
    total = jax.lax.psum(jnp.exp(local - safe), axis_name)
    out = safe + jnp.log(total)
    return jnp.where(jnp.isfinite(m), out, m)


def make_mp_emission_fn(mesh: Mesh) -> Callable:
    """Build ``fn(obs (T, D), log_w (N, M), mu (N, M, D), var (N, M, D)) ->
    log_b (T, N)`` with the mixture axis M sharded over ``model``.

    Parameters may be passed unsharded; they are placed with a
    ``P(None, 'model', ...)`` sharding (a no-op resharding when the caller
    already laid them out that way).
    """

    def shard_fn(obs, log_w, mu, var):
        log_bm = diag_components_logpdf(obs, mu, var)  # (T, N, M_local)
        local = logsumexp(log_w[None] + log_bm, axis=-1)  # (T, N)
        return distributed_logsumexp(local, "model")

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(None, "model"), P(None, "model", None),
                  P(None, "model", None)),
        out_specs=P(),
        check_vma=False,
    )

    def wrapped(obs, log_w, mu, var):
        log_w = jax.device_put(log_w, NamedSharding(mesh, P(None, "model")))
        mu = jax.device_put(mu, NamedSharding(mesh, P(None, "model", None)))
        var = jax.device_put(var, NamedSharding(mesh, P(None, "model", None)))
        return fn(obs, log_w, mu, var)

    return wrapped
