"""Data-parallel batched decoding over a device mesh.

Serving scale-out for the composed word-graph search: a batch of
(bucket-padded) feature segments shards across the mesh's ``data`` axis,
each device decodes its shard with the factored trellis scan, and the
(path, score) results gather back — graph parameters stay replicated, so
the only communication is the output all-gather XLA inserts. This is the
multi-chip analogue of :meth:`FactoredDecodingGraph.decode_batch`
(identical results, parity-tested on the virtual mesh).

The per-shard body is the ``lax.scan`` realization: collectives compose
with it on every backend. (The Pallas kernels are per-device too and
could serve here on real TPU slices; batched-throughput serving is
scan-friendly since the batch axis already fills the VPU.)
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_dp_decode_step(mesh: Mesh, graph):
    """Build a jitted sharded decode: ``(obs (B, T, D), masks (B, T)) ->
    (paths (B, T) int32, scores (B,))`` with ``B`` sharded over ``data``
    and the graph replicated. ``graph`` is a
    :class:`~lnasr_tpu.models.decoder.FactoredDecodingGraph` (or the
    trigram subclass — same array surface)."""
    from lnasr_tpu.models.decoder import (
        _factored_grid_inputs,
        factored_trellis_scan,
    )

    cov_type = graph.cov_type
    hop = graph.hop if not hasattr(graph, "hop3") else graph.hop3
    final_w = (graph.log_final_w if not hasattr(graph, "final3")
               else graph.final3)

    def one(obs, mask, inner_a, hop_m, log_pi_w, log_final_w, exit_idx,
            state_map, pad_mask, log_w, mu, cov):
        log_b, pi_grid, final_grid = _factored_grid_inputs(
            obs, log_pi_w, log_final_w, exit_idx, state_map, pad_mask,
            log_w, mu, cov, cov_type,
        )
        return factored_trellis_scan(
            log_b, inner_a, hop_m, pi_grid, final_grid, exit_idx, mask
        )

    def shard_fn(obs, masks, *g):
        return jax.vmap(one, in_axes=(0, 0) + (None,) * 10)(obs, masks, *g)

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("data"), P("data")) + (P(),) * 10,
        out_specs=(P("data"), P("data")),
        check_vma=False,
    )
    jitted = jax.jit(fn)

    def step(obs, masks):
        return jitted(
            obs, masks, graph.inner_a, hop, graph.log_pi_w, final_w,
            graph.exit_idx, graph.state_map, graph.pad_mask,
            graph.log_w, graph.mu, graph.cov,
        )

    return step


def decode_batch_sharded(
    graph, features, masks, mesh: Mesh
) -> List[Tuple[List[str], np.ndarray, float]]:
    """Decode ``(B, T, D)`` padded feature segments across the mesh's
    ``data`` axis; ``B`` must divide the axis size. Returns per-utterance
    ``(words, path, score)`` identical to
    :meth:`FactoredDecodingGraph.decode_batch`."""
    obs = jnp.asarray(features, graph.dtype)
    masks = jnp.asarray(masks, bool)
    b = obs.shape[0]
    n_data = mesh.shape["data"]
    if b % n_data:
        raise ValueError(f"batch {b} must divide the data axis ({n_data})")
    obs = jax.device_put(obs, NamedSharding(mesh, P("data", None, None)))
    masks = jax.device_put(masks, NamedSharding(mesh, P("data", None)))
    paths, scores = make_dp_decode_step(mesh, graph)(obs, masks)
    paths = np.asarray(paths)
    return [
        (graph._path_to_words(paths[i]), paths[i], float(scores[i]))
        for i in range(b)
    ]
