"""Factored word-graph Pallas kernel vs the lax.scan decoder: identical
paths and scores (max-plus is exactly associative, so the streamed trellis
grids match the scan carry bitwise at every feasible state)."""

import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lnasr_tpu.config import GMMHMMConfig
from lnasr_tpu.models.decoder import (
    DecoderConfig,
    FactoredDecodingGraph,
    _factored_grid_inputs,
    factored_trellis_scan,
)
from lnasr_tpu.models.lexicon import Lexicon
from lnasr_tpu.ops.factored_pallas import (
    factored_backtrace,
    factored_forward_pallas,
    factored_pallas_ok,
)
from lnasr_tpu.ops.gaussian import gmm_emissions_diag


def _unit(mean, n_states, dim, rng):
    """Numpy stand-in unit (duck-typed for graph composition)."""
    with np.errstate(divide="ignore"):
        log_a = np.log(np.where(np.eye(n_states) + np.eye(n_states, k=1) > 0,
                                0.5, 0.0)).astype(np.float32)
    return types.SimpleNamespace(
        n=n_states,
        config=GMMHMMConfig(n_states=n_states, n_mix=1, dim=dim),
        log_a=log_a,
        log_w=np.zeros((n_states, 1), np.float32),
        mu=(mean[None, None, :]
            + rng.normal(scale=0.3, size=(n_states, 1, dim))).astype(np.float32),
        cov=np.full((n_states, 1, dim), 0.1, np.float32),
    )


def _graph(v, dim=5, loop=True, mixed_lengths=False, seed=0):
    rng = np.random.default_rng(seed)
    means = rng.normal(scale=8.0, size=(v, dim))
    units = {
        f"w{i:03d}": _unit(means[i], 2 + (i % 3 if mixed_lengths else 1),
                           dim, rng)
        for i in range(v)
    }
    lex = Lexicon.whole_word(sorted(units))
    graph = FactoredDecodingGraph.build(
        lex, units, None, DecoderConfig(loop=loop), dtype=jnp.float32
    )
    return graph, rng


def _grid_inputs(graph, obs):
    """ONE emission computation feeding both trellises — the bitwise
    kernel-vs-scan claim is about the trellis, not about XLA fusing the
    emission GEMM differently across separately-jitted programs."""
    return _factored_grid_inputs(
        jnp.asarray(obs, jnp.float32), graph.log_pi_w, graph.log_final_w,
        graph.exit_idx, graph.state_map, graph.pad_mask,
        graph.log_w, graph.mu, graph.cov, graph.cov_type,
    )


def _kernel_decode(graph, obs):
    log_b, pi_grid, final_grid = _grid_inputs(graph, obs)
    vgrids = factored_forward_pallas(
        pi_grid, graph.inner_a, graph.exit_idx, graph.hop, log_b,
        interpret=True,
    )
    return factored_backtrace(
        vgrids, graph.inner_a, graph.exit_idx, graph.hop, final_grid
    )


def _scan_decode(graph, obs):
    log_b, pi_grid, final_grid = _grid_inputs(graph, obs)
    return factored_trellis_scan(
        log_b, graph.inner_a, graph.hop, pi_grid, final_grid, graph.exit_idx
    )


@pytest.mark.parametrize(
    "v,t,mixed", [(5, 19, True), (12, 40, False), (130, 17, True)]
)
def test_kernel_matches_scan(v, t, mixed):
    graph, rng = _graph(v, mixed_lengths=mixed, seed=v)
    obs = rng.normal(scale=8.0, size=(t, 5)).astype(np.float32)
    path_k, score_k = _kernel_decode(graph, obs)
    path_s, score_s = _scan_decode(graph, obs)
    np.testing.assert_array_equal(np.asarray(path_k), np.asarray(path_s))
    assert float(score_k) == float(score_s)


def test_kernel_matches_scan_no_loop():
    graph, rng = _graph(6, loop=False, seed=3)
    assert graph.hop is None
    obs = rng.normal(scale=8.0, size=(9, 5)).astype(np.float32)
    path_k, score_k = _kernel_decode(graph, obs)
    path_s, score_s = _scan_decode(graph, obs)
    np.testing.assert_array_equal(np.asarray(path_k), np.asarray(path_s))
    assert float(score_k) == float(score_s)


def test_kernel_decodes_planted_sequence():
    """End to end through the graph: planted word sequence recovered."""
    graph, rng = _graph(8, seed=11)
    mu = np.asarray(graph.mu)
    seq_words = ["w002", "w005", "w000"]
    frames = []
    for w in seq_words:
        wi = graph.words.index(w)
        for s in range(int(np.asarray(graph.exit_idx)[wi]) + 1):
            row = int(np.asarray(graph.state_map)[wi, s])
            frames += [mu[row, 0] + rng.normal(scale=0.05, size=5)] * 3
    path, score = _kernel_decode(graph, np.asarray(frames, np.float32))
    assert graph._path_to_words(np.asarray(path)) == seq_words
    assert np.isfinite(float(score))


def test_kernel_masked_equals_unpadded():
    """Bucket-padded decode (mask) == exact-shape decode, kernel and scan."""
    graph, rng = _graph(9, mixed_lengths=True, seed=21)
    obs = rng.normal(scale=8.0, size=(23, 5)).astype(np.float32)
    obs_pad = np.concatenate(
        [obs, rng.normal(size=(9, 5)).astype(np.float32)]
    )
    mask = np.arange(32) < 23

    ref_path, ref_score = _scan_decode(graph, obs)

    log_b, pi_grid, final_grid = _grid_inputs(graph, obs_pad)
    for fwd in ("kernel", "scan"):
        if fwd == "kernel":
            vgrids = factored_forward_pallas(
                pi_grid, graph.inner_a, graph.exit_idx, graph.hop, log_b,
                jnp.asarray(mask), interpret=True,
            )
            path, score = factored_backtrace(
                vgrids, graph.inner_a, graph.exit_idx, graph.hop,
                final_grid, jnp.asarray(mask),
            )
        else:
            path, score = factored_trellis_scan(
                log_b, graph.inner_a, graph.hop, pi_grid, final_grid,
                graph.exit_idx, jnp.asarray(mask),
            )
        np.testing.assert_array_equal(np.asarray(path)[:23],
                                      np.asarray(ref_path), err_msg=fwd)
        # padded tail repeats the last valid state
        assert np.all(np.asarray(path)[23:] == np.asarray(path)[22])
        assert float(score) == float(ref_score), fwd


def test_budget_guard():
    assert factored_pallas_ok(2000, 1000)
    assert not factored_pallas_ok(2000, 4000)  # hop exceeds VMEM


def _fused_decode(graph, obs, mask=None):
    from lnasr_tpu.ops.factored_pallas import factored_decode_pallas

    log_b, pi_grid, final_grid = _grid_inputs(graph, obs)
    return factored_decode_pallas(
        pi_grid, graph.inner_a, graph.exit_idx, graph.hop, log_b,
        final_grid, None if mask is None else jnp.asarray(mask),
        interpret=True,
    )


@pytest.mark.parametrize(
    "v,t,mixed", [(5, 19, True), (12, 40, False), (130, 17, True)]
)
def test_fused_decode_matches_scan(v, t, mixed):
    """The in-kernel backtrace (factored_decode_pallas) must reproduce the
    scan decoder's path BITWISE — same first-max ties, same strict
    hop-vs-within rule."""
    graph, rng = _graph(v, mixed_lengths=mixed, seed=v)
    obs = rng.normal(scale=8.0, size=(t, 5)).astype(np.float32)
    path_f, score_f = _fused_decode(graph, obs)
    path_s, score_s = _scan_decode(graph, obs)
    np.testing.assert_array_equal(np.asarray(path_f), np.asarray(path_s))
    assert float(score_f) == float(score_s)


def test_fused_decode_masked():
    graph, rng = _graph(9, mixed_lengths=True, seed=21)
    obs = rng.normal(scale=8.0, size=(23, 5)).astype(np.float32)
    obs_pad = np.concatenate(
        [obs, rng.normal(size=(9, 5)).astype(np.float32)]
    )
    mask = np.arange(32) < 23
    ref_path, ref_score = _scan_decode(graph, obs)
    path, score = _fused_decode(graph, obs_pad, mask)
    np.testing.assert_array_equal(np.asarray(path)[:23], np.asarray(ref_path))
    assert np.all(np.asarray(path)[23:] == np.asarray(path)[22])
    assert float(score) == float(ref_score)


def test_fused_decode_planted_sequence():
    graph, rng = _graph(8, seed=11)
    mu = np.asarray(graph.mu)
    seq_words = ["w002", "w005", "w000"]
    frames = []
    for w in seq_words:
        wi = graph.words.index(w)
        for s in range(int(np.asarray(graph.exit_idx)[wi]) + 1):
            row = int(np.asarray(graph.state_map)[wi, s])
            frames += [mu[row, 0] + rng.normal(scale=0.05, size=5)] * 3
    path, score = _fused_decode(graph, np.asarray(frames, np.float32))
    assert graph._path_to_words(np.asarray(path)) == seq_words
    assert np.isfinite(float(score))


def _lattice_records_scan(graph, obs, mask=None):
    from lnasr_tpu.models.decoder import factored_lattice_scan

    log_b, pi_grid, _ = _grid_inputs(graph, obs)
    s, st, p, _ = factored_lattice_scan(
        log_b, graph.inner_a, graph.hop, pi_grid, graph.exit_idx,
        None if mask is None else jnp.asarray(mask),
    )
    return s, st, p


@pytest.mark.parametrize("v,t,mixed", [(5, 19, True), (130, 17, True)])
def test_lattice_kernel_matches_scan(v, t, mixed):
    """The lattice-recording kernel must reproduce the scan's records:
    start/pred exactly, scores exactly at every feasible state (the
    kernel carries unreachable states at the finite NEG sentinel)."""
    from lnasr_tpu.ops.factored_pallas import factored_lattice_pallas
    from lnasr_tpu.ops.trellis_pallas import NEG

    graph, rng = _graph(v, mixed_lengths=mixed, seed=v)
    obs = rng.normal(scale=8.0, size=(t, 5)).astype(np.float32)
    ref_s, ref_st, ref_p = _lattice_records_scan(graph, obs)
    log_b, pi_grid, _ = _grid_inputs(graph, obs)
    got_s, got_st, got_p = factored_lattice_pallas(
        pi_grid, graph.inner_a, graph.exit_idx, graph.hop, log_b,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got_st), np.asarray(ref_st))
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(ref_p))
    rs, gs = np.asarray(ref_s), np.asarray(got_s)
    np.testing.assert_array_equal(np.maximum(rs, NEG), np.maximum(gs, NEG))


def test_lattice_kernel_masked():
    from lnasr_tpu.ops.factored_pallas import factored_lattice_pallas
    from lnasr_tpu.ops.trellis_pallas import NEG

    graph, rng = _graph(9, mixed_lengths=True, seed=21)
    obs = rng.normal(scale=8.0, size=(32, 5)).astype(np.float32)
    mask = np.arange(32) < 23
    ref_s, ref_st, ref_p = _lattice_records_scan(graph, obs, mask)
    log_b, pi_grid, _ = _grid_inputs(graph, obs)
    got_s, got_st, got_p = factored_lattice_pallas(
        pi_grid, graph.inner_a, graph.exit_idx, graph.hop, log_b,
        jnp.asarray(mask), interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got_st), np.asarray(ref_st))
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(ref_p))
    np.testing.assert_array_equal(
        np.maximum(np.asarray(ref_s), NEG), np.maximum(np.asarray(got_s), NEG)
    )


def test_fused_decode_and_lattice_under_exact_ties():
    """Adversarial tie coverage: uniform emissions, identical hops and
    symmetric transitions make nearly every max a tie — the kernels'
    min-index selects must reproduce the scan's first-max/strict-hop
    tie-breaking exactly (random-float tests never exercise this)."""
    from lnasr_tpu.models.decoder import factored_lattice_scan
    from lnasr_tpu.ops.factored_pallas import (
        factored_decode_pallas,
        factored_lattice_pallas,
    )
    from lnasr_tpu.ops.trellis_pallas import NEG

    v, s, t = 7, 3, 23
    pi = np.full((v, s), -np.inf, np.float32)
    pi[:, 0] = 0.0  # every word equally likely
    inner = np.full((v, s, s), -np.inf, np.float32)
    for j in range(s):
        inner[:, j, j] = np.log(0.5)
        if j + 1 < s:
            inner[:, j, j + 1] = np.log(0.5)  # stay == advance: tie
    exit_idx = np.full(v, s - 1, np.int32)
    hop = np.zeros((v, v), np.float32)  # all hops identical
    log_b = np.zeros((t, v, s), np.float32)  # all emissions identical
    fin = np.zeros((v, s), np.float32)

    log_b_j = jnp.asarray(log_b)
    args = (jnp.asarray(pi), jnp.asarray(inner), exit_idx, jnp.asarray(hop))

    from lnasr_tpu.models.decoder import factored_trellis_scan

    ref_path, ref_score = factored_trellis_scan(
        log_b_j, args[1], args[3], args[0], jnp.asarray(fin), jnp.asarray(exit_idx)
    )
    got_path, got_score = factored_decode_pallas(
        *args, log_b_j, jnp.asarray(fin), interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got_path), np.asarray(ref_path))
    assert float(got_score) == float(ref_score)

    rs, rst, rp, _ = factored_lattice_scan(
        log_b_j, args[1], args[3], args[0], jnp.asarray(exit_idx)
    )
    gs, gst, gp = factored_lattice_pallas(*args, log_b_j, interpret=True)
    np.testing.assert_array_equal(np.asarray(gst), np.asarray(rst))
    np.testing.assert_array_equal(np.asarray(gp), np.asarray(rp))
    np.testing.assert_array_equal(
        np.maximum(np.asarray(rs), NEG), np.maximum(np.asarray(gs), NEG)
    )
