"""Rank-1 (word-loop) hop Pallas kernels vs the scan realization.

``hop_mode="rank1"`` strips the sparse seen-bigram arcs from the
backoff factors, so the word-entry reduction is one rank-1 max-plus —
the kernel realization for vocabularies past the dense (V, V) VMEM cap
(`factored_rank1_ok`). Paths and scores must match the ``lax.scan``
decoder on the SAME factors bitwise (max-plus associativity + identical
argmax tie rules), including silence and masked (bucketed) frames.
"""

import types

import numpy as np
import jax.numpy as jnp
import pytest

from lnasr_tpu.config import GMMHMMConfig
from lnasr_tpu.models.decoder import (
    DecoderConfig,
    FactoredDecodingGraph,
    HopFactors,
    factored_lattice_scan,
    factored_trellis_scan,
)
from lnasr_tpu.models.lexicon import Lexicon
from lnasr_tpu.models.ngram import NGramCounter, NGramModel
from lnasr_tpu.ops.factored_pallas import (
    factored_decode_pallas,
    factored_lattice_pallas,
    factored_pallas_ok,
    factored_rank1_ok,
)

from tests.test_factored_pallas import _grid_inputs, _unit


def _rank1_graph(v, dim=5, with_lm=True, with_sil=False, seed=0):
    rng = np.random.default_rng(seed)
    means = rng.normal(scale=8.0, size=(v + 1, dim))
    units = {f"w{i:03d}": _unit(means[i], 2 + (i % 2), dim, rng)
             for i in range(v)}
    names = sorted(units)
    lex = Lexicon.whole_word(names)
    lm = None
    if with_lm:
        corpus = [
            tuple(["<s>"] + list(rng.choice(names, size=3)) + ["</s>"])
            for _ in range(40)
        ]
        lm = NGramModel(NGramCounter(2, corpus))
    sil = _unit(means[v], 2, dim, rng) if with_sil else None
    graph = FactoredDecodingGraph.build(
        lex, units, lm, DecoderConfig(loop=True, lm_scale=0.7),
        silence_model=sil, dtype=jnp.float32, hop_mode="rank1",
    )
    assert isinstance(graph.hop, HopFactors)
    assert graph.hop_rank1_only
    if with_lm:
        assert graph.hop_pruned_edges > 0  # the LM's arcs were dropped
    return graph, rng


def _scan_decode(graph, obs, mask=None):
    log_b, pi_grid, final_grid = _grid_inputs(graph, obs)
    return factored_trellis_scan(
        log_b, graph.inner_a, graph.hop, pi_grid, final_grid,
        graph.exit_idx, mask,
    )


def _kernel_decode(graph, obs, mask=None):
    log_b, pi_grid, final_grid = _grid_inputs(graph, obs)
    return factored_decode_pallas(
        pi_grid, graph.inner_a, graph.exit_idx, graph.hop, log_b,
        final_grid, mask, interpret=True,
    )


@pytest.mark.parametrize("with_lm", [True, False])
@pytest.mark.parametrize("with_sil", [True, False])
def test_rank1_decode_matches_scan(with_lm, with_sil):
    graph, rng = _rank1_graph(6, with_lm=with_lm, with_sil=with_sil)
    obs = rng.normal(scale=8.0, size=(37, 5)).astype(np.float32)
    ps, ss = _scan_decode(graph, obs)
    pk, sk = _kernel_decode(graph, obs)
    np.testing.assert_array_equal(np.asarray(ps), np.asarray(pk))
    assert float(ss) == float(sk)  # bitwise


def test_rank1_decode_masked():
    graph, rng = _rank1_graph(5, with_lm=True, with_sil=True, seed=3)
    obs = rng.normal(scale=8.0, size=(33, 5)).astype(np.float32)
    pad = np.concatenate([obs, np.zeros((7, 5), np.float32)])
    mask = np.arange(40) < 33
    ps, ss = _scan_decode(graph, obs)
    pk, sk = _kernel_decode(graph, jnp.asarray(pad), jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(ps), np.asarray(pk)[:33])
    assert float(ss) == float(sk)


def test_rank1_decodes_planted_sequence():
    """A word sequence planted in the emissions is recovered through the
    kernel (semantic check on top of scan parity)."""
    graph, rng = _rank1_graph(8, with_lm=False, seed=5)
    seq = ["w003", "w000", "w006"]
    frames = []
    sm = np.asarray(graph.state_map)
    pm = np.asarray(graph.pad_mask)
    mu = np.asarray(graph.mu)
    for w in seq:
        wi = graph.words.index(w)
        for s in np.flatnonzero(pm[wi]):
            frames += [mu[sm[wi, s], 0] + rng.normal(scale=0.05, size=5)] * 3
    obs = np.asarray(frames, np.float32)
    path, _ = _kernel_decode(graph, obs)
    words = graph._path_to_words(np.asarray(path))
    assert words == seq


def test_rank1_lattice_matches_scan():
    graph, rng = _rank1_graph(6, with_lm=True, with_sil=True, seed=7)
    obs = rng.normal(scale=8.0, size=(29, 5)).astype(np.float32)
    log_b, pi_grid, _ = _grid_inputs(graph, obs)
    s_sc, st_sc, pr_sc, _ = factored_lattice_scan(
        log_b, graph.inner_a, graph.hop, pi_grid, graph.exit_idx
    )
    s_k, st_k, pr_k = factored_lattice_pallas(
        pi_grid, graph.inner_a, graph.exit_idx, graph.hop, log_b,
        interpret=True,
    )
    from lnasr_tpu.ops.trellis_pallas import NEG

    finite = np.asarray(s_sc) > NEG / 2
    np.testing.assert_array_equal(
        np.asarray(s_sc)[finite], np.asarray(s_k)[finite]
    )
    np.testing.assert_array_equal(np.asarray(st_sc)[finite],
                                  np.asarray(st_k)[finite])
    np.testing.assert_array_equal(np.asarray(pr_sc)[finite],
                                  np.asarray(pr_k)[finite])


def test_rank1_capacity_beyond_dense_cap():
    """The rank-1 kernels clear vocabularies the dense kernels cannot."""
    assert not factored_pallas_ok(500, 5000)
    assert factored_rank1_ok(500, 5000)
    assert factored_rank1_ok(500, 10000)
    assert not factored_rank1_ok(500, 32000)  # scan takes over up there


def test_backoff_no_lm_is_rank1_eligible():
    """hop_mode="backoff" with no LM has no sparse arcs, so it rides the
    rank-1 kernels too."""
    rng = np.random.default_rng(11)
    means = rng.normal(scale=8.0, size=(4, 5))
    units = {f"w{i}": _unit(means[i], 2, 5, rng) for i in range(4)}
    graph = FactoredDecodingGraph.build(
        Lexicon.whole_word(sorted(units)), units, None,
        DecoderConfig(loop=True), dtype=jnp.float32, hop_mode="backoff",
    )
    assert graph.hop_rank1_only
