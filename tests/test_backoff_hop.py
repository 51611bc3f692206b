"""Backoff-factored word hops (``HopFactors``): parity with the dense
``(V, V)`` matrix the factors replace.

The large-vocabulary search realization keeps the Katz-backoff bigram's
own structure — rank-1 (``alpha + unigram``) plus sparse seen bigrams —
instead of materializing O(V^2) scores (``decoder._word_lm_factors``;
the reference's ARPA machinery stores exactly these factors,
``/root/reference/lnasr/ngram.py:156-183``). Seen-bigram arcs are
clamped to at least their backoff estimate (WFST epsilon-backoff max
semantics), so parity targets a same-clamped dense matrix; on LMs where
no arc needed clamping (the normal case) that IS the dense graph.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lnasr_tpu.models.decoder import (
    DecoderConfig,
    FactoredDecodingGraph,
    HopFactors,
    HostBackoffHop,
    _word_lm_factors,
    _word_lm_scores,
)
from lnasr_tpu.models.gmmhmm import GMMHMM
from lnasr_tpu.config import GMMHMMConfig
from lnasr_tpu.models.lexicon import Lexicon
from lnasr_tpu.models.ngram import NGramCounter, NGramModel

from tests.test_decoder import _emit, _make_unit


@pytest.fixture(scope="module")
def world():
    """Five words + silence, a bigram LM with real backoff structure
    (held-out pairs force alpha paths during decoding)."""
    names = ["alpha", "bravo", "charlie", "delta", "echo"]
    units = {w: _make_unit(4.0 * (i - 2), n_states=2, dim=3)
             for i, w in enumerate(names)}
    sil = _make_unit(9.0, n_states=2, dim=3)
    lex = Lexicon({w: (w,) for w in names})
    corpus = [
        ("<s>", "alpha", "bravo", "charlie", "</s>"),
        ("<s>", "bravo", "charlie", "delta", "</s>"),
        ("<s>", "charlie", "delta", "echo", "</s>"),
        ("<s>", "alpha", "bravo", "echo", "</s>"),
        ("<s>", "delta", "alpha", "</s>"),
    ] * 3
    lm = NGramModel(NGramCounter(2, corpus))
    return names, units, sil, lex, lm


def _dense_clamped(words, lm, config):
    """The parity target: dense hop with each cell raised to its own
    backoff estimate (identity when nothing needed clamping)."""
    pi, fin, hop = _word_lm_scores(words, lm, config)
    pi2, fin2, factors, _ = _word_lm_factors(words, lm, config)
    host = HostBackoffHop(factors)
    rank1 = host.from_w[:, None] + host.uni[None, :]
    if host.sil_idx >= 0:
        rank1[:, host.sil_idx] = host.sil_from
    clamped = np.maximum(hop, rank1)
    return pi, fin, clamped, pi2, fin2, host


def test_factors_reproduce_dense_scores(world):
    names, units, sil, lex, lm = world
    config = DecoderConfig(lm_scale=0.7, word_insertion_penalty=-1.5)
    words = sorted(names) + ["<sil>"]
    pi, fin, clamped, pi2, fin2, host = _dense_clamped(words, lm, config)
    np.testing.assert_allclose(pi2, pi, rtol=0, atol=1e-12)
    np.testing.assert_allclose(fin2, fin, rtol=0, atol=1e-12)
    np.testing.assert_allclose(host.dense(), clamped, rtol=0, atol=1e-12)
    # pair() agrees with block()
    v = len(words)
    for s in range(v):
        for d in range(v):
            assert host.pair(s, d) == host.dense()[s, d]


def test_factors_no_lm(world):
    names, units, sil, lex, lm = world
    config = DecoderConfig()
    words = sorted(names) + ["<sil>"]
    pi, fin, clamped, pi2, fin2, host = _dense_clamped(words, lm=None,
                                                       config=config)
    np.testing.assert_allclose(host.dense(), clamped, atol=1e-12)
    np.testing.assert_allclose(pi2, pi, atol=1e-12)


@pytest.mark.parametrize("with_lm", [True, False])
@pytest.mark.parametrize("with_sil", [True, False])
def test_backoff_decode_parity(world, with_lm, with_sil):
    """Words, paths AND scores identical between hop_mode="dense" and
    "backoff" on LM-weighted connected decoding (no clamping needed on
    this LM, so the dense graph is the exact target)."""
    names, units, sil, lex, lm = world
    config = DecoderConfig(lm_scale=0.7, word_insertion_penalty=-1.5)
    kw = dict(lm=lm if with_lm else None, config=config,
              silence_model=sil if with_sil else None, dtype=jnp.float64)
    dense = FactoredDecodingGraph.build(lex, units, hop_mode="dense", **kw)
    backoff = FactoredDecodingGraph.build(lex, units, hop_mode="backoff",
                                          **kw)
    assert isinstance(backoff.hop, HopFactors)
    assert backoff.hop_clamped == 0
    rng = np.random.default_rng(7)
    for seq in (["alpha", "bravo", "charlie"],
                ["delta", "alpha", "delta"],
                ["echo", "echo"]):
        feats = np.concatenate([_emit(units, lex[w], 4, rng) for w in seq])
        wd, pd, sd = dense.decode(feats)
        wb, pb, sb = backoff.decode(feats)
        assert wd == wb
        np.testing.assert_array_equal(pd, pb)
        # the factored form reassociates exit+alpha+uni+penalty sums:
        # scores agree to reassociation rounding (couple of ulp)
        np.testing.assert_allclose(sd, sb, rtol=1e-12)


def test_backoff_decode_parity_masked(world):
    """Bucket-padded (masked) decodes agree too."""
    names, units, sil, lex, lm = world
    config = DecoderConfig(lm_scale=0.5)
    kw = dict(lm=lm, config=config, silence_model=sil, dtype=jnp.float64)
    dense = FactoredDecodingGraph.build(lex, units, hop_mode="dense", **kw)
    backoff = FactoredDecodingGraph.build(lex, units, hop_mode="backoff",
                                          **kw)
    rng = np.random.default_rng(8)
    feats = np.concatenate(
        [_emit(units, lex[w], 4, rng) for w in ("bravo", "delta")]
    )
    t = feats.shape[0]
    pad = np.concatenate([feats, np.zeros((5, feats.shape[1]))])
    mask = np.arange(t + 5) < t
    wd, pd, sd = dense.decode(pad, mask)
    wb, pb, sb = backoff.decode(pad, mask)
    assert wd == wb
    np.testing.assert_allclose(sd, sb, rtol=1e-12)
    np.testing.assert_array_equal(pd, pb)


def test_backoff_batch_decode_parity(world):
    names, units, sil, lex, lm = world
    config = DecoderConfig(lm_scale=0.5)
    kw = dict(lm=lm, config=config, silence_model=sil, dtype=jnp.float64)
    dense = FactoredDecodingGraph.build(lex, units, hop_mode="dense", **kw)
    backoff = FactoredDecodingGraph.build(lex, units, hop_mode="backoff",
                                          **kw)
    rng = np.random.default_rng(9)
    seqs = [["alpha", "charlie"], ["echo", "bravo"]]
    fs = [np.concatenate([_emit(units, lex[w], 4, rng) for w in s])
          for s in seqs]
    t = max(f.shape[0] for f in fs)
    batch = np.zeros((2, t, 3))
    mask = np.zeros((2, t), bool)
    for i, f in enumerate(fs):
        batch[i, : f.shape[0]] = f
        mask[i, : f.shape[0]] = True
    rd = dense.decode_batch(batch, mask)
    rb = backoff.decode_batch(batch, mask)
    for (wd, pd, sd), (wb, pb, sb) in zip(rd, rb):
        assert wd == wb
        np.testing.assert_allclose(sd, sb, rtol=1e-12)
        np.testing.assert_array_equal(pd, pb)


def test_backoff_lattice_parity(world):
    """Lattice records, N-best lists and rescoring agree between hop
    realizations (the backoff lattice indexes HostBackoffHop)."""
    names, units, sil, lex, lm = world
    config = DecoderConfig(lm_scale=0.7, word_insertion_penalty=-0.5)
    kw = dict(lm=lm, config=config, silence_model=sil, dtype=jnp.float64)
    dense = FactoredDecodingGraph.build(lex, units, hop_mode="dense", **kw)
    backoff = FactoredDecodingGraph.build(lex, units, hop_mode="backoff",
                                          **kw)
    rng = np.random.default_rng(10)
    feats = np.concatenate(
        [_emit(units, lex[w], 4, rng) for w in ("alpha", "bravo", "echo")]
    )
    ld = dense.decode_lattice(feats, beam=np.inf)
    lb = backoff.decode_lattice(feats, beam=np.inf)
    assert len(ld) == len(lb)
    hd = ld.nbest(5)
    hb = lb.nbest(5)
    assert [h.words for h in hd] == [h.words for h in hb]
    np.testing.assert_allclose([h.score for h in hd],
                               [h.score for h in hb], atol=1e-9)
    # posteriors ride the same arcs
    np.testing.assert_allclose(ld.posteriors(), lb.posteriors(), atol=1e-9)


def test_backoff_lattice_save_load(world, tmp_path):
    names, units, sil, lex, lm = world
    config = DecoderConfig(lm_scale=0.5)
    backoff = FactoredDecodingGraph.build(
        lex, units, lm=lm, config=config, silence_model=sil,
        dtype=jnp.float64, hop_mode="backoff",
    )
    rng = np.random.default_rng(11)
    feats = np.concatenate(
        [_emit(units, lex[w], 4, rng) for w in ("charlie", "delta")]
    )
    lat = backoff.decode_lattice(feats, beam=np.inf)
    path = str(tmp_path / "lat.json")
    lat.save(path)
    from lnasr_tpu.models.lattice import WordLattice

    lat2 = WordLattice.load(path)
    h1, h2 = lat.nbest(3), lat2.nbest(3)
    assert [h.words for h in h1] == [h.words for h in h2]
    np.testing.assert_allclose([h.score for h in h1],
                               [h.score for h in h2], atol=1e-12)


def test_clamped_arc_semantics():
    """When an explicit bigram scores BELOW its backoff estimate, the
    factored search clamps the arc to the backoff value (max semantics) —
    and matches a dense graph whose matrix is clamped the same way."""
    names = ["a", "b", "c"]
    units = {w: _make_unit(4.0 * (i - 1), n_states=2, dim=3)
             for i, w in enumerate(names)}
    lex = Lexicon({w: (w,) for w in names})
    # craft an LM where P(b | a) is explicit but tiny (below alpha+uni)
    corpus = [("<s>", "a", "c", "</s>"), ("<s>", "b", "c", "</s>"),
              ("<s>", "c", "a", "</s>")] * 5 + [("<s>", "a", "b", "</s>")]
    lm = NGramModel(NGramCounter(2, corpus))
    config = DecoderConfig(lm_scale=1.0)
    words = sorted(names)
    pi, fin, hop = _word_lm_scores(words, lm, config)
    pi2, fin2, factors, n_clamped = _word_lm_factors(words, lm, config)
    host = HostBackoffHop(factors)
    rank1 = host.from_w[:, None] + host.uni[None, :]
    np.testing.assert_allclose(host.dense(), np.maximum(hop, rank1),
                               atol=1e-12)
    if n_clamped:  # the crafted violation actually occurred
        assert (np.maximum(hop, rank1) != hop).any()
    # decode parity vs the clamped dense matrix
    dense = FactoredDecodingGraph.build(lex, units, lm=lm, config=config,
                                        dtype=jnp.float64, hop_mode="dense")
    dense.hop = jnp.asarray(np.maximum(np.asarray(dense.hop),
                                       rank1), jnp.float64)
    backoff = FactoredDecodingGraph.build(lex, units, lm=lm, config=config,
                                          dtype=jnp.float64,
                                          hop_mode="backoff")
    rng = np.random.default_rng(12)
    feats = np.concatenate([_emit(units, lex[w], 4, rng)
                            for w in ("a", "b", "c")])
    wd, pd, sd = dense.decode(feats)
    wb, pb, sb = backoff.decode(feats)
    assert wd == wb
    np.testing.assert_allclose(sd, sb, rtol=1e-12)
    np.testing.assert_array_equal(pd, pb)
