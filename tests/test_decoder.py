"""Lexicon, decoding graph, and connected-word Viterbi decoding."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lnasr_tpu.config import GMMHMMConfig
from lnasr_tpu.models.decoder import (
    DecoderConfig,
    DecodingGraph,
    FactoredDecodingGraph,
    TrigramDecodingGraph,
)
from lnasr_tpu.models.gmmhmm import GMMHMM
from lnasr_tpu.models.lexicon import Lexicon
from lnasr_tpu.models.ngram import NGramCounter, NGramModel, Tokenizer
from lnasr_tpu.utils.metrics import edit_distance, wer


def _make_unit(mean_shift, n_states=2, n_mix=1, dim=3, dtype=jnp.float64):
    """Left-to-right unit model whose states emit around distinct means."""
    cfg = GMMHMMConfig(n_states=n_states, n_mix=n_mix, dim=dim)
    m = GMMHMM(cfg, dtype=dtype)
    rng = np.random.default_rng(int(abs(mean_shift * 100)) + 1)
    obs = rng.normal(size=(max(8, n_states * 4), dim)) + mean_shift
    m.init_left_to_right(obs, jax.random.PRNGKey(0))
    # separate the states so decoding is unambiguous
    mu = np.array(m.mu)
    for i in range(n_states):
        mu[i] = mean_shift + i * 0.5
    m.mu = jnp.asarray(mu)
    m.cov = jnp.full_like(m.cov, 0.05)
    return m


def _emit(units_models, word_units, frames_per_state, rng):
    """Synthesize a feature sequence for a word by walking its states."""
    frames = []
    for unit in word_units:
        m = units_models[unit]
        mu = np.asarray(m.mu)
        for s in range(m.n):
            for _ in range(frames_per_state):
                frames.append(mu[s, 0] + rng.normal(scale=0.05, size=mu.shape[-1]))
    return np.asarray(frames)


@pytest.fixture(scope="module")
def small_world():
    units = {
        "A": _make_unit(-4.0),
        "B": _make_unit(0.0),
        "C": _make_unit(4.0),
    }
    lex = Lexicon({"alpha": ("A",), "bravo": ("B",), "charlie": ("C",)})
    return units, lex


def test_lexicon_roundtrip(tmp_path, small_world):
    _, lex = small_world
    path = str(tmp_path / "lex.txt")
    lex.save(path)
    loaded = Lexicon.load(path)
    assert loaded == lex
    assert loaded.map("alpha") == ("A",)
    assert loaded.units() == ["A", "B", "C"]


def test_whole_word_lexicon():
    lex = Lexicon.whole_word(["x", "y"])
    assert lex["x"] == ("x",)


def test_isolated_word_decode(small_world):
    units, lex = small_world
    graph = DecodingGraph.build(lex, units, lm=None,
                                config=DecoderConfig(loop=False), dtype=jnp.float64)
    rng = np.random.default_rng(0)
    for word in ["alpha", "bravo", "charlie"]:
        feats = _emit(units, lex[word], 4, rng)
        decoded, path, score = graph.decode(feats)
        assert decoded == [word]
        assert np.isfinite(score)


def test_connected_word_decode(small_world):
    units, lex = small_world
    graph = DecodingGraph.build(lex, units, lm=None,
                                config=DecoderConfig(loop=True), dtype=jnp.float64)
    rng = np.random.default_rng(1)
    sequence = ["charlie", "alpha", "bravo", "alpha"]
    feats = np.concatenate([_emit(units, lex[w], 4, rng) for w in sequence])
    decoded, _, _ = graph.decode(feats)
    assert decoded == sequence


def test_repeated_word_decode(small_world):
    """Re-entry into the same word must be detected (word-final -> entry)."""
    units, lex = small_world
    graph = DecodingGraph.build(lex, units, lm=None, dtype=jnp.float64)
    rng = np.random.default_rng(2)
    sequence = ["bravo", "bravo", "charlie"]
    feats = np.concatenate([_emit(units, lex[w], 5, rng) for w in sequence])
    decoded, _, _ = graph.decode(feats)
    assert decoded == sequence


def test_multi_unit_words():
    """Words spelled from shared phone units decode correctly."""
    units = {"p": _make_unit(-5.0), "q": _make_unit(0.0), "r": _make_unit(5.0)}
    lex = Lexicon({"pq": ("p", "q"), "qr": ("q", "r"), "rp": ("r", "p")})
    graph = DecodingGraph.build(lex, units, lm=None, dtype=jnp.float64)
    rng = np.random.default_rng(3)
    sequence = ["pq", "rp", "qr"]
    feats = np.concatenate([_emit(units, lex[w], 4, rng) for w in sequence])
    decoded, _, _ = graph.decode(feats)
    assert decoded == sequence


def test_lm_breaks_acoustic_tie(small_world):
    """With acoustically ambiguous units, the bigram LM must decide."""
    units = {
        "A": _make_unit(0.0),
        "B": _make_unit(0.05),  # nearly identical to A
        "C": _make_unit(5.0),
    }
    lex = Lexicon({"alpha": ("A",), "bravo": ("B",), "charlie": ("C",)})
    corpus = ["charlie alpha"] * 20 + ["charlie bravo"] * 1
    lm = NGramModel(NGramCounter(2, [Tokenizer.get_tokens(s) for s in corpus]))
    graph = DecodingGraph.build(lex, units, lm,
                                DecoderConfig(lm_scale=20.0), dtype=jnp.float64)
    rng = np.random.default_rng(4)
    feats = np.concatenate([
        _emit(units, ("C",), 4, rng),
        _emit(units, ("A",), 4, rng) * 0 + 0.025,  # exactly between A and B
    ])
    decoded, _, _ = graph.decode(feats)
    assert decoded == ["charlie", "alpha"]  # LM prior wins the tie


# -- factored graph: parity with the dense oracle and scale ------------------


def _silence_unit(dim=3, dtype=jnp.float64):
    cfg = GMMHMMConfig(n_states=2, n_mix=1, dim=dim)
    m = GMMHMM(cfg, dtype=dtype)
    rng = np.random.default_rng(99)
    m.init_left_to_right(rng.normal(size=(8, dim)) * 0.1 + 10.0,
                         jax.random.PRNGKey(9))
    m.cov = jnp.full_like(m.cov, 0.05)
    return m


def _parity_case(units, lex, lm, config, feats):
    dense = DecodingGraph.build(lex, units, lm, config, dtype=jnp.float64)
    fact = FactoredDecodingGraph.build(lex, units, lm, config, dtype=jnp.float64)
    dw, _, dscore = dense.decode(feats)
    fw, _, fscore = fact.decode(feats)
    assert fw == dw, (fw, dw)
    assert fscore == pytest.approx(dscore, rel=1e-12, abs=1e-9)


def test_factored_matches_dense_connected(small_world):
    units, lex = small_world
    rng = np.random.default_rng(11)
    feats = np.concatenate(
        [_emit(units, lex[w], 4, rng) for w in ["charlie", "alpha", "bravo"]]
    )
    _parity_case(units, lex, None, DecoderConfig(loop=True), feats)


def test_factored_matches_dense_isolated(small_world):
    units, lex = small_world
    rng = np.random.default_rng(12)
    feats = _emit(units, lex["bravo"], 5, rng)
    _parity_case(units, lex, None, DecoderConfig(loop=False), feats)


def test_factored_matches_dense_with_lm(small_world):
    units, lex = small_world
    corpus = ["alpha bravo charlie", "charlie alpha", "bravo bravo alpha"]
    lm = NGramModel(NGramCounter(2, [Tokenizer.get_tokens(s) for s in corpus]))
    rng = np.random.default_rng(13)
    feats = np.concatenate(
        [_emit(units, lex[w], 4, rng) for w in ["alpha", "bravo", "charlie"]]
    )
    _parity_case(
        units, lex, lm,
        DecoderConfig(lm_scale=2.0, word_insertion_penalty=-0.5), feats,
    )


def test_factored_matches_dense_variable_word_lengths():
    """Padding: words of 2, 4, and 6 states share one (V, S) grid."""
    units = {"p": _make_unit(-5.0), "q": _make_unit(0.0), "r": _make_unit(5.0)}
    lex = Lexicon({"p": ("p",), "pq": ("p", "q"), "pqr": ("p", "q", "r")})
    rng = np.random.default_rng(14)
    feats = np.concatenate(
        [_emit(units, lex[w], 3, rng) for w in ["pqr", "p", "pq"]]
    )
    _parity_case(units, lex, None, DecoderConfig(loop=True), feats)


def test_factored_matches_dense_with_silence(small_world):
    units, lex = small_world
    sil = _silence_unit()
    rng = np.random.default_rng(15)
    sil_frames = np.asarray(sil.mu)[0, 0] + rng.normal(
        scale=0.05, size=(6, 3)
    )
    feats = np.concatenate([
        _emit(units, lex["alpha"], 4, rng),
        sil_frames,
        _emit(units, lex["charlie"], 4, rng),
    ])
    cfg = DecoderConfig(loop=True)
    dense = DecodingGraph.build(lex, units, None, cfg, silence_model=sil,
                                dtype=jnp.float64)
    fact = FactoredDecodingGraph.build(lex, units, None, cfg,
                                       silence_model=sil, dtype=jnp.float64)
    dw, _, dscore = dense.decode(feats)
    fw, _, fscore = fact.decode(feats)
    assert fw == dw == ["alpha", "charlie"]
    assert fscore == pytest.approx(dscore, rel=1e-12, abs=1e-9)


def _fast_unit(mean, n_states, dim, dtype=jnp.float64):
    """Direct-parameter left-to-right unit (no EM) for large-vocab tests."""
    cfg = GMMHMMConfig(n_states=n_states, n_mix=1, dim=dim)
    m = GMMHMM(cfg, dtype=dtype)
    a = np.full((n_states, n_states), -np.inf)
    for i in range(n_states - 1):
        a[i, i] = np.log(0.5)
        a[i, i + 1] = np.log(0.5)
    a[-1, -1] = 0.0
    pi = np.full(n_states, -np.inf)
    pi[0] = 0.0
    m.log_a, m.log_pi = jnp.asarray(a, dtype), jnp.asarray(pi, dtype)
    m.log_w = jnp.zeros((n_states, 1), dtype)
    m.mu = jnp.asarray(
        mean[None, None, :] + np.arange(n_states)[:, None, None] * 0.5, dtype
    )
    m.cov = jnp.full((n_states, 1, dim), 0.05, dtype)
    return m


def test_factored_large_vocabulary():
    """A 1,000-word vocabulary decodes through the factored graph with
    O(V*S^2 + V^2) memory — the dense (V*S)^2 matrix would be 9M times
    larger than the factored inner blocks. Spot-checked for correctness
    against ideal emissions."""
    v, dim, n_states = 1000, 8, 3
    rng = np.random.default_rng(20)
    means = rng.normal(scale=30.0, size=(v, dim))
    units = {f"w{i:04d}": _fast_unit(means[i], n_states, dim) for i in range(v)}
    lex = Lexicon.whole_word(sorted(units))
    graph = FactoredDecodingGraph.build(lex, units, None,
                                        DecoderConfig(loop=True),
                                        dtype=jnp.float64)
    assert graph.grid_shape == (v, n_states)
    assert graph.inner_a.shape == (v, n_states, n_states)
    assert graph.hop.shape == (v, v)
    assert graph.n_states == v * n_states

    sequence = ["w0007", "w0523", "w0999", "w0007"]
    frames = []
    for w in sequence:
        mu = np.asarray(units[w].mu)
        for s in range(n_states):
            for _ in range(3):
                frames.append(mu[s, 0] + rng.normal(scale=0.05, size=dim))
    decoded, path, score = graph.decode(np.asarray(frames))
    assert decoded == sequence
    assert np.isfinite(score)


# -- trigram (history-expanded) graph -----------------------------------------


def test_trigram_graph_matches_factored_with_bigram_lm(small_world):
    """With an order-2 LM the history expansion is inert: words and scores
    must equal the factored bigram search exactly."""
    units, lex = small_world
    corpus = ["alpha bravo charlie", "charlie alpha", "bravo bravo alpha"]
    lm = NGramModel(NGramCounter(2, [Tokenizer.get_tokens(s) for s in corpus]))
    cfg = DecoderConfig(lm_scale=1.5, word_insertion_penalty=-0.3)
    fact = FactoredDecodingGraph.build(lex, units, lm, cfg, dtype=jnp.float64)
    tri = TrigramDecodingGraph.build(lex, units, lm, cfg, dtype=jnp.float64)
    rng = np.random.default_rng(30)
    feats = np.concatenate(
        [_emit(units, lex[w], 4, rng) for w in ["alpha", "bravo", "charlie"]]
    )
    fw, _, fscore = fact.decode(feats)
    tw, _, tscore = tri.decode(feats)
    assert tw == fw
    assert tscore == pytest.approx(fscore, rel=1e-12, abs=1e-9)


def test_masked_decode_equals_unpadded(small_world):
    """Bucket-padded (masked) decoding equals exact-shape decoding across
    all three graph realizations."""
    units, lex = small_world
    corpus = ["alpha bravo charlie", "charlie alpha", "bravo bravo alpha"]
    lm = NGramModel(NGramCounter(2, [Tokenizer.get_tokens(s) for s in corpus]))
    cfg = DecoderConfig(lm_scale=1.0)
    rng = np.random.default_rng(31)
    feats = np.concatenate(
        [_emit(units, lex[w], 5, rng) for w in ["bravo", "alpha"]]
    )
    t = feats.shape[0]
    feats_pad = np.concatenate([feats, rng.normal(size=(7, feats.shape[1]))])
    mask = np.arange(t + 7) < t

    for graph_cls in (DecodingGraph, FactoredDecodingGraph,
                      TrigramDecodingGraph):
        g = graph_cls.build(lex, units, lm, cfg, dtype=jnp.float64)
        words, path, score = g.decode(feats)
        words_m, path_m, score_m = g.decode(feats_pad, mask)
        assert words_m == words, graph_cls.__name__
        np.testing.assert_array_equal(path_m[:t], path,
                                      err_msg=graph_cls.__name__)
        assert score_m == pytest.approx(score, rel=1e-12)


def test_factored_decode_batch_matches_loop(small_world):
    """One vmapped program over a padded batch == per-utterance decodes."""
    units, lex = small_world
    cfg = DecoderConfig(lm_scale=1.0)
    g = FactoredDecodingGraph.build(lex, units, None, cfg, dtype=jnp.float64)
    rng = np.random.default_rng(33)
    seqs = [["alpha", "bravo"], ["charlie"], ["bravo", "charlie", "alpha"]]
    feats = [
        np.concatenate([_emit(units, lex[w], 4, rng) for w in seq])
        for seq in seqs
    ]
    t_max = max(f.shape[0] for f in feats)
    batch = np.zeros((len(feats), t_max, feats[0].shape[1]))
    masks = np.zeros((len(feats), t_max), bool)
    for i, f in enumerate(feats):
        batch[i, : f.shape[0]] = f
        masks[i, : f.shape[0]] = True

    results = g.decode_batch(batch, masks)
    for i, f in enumerate(feats):
        words, path, score = g.decode(batch[i], masks[i])
        assert results[i][0] == words == seqs[i]
        np.testing.assert_array_equal(results[i][1], path)
        assert results[i][2] == pytest.approx(score, rel=1e-12)


def test_trigram_changes_hypothesis_and_wer_does_not_regress():
    """The canonical case a bigram cannot solve: two acoustically identical
    words whose identity only the two-word history disambiguates. The
    trigram graph must output a different (correct) hypothesis than the
    factored bigram graph."""
    units = {
        "P": _make_unit(-6.0),
        "Q": _make_unit(-2.0),
        "A": _make_unit(2.0),
        "B": _make_unit(6.0),
        "C": _make_unit(6.0),  # identical parameters to B (same seed path)
    }
    # B and C must be exactly identical acoustically
    assert np.allclose(np.asarray(units["B"].mu), np.asarray(units["C"].mu))
    lex = Lexicon({w.lower(): (w,) for w in units})
    corpus = ["p a b"] * 10 + ["q a c"] * 12
    lm = NGramModel(NGramCounter(3, [Tokenizer.get_tokens(s) for s in corpus]))
    cfg = DecoderConfig(lm_scale=1.0)
    bi_graph = FactoredDecodingGraph.build(lex, units, lm, cfg, dtype=jnp.float64)
    tri_graph = TrigramDecodingGraph.build(lex, units, lm, cfg, dtype=jnp.float64)

    rng = np.random.default_rng(31)
    truth = ["p", "a", "b"]
    feats = np.concatenate([_emit(units, lex[w], 4, rng) for w in truth])

    bi_words, _, _ = bi_graph.decode(feats)
    tri_words, _, _ = tri_graph.decode(feats)
    # bigram only sees P(.|a), where c dominates (12 > 10) and b/c are
    # acoustically indistinguishable -> it picks the wrong word
    assert bi_words == ["p", "a", "c"]
    # the trigram knows P(b | p, a) >> P(c | p, a)
    assert tri_words == truth
    assert wer(truth, tri_words) <= wer(truth, bi_words)


def test_trigram_graph_with_silence(small_world):
    """Silence decodes between words, emits no text, and keeps one word of
    history (bigram across the gap)."""
    units, lex = small_world
    sil = _silence_unit()
    corpus = ["alpha charlie", "charlie alpha", "alpha bravo"]
    lm = NGramModel(NGramCounter(3, [Tokenizer.get_tokens(s) for s in corpus]))
    graph = TrigramDecodingGraph.build(lex, units, lm, DecoderConfig(),
                                       silence_model=sil, dtype=jnp.float64)
    rng = np.random.default_rng(32)
    sil_frames = np.asarray(sil.mu)[0, 0] + rng.normal(scale=0.05, size=(6, 3))
    feats = np.concatenate([
        _emit(units, lex["alpha"], 4, rng),
        sil_frames,
        _emit(units, lex["charlie"], 4, rng),
    ])
    decoded, _, score = graph.decode(feats)
    assert decoded == ["alpha", "charlie"]
    assert np.isfinite(score)


def test_trigram_recognizer_wiring(small_world):
    from lnasr_tpu.models.recognizer import AcousticModel, LanguageModel, Recognizer

    units, lex = small_world
    corpus = ["alpha bravo", "bravo charlie"]
    lm = LanguageModel(
        NGramModel(NGramCounter(3, [Tokenizer.get_tokens(s) for s in corpus]))
    )
    am = AcousticModel(units, dtype=jnp.float64)
    rec = Recognizer(am, lex, lm, graph="trigram")
    assert isinstance(rec.graph, TrigramDecodingGraph)
    with pytest.raises(ValueError, match="requires a language model"):
        Recognizer(am, lex, None, graph="trigram")


def test_metrics():
    assert wer("a b c".split(), "a b c".split()) == 0.0
    assert wer("a b c".split(), "a x c".split()) == pytest.approx(1 / 3)
    dist, ops = edit_distance("abc", "axbcd")
    assert dist == 2
    assert ops["ins"] == 2 and ops["hit"] == 3
    assert wer([], []) == 0.0


# -- round-3: trigram graph at serving parity ---------------------------------


def test_trigram_decode_batch_and_mask_match_factored(small_world):
    """Batched + masked trigram decoding (serving parity): with an
    order-2 LM, decode_batch over padded utterances must equal the
    factored graph's batched decode AND per-utterance unpadded decodes,
    words and scores."""
    units, lex = small_world
    corpus = ["alpha bravo charlie", "charlie alpha", "bravo bravo alpha"]
    lm = NGramModel(NGramCounter(2, [Tokenizer.get_tokens(s) for s in corpus]))
    cfg = DecoderConfig(lm_scale=1.5, word_insertion_penalty=-0.3)
    fact = FactoredDecodingGraph.build(lex, units, lm, cfg, dtype=jnp.float64)
    tri = TrigramDecodingGraph.build(lex, units, lm, cfg, dtype=jnp.float64)

    rng = np.random.default_rng(33)
    utts = [
        np.concatenate([_emit(units, lex[w], 4, rng) for w in seq])
        for seq in (["alpha", "bravo"], ["charlie"],
                    ["bravo", "charlie", "alpha"])
    ]
    t_max = max(u.shape[0] for u in utts)
    batch = np.zeros((len(utts), t_max, utts[0].shape[1]))
    masks = np.zeros((len(utts), t_max), bool)
    for i, u in enumerate(utts):
        batch[i, : u.shape[0]] = u
        masks[i, : u.shape[0]] = True

    tri_out = tri.decode_batch(batch, masks)
    fact_out = fact.decode_batch(batch, masks)
    for i, u in enumerate(utts):
        words_b, _, score_b = tri_out[i]
        words_f, _, score_f = fact_out[i]
        words_u, _, score_u = tri.decode(u)  # unpadded single decode
        assert words_b == words_f == words_u
        assert score_b == pytest.approx(score_f, rel=1e-12, abs=1e-9)
        assert score_b == pytest.approx(score_u, rel=1e-12, abs=1e-9)


def test_trigram_build_guard_suggests_lattice_rescoring(small_world):
    """At vocabularies where the O(V^3) hop tensor exceeds the budget,
    build() must fail fast with the lattice-rescoring route in the
    message instead of materializing the tensor."""
    units, lex = small_world
    corpus = ["alpha bravo charlie"]
    lm = NGramModel(NGramCounter(3, [Tokenizer.get_tokens(s) for s in corpus]))
    with pytest.raises(ValueError, match="rescore"):
        TrigramDecodingGraph.build(lex, units, lm, DecoderConfig(),
                                   dtype=jnp.float64, max_table_bytes=64)
    # generous budget still builds
    g = TrigramDecodingGraph.build(lex, units, lm, DecoderConfig(),
                                   dtype=jnp.float64)
    assert g.hop3.shape[1] == len(lex)
