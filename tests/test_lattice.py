"""Word lattices, N-best extraction, and higher-order LM rescoring."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from lnasr_tpu.models.decoder import (
    DecoderConfig,
    FactoredDecodingGraph,
    TrigramDecodingGraph,
)
from lnasr_tpu.models.lattice import WordLattice, lm_conditional
from lnasr_tpu.models.lexicon import Lexicon
from lnasr_tpu.models.ngram import BOS, NGramCounter, NGramModel, Tokenizer

from tests.test_decoder import _emit, _make_unit, _silence_unit, small_world  # noqa: F401


def _bigram(corpus):
    return NGramModel(NGramCounter(2, [Tokenizer.get_tokens(s) for s in corpus]))


def _trigram(corpus):
    return NGramModel(NGramCounter(3, [Tokenizer.get_tokens(s) for s in corpus]))


def test_lattice_best_path_matches_decode(small_world):
    """The lattice 1-best must reproduce the Viterbi decode, words and
    score, with and without an LM."""
    units, lex = small_world
    rng = np.random.default_rng(50)
    feats = np.concatenate(
        [_emit(units, lex[w], 4, rng) for w in ["charlie", "alpha", "bravo"]]
    )
    for lm in (None, _bigram(["alpha bravo charlie", "charlie alpha"])):
        cfg = DecoderConfig(lm_scale=2.0, word_insertion_penalty=-0.4)
        g = FactoredDecodingGraph.build(lex, units, lm, cfg, dtype=jnp.float64)
        words, _, score = g.decode(feats)
        lat = g.decode_lattice(feats, beam=np.inf)
        hyps = lat.nbest(1)
        assert hyps[0].words == words
        assert hyps[0].score == pytest.approx(score, rel=1e-12, abs=1e-9)


def test_nbest_scores_descend_and_are_distinct(small_world):
    units, lex = small_world
    rng = np.random.default_rng(51)
    feats = np.concatenate(
        [_emit(units, lex[w], 4, rng) for w in ["alpha", "bravo"]]
    )
    g = FactoredDecodingGraph.build(lex, units, None, DecoderConfig(),
                                    dtype=jnp.float64)
    hyps = g.decode_lattice(feats, beam=np.inf).nbest(5)
    assert len(hyps) > 1
    scores = [h.score for h in hyps]
    assert scores == sorted(scores, reverse=True)
    surfaces = [tuple(h.words) for h in hyps]
    assert len(set(surfaces)) == len(surfaces)
    # each hypothesis's token spans tile the utterance
    for h in hyps:
        assert h.tokens[0].start == 0
        assert h.tokens[-1].end == feats.shape[0] - 1
        for a, b in zip(h.tokens, h.tokens[1:]):
            assert b.start == a.end + 1


def test_bigram_rescore_is_self_consistent(small_world):
    """Rescoring with the SAME bigram LM the lattice was decoded with must
    reproduce each hypothesis's lattice score (the arc decomposition and
    the path-score rules agree)."""
    units, lex = small_world
    lm = _bigram(["alpha bravo charlie", "charlie alpha", "bravo bravo alpha"])
    cfg = DecoderConfig(lm_scale=1.5, word_insertion_penalty=-0.3)
    g = FactoredDecodingGraph.build(lex, units, lm, cfg, dtype=jnp.float64)
    rng = np.random.default_rng(52)
    feats = np.concatenate(
        [_emit(units, lex[w], 4, rng) for w in ["alpha", "bravo", "charlie"]]
    )
    lat = g.decode_lattice(feats, beam=np.inf)
    for h in lat.nbest(4):
        replayed = lat.lm_path_score(
            h.tokens, lm, cfg.lm_scale, cfg.word_insertion_penalty,
            cfg.exit_logp,
        )
        assert replayed == pytest.approx(h.score, rel=1e-12, abs=1e-9)


def test_trigram_rescoring_fixes_bigram_error():
    """The canonical two-word-history case: bigram decoding picks the
    wrong word, lattice rescoring with the trigram recovers the truth and
    agrees with the exact history-expanded graph."""
    units = {
        "P": _make_unit(-6.0),
        "Q": _make_unit(-2.0),
        "A": _make_unit(2.0),
        "B": _make_unit(6.0),
        "C": _make_unit(6.0),  # acoustically identical to B
    }
    lex = Lexicon({w.lower(): (w,) for w in units})
    corpus = ["p a b"] * 10 + ["q a c"] * 12
    lm = _trigram(corpus)
    cfg = DecoderConfig(lm_scale=1.0)
    g = FactoredDecodingGraph.build(lex, units, lm, cfg, dtype=jnp.float64)

    rng = np.random.default_rng(31)
    truth = ["p", "a", "b"]
    feats = np.concatenate([_emit(units, lex[w], 4, rng) for w in truth])

    bi_words, _, _ = g.decode(feats)
    assert bi_words == ["p", "a", "c"]  # bigram-level search errs

    lat = g.decode_lattice(feats, beam=np.inf)
    rescored = lat.rescore(lm, n=3, lm_scale=cfg.lm_scale)
    assert rescored[0].words == truth

    tri_graph = TrigramDecodingGraph.build(lex, units, lm, cfg,
                                           dtype=jnp.float64)
    tri_words, _, _ = tri_graph.decode(feats)
    assert rescored[0].words == tri_words


def test_trigram_rescore_score_matches_expanded_graph():
    """On the winning hypothesis, the lattice rescoring objective equals
    the exact trigram graph's path score (same composition rules)."""
    units = {
        "P": _make_unit(-6.0),
        "A": _make_unit(2.0),
        "B": _make_unit(6.0),
        "C": _make_unit(6.0),
    }
    lex = Lexicon({w.lower(): (w,) for w in units})
    corpus = ["p a b"] * 8 + ["p a c"] * 3 + ["a c p"] * 2
    lm = _trigram(corpus)
    cfg = DecoderConfig(lm_scale=1.2, word_insertion_penalty=-0.2)
    g = FactoredDecodingGraph.build(lex, units, lm, cfg, dtype=jnp.float64)
    tri = TrigramDecodingGraph.build(lex, units, lm, cfg, dtype=jnp.float64)

    rng = np.random.default_rng(53)
    feats = np.concatenate(
        [_emit(units, lex[w], 4, rng) for w in ["p", "a", "b"]]
    )
    _, _, tri_score = tri.decode(feats)
    lat = g.decode_lattice(feats, beam=np.inf)
    best = lat.rescore(lm, n=1, lm_scale=cfg.lm_scale,
                       word_insertion_penalty=cfg.word_insertion_penalty,
                       exit_logp=cfg.exit_logp)[0]
    assert best.score == pytest.approx(tri_score, rel=1e-12, abs=1e-9)


def test_lattice_beam_pruning_keeps_best_path(small_world):
    units, lex = small_world
    rng = np.random.default_rng(54)
    feats = np.concatenate(
        [_emit(units, lex[w], 4, rng) for w in ["bravo", "charlie"]]
    )
    g = FactoredDecodingGraph.build(lex, units, None, DecoderConfig(),
                                    dtype=jnp.float64)
    full = g.decode_lattice(feats, beam=np.inf)
    pruned = g.decode_lattice(feats, beam=20.0, max_tokens_per_frame=2)
    assert len(pruned) < len(full)
    assert pruned.nbest(1)[0].words == full.nbest(1)[0].words
    assert pruned.nbest(1)[0].score == pytest.approx(
        full.nbest(1)[0].score, rel=1e-12
    )


def test_masked_lattice_equals_unpadded(small_world):
    units, lex = small_world
    rng = np.random.default_rng(55)
    feats = np.concatenate(
        [_emit(units, lex[w], 5, rng) for w in ["bravo", "alpha"]]
    )
    t = feats.shape[0]
    feats_pad = np.concatenate([feats, rng.normal(size=(6, feats.shape[1]))])
    mask = np.arange(t + 6) < t
    g = FactoredDecodingGraph.build(lex, units, None, DecoderConfig(),
                                    dtype=jnp.float64)
    a = g.decode_lattice(feats, beam=np.inf).nbest(3)
    b = g.decode_lattice(feats_pad, mask=mask, beam=np.inf).nbest(3)
    assert [h.words for h in a] == [h.words for h in b]
    for x, y in zip(a, b):
        assert x.score == pytest.approx(y.score, rel=1e-12)


def test_lattice_with_silence_rescoring(small_world):
    """Silence tokens ride the lattice but never surface; rescoring keeps
    one word of history across the gap."""
    units, lex = small_world
    sil = _silence_unit()
    lm = _trigram(["alpha charlie", "charlie alpha", "alpha bravo"])
    cfg = DecoderConfig()
    g = FactoredDecodingGraph.build(lex, units, lm, cfg, silence_model=sil,
                                    dtype=jnp.float64)
    rng = np.random.default_rng(56)
    sil_frames = np.asarray(sil.mu)[0, 0] + rng.normal(scale=0.05, size=(6, 3))
    feats = np.concatenate([
        _emit(units, lex["alpha"], 4, rng),
        sil_frames,
        _emit(units, lex["charlie"], 4, rng),
    ])
    lat = g.decode_lattice(feats, beam=np.inf)
    best = lat.rescore(lm, n=2)[0]
    assert best.words == ["alpha", "charlie"]
    assert any(g.words[t.word_id] == "<sil>" for t in best.tokens)
    assert math.isfinite(best.score)


def test_lm_conditional_uses_matching_level():
    lm = _trigram(["a b c", "a b d", "b c d"])
    # one-word context against a trigram model must hit the bigram level
    bigram = lm._level(2)
    assert lm_conditional(lm, "b", ("a",)) == pytest.approx(
        bigram.logprob("b", ("a",))
    )
    # BOS context scores sentence-initial probability
    assert math.isfinite(lm_conditional(lm, "a", (BOS,)))
    # full two-word context uses the trigram level itself
    assert lm_conditional(lm, "c", ("a", "b")) == pytest.approx(
        lm.logprob("c", ("a", "b"))
    )


def test_posteriors_invariants_and_confidence(small_world):
    """Forward-backward posteriors: entry/exit mass each sums to 1, values
    lie in [0, 1], and in a clean utterance the decoded words carry
    near-certain confidence."""
    units, lex = small_world
    rng = np.random.default_rng(57)
    feats = np.concatenate(
        [_emit(units, lex[w], 4, rng) for w in ["charlie", "alpha"]]
    )
    g = FactoredDecodingGraph.build(lex, units, None, DecoderConfig(),
                                    dtype=jnp.float64)
    lat = g.decode_lattice(feats, beam=np.inf)
    post = lat.posteriors()
    assert post.shape == (len(lat),)
    assert np.all(post >= 0) and np.all(post <= 1 + 1e-9)
    entry = sum(post[i] for i, t in enumerate(lat.tokens) if t.start == 0)
    final = sum(
        post[i] for i, t in enumerate(lat.tokens)
        if t.end == lat.n_frames - 1
    )
    assert entry == pytest.approx(1.0, abs=1e-9)
    assert final == pytest.approx(1.0, abs=1e-9)

    best = lat.nbest(1)[0]
    conf = lat.confidences(best)
    assert len(conf) == len(best.words) == 2
    assert all(c > 0.95 for c in conf), conf


def test_confidence_drops_when_acoustics_are_ambiguous():
    """Two acoustically identical words must split the posterior mass, so
    the winner's confidence sits near 1/2 instead of 1."""
    units = {
        "A": _make_unit(2.0),
        "B": _make_unit(6.0),
        "C": _make_unit(6.0),  # identical to B
    }
    lex = Lexicon({w.lower(): (w,) for w in units})
    g = FactoredDecodingGraph.build(lex, units, None, DecoderConfig(),
                                    dtype=jnp.float64)
    rng = np.random.default_rng(58)
    feats = np.concatenate(
        [_emit(units, lex[w], 4, rng) for w in ["a", "b"]]
    )
    lat = g.decode_lattice(feats, beam=np.inf)
    best = lat.nbest(1)[0]
    conf = lat.confidences(best)
    assert conf[0] > 0.9                      # "a" is unambiguous
    assert 0.3 < conf[1] < 0.7, conf          # "b" vs "c" is a coin flip


def test_lattice_batch_matches_loop(small_world):
    """One vmapped lattice program over a padded batch == per-utterance
    decode_lattice calls (N-best words and scores identical)."""
    units, lex = small_world
    g = FactoredDecodingGraph.build(lex, units, None, DecoderConfig(),
                                    dtype=jnp.float64)
    rng = np.random.default_rng(59)
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

    lats = g.decode_lattice_batch(batch, masks, beam=np.inf)
    for i, f in enumerate(feats):
        solo = g.decode_lattice(batch[i], masks[i], beam=np.inf)
        a, b = lats[i].nbest(3), solo.nbest(3)
        assert [h.words for h in a] == [h.words for h in b]
        assert a[0].words == seqs[i]
        for x, y in zip(a, b):
            assert x.score == pytest.approx(y.score, rel=1e-12)


def test_lattice_save_load_roundtrip(tmp_path, small_world):
    """Decode once, rescore later: a saved lattice reloads to identical
    N-best and rescoring results (including -inf hop entries)."""
    units, lex = small_world
    sil = _silence_unit()
    lm = _trigram(["alpha charlie", "charlie alpha", "alpha bravo"])
    g = FactoredDecodingGraph.build(lex, units, lm, DecoderConfig(),
                                    silence_model=sil, dtype=jnp.float64)
    rng = np.random.default_rng(60)
    feats = np.concatenate(
        [_emit(units, lex[w], 4, rng) for w in ["alpha", "charlie"]]
    )
    lat = g.decode_lattice(feats, beam=np.inf)
    path = str(tmp_path / "utt.lat")
    lat.save(path)
    loaded = WordLattice.load(path)
    assert len(loaded) == len(lat)
    a, b = lat.nbest(3), loaded.nbest(3)
    assert [h.words for h in a] == [h.words for h in b]
    for x, y in zip(a, b):
        assert x.score == pytest.approx(y.score, rel=1e-12)
    ra = lat.rescore(lm, n=2)[0]
    rb = loaded.rescore(lm, n=2)[0]
    assert ra.words == rb.words
    assert ra.score == pytest.approx(rb.score, rel=1e-12)


# -- round-3 additions: vectorized host paths ---------------------------------


def _random_lattice(rng, n_words=6, n_spans=4, span_len=3, toks_per_span=3):
    """A synthetic lattice with known structure: ``n_spans`` abutting spans
    of ``span_len`` frames, ``toks_per_span`` random word tokens each."""
    from lnasr_tpu.models.lattice import WordToken

    words = [f"w{i}" for i in range(n_words)]
    hop = rng.normal(-2.0, 1.0, size=(n_words, n_words))
    pi = rng.normal(-1.5, 1.0, size=n_words)
    fin = rng.normal(-0.5, 0.5, size=n_words)
    tokens = []
    for s in range(n_spans):
        a, b = s * span_len, (s + 1) * span_len - 1
        for v in rng.choice(n_words, size=toks_per_span, replace=False):
            tokens.append(WordToken(int(v), a, b, float(rng.normal(-5, 2))))
    return WordLattice(words, tokens, hop, pi, fin, n_spans * span_len)


def _enumerate_paths(lat):
    """All complete paths (token-index tuples) with their total scores —
    the brute-force oracle for N-best and posteriors."""
    by_start = {}
    for i, t in enumerate(lat.tokens):
        by_start.setdefault(t.start, []).append(i)
    paths = []

    def walk(i, score, acc):
        tok = lat.tokens[i]
        score = score + tok.ac
        acc = acc + (i,)
        if tok.end == lat.n_frames - 1:
            paths.append((score + lat.log_final_w[tok.word_id], acc))
            return
        for j in by_start.get(tok.end + 1, ()):
            walk(j, score + lat.hop[tok.word_id, lat.tokens[j].word_id], acc)

    for i in by_start.get(0, ()):
        walk(i, lat.log_pi_w[lat.tokens[i].word_id], ())
    return paths


def test_nbest_matches_exhaustive_enumeration():
    """The batched per-frame N-best must agree with brute-force path
    enumeration on scores AND paths (including tie handling)."""
    rng = np.random.default_rng(58)
    for trial in range(5):
        lat = _random_lattice(rng)
        paths = _enumerate_paths(lat)
        paths.sort(key=lambda p: -p[0])
        hyps = lat.nbest(6, unique=False)
        assert len(hyps) == min(6, len(paths))
        for h, (score, _) in zip(hyps, paths[:6]):
            assert h.score == pytest.approx(score, rel=1e-12, abs=1e-9)


def test_posteriors_match_exhaustive_enumeration():
    """Forward-backward token posteriors equal path-sum ratios."""
    from scipy.special import logsumexp

    rng = np.random.default_rng(59)
    lat = _random_lattice(rng, n_spans=3)
    paths = _enumerate_paths(lat)
    total = logsumexp([s for s, _ in paths])
    post = lat.posteriors()
    for i in range(len(lat)):
        mass = [s for s, p in paths if i in p]
        expect = float(np.exp(logsumexp(mass) - total)) if mass else 0.0
        assert post[i] == pytest.approx(expect, abs=1e-9)


def test_nbest_stress_large_vocab_wall_time():
    """VERDICT round-2 bar: N-best on a 1,000-word lattice (beam-40 scale,
    ~2,000 frames) completes in under a second of host time."""
    import time

    from lnasr_tpu.models.lattice import WordToken

    rng = np.random.default_rng(60)
    v, span_len, n_spans, toks_per_span = 1000, 20, 100, 40
    words = [f"w{i}" for i in range(v)]
    hop = rng.normal(-4.0, 1.0, size=(v, v))
    pi = rng.normal(-6.0, 1.0, size=v)
    fin = rng.normal(-0.5, 0.5, size=v)
    tokens = []
    for s in range(n_spans):
        a, b = s * span_len, (s + 1) * span_len - 1
        for w in rng.choice(v, size=toks_per_span, replace=False):
            tokens.append(WordToken(int(w), a, b, float(rng.normal(-40, 4))))
    lat = WordLattice(words, tokens, hop, pi, fin, n_spans * span_len)
    assert len(lat) == 4000

    start = time.perf_counter()
    hyps = lat.nbest(10)
    nbest_s = time.perf_counter() - start
    assert len(hyps) == 10
    scores = [h.score for h in hyps]
    assert scores == sorted(scores, reverse=True)
    for h in hyps:  # spans tile the utterance
        assert h.tokens[0].start == 0 and h.tokens[-1].end == lat.n_frames - 1
    assert nbest_s < 1.0, f"nbest took {nbest_s:.2f}s"

    start = time.perf_counter()
    post = lat.posteriors()
    conf = lat.confidences(hyps[0], post)
    aux_s = time.perf_counter() - start
    assert len(conf) == len(hyps[0].words)
    assert np.all(post >= 0) and np.all(post <= 1 + 1e-9)
    assert aux_s < 1.0, f"posteriors+confidence took {aux_s:.2f}s"


def test_bigram_silence_crossing_parity(small_world):
    """Pin BOTH silence-gap history rules (ADVICE round 2): with
    ``silence_context="reset"`` same-bigram rescoring reproduces the
    lattice arc scores on silence-CROSSING paths (the factored search's
    unigram hop out of silence); the default ``"keep1"`` keeps one word
    of history — the trigram-graph objective — and differs there."""
    units, lex = small_world
    sil = _silence_unit()
    lm = _bigram(["alpha charlie", "charlie alpha", "alpha bravo charlie"])
    cfg = DecoderConfig(lm_scale=1.5, word_insertion_penalty=-0.3)
    g = FactoredDecodingGraph.build(lex, units, lm, cfg, silence_model=sil,
                                    dtype=jnp.float64)
    rng = np.random.default_rng(61)
    sil_frames = np.asarray(sil.mu)[0, 0] + rng.normal(scale=0.05, size=(6, 3))
    feats = np.concatenate([
        _emit(units, lex["alpha"], 4, rng),
        sil_frames,
        _emit(units, lex["charlie"], 4, rng),
    ])
    lat = g.decode_lattice(feats, beam=np.inf)
    crossing = [
        h for h in lat.nbest(8)
        if any(g.words[t.word_id] == "<sil>" for t in h.tokens[1:-1])
    ]
    assert crossing, "expected silence-crossing hypotheses in the lattice"
    for h in crossing:
        replay = lat.lm_path_score(
            h.tokens, lm, cfg.lm_scale, cfg.word_insertion_penalty,
            cfg.exit_logp, silence_context="reset",
        )
        assert replay == pytest.approx(h.score, rel=1e-12, abs=1e-9)
        keep1 = lat.lm_path_score(
            h.tokens, lm, cfg.lm_scale, cfg.word_insertion_penalty,
            cfg.exit_logp, silence_context="keep1",
        )
        assert keep1 != pytest.approx(h.score, rel=1e-12, abs=1e-9)


def test_lattice_json_is_strict(tmp_path, small_world):
    """Saved lattices must be STRICT JSON (no -Infinity literals) even when
    score tables carry unreachable -inf arcs, and round-trip exactly."""
    import json

    units, lex = small_world
    sil = _silence_unit()
    g = FactoredDecodingGraph.build(lex, units, None, DecoderConfig(),
                                    silence_model=sil, dtype=jnp.float64)
    rng = np.random.default_rng(62)
    feats = _emit(units, lex["alpha"], 4, rng)
    lat = g.decode_lattice(feats, beam=np.inf)
    assert not np.all(np.isfinite(lat.hop))  # sil->sil arc is -inf
    path = str(tmp_path / "lat.json")
    lat.save(path)
    with open(path, encoding="utf-8") as fp:
        text = fp.read()
    assert "Infinity" not in text and "NaN" not in text
    json.loads(text)  # strict parse (json.loads with default hooks accepts
    # the literals, so also check the text above)
    loaded = WordLattice.load(path)
    np.testing.assert_array_equal(loaded.hop, lat.hop)
    np.testing.assert_array_equal(loaded.log_pi_w, lat.log_pi_w)
    np.testing.assert_array_equal(loaded.log_final_w, lat.log_final_w)
    assert [h.score for h in loaded.nbest(3)] == [
        h.score for h in lat.nbest(3)
    ]
