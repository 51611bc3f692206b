"""Lexicon, decoding graph, and connected-word Viterbi decoding."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lnasr_tpu.config import GMMHMMConfig
from lnasr_tpu.models.decoder import DecoderConfig, DecodingGraph
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


def test_metrics():
    assert wer("a b c".split(), "a b c".split()) == 0.0
    assert wer("a b c".split(), "a x c".split()) == pytest.approx(1 / 3)
    dist, ops = edit_distance("abc", "axbcd")
    assert dist == 2
    assert ops["ins"] == 2 and ops["hit"] == 3
    assert wer([], []) == 0.0
