"""n-gram LM: Katz backoff math, perplexity, ARPA round-trip."""

import math

import numpy as np
import pytest

from lnasr_tpu.config import NGramConfig
from lnasr_tpu.models.ngram import (
    BOS,
    EOS,
    NGramCounter,
    NGramModel,
    NGramModelARPA,
    Tokenizer,
)

CORPUS = [
    "我 喜欢 吃 苹果",
    "我 喜欢 吃 香蕉",
    "你 喜欢 吃 苹果 吗",
    "我 不 喜欢 香蕉",
    "苹果 和 香蕉 都 好吃",
]


@pytest.fixture(scope="module")
def trigram():
    tokens = [Tokenizer.get_tokens(s) for s in CORPUS]
    return NGramModel(NGramCounter(3, tokens))


def test_tokenizer():
    assert Tokenizer.get_tokens("你好，世界。") == (BOS, "你好", "世界", EOS)
    assert Tokenizer.get_tokens("a b", add_bounds=False) == ("a", "b")


def test_counter_counts():
    tokens = [Tokenizer.get_tokens(s) for s in CORPUS]
    c2 = NGramCounter(2, tokens)
    assert c2.counts[("喜欢",)]["吃"] == 3
    assert c2.counts[(BOS,)]["我"] == 3
    # lower order chains down to unigrams
    assert c2.backoff.order == 1
    assert c2.backoff.counts[()]["喜欢"] == 4


def test_unigram_probabilities():
    tokens = [Tokenizer.get_tokens(s) for s in CORPUS]
    uni = NGramModel(NGramCounter(1, tokens))
    total = sum(len(t) for t in tokens)
    # discounted MLE: 0.7 * count / total
    assert uni.logprob("喜欢", ()) == pytest.approx(math.log10(0.7 * 4 / total))


def test_backoff_weight_math():
    """alpha(context) must equal (1 - sum_seen P(w|ctx)) /
    (1 - sum_seen P_bo(w)), computed independently from raw counts
    (ngram.py:164-175; with fixed discount d the numerator is always 1-d)."""
    tokens = [Tokenizer.get_tokens(s) for s in CORPUS]
    counter = NGramCounter(2, tokens)
    bi = NGramModel(counter)

    uni_counts = counter.backoff.counts[()]
    uni_total = sum(uni_counts.values())
    for context in [("喜欢",), ("我",), (BOS,)]:
        seen = counter.counts[context]
        seen_backoff_mass = sum(0.7 * uni_counts[w] / uni_total for w in seen)
        expected_alpha = (1.0 - 0.7) / (1.0 - seen_backoff_mass)
        assert 10 ** bi.prob_bo[context] == pytest.approx(expected_alpha, rel=1e-12)


def test_sentence_prob_and_ppl(trigram):
    sent = Tokenizer.get_tokens("我 喜欢 吃 苹果")
    lp = trigram.calc_prob(sent)
    assert lp < 0
    ppl = trigram.calc_ppl(sent)
    assert ppl == pytest.approx(10 ** (-lp / len(sent)))
    # seen sentence should beat a shuffled improbable one
    worse = trigram.calc_prob(Tokenizer.get_tokens("吗 香蕉 我 都"))
    assert lp > worse


def test_arpa_roundtrip(tmp_path, trigram):
    path = str(tmp_path / "trigram.lm")
    NGramModelARPA().save(trigram, path)
    loaded = NGramModel(NGramModelARPA().load(path))

    sent = Tokenizer.get_tokens("你 喜欢 吃 香蕉 吗")
    assert loaded.calc_prob(sent) == pytest.approx(trigram.calc_prob(sent), rel=1e-12)
    assert loaded.calc_ppl(sent) == pytest.approx(trigram.calc_ppl(sent), rel=1e-12)
    # every stored prob survives the round trip
    for ngram, p in trigram.prob.items():
        assert loaded.prob[ngram] == pytest.approx(p, rel=1e-12)


def test_arpa_file_format(tmp_path, trigram):
    path = str(tmp_path / "format.lm")
    NGramModelARPA().save(trigram, path)
    text = open(path, encoding="utf-8").read()
    assert "\\data\\" in text
    assert "\\1-grams:" in text and "\\3-grams:" in text
    assert "\\end\\" in text
    assert "ngram 1=" in text


def test_arpa_writer_no_shared_state(tmp_path, trigram):
    """Two saves must produce identical files (the reference's class-level
    section lists accumulate across saves, ngram.py:267-271,307)."""
    p1, p2 = str(tmp_path / "a.lm"), str(tmp_path / "b.lm")
    NGramModelARPA().save(trigram, p1)
    NGramModelARPA().save(trigram, p2)
    assert open(p1, encoding="utf-8").read() == open(p2, encoding="utf-8").read()


def test_score_table(trigram):
    words = ["我", "喜欢", "吃", "苹果"]
    table = trigram.score_table(words)
    assert table.shape == (4, 4)
    # seen bigram scores match direct scoring at the bigram level
    bi = trigram.backoff
    for i, wi in enumerate(words):
        for j, wj in enumerate(words):
            assert table[i, j] == pytest.approx(bi.logprob(wj, (wi,)))
    assert table[words.index("喜欢"), words.index("吃")] > table[words.index("吃"), words.index("喜欢")]
