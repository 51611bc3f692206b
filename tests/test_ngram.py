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


def _gt_corpus(seed=0, n_sents=400, vocab=60):
    """Synthetic Zipf-ish corpus large enough that every count-of-counts
    N_1..N_{k+1} at each order is non-zero (the Katz applicability
    condition)."""
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(vocab)]
    p = 1.0 / np.arange(1, vocab + 1)
    p /= p.sum()
    return [
        tuple([BOS] + [words[i] for i in rng.choice(vocab, size=8, p=p)] + [EOS])
        for _ in range(n_sents)
    ]


def test_good_turing_discounts_defined():
    """The GT estimator (reference's unfinished TODO, ngram.py:185-200):
    d_r must satisfy the Katz identity d_r = (r*/r - A)/(1 - A) computed
    independently from raw count-of-counts."""
    tokens = _gt_corpus()
    counter = NGramCounter(2, tokens)
    cfg = NGramConfig(order=2, smoothing="good-turing", gt_max_count=5)
    model = NGramModel(counter, cfg)
    ds = model._gt_discounts(counter)
    assert ds is not None and set(ds) == {1, 2, 3, 4, 5}

    from collections import Counter as C

    nr = C()
    for _, wc in counter.items():
        for cnt in wc.values():
            nr[cnt] += 1
    a = 6 * nr[6] / nr[1]
    for r in range(1, 6):
        r_star = (r + 1) * nr[r + 1] / nr[r]
        d = (r_star / r - a) / (1 - a)
        # out-of-range ratios (non-monotone N_r) are clamped to "no discount"
        assert ds[r] == pytest.approx(d if 0.0 < d <= 1.0 else 1.0)
        assert 0.0 < ds[r] <= 1.0
    # probabilities use d_r: a singleton bigram gets d_1 * 1 / total
    for ctx, wc in counter.items():
        singles = [w for w, c in wc.items() if c == 1]
        if singles:
            total = sum(wc.values())
            got = 10 ** model.prob[ctx + (singles[0],)]
            assert got == pytest.approx(ds[1] / total)
            break


def test_good_turing_normalizes():
    """sum_w P(w | ctx) over the full vocabulary must be ~1 under Katz
    backoff with GT discounts (seen mass + alpha * unseen backoff mass)."""
    tokens = _gt_corpus()
    cfg = NGramConfig(order=2, smoothing="good-turing")
    model = NGramModel(NGramCounter(2, tokens), cfg)
    vocab = model.vocabulary()
    for ctx in [("w0",), ("w1",), (BOS,)]:
        total = sum(10 ** model.logprob(w, ctx) for w in vocab)
        # unigram level itself is discounted, so a little mass (the GT
        # unseen-word estimate) is reserved for out-of-vocabulary words
        assert 0.9 < total <= 1.0 + 1e-9


def test_good_turing_beats_fixed_on_heldout():
    """GT discounts should give lower held-out perplexity than the blunt
    0.7 constant on a corpus with a realistic count distribution."""
    train = _gt_corpus(seed=0)
    held = _gt_corpus(seed=1, n_sents=50)
    counter = NGramCounter(2, train)
    fixed = NGramModel(counter, NGramConfig(order=2, smoothing="fixed"))
    gt = NGramModel(counter, NGramConfig(order=2, smoothing="good-turing"))
    ppl_fixed = float(np.mean([fixed.calc_ppl(s) for s in held]))
    ppl_gt = float(np.mean([gt.calc_ppl(s) for s in held]))
    assert ppl_gt < ppl_fixed


def test_good_turing_sparse_fallback():
    """Tiny corpora violate the Katz condition (some N_r = 0): estimation
    must fall back to the fixed discount, not crash or emit d > 1."""
    tokens = [Tokenizer.get_tokens(s) for s in CORPUS]
    cfg = NGramConfig(order=3, smoothing="good-turing")
    gt = NGramModel(NGramCounter(3, tokens), cfg)
    fixed = NGramModel(NGramCounter(3, tokens), NGramConfig(order=3))
    sent = Tokenizer.get_tokens("我 喜欢 吃 苹果")
    assert gt.calc_prob(sent) == pytest.approx(fixed.calc_prob(sent))


def test_good_turing_arpa_roundtrip(tmp_path):
    tokens = _gt_corpus()
    cfg = NGramConfig(order=2, smoothing="good-turing")
    model = NGramModel(NGramCounter(2, tokens), cfg)
    path = str(tmp_path / "gt.lm")
    NGramModelARPA().save(model, path)
    loaded = NGramModel(NGramModelARPA().load(path))
    sent = tokens[0]
    assert loaded.calc_prob(sent) == pytest.approx(model.calc_prob(sent), rel=1e-12)


def test_unknown_smoothing_rejected():
    tokens = [Tokenizer.get_tokens(s) for s in CORPUS]
    with pytest.raises(ValueError, match="smoothing"):
        NGramModel(NGramCounter(2, tokens), NGramConfig(order=2, smoothing="bogus"))


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


def test_score_table_vectorized_matches_loop():
    """The vectorized construction must equal the naive O(V^2) recursive
    scoring loop on a corpus big enough to mix seen and backed-off pairs."""
    tokens = _gt_corpus(vocab=30)
    model = NGramModel(NGramCounter(2, tokens))
    words = [f"w{i}" for i in range(30)] + [BOS, EOS]
    table = model.score_table(words)
    for i, wi in enumerate(words):
        for j, wj in enumerate(words):
            assert table[i, j] == pytest.approx(model.logprob(wj, (wi,)), rel=1e-12)


def test_score_table_trigram(trigram):
    """T[i, j, k] must equal direct trigram scoring for every triple."""
    words = ["我", "喜欢", "吃", "苹果", "香蕉"]
    table = trigram.score_table_trigram(words)
    assert table.shape == (5, 5, 5)
    for i, wi in enumerate(words):
        for j, wj in enumerate(words):
            for k, wk in enumerate(words):
                assert table[i, j, k] == pytest.approx(
                    trigram.logprob(wk, (wi, wj)), rel=1e-12
                ), (wi, wj, wk)


def test_score_table_trigram_requires_order():
    tokens = [Tokenizer.get_tokens(s) for s in CORPUS]
    bi = NGramModel(NGramCounter(2, tokens))
    with pytest.raises(ValueError, match="trigram"):
        bi.score_table_trigram(["我"])


def test_open_vocab_unk():
    """Open-vocab models reserve the unigram's freed discount mass for
    <unk>: unigrams sum to ~1, OOV words score as <unk>, and perplexity on
    OOV-containing text is finite and defined."""
    from lnasr_tpu.models.ngram import UNK

    tokens = [Tokenizer.get_tokens(s) for s in CORPUS]
    cfg = NGramConfig(order=2, open_vocab=True)
    model = NGramModel(NGramCounter(2, tokens), cfg)
    uni = model.backoff
    assert (UNK,) in uni.prob
    total = sum(10 ** p for p in uni.prob.values())
    assert total == pytest.approx(1.0, rel=1e-9)
    # OOV scores as <unk> at every order (via backoff)
    assert model.logprob("火星", ()) == pytest.approx(uni.prob[(UNK,)])
    assert model.logprob("火星", ("喜欢",)) > -50
    sent = Tokenizer.get_tokens("我 喜欢 吃 榴莲")
    ppl = model.calc_ppl(sent)
    assert np.isfinite(ppl) and ppl > 1.0


def test_open_vocab_arpa_roundtrip(tmp_path):
    """<unk> must survive the ARPA round trip like any other unigram."""
    from lnasr_tpu.models.ngram import UNK

    tokens = [Tokenizer.get_tokens(s) for s in CORPUS]
    model = NGramModel(NGramCounter(2, tokens), NGramConfig(order=2, open_vocab=True))
    path = str(tmp_path / "open.lm")
    NGramModelARPA().save(model, path)
    loaded = NGramModel(NGramModelARPA().load(path))
    assert loaded.backoff.prob[(UNK,)] == pytest.approx(model.backoff.prob[(UNK,)])
    assert loaded.logprob("不存在", ("我",)) == pytest.approx(
        model.logprob("不存在", ("我",)), rel=1e-12
    )


def test_closed_vocab_unchanged():
    """Default (closed-vocab) models keep the reference's sentinel behavior."""
    from lnasr_tpu.models.ngram import NEG_INF, UNK

    tokens = [Tokenizer.get_tokens(s) for s in CORPUS]
    model = NGramModel(NGramCounter(2, tokens))
    assert (UNK,) not in model.backoff.prob
    assert model.logprob("火星", ()) == NEG_INF
