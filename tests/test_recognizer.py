"""Full recognizer: audio -> VAD -> MFCC -> composed Viterbi -> text.

This is BASELINE.md config 5 (the flow the reference designed but never
implemented): synthesize distinguishable 'words' as audio, train per-word
GMM-HMMs on their MFCCs, then recognize unseen utterances and score WER.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lnasr_tpu.config import GMMHMMConfig, MFCCConfig
from lnasr_tpu.models.decoder import DecoderConfig
from lnasr_tpu.models.lexicon import Lexicon
from lnasr_tpu.models.ngram import NGramCounter, NGramModel, Tokenizer
from lnasr_tpu.models.recognizer import (
    AcousticModel,
    LanguageModel,
    Recognizer,
    segment_speech,
    train_unit_models,
)
from lnasr_tpu.utils.metrics import wer

SR = 16000
WORD_F0 = {"low": 220.0, "mid": 560.0, "high": 1400.0}


def _word_audio(word: str, rng, dur: float = 0.35) -> np.ndarray:
    """A 'word' = harmonic tone burst at a word-specific F0 with an AM envelope."""
    n = int(SR * dur)
    t = np.arange(n) / SR
    f0 = WORD_F0[word] * (1.0 + 0.01 * rng.normal())
    sig = sum(np.sin(2 * np.pi * k * f0 * t + rng.uniform(0, 2 * np.pi)) / k
              for k in range(1, 4))
    env = np.hanning(n)
    noise = rng.normal(0, 0.01, n)
    x = (sig * env * 0.3 + noise) * 12000
    return np.clip(x, -32768, 32767).astype(np.int16)


def _gap(rng, dur: float) -> np.ndarray:
    """Inter-word silence: a low noise floor, as real recordings have."""
    return (rng.normal(0, 60.0, int(SR * dur))).astype(np.int16)


def _utterance(words, rng, gap: float = 0.25) -> np.ndarray:
    parts = [_gap(rng, gap)]
    for w in words:
        parts.append(_word_audio(w, rng))
        parts.append(_gap(rng, gap))
    return np.concatenate(parts)


@pytest.fixture(scope="module")
def trained_recognizer():
    rng = np.random.default_rng(0)
    # no utterance-level CMN: training (isolated words) and decoding
    # (connected utterances) must see identically-defined features
    mfcc_cfg = MFCCConfig(energy_floor=1e-10, mean_norm=False)
    am_cfg = GMMHMMConfig(n_states=3, n_mix=2, dim=39)
    am = AcousticModel(mfcc_config=mfcc_cfg, dtype=jnp.float64)

    examples = {
        w: [np.asarray(am.mfcc(_word_audio(w, rng)).features) for _ in range(5)]
        for w in WORD_F0
    }
    # background/silence model, trained on inter-word noise-floor audio
    examples["<sil>"] = [
        np.asarray(am.mfcc(_gap(rng, 0.4)).features) for _ in range(4)
    ]
    am.units = train_unit_models(examples, am_cfg, iters=6, dtype=jnp.float64)

    corpus = ["low mid high", "high mid low", "low high", "mid mid low"]
    lm = LanguageModel(
        NGramModel(NGramCounter(2, [Tokenizer.get_tokens(s) for s in corpus]))
    )
    lex = Lexicon.whole_word(list(WORD_F0))
    rec = Recognizer(am, lex, lm, vad=None,
                     decoder_config=DecoderConfig(lm_scale=0.5))
    return rec, rng


def test_isolated_word_recognition(trained_recognizer):
    rec, rng = trained_recognizer
    for word in WORD_F0:
        audio = _word_audio(word, rng)
        feats = rec.am.features(audio)
        decoded, _, _ = rec.graph.decode(feats)
        assert decoded[0] == word


def test_connected_recognition_wer(trained_recognizer):
    rec, rng = trained_recognizer
    truth = ["low", "mid", "high", "mid", "low"]
    audio = _utterance(truth, rng, gap=0.12)
    hyp = rec.recognize(audio).split()
    assert wer(truth, hyp) <= 0.2, f"hyp={hyp}"


def test_recognizer_with_vad(trained_recognizer):
    from lnasr_tpu.vad.native import WebRtcVad

    rec, rng = trained_recognizer
    rec_vad = Recognizer(rec.am, rec.lexicon, rec.lm, vad=WebRtcVad(mode=0),
                         decoder_config=DecoderConfig(lm_scale=0.5))
    truth = ["high", "low"]
    audio = _utterance(truth, rng, gap=0.5)
    segs = rec_vad.recognize_segments(audio)
    assert len(segs) >= 1
    hyp = [w for s in segs for w in s.words]
    assert wer(truth, hyp) <= 0.5, f"hyp={hyp}, segments={[(s.start_s, s.end_s) for s in segs]}"
    for s in segs:
        assert 0 <= s.start_s < s.end_s <= len(audio) / SR


def test_segment_speech_logic():
    flags = np.array([0, 0, 1, 1, 1, 0, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 0, 0])
    segs = segment_speech(flags, frame_len=160, min_gap_frames=3,
                          min_len_frames=3, pad_frames=1)
    # first two bursts merge (gap 1 < 3); the trailing burst is separate
    assert len(segs) == 2
    a, b = segs[0]
    assert a == 160 * 1 and b == 160 * 9
    assert segs[1] == (160 * 19, 160 * 27)


def test_streaming_recognizer(trained_recognizer):
    """Chunked feeding must produce the same words as batch recognition."""
    from lnasr_tpu.models.recognizer import StreamingRecognizer
    from lnasr_tpu.vad.native import WebRtcVad

    rec, rng = trained_recognizer
    truth = ["high", "low", "mid"]
    audio = _utterance(truth, rng, gap=0.5)

    stream = StreamingRecognizer(rec, vad=WebRtcVad(mode=0))
    segs = []
    chunk = 1234  # deliberately unaligned with the 160-sample frames
    for i in range(0, len(audio), chunk):
        segs.extend(stream.process(audio[i : i + chunk]))
    segs.extend(stream.flush())

    hyp = [w for s in segs for w in s.words]
    assert wer(truth, hyp) <= 0.5, f"hyp={hyp}"
    assert all(s.start_s < s.end_s for s in segs)
    # feeding everything again after reset reproduces the result
    stream.reset()
    segs2 = stream.process(audio) + stream.flush()
    assert [s.words for s in segs2] == [s.words for s in segs]


def test_streaming_constant_memory_one_hour(trained_recognizer):
    """A simulated 1-hour stream must not grow the retained buffer: audio
    that can no longer join a segment is dropped (the round-1 implementation
    concatenated forever)."""
    from lnasr_tpu.models.recognizer import StreamingRecognizer
    from lnasr_tpu.vad.native import WebRtcVad

    rec, _ = trained_recognizer
    rng = np.random.default_rng(123)
    stream = StreamingRecognizer(rec, vad=WebRtcVad(mode=0))

    chunk_s = 2.0
    n_chunks = int(3600 / chunk_s)
    word_every = int(240 / chunk_s)  # a word burst every 4 minutes
    words = list(WORD_F0)
    max_buffer = 0
    n_segments = 0
    for i in range(n_chunks):
        chunk = _gap(rng, chunk_s)
        if i % word_every == 5:
            w = _word_audio(words[(i // word_every) % 3], rng)
            chunk = np.concatenate([chunk[: len(chunk) - len(w)], w])
        n_segments += len(stream.process(chunk))
        max_buffer = max(max_buffer, stream.stats.buffer_samples)
    n_segments += len(stream.flush())

    assert n_segments >= 10, f"only {n_segments} segments decoded"
    # bound: one chunk + the longest utterance + VAD pad margins — far
    # below the 57.6M samples an unbounded buffer would hold
    assert max_buffer < 5 * SR, f"buffer grew to {max_buffer} samples"
    assert stream.stats.audio_seconds == pytest.approx(3600, rel=1e-6)
    assert stream.stats.rtf < 1.0, f"rtf={stream.stats.rtf:.3f}"
    assert stream.stats.last_latency_s > 0


def test_factored_graph_recognizer_matches_dense(trained_recognizer):
    """graph="factored" must transcribe identically to the dense default."""
    rec, rng = trained_recognizer
    from lnasr_tpu.models.decoder import FactoredDecodingGraph

    rec_f = Recognizer(rec.am, rec.lexicon, rec.lm, vad=None,
                       decoder_config=DecoderConfig(lm_scale=0.5),
                       graph="factored")
    assert isinstance(rec_f.graph, FactoredDecodingGraph)
    truth = ["low", "mid", "high", "mid", "low"]
    audio = _utterance(truth, rng, gap=0.12)
    assert rec_f.recognize(audio) == rec.recognize(audio)


def test_bucketed_decoding_matches_unbucketed(trained_recognizer):
    """Shape-bucketed serving: padded-audio + frame-mask decodes must
    produce the same words as the exact-shape path, and different segment
    lengths must share jit shapes (one compile per bucket)."""
    rec, rng = trained_recognizer
    rec_b = Recognizer(rec.am, rec.lexicon, rec.lm, vad=None,
                       decoder_config=DecoderConfig(lm_scale=0.5),
                       bucket_frames=64)

    shapes = []
    orig_fused = rec_b._fused_segment_fn  # one jitted program in, spy on it

    def spy(sig, length):
        shapes.append(tuple(np.asarray(sig).shape))
        return orig_fused(sig, length)

    rec_b.__dict__["_fused_segment_fn"] = spy
    for dur in (0.31, 0.35, 0.43):
        audio = _word_audio("mid", rng, dur=dur)
        words_b, _ = rec_b.decode_segment(audio)
        words, _ = rec.decode_segment(audio)
        assert words_b == words
    # 0.31-0.43 s at 10 ms stride spans 31-43 frames: ONE 64-frame bucket,
    # so every fused call shares a single padded-sample shape (one compile)
    assert len(set(shapes)) == 1, shapes
    assert shapes[0][0] == 64 * rec.am.mfcc.config.frame_step


def test_bucketing_rejects_mean_norm(trained_recognizer):
    rec, _ = trained_recognizer
    am = AcousticModel(rec.am.units, MFCCConfig(energy_floor=1e-10,
                                                mean_norm=True),
                       dtype=rec.am.dtype)
    with pytest.raises(ValueError, match="mean_norm"):
        Recognizer(am, rec.lexicon, rec.lm, bucket_frames=64)


def test_acoustic_model_save_load(tmp_path, trained_recognizer):
    rec, rng = trained_recognizer
    d = str(tmp_path / "am")
    rec.am.save(d)
    am2 = AcousticModel.load(d, GMMHMMConfig(n_states=3, n_mix=2, dim=39),
                             dtype=jnp.float64)
    assert set(am2.units) == set(WORD_F0) | {"<sil>"}
    audio = _word_audio("mid", rng)
    f = rec.am.features(audio)
    for unit in WORD_F0:
        np.testing.assert_allclose(
            float(am2.units[unit].calc_prob(f)),
            float(rec.am.units[unit].calc_prob(f)),
            rtol=1e-9,
        )


def test_recognizer_nbest(trained_recognizer):
    """End-to-end N-best: the 1-best hypothesis equals the plain decode,
    alternatives come back ranked, and rescoring with the decoding LM
    keeps the ranking (self-consistency at the API level)."""
    rec, rng = trained_recognizer
    fact = Recognizer(rec.am, rec.lexicon, rec.lm, vad=None,
                      graph="factored",
                      decoder_config=DecoderConfig(lm_scale=0.5))
    truth = ["low", "mid", "high"]
    audio = _utterance(truth, rng, gap=0.12)
    plain = fact.recognize(audio).split()

    seg_lists = fact.recognize_nbest(audio, n=4)
    assert len(seg_lists) == 1
    hyps = seg_lists[0]
    assert hyps[0].words == plain
    scores = [h.score for h in hyps]
    assert scores == sorted(scores, reverse=True)

    rescored = fact.recognize_nbest(audio, n=4, rescore_lm=fact.lm)[0]
    assert rescored[0].words
    assert all(np.isfinite(h.score) for h in rescored)

    with pytest.raises(ValueError, match="factored"):
        rec.decode_segment_nbest(audio, n=2)


def test_8khz_end_to_end_sample_rate_plumbing():
    """Non-16k end-to-end decode (round-2 verdict: the recognizer layer
    hardcoded 16 kHz while the frontend and native VAD were configurable):
    an 8 kHz pipeline — 8 kHz MFCC config, 8 kHz native WebRTC VAD —
    trains, recognizes, and reports segment times in true seconds."""
    sr = 8000
    rng = np.random.default_rng(7)

    def word_audio(word):
        n = int(sr * 0.35)
        t = np.arange(n) / sr
        f0 = WORD_F0[word] * (1.0 + 0.01 * rng.normal())
        sig = sum(np.sin(2 * np.pi * k * f0 * t) / k for k in range(1, 3))
        x = (sig * np.hanning(n) * 0.3 + rng.normal(0, 0.01, n)) * 12000
        return np.clip(x, -32768, 32767).astype(np.int16)

    def gap(dur):
        return rng.normal(0, 60.0, int(sr * dur)).astype(np.int16)

    mfcc_cfg = MFCCConfig(sample_rate=sr, energy_floor=1e-10,
                          mean_norm=False)
    assert mfcc_cfg.frame_len == 200 and mfcc_cfg.frame_step == 80
    am = AcousticModel(mfcc_config=mfcc_cfg, dtype=jnp.float64)
    words = ["low", "mid"]
    examples = {
        w: [np.asarray(am.mfcc(word_audio(w)).features) for _ in range(4)]
        for w in words
    }
    examples["<sil>"] = [
        np.asarray(am.mfcc(gap(0.4)).features) for _ in range(3)
    ]
    am.units = train_unit_models(
        examples, GMMHMMConfig(n_states=3, n_mix=2, dim=39), iters=5,
        dtype=jnp.float64)

    from lnasr_tpu.vad.native import WebRtcVad

    # rate mismatch must be rejected, not silently mis-timed
    with pytest.raises(ValueError, match="sample rate"):
        Recognizer(am, Lexicon.whole_word(words), None,
                   vad=WebRtcVad(mode=0, sample_rate=16000))

    rec = Recognizer(am, Lexicon.whole_word(words), None,
                     vad=WebRtcVad(mode=0, sample_rate=sr))
    assert rec.sample_rate == sr
    truth = ["low", "mid"]
    parts = [gap(0.3)]
    for w in truth:
        parts += [word_audio(w), gap(0.3)]
    audio = np.concatenate(parts)
    segs = rec.recognize_segments(audio)
    hyp = [w for s in segs for w in s.words]
    assert hyp == truth, hyp
    total_s = len(audio) / sr
    for s in segs:  # timestamps divide by the TRUE rate
        assert 0.0 <= s.start_s < s.end_s <= total_s + 1e-9
    # a 16 kHz divisor would place every timestamp in the first half
    assert segs[-1].end_s > 0.55 * total_s


def test_word_time_alignment(trained_recognizer):
    """Word-level time alignment: words at KNOWN positions in the
    constructed utterance must come back with spans overlapping their
    true audio windows, in monotonic order, for all three graphs'
    path_to_alignment and through recognize_segments(word_times=True)."""
    rec, _ = trained_recognizer
    # own deterministic stream: drawing from the module fixture's shared
    # rng made this test's INPUT depend on which tests ran before it
    # (order-dependent failure caught in review)
    rng = np.random.default_rng(99)
    gap = 0.3
    truth = ["low", "high", "mid"]
    parts = [_gap(rng, gap)]
    true_spans = []
    t_cursor = gap
    for w in truth:
        a = _word_audio(w, rng)
        true_spans.append((w, t_cursor, t_cursor + len(a) / SR))
        parts.append(a)
        parts.append(_gap(rng, gap))
        t_cursor += len(a) / SR + gap
    audio = np.concatenate(parts)

    segs = rec.recognize_segments(audio, word_times=True)
    hyp = [w for s in segs for w in s.words]
    assert hyp == truth, hyp
    times = [t for s in segs for t in (s.word_times or [])]
    assert [w for w, _, _ in times] == truth
    prev_end = 0.0
    for (w, a, b), (tw, ta, tb) in zip(times, true_spans):
        assert w == tw
        assert a < b and a >= prev_end - 0.06  # monotone (frame overlap)
        prev_end = b
        # decoded span overlaps the true window generously (VAD/silence
        # absorb edges)
        assert a < tb and b > ta, (w, (a, b), (ta, tb))

    # alignment words always equal the decode words (dense graph here;
    # the factored/trigram variants share the assembly helper and are
    # pinned by their own decode parity tests)
    feats = rec.am.features(audio)
    words, path, _ = rec.graph.decode(feats)
    align = rec.graph.path_to_alignment(path)
    assert [w for w, _, _ in align] == words
    frames = [(a, b) for _, a, b in align]
    assert all(a <= b for a, b in frames)
    assert all(b < a2 for (_, b), (a2, _) in zip(frames, frames[1:]))


def test_nbest_bucketed_matches_unbucketed(trained_recognizer):
    """The fused one-dispatch N-best path (bucket_frames) must produce the
    same hypotheses and scores as the two-step exact-shape path."""
    rec, rng = trained_recognizer
    kwargs = dict(vad=None, graph="factored",
                  decoder_config=DecoderConfig(lm_scale=0.5))
    fact = Recognizer(rec.am, rec.lexicon, rec.lm, **kwargs)
    fact_b = Recognizer(rec.am, rec.lexicon, rec.lm, bucket_frames=64,
                        **kwargs)
    audio = _utterance(["mid", "low", "high"], rng, gap=0.12)
    ref = fact.decode_segment_nbest(audio, n=3)
    got = fact_b.decode_segment_nbest(audio, n=3)
    assert [h.words for h in got] == [h.words for h in ref]
    for g, r in zip(got, ref):
        assert abs(g.score - r.score) < 1e-3, (g.score, r.score)


def test_hop_mode_selection_rules(trained_recognizer):
    """An explicit hop_mode pins graph="auto" to the factored graph (the
    hop realization is a factored-graph choice), matches the dense-hop
    transcription, and is rejected loudly on graphs that cannot honor it
    (round-5 review: the flag silently did nothing on graph="dense")."""
    rec, rng = trained_recognizer
    from lnasr_tpu.models.decoder import FactoredDecodingGraph, HopFactors

    rec_bo = Recognizer(rec.am, rec.lexicon, rec.lm, vad=None,
                        decoder_config=DecoderConfig(lm_scale=0.5),
                        hop_mode="backoff")  # graph defaults to "auto"
    assert isinstance(rec_bo.graph, FactoredDecodingGraph)
    assert isinstance(rec_bo.graph.hop, HopFactors)
    truth = ["mid", "low", "high"]
    audio = _utterance(truth, rng, gap=0.12)
    assert rec_bo.recognize(audio) == rec.recognize(audio)
    with pytest.raises(ValueError, match="hop_mode"):
        Recognizer(rec.am, rec.lexicon, rec.lm, graph="dense",
                   hop_mode="backoff")
