#!/usr/bin/env python3
"""End-to-end isolated/connected word recognition demo (synthetic audio).

Trains per-word GMM-HMMs on synthesized tone-burst "words", builds a
bigram LM and a whole-word lexicon, then recognizes a connected utterance
with VAD segmentation and reports WER. Runs on CPU in ~1 minute:

    python examples/isolated_word_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from lnasr_tpu.config import GMMHMMConfig, MFCCConfig
from lnasr_tpu.models import Lexicon, NGramCounter, NGramModel, Tokenizer
from lnasr_tpu.models.decoder import DecoderConfig
from lnasr_tpu.models.recognizer import (
    AcousticModel, LanguageModel, Recognizer, train_unit_models,
)
from lnasr_tpu.utils.metrics import wer
from lnasr_tpu.vad.native import WebRtcVad

SR = 16000
WORDS = {"low": 220.0, "mid": 560.0, "high": 1400.0}
rng = np.random.default_rng(0)


def word_audio(word, dur=0.35):
    n = int(SR * dur)
    t = np.arange(n) / SR
    f0 = WORDS[word] * (1 + 0.01 * rng.normal())
    sig = sum(np.sin(2 * np.pi * k * f0 * t + rng.uniform(0, 2 * np.pi)) / k
              for k in range(1, 4))
    x = (sig * np.hanning(n) * 0.3 + rng.normal(0, 0.01, n)) * 12000
    return np.clip(x, -32768, 32767).astype(np.int16)


def gap(dur):
    return rng.normal(0, 60.0, int(SR * dur)).astype(np.int16)


def utterance(words, g=0.3):
    parts = [gap(g)]
    for w in words:
        parts += [word_audio(w), gap(g)]
    return np.concatenate(parts)


def main():
    print("== training per-word GMM-HMMs (3 states x 2 mixtures, 39-dim MFCC)")
    mfcc_cfg = MFCCConfig(energy_floor=1e-10, mean_norm=False)
    am = AcousticModel(mfcc_config=mfcc_cfg)
    examples = {w: [np.asarray(am.mfcc(word_audio(w)).features) for _ in range(5)]
                for w in WORDS}
    examples["<sil>"] = [np.asarray(am.mfcc(gap(0.4)).features) for _ in range(4)]
    am.units = train_unit_models(
        examples, GMMHMMConfig(n_states=3, n_mix=2, dim=39), iters=6, verbose=True
    )

    print("== bigram LM + whole-word lexicon + composed decoder")
    corpus = ["low mid high", "high mid low", "low high mid"]
    lm = LanguageModel(NGramModel(NGramCounter(
        2, [Tokenizer.get_tokens(s) for s in corpus])))
    rec = Recognizer(am, Lexicon.whole_word(list(WORDS)), lm,
                     vad=WebRtcVad(mode=0),
                     decoder_config=DecoderConfig(lm_scale=0.5))

    truth = ["low", "mid", "high", "mid", "low", "high"]
    audio = utterance(truth)
    print(f"== recognizing a {len(audio) / SR:.1f}s utterance: truth = {' '.join(truth)}")
    for seg in rec.recognize_segments(audio):
        print(f"   [{seg.start_s:5.2f}s – {seg.end_s:5.2f}s] {' '.join(seg.words) or '(silence)'}")
    hyp = rec.recognize(audio).split()
    print(f"== hypothesis: {' '.join(hyp)}")
    print(f"== WER: {wer(truth, hyp):.2f}")


if __name__ == "__main__":
    main()
