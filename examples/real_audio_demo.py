"""End-to-end recognition on the reference's REAL speech fixtures.

One command reproduces a WER report:

    python examples/real_audio_demo.py [workdir]

Protocol (no synthetic tones anywhere):

1. VAD-segment the reference's real recordings
   (``/root/reference/test/third/data-vad.raw``, 12.6 s, and
   ``/root/reference/test/data.raw``, 1.36 s — raw PCM 16 kHz/16-bit) into
   speech chunks; each chunk becomes a vocabulary word.
2. Make train/test copies of every word by label-preserving augmentation
   (additive noise at random SNR, gain, small time offset).
3. Train per-word GMM-HMMs with the ``train-am`` CLI from a manifest,
   plus a ``<sil>`` background unit from the recordings' own noise floor.
4. Build connected test utterances (held-out copies, real gap audio
   between words), train a bigram LM on the training word sequences, and
   score the ``recognize`` CLI's transcripts against the ground truth.

Everything runs through the public CLI — the same flow a user would run
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


def cli(*args: str) -> str:
    """Run a CLI subcommand in a subprocess, as a user would."""
    cmd = [sys.executable, "-m", "lnasr_tpu.cli", *args]
    out = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    if out.returncode != 0:
        raise RuntimeError(f"{' '.join(cmd)} failed:\n{out.stderr}")
    return out.stdout


def vad_words(audio: np.ndarray, min_s: float = 0.25):
    """Real speech chunks (the demo's vocabulary) + noise-floor audio."""
    from lnasr_tpu.vad.native import WebRtcVad

    vad = WebRtcVad(mode=0)
    flags = vad.process(audio)
    segs = segment_speech(flags, vad.FRAME_LEN, min_gap_frames=12,
                          min_len_frames=8, pad_frames=2)
    words, gaps, prev = [], [], 0
    for a, b in segs:
        if (b - a) / SR >= min_s:
            words.append(audio[a:b])
        if a - prev > SR // 4:
            gaps.append(audio[prev:a])
        prev = b
    if len(audio) - prev > SR // 4:
        gaps.append(audio[prev:])
    return words, gaps


def augment(x: np.ndarray, rng) -> np.ndarray:
    """Label-preserving copy: gain, additive noise at 18-30 dB SNR, offset."""
    y = x.astype(np.float64) * rng.uniform(0.8, 1.2)
    snr_db = rng.uniform(18.0, 30.0)
    noise_rms = np.sqrt(np.mean(y**2)) / (10.0 ** (snr_db / 20.0))
    y = y + rng.normal(0.0, noise_rms, len(y))
    shift = rng.integers(0, SR // 50)
    y = np.concatenate([np.zeros(shift), y])
    return np.clip(y, -32768, 32767).astype(np.int16)


def main(workdir=None) -> float:
    tmp = workdir or tempfile.mkdtemp(prefix="lnasr_demo_")
    os.makedirs(tmp, exist_ok=True)
    rng = np.random.default_rng(0)

    words, gaps = [], []
    for path in FIXTURES:
        w, g = vad_words(read_pcm(path))
        words += w
        gaps += g
    names = [f"w{i}" for i in range(len(words))]
    print(f"vocabulary: {len(words)} real speech chunks "
          f"({', '.join(f'{len(w)/SR:.2f}s' for w in words)}), "
          f"{len(gaps)} noise-floor chunks")

    # -- manifest: 6 augmented training copies per word + <sil> examples ----
    lines = []
    for name, w in zip(names, words):
        for k in range(6):
            p = os.path.join(tmp, f"{name}_train{k}.pcm")
            write_pcm(p, augment(w, rng))
            lines.append(f"{name}\t{p}")
    for k, g in enumerate((gaps * 3)[:6]):
        p = os.path.join(tmp, f"sil_train{k}.pcm")
        write_pcm(p, augment(g, rng))
        lines.append(f"<sil>\t{p}")
    manifest = os.path.join(tmp, "train.manifest")
    with open(manifest, "w") as fp:
        fp.write("\n".join(lines) + "\n")

    amdir = os.path.join(tmp, "am")
    print(cli("train-am", manifest, amdir, "--states", "8", "--mix", "2",
              "--iters", "8").strip())

    # -- lexicon + LM -------------------------------------------------------
    lex = os.path.join(tmp, "words.lex")
    with open(lex, "w") as fp:
        fp.writelines(f"{n} {n}\n" for n in names)
    corpus = os.path.join(tmp, "corpus.txt")
    with open(corpus, "w") as fp:
        for _ in range(40):
            k = rng.integers(2, 5)
            fp.write(" ".join(rng.choice(names, size=k)) + "\n")
    lm = os.path.join(tmp, "words.lm")
    cli("lm-train", corpus, lm, "--order", "2")

    # -- connected test utterances from held-out augmented copies -----------
    def gap_audio():
        g = gaps[rng.integers(len(gaps))]
        n = int(SR * rng.uniform(0.3, 0.5))
        reps = np.tile(g, -(-n // len(g)))[:n]
        return augment(reps, rng)

    total = {"err": 0, "n": 0}
    per_utt = []
    for u in range(4):
        truth = list(rng.choice(names, size=int(rng.integers(2, 5))))
        parts = [gap_audio()]
        for name in truth:
            parts.append(augment(words[names.index(name)], rng))
            parts.append(gap_audio())
        upath = os.path.join(tmp, f"utt{u}.pcm")
        write_pcm(upath, np.concatenate(parts))
        hyp = cli("recognize", upath, "--am", amdir, "--lex", lex,
                  "--lm", lm, "--lm-scale", "0.5",
                  "--word-penalty", "-8.0").split()
        d = wer_details(truth, hyp)
        total["err"] += d["sub"] + d["ins"] + d["del"]
        total["n"] += d["n_ref"]
        per_utt.append({"ref": " ".join(truth), "hyp": " ".join(hyp),
                        "wer": round(d["wer"], 4)})
        print(f"utt{u}: ref={' '.join(truth)!r} hyp={' '.join(hyp)!r} "
              f"wer={d['wer']:.2f}")

    overall = total["err"] / total["n"]
    print(f"\nWER report (real audio, {total['n']} ref words): "
          f"{overall:.3f}")
    main.last_report = {  # machine-readable record for bench_wer.py
        "wer": round(overall, 4),
        "n_ref_words": total["n"],
        "per_utt": per_utt,
        "vocab_words": len(words),
        "fixtures": FIXTURES,
        "config": {"seed": 0, "states": 8, "mix": 2, "iters": 8,
                   "lm_order": 2, "lm_scale": 0.5, "word_penalty": -8.0},
    }

    # -- N-best + trigram lattice rescoring on the last utterance -----------
    lm3 = os.path.join(tmp, "words3.lm")
    cli("lm-train", corpus, lm3, "--order", "3")
    cmd = [sys.executable, "-m", "lnasr_tpu.cli", "recognize", upath,
           "--am", amdir, "--lex", lex, "--lm", lm, "--lm-scale", "0.5",
           "--word-penalty", "-8.0", "--nbest", "3", "--rescore-lm", lm3]
    out = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    if out.returncode == 0:
        print("\ntrigram-rescored N-best (last utterance):")
        print(out.stderr.strip())
    return overall


if __name__ == "__main__":
    sys.exit(0 if main(*sys.argv[1:2]) <= 0.5 else 1)
