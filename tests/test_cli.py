"""CLI end-to-end: train-am -> recognize reproduces a transcript + WER
report from files alone — the workflow the reference never shipped (no CLI
anywhere; ``Recognizer.recognize`` is a stub, ``lnasr/recognizer.py:46-48``).

``examples/real_audio_demo.py`` runs the same flow on the reference's real
recordings; this test keeps the suite fast with synthetic words.
"""

import re
import numpy as np
import pytest

from lnasr_tpu.cli import main as cli_main
from lnasr_tpu.utils.audio import write_pcm

SR = 16000
WORD_F0 = {"low": 220.0, "mid": 560.0, "high": 1400.0}


def _word_audio(word, rng, dur=0.3):
    n = int(SR * dur)
    t = np.arange(n) / SR
    f0 = WORD_F0[word] * (1.0 + 0.01 * rng.normal())
    sig = sum(np.sin(2 * np.pi * k * f0 * t + rng.uniform(0, 2 * np.pi)) / k
              for k in range(1, 4))
    x = (sig * np.hanning(n) * 0.3 + rng.normal(0, 0.01, n)) * 12000
    return np.clip(x, -32768, 32767).astype(np.int16)


def _gap(rng, dur):
    return rng.normal(0, 60.0, int(SR * dur)).astype(np.int16)


@pytest.fixture(scope="module")
def cli_models(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(3)

    lines = []
    for w in WORD_F0:
        for k in range(4):
            p = tmp / f"{w}{k}.pcm"
            write_pcm(str(p), _word_audio(w, rng))
            lines.append(f"{w}\t{p}")
    for k in range(3):
        p = tmp / f"sil{k}.pcm"
        write_pcm(str(p), _gap(rng, 0.4))
        lines.append(f"<sil>\t{p}")
    manifest = tmp / "train.manifest"
    manifest.write_text("\n".join(lines) + "\n")

    amdir = tmp / "am"
    rc = cli_main(["train-am", str(manifest), str(amdir),
                   "--states", "3", "--mix", "2", "--iters", "5"])
    assert rc == 0

    lex = tmp / "words.lex"
    lex.write_text("".join(f"{w} {w}\n" for w in WORD_F0))
    corpus = tmp / "corpus.txt"
    corpus.write_text("low mid high\nhigh mid low\nlow high\nmid mid low\n")
    lm = tmp / "words.lm"
    assert cli_main(["lm-train", str(corpus), str(lm), "--order", "2"]) == 0
    return tmp, str(amdir), str(lex), str(lm), rng


def test_cli_recognize_reports_wer(cli_models, capsys):
    tmp, amdir, lex, lm, rng = cli_models
    truth = ["high", "low", "mid"]
    parts = [_gap(rng, 0.2)]
    for w in truth:
        parts += [_word_audio(w, rng), _gap(rng, 0.2)]
    upath = tmp / "utt.pcm"
    write_pcm(str(upath), np.concatenate(parts))

    rc = cli_main(["recognize", str(upath), "--am", amdir, "--lex", lex,
                   "--lm", lm, "--lm-scale", "0.5", "--word-penalty", "-40.0",
                   "--ref", " ".join(truth)])
    out = capsys.readouterr()
    assert rc == 0
    assert out.out.split() == truth
    assert "WER 0.000" in out.err


def test_cli_recognize_without_lm(cli_models, capsys):
    tmp, amdir, lex, _, rng = cli_models
    upath = tmp / "single.pcm"
    write_pcm(str(upath), np.concatenate(
        [_gap(rng, 0.2), _word_audio("mid", rng), _gap(rng, 0.2)]))
    rc = cli_main(["recognize", str(upath), "--am", amdir, "--lex", lex])
    assert rc == 0
    assert "mid" in capsys.readouterr().out.split()


def test_cli_train_am_empty_manifest(tmp_path, capsys):
    manifest = tmp_path / "empty.manifest"
    manifest.write_text("# nothing here\n")
    rc = cli_main(["train-am", str(manifest), str(tmp_path / "am")])
    assert rc == 1


def test_cli_recognize_nbest_with_rescoring(cli_models, capsys):
    """--nbest prints ranked alternatives on stderr. Rescoring the lattice
    with the SAME bigram LM must reproduce the plain decode (the rescoring
    objective equals the search objective); a trigram --rescore-lm also
    runs end-to-end."""
    tmp, amdir, lex, lm, rng = cli_models
    corpus = tmp / "corpus.txt"
    lm3 = tmp / "words3.lm"
    assert cli_main(["lm-train", str(corpus), str(lm3), "--order", "3"]) == 0
    capsys.readouterr()  # drop lm-train's report

    truth = ["low", "mid", "high"]
    parts = [_gap(rng, 0.2)]
    for w in truth:
        parts += [_word_audio(w, rng), _gap(rng, 0.2)]
    upath = tmp / "utt_nbest.pcm"
    write_pcm(str(upath), np.concatenate(parts))

    base = ["recognize", str(upath), "--am", amdir, "--lex", lex,
            "--lm", lm, "--lm-scale", "0.5", "--word-penalty", "-40.0"]
    assert cli_main(base) == 0
    plain = capsys.readouterr().out.split()

    # self-consistency: bigram rescoring keeps the search's 1-best
    rc = cli_main(base + ["--nbest", "3", "--rescore-lm", lm])
    out = capsys.readouterr()
    assert rc == 0
    assert out.out.split() == plain
    assert "#1" in out.err and "seg 0" in out.err

    # trigram rescoring runs end-to-end and ranks by score
    rc = cli_main(base + ["--nbest", "3", "--rescore-lm", str(lm3)])
    out = capsys.readouterr()
    assert rc == 0
    scores = [float(m) for m in
              re.findall(r"#\d+ (-?[\d.]+)", out.err)]
    assert scores == sorted(scores, reverse=True)


def test_cli_recognize_confidence(cli_models, capsys):
    """--confidence annotates every hypothesis word with a (0..1] posterior."""
    tmp, amdir, lex, lm, rng = cli_models
    upath = tmp / "conf.pcm"
    write_pcm(str(upath), np.concatenate(
        [_gap(rng, 0.2), _word_audio("high", rng), _gap(rng, 0.2)]))
    rc = cli_main(["recognize", str(upath), "--am", amdir, "--lex", lex,
                   "--lm", lm, "--lm-scale", "0.5",
                   "--word-penalty", "-40.0", "--confidence"])
    out = capsys.readouterr()
    assert rc == 0
    confs = [float(c) for c in re.findall(r"\((\d\.\d+)\)", out.err)]
    assert confs and all(0.0 <= c <= 1.0 for c in confs)
    assert len(confs) >= len(out.out.split())


def test_cli_8khz_train_and_recognize_roundtrip(tmp_path, capsys):
    """Review finding: the CLI read every input at 16 kHz regardless of
    the model's rate. An 8 kHz --sample-rate train-am + recognize
    roundtrip must carry the rate through ingest, am_config.json, the
    VAD guard, and decoding."""
    import json

    sr = 8000
    rng = np.random.default_rng(11)

    def tone(f0, dur=0.4):
        # harmonic burst (not a pure sine): gives the left-to-right
        # states distinct spectra so no state starves in training
        t = np.arange(int(sr * dur)) / sr
        sig = sum(np.sin(2 * np.pi * k * f0 * t) / k for k in (1, 2, 3))
        x = (sig * np.hanning(len(t)) * 0.3
             + rng.normal(0, 0.01, len(t))) * 12000
        return np.clip(x, -32768, 32767).astype(np.int16)

    lines = []
    for name, f0 in (("lo", 300.0), ("hi", 1100.0)):
        for k in range(4):
            p = tmp_path / f"{name}{k}.pcm"
            write_pcm(str(p), tone(f0 * (1 + 0.01 * rng.normal())))
            lines.append(f"{name}\t{p}")
    manifest = tmp_path / "m.txt"
    manifest.write_text("\n".join(lines) + "\n")

    am = str(tmp_path / "am8k")
    assert cli_main(["train-am", str(manifest), am, "--states", "3",
                     "--mix", "1", "--iters", "5",
                     "--sample-rate", str(sr)]) == 0
    meta = json.loads(open(f"{am}/am_config.json").read())
    assert meta["sample_rate"] == sr

    lex = tmp_path / "w.lex"
    lex.write_text("lo lo\nhi hi\n")
    for truth, f0 in (("hi", 1100.0), ("lo", 300.0)):
        utt = tmp_path / f"utt_{truth}.pcm"
        write_pcm(str(utt), tone(f0))
        assert cli_main(["recognize", str(utt), "--am", am,
                         "--lex", str(lex)]) == 0
        assert capsys.readouterr().out.strip().split()[-1] == truth

    # the 16 kHz-only AMR-WB detector must be rejected for an 8 kHz model
    assert cli_main(["recognize", str(utt), "--am", am, "--lex", str(lex),
                     "--vad", "amrwb"]) == 2  # utt is the last one written
    assert "16 kHz-only" in capsys.readouterr().err


def test_read_audio_headerless_fallback(tmp_path, capsys):
    """Extensionless headerless files fall back to the reference's raw
    16-bit PCM convention (with a warning) instead of erroring — the
    pre-magic-dispatch CLI behavior; compressed signatures still error."""
    import warnings

    from lnasr_tpu.utils.audio import read_audio

    raw = tmp_path / "capture.s16"
    data = (np.sin(np.arange(4000) * 0.05) * 10000).astype("<i2")
    data.tofile(str(raw))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        audio, rate = read_audio(str(raw))
    assert rate == 16000
    np.testing.assert_array_equal(audio, data)
    assert any("headerless" in str(x.message) for x in w)


def test_cli_mfcc_plot(tmp_path, speech_audio):
    """--plot writes a per-stage diagnostic PNG headlessly."""
    wav = tmp_path / "in.pcm"
    write_pcm(str(wav), np.asarray(speech_audio[:16000], np.int16))
    png = tmp_path / "stages.png"
    out = tmp_path / "feats.npy"
    rc = cli_main(["mfcc", str(wav), str(out), "--plot", str(png)])
    assert rc == 0
    assert png.stat().st_size > 10_000  # a real rendered figure
    assert np.load(out).shape[1] == 39


def test_cli_vad_plot(tmp_path, vad_audio):
    """--plot writes the decision-overlay PNG headlessly."""
    wav = tmp_path / "in.pcm"
    write_pcm(str(wav), np.asarray(vad_audio, np.int16))
    png = tmp_path / "vad.png"
    rc = cli_main(["vad", str(wav), "--plot", str(png)])
    assert rc == 0
    assert png.stat().st_size > 10_000


def test_cli_recognize_bucketed(cli_models, capsys):
    """--bucket-frames serving path through the CLI: same transcript."""
    tmp, amdir, lex, lm, rng = cli_models
    upath = tmp / "bucketed.pcm"
    write_pcm(str(upath), np.concatenate(
        [_gap(rng, 0.2), _word_audio("low", rng), _gap(rng, 0.2),
         _word_audio("high", rng), _gap(rng, 0.2)]))
    rc = cli_main(["recognize", str(upath), "--am", amdir, "--lex", lex,
                   "--lm", lm, "--lm-scale", "0.5"])
    assert rc == 0
    plain = capsys.readouterr().out.strip().splitlines()[-1]
    rc = cli_main(["recognize", str(upath), "--am", amdir, "--lex", lex,
                   "--lm", lm, "--lm-scale", "0.5",
                   "--bucket-frames", "64"])
    assert rc == 0
    bucketed = capsys.readouterr().out.strip().splitlines()[-1]
    assert bucketed == plain


def test_cli_train_am_plot(cli_models, tmp_path):
    """train-am --plot writes the mixture-ellipse inspection PNG
    headlessly (re-trains the tiny model with the flag)."""
    tmp, amdir, lex, lm, _ = cli_models
    png = tmp_path / "am.png"
    rc = cli_main(["train-am", str(tmp / "train.manifest"),
                   str(tmp_path / "am2"), "--states", "3", "--mix", "2",
                   "--iters", "2", "--plot", str(png)])
    assert rc == 0
    assert png.exists() and png.stat().st_size > 2000


def test_cli_recognize_plot(cli_models, tmp_path, capsys):
    """recognize --plot writes the decode-trellis heatmap PNG."""
    tmp, amdir, lex, lm, _ = cli_models
    rng = np.random.default_rng(9)
    utt = np.concatenate([_gap(rng, 0.25), _word_audio("mid", rng),
                          _gap(rng, 0.25)])
    wav = tmp_path / "utt.pcm"
    write_pcm(str(wav), utt)
    png = tmp_path / "decode.png"
    rc = cli_main(["recognize", str(wav), "--am", str(amdir),
                   "--lex", str(lex), "--lm", str(lm),
                   "--vad", "webrtc", "--plot", str(png)])
    assert rc == 0
    assert png.exists() and png.stat().st_size > 2000
