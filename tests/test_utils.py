"""Aux subsystems: audio I/O, checkpoints, metrics logging, CLI."""

import json
import os
import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from lnasr_tpu.models.hmm import HMMParams
from lnasr_tpu.utils.audio import read_pcm, read_wave, write_pcm, write_wave
from lnasr_tpu.utils.checkpoints import (
    Checkpointer,
    TrainState,
    load_train_state,
    save_train_state,
)
from lnasr_tpu.utils.logging import MetricsLogger


def test_pcm_roundtrip(tmp_path):
    data = (np.random.default_rng(0).integers(-30000, 30000, 1000)).astype(np.int16)
    path = str(tmp_path / "x.pcm")
    write_pcm(path, data)
    np.testing.assert_array_equal(read_pcm(path), data)


def test_wave_roundtrip(tmp_path):
    data = (np.sin(np.arange(4000) * 0.05) * 20000).astype(np.int16)
    path = str(tmp_path / "x.wav")
    write_wave(path, data)
    loaded, sr = read_wave(path)
    assert sr == 16000
    np.testing.assert_array_equal(loaded, data)


def test_wave_resample(tmp_path):
    """A 8 kHz file upsamples to 16 kHz with doubled length."""
    import wave

    path = str(tmp_path / "8k.wav")
    data = (np.sin(np.arange(800) * 0.1) * 10000).astype("<i2")
    with wave.open(path, "wb") as fp:
        fp.setnchannels(1)
        fp.setsampwidth(2)
        fp.setframerate(8000)
        fp.writeframes(data.tobytes())
    loaded, sr = read_wave(path)
    assert sr == 16000
    assert abs(len(loaded) - 1600) <= 1


def test_resample_tone_preserved():
    """A 1 kHz tone survives 44.1 kHz -> 16 kHz with amplitude intact."""
    from lnasr_tpu.utils.audio import resample

    sr_in, sr_out, f = 44100, 16000, 1000.0
    t = np.arange(int(sr_in * 0.5)) / sr_in
    x = np.sin(2 * np.pi * f * t)
    y = resample(x, sr_in, sr_out)
    assert abs(len(y) - int(len(x) * sr_out / sr_in)) <= 1
    # compare against the exact tone at the output rate (skip kernel edges)
    t_out = np.arange(len(y)) / sr_out
    ref = np.sin(2 * np.pi * f * t_out)
    m = slice(200, len(y) - 200)
    assert np.max(np.abs(y[m] - ref[m])) < 1e-3


def test_resample_antialiasing():
    """Content above the output Nyquist must be rejected, not folded —
    the failure mode of the linear interpolation this replaces."""
    from lnasr_tpu.utils.audio import resample

    sr_in, sr_out = 44100, 16000
    t = np.arange(int(sr_in * 0.5)) / sr_in
    x = np.sin(2 * np.pi * 18000.0 * t)  # 18 kHz > 8 kHz output Nyquist
    y = resample(x, sr_in, sr_out)
    rms = np.sqrt(np.mean(y[200:-200] ** 2))
    assert rms < 0.01, f"aliased energy rms={rms}"  # vs 0.707 if folded

    # linear interpolation would fold it to 18-16=2... (visible): sanity
    lin = np.interp(np.arange(len(y)) * (sr_in / sr_out), np.arange(len(x)), x)
    assert np.sqrt(np.mean(lin[200:-200] ** 2)) > 0.1


def test_resample_identity_and_roundtrip():
    from lnasr_tpu.utils.audio import resample

    rng = np.random.default_rng(0)
    x = rng.normal(size=4000)
    np.testing.assert_array_equal(resample(x, 16000, 16000), x)
    # band-limit x to well under 8 kHz, then 16k -> 48k -> 16k ~ identity
    xb = resample(resample(x, 16000, 8000), 8000, 16000)  # <=4 kHz content
    y = resample(resample(xb, 16000, 48000), 48000, 16000)
    m = slice(100, -100)
    assert np.max(np.abs(y[m] - xb[m])) < 5e-3


def test_recorder_start_stop(monkeypatch):
    """Interactive capture: start() arms a callback stream, stop() returns
    the accumulated samples (fake pyaudio: no hardware in CI)."""
    import sys
    import types

    captured = {}

    class FakeStream:
        def __init__(self, cb):
            self._cb = cb

        def start_stream(self):
            for k in range(3):
                data = (np.full(160, k + 1, np.int16)).tobytes()
                self._cb(data, 160, None, None)

        def stop_stream(self):
            captured["stopped"] = True

        def close(self):
            pass

    class FakePyAudio:
        def open(self, **kw):
            return FakeStream(kw["stream_callback"])

        def terminate(self):
            captured["terminated"] = True

    fake = types.ModuleType("pyaudio")
    fake.PyAudio = FakePyAudio
    fake.paInt16 = 8
    fake.paContinue = 0
    monkeypatch.setitem(sys.modules, "pyaudio", fake)

    from lnasr_tpu.utils.audio import Recorder

    with Recorder() as rec:
        pass
    audio = rec.samples()
    assert len(audio) == 480
    assert captured["stopped"] and captured["terminated"]
    np.testing.assert_array_equal(np.unique(audio), [1, 2, 3])


def test_train_state_roundtrip(tmp_path):
    params = HMMParams(
        jnp.asarray(np.random.randn(3, 3)),
        jnp.asarray(np.random.randn(3, 5)),
        jnp.asarray(np.random.randn(3)),
    )
    path = str(tmp_path / "state.npz")
    save_train_state(path, TrainState(params, iteration=7, history=[-5.0, -4.2]))
    state = load_train_state(path, params)
    assert state.iteration == 7
    assert state.history == [-5.0, -4.2]
    np.testing.assert_allclose(np.asarray(state.params.log_a), np.asarray(params.log_a))
    np.testing.assert_allclose(np.asarray(state.params.log_b), np.asarray(params.log_b))


def test_checkpointer_resume(tmp_path):
    params = HMMParams(
        jnp.zeros((2, 2)), jnp.zeros((2, 3)), jnp.zeros((2,))
    )
    ckpt = Checkpointer(str(tmp_path / "run"), every=2)
    start, p, hist = ckpt.restore(params)
    assert start == 0 and hist == []
    assert not ckpt.maybe_save(1, params, [-1.0])
    assert ckpt.maybe_save(2, params, [-1.0, -0.5])
    start, p, hist = ckpt.restore(params)
    assert start == 2 and hist == [-1.0, -0.5]


def test_metrics_logger(tmp_path):
    path = str(tmp_path / "metrics.jsonl")
    with MetricsLogger(path) as log:
        log.write("em_step", iteration=0, loglik=-10.5)
        log.write("em_step", iteration=1, loglik=-9.1)
    lines = [json.loads(l) for l in open(path)]
    assert [l["iteration"] for l in lines] == [0, 1]
    assert lines[1]["loglik"] == -9.1
    assert lines[0]["event"] == "em_step"


def test_cli_lm_roundtrip(tmp_path):
    corpus = tmp_path / "corpus.txt"
    corpus.write_text("我 喜欢 苹果\n你 喜欢 香蕉\n", encoding="utf-8")
    lm_path = str(tmp_path / "out.lm")

    from lnasr_tpu.cli import main

    assert main(["lm-train", str(corpus), lm_path, "--order", "2"]) == 0
    assert os.path.exists(lm_path)
    assert main(["lm-ppl", lm_path, "我 喜欢 香蕉"]) == 0


def test_cli_mfcc(tmp_path, speech_audio):
    pcm = str(tmp_path / "in.pcm")
    out = str(tmp_path / "out.npy")
    np.asarray(speech_audio, "<i2").tofile(pcm)

    from lnasr_tpu.cli import main

    assert main(["mfcc", pcm, out]) == 0
    feats = np.load(out)
    assert feats.shape[1] == 39


# -- round-3: arbitrary-format audio ingest -----------------------------------


def _sine(sr, seconds=0.25, hz=440.0):
    t = np.arange(int(sr * seconds)) / sr
    return 0.5 * np.sin(2 * np.pi * hz * t)


def test_read_audio_float32_stereo_wav(tmp_path):
    """Float32 stereo WAV at a foreign rate (stdlib wave rejects float):
    read_audio must downmix, resample to 16 kHz, and match a direct
    Kaiser-sinc resample of the mono mix."""
    import struct

    from lnasr_tpu.utils.audio import read_audio, resample

    sr = 22050
    left, right = _sine(sr, hz=440.0), _sine(sr, hz=880.0)
    inter = np.empty(2 * len(left), np.float32)
    inter[0::2], inter[1::2] = left, right
    body = inter.astype("<f4").tobytes()
    hdr = struct.pack("<HHIIHH", 3, 2, sr, sr * 8, 8, 32)
    path = tmp_path / "f32.wav"
    with open(path, "wb") as fp:
        fp.write(b"RIFF" + struct.pack("<I", 4 + 8 + len(hdr) + 8 + len(body)))
        fp.write(b"WAVE" + b"fmt " + struct.pack("<I", len(hdr)) + hdr)
        fp.write(b"data" + struct.pack("<I", len(body)) + body)

    audio, rate = read_audio(str(path))
    assert rate == 16000 and audio.dtype == np.int16
    expect = resample((left + right) / 2.0, sr, 16000) * 32768.0
    assert audio.shape == expect.shape
    core = slice(100, -100)  # edges see the resampler's boundary taps
    np.testing.assert_allclose(audio[core], expect[core], atol=2.0)


def test_read_audio_24bit_wav(tmp_path):
    """24-bit PCM WAV (stdlib wave rejects it): signed values round-trip."""
    import struct

    from lnasr_tpu.utils.audio import read_audio

    sr = 16000
    vals = (np.asarray(_sine(sr)) * (2**23 - 1)).astype(np.int32)
    quads = vals.astype("<i4").view(np.uint8).reshape(-1, 4)
    body = quads[:, :3].tobytes()  # low 3 bytes = 24-bit little-endian
    hdr = struct.pack("<HHIIHH", 1, 1, sr, sr * 3, 3, 24)
    path = tmp_path / "p24.wav"
    with open(path, "wb") as fp:
        fp.write(b"RIFF" + struct.pack("<I", 4 + 8 + len(hdr) + 8 + len(body)))
        fp.write(b"WAVE" + b"fmt " + struct.pack("<I", len(hdr)) + hdr)
        fp.write(b"data" + struct.pack("<I", len(body)) + body)

    audio, _ = read_audio(str(path))
    expect = (vals / 2**23 * 32768.0)
    np.testing.assert_allclose(audio, np.clip(expect, -32768, 32767), atol=1.5)


def test_read_audio_aiff_and_au(tmp_path):
    """Big-endian AIFF and Sun AU parse natively (the formats the
    reference inherits from librosa/audioread)."""
    import struct

    from lnasr_tpu.utils.audio import read_audio

    sr = 16000
    pcm = (np.asarray(_sine(sr)) * 32767).astype(">i2")

    # AIFF: FORM/COMM (80-bit extended rate) / SSND
    mant = sr << 50  # 16000 = 1.953125 * 2^13 -> exponent 16383+13
    comm = struct.pack(">HIH", 1, len(pcm), 16) + struct.pack(
        ">HQ", 16383 + 13, mant
    )
    ssnd = struct.pack(">II", 0, 0) + pcm.tobytes()
    chunks = (b"COMM" + struct.pack(">I", len(comm)) + comm
              + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd)
    apath = tmp_path / "a.aiff"
    with open(apath, "wb") as fp:
        fp.write(b"FORM" + struct.pack(">I", 4 + len(chunks)) + b"AIFF")
        fp.write(chunks)
    audio, rate = read_audio(str(apath))
    assert rate == 16000
    np.testing.assert_allclose(audio, pcm.astype(np.int16), atol=1)

    # AU: 24-byte header, encoding 3 = 16-bit linear PCM
    upath = tmp_path / "a.au"
    with open(upath, "wb") as fp:
        fp.write(b".snd" + struct.pack(">IIIII", 24, len(pcm) * 2, 3, sr, 1))
        fp.write(pcm.tobytes())
    audio, _ = read_audio(str(upath))
    np.testing.assert_allclose(audio, pcm.astype(np.int16), atol=1)


def test_read_audio_pcm_and_unknown(tmp_path, speech_audio):
    from lnasr_tpu.utils.audio import read_audio, write_pcm

    p = tmp_path / "x.pcm"
    write_pcm(str(p), np.asarray(speech_audio)[:4000])
    audio, rate = read_audio(str(p))
    np.testing.assert_array_equal(audio, np.asarray(speech_audio)[:4000])

    bad = tmp_path / "x.mp3"
    bad.write_bytes(b"\xff\xfb\x90notarealmp3" * 4)
    with pytest.raises(ValueError, match="soundfile"):
        read_audio(str(bad))
