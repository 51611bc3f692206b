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
