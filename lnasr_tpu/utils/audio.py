"""Audio I/O (host side).

PCM convention matches the reference (``lnasr/utils.py:100-104``): mono,
16 kHz, 16-bit little-endian. WAV I/O uses the stdlib ``wave`` module with
naive resampling by linear interpolation — unlike the reference we do not
depend on ``librosa``/``pyaudio``; microphone capture is optional and gated
on ``pyaudio`` being importable (``lnasr/utils.py:51-88``).
"""

from __future__ import annotations

import wave
from typing import Tuple

import numpy as np

SAMPLE_RATE = 16000


def read_pcm(filename: str) -> np.ndarray:
    """Raw PCM (mono / 16-bit / little-endian) as int16 samples."""
    with open(filename, "rb") as fp:
        return np.frombuffer(fp.read(), dtype="<i2")


def write_pcm(filename: str, data: np.ndarray) -> None:
    np.asarray(data, dtype="<i2").tofile(filename)


def _resample_linear(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    if sr_in == sr_out:
        return x
    n_out = int(round(len(x) * sr_out / sr_in))
    t_out = np.arange(n_out, dtype=np.float64) * (sr_in / sr_out)
    return np.interp(t_out, np.arange(len(x), dtype=np.float64), x)


def read_wave(filename: str, sample_rate: int = SAMPLE_RATE) -> Tuple[np.ndarray, int]:
    """Read a WAV file, downmix to mono, resample to ``sample_rate``, return
    (int16 samples, sample_rate)."""
    with wave.open(filename, "rb") as fp:
        n_ch = fp.getnchannels()
        width = fp.getsampwidth()
        sr = fp.getframerate()
        raw = fp.readframes(fp.getnframes())
    if width == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported sample width: {width}")
    if n_ch > 1:
        data = data.reshape(-1, n_ch).mean(axis=1)
    data = _resample_linear(data, sr, sample_rate)
    return (np.clip(data * 32768.0, -32768, 32767).astype(np.int16), sample_rate)


def write_wave(filename: str, data: np.ndarray, sample_rate: int = SAMPLE_RATE) -> None:
    with wave.open(filename, "wb") as fp:
        fp.setnchannels(1)
        fp.setsampwidth(2)
        fp.setframerate(sample_rate)
        fp.writeframes(np.asarray(data, dtype="<i2").tobytes())


def record(seconds: float, sample_rate: int = SAMPLE_RATE) -> np.ndarray:
    """Microphone capture (requires ``pyaudio``; mirrors ``utils.py:51-88``)."""
    import pyaudio  # noqa: deferred optional dependency

    chunk = 160
    pa = pyaudio.PyAudio()
    stream = pa.open(
        rate=sample_rate, channels=1, format=pyaudio.paInt16, input=True,
        frames_per_buffer=chunk,
    )
    frames = []
    for _ in range(int(sample_rate / chunk * seconds)):
        frames.append(stream.read(chunk))
    stream.stop_stream()
    stream.close()
    pa.terminate()
    return np.frombuffer(b"".join(frames), dtype=np.int16)
