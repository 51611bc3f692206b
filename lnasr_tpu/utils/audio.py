"""Audio I/O (host side).

PCM convention matches the reference (``lnasr/utils.py:100-104``): mono,
16 kHz, 16-bit little-endian. WAV reading resamples with a polyphase
windowed-sinc filter (the quality class of the reference's librosa
resampler, ``lnasr/utils.py:90-98``) without the librosa dependency;
microphone capture is optional and gated on ``pyaudio`` being importable
(``lnasr/utils.py:51-88``).
"""

from __future__ import annotations

import math
import wave
from typing import Optional, Tuple

import numpy as np

SAMPLE_RATE = 16000


def read_pcm(filename: str) -> np.ndarray:
    """Raw PCM (mono / 16-bit / little-endian) as int16 samples."""
    with open(filename, "rb") as fp:
        return np.frombuffer(fp.read(), dtype="<i2")


def write_pcm(filename: str, data: np.ndarray) -> None:
    np.asarray(data, dtype="<i2").tofile(filename)


def resample(x: np.ndarray, sr_in: int, sr_out: int,
             half_taps: int = 32, beta: float = 8.6) -> np.ndarray:
    """Windowed-sinc (Kaiser) resampling to any rate.

    Anti-aliased: the kernel cutoff is ``min(sr_in, sr_out)/2``, so
    downsampling real 44.1 kHz material does not fold HF content into the
    band the MFCC frontend reads (the previous linear interpolation
    aliased; the reference delegates this to ``librosa.load``,
    ``lnasr/utils.py:90-98``). Evaluated directly at the exact rational
    output times — one gather + weighted sum per output sample,
    O(n_out * taps), float64.
    """
    x = np.asarray(x, np.float64)
    if sr_in == sr_out or len(x) == 0:
        return x.copy()
    g = math.gcd(int(sr_in), int(sr_out))
    up, down = sr_out // g, sr_in // g
    n_out = int(math.ceil(len(x) * up / down))
    # cutoff (in input-sample units) and kernel half-width; widen the
    # kernel when downsampling so the transition band stays proportional
    ratio = min(1.0, up / down)
    half_width = int(math.ceil(half_taps / ratio))
    # exact rational positions of output samples on the input grid
    pos_num = np.arange(n_out, dtype=np.int64) * down
    centers = pos_num // up                      # floor input index
    frac = (pos_num - centers * up) / up         # in [0, 1)
    offsets = np.arange(-half_width + 1, half_width + 1, dtype=np.int64)
    # t: signed distance (input samples) from each tap to the output time
    t = offsets[None, :] - frac[:, None]         # (n_out, taps)
    kernel = ratio * np.sinc(ratio * t)
    # Kaiser window evaluated at |t|/half_width
    w_arg = np.clip(t / half_width, -1.0, 1.0)
    kernel *= np.i0(beta * np.sqrt(1.0 - w_arg**2)) / np.i0(beta)
    idx = np.clip(centers[:, None] + offsets[None, :], 0, len(x) - 1)
    # zero taps that fall outside the signal instead of clamping them
    valid = ((centers[:, None] + offsets[None, :]) >= 0) & (
        (centers[:, None] + offsets[None, :]) < len(x)
    )
    return np.sum(np.where(valid, x[idx] * kernel, 0.0), axis=1)


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
    data = resample(data, sr, sample_rate)
    return (np.clip(data * 32768.0, -32768, 32767).astype(np.int16), sample_rate)


def write_wave(filename: str, data: np.ndarray, sample_rate: int = SAMPLE_RATE) -> None:
    with wave.open(filename, "wb") as fp:
        fp.setnchannels(1)
        fp.setsampwidth(2)
        fp.setframerate(sample_rate)
        fp.writeframes(np.asarray(data, dtype="<i2").tobytes())


def record(seconds: float, sample_rate: int = SAMPLE_RATE) -> np.ndarray:
    """Fixed-duration microphone capture (requires ``pyaudio``)."""
    with Recorder(sample_rate) as rec:
        import time

        time.sleep(seconds)
    return rec.samples()


class Recorder:
    """Interactive start/stop-controlled microphone capture, like the
    reference's key-controlled ``recording`` loop (``lnasr/utils.py:51-88``)
    but callback-driven: audio accumulates in the background between
    :meth:`start` and :meth:`stop`, so the caller decides when to stop
    (key press, VAD endpoint, UI event) without blocking on reads.

    Requires ``pyaudio``; also usable as a context manager::

        with Recorder() as rec:
            input("recording... press Enter to stop")
        audio = rec.samples()
    """

    def __init__(self, sample_rate: int = SAMPLE_RATE, chunk: int = 160):
        self.sample_rate = sample_rate
        self.chunk = chunk
        self._frames: list = []
        self._pa = None
        self._stream = None

    def start(self) -> "Recorder":
        import pyaudio  # noqa: deferred optional dependency

        if self._stream is not None:
            raise RuntimeError("already recording")
        self._frames = []
        self._pa = pyaudio.PyAudio()

        def _on_audio(in_data, frame_count, time_info, status):
            self._frames.append(in_data)
            return (None, pyaudio.paContinue)

        self._stream = self._pa.open(
            rate=self.sample_rate, channels=1, format=pyaudio.paInt16,
            input=True, frames_per_buffer=self.chunk,
            stream_callback=_on_audio,
        )
        self._stream.start_stream()
        return self

    def stop(self) -> np.ndarray:
        if self._stream is not None:
            self._stream.stop_stream()
            self._stream.close()
            self._stream = None
        if self._pa is not None:
            self._pa.terminate()
            self._pa = None
        return self.samples()

    def samples(self) -> np.ndarray:
        return np.frombuffer(b"".join(self._frames), dtype=np.int16)

    def __enter__(self) -> "Recorder":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()
