"""Host-side utilities: audio I/O, checkpoints, logging, profiling."""

from lnasr_tpu.utils.audio import (
    Recorder, read_audio, read_pcm, read_wave, record, resample, write_pcm,
    write_wave,
)
from lnasr_tpu.utils.text import PUNCTUATION_ASCII, PUNCTUATION_UNICODE

__all__ = [
    "Recorder",
    "record",
    "resample",
    "read_audio",
    "read_pcm",
    "write_pcm",
    "read_wave",
    "write_wave",
    "PUNCTUATION_ASCII",
    "PUNCTUATION_UNICODE",
]
