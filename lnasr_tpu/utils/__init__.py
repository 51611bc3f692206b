"""Host-side utilities: audio I/O, checkpoints, logging, profiling."""

from lnasr_tpu.utils.audio import read_pcm, write_pcm, read_wave, write_wave
from lnasr_tpu.utils.text import PUNCTUATION_ASCII, PUNCTUATION_UNICODE

__all__ = [
    "read_pcm",
    "write_pcm",
    "read_wave",
    "write_wave",
    "PUNCTUATION_ASCII",
    "PUNCTUATION_UNICODE",
]
