"""Core array ops: numerics, framing, spectral transforms, trellis scans."""

from lnasr_tpu.ops.numerics import logsumexp, log_matvec, log_matmul
from lnasr_tpu.ops.framing import (
    num_frames,
    pad_length,
    preemphasis,
    split_frames,
    hamming_window,
)
from lnasr_tpu.ops.spectral import (
    mel_from_hz,
    hz_from_mel,
    mel_filterbank,
    power_spectrum,
    dct2_ortho_matrix,
)
from lnasr_tpu.ops.trellis import (
    forward_scan,
    backward_scan,
    viterbi_scan,
    forward_assoc,
    posteriors,
)

__all__ = [
    "logsumexp",
    "log_matvec",
    "log_matmul",
    "num_frames",
    "pad_length",
    "preemphasis",
    "split_frames",
    "hamming_window",
    "mel_from_hz",
    "hz_from_mel",
    "mel_filterbank",
    "power_spectrum",
    "dct2_ortho_matrix",
    "forward_scan",
    "backward_scan",
    "viterbi_scan",
    "forward_assoc",
    "posteriors",
]
