"""lnasr_tpu — a TPU-native classical ASR framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of the
``ln-asr`` reference toolkit (MFCC frontend, GMM-HMM acoustic modelling,
n-gram language modelling with ARPA I/O, VAD, and a composed recognizer),
built for TPU hardware: batched array programs under ``jit``, trellis
recursions as scans/Pallas kernels, data-parallel EM over a device mesh.

Layout:
    - :mod:`lnasr_tpu.ops`       — numerics, framing, spectral and trellis ops
    - :mod:`lnasr_tpu.models`    — MFCC, HMM, GMM-HMM, n-gram LM, lexicon,
      recognizer, word segmenter
    - :mod:`lnasr_tpu.vad`       — voice activity detection (JAX + native C++)
    - :mod:`lnasr_tpu.parallel`  — meshes, sharded EM training, collectives
    - :mod:`lnasr_tpu.utils`     — audio I/O, checkpoints, logging, profiling
"""

__version__ = "0.1.0"

from lnasr_tpu.config import (
    MFCCConfig,
    HMMConfig,
    GMMHMMConfig,
    NGramConfig,
    LTSDConfig,
    MeshConfig,
    TrainConfig,
)

__all__ = [
    "MFCCConfig",
    "HMMConfig",
    "GMMHMMConfig",
    "NGramConfig",
    "LTSDConfig",
    "MeshConfig",
    "TrainConfig",
    "__version__",
]
