"""Typed configuration dataclasses.

The reference exposes configuration only through constructor keyword
arguments (``lnasr/mfcc.py:23-48``, ``lnasr/gmmhmm.py:34-44``,
``third/vadlstd/VadLstd.py:24-41``); here every subsystem has a frozen,
hashable dataclass so configs can be closed over by ``jax.jit`` as static
arguments and round-tripped through checkpoints.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class MFCCConfig:
    """MFCC frontend geometry (matches the reference defaults,
    ``lnasr/mfcc.py:23-48``: 16 kHz, 25 ms frames, 10 ms stride, 512-pt FFT,
    40 mel filters, 12 cepstra + log-energy + deltas -> 39 dims).

    ``spectrum_method`` selects the STFT implementation:
      - ``"matmul"``: GEMM-native windowed DFT (two MXU matmuls) — the fast
        TPU path; numerically equal to the FFT path up to float rounding.
      - ``"fft"``: ``jnp.fft.rfft`` via the XLA FFT op.

    ``frontend`` selects the serving-path implementation used by
    :meth:`lnasr_tpu.models.mfcc.MFCC.features_fast` (and through it the
    recognizer and CLI):
      - ``"auto"``: the fused Pallas frontend on TPU backends, the XLA
        pipeline everywhere else;
      - ``"fused"``: always the Pallas kernel (interpret mode off-TPU —
        slow; for tests);
      - ``"xla"``: always the XLA pipeline.
    ``fused_passes`` is the split-bf16 MXU pass count of the fused DFT:
    6 (default) is f32-faithful — same pass count XLA issues for a
    HIGHEST-precision f32 matmul — and 3 is the fast benchmark setting
    (~2^-18 relative DFT error, visible only on near-silent frames).
    """

    sample_rate: int = 16000
    frame_t: float = 25e-3
    frame_stride: float = 10e-3
    preemph: float = 0.97
    fft_n: int = 512
    n_mels: int = 40
    n_ceps: int = 12
    spectrum_method: str = "matmul"
    frontend: str = "auto"
    fused_passes: int = 6
    # Replicate the reference's delta assembly exactly (its first delta row
    # duplicates the *second* feature row, ``lnasr/mfcc.py:162-172``).
    # "standard" uses delta[0] = features[1] - features[0] instead.
    delta_mode: str = "compat"
    # Floor for the per-frame total power before the log-energy feature.
    # 0.0 reproduces the reference exactly (log(0) = -inf on digital
    # silence, ``mfcc.py:159``); recognizers should set a small positive
    # floor so silent frames stay finite.
    energy_floor: float = 0.0
    # Per-utterance cepstral mean subtraction (``mfcc.py:151,156``). On by
    # default for reference parity; turn off for recognition pipelines
    # where training and decoding see different utterance contexts
    # (isolated-word training vs connected decoding) or for streaming.
    mean_norm: bool = True

    @property
    def frame_len(self) -> int:
        return int(self.sample_rate * self.frame_t)

    @property
    def frame_step(self) -> int:
        return int(self.sample_rate * self.frame_stride)

    @property
    def fft_size(self) -> int:
        return self.fft_n // 2 + 1

    @property
    def feature_dim(self) -> int:
        return (self.n_ceps + 1) * 3  # cepstra + log-energy, with Δ and ΔΔ


@dataclasses.dataclass(frozen=True)
class HMMConfig:
    """Discrete-emission HMM topology (states x symbols)."""

    n_states: int = 2
    n_symbols: int = 3


@dataclasses.dataclass(frozen=True)
class GMMHMMConfig:
    """Continuous GMM-HMM topology.

    ``cov_type`` is ``"diag"`` (TPU fast path; what production classical ASR
    uses) or ``"full"`` (parity with the reference's full-covariance math,
    ``lnasr/gmmhmm.py:28``).
    """

    n_states: int = 5
    n_mix: int = 8
    dim: int = 39
    cov_type: str = "diag"
    min_std: float = 0.01  # covariance ridge, as reference ``gmmhmm.py:44``
    # diag-covariance variance floor. ``var_floor`` is the absolute floor
    # (may be a per-dimension tuple); ``var_floor_scale`` > 0 resolves it
    # at data-driven init to ``max(var_floor, scale * per-dim data
    # variance)`` — the HTK/Kaldi-style relative floor. Without it, EM on
    # near-duplicated training frames (e.g. digital-silence prefixes)
    # collapses single dimensions to ~1e-3 variance, and one such state
    # prices its whole word out of the decoding search (measured: a
    # poisoned entry state cost ~2,300 nats per traversal, so silence
    # absorbed the word entirely). Scale sweep on the round-5 WER
    # protocol (clean/10 dB): 0.01 -> 0.19/0.57, 0.05 -> 0.032/0.19,
    # 0.1 -> 0.032/0.22, 0.2 -> 0.0/0.23 — a flat optimum 0.05-0.2;
    # 0.05 is the least-aggressive point on it (best 10 dB). Lower it
    # for large-data training where sharper per-state variances are
    # statistically supported.
    var_floor: object = 1e-3
    var_floor_scale: float = 0.05


@dataclasses.dataclass(frozen=True)
class NGramConfig:
    """Katz-backoff n-gram LM (``lnasr/ngram.py:114-254``).

    ``smoothing`` selects the discounting scheme:
      - ``"fixed"``: the reference's constant discount (``ngram.py:117,177-183``);
      - ``"good-turing"``: count-dependent Katz/Good-Turing discounts — the
        estimator the reference started but left unfinished
        (``ngram.py:185-200``, marked TODO). Counts ``r <= gt_max_count`` get
        ``d_r = (r*/r - A) / (1 - A)`` with ``r* = (r+1) N_{r+1} / N_r`` and
        ``A = (k+1) N_{k+1} / N_1``; larger counts are undiscounted. Orders
        whose count-of-counts are too sparse for Good-Turing fall back to the
        fixed discount.
    """

    order: int = 3
    discount: float = 0.7
    add_sentence_bounds: bool = True
    smoothing: str = "fixed"
    gt_max_count: int = 5
    # Open vocabulary: give the unigram level's freed discount mass to an
    # ``<unk>`` class so out-of-vocabulary words have a defined probability
    # (the reference raises KeyError on OOV, ``ngram.py:228-241``).
    open_vocab: bool = False


@dataclasses.dataclass(frozen=True)
class LTSDConfig:
    """Long-Term Spectral Divergence VAD (``third/vadlstd/VadLstd.py:24-41``)."""

    sample_rate: int = 16000
    win_size: int = 2048
    step_size: int = 1024
    order: int = 6
    threshold: float = -6.0
    alpha: Optional[float] = None

    @property
    def fft_size(self) -> int:
        return self.win_size // 2 + 1


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Logical device mesh. Axes:

    - ``data``: utterance batch (data parallelism; EM stats psum here)
    - ``seq``: time-chunk axis for long-audio associative-scan parallelism
    - ``model``: GMM component sharding when N*M*D exceeds one chip
    """

    data: int = 1
    seq: int = 1
    model: int = 1

    @property
    def axis_names(self) -> Tuple[str, ...]:
        return ("data", "seq", "model")

    @property
    def shape(self) -> Tuple[int, ...]:
        return (self.data, self.seq, self.model)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """EM training loop settings (convergence rule as ``lnasr/hmm.py:285-312``)."""

    max_iters: int = 100
    eps: float = 1e-4
    seed: int = 0
    checkpoint_every: int = 0  # 0 disables periodic checkpoints
    checkpoint_dir: Optional[str] = None
