"""Model layer: frontend, acoustic models, language model, recognizer, apps."""

from lnasr_tpu.models.mfcc import MFCC, mfcc_features
from lnasr_tpu.models.hmm import HMM
from lnasr_tpu.models.gmmhmm import GMMHMM

__all__ = ["MFCC", "mfcc_features", "HMM", "GMMHMM"]
