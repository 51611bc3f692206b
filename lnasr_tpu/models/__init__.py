"""Model layer: frontend, acoustic models, language model, recognizer, apps."""

from lnasr_tpu.models.mfcc import MFCC, mfcc_features
from lnasr_tpu.models.hmm import HMM
from lnasr_tpu.models.gmmhmm import GMMHMM
from lnasr_tpu.models.lexicon import Lexicon
from lnasr_tpu.models.ngram import (
    NGramCounter,
    NGramModel,
    NGramModelARPA,
    Tokenizer,
)
from lnasr_tpu.models.decoder import (
    DecoderConfig,
    DecodingGraph,
    FactoredDecodingGraph,
    TrigramDecodingGraph,
)
from lnasr_tpu.models.lattice import Hypothesis, WordLattice, WordToken
from lnasr_tpu.models.recognizer import (
    AcousticModel,
    LanguageModel,
    Recognizer,
    train_unit_models,
)
from lnasr_tpu.models.seg import Seg, SegDataSet

__all__ = [
    "MFCC",
    "mfcc_features",
    "HMM",
    "GMMHMM",
    "Lexicon",
    "NGramCounter",
    "NGramModel",
    "NGramModelARPA",
    "Tokenizer",
    "DecoderConfig",
    "DecodingGraph",
    "FactoredDecodingGraph",
    "TrigramDecodingGraph",
    "Hypothesis",
    "WordLattice",
    "WordToken",
    "AcousticModel",
    "LanguageModel",
    "Recognizer",
    "train_unit_models",
    "Seg",
    "SegDataSet",
]
