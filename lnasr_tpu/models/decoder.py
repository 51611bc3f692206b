"""Connected-word decoding over a lexicon+LM-composed state graph.

This implements what the reference only sketches in its docs — the
``recognize`` flow "audio -> MFCC -> acoustic model -> lexicon -> language
model -> text" (``doc/source/basic.rst:14-21``) whose code is a stub
(``lnasr/recognizer.py:46-48``, ``lnasr/lexicon.py:17-18``).

Design (TPU-first): the lexicon composes each word into one left-to-right
GMM-HMM by concatenating its units' models; all words are then flattened
into a single dense composed state space with

  - within-unit transitions from the trained acoustic models,
  - unit->unit and word->word hops carrying a fixed exit penalty,
  - word->word hops additionally weighted by bigram LM scores (log10
    ARPA scores converted to nats) and a word-insertion penalty,
  - sentence-begin/end LM scores on the entry vector / final weights.

Decoding is then ONE dense Viterbi scan on device over the composed graph
(emission scoring for all composed states is a single fused GMM batch),
with host work limited to reading back the final state path. Dense
composition is the right regime for classical vocabularies (tens to
thousands of HMM states); the graph is built once on the host and reused
across utterances.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Dict, List, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lnasr_tpu.models.gmmhmm import GMMHMM
from lnasr_tpu.models.lexicon import Lexicon
from lnasr_tpu.models.ngram import NGramModel, BOS, EOS
from lnasr_tpu.ops.gaussian import gmm_emissions_diag, gmm_emissions_full
from lnasr_tpu.ops.trellis import viterbi_scan

_LN10 = math.log(10.0)


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    """Decoding knobs: LM weight, insertion penalty (both in nats), the
    fixed log-probability of leaving a unit's last state, and whether the
    graph loops (connected words) or is single-shot (isolated word)."""

    lm_scale: float = 1.0
    word_insertion_penalty: float = 0.0
    exit_logp: float = math.log(0.5)
    loop: bool = True


class DecodingGraph:
    """Dense composed decoding graph over a vocabulary of word HMMs."""

    def __init__(
        self,
        words: Sequence[str],
        log_a: np.ndarray,
        log_pi: np.ndarray,
        log_final: np.ndarray,
        state_word: np.ndarray,
        word_start: np.ndarray,
        word_end: np.ndarray,
        emission_params: Tuple[np.ndarray, np.ndarray, np.ndarray],
        cov_type: str,
        dtype=jnp.float32,
    ):
        self.words = list(words)
        self.dtype = dtype
        self.cov_type = cov_type
        self.log_a = jnp.asarray(log_a, dtype)
        self.log_pi = jnp.asarray(log_pi, dtype)
        self.log_final = jnp.asarray(log_final, dtype)
        self.state_word = np.asarray(state_word)
        self.word_start = np.asarray(word_start)
        self.word_end = np.asarray(word_end)
        log_w, mu, cov = emission_params
        self.log_w = jnp.asarray(log_w, dtype)
        self.mu = jnp.asarray(mu, dtype)
        self.cov = jnp.asarray(cov, dtype)

    # -- construction -------------------------------------------------------

    SILENCE = "<sil>"

    @classmethod
    def build(
        cls,
        lexicon: Lexicon,
        unit_models: Mapping[str, GMMHMM],
        lm: Optional[NGramModel] = None,
        config: DecoderConfig = DecoderConfig(),
        silence_model: Optional[GMMHMM] = None,
        dtype=jnp.float32,
    ) -> "DecodingGraph":
        """Compose the dense graph.

        ``unit_models`` maps each pronunciation unit to a trained
        :class:`GMMHMM` (all sharing mixture count and covariance type).
        ``lm`` must be at least a bigram model; when absent, word
        transitions are unweighted.

        ``silence_model`` adds an optional background pseudo-word to the
        loop: every word may be followed by silence, and silence may be
        followed by any word (scored with the LM's unigram level, since the
        word-history context is lost across silence). Utterances may start
        and end in silence; silence never appears in the output text.
        """
        words = sorted(lexicon.keys())
        lexicon = Lexicon({w: lexicon[w] for w in words})
        unit_models = dict(unit_models)
        if silence_model is not None:
            words = words + [cls.SILENCE]
            lexicon[cls.SILENCE] = (cls.SILENCE,)
            unit_models[cls.SILENCE] = silence_model
        some_model = next(iter(unit_models.values()))
        m_mix, dim = some_model.m, some_model.d
        cov_type = some_model.config.cov_type

        # per-word concatenated state metadata
        state_word: List[int] = []
        blocks: List[Tuple[str, GMMHMM, int]] = []  # (unit, model, word_idx)
        word_first: List[int] = []
        word_last: List[int] = []
        offset = 0
        for wi, word in enumerate(words):
            word_first.append(offset)
            for unit in lexicon[word]:
                model = unit_models[unit]
                blocks.append((unit, model, wi))
                state_word.extend([wi] * model.n)
                offset += model.n
            word_last.append(offset - 1)
        n_states = offset
        state_word_arr = np.asarray(state_word)
        word_start = np.zeros(n_states, bool)
        word_end = np.zeros(n_states, bool)
        word_start[np.asarray(word_first)] = True
        word_end[np.asarray(word_last)] = True

        # emissions: stack per-state mixture parameters
        log_w = np.concatenate([np.asarray(m.log_w, np.float64) for _, m, _ in blocks])
        mu = np.concatenate([np.asarray(m.mu, np.float64) for _, m, _ in blocks])
        cov = np.concatenate([np.asarray(m.cov, np.float64) for _, m, _ in blocks])

        # transitions
        log_a = np.full((n_states, n_states), -np.inf)
        pos = 0
        unit_entries: List[int] = []  # entry state of each block
        for _, model, _ in blocks:
            n = model.n
            log_a[pos : pos + n, pos : pos + n] = np.asarray(model.log_a, np.float64)
            unit_entries.append(pos)
            pos += n
        # unit -> next unit within a word
        pos = 0
        for bi, (_, model, wi) in enumerate(blocks):
            n = model.n
            last = pos + n - 1
            nxt = bi + 1
            if nxt < len(blocks) and blocks[nxt][2] == wi:
                log_a[last, unit_entries[nxt]] = config.exit_logp
            pos += n

        # word -> word transitions (bigram LM) and entry/final weights
        log_pi = np.full(n_states, -np.inf)
        log_final = np.full(n_states, -np.inf)
        n_real = sum(1 for w in words if w != cls.SILENCE)

        def lm_score(word: str, prev: str) -> float:
            # ARPA scores are log10; decoding runs in nats
            if lm is None:
                return -math.log(n_real)
            return config.lm_scale * _LN10 * lm.logprob(word, (prev,))

        def lm_unigram(word: str) -> float:
            if lm is None:
                return -math.log(n_real)
            node = lm
            while node.backoff is not None:
                node = node.backoff
            return config.lm_scale * _LN10 * node.logprob(word, ())

        has_eos = lm is not None and _has_eos(lm)
        for wi, word in enumerate(words):
            entry, last = word_first[wi], word_last[wi]
            if word == cls.SILENCE:
                log_pi[entry] = 0.0
                log_final[last] = 0.0
            else:
                log_pi[entry] = lm_score(word, BOS)
                log_final[last] = lm_score(EOS, word) if has_eos else 0.0
            if not config.loop:
                continue
            for vj, nxt in enumerate(words):
                if nxt == cls.SILENCE:
                    if word != cls.SILENCE:
                        log_a[last, word_first[vj]] = config.exit_logp
                elif word == cls.SILENCE:
                    # history is lost across silence: back off to unigram
                    log_a[last, word_first[vj]] = (
                        config.exit_logp + lm_unigram(nxt)
                        + config.word_insertion_penalty
                    )
                else:
                    log_a[last, word_first[vj]] = (
                        config.exit_logp + lm_score(nxt, word)
                        + config.word_insertion_penalty
                    )

        return cls(
            words, log_a, log_pi, log_final, state_word_arr, word_start, word_end,
            (log_w, mu, cov), cov_type, dtype,
        )

    @property
    def n_states(self) -> int:
        return len(self.state_word)

    # -- decoding -----------------------------------------------------------

    @functools.cached_property
    def _decode_fn(self):
        cov_type = self.cov_type

        def fn(obs, log_a, log_pi, log_final, log_w, mu, cov):
            if cov_type == "diag":
                log_b, _ = gmm_emissions_diag(obs, log_w, mu, cov)
            else:
                log_b, _ = gmm_emissions_full(obs, log_w, mu, cov)
            res = viterbi_scan(log_pi, log_a, log_b, log_final=log_final)
            return res.path, res.score

        return jax.jit(fn)

    def decode(self, features) -> Tuple[List[str], np.ndarray, float]:
        """Viterbi over the composed graph.

        Returns (word sequence, per-frame composed-state path, score).
        Word instances are recovered from the path: a new word starts at
        frame 0 and at every entry-state arrival from a word-final state
        or another word.
        """
        obs = jnp.asarray(features, self.dtype)
        path, score = self._decode_fn(
            obs, self.log_a, self.log_pi, self.log_final,
            self.log_w, self.mu, self.cov,
        )
        path = np.asarray(path)
        words_out = self._path_to_words(path)
        return words_out, path, float(score)

    def _path_to_words(self, path: np.ndarray) -> List[str]:
        out = [self.words[self.state_word[path[0]]]]
        for t in range(1, len(path)):
            s_prev, s = path[t - 1], path[t]
            if s == s_prev:
                continue
            if self.word_start[s] and (
                self.state_word[s] != self.state_word[s_prev]
                or self.word_end[s_prev]
            ):
                out.append(self.words[self.state_word[s]])
        return [w for w in out if w != self.SILENCE]


def _has_eos(lm: NGramModel) -> bool:
    node = lm
    while node is not None:
        if any(EOS in ng for ng in node.prob):
            return True
        node = node.backoff
    return False
