"""Word lattices, N-best extraction, and LM rescoring.

The scalable route to higher-order LM decoding: the factored bigram search
(:class:`~lnasr_tpu.models.decoder.FactoredDecodingGraph`) records, per
frame, each word's best exit score plus that token's span and predecessor
(:func:`~lnasr_tpu.models.decoder.factored_lattice_scan`). Those records
form a word lattice whose arcs decompose additively into

    pi_w[w_0] + ac_0 + sum_i (hop[w_{i-1}, w_i] + ac_i) + final_w[w_last]

where ``ac`` is a token's *predecessor-independent* acoustic score (the
within-word emission + transition mass over its span — exact, because the
recorded exit score subtracts back to the entry). N-best hypotheses come
from a k-best Viterbi over the token DAG, and any higher-order
:class:`~lnasr_tpu.models.ngram.NGramModel` can rescore them by swapping
the bigram hop scores for full-history ones.

This complements the exact history-expanded
:class:`~lnasr_tpu.models.decoder.TrigramDecodingGraph` (O(V^2*S) states):
lattice rescoring runs one O(V*S^2 + V^2) bigram pass plus host work that
is linear in lattice size, so trigram (or higher) LMs reach vocabularies
the expanded graph cannot.

The reference sketches exactly this search layering — acoustic pass then
language-model weighting (``doc/source/basic.rst:14-21``) — but its
``Recognizer.recognize`` was never built (``lnasr/recognizer.py:46-48``).
"""

from __future__ import annotations

import dataclasses
import heapq
import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from lnasr_tpu.models.ngram import BOS, EOS, NGramModel

_LN10 = math.log(10.0)
SILENCE = "<sil>"


def lm_conditional(lm: NGramModel, word: str, context: Tuple[str, ...]) -> float:
    """log10 P(word | context) at the LM level matching ``len(context)+1``
    (truncating longer contexts), so e.g. a one-word context against a
    trigram model scores with its bigram level rather than backing off
    through a missing trigram entry."""
    context = tuple(context[-(lm.order - 1):])
    return lm._level(len(context) + 1).logprob(word, context)


@dataclasses.dataclass(frozen=True)
class WordToken:
    """One word occurrence hypothesis: ``word_id`` spanning frames
    ``[start, end]`` with acoustic score ``ac`` (emissions + within-word
    transitions only; LM/penalty mass lives on the lattice arcs)."""

    word_id: int
    start: int
    end: int
    ac: float


@dataclasses.dataclass
class Hypothesis:
    """An N-best entry: surface words (silence removed), the underlying
    token sequence (silence included), the total path score, and (when
    requested) per-surface-word posterior confidences."""

    words: List[str]
    tokens: List[WordToken]
    score: float
    confidence: Optional[List[float]] = None


class WordLattice:
    """A DAG of :class:`WordToken` built from factored-search exit records.

    Its 1-best path reproduces the Viterbi decode; :meth:`nbest` extracts
    alternatives; :meth:`rescore` re-ranks them under a different (usually
    higher-order) LM using each token's acoustic score.
    """

    def __init__(
        self,
        words: Sequence[str],
        tokens: List[WordToken],
        hop: np.ndarray,
        log_pi_w: np.ndarray,
        log_final_w: np.ndarray,
        n_frames: int,
    ):
        self.words = list(words)
        self.tokens = tokens
        self.hop = hop
        self.log_pi_w = log_pi_w
        self.log_final_w = log_final_w
        self.n_frames = n_frames
        self._by_start: Dict[int, List[int]] = {}
        self._by_end: Dict[int, List[int]] = {}
        for i, tok in enumerate(tokens):
            self._by_start.setdefault(tok.start, []).append(i)
            self._by_end.setdefault(tok.end, []).append(i)

    # -- construction --------------------------------------------------------

    @classmethod
    def from_records(
        cls,
        words: Sequence[str],
        exit_score: np.ndarray,  # (T, V)
        exit_start: np.ndarray,  # (T, V) int
        exit_pred: np.ndarray,  # (T, V) int, -1 = sentence begin
        hop: np.ndarray,  # (V, V)
        log_pi_w: np.ndarray,  # (V,)
        log_final_w: np.ndarray,  # (V,)
        beam: float = 40.0,
        max_tokens_per_frame: Optional[int] = None,
    ) -> "WordLattice":
        """Convert per-frame exit records into word tokens.

        A record ``(t, v)`` becomes the token "word v spans
        ``[exit_start[t, v], t]``"; its acoustic score is the exit score
        minus the recorded entry mass (``pi_w`` at sentence begin, else
        the predecessor's exit score plus the bigram hop). Records outside
        ``beam`` nats of their frame's best, or beyond
        ``max_tokens_per_frame`` by rank, are pruned.
        """
        t_len, _ = exit_score.shape
        tokens: List[WordToken] = []
        for t in range(t_len):
            row = exit_score[t]
            finite = np.isfinite(row)
            if not finite.any():
                continue
            thresh = row[finite].max() - beam
            keep = np.flatnonzero(finite & (row >= thresh))
            if max_tokens_per_frame is not None and len(keep) > max_tokens_per_frame:
                keep = keep[np.argsort(row[keep])[::-1][:max_tokens_per_frame]]
            for v in keep:
                start = int(exit_start[t, v])
                pred = int(exit_pred[t, v])
                if pred < 0:
                    entry = log_pi_w[v]
                else:
                    entry = exit_score[start - 1, pred] + hop[pred, v]
                ac = float(row[v] - entry)
                if math.isfinite(ac):
                    tokens.append(WordToken(int(v), start, t, ac))
        return cls(words, tokens, hop, log_pi_w, log_final_w, t_len)

    def __len__(self) -> int:
        return len(self.tokens)

    # -- persistence ---------------------------------------------------------

    def save(self, filename: str) -> None:
        """Write the lattice as JSON (words, tokens, word-level scores) so
        decoding and rescoring can run in separate processes — decode once
        on device, rescore later with any LM on host."""
        import json

        payload = {
            "format": "lnasr_tpu-word-lattice-v1",
            "words": self.words,
            "n_frames": self.n_frames,
            "tokens": [
                [t.word_id, t.start, t.end, t.ac] for t in self.tokens
            ],
            "log_pi_w": self.log_pi_w.tolist(),
            "log_final_w": self.log_final_w.tolist(),
            "hop": self.hop.tolist(),
        }
        with open(filename, "w", encoding="utf-8") as fp:
            json.dump(payload, fp)

    @classmethod
    def load(cls, filename: str) -> "WordLattice":
        import json

        with open(filename, encoding="utf-8") as fp:
            payload = json.load(fp)
        if payload.get("format") != "lnasr_tpu-word-lattice-v1":
            raise ValueError(f"{filename}: not a lnasr_tpu word lattice")
        return cls(
            payload["words"],
            [WordToken(w, s, e, a) for w, s, e, a in payload["tokens"]],
            np.asarray(payload["hop"]),
            np.asarray(payload["log_pi_w"]),
            np.asarray(payload["log_final_w"]),
            int(payload["n_frames"]),
        )

    # -- N-best --------------------------------------------------------------

    def nbest(self, n: int, unique: bool = True) -> List[Hypothesis]:
        """k-best Viterbi over the token DAG.

        Tokens are processed in start-frame order; each keeps its ``n``
        best (score, predecessor) entries, combined from every token
        ending on the previous frame via the bigram ``hop``. With
        ``unique`` (default), hypotheses that render to the same word
        sequence are merged keeping the best-scoring one.
        """
        # entries[i] = list of (score, prev_token_index, prev_entry_rank)
        entries: List[List[Tuple[float, int, int]]] = [
            [] for _ in self.tokens
        ]
        for t in range(self.n_frames):
            for i in self._by_start.get(t, ()):
                tok = self.tokens[i]
                cand: List[Tuple[float, int, int]] = []
                if t == 0:
                    base = self.log_pi_w[tok.word_id]
                    if math.isfinite(base):
                        cand.append((float(base) + tok.ac, -1, -1))
                for j in self._by_end.get(t - 1, ()):
                    prev = self.tokens[j]
                    arc = self.hop[prev.word_id, tok.word_id]
                    if not math.isfinite(arc):
                        continue
                    for r, (s, _, _) in enumerate(entries[j]):
                        cand.append((s + float(arc) + tok.ac, j, r))
                entries[i] = heapq.nlargest(n, cand, key=lambda c: c[0])

        finals: List[Tuple[float, int, int]] = []
        for i in self._by_end.get(self.n_frames - 1, ()):
            tok = self.tokens[i]
            fin = self.log_final_w[tok.word_id]
            if not math.isfinite(fin):
                continue
            for r, (s, _, _) in enumerate(entries[i]):
                finals.append((s + float(fin), i, r))
        finals.sort(key=lambda c: -c[0])

        hyps: List[Hypothesis] = []
        seen: Dict[Tuple[str, ...], int] = {}
        for score, i, r in finals:
            toks: List[WordToken] = []
            while i >= 0:
                toks.append(self.tokens[i])
                _, i, r = entries[i][r]
            toks.reverse()
            surface = tuple(
                self.words[t.word_id]
                for t in toks
                if self.words[t.word_id] != SILENCE
            )
            if unique:
                if surface in seen:
                    continue
                seen[surface] = 1
            hyps.append(Hypothesis(list(surface), toks, float(score)))
            if len(hyps) >= n:
                break
        return hyps

    # -- posteriors / confidence ---------------------------------------------

    def posteriors(self) -> np.ndarray:
        """Token posterior probabilities by forward-backward over the DAG.

        ``fwd[i]`` sums (log-space) all paths from sentence start through
        token i; ``bwd[i]`` sums all completions after it; the posterior is
        ``exp(fwd + bwd - total)``. Every path enters at exactly one
        frame-0 token and leaves at exactly one final token, so posteriors
        of tokens starting at frame 0 sum to 1, as do those of tokens
        ending at the last frame (tested invariants).

        The mass is restricted to the paths present in the lattice (the
        usual lattice-posterior approximation): tighter beams concentrate
        it, ``beam=inf`` lattices carry everything the bigram search saw.
        """
        n = len(self.tokens)
        fwd = np.full(n, -np.inf)
        bwd = np.full(n, -np.inf)
        for t in range(self.n_frames):
            for i in self._by_start.get(t, ()):
                tok = self.tokens[i]
                acc = -np.inf
                if t == 0:
                    acc = self.log_pi_w[tok.word_id] + tok.ac
                for j in self._by_end.get(t - 1, ()):
                    arc = self.hop[self.tokens[j].word_id, tok.word_id]
                    acc = np.logaddexp(acc, fwd[j] + arc + tok.ac)
                fwd[i] = acc
        for t in range(self.n_frames - 1, -1, -1):
            for i in self._by_end.get(t, ()):
                tok = self.tokens[i]
                acc = -np.inf
                if t == self.n_frames - 1:
                    acc = self.log_final_w[tok.word_id]
                for j in self._by_start.get(t + 1, ()):
                    succ = self.tokens[j]
                    arc = self.hop[tok.word_id, succ.word_id]
                    acc = np.logaddexp(acc, arc + succ.ac + bwd[j])
                bwd[i] = acc
        total = -np.inf
        for i in self._by_end.get(self.n_frames - 1, ()):
            total = np.logaddexp(total, fwd[i] + self.log_final_w[
                self.tokens[i].word_id])
        with np.errstate(invalid="ignore"):
            post = np.exp(fwd + bwd - total)
        # float32 search scores can round a certain token to 1 + O(1e-4)
        return np.clip(np.nan_to_num(post, nan=0.0), 0.0, 1.0)

    def confidences(self, hypothesis: "Hypothesis",
                    post: Optional[np.ndarray] = None) -> List[float]:
        """Per-surface-word confidence for a hypothesis: the posterior mass
        of all lattice tokens carrying the same word whose span overlaps
        the hypothesis token's span (word-posterior confidence, clipped to
        1). Silence tokens are skipped, matching ``Hypothesis.words``.
        Pass precomputed :meth:`posteriors` to score many hypotheses."""
        if post is None:
            post = self.posteriors()
        out: List[float] = []
        for tok in hypothesis.tokens:
            if self.words[tok.word_id] == SILENCE:
                continue
            mass = 0.0
            for i, other in enumerate(self.tokens):
                if (
                    other.word_id == tok.word_id
                    and other.start <= tok.end
                    and other.end >= tok.start
                ):
                    mass += float(post[i])
            out.append(min(1.0, mass))
        return out

    # -- rescoring -----------------------------------------------------------

    def lm_path_score(
        self,
        tokens: Sequence[WordToken],
        lm: Optional[NGramModel],
        lm_scale: float = 1.0,
        word_insertion_penalty: float = 0.0,
        exit_logp: float = math.log(0.5),
        use_eos: Optional[bool] = None,
    ) -> float:
        """Total path score of a token sequence under ``lm`` with the
        decoder's composition rules, at the LM's full order:

        - first word scores ``P(w | <s>)``; a leading silence is free;
        - each later real word costs ``exit_logp + penalty +
          lm_scale * log P(w | history)`` with all available history;
        - entering silence costs ``exit_logp`` only, and crossing it
          truncates history to the one pre-silence word (the same rule the
          history-expanded graph uses);
        - sentence end adds ``P(</s> | history)`` when the LM has one.

        With a bigram LM this reproduces the lattice's own arc scores
        (parity-tested); with a trigram+ LM it is the rescoring objective.
        ``use_eos`` defaults to whether the LM models sentence end.
        """
        if use_eos is None and lm is not None:
            from lnasr_tpu.models.decoder import _has_eos

            use_eos = _has_eos(lm)
        scale = lm_scale * _LN10
        total = sum(t.ac for t in tokens)
        hist: Tuple[str, ...] = (BOS,)
        first = True
        for tok in tokens:
            w = self.words[tok.word_id]
            if w == SILENCE:
                if not first:
                    total += exit_logp
                # one word of history survives the gap
                hist = hist[-1:] if hist and hist[-1] != BOS else (BOS,)
                first = False
                continue
            if first:
                if lm is not None:
                    total += scale * lm_conditional(lm, w, (BOS,))
            else:
                total += exit_logp + word_insertion_penalty
                if lm is not None:
                    total += scale * lm_conditional(lm, w, hist)
            # <s> stays in the history so the second word scores
            # P(w2 | <s>, w1) at full order, as the expanded graph does
            hist = hist + (w,)
            first = False
        if lm is not None and use_eos and hist and hist[-1] != BOS:
            total += scale * lm_conditional(lm, EOS, hist)
        return float(total)

    def rescore(
        self,
        lm: NGramModel,
        n: int = 10,
        pool: Optional[int] = None,
        lm_scale: float = 1.0,
        word_insertion_penalty: float = 0.0,
        exit_logp: float = math.log(0.5),
        use_eos: Optional[bool] = None,
    ) -> List[Hypothesis]:
        """Re-rank the lattice's N-best under a (higher-order) LM.

        Extracts ``pool`` hypotheses (default ``4 * n``) with the lattice's
        bigram scores, rescores each with :meth:`lm_path_score`, and
        returns the top ``n`` by the new score.
        """
        hyps = self.nbest(pool or 4 * n, unique=True)
        rescored = [
            Hypothesis(
                h.words,
                h.tokens,
                self.lm_path_score(
                    h.tokens, lm, lm_scale, word_insertion_penalty,
                    exit_logp, use_eos,
                ),
            )
            for h in hyps
        ]
        rescored.sort(key=lambda h: -h.score)
        return rescored[:n]
