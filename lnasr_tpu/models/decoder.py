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

Two graph realizations share the same composition semantics:

- :class:`DecodingGraph` — the dense form: one ``(n_states, n_states)``
  transition matrix, one Viterbi scan. Exact and simple; memory and
  per-frame work are O((V*s)^2), the right regime for small vocabularies
  and the parity oracle for the factored form.
- :class:`FactoredDecodingGraph` — the scalable form: states live on a
  ``(V, S)`` word-by-state grid; the within-word blocks are a batched
  ``(V, S, S)`` max-plus matvec and the word->word hop is a ``(V, V)``
  reduction over word-final scores — the low-rank structure the dense
  matrix hides. Memory and per-frame work are O(V*S^2 + V^2), so
  thousand-word vocabularies decode on-device.

Both build once on the host and are reused across utterances.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Dict, List, Mapping, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lnasr_tpu.models.gmmhmm import GMMHMM
from lnasr_tpu.models.lexicon import Lexicon
from lnasr_tpu.models.ngram import NGramModel, BOS, EOS
from lnasr_tpu.ops.gaussian import gmm_emissions_diag, gmm_emissions_full
from lnasr_tpu.ops.trellis import viterbi_scan


def dense_viterbi(log_pi, log_a, log_b, log_final=None, mask=None):
    """Dense-graph Viterbi dispatch: the in-VMEM Pallas kernel on TPU for
    float32 graphs that fit the VMEM budget (bit-identical to the scan),
    the ``lax.scan`` trellis otherwise. Masked (bucket-padded) decodes
    take the scan path, whose identity-step semantics cover them."""
    from lnasr_tpu.ops.trellis_pallas import (
        viterbi_dense_vmem_ok,
        viterbi_pallas_dense,
    )

    t_len, n = log_b.shape
    if (
        mask is None
        and log_b.dtype == jnp.float32
        and jax.default_backend() == "tpu"
        and viterbi_dense_vmem_ok(t_len, n)
    ):
        return viterbi_pallas_dense(log_pi, log_a, log_b, log_final)
    res = viterbi_scan(log_pi, log_a, log_b, mask=mask, log_final=log_final)
    return res.path, res.score

_LN10 = math.log(10.0)

SILENCE = "<sil>"


class HopFactors(NamedTuple):
    """Backoff-factored word-hop scores — the large-vocabulary form of the
    ``(V, V)`` hop matrix.

    A Katz-backoff bigram table is rank-1-plus-sparse by construction
    (``NGramModel.score_table``: ``alpha[i] + uni[j]`` overwritten at seen
    bigrams), so the max-plus word-hop reduction decomposes as

        entry[w] = max( max_v(exit[v] + from_w[v]) + uni[w],      # rank-1
                        max_k exit[pred[w, k]] + val[w, k] )      # sparse

    O(V + E) work and memory per frame instead of O(V^2) — the 100 MB/
    frame HBM stream a dense 5k-word hop costs simply does not exist.
    Semantics: seen-bigram arc scores are clamped to at least their own
    backoff estimate (``val >= from_w[src] + uni[dst]``), i.e. the
    standard WFST epsilon-backoff approximation ``max(explicit,
    backoff)``; the builder reports how many arcs the clamp changed
    (typically zero — discounted explicit probabilities normally exceed
    their backoff estimates) and exact parity with a same-clamped dense
    graph is tested.

    ``from_w``/``uni`` fold the exit penalty, LM scale and word-insertion
    penalty; silence (no LM score, no penalty, unigram rule out of the
    gap) rides ``sil_from``/``sil_idx``. ``pred``/``val`` are the
    per-destination predecessor lists padded to the max in-degree K.
    A NamedTuple of arrays: a pytree, so it flows through jit/vmap
    wherever the dense matrix did.
    """

    from_w: jax.Array  # (V,) per-source add-on (alpha' + exit + wip)
    uni: jax.Array  # (V,) per-destination add-on; -inf at silence
    sil_from: jax.Array  # (V,) score of entering silence; -inf rows if none
    sil_idx: jax.Array  # () int32 silence word id, -1 when absent
    pred: jax.Array  # (V, K) int32 seen-bigram predecessors (padded 0)
    val: jax.Array  # (V, K) clamped arc scores (padded -inf)


def _hop_entry(exit_v, hop):
    """Word-entry reduction ``entry[w] = max_v exit_v[v] + hop[v, w]`` with
    its argmax source — dense ``(V, V)`` matrix or :class:`HopFactors`.

    The factored argmax reproduces the dense first-index tie rule: the
    rank-1 family's achiever is ``argmax(base)`` (lowest index), the
    sparse family's is the lowest achieving predecessor, and the overall
    source is the minimum of the achieving families' sources."""
    if isinstance(hop, HopFactors):
        big = jnp.int32(hop.from_w.shape[0] + 1)
        base = exit_v + hop.from_w
        m1 = jnp.max(base)
        a1 = jnp.argmax(base).astype(jnp.int32)
        r1 = m1 + hop.uni  # (V,)
        cand = exit_v[hop.pred] + hop.val  # (V, K)
        sp = jnp.max(cand, axis=1)
        # pred rows are sorted by source id, so first-max = lowest
        # achieving source — the dense tie rule, one argmax
        ksel = jnp.argmax(cand, axis=1)
        sp_src = jnp.take_along_axis(hop.pred, ksel[:, None], axis=1)[:, 0]
        entry = jnp.maximum(r1, sp)
        esrc = jnp.minimum(
            jnp.where(r1 >= entry, a1, big),
            jnp.where(sp >= entry, sp_src, big),
        ).astype(jnp.int32)
        base2 = exit_v + hop.sil_from
        m2 = jnp.max(base2)
        a2 = jnp.argmax(base2).astype(jnp.int32)
        has_sil = hop.sil_idx >= 0
        sil = jnp.maximum(hop.sil_idx, 0)
        entry = jnp.where(has_sil, entry.at[sil].set(m2), entry)
        esrc = jnp.where(has_sil, esrc.at[sil].set(a2), esrc)
        return entry, esrc
    cand_hop = exit_v[:, None] + hop  # (V, V): [from, to]
    return (jnp.max(cand_hop, axis=0),
            jnp.argmax(cand_hop, axis=0).astype(jnp.int32))




def _word_lm_scores(
    words: Sequence[str],
    lm: Optional[NGramModel],
    config: "DecoderConfig",
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Word-level LM scores shared by the dense and factored graphs.

    Returns ``(log_pi_w, log_final_w, hop)`` in nats:

    - ``log_pi_w[i]``: sentence-begin score of starting in word i,
    - ``log_final_w[i]``: sentence-end weight at word i's final state,
    - ``hop[i, j]``: total weight of the word i -> word j transition
      (unit-exit penalty + scaled bigram LM + insertion penalty; the
      history-losing unigram rule for hops out of silence; silence is
      enterable from any real word and never self-loops).

    Vectorized through :meth:`NGramModel.score_table` — no per-pair
    recursive scoring (the round-1 builder's O(V^2) Python loop).
    """
    v = len(words)
    is_sil = np.array([w == SILENCE for w in words])
    real = [w for w in words if w != SILENCE]
    n_real = len(real)
    scale = config.lm_scale * _LN10

    if lm is None:
        flat = -math.log(n_real)
        pi_w = np.full(v, flat)
        final_w = np.zeros(v)
        hop = np.full((v, v), flat)
        uni = np.full(v, flat)
    else:
        tbl = scale * lm.score_table(list(words) + [BOS, EOS])
        pi_w = tbl[v, :v].copy()  # P(word | <s>)
        final_w = tbl[:v, v + 1].copy() if _has_eos(lm) else np.zeros(v)
        hop = tbl[:v, :v].copy()
        unigram = lm._level(1)
        uni = scale * np.array([unigram.logprob(w, ()) for w in words])

    # hops out of silence lose the word history: back off to unigram
    hop = np.where(is_sil[:, None], uni[None, :], hop)
    hop = hop + config.exit_logp + config.word_insertion_penalty
    # entering silence carries no LM score or insertion penalty
    hop[:, is_sil] = config.exit_logp
    hop[np.ix_(is_sil, is_sil)] = -np.inf  # silence never follows itself
    pi_w[is_sil] = 0.0
    final_w[is_sil] = 0.0
    return pi_w, final_w, hop


def _word_lm_factors(
    words: Sequence[str],
    lm: Optional[NGramModel],
    config: "DecoderConfig",
    max_in_degree: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray, "HopFactors", int]:
    """Backoff-factored equivalent of :func:`_word_lm_scores`: returns
    ``(log_pi_w, log_final_w, HopFactors-as-numpy, n_clamped)`` with the
    same composition semantics (silence unigram rule, free silence entry,
    no sil->sil hop) but O(V + E) memory — the (V, V) matrix is never
    materialized, on host or device. ``n_clamped`` counts seen bigram
    arcs whose explicit score fell below their own backoff estimate and
    was raised to it (the max-semantics approximation; normally zero)."""
    v = len(words)
    is_sil = np.array([w == SILENCE for w in words])
    real = [w for w in words if w != SILENCE]
    n_real = len(real)
    scale = config.lm_scale * _LN10
    add = config.exit_logp + config.word_insertion_penalty

    if lm is None:
        flat = -math.log(n_real)
        uni = np.full(v, flat)
        alpha = np.zeros(v)
        pi_w = np.full(v, flat)
        final_w = np.zeros(v)
        edges: List[Tuple[int, int, float]] = []
    else:
        if lm.order < 2:
            raise ValueError("hop factors require a bigram or higher model")
        bigram = lm._level(2)
        unigram = bigram.backoff
        idx = {w: i for i, w in enumerate(words)}
        uni = scale * np.array([unigram.logprob(w, ()) for w in words])
        alpha = scale * np.array(
            [bigram.prob_bo.get((w,), 0.0) for w in words]
        )
        tbl_bos_eos = scale * np.array(
            [[bigram.logprob(w, (BOS,)) for w in words],
             [bigram.logprob(EOS, (w,)) if _has_eos(lm) else 0.0
              for w in words]]
        )
        pi_w = tbl_bos_eos[0].copy()
        final_w = tbl_bos_eos[1].copy() if _has_eos(lm) else np.zeros(v)
        edges = []
        for ngram, p in bigram.prob.items():
            i, j = idx.get(ngram[0]), idx.get(ngram[1])
            if i is not None and j is not None and not (is_sil[i] or is_sil[j]):
                edges.append((i, j, scale * p + add))

    from_w = alpha + add
    from_w[is_sil] = add  # unigram rule out of silence (alpha plays no part)
    uni_dst = uni.copy()
    uni_dst[is_sil] = -np.inf  # silence entry rides sil_from instead
    sil_from = np.where(is_sil, -np.inf, config.exit_logp)
    sil_idx = int(np.flatnonzero(is_sil)[0]) if is_sil.any() else -1
    if sil_idx < 0:
        sil_from = np.full(v, -np.inf)
    pi_w = pi_w.copy()
    final_w = final_w.copy()
    pi_w[is_sil] = 0.0
    final_w[is_sil] = 0.0

    # per-destination predecessor lists, clamped to the backoff estimate
    n_clamped = 0
    by_dst: Dict[int, List[Tuple[int, float]]] = {}
    for i, j, val in edges:
        backoff = from_w[i] + uni_dst[j]
        if val < backoff:
            n_clamped += 1
            val = backoff
        by_dst.setdefault(j, []).append((i, val))
    if max_in_degree is not None:
        # standard LM arc pruning: keep each destination's best explicit
        # arcs; dropped arcs fall back to their alpha+unigram path (the
        # per-frame gather is O(V * K), so K caps the search cost)
        for j, plist in by_dst.items():
            if len(plist) > max_in_degree:
                plist.sort(key=lambda e: (-e[1], e[0]))
                del plist[max_in_degree:]
    k_max = max((len(p) for p in by_dst.values()), default=1)
    pred = np.zeros((v, k_max), np.int32)
    val_arr = np.full((v, k_max), -np.inf)
    for j, plist in by_dst.items():
        plist.sort()  # by source id: stable, reproducible layout
        for k, (i, val) in enumerate(plist):
            pred[j, k] = i
            val_arr[j, k] = val
    factors = HopFactors(
        from_w=from_w, uni=uni_dst, sil_from=sil_from,
        sil_idx=np.int32(sil_idx), pred=pred, val=val_arr,
    )
    return pi_w, final_w, factors, n_clamped


class HostBackoffHop:
    """Host-side (NumPy) accessor with dense-hop semantics over
    :class:`HopFactors` — what the word-lattice builder and N-best/
    posterior passes index instead of a ``(V, V)`` matrix. Lookups are
    O(in-degree) per destination via the same clamped max semantics the
    device search used, so lattice scores match the search exactly."""

    def __init__(self, factors: HopFactors):
        self.from_w = np.asarray(factors.from_w, np.float64)
        self.uni = np.asarray(factors.uni, np.float64)
        self.sil_from = np.asarray(factors.sil_from, np.float64)
        self.sil_idx = int(factors.sil_idx)
        self.pred = np.asarray(factors.pred)
        self.val = np.asarray(factors.val, np.float64)
        self.shape = (len(self.from_w), len(self.from_w))
        # per-destination sparse map for vectorized block lookups
        self._dst_map: Dict[int, Dict[int, float]] = {
            j: {
                int(s): float(x)
                for s, x in zip(self.pred[j], self.val[j])
                if np.isfinite(x)
            }
            for j in range(self.shape[0])
        }

    def block(self, rows: np.ndarray, cols: np.ndarray) -> np.ndarray:
        """Dense ``(len(rows), len(cols))`` hop block. ``rows`` may
        contain repeats (every occurrence gets its arc maxima, matching
        ``hop[np.ix_(rows, cols)]`` on the dense matrix)."""
        rows = np.asarray(rows)
        cols = np.asarray(cols)
        out = self.from_w[rows][:, None] + self.uni[cols][None, :]
        row_pos: Dict[int, List[int]] = {}
        for i, r in enumerate(rows):
            row_pos.setdefault(int(r), []).append(i)
        for cj, c in enumerate(cols):
            c = int(c)
            if c == self.sil_idx:
                out[:, cj] = self.sil_from[rows]
                continue
            for s, x in self._dst_map.get(c, {}).items():
                for i in row_pos.get(s, ()):
                    out[i, cj] = max(out[i, cj], x)
        return out

    def pair(self, src: int, dst: int) -> float:
        dst = int(dst)
        src = int(src)
        if dst == self.sil_idx:
            return float(self.sil_from[src])
        base = float(self.from_w[src] + self.uni[dst])
        return max(base, self._dst_map.get(dst, {}).get(src, -np.inf))

    def dense(self) -> np.ndarray:
        """Materialize the full matrix (tests / small-V tooling only)."""
        v = self.shape[0]
        return self.block(np.arange(v), np.arange(v))


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
        :class:`GMMHMM` (sharing covariance type and feature dim;
        mixture counts may differ per unit — padded internally).
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

        # emissions: stack per-state mixture parameters (mixture counts may
        # differ per unit; padded to the largest M)
        log_w, mu, cov = _stack_mixture_params(
            [np.asarray(m.log_w, np.float64) for _, m, _ in blocks],
            [np.asarray(m.mu, np.float64) for _, m, _ in blocks],
            [np.asarray(m.cov, np.float64) for _, m, _ in blocks],
            cov_type,
        )

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

        # word -> word transitions (bigram LM) and entry/final weights —
        # the shared word-level scores, scattered into the dense matrix
        log_pi = np.full(n_states, -np.inf)
        log_final = np.full(n_states, -np.inf)
        pi_w, final_w, hop = _word_lm_scores(words, lm, config)
        first_arr, last_arr = np.asarray(word_first), np.asarray(word_last)
        log_pi[first_arr] = pi_w
        log_final[last_arr] = final_w
        if config.loop:
            # leave the (silence, silence) arc to the silence model itself
            sil = np.array([w == cls.SILENCE for w in words])
            block = log_a[np.ix_(last_arr, first_arr)]
            log_a[np.ix_(last_arr, first_arr)] = np.where(
                np.outer(sil, sil), block, hop
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

        def fn(obs, mask, log_a, log_pi, log_final, log_w, mu, cov):
            if cov_type == "diag":
                log_b, _ = gmm_emissions_diag(obs, log_w, mu, cov)
            else:
                log_b, _ = gmm_emissions_full(obs, log_w, mu, cov)
            return dense_viterbi(log_pi, log_a, log_b, log_final, mask)

        return jax.jit(fn)

    def decode(self, features,
               mask=None) -> Tuple[List[str], np.ndarray, float]:
        """Viterbi over the composed graph.

        Returns (word sequence, per-frame composed-state path, score).
        Word instances are recovered from the path: a new word starts at
        frame 0 and at every entry-state arrival from a word-final state
        or another word. ``mask (T,)`` marks valid frames for
        shape-bucketed (padded) decoding.
        """
        obs = jnp.asarray(features, self.dtype)
        if mask is not None:
            mask = jnp.asarray(mask, bool)
        path, score = jax.device_get(self.decode_arrays(obs, mask))
        words_out = self._path_to_words(path)
        return words_out, path, float(score)

    def decode_arrays(self, obs, mask):
        """Traceable decode core: ``(feats (T, N_feat), mask) -> (path,
        score)`` device arrays — composable under an outer ``jit`` (the
        recognizer fuses the MFCC frontend and this into ONE dispatch
        per serving call)."""
        return self._decode_fn(
            obs, mask, self.log_a, self.log_pi, self.log_final,
            self.log_w, self.mu, self.cov,
        )

    def path_to_alignment(self, path: np.ndarray,
                          n_frames: Optional[int] = None,
                          ) -> List[Tuple[str, int, int]]:
        """Word-level time alignment of a decoded state path:
        ``(word, start_frame, end_frame)`` per word instance (frames
        inclusive; silence instances dropped, like the word output).
        ``n_frames`` clips the final span for masked (shape-bucketed)
        decodes, whose padded tail frames self-point. The reference
        never decoded at all; word timing is table stakes for a serving
        recognizer."""
        ids = [int(self.state_word[path[0]])]
        starts = [0]
        for t in range(1, len(path)):
            s_prev, s = path[t - 1], path[t]
            if s == s_prev:
                continue
            if self.word_start[s] and (
                self.state_word[s] != self.state_word[s_prev]
                or self.word_end[s_prev]
            ):
                ids.append(int(self.state_word[s]))
                starts.append(t)
        return _assemble_alignment(self.words, ids, starts,
                                   n_frames or len(path))

    def _path_to_words(self, path: np.ndarray) -> List[str]:
        return [w for w, _, _ in self.path_to_alignment(path)]


def _assemble_alignment(
    words: Sequence[str], ids: List[int], starts: List[int], t_len: int
) -> List[Tuple[str, int, int]]:
    """Word-instance spans from entry frames: each instance runs to the
    frame before the next entry (the last to the final frame); silence
    instances are dropped after the spans are fixed."""
    out = []
    for k, (wid, a) in enumerate(zip(ids, starts)):
        b = (starts[k + 1] - 1) if k + 1 < len(starts) else t_len - 1
        if words[wid] != SILENCE:
            out.append((words[wid], a, b))
    return out


def _has_eos(lm: NGramModel) -> bool:
    node = lm
    while node is not None:
        if any(EOS in ng for ng in node.prob):
            return True
        node = node.backoff
    return False


def _compose_words(
    lexicon: Lexicon,
    unit_models: Mapping[str, GMMHMM],
    silence_model: Optional[GMMHMM],
    exit_logp: float,
):
    """Per-word composition shared by the factored graphs: concatenate each
    word's unit HMMs into one ``(S_w, S_w)`` log-transition block (with
    unit->unit exit hops) and stack all real states' emission parameters.

    Returns ``(words, blocks, emission_params, state_offsets)`` where
    ``blocks[v]`` is word v's numpy transition block, ``emission_params``
    are the stacked ``(log_w, mu, cov)`` over all real states in word-major
    order, and ``state_offsets[v]`` is word v's first row in that stack.
    """
    words = sorted(lexicon.keys())
    lexicon = Lexicon({w: lexicon[w] for w in words})
    unit_models = dict(unit_models)
    if silence_model is not None:
        words = words + [SILENCE]
        lexicon[SILENCE] = (SILENCE,)
        unit_models[SILENCE] = silence_model

    blocks: List[np.ndarray] = []
    log_w_parts, mu_parts, cov_parts = [], [], []
    state_offsets: List[int] = []
    offset = 0
    for word in words:
        models = [unit_models[u] for u in lexicon[word]]
        sizes = [m.n for m in models]
        s_w = sum(sizes)
        block = np.full((s_w, s_w), -np.inf)
        pos = 0
        for k, m in enumerate(models):
            n = m.n
            block[pos : pos + n, pos : pos + n] = np.asarray(m.log_a, np.float64)
            if k + 1 < len(models):
                block[pos + n - 1, pos + n] = exit_logp
            log_w_parts.append(np.asarray(m.log_w, np.float64))
            mu_parts.append(np.asarray(m.mu, np.float64))
            cov_parts.append(np.asarray(m.cov, np.float64))
            pos += n
        blocks.append(block)
        state_offsets.append(offset)
        offset += s_w
    cov_type = next(iter(unit_models.values())).config.cov_type
    emission_params = _stack_mixture_params(
        log_w_parts, mu_parts, cov_parts, cov_type
    )
    return words, blocks, emission_params, state_offsets


def _stack_mixture_params(log_w_parts, mu_parts, cov_parts, cov_type):
    """Stack per-unit ``(N_i, M_i[, D, ...])`` mixture parameters along the
    state axis, padding the mixture axis to the largest ``M`` with
    log-weight ``-inf`` dummy components (zero mean, unit variance /
    identity covariance — finite under the scorer, annihilated by the
    weight). Units may therefore use different mixture counts — e.g. a
    stationary few-state/many-mixture silence model next to left-to-right
    word models."""
    m_max = max(w.shape[1] for w in log_w_parts)
    ws, ms, cs = [], [], []
    for w, mu, cov in zip(log_w_parts, mu_parts, cov_parts):
        pad = m_max - w.shape[1]
        if pad:
            w = np.pad(w, ((0, 0), (0, pad)), constant_values=-np.inf)
            mu = np.pad(mu, ((0, 0), (0, pad), (0, 0)))
            if cov_type == "diag":
                cov = np.pad(cov, ((0, 0), (0, pad), (0, 0)),
                             constant_values=1.0)
            else:
                d = cov.shape[-1]
                eye = np.broadcast_to(
                    np.eye(d), (cov.shape[0], pad, d, d)
                )
                cov = np.concatenate([cov, eye], axis=1)
        ws.append(w)
        ms.append(mu)
        cs.append(cov)
    return np.concatenate(ws), np.concatenate(ms), np.concatenate(cs)


def _factored_grid_inputs(obs, log_pi_w, log_final_w, exit_idx, state_map,
                          pad_mask, log_w, mu, cov, cov_type):
    """Shared decode inputs: grid emissions ``(T, V, S)``, initial grid,
    termination grid."""
    v_words, s_max = state_map.shape
    if cov_type == "diag":
        log_b_real, _ = gmm_emissions_diag(obs, log_w, mu, cov)
    else:
        log_b_real, _ = gmm_emissions_full(obs, log_w, mu, cov)
    log_b = jnp.where(pad_mask[None], log_b_real[:, state_map], -jnp.inf)
    pi_grid = jnp.full((v_words, s_max), -jnp.inf, log_b.dtype)
    pi_grid = pi_grid.at[:, 0].set(log_pi_w.astype(log_b.dtype))
    final_grid = jnp.where(
        jnp.arange(s_max)[None, :] == exit_idx[:, None],
        log_final_w[:, None].astype(log_b.dtype),
        -jnp.inf,
    )
    return log_b, pi_grid, final_grid


def factored_trellis_scan(log_b, inner_a, hop, pi_grid, final_grid, exit_idx,
                          mask=None):
    """Reference lax.scan trellis over the factored grid: ``(T, V, S)``
    emissions -> ``(path (T,) int32 in v*S+s ids, score)``. ``hop=None``
    disables the word loop. Masked frames carry the identity operator
    (grid unchanged, self backpointers), so a padded decode equals the
    unpadded one — the basis of shape-bucketed serving."""
    t_len, v_words, s_max = log_b.shape
    loop = hop is not None
    word_base = jnp.arange(v_words, dtype=jnp.int32)[:, None] * s_max
    self_ids = word_base + jnp.arange(s_max, dtype=jnp.int32)[None, :]

    def step(vgrid, inputs):
        log_b_t, valid = inputs
        cand_in = vgrid[:, :, None] + inner_a  # (V, S, S) over pred s
        within = jnp.max(cand_in, axis=1)
        wsrc = jnp.argmax(cand_in, axis=1).astype(jnp.int32)
        bt = word_base + wsrc  # global grid ids (V, S)
        if loop:
            exit_v = jnp.take_along_axis(
                vgrid, exit_idx[:, None].astype(jnp.int32), axis=1
            )[:, 0]
            entry, esrc = _hop_entry(exit_v, hop)  # dense or backoff-factored
            hop_wins = entry > within[:, 0]
            within = within.at[:, 0].set(jnp.maximum(within[:, 0], entry))
            bt_entry = jnp.where(
                hop_wins,
                esrc * s_max + exit_idx[esrc].astype(jnp.int32),
                bt[:, 0],
            )
            bt = bt.at[:, 0].set(bt_entry)
        new_v = jnp.where(valid, within + log_b_t, vgrid)
        bt = jnp.where(valid, bt, self_ids)
        return new_v, bt

    valid = jnp.ones((t_len,), bool) if mask is None else mask
    v0 = pi_grid + log_b[0]
    v_last, bts = jax.lax.scan(step, v0, (log_b[1:], valid[1:]))

    # termination is restricted to word-final states
    v_final = v_last + final_grid
    flat = v_final.reshape(-1)
    last_state = jnp.argmax(flat).astype(jnp.int32)
    score = flat[last_state]

    bts_flat = bts.reshape(bts.shape[0], -1)  # (T-1, V*S)

    def backstep(state_next, bt_row):
        state_t = bt_row[state_next]
        return state_t, state_t

    _, head = jax.lax.scan(backstep, last_state, bts_flat, reverse=True)
    path = jnp.concatenate([head, last_state[None]], axis=0)
    return path, score


def factored_lattice_scan(log_b, inner_a, hop, pi_grid, exit_idx, mask=None):
    """Factored Viterbi forward pass that records word-token lattice raw
    material instead of backpointers.

    Alongside the ``(V, S)`` score grid, every grid state carries the frame
    at which its current word token was entered (``start``) and the word it
    was entered from (``pred``, −1 for sentence begin); both propagate
    through the same max-plus argmax selections as the scores. Per frame
    the scan emits each word's exit-state record ``(score, start, pred)``
    — exactly the information a word lattice needs (best path ending word v
    at frame t, that token's span, and its best predecessor).

    Returns ``(exit_score (T, V), exit_start (T, V) int32,
    exit_pred (T, V) int32, v_last (V, S))``. Masked frames repeat the
    previous frame's records (identity step), matching
    :func:`factored_trellis_scan`.
    """
    t_len, v_words, s_max = log_b.shape
    exit_i32 = exit_idx.astype(jnp.int32)

    def exit_records(vgrid, start, pred):
        gather = lambda g: jnp.take_along_axis(
            g, exit_i32[:, None], axis=1
        )[:, 0]
        return gather(vgrid), gather(start), gather(pred)

    def step(carry, inputs):
        vgrid, start, pred = carry
        log_b_t, valid, t = inputs
        cand_in = vgrid[:, :, None] + inner_a  # (V, S, S) over pred s
        within = jnp.max(cand_in, axis=1)
        wsrc = jnp.argmax(cand_in, axis=1).astype(jnp.int32)
        new_start = jnp.take_along_axis(start, wsrc, axis=1)
        new_pred = jnp.take_along_axis(pred, wsrc, axis=1)

        exit_v = jnp.take_along_axis(vgrid, exit_i32[:, None], axis=1)[:, 0]
        entry, esrc = _hop_entry(exit_v, hop)  # dense or backoff-factored
        hop_wins = entry > within[:, 0]
        within = within.at[:, 0].set(jnp.maximum(within[:, 0], entry))
        new_start = new_start.at[:, 0].set(
            jnp.where(hop_wins, t, new_start[:, 0])
        )
        new_pred = new_pred.at[:, 0].set(
            jnp.where(hop_wins, esrc, new_pred[:, 0])
        )

        new_v = jnp.where(valid, within + log_b_t, vgrid)
        new_start = jnp.where(valid, new_start, start)
        new_pred = jnp.where(valid, new_pred, pred)
        return (new_v, new_start, new_pred), exit_records(
            new_v, new_start, new_pred
        )

    valid = jnp.ones((t_len,), bool) if mask is None else mask
    v0 = pi_grid + log_b[0]
    start0 = jnp.zeros((v_words, s_max), jnp.int32)
    pred0 = jnp.full((v_words, s_max), -1, jnp.int32)
    (v_last, _, _), (scores, starts, preds) = jax.lax.scan(
        step,
        (v0, start0, pred0),
        (log_b[1:], valid[1:], jnp.arange(1, t_len, dtype=jnp.int32)),
    )
    s0, st0, p0 = exit_records(v0, start0, pred0)
    exit_score = jnp.concatenate([s0[None], scores], axis=0)
    exit_start = jnp.concatenate([st0[None], starts], axis=0)
    exit_pred = jnp.concatenate([p0[None], preds], axis=0)
    return exit_score, exit_start, exit_pred, v_last


class FactoredDecodingGraph:
    """Composed-word Viterbi that exploits the graph's block structure.

    The dense graph's ``(V*s, V*s)`` transition matrix is, by construction,
    block-diagonal within-word transitions plus a rank-structured word->word
    hop (word-final exit -> (V, V) LM matrix -> word-entry states). This
    class keeps those factors separate: states live on a ``(V, S)``
    word-by-local-state grid (S = longest word, shorter words padded with
    -inf states), and one Viterbi step is

      within[v, j] = max_s  v[v, s]   + inner_a[v, s, j]   (batched (V,S,S))
      entry[w]     = max_v  v[v, e_v] + hop[v, w]          ((V, V) reduction)
      new_v        = within with entry merged at local state 0, + emissions

    Per-frame work and memory are O(V*S^2 + V^2) instead of the dense
    O((V*S)^2): a 10k-word 3-state-per-word vocabulary needs ~0.4 GB for
    the hop matrix instead of ~3.6 TB for the dense matrix. Decoded words,
    paths and scores match :class:`DecodingGraph` exactly (parity-tested).

    This realizes the search the reference designed but never built
    (``doc/source/basic.rst:14-21``, ``lnasr/recognizer.py:46-48``) in the
    shape TPUs want: the hot loop is a batched max-plus matvec and a
    VPU-friendly (V, V) reduction, with emission scoring one fused GMM GEMM.
    """

    SILENCE = SILENCE
    # "auto" hop_mode switches to backoff factors past this vocabulary:
    # the dense (V, V) matrix both exceeds the fused kernels' VMEM budget
    # (factored_pallas_ok) and costs O(V^2) HBM traffic per frame
    DENSE_HOP_LIMIT = 1792

    def __init__(
        self,
        words: Sequence[str],
        inner_a: np.ndarray,  # (V, S, S)
        exit_idx: np.ndarray,  # (V,)
        state_map: np.ndarray,  # (V, S) -> row in the emission stack
        pad_mask: np.ndarray,  # (V, S) True for real states
        log_pi_w: np.ndarray,  # (V,)
        log_final_w: np.ndarray,  # (V,)
        hop,  # (V, V) array, HopFactors (backoff mode), or None (loop=False)
        emission_params: Tuple[np.ndarray, np.ndarray, np.ndarray],
        cov_type: str,
        dtype=jnp.float32,
    ):
        self.words = list(words)
        self.dtype = dtype
        self.cov_type = cov_type
        self.inner_a = jnp.asarray(inner_a, dtype)
        self.exit_idx = jnp.asarray(exit_idx, jnp.int32)
        self._exit_idx_np = np.asarray(exit_idx)
        self.state_map = jnp.asarray(state_map, jnp.int32)
        self.pad_mask = jnp.asarray(pad_mask)
        self.log_pi_w = jnp.asarray(log_pi_w, dtype)
        self.log_final_w = jnp.asarray(log_final_w, dtype)
        if hop is None:
            self.hop = None
        elif isinstance(hop, HopFactors):
            self.hop = HopFactors(
                from_w=jnp.asarray(hop.from_w, dtype),
                uni=jnp.asarray(hop.uni, dtype),
                sil_from=jnp.asarray(hop.sil_from, dtype),
                sil_idx=jnp.asarray(hop.sil_idx, jnp.int32),
                pred=jnp.asarray(hop.pred, jnp.int32),
                val=jnp.asarray(hop.val, dtype),
            )
        else:
            self.hop = jnp.asarray(hop, dtype)
        self.hop_clamped = 0  # set by build() in backoff mode
        self.hop_pruned_edges = 0  # set by build() in rank1 mode
        # edge-free factors (rank1 mode, or backoff with no LM) are
        # eligible for the rank-1 Pallas kernels
        self.hop_rank1_only = bool(
            isinstance(self.hop, HopFactors)
            and not np.isfinite(np.asarray(self.hop.val)).any()
        )
        log_w, mu, cov = emission_params
        self.log_w = jnp.asarray(log_w, dtype)
        self.mu = jnp.asarray(mu, dtype)
        self.cov = jnp.asarray(cov, dtype)

    @classmethod
    def build(
        cls,
        lexicon: Lexicon,
        unit_models: Mapping[str, GMMHMM],
        lm: Optional[NGramModel] = None,
        config: DecoderConfig = DecoderConfig(),
        silence_model: Optional[GMMHMM] = None,
        dtype=jnp.float32,
        hop_mode: str = "auto",
        hop_max_in_degree: Optional[int] = None,
    ) -> "FactoredDecodingGraph":
        """Compose the factored graph (same inputs and semantics as
        :meth:`DecodingGraph.build`).

        ``hop_mode`` selects the word-hop realization: ``"dense"`` — the
        ``(V, V)`` matrix; ``"backoff"`` — :class:`HopFactors` (rank-1 +
        sparse seen bigrams, O(V + E) memory, the large-vocabulary form);
        ``"rank1"`` — the factors with the sparse arcs PRUNED (word-loop
        search scoring every hop with alpha+unigram; rides the rank-1
        Pallas kernels far past the dense VMEM cap — recover full-LM
        accuracy via lattice rescoring); ``"auto"`` — dense up to
        :data:`DENSE_HOP_LIMIT` words (where the fused Pallas kernels
        keep the matrix VMEM-resident), backoff beyond.
        ``hop_max_in_degree`` caps each destination's explicit-arc list
        in backoff mode (standard LM arc pruning; dropped arcs score by
        their backoff path)."""
        some_model = next(iter(unit_models.values()))
        cov_type = some_model.config.cov_type
        words, blocks, emission_params, state_offsets = _compose_words(
            lexicon, unit_models, silence_model, config.exit_logp
        )
        v = len(words)
        s_max = max(b.shape[0] for b in blocks)
        inner_a = np.full((v, s_max, s_max), -np.inf)
        state_map = np.zeros((v, s_max), np.int64)
        pad_mask = np.zeros((v, s_max), bool)
        exit_idx = np.zeros(v, np.int64)
        for wi, block in enumerate(blocks):
            s_w = block.shape[0]
            inner_a[wi, :s_w, :s_w] = block
            state_map[wi, :s_w] = state_offsets[wi] + np.arange(s_w)
            pad_mask[wi, :s_w] = True
            exit_idx[wi] = s_w - 1

        # NB: a silence model's own last->first arc (the dense builder's
        # preserved sil->sil cell) lives inside its inner_a block here, so
        # hop stays purely word-level (sil->sil = -inf).
        if hop_mode == "auto":
            hop_mode = "dense" if v <= cls.DENSE_HOP_LIMIT else "backoff"
        n_clamped = n_pruned = 0
        if hop_mode in ("backoff", "rank1"):
            pi_w, final_w, hop, n_clamped = _word_lm_factors(
                words, lm, config, max_in_degree=hop_max_in_degree
            )
            if hop_mode == "rank1":
                # word-loop pruning: drop the sparse seen-bigram arcs so
                # every hop scores alpha'+unigram — the Pallas-kernel
                # realization for vocabularies past the dense VMEM cap;
                # recover full-LM accuracy by lattice rescoring
                # (decode_segment_nbest(rescore_lm=...))
                n_pruned = int(np.isfinite(hop.val).sum())
                hop = hop._replace(
                    pred=np.zeros((v, 1), np.int32),
                    val=np.full((v, 1), -np.inf),
                )
        elif hop_mode == "dense":
            pi_w, final_w, hop = _word_lm_scores(words, lm, config)
        else:
            raise ValueError(f"unknown hop_mode: {hop_mode!r}")
        graph = cls(
            words, inner_a, exit_idx, state_map, pad_mask, pi_w, final_w,
            hop if config.loop else None, emission_params, cov_type, dtype,
        )
        graph.hop_clamped = n_clamped
        graph.hop_pruned_edges = n_pruned
        return graph

    @property
    def n_states(self) -> int:
        return int(self.pad_mask.sum())

    @property
    def grid_shape(self) -> Tuple[int, int]:
        return self.inner_a.shape[0], self.inner_a.shape[1]

    def _kernel_ok(self, t_len: int) -> bool:
        """Shared decode/lattice kernel-dispatch rule: float32 on TPU,
        graph within the kernel family's capacity (dense hop within the
        VMEM-resident budget; backoff factors only when edge-free, i.e.
        the rank-1 word-loop realization)."""
        from lnasr_tpu.ops.factored_pallas import (
            factored_pallas_ok,
            factored_rank1_ok,
        )

        if self.dtype != jnp.float32 or jax.default_backend() != "tpu":
            return False
        if isinstance(self.hop, HopFactors):
            return (self.hop_rank1_only
                    and factored_rank1_ok(t_len, len(self.words)))
        return factored_pallas_ok(t_len, len(self.words))

    def host_hop(self):
        """Host-side hop accessor for the lattice layer: the dense NumPy
        matrix, or a :class:`HostBackoffHop` over the factors (cached)."""
        if getattr(self, "_host_hop", None) is None:
            if isinstance(self.hop, HopFactors):
                self._host_hop = HostBackoffHop(self.hop)
            else:
                self._host_hop = np.asarray(self.hop)
        return self._host_hop

    # -- decoding -------------------------------------------------------------

    @functools.cached_property
    def _decode_fn(self):
        cov_type = self.cov_type

        def fn(obs, mask, inner_a, hop, log_pi_w, log_final_w, exit_idx,
               state_map, pad_mask, log_w, mu, cov):
            log_b, pi_grid, final_grid = _factored_grid_inputs(
                obs, log_pi_w, log_final_w, exit_idx, state_map, pad_mask,
                log_w, mu, cov, cov_type,
            )
            return factored_trellis_scan(
                log_b, inner_a, hop, pi_grid, final_grid, exit_idx, mask
            )

        return jax.jit(fn)

    @functools.cached_property
    def _decode_fn_pallas(self):
        """Kernel-backed decode: the Pallas forward keeps the graph (hop,
        inner blocks) VMEM-resident across the utterance and streams the
        trellis grids out; the backtrace replays argmaxes in an XLA scan.
        Identical words/path/score to :attr:`_decode_fn` (max-plus is
        exactly associative, so stored values match the scan bitwise at
        every feasible state)."""
        from lnasr_tpu.ops.factored_pallas import (
            factored_backtrace,
            factored_decode_pallas,
            factored_forward_pallas,
        )

        cov_type = self.cov_type

        def fn(obs, mask, inner_a, hop, log_pi_w, log_final_w, exit_idx,
               state_map, pad_mask, log_w, mu, cov):
            log_b, pi_grid, final_grid = _factored_grid_inputs(
                obs, log_pi_w, log_final_w, exit_idx, state_map, pad_mask,
                log_w, mu, cov, cov_type,
            )
            if hop is not None:
                # fused forward + in-kernel backtrace: the XLA backtrace
                # scan was 25.6 of the 28.9 ms 1k-word decode (round-4
                # stage timing)
                return factored_decode_pallas(
                    pi_grid, inner_a, exit_idx, hop, log_b, final_grid,
                    mask,
                )
            vgrids = factored_forward_pallas(
                pi_grid, inner_a, exit_idx, hop, log_b, mask
            )
            return factored_backtrace(
                vgrids, inner_a, exit_idx, hop, final_grid, mask
            )

        return jax.jit(fn)

    def decode(self, features,
               mask=None) -> Tuple[List[str], np.ndarray, float]:
        """Viterbi over the factored graph. Returns (words, per-frame grid
        state path ``word*S + local``, score) with the same word-recovery
        rule as the dense graph. ``mask (T,)`` marks valid frames (padded
        frames act as identity steps — shape-bucketed serving)."""
        obs = jnp.asarray(features, self.dtype)
        if mask is not None:
            mask = jnp.asarray(mask, bool)
        path, score = jax.device_get(self.decode_arrays(obs, mask))
        return self._path_to_words(path), path, float(score)

    def decode_arrays(self, obs, mask):
        """Traceable decode core (see :meth:`DecodingGraph.decode_arrays`):
        dispatches to the fused Pallas kernels on TPU when the graph fits
        VMEM, the scan elsewhere — identical results."""
        use_kernel = self._kernel_ok(obs.shape[0])
        decode_fn = self._decode_fn_pallas if use_kernel else self._decode_fn
        return decode_fn(
            obs, mask, self.inner_a, self.hop, self.log_pi_w,
            self.log_final_w, self.exit_idx, self.state_map, self.pad_mask,
            self.log_w, self.mu, self.cov,
        )

    @functools.cached_property
    def _decode_batch_fn(self):
        """vmapped scan decode: ``(B, T, D) obs + (B, T) masks`` in one
        program — the serving path for a batch of bucketed segments."""
        cov_type = self.cov_type

        def one(obs, mask, inner_a, hop, log_pi_w, log_final_w, exit_idx,
                state_map, pad_mask, log_w, mu, cov):
            log_b, pi_grid, final_grid = _factored_grid_inputs(
                obs, log_pi_w, log_final_w, exit_idx, state_map, pad_mask,
                log_w, mu, cov, cov_type,
            )
            return factored_trellis_scan(
                log_b, inner_a, hop, pi_grid, final_grid, exit_idx, mask
            )

        return jax.jit(
            jax.vmap(one, in_axes=(0, 0) + (None,) * 10)
        )

    def decode_batch(
        self, features, masks
    ) -> List[Tuple[List[str], np.ndarray, float]]:
        """Decode ``(B, T, D)`` feature batches (padded, with ``(B, T)``
        masks) in ONE jitted program. Returns per-utterance
        (words, path, score) — identical to looping :meth:`decode`."""
        obs = jnp.asarray(features, self.dtype)
        masks = jnp.asarray(masks, bool)
        paths, scores = self._decode_batch_fn(
            obs, masks, self.inner_a, self.hop, self.log_pi_w,
            self.log_final_w, self.exit_idx, self.state_map, self.pad_mask,
            self.log_w, self.mu, self.cov,
        )
        paths = np.asarray(paths)
        return [
            (self._path_to_words(paths[b]), paths[b], float(scores[b]))
            for b in range(paths.shape[0])
        ]

    @functools.cached_property
    def _lattice_fn(self):
        cov_type = self.cov_type

        def fn(obs, mask, inner_a, hop, log_pi_w, log_final_w, exit_idx,
               state_map, pad_mask, log_w, mu, cov):
            log_b, pi_grid, _ = _factored_grid_inputs(
                obs, log_pi_w, log_final_w, exit_idx, state_map, pad_mask,
                log_w, mu, cov, cov_type,
            )
            return factored_lattice_scan(
                log_b, inner_a, hop, pi_grid, exit_idx, mask
            )

        return jax.jit(fn)

    @functools.cached_property
    def _lattice_fn_pallas(self):
        """Kernel-backed lattice recording (TPU serving path): the whole
        trellis + token-metadata propagation runs in one Pallas kernel
        (:func:`lnasr_tpu.ops.factored_pallas.factored_lattice_pallas`)
        instead of the ``lax.scan`` — same records (scan-parity-tested),
        decode-kernel speed."""
        from lnasr_tpu.ops.factored_pallas import factored_lattice_pallas

        cov_type = self.cov_type

        def fn(obs, mask, inner_a, hop, log_pi_w, log_final_w, exit_idx,
               state_map, pad_mask, log_w, mu, cov):
            log_b, pi_grid, _ = _factored_grid_inputs(
                obs, log_pi_w, log_final_w, exit_idx, state_map, pad_mask,
                log_w, mu, cov, cov_type,
            )
            return factored_lattice_pallas(
                pi_grid, inner_a, exit_idx, hop, log_b, mask
            )

        return jax.jit(fn)

    def lattice_records_arrays(self, obs, mask):
        """Traceable lattice-record core: ``(feats, mask) -> (exit_score,
        exit_start, exit_pred)`` device arrays (Pallas kernel on TPU when
        the graph fits VMEM, the scan elsewhere) — composable under an
        outer jit like :meth:`decode_arrays`. Kernel NEG sentinels are
        restored to ``-inf`` here (the lattice builder filters records by
        ``isfinite``; an early all-unreachable frame would otherwise mint
        V bogus tokens at -1e30)."""
        from lnasr_tpu.ops.trellis_pallas import NEG

        use_kernel = self._kernel_ok(obs.shape[0])
        if use_kernel:
            exit_score, exit_start, exit_pred = self._lattice_fn_pallas(
                obs, mask, self.inner_a, self.hop, self.log_pi_w,
                self.log_final_w, self.exit_idx, self.state_map,
                self.pad_mask, self.log_w, self.mu, self.cov,
            )
            exit_score = jnp.where(exit_score <= NEG / 2, -jnp.inf,
                                   exit_score)
        else:
            exit_score, exit_start, exit_pred, _ = self._lattice_fn(
                obs, mask, self.inner_a, self.hop, self.log_pi_w,
                self.log_final_w, self.exit_idx, self.state_map,
                self.pad_mask, self.log_w, self.mu, self.cov,
            )
        return exit_score, exit_start, exit_pred

    def decode_lattice(self, features, mask=None, beam: float = 40.0,
                       max_tokens_per_frame: Optional[int] = None):
        """Run the lattice-recording forward pass and build a
        :class:`~lnasr_tpu.models.lattice.WordLattice` of word tokens.

        The lattice's best path equals :meth:`decode` (same search, same
        scores); its N-best list and LM-rescoring generalize it. ``beam``
        keeps, per frame, only word-exit records within that many nats of
        the frame-best record (``inf`` disables pruning);
        ``max_tokens_per_frame`` additionally caps each frame's surviving
        records by rank.
        """
        from lnasr_tpu.models.lattice import WordLattice

        if self.hop is None:
            raise ValueError("lattice decoding requires a looped graph "
                             "(DecoderConfig(loop=True))")
        obs = jnp.asarray(features, self.dtype)
        if mask is not None:
            mask = jnp.asarray(mask, bool)
        exit_score, exit_start, exit_pred = self.lattice_records_arrays(
            obs, mask
        )
        n_valid = (
            obs.shape[0] if mask is None else int(np.asarray(mask).sum())
        )
        return WordLattice.from_records(
            self.words,
            np.asarray(exit_score)[:n_valid],
            np.asarray(exit_start)[:n_valid],
            np.asarray(exit_pred)[:n_valid],
            self.host_hop(),
            np.asarray(self.log_pi_w),
            np.asarray(self.log_final_w),
            beam=beam,
            max_tokens_per_frame=max_tokens_per_frame,
        )

    @functools.cached_property
    def _lattice_batch_fn(self):
        cov_type = self.cov_type

        def one(obs, mask, inner_a, hop, log_pi_w, log_final_w, exit_idx,
                state_map, pad_mask, log_w, mu, cov):
            log_b, pi_grid, _ = _factored_grid_inputs(
                obs, log_pi_w, log_final_w, exit_idx, state_map, pad_mask,
                log_w, mu, cov, cov_type,
            )
            return factored_lattice_scan(
                log_b, inner_a, hop, pi_grid, exit_idx, mask
            )

        return jax.jit(jax.vmap(one, in_axes=(0, 0) + (None,) * 10))

    def decode_lattice_batch(self, features, masks, beam: float = 40.0,
                             max_tokens_per_frame: Optional[int] = None):
        """Lattice-record a padded ``(B, T, D)`` batch (with ``(B, T)``
        frame masks) in ONE vmapped program and build per-utterance
        :class:`~lnasr_tpu.models.lattice.WordLattice` objects — the
        serving path for N-best over bucketed segments. Identical to
        looping :meth:`decode_lattice`."""
        from lnasr_tpu.models.lattice import WordLattice

        if self.hop is None:
            raise ValueError("lattice decoding requires a looped graph "
                             "(DecoderConfig(loop=True))")
        obs = jnp.asarray(features, self.dtype)
        masks = jnp.asarray(masks, bool)
        exit_score, exit_start, exit_pred, _ = self._lattice_batch_fn(
            obs, masks, self.inner_a, self.hop, self.log_pi_w,
            self.log_final_w, self.exit_idx, self.state_map, self.pad_mask,
            self.log_w, self.mu, self.cov,
        )
        exit_score, exit_start, exit_pred = (
            np.asarray(exit_score), np.asarray(exit_start),
            np.asarray(exit_pred),
        )
        hop_np = self.host_hop()
        pi_np = np.asarray(self.log_pi_w)
        fin_np = np.asarray(self.log_final_w)
        out = []
        for b in range(obs.shape[0]):
            n_valid = int(np.asarray(masks[b]).sum())
            out.append(WordLattice.from_records(
                self.words, exit_score[b, :n_valid],
                exit_start[b, :n_valid], exit_pred[b, :n_valid],
                hop_np, pi_np, fin_np, beam=beam,
                max_tokens_per_frame=max_tokens_per_frame,
            ))
        return out

    def path_to_alignment(self, path: np.ndarray,
                          n_frames: Optional[int] = None,
                          ) -> List[Tuple[str, int, int]]:
        """``(word, start_frame, end_frame)`` per decoded word instance
        (inclusive frames; silence dropped) — see
        :meth:`DecodingGraph.path_to_alignment`."""
        s_max = self.grid_shape[1]
        word_ids, locals_ = path // s_max, path % s_max
        ids = [int(word_ids[0])]
        starts = [0]
        for t in range(1, len(path)):
            if path[t] == path[t - 1]:
                continue
            if locals_[t] == 0 and (
                word_ids[t] != word_ids[t - 1]
                or locals_[t - 1] == self._exit_idx_np[word_ids[t - 1]]
            ):
                ids.append(int(word_ids[t]))
                starts.append(t)
        return _assemble_alignment(self.words, ids, starts,
                                   n_frames or len(path))

    def _path_to_words(self, path: np.ndarray) -> List[str]:
        return [w for w, _, _ in self.path_to_alignment(path)]


class TrigramDecodingGraph:
    """Exact trigram-LM decoding by expanding the factored graph with the
    one-word LM history.

    Search states are ``(h, w, s)``: history word h (V real words plus one
    sentence-begin slot), current word w, local state s. Within-word
    transitions keep the copy; the word hop moves ``(·, u) -> (u, w)`` with
    the full trigram score ``P(w | h, u)``, so a trained trigram ARPA model
    genuinely changes hypotheses instead of being flattened to its bigram
    level (the round-1 decoder's limitation). Sentence begin/end use
    ``P(w | <s>)`` and ``P(</s> | h, w)``.

    Memory is O(V^2 * S) state + O(V^3) for the dense trigram hop — exact
    decoding for classical vocabularies up to a few hundred words. A bigram
    (order-2) LM degrades gracefully: the hop broadcasts the bigram table
    over histories and the search is then exactly the factored bigram graph
    (parity-tested).

    With a ``silence_model``, silence is a pseudo-word whose copy keeps the
    pre-silence word as its history slot, so hops across silence score with
    the *bigram* P(w | pre-silence word) — one order better than the
    factored graph's history-losing unigram rule (full trigram context
    cannot survive, since only one word of history crosses the gap).

    The reference's ARPA machinery exists precisely for trigram scoring
    (``lnasr/ngram.py:256-378``); its decoder was never built.
    """

    def __init__(
        self,
        words: Sequence[str],
        inner_a: np.ndarray,
        exit_idx: np.ndarray,
        state_map: np.ndarray,
        pad_mask: np.ndarray,
        log_pi_w: np.ndarray,  # (V,)
        final3: np.ndarray,  # (H, V)
        hop3: np.ndarray,  # (H, V, V)
        emission_params: Tuple[np.ndarray, np.ndarray, np.ndarray],
        cov_type: str,
        dtype=jnp.float32,
    ):
        self.words = list(words)
        self.dtype = dtype
        self.cov_type = cov_type
        self.inner_a = jnp.asarray(inner_a, dtype)
        self.exit_idx = jnp.asarray(exit_idx, jnp.int32)
        self._exit_idx_np = np.asarray(exit_idx)
        self.state_map = jnp.asarray(state_map, jnp.int32)
        self.pad_mask = jnp.asarray(pad_mask)
        self.log_pi_w = jnp.asarray(log_pi_w, dtype)
        self.final3 = jnp.asarray(final3, dtype)
        self.hop3 = jnp.asarray(hop3, dtype)
        log_w, mu, cov = emission_params
        self.log_w = jnp.asarray(log_w, dtype)
        self.mu = jnp.asarray(mu, dtype)
        self.cov = jnp.asarray(cov, dtype)

    @classmethod
    def build(
        cls,
        lexicon: Lexicon,
        unit_models: Mapping[str, GMMHMM],
        lm: NGramModel,
        config: DecoderConfig = DecoderConfig(),
        silence_model: Optional[GMMHMM] = None,
        dtype=jnp.float32,
        max_table_bytes: float = 1 << 30,
    ) -> "TrigramDecodingGraph":
        if lm is None:
            raise ValueError("TrigramDecodingGraph requires a language model")
        if not config.loop:
            raise ValueError("history expansion is for connected decoding")
        # fail fast before materializing the O(V^3) hop tensor: exact
        # history expansion is for classical vocabularies (<= a few
        # hundred words); beyond that the supported route is the factored
        # bigram search + lattice rescoring, which reaches the same
        # trigram objective at O(V*S^2 + V^2)
        v_est = len(lexicon) + (1 if silence_model is not None else 0)
        hop_bytes = (v_est + 1) * v_est * v_est * np.dtype(
            np.float32 if dtype == jnp.float32 else np.float64
        ).itemsize
        if hop_bytes > max_table_bytes:
            raise ValueError(
                f"trigram history expansion needs a ({v_est + 1}, {v_est}, "
                f"{v_est}) hop tensor ({hop_bytes / 2**20:.0f} MiB > budget "
                f"{max_table_bytes / 2**20:.0f} MiB). For this vocabulary "
                "decode with FactoredDecodingGraph and rescore the word "
                "lattice with the trigram LM "
                "(decode_lattice().rescore(lm) — same objective, "
                "O(V*S^2 + V^2) instead of O(V^3)); or raise "
                "max_table_bytes explicitly."
            )
        some_model = next(iter(unit_models.values()))
        cov_type = some_model.config.cov_type
        words, blocks, emission_params, state_offsets = _compose_words(
            lexicon, unit_models, silence_model, config.exit_logp
        )
        v = len(words)
        s_max = max(b.shape[0] for b in blocks)
        inner_a = np.full((v, s_max, s_max), -np.inf)
        state_map = np.zeros((v, s_max), np.int64)
        pad_mask = np.zeros((v, s_max), bool)
        exit_idx = np.zeros(v, np.int64)
        for wi, block in enumerate(blocks):
            s_w = block.shape[0]
            inner_a[wi, :s_w, :s_w] = block
            state_map[wi, :s_w] = state_offsets[wi] + np.arange(s_w)
            pad_mask[wi, :s_w] = True
            exit_idx[wi] = s_w - 1

        scale = config.lm_scale * _LN10
        has_eos = _has_eos(lm)
        wip = config.word_insertion_penalty
        # history index layout: 0..V-1 words (incl. silence), V = <s>
        s2 = scale * lm.score_table(list(words) + [BOS, EOS])
        hsel = list(range(v)) + [v]  # history rows: words then <s>
        if lm.order >= 3:
            t3 = scale * lm.score_table_trigram(list(words) + [BOS, EOS])
            hop3 = t3[hsel][:, :v, :v].copy()
            final3 = (
                t3[hsel][:, :v, v + 1].copy()
                if has_eos else np.zeros((v + 1, v))
            )
        else:
            hop3 = np.broadcast_to(s2[:v, :v], (v + 1, v, v)).copy()
            final3 = (
                np.broadcast_to(s2[:v, v + 1], (v + 1, v)).copy()
                if has_eos else np.zeros((v + 1, v))
            )
        pi_w = s2[v, :v].copy()
        hop3 = hop3 + config.exit_logp + wip
        if silence_model is not None:
            si = v - 1  # _compose_words appends silence last
            # leaving silence from copy (h, sil): bigram P(w | h) — the
            # pre-silence word survived as the copy's history slot
            hop3[:, si, :] = s2[hsel, :v] + config.exit_logp + wip
            # a copy whose *history* is silence scores its next hop with
            # the bigram of its current word (two-word context is gone)
            hop3[si, :, :] = s2[:v, :v] + config.exit_logp + wip
            # entering silence: exit penalty only, no LM or insertion cost
            hop3[:, :, si] = config.exit_logp
            hop3[:, si, si] = -np.inf  # silence never follows itself
            pi_w[si] = 0.0
            final3[:, si] = 0.0
            final3[si, :] = s2[:v, v + 1] if has_eos else 0.0
            final3[si, si] = 0.0
        return cls(
            words, inner_a, exit_idx, state_map, pad_mask, pi_w, final3,
            hop3, emission_params, cov_type, dtype,
        )

    @property
    def grid_shape(self) -> Tuple[int, int, int]:
        h, v, _ = self.hop3.shape
        return h, v, self.inner_a.shape[1]

    @functools.cached_property
    def _decode_core(self):
        cov_type = self.cov_type
        neg = -jnp.inf

        def fn(obs, mask, inner_a, hop3, log_pi_w, final3, exit_idx,
               state_map, pad_mask, log_w, mu, cov):
            h_hist, v_words, _ = hop3.shape
            s_max = state_map.shape[1]
            if cov_type == "diag":
                log_b_real, _ = gmm_emissions_diag(obs, log_w, mu, cov)
            else:
                log_b_real, _ = gmm_emissions_full(obs, log_w, mu, cov)
            log_b = jnp.where(pad_mask[None], log_b_real[:, state_map], neg)

            h_iota = jnp.arange(h_hist, dtype=jnp.int32)[:, None, None]
            w_iota = jnp.arange(v_words, dtype=jnp.int32)[None, :, None]
            copy_base = (h_iota * v_words + w_iota) * s_max  # (H, V, 1)
            exit_i32 = exit_idx.astype(jnp.int32)

            copy_self = copy_base + jnp.arange(s_max, dtype=jnp.int32)

            def step(vgrid, inputs):
                log_b_t, valid = inputs
                # vgrid: (H, V, S)
                cand_in = vgrid[:, :, :, None] + inner_a[None]
                within = jnp.max(cand_in, axis=2)  # (H, V, S)
                wsrc = jnp.argmax(cand_in, axis=2).astype(jnp.int32)
                bt = copy_base + wsrc

                exit_v = jnp.take_along_axis(
                    vgrid, exit_i32[None, :, None], axis=2
                )[:, :, 0]  # (H, V)
                cand_hop = exit_v[:, :, None] + hop3  # (H, V, V): [h, u, w]
                entry = jnp.max(cand_hop, axis=0)  # (V, V): [u, w]
                hsrc = jnp.argmax(cand_hop, axis=0).astype(jnp.int32)
                # the hop lands in copy (h=u, w); the BOS history row (h=V)
                # is never re-entered
                entry_full = jnp.concatenate(
                    [entry, jnp.full((1, v_words), neg, entry.dtype)], axis=0
                )  # (H, V)
                hop_wins = entry_full > within[:, :, 0]
                within = within.at[:, :, 0].set(
                    jnp.maximum(within[:, :, 0], entry_full)
                )
                # source of the hop into copy (u, w): copy (hsrc[u, w], u)
                # at word u's exit state
                u_iota = jnp.arange(v_words, dtype=jnp.int32)[:, None]
                src_id = (hsrc * v_words + u_iota) * s_max + exit_i32[:, None]
                src_full = jnp.concatenate(
                    [src_id, jnp.zeros((1, v_words), jnp.int32)], axis=0
                )
                bt = bt.at[:, :, 0].set(
                    jnp.where(hop_wins, src_full, bt[:, :, 0])
                )
                new_v = jnp.where(valid, within + log_b_t[None], vgrid)
                bt = jnp.where(valid, bt, copy_self)
                return new_v, bt

            pi_grid = jnp.full((h_hist, v_words, s_max), neg, log_b.dtype)
            pi_grid = pi_grid.at[h_hist - 1, :, 0].set(
                log_pi_w.astype(log_b.dtype)
            )
            v0 = pi_grid + log_b[0][None]
            valid = (jnp.ones((log_b.shape[0],), bool) if mask is None
                     else mask)
            v_last, bts = jax.lax.scan(step, v0, (log_b[1:], valid[1:]))

            final_grid = jnp.where(
                jnp.arange(s_max)[None, None, :] == exit_idx[None, :, None],
                final3[:, :, None].astype(v_last.dtype),
                neg,
            )
            flat = (v_last + final_grid).reshape(-1)
            last_state = jnp.argmax(flat).astype(jnp.int32)
            score = flat[last_state]

            bts_flat = bts.reshape(bts.shape[0], -1)

            def backstep(state_next, bt_row):
                state_t = bt_row[state_next]
                return state_t, state_t

            _, head = jax.lax.scan(backstep, last_state, bts_flat, reverse=True)
            path = jnp.concatenate([head, last_state[None]], axis=0)
            return path, score

        return fn

    @functools.cached_property
    def _decode_fn(self):
        return jax.jit(self._decode_core)

    @functools.cached_property
    def _decode_batch_fn(self):
        return jax.jit(
            jax.vmap(self._decode_core, in_axes=(0, 0) + (None,) * 10)
        )

    def decode(self, features,
               mask=None) -> Tuple[List[str], np.ndarray, float]:
        obs = jnp.asarray(features, self.dtype)
        if mask is not None:
            mask = jnp.asarray(mask, bool)
        path, score = jax.device_get(self.decode_arrays(obs, mask))
        return self._path_to_words(path), path, float(score)

    def decode_arrays(self, obs, mask):
        """Traceable decode core (see :meth:`DecodingGraph.decode_arrays`)."""
        return self._decode_fn(
            obs, mask, self.inner_a, self.hop3, self.log_pi_w, self.final3,
            self.exit_idx, self.state_map, self.pad_mask,
            self.log_w, self.mu, self.cov,
        )

    def decode_batch(
        self, features, masks
    ) -> List[Tuple[List[str], np.ndarray, float]]:
        """Decode ``(B, T, D)`` feature batches (padded, with ``(B, T)``
        masks) in ONE jitted program — serving parity with
        :meth:`FactoredDecodingGraph.decode_batch`. Returns per-utterance
        (words, path, score), identical to looping :meth:`decode`."""
        obs = jnp.asarray(features, self.dtype)
        masks = jnp.asarray(masks, bool)
        paths, scores = self._decode_batch_fn(
            obs, masks, self.inner_a, self.hop3, self.log_pi_w, self.final3,
            self.exit_idx, self.state_map, self.pad_mask,
            self.log_w, self.mu, self.cov,
        )
        paths = np.asarray(paths)
        return [
            (self._path_to_words(paths[b]), paths[b], float(scores[b]))
            for b in range(paths.shape[0])
        ]

    def path_to_alignment(self, path: np.ndarray,
                          n_frames: Optional[int] = None,
                          ) -> List[Tuple[str, int, int]]:
        """``(word, start_frame, end_frame)`` per decoded word instance
        (inclusive frames; silence dropped) — see
        :meth:`DecodingGraph.path_to_alignment`."""
        _, v_words, s_max = self.grid_shape
        copy_ids, locals_ = path // s_max, path % s_max
        word_ids = copy_ids % v_words
        ids = [int(word_ids[0])]
        starts = [0]
        for t in range(1, len(path)):
            if path[t] == path[t - 1]:
                continue
            if locals_[t] == 0 and (
                copy_ids[t] != copy_ids[t - 1]
                or locals_[t - 1] == self._exit_idx_np[word_ids[t - 1]]
            ):
                ids.append(int(word_ids[t]))
                starts.append(t)
        return _assemble_alignment(self.words, ids, starts,
                                   n_frames or len(path))

    def _path_to_words(self, path: np.ndarray) -> List[str]:
        return [w for w, _, _ in self.path_to_alignment(path)]
