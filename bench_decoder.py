"""Decoder benchmarks (run on the real chip; complements bench.py):

1. composed word-graph decode throughput — a 1,000-word whole-word
   vocabulary through the factored (V, S)-grid Viterbi, reported as
   audio-seconds decoded per second (10 ms frame shift);
2. the large-N dense Pallas Viterbi kernel vs the lax.scan trellis at
   N=512 — the recognizer hot path's kernel; paths must be bit-identical
   and the kernel is expected to win (VERDICT r1 bar: >=2x).

Usage: python bench_decoder.py [--vocab 1000] [--frames 2000] [--n 512]
Prints one JSON line per benchmark; writes BENCH_DECODER.json.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _sync(x):
    import jax

    jax.block_until_ready(x)
    return x


def _loop_diff_seconds(make_loop, reps: int = 20, trials: int = 5) -> float:
    """Per-iteration seconds via the loop-difference method (as bench.py):
    run the computation 1 and 1+reps times inside one on-device fori_loop
    and divide the wall-clock difference by reps — tunneled-dispatch
    overhead cancels. Best-of-trials per loop variant keeps one noisy
    dispatch from driving the difference negative."""
    run_1, run_n = make_loop(1), make_loop(1 + reps)
    _sync(run_1())
    _sync(run_n())  # compile both
    t1 = min(_timed_once(run_1) for _ in range(trials))
    tn = min(_timed_once(run_n) for _ in range(trials))
    return max(tn - t1, 1e-9) / reps


def _timed_once(fn) -> float:
    t0 = time.perf_counter()
    _sync(fn())
    return time.perf_counter() - t0


def bench_factored_decode(vocab: int, n_frames: int, dim: int = 8,
                          n_states: int = 3, repeats: int = 3) -> dict:
    import types

    import jax
    import jax.numpy as jnp

    from lnasr_tpu.config import GMMHMMConfig
    from lnasr_tpu.models.decoder import DecoderConfig, FactoredDecodingGraph
    from lnasr_tpu.models.lexicon import Lexicon

    rng = np.random.default_rng(0)
    cfg = GMMHMMConfig(n_states=n_states, n_mix=1, dim=dim)
    means = rng.normal(scale=30.0, size=(vocab, dim))
    # numpy stand-ins (duck-typed for graph composition): constructing
    # real device-array models would cost ~6 host<->device transfers per
    # word, minutes over a tunneled TPU, for a graph that is assembled
    # host-side anyway
    log_a = np.log(np.where(np.eye(n_states) + np.eye(n_states, k=1) > 0,
                            0.5, 0.0)).astype(np.float32)
    units = {
        f"w{i:04d}": types.SimpleNamespace(
            n=n_states,
            config=cfg,
            log_a=log_a,
            log_w=np.zeros((n_states, 1), np.float32),
            mu=(means[i][None, None, :]
                + np.arange(n_states)[:, None, None] * 0.5).astype(np.float32),
            cov=np.full((n_states, 1, dim), 0.05, np.float32),
        )
        for i in range(vocab)
    }
    lex = Lexicon.whole_word(sorted(units))
    graph = FactoredDecodingGraph.build(
        lex, units, None, DecoderConfig(loop=True), dtype=jnp.float32
    )

    frames = jnp.asarray(
        rng.normal(scale=30.0, size=(n_frames, dim)).astype(np.float32)
    )
    graph.decode(frames)  # sanity: full python-level decode once

    decode_fn = graph._decode_fn
    graph_args = (graph.inner_a, graph.hop, graph.log_pi_w, graph.log_final_w,
                  graph.exit_idx, graph.state_map, graph.pad_mask,
                  graph.log_w, graph.mu, graph.cov)

    def timed(decode_fn):
        def make_loop(nreps: int):
            @jax.jit
            def run(frames):
                def body(i, acc):
                    # index-dependent input defeats loop hoisting; summing
                    # the path keeps the backtrace live
                    path, score = decode_fn(
                        frames + i.astype(jnp.float32) * 1e-6, None,
                        *graph_args
                    )
                    return acc + score + path.sum().astype(jnp.float32)

                return jax.lax.fori_loop(0, nreps, body, jnp.float32(0.0))

            return lambda: run(frames)

        return _loop_diff_seconds(make_loop)

    t_scan = timed(graph._decode_fn)
    on_tpu = jax.default_backend() == "tpu"
    from lnasr_tpu.ops.factored_pallas import factored_pallas_ok

    if on_tpu and factored_pallas_ok(n_frames, len(graph.words)):
        t_kern = timed(graph._decode_fn_pallas)
        best = min(t_scan, t_kern)
    else:
        t_kern = None
        best = t_scan
    audio_s = n_frames * 0.010
    row = {
        "metric": f"composed-graph decode throughput "
                  f"({vocab}-word lexicon, {vocab * n_states} states)",
        "value": round(audio_s / best, 2),
        "unit": "audio-seconds/s",
        "frames": n_frames,
        "scan_decode_seconds": round(t_scan, 4),
        "pallas_decode_seconds": None if t_kern is None else round(t_kern, 4),
        "backend": jax.default_backend(),
    }
    if t_kern is not None:
        row["sol"] = _factored_sol(vocab, n_frames, t_kern)
    return row


# v5e peaks for the decode-kernel roofline. The VPU figure is the
# (8, 128)-lane unit at ~0.94 GHz x 4 ops issued per lane-cycle — an
# estimate consistent with public per-chip specs; the MXU/HBM numbers
# match bench.py's table.
_VPU_ELEMOPS = 3.85e12
_MXU_FLOPS = 197e12
_HBM_BPS = 819e9


def _factored_sol(vocab: int, n_frames: int, seconds: float) -> dict:
    """Per-frame work accounting for the fused factored decode kernel
    (forward + in-kernel backtrace), vs chip peaks.

    VPU: the (V,V) hop add+max dominates (2*V_pad^2), plus the (S,S,V)
    within-word max-plus, exit-row reduce and emission add, plus the
    backtrace's masked selects. MXU: the chunked exact relayout — one
    single-pass (128, 384) x (384, 128-padded) product per 128-lane
    chunk. HBM: emissions in, trellis grids out (forward) and back in
    (backtrace; the overlapped prev-block read doubles it)."""
    v_pad = max(128, -(-vocab // 128) * 128)
    s_pad = 8
    fwd_vpu = (2 * v_pad * v_pad          # hop entry add+max
               + 2 * s_pad * s_pad * v_pad  # within max-plus
               + 2 * 2 * s_pad * v_pad)     # exit row + emission add
    bwd_vpu = (2 * 2 * s_pad * v_pad      # masked within cand + exit row
               + 3 * v_pad)               # hop row add/max/argmin
    vpu_ops = n_frames * (fwd_vpu + bwd_vpu)
    mxu = n_frames * (v_pad // 128) * 2 * 128 * 384 * 128  # relayout
    hbm = n_frames * (2 * s_pad * v_pad * 4   # grids: write + ONE read
                      + s_pad * v_pad * 4)    # emissions read
    # (the backtrace reads each grid block once since the last-row side
    # input replaced the overlapping previous-block re-read)
    t_vpu = vpu_ops / _VPU_ELEMOPS
    t_mxu = mxu / _MXU_FLOPS
    t_hbm = hbm / _HBM_BPS
    floor = max(t_vpu, t_mxu, t_hbm)
    limiter = {t_vpu: "vpu", t_mxu: "mxu", t_hbm: "hbm"}[floor]
    return {
        "vpu_elemops": vpu_ops,
        "mxu_flops": mxu,
        "hbm_bytes": hbm,
        "t_floor_s": {"vpu": round(t_vpu, 6), "mxu": round(t_mxu, 6),
                      "hbm": round(t_hbm, 6)},
        "limiter": limiter,
        "pct_sol": round(100.0 * floor / seconds, 2),
        "peaks": {"vpu_elemops_per_s": _VPU_ELEMOPS,
                  "mxu_flops_per_s": _MXU_FLOPS, "hbm_bytes_per_s": _HBM_BPS},
    }


def _large_vocab_units(vocab: int, dim: int, n_states: int, rng):
    import types

    from lnasr_tpu.config import GMMHMMConfig

    cfg = GMMHMMConfig(n_states=n_states, n_mix=1, dim=dim)
    means = rng.normal(scale=30.0, size=(vocab, dim))
    log_a = np.log(np.where(np.eye(n_states) + np.eye(n_states, k=1) > 0,
                            0.5, 0.0)).astype(np.float32)
    return {
        f"w{i:05d}": types.SimpleNamespace(
            n=n_states, config=cfg, log_a=log_a,
            log_w=np.zeros((n_states, 1), np.float32),
            mu=(means[i][None, None, :]
                + np.arange(n_states)[:, None, None] * 0.5).astype(np.float32),
            cov=np.full((n_states, 1, dim), 0.05, np.float32),
        )
        for i in range(vocab)
    }


def bench_large_vocab(vocab: int, n_frames: int, dim: int = 8,
                      n_states: int = 3, max_in_degree: int = 256,
                      with_dense: bool = True) -> dict:
    """The large-vocabulary regime (round-4 verdict #3: the fused kernels
    cap at ~1,800 words and the beyond-cap fallback had zero recorded
    numbers). Three realizations of the SAME search at ``vocab`` words,
    LM-weighted with a real corpus-trained bigram:

    - ``backoff`` — exact Katz search over HopFactors (rank-1 + sparse
      seen bigrams), lax.scan: O(V*S^2 + V*K) per frame;
    - ``rank1``  — word-loop pruning (sparse arcs dropped), the Pallas
      kernel realization past the dense VMEM cap;
    - ``dense``  — the (V, V) matrix through the scan: the old fallback,
      HBM-roofline-bound on V^2*4 bytes PER FRAME (the number that shows
      why the factors exist).
    """
    import jax
    import jax.numpy as jnp

    from bench_corpus import make_corpus
    from lnasr_tpu.config import NGramConfig
    from lnasr_tpu.models.decoder import DecoderConfig, FactoredDecodingGraph
    from lnasr_tpu.models.lexicon import Lexicon
    from lnasr_tpu.models.ngram import NGramCounter, NGramModel
    from lnasr_tpu.ops.factored_pallas import factored_rank1_ok

    rng = np.random.default_rng(0)
    units = _large_vocab_units(vocab, dim, n_states, rng)
    names = sorted(units)
    # corpus-trained bigram over exactly this vocabulary (make_corpus
    # names words w00000-style too)
    sents = make_corpus(8000, vocab, np.random.default_rng(1))
    lm = NGramModel(NGramCounter(2, sents), NGramConfig(order=2))
    lex = Lexicon.whole_word(names)
    dcfg = DecoderConfig(loop=True, lm_scale=1.0)

    frames = jnp.asarray(
        rng.normal(scale=30.0, size=(n_frames, dim)).astype(np.float32)
    )
    on_tpu = jax.default_backend() == "tpu"

    def timed(graph, fn, reps=10):
        args = (graph.inner_a, graph.hop, graph.log_pi_w, graph.log_final_w,
                graph.exit_idx, graph.state_map, graph.pad_mask,
                graph.log_w, graph.mu, graph.cov)

        def make_loop(nreps: int):
            @jax.jit
            def run(frames):
                def body(i, acc):
                    path, score = fn(
                        frames + i.astype(jnp.float32) * 1e-6, None, *args
                    )
                    return acc + score + path.sum().astype(jnp.float32)

                return jax.lax.fori_loop(0, nreps, body, jnp.float32(0.0))

            return lambda: run(frames)

        # probe: second-scale realizations are timed as single dispatches
        # (RTT noise is then <2% and a reps-long single dispatch trips
        # the tunnel's RPC deadline — the 10k backoff row did exactly
        # that); sub-second ones use the loop-difference method
        single = make_loop(1)
        _sync(single())
        t_probe = _timed_once(single)
        if t_probe > 1.0:
            import statistics as _st

            return _st.median(_timed_once(single) for _ in range(3))
        return _loop_diff_seconds(make_loop, reps=reps)

    audio_s = n_frames * 0.010
    rows = {}

    def guarded(name, fn):
        # one faulting realization must not discard the others' rows
        try:
            rows[name] = fn()
        except Exception as e:  # noqa: BLE001
            rows[name] = {"error": f"{type(e).__name__}: {e}"}

    g_bo = FactoredDecodingGraph.build(
        lex, units, lm, dcfg, dtype=jnp.float32, hop_mode="backoff",
        hop_max_in_degree=max_in_degree,
    )
    k = int(np.asarray(g_bo.hop.pred).shape[1])

    def run_backoff():
        t_bo = timed(g_bo, g_bo._decode_fn)
        return {
            "seconds": round(t_bo, 4),
            "audio_s_per_s": round(audio_s / t_bo, 1),
            "k_max_in_degree": k, "clamped_arcs": g_bo.hop_clamped,
            "sol": _backoff_sol(vocab, k, n_frames, t_bo),
        }

    guarded("backoff_scan", run_backoff)

    g_r1 = FactoredDecodingGraph.build(
        lex, units, lm, dcfg, dtype=jnp.float32, hop_mode="rank1",
    )
    kernel_ok = on_tpu and factored_rank1_ok(n_frames, vocab)

    def run_rank1():
        fn = g_r1._decode_fn_pallas if kernel_ok else g_r1._decode_fn
        t_r1 = timed(g_r1, fn)
        return {
            "seconds": round(t_r1, 4),
            "audio_s_per_s": round(audio_s / t_r1, 1),
            "pruned_arcs": g_r1.hop_pruned_edges,
            "sol": _rank1_sol(vocab, n_frames, t_r1),
        }

    guarded("rank1" + ("_pallas" if kernel_ok else "_scan"), run_rank1)

    # decoded words agree between exact realizations of different modes?
    # (rank1 prunes arcs, so only sanity-check it decodes SOMETHING)
    def run_hyps():
        w_bo, _, _ = g_bo.decode(frames)
        w_r1, _, _ = g_r1.decode(frames)
        return {"backoff": len(w_bo), "rank1": len(w_r1)}

    guarded("hyp_lengths", run_hyps)

    if with_dense:
        def run_dense():
            g_d = FactoredDecodingGraph.build(
                lex, units, lm, dcfg, dtype=jnp.float32, hop_mode="dense",
            )
            t_d = timed(g_d, g_d._decode_fn, reps=3)
            v_pad = max(128, -(-vocab // 128) * 128)
            hbm = n_frames * v_pad * v_pad * 4  # the hop matrix, every frame
            return {
                "seconds": round(t_d, 4),
                "audio_s_per_s": round(audio_s / t_d, 1),
                "sol": {
                    "hbm_bytes": hbm,
                    "t_floor_s": round(hbm / _HBM_BPS, 4),
                    "limiter": "hbm (V^2*4 B/frame hop re-read)",
                    "pct_sol": round(100.0 * hbm / _HBM_BPS / t_d, 2),
                },
            }

        guarded("dense_scan", run_dense)

    return {
        "metric": f"large-vocabulary decode ({vocab} words, LM-weighted)",
        "value": rows["backoff_scan"]["audio_s_per_s"],
        "unit": "audio-seconds/s (exact backoff search)",
        "frames": n_frames,
        "backend": jax.default_backend(),
        "realizations": rows,
    }


def _backoff_sol(vocab: int, k: int, n_frames: int, seconds: float) -> dict:
    """Analytic floors for the backoff-factored scan decode. The usual
    binding term is neither: XLA charges ~10 us of loop/dispatch overhead
    per scan step on this chip (round-4 stage ablations), reported as the
    step-latency model."""
    v_pad = max(128, -(-vocab // 128) * 128)
    s_pad = 8
    vpu = n_frames * (2 * s_pad * s_pad * v_pad  # within max-plus
                      + 3 * v_pad * k            # sparse gather+add+max
                      + 6 * v_pad)               # rank-1 + merges
    hbm = n_frames * (s_pad * v_pad * 4          # emissions
                      + v_pad * k * 8)           # pred+val re-read
    t_vpu, t_hbm = vpu / _VPU_ELEMOPS, hbm / _HBM_BPS
    floor = max(t_vpu, t_hbm)
    per_step_us = seconds / n_frames * 1e6
    return {
        "vpu_elemops": vpu, "hbm_bytes": hbm,
        "t_floor_s": {"vpu": round(t_vpu, 6), "hbm": round(t_hbm, 6)},
        "limiter": ("vpu" if t_vpu >= t_hbm else "hbm")
        if floor / seconds > 0.3 else "xla scan step latency",
        "pct_sol": round(100.0 * floor / seconds, 2),
        "measured_us_per_step": round(per_step_us, 2),
    }


def _rank1_sol(vocab: int, n_frames: int, seconds: float) -> dict:
    """Floors for the rank-1 kernel decode: within max-plus + O(V) entry
    rows; HBM streams the trellis grids out and back (backtrace)."""
    v_pad = max(128, -(-vocab // 128) * 128)
    s_pad = 8
    vpu = n_frames * (2 * s_pad * s_pad * v_pad + 10 * v_pad
                      + 2 * 2 * s_pad * v_pad)  # + backtrace selects
    hbm = n_frames * (2 * s_pad * v_pad * 4   # grids: write + ONE read
                      + s_pad * v_pad * 4)    # emissions read
    t_vpu, t_hbm = vpu / _VPU_ELEMOPS, hbm / _HBM_BPS
    floor = max(t_vpu, t_hbm)
    return {
        "vpu_elemops": vpu, "hbm_bytes": hbm,
        "t_floor_s": {"vpu": round(t_vpu, 6), "hbm": round(t_hbm, 6)},
        "limiter": "vpu" if t_vpu >= t_hbm else "hbm",
        "pct_sol": round(100.0 * floor / seconds, 2),
        "measured_us_per_step": round(seconds / n_frames * 1e6, 2),
    }


def bench_lattice(vocab: int, n_frames: int, dim: int = 8,
                  n_states: int = 3) -> dict:
    """Lattice-recording pass (N-best serving): Pallas kernel vs scan."""
    import types

    import jax
    import jax.numpy as jnp

    from lnasr_tpu.config import GMMHMMConfig
    from lnasr_tpu.models.decoder import DecoderConfig, FactoredDecodingGraph
    from lnasr_tpu.models.lexicon import Lexicon

    rng = np.random.default_rng(0)
    cfg = GMMHMMConfig(n_states=n_states, n_mix=1, dim=dim)
    means = rng.normal(scale=30.0, size=(vocab, dim))
    log_a = np.log(np.where(np.eye(n_states) + np.eye(n_states, k=1) > 0,
                            0.5, 0.0)).astype(np.float32)
    units = {
        f"w{i:04d}": types.SimpleNamespace(
            n=n_states, config=cfg, log_a=log_a,
            log_w=np.zeros((n_states, 1), np.float32),
            mu=(means[i][None, None, :]
                + np.arange(n_states)[:, None, None] * 0.5).astype(np.float32),
            cov=np.full((n_states, 1, dim), 0.05, np.float32),
        )
        for i in range(vocab)
    }
    lex = Lexicon.whole_word(sorted(units))
    graph = FactoredDecodingGraph.build(
        lex, units, None, DecoderConfig(loop=True), dtype=jnp.float32
    )
    frames = jnp.asarray(
        rng.normal(scale=30.0, size=(n_frames, dim)).astype(np.float32)
    )
    graph.decode_lattice(frames, beam=20.0)  # end-to-end sanity

    args = (graph.inner_a, graph.hop, graph.log_pi_w, graph.log_final_w,
            graph.exit_idx, graph.state_map, graph.pad_mask,
            graph.log_w, graph.mu, graph.cov)

    def timed(fn):
        def make_loop(nreps: int):
            @jax.jit
            def run(frames):
                def body(i, acc):
                    out = fn(frames + i.astype(jnp.float32) * 1e-6, None,
                             *args)
                    return acc + sum(
                        jnp.sum(x).astype(jnp.float32)
                        for x in jax.tree_util.tree_leaves(out)[:3]
                    )

                return jax.lax.fori_loop(0, nreps, body, jnp.float32(0.0))

            return lambda: run(frames)

        return _loop_diff_seconds(make_loop)

    t_scan = timed(graph._lattice_fn)
    on_tpu = jax.default_backend() == "tpu"
    t_kern = timed(graph._lattice_fn_pallas) if on_tpu else None
    best = t_kern if t_kern is not None else t_scan
    audio_s = n_frames * 0.010
    return {
        "metric": f"lattice-recording pass for N-best serving "
                  f"({vocab}-word lexicon)",
        "value": round(audio_s / best, 2),
        "unit": "audio-seconds/s",
        "frames": n_frames,
        "scan_seconds": round(t_scan, 4),
        "pallas_seconds": None if t_kern is None else round(t_kern, 4),
        "backend": jax.default_backend(),
    }


def bench_dense_kernel(n: int, t_len: int, repeats: int = 5) -> dict:
    import jax
    import jax.numpy as jnp

    from lnasr_tpu.ops.trellis import viterbi_scan
    from lnasr_tpu.ops.trellis_pallas import viterbi_pallas_dense

    rng = np.random.default_rng(1)
    log_a = jnp.asarray(
        np.log(rng.dirichlet(np.ones(n), size=n)).astype(np.float32)
    )
    log_pi = jnp.asarray(np.log(rng.dirichlet(np.ones(n))).astype(np.float32))
    log_b = jnp.asarray(rng.normal(size=(t_len, n)).astype(np.float32))

    on_tpu = jax.default_backend() == "tpu"

    def timed(decode):
        def make_loop(nreps: int):
            @jax.jit
            def run(log_b):
                def body(i, acc):
                    path, score = decode(log_b + i.astype(jnp.float32) * 1e-6)
                    return acc + score + path.sum().astype(jnp.float32)

                return jax.lax.fori_loop(0, nreps, body, jnp.float32(0.0))

            return lambda: run(log_b)

        return _loop_diff_seconds(make_loop)

    def scan_decode(lb):
        res = viterbi_scan(log_pi, log_a, lb)
        return res.path, res.score

    res = _sync(jax.jit(scan_decode)(log_b))
    t_scan = timed(scan_decode)

    if on_tpu:
        path, score = _sync(viterbi_pallas_dense(log_pi, log_a, log_b))
        t_kern = timed(lambda lb: viterbi_pallas_dense(log_pi, log_a, lb))
        identical = bool(np.array_equal(np.asarray(path), np.asarray(res[0])))
    else:
        t_kern, identical = float("nan"), None

    row = {
        "metric": f"dense Pallas Viterbi vs lax.scan (N={n}, T={t_len})",
        "value": round(t_scan / t_kern, 2) if on_tpu else None,
        "unit": "x speedup over scan",
        "scan_seconds": round(t_scan, 5),
        "kernel_seconds": round(t_kern, 5) if on_tpu else None,
        "paths_bit_identical": identical,
        "backend": jax.default_backend(),
    }
    if on_tpu:
        n_pad = max(128, -(-n // 128) * 128)
        # fwd: (N,N) cand add + sublane max + 2 exact relayouts; back:
        # O(N) equality scan per step
        vpu = t_len * (2 * n_pad * n_pad + 6 * n_pad)
        mxu = t_len * 2 * (n_pad // 128) * 2 * 128 * 384 * 128
        hbm = t_len * 2 * n_pad * 4  # emissions in, max rows kept in VMEM
        t_vpu, t_mxu, t_hbm = vpu / _VPU_ELEMOPS, mxu / _MXU_FLOPS, hbm / _HBM_BPS
        floor = max(t_vpu, t_mxu, t_hbm)
        row["sol"] = {
            "vpu_elemops": vpu, "mxu_flops": mxu, "hbm_bytes": hbm,
            "limiter": {t_vpu: "vpu", t_mxu: "mxu", t_hbm: "hbm"}[floor],
            "pct_sol": round(100.0 * floor / t_kern, 2),
        }
    return row


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--vocab", type=int, default=1000)
    ap.add_argument("--frames", type=int, default=2000)
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--t", type=int, default=500)
    ap.add_argument("--out", default="BENCH_DECODER.json")
    args = ap.parse_args(argv)

    benches = [
        ("factored_1k", lambda: bench_factored_decode(args.vocab, args.frames)),
        ("lattice_1k", lambda: bench_lattice(args.vocab, args.frames)),
        ("dense_kernel", lambda: bench_dense_kernel(args.n, args.t)),
        ("large_vocab_5k", lambda: bench_large_vocab(5000, args.t)),
        ("large_vocab_10k",
         lambda: bench_large_vocab(10000, args.t, with_dense=False)),
    ]
    rows = []
    failed = False
    for name, fn in benches:
        # print incrementally and survive one bench faulting the device
        # (a tunnel/TPU fault must not discard the completed rows)
        try:
            r = fn()
        except Exception as e:  # noqa: BLE001 - record and continue
            r = {"metric": name, "error": f"{type(e).__name__}: {e}"}
            failed = True
        rows.append(r)
        print(json.dumps(r), flush=True)
    if args.out:
        with open(args.out, "w", encoding="utf-8") as fp:
            json.dump(rows, fp, indent=2)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
