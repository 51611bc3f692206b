#!/usr/bin/env python3
"""Headline benchmark: audio-seconds decoded per second, MFCC + GMM-HMM
Viterbi (BASELINE.json metric).

Prints ONE JSON line with the headline median plus the evidence needed to
tell a real regression from tunnel noise:

  {"metric": ..., "value": <median>, "unit": "audio-seconds/s",
   "vs_baseline": <value / pinned CPU baseline>,
   "spread": {"median": .., "min": .., "max": .., "trials": [..]},
   "stages": {"frontend": {...}, "emissions": {...}, "viterbi": {...}},
   "device": "...", "baseline": {"value": .., "provenance": "..."}}

Each stage entry carries its measured per-call seconds, its audio-s/s,
and speed-of-light accounting (MXU-issue FLOPs / minimal HBM traffic vs
chip peaks, and which limiter binds). See docs/performance.md for the
derivations.

Timing method. Individual dispatches are untimeable on tunneled TPU
backends: every dispatch/fetch pays a large, *noisy* RPC round trip.
The whole pipeline therefore runs ``n`` times inside one on-device
``lax.fori_loop`` (input perturbed per iteration), the jit returns a
scalar reduction, and a host fetch forces completion. Timing n=1 vs
n=1+REPS and dividing the difference by REPS cancels the fixed overhead.
REPS must dwarf the RPC jitter: at REPS=10 (rounds 1-2) the measurement
window is ~20 ms, so +/-10 ms of tunnel jitter moved the headline by
~50% — the r01 593k vs r02 351k "regression" was this noise, not the
kernels (bench-path code was unchanged between rounds). At REPS=100 the
window is ~200 ms and the same jitter is a ~5% effect; the median over
``--trials`` independent differences is the reported value.

The ``vs_baseline`` denominator is a PINNED constant (below) — the
reference's CPU formulation re-measured per run drifted 34% between
rounds with host load, poisoning the ratio. ``--measure-baseline``
re-derives it for auditing.
"""

import argparse
import json
import statistics
import sys
import time

import numpy as np

SR = 16000
N_STATES, N_MIX, DIM = 5, 8, 39
BATCH = 64
UTT_SECONDS = 10.0
TPU_REPS = 100  # loop-difference reps; see module docstring for why 100
DEFAULT_TRIALS = 5
BASELINE_SECONDS = 2.0  # audio length for the (slow) reference-style run

# Pinned CPU baseline (audio-seconds/s): the reference's own formulation
# (vectorized-NumPy MFCC exactly as lnasr/mfcc.py:108-175, per-cell
# Python-loop Viterbi as hmm.py:162-166, per-component emission loops as
# gmmhmm.py:64-66) on this machine, BASELINE_SECONDS of audio, same
# 5x8x39 diagonal topology. Median of 11 quiet-host trials, 2026-08-21
# (round 3); rounds 1-2 re-measured it per run and got 145-194 depending
# on concurrent load, which is why it is now pinned. Re-derive with
# --measure-baseline.
BASELINE_AUDIO_S_PER_S = 187.0
BASELINE_PROVENANCE = (
    "pinned 2026-08-21 (round 3): median of 11 quiet-host trials of the "
    "reference-style NumPy pipeline on this machine; see bench.py"
)

# Per-chip peaks for speed-of-light accounting, keyed by substrings of
# jax.Device.device_kind. (bf16 MXU TFLOP/s, HBM GB/s.) Public numbers.
_CHIP_PEAKS = {
    "v6": (918e12, 1640e9),  # Trillium
    "v5p": (459e12, 2765e9),
    "v5e": (197e12, 819e9),
    "v5": (197e12, 819e9),
    "v4": (275e12, 1228e9),
    "v3": (123e12, 900e9),
    "v2": (46e12, 700e9),
}


def _make_audio(batch: int, seconds: float, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    n = int(SR * seconds)
    t = np.arange(n) / SR
    f0 = 140.0 + 40.0 * np.sin(2 * np.pi * 0.4 * t)
    base = sum(np.sin(2 * np.pi * k * f0 * t) / k for k in range(1, 6))
    out = []
    for b in range(batch):
        env = 0.5 + 0.5 * np.sin(2 * np.pi * 1.7 * t + b)
        x = base * env * 8000.0 + rng.normal(0, 100.0, n)
        out.append(np.clip(x, -32768, 32767).astype(np.int16))
    return np.stack(out)


def _model_params(rng):
    log_a = np.log(rng.dirichlet(np.ones(N_STATES) * 5, size=N_STATES))
    log_pi = np.log(rng.dirichlet(np.ones(N_STATES)))
    log_w = np.log(rng.dirichlet(np.ones(N_MIX), size=N_STATES))
    mu = rng.normal(scale=10.0, size=(N_STATES, N_MIX, DIM))
    var = rng.uniform(20.0, 80.0, size=(N_STATES, N_MIX, DIM))
    return log_a, log_pi, log_w, mu, var


def _enable_compile_cache():
    """Persistent XLA compile cache: repeat bench runs (and driver rounds)
    skip recompilation, which dominates wall time on tunneled TPUs."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/lnasr_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _chip_peaks(device_kind: str):
    kind = device_kind.lower()
    for key, peaks in _CHIP_PEAKS.items():
        if key in kind:
            return peaks
    return None


def _num_frames(n_samples: int) -> int:
    from lnasr_tpu.config import MFCCConfig
    from lnasr_tpu.ops.framing import num_frames

    cfg = MFCCConfig()
    return num_frames(n_samples, cfg.frame_len, cfg.frame_step)


def _stage_accounting(t_frames: int, dft_passes: int = 3):
    """Analytic MXU-issue FLOPs and minimal HBM bytes per pipeline call.

    "mxu_flops" counts what the MXU actually executes: bf16 passes x
    2*M*K*N on lane-padded shapes (split-bf16 products issue 3 passes at
    the fast setting, 6 at f32-faithful / HIGHEST). "hbm_bytes" is the
    unavoidable traffic: every input read once + every output written
    once (intermediates that stay in VMEM are free). Derivations in
    docs/performance.md ("Speed of light").
    """
    b, t = BATCH, t_frames
    t_pad = _ceil_to(t, 128)
    n_samp = int(SR * UTT_SECONDS)

    # Frontend (ops/mfcc_pallas.py, radix-4 DIF): frames lane-
    # concatenated in VMEM, two exact-f32 butterfly levels, then FOUR
    # quarter-size DFT GEMMs — (T,128)@(128,128) real + 3x (T,256)@
    # (256,128) complex (shared basis) — at ``dft_passes`` bf16 passes
    # (3 fast / 6 f32-faithful), and a mel GEMM (T,512)@(512,128) over
    # the 4-way-permuted filterbank at 3 passes (its operands are
    # non-negative powers: no cancellation, 3-pass is faithful). Input:
    # the reshaped pre-emphasized signal, f32; output: (T_pad,128) mel.
    fe_flops = b * (dft_passes * 2 * t_pad * (128 * 128 + 3 * 256 * 128)
                    + 3 * 2 * t_pad * 512 * 128)
    fe_bytes = b * (n_samp * 4 + t_pad * 128 * 4)

    # Emissions (ops/gaussian.py): one HIGHEST (6-pass) GEMM
    # (B*T, 79)@(79, 40): contraction padded to the 8-sublane tile (80),
    # output lanes to 128.
    em_flops = 6 * 2 * (b * t) * 80 * 128
    em_bytes = b * t * (39 * 4 + (2 * 39 + 1) * 4 + N_STATES * 4)

    # Viterbi (ops/trellis_pallas.py): VPU max-plus, no MXU. HBM: read
    # (T, 8, B) f32 emissions, write (T, B) i32 path; trellis + back-
    # pointers live in VMEM.
    vit_flops = 0
    vit_bytes = t * 8 * b * 4 + t * b * 4

    return {
        "frontend": {"mxu_flops": fe_flops, "hbm_bytes": fe_bytes},
        "emissions": {"mxu_flops": em_flops, "hbm_bytes": em_bytes},
        "viterbi": {"mxu_flops": vit_flops, "hbm_bytes": vit_bytes},
    }


def _sol(entry: dict, seconds: float, peaks):
    """Attach achieved rates and % of speed-of-light to a stage entry."""
    entry["seconds_per_call"] = seconds
    entry["audio_s_per_s"] = BATCH * UTT_SECONDS / seconds
    if seconds > 0:
        entry["achieved_tflops"] = entry["mxu_flops"] / seconds / 1e12
        entry["achieved_gbps"] = entry["hbm_bytes"] / seconds / 1e9
    if peaks is not None and seconds > 0:
        peak_flops, peak_bw = peaks
        t_flops = entry["mxu_flops"] / peak_flops
        t_bw = entry["hbm_bytes"] / peak_bw
        sol_time = max(t_flops, t_bw)
        entry["limiter"] = "mxu" if t_flops >= t_bw else "hbm"
        entry["pct_sol"] = 100.0 * sol_time / seconds
    return entry


def tpu_measurements(trials: int = DEFAULT_TRIALS, reps: int = TPU_REPS):
    """Run the headline pipeline and its stages on the default device."""
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from lnasr_tpu.config import MFCCConfig
    from lnasr_tpu.models.mfcc import mfcc_features_fused
    from lnasr_tpu.ops.gaussian import gmm_emissions_diag
    from lnasr_tpu.ops.trellis_pallas import viterbi_pallas

    dtype = jnp.float32
    cfg = MFCCConfig(energy_floor=1e-10)
    rng = np.random.default_rng(0)
    log_a, log_pi, log_w, mu, var = (jnp.asarray(p, dtype) for p in _model_params(rng))

    def frontend(signals):
        return mfcc_features_fused(signals, cfg, passes=3, dtype=dtype)[0]

    def emissions(feats):
        return jax.vmap(lambda f: gmm_emissions_diag(f, log_w, mu, var)[0])(feats)

    def viterbi(log_b):
        paths, scores = viterbi_pallas(log_pi, log_a, log_b)
        return scores.sum() + paths.sum().astype(dtype)

    def pipeline(signals):
        return viterbi(emissions(frontend(signals)))

    # The SERVING path: exactly what Recognizer/AcousticModel dispatch to
    # on TPU — fused frontend at config.fused_passes (6, f32-faithful)
    # and the product's viterbi_batched entry point. This row exists so
    # the benchmark measures the product, not a bench-only configuration
    # (round-3 verdict).
    from lnasr_tpu.models.mfcc import mfcc_features_fused as serving_frontend
    from lnasr_tpu.ops.trellis_pallas import viterbi_batched

    def serving(signals):
        feats, _ = serving_frontend(signals, cfg, dtype=dtype)  # passes=cfg.fused_passes
        log_b = emissions(feats)
        paths, scores = viterbi_batched(log_pi, log_a, log_b)
        return scores.sum() + paths.sum().astype(dtype)

    audio = jnp.asarray(_make_audio(BATCH, UTT_SECONDS)).astype(dtype)
    feats0 = jax.jit(frontend)(audio)
    feats0.block_until_ready()
    log_b0 = jax.jit(emissions)(feats0)
    log_b0.block_until_ready()

    def make_loop(fn, x, nreps):
        """fn runs nreps times in one on-device fori_loop; the input is
        perturbed per iteration so no two trips are identical."""

        @jax.jit
        def run(arr):
            def body(i, acc):
                out = fn(arr + i.astype(dtype) * 1e-6)
                return acc + jnp.sum(out).astype(dtype)

            return jax.lax.fori_loop(0, nreps, body, jnp.asarray(0.0, dtype))

        return lambda: np.asarray(run(x))

    def per_call_trials(fn, x):
        run_1, run_n = make_loop(fn, x, 1), make_loop(fn, x, 1 + reps)
        run_1(), run_n()  # compile + warm up
        samples = []
        for _ in range(trials):
            t0 = time.perf_counter()
            run_1()
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            run_n()
            tn = time.perf_counter() - t0
            samples.append((tn - t1) / reps)
        return samples

    head_samples = per_call_trials(pipeline, audio)
    serving_samples = per_call_trials(serving, audio)
    stage_samples = {
        "frontend": per_call_trials(frontend, audio),
        "emissions": per_call_trials(emissions, feats0),
        "viterbi": per_call_trials(viterbi, log_b0),
    }

    t_frames = int(feats0.shape[1])
    device = jax.devices()[0]
    peaks = _chip_peaks(device.device_kind)
    stages = _stage_accounting(t_frames)
    for name, acc in stages.items():
        _sol(acc, statistics.median(stage_samples[name]), peaks)
        acc["trials_s"] = [round(s, 6) for s in stage_samples[name]]

    # serving-path SOL: the whole pipeline at the f32-faithful DFT setting
    acc6 = _stage_accounting(t_frames, dft_passes=cfg.fused_passes)
    serving_acc = {
        "mxu_flops": sum(a["mxu_flops"] for a in acc6.values()),
        "hbm_bytes": sum(a["hbm_bytes"] for a in acc6.values()),
        "fused_passes": cfg.fused_passes,
    }
    _sol(serving_acc, statistics.median(serving_samples), peaks)
    serving_acc["trials_s"] = [round(s, 6) for s in serving_samples]

    throughputs = sorted(BATCH * UTT_SECONDS / s for s in head_samples)
    return {
        "device": device.device_kind,
        "throughputs": throughputs,
        "serving_throughputs": sorted(
            BATCH * UTT_SECONDS / s for s in serving_samples
        ),
        "serving_acc": serving_acc,
        "stages": stages,
        "t_frames": t_frames,
    }


def recognizer_serving_measurements(trials: int = DEFAULT_TRIALS,
                                    reps: int = TPU_REPS):
    """Time the PRODUCT's serving objects — ``Recognizer._fused_segment_fn``
    and ``_fused_lattice_fn`` (bucketed fused frontend + composed
    word-graph decode / lattice recording), the callables the CLI
    dispatches — at the demo scale (V~22) and V=1,000 (round-4 verdict
    #8: the serving row re-composed the kernels and timed the 5-state
    unit-model Viterbi, not the composed word-graph search)."""
    import types

    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from lnasr_tpu.config import GMMHMMConfig, MFCCConfig
    from lnasr_tpu.models.decoder import DecoderConfig
    from lnasr_tpu.models.lexicon import Lexicon
    from lnasr_tpu.models.ngram import NGramCounter, NGramModel
    from lnasr_tpu.models.recognizer import (
        AcousticModel,
        LanguageModel,
        Recognizer,
    )

    dtype = jnp.float32
    mfcc_cfg = MFCCConfig(energy_floor=1e-10, mean_norm=False)
    rng = np.random.default_rng(0)

    def make_units(v, n_states=8, n_mix=2):
        # feature-scale synthetic word models (feature std ~28); graph
        # composition duck-types the GMMHMM surface
        means = rng.normal(scale=25.0, size=(v, DIM))
        with np.errstate(divide="ignore"):
            log_a = np.log(
                np.where(np.eye(n_states) + np.eye(n_states, k=1) > 0,
                         0.5, 0.0)
            ).astype(np.float32)
        cfg = GMMHMMConfig(n_states=n_states, n_mix=n_mix, dim=DIM)
        units = {
            f"w{i:04d}": types.SimpleNamespace(
                n=n_states, config=cfg, log_a=log_a,
                log_w=np.full((n_states, n_mix), -np.log(n_mix), np.float32),
                mu=(means[i][None, None, :] + rng.normal(
                    scale=2.0, size=(n_states, n_mix, DIM))).astype(np.float32),
                cov=np.full((n_states, n_mix, DIM), 40.0, np.float32),
            )
            for i in range(v)
        }
        sil_cfg = GMMHMMConfig(n_states=3, n_mix=4, dim=DIM)
        units["<sil>"] = types.SimpleNamespace(
            n=3, config=sil_cfg,
            log_a=np.full((3, 3), -np.log(3), np.float32),
            log_w=np.full((3, 4), -np.log(4), np.float32),
            mu=rng.normal(scale=5.0, size=(3, 4, DIM)).astype(np.float32),
            cov=np.full((3, 4, DIM), 80.0, np.float32),
        )
        return units

    def make_rec(v):
        units = make_units(v)
        names = sorted(u for u in units if u != "<sil>")
        am = AcousticModel(units, mfcc_cfg, dtype=dtype)
        corpus = [
            tuple(["<s>"] + list(rng.choice(names, size=4)) + ["</s>"])
            for _ in range(100)
        ]
        lm = LanguageModel(NGramModel(NGramCounter(2, corpus)))
        return Recognizer(
            am, Lexicon.whole_word(names), lm,
            decoder_config=DecoderConfig(lm_scale=0.5,
                                         word_insertion_penalty=-4.0),
            bucket_frames=128,
            graph="factored",
        )

    bucket_samples = 128 * mfcc_cfg.frame_step
    n_buckets = 4  # ~5 s segments: a realistic VAD segment upper bound
    sig_np = _make_audio(1, n_buckets * bucket_samples / SR)[0]
    audio_s = len(sig_np) / SR

    def timed(fn, sig, n_valid):
        def make(nreps):
            @jax.jit
            def run(sig):
                def body(i, acc):
                    out = fn(sig + i.astype(dtype) * 1e-6, n_valid)
                    return acc + sum(
                        jnp.sum(x).astype(dtype)
                        for x in jax.tree_util.tree_leaves(out)
                    )

                return jax.lax.fori_loop(0, nreps, body,
                                         jnp.asarray(0.0, dtype))

            return lambda: np.asarray(run(sig))

        run_1, run_n = make(1), make(1 + reps)
        run_1(), run_n()
        samples = []
        for _ in range(trials):
            t0 = time.perf_counter()
            run_1()
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            run_n()
            tn = time.perf_counter() - t0
            samples.append((tn - t1) / reps)
        return samples

    rows = {}
    for v in (22, 1000):
        rec = make_rec(v)
        sig = jnp.asarray(sig_np, dtype)
        n_valid = jnp.asarray(len(sig_np) - 80, jnp.int32)
        seg = timed(rec._fused_segment_fn, sig, n_valid)
        lat = timed(rec._fused_lattice_fn, sig, n_valid)
        seg_s = statistics.median(seg)
        lat_s = statistics.median(lat)
        rows[f"v{v}"] = {
            "vocab": v,
            "graph_states": rec.graph.n_states,
            "segment_audio_s": round(audio_s, 2),
            "fused_segment_fn": {
                "seconds_per_dispatch": round(seg_s, 6),
                "audio_s_per_s": round(audio_s / seg_s, 1),
                "trials_s": [round(s, 6) for s in seg],
            },
            "fused_lattice_fn": {
                "seconds_per_dispatch": round(lat_s, 6),
                "audio_s_per_s": round(audio_s / lat_s, 1),
                "trials_s": [round(s, 6) for s in lat],
            },
        }
    rows["note"] = (
        "times the exact jitted callables Recognizer/CLI dispatch "
        "(bucketed fused frontend + composed word-graph decode / "
        "lattice recording) — the product's serving objects, not a "
        "re-composition of their kernels"
    )
    return rows


# ---------------------------------------------------------------------------
# Reference-style CPU pipeline (NumPy arrays + per-cell Python trellis loops)
# ---------------------------------------------------------------------------


def _reference_mfcc(signal: np.ndarray) -> np.ndarray:
    sys.path.insert(0, ".")
    from tests.reference_impl.mfcc_ref import mfcc_ref

    return mfcc_ref(signal)[2]


def _reference_emissions(obs, log_w, mu, var):
    # per-(state, mixture) loop with a vectorized pdf per component, as
    # gmmhmm.py:64-67 (diagonal covariance specialization)
    t_len = obs.shape[0]
    log_bm = np.empty((N_STATES, N_MIX, t_len))
    for j in range(N_STATES):
        for m in range(N_MIX):
            xc = obs - mu[j, m]
            log_bm[j, m] = -0.5 * (
                DIM * np.log(2 * np.pi)
                + np.log(var[j, m]).sum()
                + (xc * xc / var[j, m]).sum(axis=1)
            )
    from scipy.special import logsumexp

    return logsumexp(log_w[:, :, None] + log_bm, axis=1)  # (N, T)


def _reference_viterbi(log_pi, log_a, log_b):
    # per-cell loops with max/argmax per cell, as hmm.py:162-166
    t_len = log_b.shape[1]
    v = np.empty((t_len, N_STATES))
    bt = np.zeros((t_len, N_STATES), dtype=np.uint32)
    v[0] = log_pi + log_b[:, 0]
    for t in range(1, t_len):
        for j in range(N_STATES):
            val = v[t - 1] + log_a[:, j]
            v[t, j] = np.max(val) + log_b[j, t]
            bt[t, j] = np.argmax(val)
    path = np.empty(t_len, dtype=np.uint32)
    path[-1] = np.argmax(v[-1])
    for t in range(t_len - 2, -1, -1):
        path[t] = bt[t + 1, path[t + 1]]
    return path


def measure_baseline(trials: int = 11) -> dict:
    """Re-derive the pinned CPU baseline (run on a QUIET host)."""
    rng = np.random.default_rng(0)
    log_a, log_pi, log_w, mu, var = _model_params(rng)
    audio = _make_audio(1, BASELINE_SECONDS)[0]
    _reference_mfcc(audio)  # warm imports out of the timed region
    samples = []
    for _ in range(trials):
        start = time.perf_counter()
        feats = _reference_mfcc(audio)
        log_b = _reference_emissions(feats, log_w, mu, var)
        _reference_viterbi(log_pi, log_a, log_b)
        samples.append(BASELINE_SECONDS / (time.perf_counter() - start))
    samples.sort()
    return {
        "median": samples[len(samples) // 2],
        "min": samples[0],
        "max": samples[-1],
        "trials": [round(s, 1) for s in samples],
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--trials", type=int, default=DEFAULT_TRIALS)
    ap.add_argument("--reps", type=int, default=TPU_REPS)
    ap.add_argument(
        "--measure-baseline",
        action="store_true",
        help="re-measure the CPU reference baseline instead of benching the TPU",
    )
    args = ap.parse_args(argv)

    if args.measure_baseline:
        print(json.dumps({"baseline_audio_s_per_s": measure_baseline()}))
        return

    meas = tpu_measurements(trials=args.trials, reps=args.reps)
    rec_rows = recognizer_serving_measurements(trials=args.trials,
                                               reps=args.reps)
    ths = meas["throughputs"]
    value = statistics.median(ths)
    stages = {
        name: {
            k: (round(v, 3) if isinstance(v, float) else v)
            for k, v in acc.items()
            if k != "trials_s"
        }
        for name, acc in meas["stages"].items()
    }
    sths = meas["serving_throughputs"]
    serving_value = statistics.median(sths)
    serving = {
        k: (round(v, 3) if isinstance(v, float) else v)
        for k, v in meas["serving_acc"].items()
        if k != "trials_s"
    }
    serving.update(
        {
            "metric": "serving-path audio-seconds/s (Recognizer dispatch: "
                      "fused frontend @ f32-faithful passes + "
                      "viterbi_batched)",
            "value": round(serving_value, 2),
            "vs_headline": round(serving_value / value, 3),
            "spread": {
                "min": round(sths[0], 2),
                "max": round(sths[-1], 2),
                "trials": [round(t, 2) for t in sths],
            },
        }
    )
    print(
        json.dumps(
            {
                "metric": "audio-seconds/s per chip (MFCC + GMM-HMM Viterbi decode)",
                "value": round(value, 2),
                "unit": "audio-seconds/s",
                "vs_baseline": round(value / BASELINE_AUDIO_S_PER_S, 2),
                "spread": {
                    "median": round(value, 2),
                    "min": round(ths[0], 2),
                    "max": round(ths[-1], 2),
                    "trials": [round(t, 2) for t in ths],
                },
                "serving": serving,
                "recognizer_serving": rec_rows,
                "stages": stages,
                "device": meas["device"],
                "baseline": {
                    "value": BASELINE_AUDIO_S_PER_S,
                    "provenance": BASELINE_PROVENANCE,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
