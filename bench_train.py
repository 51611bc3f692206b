#!/usr/bin/env python3
"""Training-throughput benchmark: Baum-Welch EM sweep audio-seconds/s on
the flagship topology, measured on the default device.

The round artifacts previously measured decode only, so a training-path
regression was invisible (round-3 verdict #5). This bench times one full
``gmmhmm_em_step`` sweep — emissions, forward/backward scans, posterior
statistics, M-step — at the headline geometry (B=64 utterances x 10 s,
5 states x 8 mixtures x 39 dims, diagonal covariance), plus the emission
stage alone with speed-of-light accounting for its E-step GEMM.

Timing uses the same loop-difference method as ``bench.py`` (see its
module docstring): ``n`` EM sweeps chained inside one on-device
``lax.fori_loop`` (parameters carried iteration to iteration, as a real
training loop would), timed at n=1 and n=1+REPS, difference / REPS.

Writes ``BENCH_TRAIN_r{N}.json`` when ``--out`` is given, else prints the
JSON to stdout.
"""

import argparse
import json
import statistics
import time

import numpy as np

from bench import (
    BATCH,
    DIM,
    N_MIX,
    N_STATES,
    SR,
    TPU_REPS,
    UTT_SECONDS,
    _chip_peaks,
    _enable_compile_cache,
    _make_audio,
    _model_params,
)

TRAIN_REPS = 20  # EM sweeps are ~10x the decode pipeline; 20 suffices


def measurements(trials: int = 5, reps: int = TRAIN_REPS):
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from lnasr_tpu.config import MFCCConfig
    from lnasr_tpu.models.gmmhmm import GMMHMMParams, gmmhmm_em_step
    from lnasr_tpu.models.mfcc import mfcc_features_fused
    from lnasr_tpu.ops.gaussian import gmm_emissions_diag

    dtype = jnp.float32
    cfg = MFCCConfig(energy_floor=1e-10)
    rng = np.random.default_rng(0)
    log_a, log_pi, log_w, mu, var = (jnp.asarray(p, dtype) for p in _model_params(rng))
    params0 = GMMHMMParams(log_a=log_a, log_pi=log_pi, log_w=log_w, mu=mu, cov=var)

    audio = jnp.asarray(_make_audio(BATCH, UTT_SECONDS)).astype(dtype)
    feats = mfcc_features_fused(audio, cfg, passes=3, dtype=dtype)[0]
    feats.block_until_ready()
    t_frames = int(feats.shape[1])
    mask = jnp.ones((BATCH, t_frames), bool)

    def em_chain(nreps):
        @jax.jit
        def run(p0, obs, mk):
            def body(i, p):
                new_p, _ = gmmhmm_em_step(p, obs, mk)
                return new_p

            p = jax.lax.fori_loop(0, nreps, body, p0)
            return sum(jnp.sum(x) for x in p)

        return lambda: np.asarray(run(params0, feats, mask))

    def emissions_chain(nreps):
        @jax.jit
        def run(obs):
            def body(i, acc):
                log_b = jax.vmap(
                    lambda f: gmm_emissions_diag(
                        f + i.astype(dtype) * 1e-6, log_w, mu, var
                    )[0]
                )(obs)
                return acc + jnp.sum(log_b)

            return jax.lax.fori_loop(0, nreps, body, jnp.asarray(0.0, dtype))

        return lambda: np.asarray(run(feats))

    def per_call_trials(make, nreps):
        run_1, run_n = make(1), make(1 + nreps)
        run_1(), run_n()  # compile + warm
        samples = []
        for _ in range(trials):
            t0 = time.perf_counter()
            run_1()
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            run_n()
            tn = time.perf_counter() - t0
            samples.append((tn - t1) / nreps)
        return samples

    em_samples = per_call_trials(em_chain, reps)
    # the emission GEMM alone runs in ~70 us; 500 reps puts the timing
    # window at ~35 ms so +-ms tunnel jitter is a few-percent effect
    # (at 100 reps this stage measured ABOVE speed of light)
    emis_samples = per_call_trials(emissions_chain, 5 * TPU_REPS)

    device = jax.devices()[0]
    peaks = _chip_peaks(device.device_kind)

    # E-step emission GEMM speed of light: (B*T, 80)@(80, 128) at
    # HIGHEST precision (6 bf16 passes; contraction 2D+1=79 padded to the
    # 8-sublane tile, N*M=40 components padded to 128 lanes). HBM floor:
    # features in, (B, T, N) state log-likelihoods + (B, T, N, M)
    # component log-densities out (the E-step consumes both).
    bt = BATCH * t_frames
    emis_flops = 6 * 2 * bt * 80 * 128
    emis_bytes = bt * (DIM * 4 + N_STATES * 4 + N_STATES * N_MIX * 4)
    emis_s = statistics.median(emis_samples)
    emis = {
        "mxu_flops": emis_flops,
        "hbm_bytes": emis_bytes,
        "seconds_per_call": emis_s,
        "audio_s_per_s": BATCH * UTT_SECONDS / emis_s,
        "achieved_tflops": emis_flops / emis_s / 1e12,
        "achieved_gbps": emis_bytes / emis_s / 1e9,
        "trials_s": [round(s, 6) for s in emis_samples],
    }
    if peaks is not None:
        t_f = emis_flops / peaks[0]
        t_b = emis_bytes / peaks[1]
        emis["limiter"] = "mxu" if t_f >= t_b else "hbm"
        emis["pct_sol"] = 100.0 * max(t_f, t_b) / emis_s

    sweeps = sorted(BATCH * UTT_SECONDS / s for s in em_samples)
    return {
        "device": device.device_kind,
        "sweep_throughputs": sweeps,
        "sweep_trials_s": [round(s, 6) for s in em_samples],
        "emissions": emis,
        "t_frames": t_frames,
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--reps", type=int, default=TRAIN_REPS)
    ap.add_argument("--out", default=None, help="write JSON here instead of stdout")
    args = ap.parse_args(argv)

    meas = measurements(trials=args.trials, reps=args.reps)
    ths = meas["sweep_throughputs"]
    value = statistics.median(ths)
    out = {
        "metric": "EM training sweep audio-seconds/s per chip "
                  "(full Baum-Welch: emissions + fwd/bwd + stats + M-step)",
        "value": round(value, 2),
        "unit": "audio-seconds/s",
        "topology": {"batch": BATCH, "utt_seconds": UTT_SECONDS,
                     "n_states": N_STATES, "n_mix": N_MIX, "dim": DIM,
                     "t_frames": meas["t_frames"], "cov_type": "diag"},
        "spread": {
            "median": round(value, 2),
            "min": round(ths[0], 2),
            "max": round(ths[-1], 2),
            "trials": [round(t, 2) for t in ths],
        },
        "seconds_per_sweep": round(statistics.median(meas["sweep_trials_s"]), 6),
        "stages": {
            "emissions": {
                k: (round(v, 3) if isinstance(v, float) else v)
                for k, v in meas["emissions"].items()
            }
        },
        "note": "the non-GEMM remainder (forward/backward scans, posterior "
                "reductions) is latency-bound on the T-step recurrence, "
                "not flops-bound; see docs/performance.md",
        "device": meas["device"],
    }
    line = json.dumps(out)
    if args.out:
        with open(args.out, "w", encoding="utf-8") as fp:
            fp.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
