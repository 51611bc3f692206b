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

    # ---- stage chains for the per-stage roofline (round-4 verdict #7:
    # only the emission GEMM had measured accounting; the scan/posterior
    # remainder was an unmeasured claim) -------------------------------
    from lnasr_tpu.models.gmmhmm import _combine_stats, _sequence_stats
    from lnasr_tpu.ops.trellis import backward_scan, forward_scan

    log_b_full = jax.jit(
        jax.vmap(lambda f: gmm_emissions_diag(f, log_w, mu, var)[0])
    )(feats)
    log_b_full.block_until_ready()

    def scans_chain_at(t_sub):
        lb = log_b_full[:, :t_sub]
        mk = mask[:, :t_sub]

        def make(nreps):
            @jax.jit
            def run(lb):
                def body(i, acc):
                    lbi = lb + i.astype(dtype) * 1e-6
                    alpha, ll = jax.vmap(
                        lambda b, m: forward_scan(log_pi, log_a, b, m)
                    )(lbi, mk)
                    beta = jax.vmap(
                        lambda b, m: backward_scan(log_a, b, m)
                    )(lbi, mk)
                    return (acc + jnp.sum(ll)
                            + jnp.sum(alpha[:, -1]) + jnp.sum(beta[:, 0]))

                return jax.lax.fori_loop(0, nreps, body,
                                         jnp.asarray(0.0, dtype))

            return lambda: np.asarray(run(lb))

        return make

    def stats_chain(nreps):
        @jax.jit
        def run(obs):
            def body(i, acc):
                p = GMMHMMParams(log_a=log_a, log_pi=log_pi, log_w=log_w,
                                 mu=mu + i.astype(dtype) * 1e-6, cov=var)
                stats = jax.vmap(
                    lambda o, m: _sequence_stats(p, o, m, "diag")
                )(obs, mask)
                c = _combine_stats(stats)
                return acc + c.loglik + jnp.sum(c.first)

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
    scans_T = per_call_trials(scans_chain_at(t_frames), reps)
    scans_half = per_call_trials(scans_chain_at(t_frames // 2), reps)
    stats_samples = per_call_trials(stats_chain, reps)

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

    # scan latency model from the T-slope (the Viterbi-kernel treatment,
    # docs/performance.md): t(T) = intercept + slope * T for the batched
    # forward+backward recursions; per-step slope IS the recurrence cost
    t_full = statistics.median(scans_T)
    t_half = statistics.median(scans_half)
    slope = max(t_full - t_half, 1e-12) / (t_frames - t_frames // 2)
    scans = {
        "seconds_per_call": round(t_full, 6),
        "seconds_at_half_T": round(t_half, 6),
        "us_per_step": round(slope * 1e6, 3),
        "intercept_s": round(t_full - slope * t_frames, 6),
        "trials_s": [round(s, 6) for s in scans_T],
        # per step the fwd+bwd recursions move 2 * B * N^2 max-plus/lse
        # candidates: B=64, N=5 -> ~6.4k elemops, ~2 ns of VPU issue —
        # the measured slope is therefore recurrence LATENCY (dependent
        # add->lse chains), the same floor the Viterbi kernel hit
        "vpu_floor_us_per_step": round(
            2 * 2 * BATCH * N_STATES * N_STATES / 3.85e12 * 1e6, 5
        ),
    }
    t_stats = statistics.median(stats_samples)
    em_s = statistics.median(em_samples)
    posterior_s = max(t_stats - t_full - emis_s, 0.0)
    # posterior einsums: p (B,T,N,M) twice into (N,M,D) moments at
    # HIGHEST (6 passes), plus the xi/gamma elementwise field
    post_flops = 6 * 2 * 2 * bt * N_STATES * N_MIX * DIM
    post_bytes = bt * N_STATES * N_MIX * 4 * 3  # xi_mix field, exp'd, read
    stages_extra = {
        "fwd_bwd_scans": scans,
        "posterior_reductions": {
            "seconds_derived": round(posterior_s, 6),
            "derived_as": "stats_chain - scans - emissions (measured "
                          "chains; see stats_seconds_per_call)",
            "stats_seconds_per_call": round(t_stats, 6),
            "mxu_flops": post_flops,
            "hbm_bytes": post_bytes,
            "pct_sol": round(
                100.0 * max(post_flops / peaks[0], post_bytes / peaks[1])
                / posterior_s, 2
            ) if (peaks is not None and posterior_s > 0) else None,
            # a derived residual SMALLER than its own analytic floor means
            # the chain difference is inside timing noise at this
            # magnitude — the stage is tens of microseconds against
            # multi-hundred-microsecond chains
            "below_floor_means_noise_limited": bool(
                peaks is not None and posterior_s > 0
                and posterior_s < max(post_flops / peaks[0],
                                      post_bytes / peaks[1])
            ),
        },
        "m_step": {
            "seconds_derived": round(max(em_s - t_stats, 0.0), 6),
            "derived_as": "full EM sweep - stats chain",
        },
    }

    sweeps = sorted(BATCH * UTT_SECONDS / s for s in em_samples)
    return {
        "device": device.device_kind,
        "sweep_throughputs": sweeps,
        "sweep_trials_s": [round(s, 6) for s in em_samples],
        "emissions": emis,
        "stages_extra": stages_extra,
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
            },
            **meas["stages_extra"],
        },
        "note": "every stage now carries measured numbers: the fwd/bwd "
                "scans a T-slope latency model (us/step vs its ~ns VPU "
                "floor - recurrence latency, as the Viterbi kernel), the "
                "posterior einsums a chain-difference with SOL, the "
                "M-step the sweep residual",
        "device": meas["device"],
    }
    line = json.dumps(out)
    if args.out:
        with open(args.out, "w", encoding="utf-8") as fp:
            fp.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
