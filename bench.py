#!/usr/bin/env python3
"""Headline benchmark: audio-seconds decoded per second, MFCC + GMM-HMM
Viterbi (BASELINE.json metric).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio-seconds/s", "vs_baseline": N}

``value`` is the jit-compiled batched pipeline on the default JAX device
(one TPU chip under the driver). ``vs_baseline`` divides by the
reference's CPU formulation measured in-process: vectorized-NumPy MFCC
(exactly the reference's array style, ``lnasr/mfcc.py:108-175``) plus the
reference's per-cell Python-loop trellis with a log-sum-exp per cell
(``lnasr/hmm.py:97-99,162-166``) and per-component emission loops
(``lnasr/gmmhmm.py:64-66``), on the same model topology (5 states x 8
diagonal mixtures, 39-dim — BASELINE.json config 4).
"""

import json
import sys
import time

import numpy as np

SR = 16000
N_STATES, N_MIX, DIM = 5, 8, 39
BATCH = 64
UTT_SECONDS = 10.0
TPU_REPS = 10
BASELINE_SECONDS = 2.0  # audio length for the (slow) reference-style run
_TRIALS = 3  # best-of trials for both device and CPU timings


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


def tpu_throughput() -> float:
    """Device throughput via the loop-difference method.

    Timing individual dispatches is unreliable on tunneled TPU backends:
    ``block_until_ready`` can return before execution completes, and every
    dispatch/fetch pays a large RPC round trip. Instead the whole pipeline
    runs ``n`` times inside one on-device ``lax.fori_loop`` (the input is
    perturbed per iteration so no two trips are identical), the jit returns
    a scalar reduction, and a host fetch of that scalar forces true
    completion. Timing n=1 vs n=1+TPU_REPS and dividing the difference by
    TPU_REPS cancels the fixed dispatch/fetch overhead exactly.
    """
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

    def pipeline_once(signals):
        # fused Pallas frontend (framing+DFT+power+mel in VMEM, 3-pass
        # split-bf16 DFT, ~2^-18 relative error — ops/mfcc_pallas.py)
        feats, _ = mfcc_features_fused(signals, cfg, dtype=dtype)
        log_b = jax.vmap(lambda f: gmm_emissions_diag(f, log_w, mu, var)[0])(feats)
        return viterbi_pallas(log_pi, log_a, log_b)

    def make_loop(nreps: int):
        @jax.jit
        def run(signals):
            def body(i, acc):
                paths, scores = pipeline_once(signals + i.astype(dtype) * 1e-6)
                return acc + scores.sum() + paths.sum().astype(dtype)

            return jax.lax.fori_loop(0, nreps, body, jnp.asarray(0.0, dtype))

        return run

    audio = jnp.asarray(_make_audio(BATCH, UTT_SECONDS)).astype(dtype)
    run_1, run_n = make_loop(1), make_loop(1 + TPU_REPS)
    np.asarray(run_1(audio)), np.asarray(run_n(audio))  # compile + warm up

    def timed(fn) -> float:
        best = float("inf")
        for _ in range(_TRIALS):
            start = time.perf_counter()
            np.asarray(fn(audio))  # fetch forces real completion
            best = min(best, time.perf_counter() - start)
        return best

    per_call = (timed(run_n) - timed(run_1)) / TPU_REPS
    return BATCH * UTT_SECONDS / per_call


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


def baseline_throughput() -> float:
    rng = np.random.default_rng(0)
    log_a, log_pi, log_w, mu, var = _model_params(rng)
    audio = _make_audio(1, BASELINE_SECONDS)[0]
    best = 0.0
    for _ in range(3):  # best-of-3: shields the CPU baseline from host noise
        start = time.perf_counter()
        feats = _reference_mfcc(audio)
        log_b = _reference_emissions(feats, log_w, mu, var)
        _reference_viterbi(log_pi, log_a, log_b)
        elapsed = time.perf_counter() - start
        best = max(best, BASELINE_SECONDS / elapsed)
    return best


def main():
    value = tpu_throughput()
    base = baseline_throughput()
    print(
        json.dumps(
            {
                "metric": "audio-seconds/s per chip (MFCC + GMM-HMM Viterbi decode)",
                "value": round(value, 2),
                "unit": "audio-seconds/s",
                "vs_baseline": round(value / base, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
