"""Weak-scaling benchmark of the data-parallel EM step.

BASELINE.md's second bar is >=80% scaling efficiency to 2 hosts; real
multi-chip hardware is not available here, so this harness measures the
next-best observable things on an N-virtual-device CPU mesh (the same
code path the TPU mesh runs — shard_map + psum):

- wall time per EM step at 1..8 devices with a FIXED per-device batch;
  weak-scaling efficiency t(1)/t(n) (ideal: constant step time). On a
  shared-core host this measures the framework's sharding + collective
  overhead (the plumbing BASELINE.md's bar is about), not chip compute;
- the collective payload per step, computed exactly from the psum'd
  statistics pytree — the hardware-independent quantity that determines
  ICI traffic on a real slice (O(N^2 + N*M*D) floats, independent of
  batch size and sequence length — see lnasr_tpu/parallel/training.py).

Usage:  python bench_scaling.py [--devices 1,2,4,8] [--batch 8] [--t 200]
Prints one JSON line per device count and a final summary JSON line, and
writes the whole report to BENCH_SCALING.json.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def _setup_devices(max_devices: int) -> None:
    # virtual-mesh harness by design: always host CPU (the env may pin a
    # single-chip remote TPU platform, which can't host an 8-device mesh).
    # Env vars are not enough when the interpreter pre-imports jax, so set
    # the config directly — allowed until backends initialize.
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", max_devices)


def _psum_payload_bytes(params, obs_shard, mask_shard, cov_type: str) -> int:
    """Exact per-device psum payload: the local-statistics pytree the
    E-step reduces across the 'data' axis."""
    import jax

    from lnasr_tpu.parallel.training import _gmm_linear_stats

    shapes = jax.eval_shape(
        lambda p, o, m: _gmm_linear_stats(p, o, m, cov_type),
        params, obs_shard, mask_shard,
    )
    return sum(
        leaf.size * leaf.dtype.itemsize for leaf in jax.tree.leaves(shapes)
    )


def run(device_counts, per_device_batch: int, t_frames: int, steps: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lnasr_tpu.config import GMMHMMConfig
    from lnasr_tpu.models.gmmhmm import GMMHMM
    from lnasr_tpu.parallel import make_dp_gmmhmm_em_step, make_mesh, mesh_shape_for
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = GMMHMMConfig(n_states=5, n_mix=8, dim=39)
    cores = os.cpu_count() or 1
    rng = np.random.default_rng(0)
    rows = []
    t1 = None

    for n in device_counts:
        mesh = make_mesh(
            mesh_shape_for(n, data=n), devices=jax.devices()[:n]
        )
        b = n * per_device_batch
        obs = rng.normal(size=(b, t_frames, cfg.dim)).astype(np.float32)
        mask = np.ones((b, t_frames), bool)
        model = GMMHMM(cfg, dtype=jnp.float32)
        model.init_from_data(obs.reshape(-1, cfg.dim), jax.random.PRNGKey(0))

        obs_d = jax.device_put(obs, NamedSharding(mesh, P("data")))
        mask_d = jax.device_put(mask, NamedSharding(mesh, P("data")))
        step = make_dp_gmmhmm_em_step(mesh, cfg)

        params, loglik = step(model.params, obs_d, mask_d)  # compile+warm
        jax.block_until_ready(loglik)
        c0 = time.process_time()
        t0 = time.perf_counter()
        for _ in range(steps):
            params, loglik = step(params, obs_d, mask_d)
        jax.block_until_ready(loglik)
        dt = (time.perf_counter() - t0) / steps
        cpu_dt = (time.process_time() - c0) / steps

        payload = _psum_payload_bytes(
            model.params, obs[:per_device_batch], mask[:per_device_batch],
            cfg.cov_type,
        )
        if t1 is None:
            t1, cpu1 = dt, cpu_dt
        # HOST CEILING (round-4 verdict #5): n virtual devices share
        # `cores` physical cores, so ideal weak-scaling wall time is NOT
        # flat — it is the n-device COMPUTE (n x the single-device CPU
        # seconds, the measured per-device work) spread over the cores:
        # t_ideal(n) = max(t(1), n*cpu(1)/cores). Efficiency relative to
        # that ceiling separates framework/collective overhead (what
        # this harness can measure) from host saturation (an artifact of
        # oversubscribing a 2-core host, irrelevant to a real slice).
        t_ideal = max(t1, n * cpu1 / cores)
        rows.append({
            "devices": n,
            "per_device_batch": per_device_batch,
            "frames": t_frames,
            "step_seconds": round(dt, 6),
            "cpu_seconds_per_step": round(cpu_dt, 6),
            "utterances_per_s": round(b / dt, 2),
            # weak scaling: per-device work fixed, ideal is t(n) == t(1)
            "weak_scaling_efficiency": round(t1 / dt, 3),
            "host_ceiling_step_seconds": round(t_ideal, 6),
            "ceiling_relative_efficiency": round(min(1.0, t_ideal / dt), 3),
            "speedup_vs_serial": round(n * t1 / dt, 3),
            "psum_payload_bytes_per_device": payload,
            # ring all-reduce moves 2(n-1)/n of the payload per device
            "ring_allreduce_bytes_per_device": int(2 * (n - 1) / n * payload),
        })
        print(json.dumps(rows[-1]))

    max_n = max(device_counts)
    summary = {
        "metric": "dp-em weak-scaling efficiency (virtual CPU mesh)",
        "value": rows[-1]["weak_scaling_efficiency"],
        "unit": f"t(1)/t({max_n}) at fixed per-device batch ({cores}-core host)",
        "devices": device_counts,
        "utterances_per_s": [r["utterances_per_s"] for r in rows],
        "psum_payload_bytes_per_device": rows[-1]["psum_payload_bytes_per_device"],
        "note": "virtual devices share host cores, so this measures the "
                "framework's sharding/collective overhead (plumbing), not "
                "chip-level compute scaling; collective payload is "
                "independent of batch and sequence length",
    }
    print(json.dumps(summary))
    return rows, summary


def run_mp(device_counts, batch: int, t_frames: int, steps: int):
    """Model-parallel EM strong scaling: the SAME 5x8x39 model with its
    mixture axis sharded over 1..n devices (per-device component count
    shrinks), fixed batch. Measures the mixture-sharded step's overhead:
    the distributed emission logsumexp (O(T*N) per sequence) plus the
    O(N) weight normalizer — the traffic that replaces gathering M."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from lnasr_tpu.config import GMMHMMConfig
    from lnasr_tpu.models.gmmhmm import GMMHMM
    from lnasr_tpu.parallel import make_mp_gmmhmm_em_step, mp_param_specs

    cfg = GMMHMMConfig(n_states=5, n_mix=8, dim=39)
    rng = np.random.default_rng(1)
    obs = rng.normal(size=(batch, t_frames, cfg.dim)).astype(np.float32)
    mask = np.ones((batch, t_frames), bool)
    rows = []
    t1 = None
    for n in device_counts:
        if cfg.n_mix % n:
            continue
        mesh = Mesh(np.array(jax.devices()[:n]).reshape(1, n),
                    ("data", "model"))
        model = GMMHMM(cfg, dtype=jnp.float32)
        model.init_from_data(obs.reshape(-1, cfg.dim), jax.random.PRNGKey(0))
        pspecs = mp_param_specs(cfg.cov_type)
        params = type(model.params)(*(
            jax.device_put(x, NamedSharding(mesh, s))
            for x, s in zip(model.params, pspecs)
        ))
        obs_d = jax.device_put(obs, NamedSharding(mesh, P("data")))
        mask_d = jax.device_put(mask, NamedSharding(mesh, P("data")))
        step = make_mp_gmmhmm_em_step(mesh, cfg)
        params, loglik = step(params, obs_d, mask_d)
        jax.block_until_ready(loglik)
        t0 = time.perf_counter()
        for _ in range(steps):
            params, loglik = step(params, obs_d, mask_d)
        jax.block_until_ready(loglik)
        dt = (time.perf_counter() - t0) / steps
        if t1 is None:
            t1, n1 = dt, n  # baseline = first measured count
        rows.append({
            "model_axis": n,
            "components_per_device": cfg.n_mix // n,
            "step_seconds": round(dt, 6),
            # strong scaling vs the first measured count: total work
            # fixed, ideal is t(n) = t(n1) * n1 / n
            "strong_scaling_efficiency": round((n1 * t1) / (n * dt), 3),
            # cross-'model' traffic per sequence: the distributed
            # logsumexp exchanges (T, N) partials, + the O(N) weight
            # normalizer in the M-step
            "model_collective_floats_per_seq": t_frames * cfg.n_states,
        })
        print(json.dumps(rows[-1]))
    if rows:
        rows.append({
            "note": "strong scaling of a 5x8x39 TOY model on shared host "
                    "cores is collective-dominated by construction (8 "
                    "components leave ~no compute to shard); the row's "
                    "point is the measured absolute overhead of the "
                    "mixture-sharded step and its O(T*N) collective "
                    "payload. Shard the mixture axis when N*M*D "
                    "approaches chip memory, not for speed at toy sizes."
        })
    return rows


def run_decode(device_counts, per_device_batch: int, t_frames: int,
               steps: int):
    """Weak-scaling of the DP-sharded batched decode
    (:func:`lnasr_tpu.parallel.decode_batch_sharded`'s jitted core): a
    100-word factored graph replicated, the segment batch sharded over
    ``data`` — the multi-chip serving path."""
    import types

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lnasr_tpu.config import GMMHMMConfig
    from lnasr_tpu.models.decoder import DecoderConfig, FactoredDecodingGraph
    from lnasr_tpu.models.lexicon import Lexicon
    from lnasr_tpu.parallel import make_dp_decode_step, make_mesh, mesh_shape_for

    rng = np.random.default_rng(2)
    cores = os.cpu_count() or 1
    v, dim, n_states = 100, 8, 3
    cfg = GMMHMMConfig(n_states=n_states, n_mix=1, dim=dim)
    means = rng.normal(scale=20.0, size=(v, dim))
    with np.errstate(divide="ignore"):
        log_a = np.log(
            np.where(np.eye(n_states) + np.eye(n_states, k=1) > 0, 0.5, 0.0)
        ).astype(np.float32)
    units = {
        f"w{i:03d}": types.SimpleNamespace(
            n=n_states, config=cfg, log_a=log_a,
            log_w=np.zeros((n_states, 1), np.float32),
            mu=(means[i][None, None, :]
                + rng.normal(scale=0.3, size=(n_states, 1, dim))
                ).astype(np.float32),
            cov=np.full((n_states, 1, dim), 0.1, np.float32),
        )
        for i in range(v)
    }
    graph = FactoredDecodingGraph.build(
        Lexicon.whole_word(sorted(units)), units, None,
        DecoderConfig(loop=True), dtype=jnp.float32,
    )
    rows = []
    t1 = None
    for n in device_counts:
        mesh = make_mesh(mesh_shape_for(n, data=n),
                         devices=jax.devices()[:n])
        b = n * per_device_batch
        feats = jax.device_put(
            jnp.asarray(rng.normal(scale=20.0, size=(b, t_frames, dim))
                        .astype(np.float32)),
            NamedSharding(mesh, P("data", None, None)),
        )
        masks = jax.device_put(jnp.ones((b, t_frames), bool),
                               NamedSharding(mesh, P("data", None)))
        step = make_dp_decode_step(mesh, graph)
        paths, scores = step(feats, masks)  # compile + warm
        jax.block_until_ready(scores)
        c0 = time.process_time()
        t0 = time.perf_counter()
        for _ in range(steps):
            paths, scores = step(feats, masks)
        jax.block_until_ready(scores)
        dt = (time.perf_counter() - t0) / steps
        cpu_dt = (time.process_time() - c0) / steps
        if t1 is None:
            t1, cpu1 = dt, cpu_dt
        # host ceiling: see run() — the decode is compute-bound, so the
        # oversubscribed host, not the sharding, sets the floor here
        t_ideal = max(t1, n * cpu1 / cores)
        rows.append({
            "devices": n,
            "per_device_batch": per_device_batch,
            "vocab": v,
            "step_seconds": round(dt, 6),
            "cpu_seconds_per_step": round(cpu_dt, 6),
            "segments_per_s": round(b / dt, 2),
            "weak_scaling_efficiency": round(t1 / dt, 3),
            "host_ceiling_step_seconds": round(t_ideal, 6),
            "ceiling_relative_efficiency": round(min(1.0, t_ideal / dt), 3),
        })
        print(json.dumps(rows[-1]))
    rows.append({
        "note": f"virtual devices share {cores} host cores and the decode "
                "is compute-bound, so raw weak scaling is bounded by "
                f"cores/devices ({cores}/{max(device_counts)} = "
                f"{cores / max(device_counts):.2f} at the widest mesh); "
                "ceiling_relative_efficiency divides out that measured "
                "host saturation (ideal t(n) = n x single-device CPU "
                "seconds / cores), isolating the sharding overhead the "
                "harness can actually test (no multi-chip hardware "
                "attached)"
    })
    return rows


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--batch", type=int, default=8, help="utterances per device")
    ap.add_argument("--t", type=int, default=200, help="frames per utterance")
    ap.add_argument("--steps", type=int, default=5, help="timed steps")
    ap.add_argument("--out", default="BENCH_SCALING.json")
    args = ap.parse_args(argv)
    counts = [int(x) for x in args.devices.split(",")]
    _setup_devices(max(counts))
    rows, summary = run(counts, args.batch, args.t, args.steps)
    mp_rows = run_mp(counts, args.batch, args.t, args.steps)
    decode_rows = run_decode(counts, args.batch, args.t, args.steps)
    if args.out:
        with open(args.out, "w", encoding="utf-8") as fp:
            json.dump({"rows": rows, "summary": summary,
                       "model_parallel_rows": mp_rows,
                       "dp_decode_rows": decode_rows}, fp, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
