"""Multi-host data-parallel Baum-Welch launcher.

Run the SAME command on every host of a slice / CPU cluster:

    python examples/multihost_train.py \
        --coordinator HOST0:8765 --num-processes 2 --process-id $I

or with no flags on (a) a TPU pod, where JAX auto-detects the topology,
or (b) a single machine, where it degenerates to one process (this is
what CI exercises; pass --fake-devices 8 to shard over virtual CPU
devices).

Flow — the production shape of the framework's DP training path:

1. `parallel.distributed.initialize` wires the processes into one JAX
   runtime (jax.devices() spans the slice; collectives ride ICI/DCN);
2. each process materializes ONLY its slice of the global batch
   (`process_local_slice` — hosts never load each other's audio);
3. `jax.make_array_from_process_local_data` assembles the global sharded
   batch, and the `make_dp_gmmhmm_em_step` program runs with parameters
   replicated and statistics psum'd across the 'data' axis.

The reference has no distributed layer at all (SURVEY.md §2.4).
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--coordinator", default=None, help="HOST:PORT of process 0")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--fake-devices", type=int, default=0,
                    help="virtual CPU devices for a single-machine demo")
    ap.add_argument("--global-batch", type=int, default=32)
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args(argv)

    if args.fake_devices:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.fake_devices)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lnasr_tpu.config import GMMHMMConfig
    from lnasr_tpu.models.gmmhmm import GMMHMM
    from lnasr_tpu.parallel import make_dp_gmmhmm_em_step, make_mesh, mesh_shape_for
    from lnasr_tpu.parallel.distributed import initialize, process_local_slice

    initialize(args.coordinator, args.num_processes, args.process_id)
    n_dev = len(jax.devices())
    print(f"process {jax.process_index()}/{jax.process_count()}: "
          f"{len(jax.local_devices())} local / {n_dev} global devices")

    cfg = GMMHMMConfig(n_states=5, n_mix=4, dim=13)
    mesh = make_mesh(mesh_shape_for(n_dev, data=n_dev))
    sharding = NamedSharding(mesh, P("data"))

    # every process loads ONLY its slice of the global batch (here:
    # synthesized deterministically from the global index, standing in for
    # per-host manifest reads)
    lo, hi = process_local_slice(args.global_batch)
    rng = np.random.default_rng(0)
    all_obs = rng.normal(
        size=(args.global_batch, args.frames, cfg.dim)
    ).astype(np.float32) + np.sin(np.arange(args.frames))[None, :, None]
    local_obs = all_obs[lo:hi]
    local_mask = np.ones(local_obs.shape[:2], bool)

    obs = jax.make_array_from_process_local_data(sharding, local_obs)
    mask = jax.make_array_from_process_local_data(sharding, local_mask)

    model = GMMHMM(cfg, dtype=jnp.float32)
    model.init_from_data(local_obs.reshape(-1, cfg.dim), jax.random.PRNGKey(0))
    step = make_dp_gmmhmm_em_step(mesh, cfg)

    params = model.params
    prev = None
    for it in range(args.iters):
        params, loglik = step(params, obs, mask)
        loglik = float(loglik)
        if jax.process_index() == 0:
            print(f"iter {it}: loglik {loglik:.2f}")
        assert np.isfinite(loglik)
        assert prev is None or loglik >= prev - 1e-3, "EM must not regress"
        prev = loglik
    model._set_params(params)
    if jax.process_index() == 0:
        print("done: multi-host DP EM converging")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
