"""Scaling benchmark -> SCALING.json (BASELINE scaling-efficiency row).

Two sections, selected by backend:

  CPU (virtual 8-device mesh):  shard_map efficiency mechanics --
      throughput at a fixed per-device batch on 1 vs all devices;
      efficiency = throughput(all) / (throughput(1) * n).  The devices
      share one socket, so this validates the sharded program (no
      unexpected collectives/resharding), not real scaling.
  TPU (one real chip):  batch-size throughput curve 1 -> 2048 for the
      warm receding-horizon tick -- the single-chip scaling axis that
      multi-chip data parallelism replicates (solves are embarrassingly
      parallel; BASELINE >= 80% efficiency at 2+ hosts follows from the
      absence of cross-shard communication in the layout, see
      parallel/mesh.py and MULTICHIP_r03.json).

Run both:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_bench.py
    python scripts/scaling_bench.py
"""

import json
import sys
import time

sys.path.insert(0, ".")


def run(n_devices, per_device_batch=128):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fsae_mpc_tpu.config import MPCParams, MPC_F32, VehicleParams
    from fsae_mpc_tpu.mpc import ltv
    from fsae_mpc_tpu.ops import ipm
    from fsae_mpc_tpu.parallel import make_mesh, shard_batch, BATCH_AXIS
    from fsae_mpc_tpu.track import load_track

    on_tpu = jax.default_backend() != "cpu"
    dtype = jnp.float32 if on_tpu else jnp.float64
    mpc = MPC_F32 if on_tpu else MPCParams(n_steps=16)
    opts = ipm.F32_OPTS if on_tpu else ipm.IpmOptions(max_iters=8,
                                                      adaptive=False)
    track, _ = load_track("data/fsg2019.csv", dtype=dtype)
    params = VehicleParams()
    N = mpc.n_steps
    B = per_device_batch * n_devices

    mesh = make_mesh(n_devices)
    sh = NamedSharding(mesh, P(BATCH_AXIS))

    rng = np.random.default_rng(0)
    t = mpc.dt * np.arange(1, N + 1)
    x_lin = np.zeros((B, N, 7)); x_lin[:, :, 0] = 8 * t; x_lin[:, :, 3] = 8.0
    u_lin = np.zeros((B, N, 2))
    x0 = np.zeros((B, 7)); x0[:, 1] = rng.uniform(-0.2, 0.2, B); x0[:, 3] = 8.0

    def one(x0, x_lin, u_lin):
        v = jnp.minimum(x0[3] + 10 * mpc.dt
                        * jnp.arange(1, N + 1, dtype=dtype), 20.0)
        x_ref = (jnp.zeros((N, 7), dtype).at[:, 3].set(v)
                 .at[:, 0].set(x0[0] + jnp.cumsum(v * mpc.dt)))
        return ltv.ltv_mpc_dynamic(x0, x_ref, track, params, mpc, x_lin,
                                   u_lin, opts).u_opt

    fn = jax.jit(jax.vmap(one), in_shardings=(sh, sh, sh), out_shardings=sh)
    args = [shard_batch(jnp.asarray(a, dtype), mesh)
            for a in (x0, x_lin, u_lin)]
    out = fn(*args); out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(5):
        out = fn(*args)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / 5
    return B / dt


def batch_curve():
    """On-chip batch 1 -> 4096 throughput curve (warm ticks), dense AND
    riccati backends (VERDICT r4 #8: backend-labeled rows)."""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    sys.path.insert(0, "scripts")
    from perf_variants import measure
    from fsae_mpc_tpu.ops import ipm
    rows = []
    for backend in ("riccati", "dense"):
        for batch in (1, 8, 64, 256, 1024, 2048, 4096):
            sps, _ = measure(ipm.F32_OPTS, batch=batch, backend=backend)
            rows.append({"backend": backend, "batch": batch,
                         "solves_per_sec": round(sps, 1),
                         "ms_per_tick": round(batch / sps * 1e3, 3)})
            print(rows[-1], flush=True)
    return rows


def _merge(section, payload):
    import os
    data = {}
    if os.path.exists("SCALING.json"):
        with open("SCALING.json") as fh:
            data = json.load(fh)
    data[section] = payload
    with open("SCALING.json", "w") as fh:
        json.dump(data, fh, indent=1)
    print("wrote SCALING.json section:", section)


def main():
    # the container pins the axon/TPU backend via sitecustomize; an env
    # var alone does not switch it -- force through jax.config
    import os
    import jax
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")
    if jax.default_backend() == "cpu":
        # Virtual devices share one socket, so classic scaling efficiency
        # is meaningless here.  The honest mechanics metric is SHARDING
        # OVERHEAD at fixed total work: the same 1024-solve batch run
        # unsharded on 1 device vs sharded over all 8 -- near 1.0 means
        # the sharded program introduces no extra collectives/resharding
        # (real cross-chip scaling then follows from the layout's absence
        # of communication; see MULTICHIP_r03.json for the 8-way dryrun).
        n_all = len(jax.devices())
        tput1 = run(1, per_device_batch=1024)
        tputN = run(n_all, per_device_batch=1024 // n_all)
        payload = {
            "devices": n_all,
            "total_batch": 1024,
            "throughput_unsharded": round(tput1, 1),
            "throughput_sharded": round(tputN, 1),
            "sharding_overhead_ratio": round(tput1 / tputN, 3),
            "note": "virtual CPU devices (one socket): fixed-total-work "
                    "sharding-overhead check, not hardware scaling",
        }
        print(json.dumps(payload))
        _merge("virtual_mesh_sharding_overhead", payload)
    else:
        _merge("tpu_batch_curve", {
            "regime": "warm receding-horizon dynamic LTV, N=40, F32_OPTS",
            "rows": batch_curve()})


if __name__ == "__main__":
    main()
