"""Scaling-efficiency benchmark over the device mesh.

Runs the batched warm-started MPC tick at a fixed per-device batch on 1
device and on all devices; efficiency = throughput(all) /
(throughput(1) * n_devices).  BASELINE target: >= 80% at 2+ hosts (the
solves are embarrassingly parallel; only metric reductions communicate, so
efficiency should be near 1 on any mesh).

NOTE: on the CPU backend the "devices" are virtual (one physical socket), so
the measured efficiency there only validates the mechanics, not scaling --
run on a real multi-chip/multi-host mesh for meaningful numbers.
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


def main():
    import jax
    n_all = len(jax.devices())
    tput1 = run(1)
    tputN = run(n_all)
    eff = tputN / (tput1 * n_all)
    print(json.dumps({
        "metric": "scaling_efficiency",
        "devices": n_all,
        "throughput_1dev": round(tput1, 1),
        "throughput_all": round(tputN, 1),
        "efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
