"""Per-solve latency distribution (BASELINE: p99 <= 0.05 s real-time budget).

Measures single-instance warm-started dynamic LTV-MPC tick latency per QP
backend (dense condensed IPM, riccati stage-wise, riccati + delta-form
restart) and writes backend-labeled rows -- VERDICT r4 #8 (the previous
artifact measured the dense path only).
"""

import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    import numpy as np

    from fsae_mpc_tpu.config import MPCParams, MPC_F32, VehicleParams
    from fsae_mpc_tpu.mpc import ltv
    from fsae_mpc_tpu.models import curvilinear as cm, integrators
    from fsae_mpc_tpu.ops import ipm
    from fsae_mpc_tpu.track import load_track

    on_tpu = jax.default_backend() != "cpu"
    dtype = jnp.float32 if on_tpu else jnp.float64
    mpc = MPC_F32 if on_tpu else MPCParams()
    base = ipm.F32_OPTS if on_tpu else ipm.IpmOptions(max_iters=16,
                                                      adaptive=False)
    track, _ = load_track("data/fsg2019.csv", dtype=dtype)
    params = VehicleParams()
    N = mpc.n_steps

    f = lambda x, u: cm.f_curv_dyn_only(x, u, track, params)
    step = lambda x, u: integrators.rk4_step(f, x, u, mpc.dt)

    t = mpc.dt * np.arange(1, N + 1)
    x_lin = jnp.asarray(np.concatenate(
        [(8.0 * t)[:, None], np.zeros((N, 2)), np.full((N, 1), 8.0),
         np.zeros((N, 3))], axis=1), dtype)
    u_lin = jnp.zeros((N, 2), dtype)
    x0 = jnp.asarray([0.0, 0.1, 0.0, 8.0, 0.0, 0.0, 0.0], dtype)

    def measure(backend, opts):
        def tick(x0, x_lin, u_lin, warm):
            v = jnp.minimum(x0[3] + 10.0 * mpc.dt
                            * jnp.arange(1, N + 1, dtype=dtype), 20.0)
            x_ref = (jnp.zeros((N, 7), dtype).at[:, 3].set(v)
                     .at[:, 0].set(x0[0] + jnp.cumsum(v * mpc.dt)))
            res = ltv.ltv_mpc_dynamic(x0, x_ref, track, params, mpc, x_lin,
                                      u_lin, opts, warm=warm,
                                      backend=backend)
            return step(x0, res.u_opt[0]), res.x_opt, res.u_opt, res.qp

        tick_j = jax.jit(tick)
        carry = tick_j(x0, x_lin, u_lin, None)
        tick_w = jax.jit(lambda c: tick(*c))
        carry = tick_w(carry)
        jax.block_until_ready(carry[0])
        samples = []
        for _ in range(100):
            t0 = time.perf_counter()
            carry = tick_w(carry)
            jax.block_until_ready(carry[0])
            samples.append(time.perf_counter() - t0)
        s = np.asarray(samples)
        return {
            "qp_backend": backend,
            "preset": ("F32_OPTS" if opts is base else "restart1(8it)"),
            "samples": int(s.size),
            "mean_ms": round(float(s.mean() * 1e3), 3),
            "median_ms": round(float(np.median(s) * 1e3), 3),
            "p99_ms": round(float(np.percentile(s, 99) * 1e3), 3),
            "max_ms": round(float(s.max() * 1e3), 3),
            "within_budget": bool(np.percentile(s, 99) <= 0.05),
        }

    r_opts = dataclasses.replace(base, refine_restart=1, refine_iters=8)
    rows = [measure("dense", base), measure("riccati", base),
            measure("riccati", r_opts)]
    for r in rows:
        print(r, flush=True)
    payload = {
        "metric": "solve_latency",
        "backend": jax.default_backend(),
        "regime": "single-instance warm dynamic-LTV tick (N=40); on the "
                  "axon tunnel backend each dispatch includes the host "
                  "round trip (~13 ms), so device-only latency is lower",
        "budget_ms": 50.0,
        "rows": rows,
    }
    with open("LATENCY.json", "w") as fh:
        json.dump(payload, fh, indent=1)
    print("wrote LATENCY.json")


if __name__ == "__main__":
    main()
