"""On-chip throughput A/B of IPM/tick variants.

Measures warm receding-horizon dynamic-LTV tick throughput (the bench.py
regime) for a set of named solver/tick variants at batch 1024.  Each
non-baseline variant also records ``max_du_vs_shipped``: the max |delta
control| against the shipped F32_OPTS run -- a cross-variant CONSISTENCY
check only, not an accuracy account.  The f32-vs-f64 accuracy accounting
(tight f64 CPU solves of the same production QPs) lives in
scripts/accuracy_onchip.py -> ACCURACY_TPU.json.

Writes PERF_VARIANTS.json.  Run: python scripts/perf_variants.py
"""

import dataclasses
import json
import subprocess
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

from fsae_mpc_tpu.config import MPC_F32, VehicleParams
from fsae_mpc_tpu.mpc import ltv
from fsae_mpc_tpu.models import curvilinear as cm, integrators
from fsae_mpc_tpu.ops import ipm
from fsae_mpc_tpu.track import load_track


def build(batch, dtype, mpc, track, params):
    N = mpc.n_steps
    f = lambda x, u: cm.f_curv_dyn_only(x, u, track, params)
    step = lambda x, u: integrators.rk4_step(f, x, u, mpc.dt)

    def make_ref(x0):
        v = jnp.minimum(x0[3] + 10.0 * mpc.dt
                        * jnp.arange(1, N + 1, dtype=dtype), 20.0)
        return (jnp.zeros((N, 7), dtype).at[:, 3].set(v)
                .at[:, 0].set(x0[0] + jnp.cumsum(v * mpc.dt)))

    rng = np.random.default_rng(0)
    t = mpc.dt * np.arange(1, N + 1)
    x_lin = np.zeros((batch, N, 7))
    x_lin[:, :, 0] = 8.0 * t
    x_lin[:, :, 3] = 8.0
    u_lin = np.zeros((batch, N, 2))
    x0 = np.zeros((batch, 7))
    x0[:, 0] = rng.uniform(0.0, 100.0, batch)
    x0[:, 1] = rng.uniform(-0.2, 0.2, batch)
    x0[:, 3] = 8.0
    args0 = [jnp.asarray(a, dtype) for a in (x0, x_lin, u_lin)]
    return args0, make_ref, step


def measure(opts, batch=1024, n_rep=10, condense="scan",
            structured=False, backend="dense"):
    dtype = jnp.float32
    mpc = MPC_F32
    track, _ = load_track("data/fsg2019.csv", dtype=dtype)
    params = VehicleParams()
    args0, make_ref, step = build(batch, dtype, mpc, track, params)

    def tick(carry):
        x0, x_lin, u_lin, warm = carry
        x_ref = jax.vmap(make_ref)(x0)
        res = jax.vmap(
            lambda a, b, c, d, w: ltv.ltv_mpc_dynamic(
                a, b, track, params, mpc, c, d, opts, warm=w,
                condense=condense, structured=structured, backend=backend)
        )(x0, x_ref, x_lin, u_lin, warm)
        x0_next = jax.vmap(step)(x0, res.u_opt[:, 0])
        return (x0_next, res.x_opt, res.u_opt, res.qp), res.u_opt[:, 0]

    def cold(x0b, x_linb, u_linb):
        x_ref = jax.vmap(make_ref)(x0b)
        return jax.vmap(
            lambda a, b, c, d: ltv.ltv_mpc_dynamic(
                a, b, track, params, mpc, c, d, opts, condense=condense,
                structured=structured, backend=backend)
        )(x0b, x_ref, x_linb, u_linb)

    tick_j = jax.jit(tick)
    res0 = jax.jit(cold)(*args0)
    carry = (args0[0], res0.x_opt, res0.u_opt, res0.qp)
    carry, u = tick_j(carry)
    jax.block_until_ready(u)

    t0 = time.perf_counter()
    for _ in range(n_rep):
        carry, u = tick_j(carry)
    jax.block_until_ready(u)
    dt_run = (time.perf_counter() - t0) / n_rep
    u_np = np.asarray(u)
    assert np.all(np.isfinite(u_np)), "non-finite controls"
    return batch / dt_run, u_np


def main():
    variants = [
        ("F32_OPTS (shipped)", ipm.F32_OPTS, "scan", False),
        ("F32_OPTS + dnc condense", ipm.F32_OPTS, "dnc", False),
        ("F32_OPTS, 10it", dataclasses.replace(ipm.F32_OPTS,
                                               max_iters=10), "scan", False),
        ("F32_ACCURATE", ipm.F32_ACCURATE, "scan", False),
        ("F32_OPTS + pallas condense", ipm.F32_OPTS, "pallas", False),
        ("F32_OPTS + pallas, 10it", dataclasses.replace(
            ipm.F32_OPTS, max_iters=10), "pallas", False),
        ("F32_OPTS + pallas + genrows", ipm.F32_OPTS, "pallas", "gen"),
        ("F32_ACCURATE + pallas + genrows", ipm.F32_ACCURATE, "pallas",
         "gen"),
    ]
    out = {"backend": jax.default_backend(), "batch": 1024,
           "regime": "warm receding-horizon dynamic LTV, N=40",
           "results": []}
    u_ref = None
    for name, opts, cond, structured in variants:
        sps, u = measure(opts, condense=cond, structured=structured)
        row = {"variant": name, "solves_per_sec": round(sps, 1),
               "ms_per_tick": round(1024 / sps * 1e3, 3)}
        if name == "F32_OPTS (shipped)":
            u_ref = u
        else:
            row["max_du_vs_shipped"] = float(np.abs(u - u_ref).max())
        out["results"].append(row)
        print(row, flush=True)
    with open("PERF_VARIANTS.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote PERF_VARIANTS.json")


if __name__ == "__main__":
    main()
