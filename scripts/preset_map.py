"""Map the accuracy/throughput space between F32_OPTS and F32_ACCURATE.

VERDICT round 3: F32_OPTS runs 13.6k solves/s at 6.6e-2 max first-control
error; F32_ACCURATE certifies 2.8e-3 but at 1.7k solves/s -- a 350x
throughput cliff with nothing mapped between.  This measures each
single-ingredient variant (and cheap combinations) on BOTH axes:

  * throughput: warm receding-horizon dynamic-LTV ticks at batch 1024
    (the bench regime), dense assembly;
  * accuracy:  first-control max / mean / p99 error vs a tight f64 CPU
    solve of the SAME production QPs (scripts/accuracy_onchip.py's npz;
    run its `gen` phase first).

Writes PRESET_MAP.json.  Run ON THE CHIP: python scripts/preset_map.py
"""

import dataclasses
import json
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

NPZ = "/tmp/accuracy_qps.npz"


def throughput(opts, batch=1024, n_rep=8, backend="dense"):
    dtype = jnp.float32
    mpc = MPC_F32
    track, _ = load_track("data/fsg2019.csv", dtype=dtype)
    params = VehicleParams()
    N = mpc.n_steps
    f = lambda x, u: cm.f_curv_dyn_only(x, u, track, params)
    step = lambda x, u: integrators.rk4_step(f, x, u, mpc.dt)

    def make_ref(x0):
        v = jnp.minimum(x0[3] + 10.0 * mpc.dt
                        * jnp.arange(1, N + 1, dtype=dtype), 20.0)
        return (jnp.zeros((N, 7), dtype).at[:, 3].set(v)
                .at[:, 0].set(x0[0] + jnp.cumsum(v * mpc.dt)))

    def tick(carry):
        x0, x_lin, u_lin, warm = carry
        x_ref = jax.vmap(make_ref)(x0)
        res = jax.vmap(
            lambda a, b, c, d, w: ltv.ltv_mpc_dynamic(
                a, b, track, params, mpc, c, d, opts, warm=w,
                condense="pallas", backend=backend)
        )(x0, x_ref, x_lin, u_lin, warm)
        x0_next = jax.vmap(step)(x0, res.u_opt[:, 0])
        return (x0_next, res.x_opt, res.u_opt, res.qp), res.u_opt[:, 0]

    def cold(x0b, x_linb, u_linb):
        x_ref = jax.vmap(make_ref)(x0b)
        return jax.vmap(
            lambda a, b, c, d: ltv.ltv_mpc_dynamic(
                a, b, track, params, mpc, c, d, opts, condense="pallas",
                backend=backend)
        )(x0b, x_ref, x_linb, u_linb)

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
    tick_j = jax.jit(tick)
    res0 = jax.jit(cold)(*args0)
    carry = (args0[0], res0.x_opt, res0.u_opt, res0.qp)
    carry, u = tick_j(carry)
    jax.block_until_ready(u)
    t0 = time.perf_counter()
    for _ in range(n_rep):
        carry, u = tick_j(carry)
    jax.block_until_ready(u)
    return batch / ((time.perf_counter() - t0) / n_rep)


def accuracy(opts):
    z = np.load(NPZ)
    qpf = [jnp.asarray(z[k], jnp.float32)
           for k in ["H", "g", "A", "lb", "ub", "lbA", "ubA"]]
    x64 = z["x64"]
    sol = jax.jit(jax.vmap(lambda *a: ipm.solve_qp(*a, opts)))(*qpf)
    x = np.asarray(sol.x, np.float64)
    du = np.abs(x[:, :80] - x64[:, :80])
    return (float(du[:, :2].max()), float(du.mean()),
            float(np.quantile(du, 0.99)))


def accuracy_riccati(opts):
    from fsae_mpc_tpu.ops import riccati
    z = np.load(NPZ)
    sfields = ["Ad", "Bd", "dd", "x0", "Qx", "qx", "Ru", "ru", "g_s",
               "C", "D", "Ws", "lbA", "ubA", "u_lb", "u_ub", "s_lb",
               "s_ub"]
    sqp = riccati.StageQP(**{k: jnp.asarray(z["s_" + k], jnp.float32)
                             for k in sfields})
    x64 = z["x64"]
    sol = jax.jit(jax.vmap(
        lambda q: riccati.solve_stage_qp(q, opts)))(sqp)
    u = np.asarray(sol.u, np.float64).reshape(len(x64), -1)
    du = np.abs(u - x64[:, :80])
    return (float(du[:, :2].max()), float(du.mean()),
            float(np.quantile(du, 0.99)))


def main():
    base = ipm.F32_OPTS
    variants = [
        ("F32_OPTS", base),
        ("+comp_resid", dataclasses.replace(base, comp_resid=True)),
        ("+scale_kkt", dataclasses.replace(base, scale_kkt=True)),
        ("+polish2", dataclasses.replace(base, polish=2)),
        ("+scale_kkt+comp_resid", dataclasses.replace(
            base, scale_kkt=True, comp_resid=True)),
        ("+polish2+comp_resid", dataclasses.replace(
            base, polish=2, comp_resid=True)),
        ("+polish2+scale_kkt+comp_resid", dataclasses.replace(
            base, polish=2, scale_kkt=True, comp_resid=True)),
        ("+restart1(4it)", dataclasses.replace(
            base, refine_restart=1, refine_iters=4)),
        ("+restart1(4it)+comp_resid", dataclasses.replace(
            base, refine_restart=1, refine_iters=4, comp_resid=True)),
    ]
    rvariants = [
        ("RICCATI", base),
        ("RICCATI+restart1(4it)", dataclasses.replace(
            base, refine_restart=1, refine_iters=4)),
        ("RICCATI+restart1(8it)", dataclasses.replace(
            base, refine_restart=1, refine_iters=8)),
        ("RICCATI+restart2(8it)", dataclasses.replace(
            base, refine_restart=2, refine_iters=8)),
        ("RICCATI+restart1(12it)", dataclasses.replace(
            base, refine_restart=1, refine_iters=12)),
        ("RICCATI,16it+restart1(8it)", dataclasses.replace(
            base, max_iters=16, refine_restart=1, refine_iters=8)),
    ]
    out = {"backend": jax.default_backend(),
           "regime": "dense assembly, warm RH ticks batch 1024 "
                     "(throughput) + cold production QPs vs tight f64 "
                     "(accuracy, 2 warm ticks of history)",
           "bars": {"solves_per_sec": 10000.0,
                    "first_control_max": 1e-2, "mean_control": 1e-3},
           "results": []}
    for name, opts in variants:
        fc, mean, p99 = accuracy(opts)
        sps = throughput(opts)
        row = {"variant": name, "solves_per_sec": round(sps, 1),
               "first_control_max_err": fc, "mean_control_err": mean,
               "p99_control_err": p99,
               "meets_both_bars": bool(sps >= 10000.0 and fc <= 1e-2
                                       and mean <= 1e-3)}
        out["results"].append(row)
        print(row, flush=True)
    for name, opts in rvariants:
        fc, mean, p99 = accuracy_riccati(opts)
        sps = throughput(opts, backend="riccati")
        row = {"variant": name, "solves_per_sec": round(sps, 1),
               "first_control_max_err": fc, "mean_control_err": mean,
               "p99_control_err": p99,
               "meets_both_bars": bool(sps >= 10000.0 and fc <= 1e-2
                                       and mean <= 1e-3)}
        out["results"].append(row)
        print(row, flush=True)
    with open("PRESET_MAP.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote PRESET_MAP.json")


if __name__ == "__main__":
    main()
