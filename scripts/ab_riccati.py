"""On-chip A/B: stage-wise block-Riccati IPM vs the condensed dense IPM.

Measures warm receding-horizon dynamic-LTV tick throughput (the bench.py
regime) for both QP backends at batch {128, 1024}, plus the cross-backend
control agreement.  The dense path is the shipped round-3 default (Pallas
fused condense + dense rows); the Riccati path never materialises B_bar or
the (800, 84) constraint matrix (``ops/riccati.py``) -- the structural
escape from the dense path's measured ~97%-of-HBM-roofline ceiling
(PROFILE_r03.json).

Writes AB_RICCATI.json.  Run ON THE CHIP: python scripts/ab_riccati.py
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


def measure(opts, batch, backend, n_rep=10, n_warm_ticks=1):
    dtype = jnp.float32
    mpc = MPC_F32
    track, _ = load_track("data/fsg2019.csv", dtype=dtype)
    params = VehicleParams()
    args0, make_ref, step = build(batch, dtype, mpc, track, params)
    kw = ({"backend": "riccati"} if backend == "riccati"
          else {"condense": "pallas"})

    def tick(carry):
        x0, x_lin, u_lin, warm = carry
        x_ref = jax.vmap(make_ref)(x0)
        res = jax.vmap(
            lambda a, b, c, d, w: ltv.ltv_mpc_dynamic(
                a, b, track, params, mpc, c, d, opts, warm=w, **kw)
        )(x0, x_ref, x_lin, u_lin, warm)
        x0_next = jax.vmap(step)(x0, res.u_opt[:, 0])
        return (x0_next, res.x_opt, res.u_opt, res.qp), res.u_opt[:, 0]

    def cold(x0b, x_linb, u_linb):
        x_ref = jax.vmap(make_ref)(x0b)
        return jax.vmap(
            lambda a, b, c, d: ltv.ltv_mpc_dynamic(
                a, b, track, params, mpc, c, d, opts, **kw)
        )(x0b, x_ref, x_linb, u_linb)

    tick_j = jax.jit(tick)
    res0 = jax.jit(cold)(*args0)
    carry = (args0[0], res0.x_opt, res0.u_opt, res0.qp)
    for _ in range(n_warm_ticks):
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
    out = {"backend": jax.default_backend(),
           "regime": "warm receding-horizon dynamic LTV, N=40, F32_OPTS",
           "results": []}
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    opts = dataclasses.replace(ipm.F32_OPTS, max_iters=iters)
    for batch in (128, 1024):
        u_ref = None
        for backend in ("dense", "riccati"):
            sps, u = measure(opts, batch, backend)
            row = {"batch": batch, "backend": backend, "iters": iters,
                   "solves_per_sec": round(sps, 1),
                   "ms_per_tick": round(batch / sps * 1e3, 3)}
            if u_ref is None:
                u_ref = u
            else:
                row["max_du0_vs_dense"] = float(np.abs(u - u_ref).max())
            out["results"].append(row)
            print(row, flush=True)
    with open("AB_RICCATI.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote AB_RICCATI.json")


if __name__ == "__main__":
    main()
