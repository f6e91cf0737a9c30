"""Measure the NMPC subproblem warm-start win -> NMPC_WARM.json.

Round 2 carried IPM duals across ticks for the LTV mode only; round 3
threads them through every SQP solver (mpc/sqp.py:run_sqp) -- the
analogue of the reference's IPOPT zl/zu/lambda warm start
(``rk2_nmpc_kinematic_curvilinear.m:14-20``).  The portable metric is
interior-point iterations to convergence of the tick's FIRST subproblem
(the one the cross-tick warm start affects; later subproblems are always
warm-started from their predecessor), measured with the adaptive
(early-exit) IPM on a receding-horizon MS-NMPC dynamic sequence.

Run:  JAX_PLATFORMS=cpu python scripts/nmpc_warm_bench.py
"""

import json
import sys

sys.path.insert(0, ".")

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")

import jax.numpy as jnp
import numpy as np

from fsae_mpc_tpu.config import MPCParams, VehicleParams
from fsae_mpc_tpu.models import curvilinear as cm, integrators
from fsae_mpc_tpu.mpc import sqp
from fsae_mpc_tpu.ops import ipm
from fsae_mpc_tpu.track import load_track

T_TICKS = 10


def main():
    dtype = jnp.float64
    mpc = MPCParams()
    opts = ipm.IpmOptions(max_iters=50, tol=1e-9, adaptive=True)
    track, _ = load_track("data/fsg2019.csv", dtype=dtype)
    params = VehicleParams()
    N = mpc.n_steps

    f = lambda x, u: cm.f_curv_dyn_only(x, u, track, params)
    step = lambda x, u: integrators.rk2_step(f, x, u, mpc.dt)

    t = mpc.dt * jnp.arange(1, N + 1, dtype=dtype)
    x_opt = jnp.zeros((N, 7), dtype).at[:, 0].set(10.0 * t ** 2 / 2.0) \
        .at[:, 3].set(10.0 * t)
    u_opt = jnp.tile(jnp.asarray([10.0, 0.0], dtype), (N, 1))
    x0 = jnp.zeros((7,), dtype).at[3].set(1.0)

    def make_ref(x0):
        v = jnp.minimum(x0[3] + 10.0 * mpc.dt
                        * jnp.arange(1, N + 1, dtype=dtype), mpc.target_vel)
        return (jnp.zeros((N, 7), dtype).at[:, 3].set(v)
                .at[:, 0].set(x0[0] + jnp.cumsum(v * mpc.dt)))

    first = jax.jit(lambda x0, xr, xi, ui, w: sqp.ms_nmpc_dynamic(
        x0, xr, track, params, mpc, xi, ui, opts, sqp_iters=1, warm=w))
    first_cold = jax.jit(lambda x0, xr, xi, ui: sqp.ms_nmpc_dynamic(
        x0, xr, track, params, mpc, xi, ui, opts, sqp_iters=1))
    full = jax.jit(lambda x0, xr, xi, ui, w: sqp.ms_nmpc_dynamic(
        x0, xr, track, params, mpc, xi, ui, opts, sqp_iters=3, warm=w))
    full_cold = jax.jit(lambda x0, xr, xi, ui: sqp.ms_nmpc_dynamic(
        x0, xr, track, params, mpc, xi, ui, opts, sqp_iters=3))

    iters_cold, iters_warm, du = [], [], []
    prev_qp = None
    for k in range(T_TICKS):
        x_ref = make_ref(x0)
        xi, ui = sqp.shift_trajectory(x_opt, u_opt, step)
        rc = first_cold(x0, x_ref, xi, ui)
        if prev_qp is not None:
            rw = first(x0, x_ref, xi, ui, prev_qp)
            iters_cold.append(int(rc.qp.iterations))
            iters_warm.append(int(rw.qp.iterations))
            du.append(float(jnp.max(jnp.abs(rw.u_opt - rc.u_opt))))
            res = full(x0, x_ref, xi, ui, prev_qp)
        else:
            res = full_cold(x0, x_ref, xi, ui)
        prev_qp = res.qp
        x_opt, u_opt = res.x_opt, res.u_opt
        x0 = step(x0, u_opt[0])

    payload = {
        "metric": "nmpc_first_subproblem_ipm_iterations",
        "regime": "MS-NMPC dynamic (rk2, 3 SQP iters), receding horizon, "
                  "fsg2019, adaptive f64 IPM tol 1e-9",
        "ticks": len(iters_cold),
        "iters_cold_mean": round(float(np.mean(iters_cold)), 2),
        "iters_warm_mean": round(float(np.mean(iters_warm)), 2),
        "iters_cold": iters_cold,
        "iters_warm": iters_warm,
        "speedup": round(float(np.mean(iters_cold))
                         / max(float(np.mean(iters_warm)), 1e-9), 3),
        "max_control_diff_warm_vs_cold": float(np.max(du)),
    }
    print(json.dumps(payload, indent=1))
    with open("NMPC_WARM.json", "w") as fh:
        json.dump(payload, fh, indent=1)
    print("wrote NMPC_WARM.json")


if __name__ == "__main__":
    main()
