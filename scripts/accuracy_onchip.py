"""On-chip f32 solver accuracy vs a CPU f64 reference on the SAME QPs.

Two phases sharing an .npz hand-off:

  gen   (CPU, f64):  build the warm receding-horizon production QPs the
                     bench measures (identical construction to
                     tests/test_f32_accuracy.py::production_qps), solve
                     tightly in f64, save data + reference solution.
  solve (TPU, f32):  load, cast to f32, solve with each preset ON THE
                     CHIP, report first-control / mean / p99 control
                     error and feasibility vs the f64 reference.

Writes ACCURACY_TPU.json -- the measurement VERDICT round 2 asked for:
the certified preset's numbers on the chip, on the shipped (dense)
assembly path.  Run:

    JAX_PLATFORMS=cpu python scripts/accuracy_onchip.py gen
    python scripts/accuracy_onchip.py solve
"""

import dataclasses
import json
import sys

sys.path.insert(0, ".")

import os

NPZ = "/tmp/accuracy_qps.npz"
BATCH = 32
N_TICKS = 3


def gen():
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np
    from fsae_mpc_tpu.config import MPC_F32, VehicleParams
    from fsae_mpc_tpu.mpc import ltv
    from fsae_mpc_tpu.models import curvilinear as cm, integrators
    from fsae_mpc_tpu.ops import ipm
    from fsae_mpc_tpu.track import load_track

    dtype = jnp.float64
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
        x0, x_lin, u_lin = carry
        x_ref = jax.vmap(make_ref)(x0)
        res = jax.vmap(
            lambda a, b, c, d: ltv.ltv_mpc_dynamic(
                a, b, track, params, mpc, c, d,
                ipm.IpmOptions(max_iters=16, adaptive=False))
        )(x0, x_ref, x_lin, u_lin)
        x0_next = jax.vmap(step)(x0, res.u_opt[:, 0])
        return (x0_next, res.x_opt, res.u_opt)

    rng = np.random.default_rng(0)
    t = mpc.dt * np.arange(1, N + 1)
    x_lin = np.zeros((BATCH, N, 7))
    x_lin[:, :, 0] = 8.0 * t
    x_lin[:, :, 3] = 8.0
    u_lin = np.zeros((BATCH, N, 2))
    x0 = np.zeros((BATCH, 7))
    x0[:, 0] = rng.uniform(0.0, 100.0, BATCH)
    x0[:, 1] = rng.uniform(-0.2, 0.2, BATCH)
    x0[:, 3] = 8.0

    carry = tuple(jnp.asarray(a, dtype) for a in (x0, x_lin, u_lin))
    tick_j = jax.jit(tick)
    for _ in range(N_TICKS):
        carry = tick_j(carry)
    x0_t, x_lin_t, u_lin_t = carry
    x_ref_t = jax.vmap(make_ref)(x0_t)

    qp, _ = jax.jit(jax.vmap(
        lambda a, b, c, d: ltv.build_qp_dynamic(
            a, b, track, params, mpc, c, d)))(x0_t, x_ref_t, x_lin_t,
                                              u_lin_t)
    H, g, A, lb, ub, lbA, ubA, _ = [np.asarray(v, np.float64) for v in qp]
    o64 = ipm.IpmOptions(max_iters=60, tol=1e-12)
    ref = jax.jit(jax.vmap(lambda *a: ipm.solve_qp(*a, o64)))(
        *[jnp.asarray(a) for a in (H, g, A, lb, ub, lbA, ubA)])
    assert float(ref.primal_res.max()) < 1e-10
    # the SAME ticks as an uncondensed stage QP (for the Riccati backend)
    sqp, _ = jax.jit(jax.vmap(
        lambda a, b, c, d: ltv.build_stage_qp_dynamic(
            a, b, track, params, mpc, c, d)))(x0_t, x_ref_t, x_lin_t,
                                              u_lin_t)
    stage = {"s_" + k: np.asarray(getattr(sqp, k), np.float64)
             for k in ["Ad", "Bd", "dd", "x0", "Qx", "qx", "Ru", "ru",
                       "g_s", "C", "D", "Ws", "lbA", "ubA", "u_lb",
                       "u_ub", "s_lb", "s_ub"]}
    np.savez(NPZ, H=H, g=g, A=A, lb=lb, ub=ub, lbA=lbA, ubA=ubA,
             x64=np.asarray(ref.x), **stage)
    print(f"wrote {NPZ}: {BATCH} production QPs + f64 reference")


def solve():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    import numpy as np
    from fsae_mpc_tpu.ops import ipm

    z = np.load(NPZ)
    qp = [z[k] for k in ["H", "g", "A", "lb", "ub", "lbA", "ubA"]]
    x64 = z["x64"]
    qpf = [jnp.asarray(a, jnp.float32) for a in qp]
    N2 = 80

    presets = {
        "F32_OPTS": ipm.F32_OPTS,
        "F32_OPTS,10it": dataclasses.replace(ipm.F32_OPTS, max_iters=10),
        "F32_ACCURATE": ipm.F32_ACCURATE,
    }
    out = {"backend": jax.default_backend(),
           "regime": "warm production QPs (fsg2019 dynamic LTV, N=40), "
                     "dense assembly, vs tight f64 solve of same data",
           "results": []}
    for name, opts in presets.items():
        sol = jax.jit(jax.vmap(lambda *a: ipm.solve_qp(*a, opts)))(*qpf)
        x = np.asarray(sol.x, np.float64)
        du = np.abs(x[:, :N2] - x64[:, :N2])
        y = np.einsum("bij,bj->bi", qp[2], x)
        viol = max(np.maximum(np.maximum(qp[3] - x, x - qp[4]), 0.0).max(),
                   np.maximum(np.maximum(qp[5] - y, y - qp[6]), 0.0).max())
        row = {"preset": name,
               "first_control_max_err": float(du[:, :2].max()),
               "mean_control_err": float(du.mean()),
               "p99_control_err": float(np.quantile(du, 0.99)),
               "max_feas_violation": float(viol)}
        out["results"].append(row)
        print(row, flush=True)

    # ---- Riccati backend on the same ticks, across iteration budgets ----
    from fsae_mpc_tpu.ops import riccati
    sfields = ["Ad", "Bd", "dd", "x0", "Qx", "qx", "Ru", "ru", "g_s",
               "C", "D", "Ws", "lbA", "ubA", "u_lb", "u_ub", "s_lb",
               "s_ub"]
    sqp = riccati.StageQP(**{k: jnp.asarray(z["s_" + k], jnp.float32)
                             for k in sfields})
    rvariants = [("RICCATI,12it", dataclasses.replace(
                      ipm.F32_OPTS, max_iters=12)),
                 ("RICCATI,16it", dataclasses.replace(
                      ipm.F32_OPTS, max_iters=16)),
                 ("RICCATI+restart1(4it)", dataclasses.replace(
                      ipm.F32_OPTS, refine_restart=1, refine_iters=4)),
                 ("RICCATI+restart1(6it)", dataclasses.replace(
                      ipm.F32_OPTS, refine_restart=1, refine_iters=6)),
                 ("RICCATI+restart1(8it)", dataclasses.replace(
                      ipm.F32_OPTS, refine_restart=1, refine_iters=8)),
                 ("RICCATI+restart2(4it)", dataclasses.replace(
                      ipm.F32_OPTS, refine_restart=2, refine_iters=4)),
                 ("F32_PRODUCTION (restart2(6it))", ipm.F32_PRODUCTION)]
    for name, opts in rvariants:
        sol = jax.jit(jax.vmap(
            lambda q: riccati.solve_stage_qp(q, opts)))(sqp)
        u = np.asarray(sol.u, np.float64).reshape(len(x64), -1)
        du = np.abs(u - x64[:, :N2])
        row = {"preset": name,
               "first_control_max_err": float(du[:, :2].max()),
               "mean_control_err": float(du.mean()),
               "p99_control_err": float(np.quantile(du, 0.99)),
               "max_feas_violation": float(np.asarray(
                   sol.primal_res).max())}
        out["results"].append(row)
        print(row, flush=True)
    with open("ACCURACY_TPU.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote ACCURACY_TPU.json")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "gen":
        gen()
    else:
        solve()
