"""Component-level TPU timing of the LTV-MPC tick, with a roofline table.

Where do the ms go at batch=1024, f32, dynamic model, N=40?

Timing methodology (IMPORTANT): the axon TPU tunnel (a) serves repeated
calls on IDENTICAL input buffers from a result cache (they appear ~free)
and (b) charges a ~13 ms round trip on the first dispatch after any host
readback -- so naive timeit loops measure the tunnel, not the chip.  Every
measurement here therefore CHAINS iterations through a data dependency (a
tiny perturbation of one input derived from the previous output) and takes
the SLOPE between a short and a long chain, which cancels fixed overheads
and result caching.  Cross-check: a (4096, 4096) f32 matmul measures
~0.78 ms = its HBM/MXU roofline.
"""

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
from fsae_mpc_tpu.ops import linalg as xl
from fsae_mpc_tpu.track import load_track

# v5e single-chip peaks (per chip): 394 GB/s HBM, ~197 TFLOP/s bf16 MXU.
# f32 HIGHEST-precision matmuls run ~6 bf16 passes -> ~33 TFLOP/s effective.
HBM_GBPS = 394.0
MXU_F32_HIGHEST = 33e12


def timeit_chained(fn, args, perturb, short=3, reps=20):
    """Slope timing: chain `fn` through `perturb` (args, out) -> args."""
    out = fn(*args)
    args = perturb(args, out)

    def run(n):
        a = args
        t0 = time.perf_counter()
        o = fn(*a)
        for _ in range(n - 1):
            a = perturb(a, o)
            o = fn(*a)
        jax.block_until_ready(o)
        return time.perf_counter() - t0

    run(2)  # warm the perturbed shapes
    t_short = run(short)
    t_long = run(short + reps)
    return (t_long - t_short) / reps


def first_leaf(out):
    return jax.tree_util.tree_leaves(out)[0]


def main():
    dtype = jnp.float32
    batch = 1024
    mpc = MPC_F32
    track, _ = load_track("data/fsg2019.csv", dtype=dtype)
    params = VehicleParams()
    N = mpc.n_steps
    opts = ipm.F32_OPTS

    key = jax.random.key(0)
    x0 = jnp.zeros((batch, 7), dtype).at[:, 3].set(8.0)
    x0 = x0 + 0.01 * jax.random.normal(key, (batch, 7), dtype)
    t = mpc.dt * jnp.arange(1, N + 1, dtype=dtype)
    xr = jnp.zeros((N, 7), dtype).at[:, 3].set(jnp.minimum(8 + 10 * t, 20.0))
    xr = xr.at[:, 0].set(jnp.cumsum(xr[:, 3] * mpc.dt))
    x_ref = jnp.broadcast_to(xr, (batch, N, 7))
    x_lin = jnp.zeros((batch, N, 7), dtype).at[:, :, 3].set(8.0)
    x_lin = x_lin.at[:, :, 0].set(8.0 * t)
    u_lin = jnp.zeros((batch, N, 2), dtype)

    rows = []

    def report(name, secs, gbytes=None, gflop=None, per_iter=""):
        line = f"{name:34s} {secs*1e3:8.2f} ms"
        bounds = []
        row = {"component": name, "ms": round(secs * 1e3, 3)}
        if gbytes is not None:
            row["hbm_sol_ms"] = round(gbytes / HBM_GBPS * 1e3, 3)
            bounds.append(f"HBM-SoL {gbytes/HBM_GBPS*1e3:6.2f} ms")
        if gflop is not None:
            row["mxu_sol_ms"] = round(gflop * 1e9 / MXU_F32_HIGHEST * 1e3, 3)
            bounds.append(f"MXU-SoL {gflop*1e9/MXU_F32_HIGHEST*1e3:6.2f} ms")
        if per_iter:
            row["note"] = per_iter
        rows.append(row)
        if bounds:
            line += "   [" + ", ".join(bounds) + "]"
        print(line + ("  " + per_iter if per_iter else ""), flush=True)

    # ---- stage 1: linearize ------------------------------------------------
    f_step = lambda x, u: integrators.rk4_step(
        lambda a, b: cm.f_curv_dyn_only(a, b, track, params), x, u, mpc.dt)
    lin_j = jax.jit(jax.vmap(
        lambda xl_, ul: integrators.linearize_discrete(f_step, xl_, ul)))
    pert_lin = lambda a, o: (a[0] + 1e-12 * first_leaf(o)[:, :, :, 0],
                             a[1])
    t_lin = timeit_chained(lin_j, (x_lin, u_lin), pert_lin)
    report("linearize_discrete (jacfwd rk4)", t_lin)
    Ad, Bd, dd = lin_j(x_lin, u_lin)

    # ---- stage 2: condense -------------------------------------------------
    from fsae_mpc_tpu.ops.condense import condense, condense_dnc
    cond_j = jax.jit(jax.vmap(condense))
    pert_c = lambda a, o: (a[0] + 1e-12 * o[0], a[1], a[2])
    t_cond = timeit_chained(cond_j, (Ad, Bd, dd), pert_c)
    # traffic: write+read B_bar (N*nx*N*nu) + stages
    gb = batch * (2 * N * 7 * N * 2 + 2 * N * 7 * 7) * 4 / 1e9
    report("condense (scan)", t_cond, gbytes=gb)
    dnc_j = jax.jit(jax.vmap(condense_dnc))
    t_dnc = timeit_chained(dnc_j, (Ad, Bd, dd), pert_c)
    report("condense (dnc, log-depth)", t_dnc, gbytes=gb)
    A_bar, B_bar, d_bar = cond_j(Ad, Bd, dd)

    # ---- stage 3: rows + cost ----------------------------------------------
    qp_j = jax.jit(jax.vmap(
        lambda ab, bb, db, x0_, xr_, xl_, ul: ltv.assemble_condensed_qp(
            *_qp_inputs(ab, bb, db, x0_, xr_, xl_, ul, mpc, params, track))))

    def _qp_inputs(ab, bb, db, x0_, xr_, xl_, ul, mpc, params, track):
        from fsae_mpc_tpu.mpc import constraints as cons
        q = jnp.asarray([mpc.q_s, mpc.q_n, mpc.q_mu, 0, 0, 0, 0], dtype)
        q_diag = jnp.concatenate([jnp.tile(q, N - 1),
                                  q * mpc.q_terminal_scale])
        r_diag = jnp.tile(jnp.asarray([mpc.r_a, mpc.r_delta_d], dtype), N)
        groups = [
            cons.state_box_group([3, 6], np.array([0.0, -mpc.delta_max]),
                                 np.array([np.inf, mpc.delta_max]),
                                 np.array([-1, -1]), xl_, ul),
            cons.state_box_group([1], np.array([-mpc.n_max]),
                                 np.array([mpc.n_max]), np.array([0]),
                                 xl_, ul),
            cons.dynamic_slip_group(xl_, ul, mpc, params, 1, 2),
            cons.friction_polygon_group(xl_, ul, mpc, params, 3),
        ]
        u_lb, u_ub = ltv._control_bounds(mpc, N, dtype)
        return (ab, bb, db, x0_, xr_, q_diag, r_diag,
                [mpc.w_track, mpc.w_slip, mpc.w_slip, mpc.w_tyre],
                groups, u_lb, u_ub)

    pert_q = lambda a, o: (a[0], a[1] + 1e-12 * jnp.mean(o[0]), *a[2:])
    t_qp = timeit_chained(
        qp_j, (A_bar, B_bar, d_bar, x0, x_ref, x_lin, u_lin), pert_q)
    # B'QB: 2 x (84, 280) @ (280, 84); A write (800x84)
    gflop = batch * 2 * (84 * 280 * 84) * 2 / 1e9
    gb = batch * (2 * 280 * 84 + 800 * 84 + 280 * 80) * 4 / 1e9
    report("rows + cost (B'QB, 800 rows)", t_qp, gbytes=gb, gflop=gflop)
    qp = qp_j(A_bar, B_bar, d_bar, x0, x_ref, x_lin, u_lin)
    H, g, A, lb, ub, lbA, ubA, const = qp

    # ---- solver components --------------------------------------------------
    n, m = g.shape[-1], lbA.shape[-1]
    D_r = jnp.abs(jax.random.normal(key, (batch, m), dtype))
    D_b = jnp.abs(jax.random.normal(key, (batch, n), dtype))

    @jax.jit
    def form_K(H, A, D_r, D_b):
        with jax.default_matmul_precision("highest"):
            K = H + jnp.einsum("bmn,bm,bmk->bnk", A, D_r, A)
        idx = jnp.arange(n)
        return K.at[:, idx, idx].add(D_b + 1e-7)

    pert_K = lambda a, o: (a[0], a[1],
                           a[2] * (1.0 + 1e-12 * jnp.mean(o)), a[3])
    t_k = timeit_chained(form_K, (H, A, D_r, D_b), pert_K)
    gflop = batch * 2 * m * n * n * 2 / 1e9      # A*D + A'(DA)
    gb = batch * (2 * m * n + n * n) * 4 / 1e9
    report("K = H + A'DA + Db", t_k, gbytes=gb, gflop=gflop,
           per_iter="(x1/iter)")
    K = form_K(H, A, D_r, D_b)

    from fsae_mpc_tpu.ops.pallas import chol as pchol
    pfac = jax.jit(pchol.factor_lanes)
    pert_f = lambda a, o: (a[0] + 1e-12 * jnp.tril(o),)
    t_pf = timeit_chained(pfac, (K,), pert_f)
    gb = batch * (2 * n * n) * 4 / 1e9
    report("pallas factor_lanes", t_pf, gbytes=gb, per_iter="(x1/iter)")
    Lp = pfac(K)

    rhs0 = jax.random.normal(key, (batch, n), dtype)
    psol = jax.jit(pchol.solve_lanes)
    pert_s = lambda a, o: (a[0], a[1] + 1e-12 * o)
    t_ps = timeit_chained(psol, (Lp, rhs0), pert_s)
    gb = batch * (n * n + 2 * n) * 4 / 1e9
    report("pallas solve_lanes", t_ps, gbytes=gb, per_iter="(x2-3/iter)")

    solve_b = jax.jit(lambda *a: ipm.solve_qp_batched(*a, opts))
    pert_sq = lambda a, o: (a[0], a[1] + 1e-9 * o.x, *a[2:])
    t_q = timeit_chained(solve_b, (H, g, A, lb, ub, lbA, ubA), pert_sq,
                         short=2, reps=8)
    # per-iteration traffic: A read ~6x (K form 2, matvecs 4) + K/L
    it = opts.max_iters
    gb = batch * it * (6 * m * n + 3 * n * n) * 4 / 1e9
    gflop = batch * it * (2 * m * n * n + n ** 3 / 3) * 2 / 1e9
    report(f"solve_qp ({it} iters)", t_q, gbytes=gb, gflop=gflop)

    tick = jax.jit(jax.vmap(
        lambda x0_, xr_, xl_, ul: ltv.ltv_mpc_dynamic(
            x0_, xr_, track, params, mpc, xl_, ul, opts).u_opt))
    pert_t = lambda a, o: (a[0] + 1e-9 * o[:, 0, :7].sum(-1, keepdims=True)
                           * jnp.ones((1, 7), dtype), *a[1:])
    t_t = timeit_chained(tick, (x0, x_ref, x_lin, u_lin), pert_t,
                         short=2, reps=8)
    report("full tick", t_t,
           per_iter=f"-> {batch/t_t:,.0f} solves/s")

    out = {"backend": jax.default_backend(), "batch": batch,
           "regime": "dynamic LTV tick, N=40, F32_OPTS "
                     f"({opts.max_iters} iters), f32, slope-timed",
           "hbm_gbps_assumed": HBM_GBPS,
           "mxu_f32_highest_flops_assumed": MXU_F32_HIGHEST,
           "solves_per_sec_cold_lin": round(batch / t_t, 1),
           "components": rows}
    with open("PROFILE_r03.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote PROFILE_r03.json")


if __name__ == "__main__":
    main()
