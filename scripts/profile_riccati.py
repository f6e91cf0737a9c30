"""Component-level TPU timing of the RICCATI production path + roofline.

VERDICT round 4 #6: the perf artifacts were stale on the new default.
This profiles the stage-wise block-Riccati IPM at the bench operating
point (batch 1024, f32, dynamic LTV, N=40, F32_OPTS):

  * per-sweep breakdown: fused assemble+factor kernel, the sigma Schur
    column apply (K=4), the K=1 predictor/corrector applies, residual
    evaluation, and the full 12-iteration solve,
  * HBM speed-of-light per component (the sweeps are latency-bound, not
    bandwidth-bound -- the table quantifies by how much),
  * MAX_TB sensitivity (128 / 256 / 512),
  * full-tick batch curve 256..4096.

Methodology: slope timing with chained perturbations (see
scripts/profile_ipm.py -- the tunnel result-caches identical buffers and
charges ~13 ms RTT per readback; slopes cancel both).

Writes PROFILE_r05.json.  Run ON THE CHIP: python scripts/profile_riccati.py
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
from fsae_mpc_tpu.ops import ipm, riccati
from fsae_mpc_tpu.track import load_track

HBM_GBPS = 394.0


def timeit_chained(fn, args, perturb, short=3, reps=20):
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

    run(2)
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

    def report(name, secs, gbytes=None, note=""):
        row = {"component": name, "ms": round(secs * 1e3, 3)}
        line = f"{name:40s} {secs*1e3:8.2f} ms"
        if gbytes is not None:
            row["hbm_sol_ms"] = round(gbytes / HBM_GBPS * 1e3, 3)
            line += f"   [HBM-SoL {gbytes/HBM_GBPS*1e3:6.2f} ms]"
        if note:
            row["note"] = note
            line += "  " + note
        rows.append(row)
        print(line, flush=True)

    # ---- stage QP assembly ------------------------------------------------
    build_j = jax.jit(jax.vmap(
        lambda a, b, c, d: ltv.build_stage_qp_dynamic(
            a, b, track, params, mpc, c, d)[0]))
    pert_b = lambda a, o: (a[0] + 1e-12 * o.dd[:, 0, :7], *a[1:])
    t_build = timeit_chained(build_j, (x0, x_ref, x_lin, u_lin), pert_b)
    report("build_stage_qp (lin + rows, jacfwd)", t_build)
    qp = build_j(x0, x_ref, x_lin, u_lin)

    r = qp.C.shape[2]
    nx, nu, ns = 7, 2, 4
    D_r = jnp.abs(jax.random.normal(key, (batch, N, r), dtype))

    # ---- fused assemble+factor kernel (x1 per IPM iteration) --------------
    af = jax.jit(jax.vmap(riccati.assemble_factor))
    qb = jnp.abs(jax.random.normal(key, (batch, N, nx), dtype)) + 0.1
    rb = jnp.abs(jax.random.normal(key, (batch, N, nu), dtype)) + 0.1
    args_af = (qp.C, qp.D, qp.Ws, D_r, qb, rb, qp.Ad, qp.Bd)
    pert_af = lambda a, o: (a[0], a[1], a[2],
                            a[3] * (1.0 + 1e-12 * jnp.mean(first_leaf(o))),
                            *a[4:])
    t_af = timeit_chained(af, args_af, pert_af)
    flt = N * (r * (nx + nu + ns + 1) + nx + nu + nx * nx + nx * nu
               + nu * nu + nu * nx + nx * nx + nx * nu
               + (nx + nu) * ns + ns * ns)
    gb = batch * flt * 4 / 1e9
    report("assemble_factor (fused Pallas)", t_af, gbytes=gb,
           note="(x1/iter)")
    Huinv, G, W, Mq, Lx, Lu, Hss = af(*args_af)

    # ---- apply sweeps -----------------------------------------------------
    def apply_k(k):
        rx = jax.random.normal(key, (batch, k, N, nx), dtype)
        ru_ = jax.random.normal(key, (batch, k, N, nu), dtype)
        re = jax.random.normal(key, (batch, k, N, nx), dtype)
        ap = jax.jit(jax.vmap(
            lambda hu, g_, w, ad, bd, m, a_, b_, c_:
            riccati.riccati_apply((hu, g_, w), ad, bd, m, a_, b_, c_)))
        args = (Huinv, G, W, qp.Ad, qp.Bd, Mq, rx, ru_, re)
        pert = lambda a, o: (*a[:6], a[6] + 1e-12 * o[1], *a[7:])
        return timeit_chained(ap, args, pert)

    t_a4 = apply_k(ns)
    gb4 = batch * N * (nu * nu + nu * nx + nx * nx + nx * nx + nx * nu
                       + ns * 2 * (nx + nu + nx)) * 4 / 1e9
    report(f"riccati_apply K={ns} (sigma Schur cols)", t_a4, gbytes=gb4,
           note="(x1/iter)")
    t_a1 = apply_k(1)
    gb1 = batch * N * (nu * nu + nu * nx + 3 * nx * nx + 2 * nx * nu
                       + 2 * (nx + nu + nx)) * 4 / 1e9
    report("riccati_apply K=1 (predictor/corrector)", t_a1, gbytes=gb1,
           note="(x2/iter)")

    # ---- full solve + full tick ------------------------------------------
    solve_j = jax.jit(jax.vmap(lambda q: riccati.solve_stage_qp(q, opts)))
    import dataclasses as _dc
    pert_s = lambda a, o: (_dc.replace(a[0], dd=a[0].dd + 1e-9 * o.x),)
    t_solve = timeit_chained(solve_j, (qp,), pert_s, short=2, reps=8)
    it = opts.max_iters
    per_it = (t_af + t_a4 + 2 * t_a1)
    report(f"solve_stage_qp ({it} iters)", t_solve,
           note=f"sweeps alone: {per_it*it*1e3:.1f} ms")

    tick = jax.jit(jax.vmap(
        lambda a, b, c, d: ltv.ltv_mpc_dynamic(
            a, b, track, params, mpc, c, d, opts,
            backend="riccati").u_opt))
    pert_t = lambda a, o: (a[0] + 1e-9 * o[:, 0, :7].sum(-1, keepdims=True)
                           * jnp.ones((1, 7), dtype), *a[1:])
    t_t = timeit_chained(tick, (x0, x_ref, x_lin, u_lin), pert_t,
                         short=2, reps=8)
    report("full tick (riccati, cold)", t_t,
           note=f"-> {batch/t_t:,.0f} solves/s")

    # ---- MAX_TB sensitivity ----------------------------------------------
    from fsae_mpc_tpu.ops.pallas import riccati as priccati
    tb_rows = {}
    tb0 = priccati.MAX_TB
    for tb in (128, 256, 512):
        priccati.MAX_TB = tb
        af_tb = jax.jit(jax.vmap(riccati.assemble_factor))
        t_tb = timeit_chained(af_tb, args_af, pert_af)
        tb_rows[str(tb)] = round(t_tb * 1e3, 3)
        print(f"assemble_factor MAX_TB={tb}: {t_tb*1e3:.2f} ms", flush=True)
    priccati.MAX_TB = tb0

    # ---- batch curve ------------------------------------------------------
    curve = []
    for b in (256, 512, 1024, 2048, 4096):
        sl = slice(0, b) if b <= batch else None
        if b <= batch:
            args_b = (x0[:b], x_ref[:b], x_lin[:b], u_lin[:b])
        else:
            reps_ = b // batch
            args_b = tuple(jnp.concatenate([a] * reps_, axis=0)
                           for a in (x0, x_ref, x_lin, u_lin))
            k2 = jax.random.key(b)
            args_b = (args_b[0] + 0.01 * jax.random.normal(k2, (b, 7),
                                                           dtype),
                      *args_b[1:])
        t_b = timeit_chained(tick, args_b, pert_t, short=2, reps=6)
        curve.append({"batch": b, "ms": round(t_b * 1e3, 3),
                      "solves_per_sec": round(b / t_b, 1)})
        print(curve[-1], flush=True)

    out = {"backend": jax.default_backend(), "batch": batch,
           "regime": "dynamic LTV tick, riccati backend, N=40, F32_OPTS "
                     f"({opts.max_iters} iters), f32, slope-timed",
           "hbm_gbps_assumed": HBM_GBPS,
           "components": rows,
           "assemble_factor_ms_by_max_tb": tb_rows,
           "tick_batch_curve": curve,
           "analysis": {
               "per_iter_sweeps_ms": round(per_it * 1e3, 3),
               "per_iter_hbm_sol_ms": round(
                   (gb + gb4 + 2 * gb1) / HBM_GBPS * 1e3, 3),
               "note": "sweep time / HBM-SoL ratio >> 1 means the fused "
                       "sweeps are LATENCY-bound (40 sequential stage "
                       "steps x kernel grid overhead), not "
                       "bandwidth-bound; the lever is fewer sweep "
                       "launches per iteration, not more bandwidth"}}
    with open("PROFILE_r05.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote PROFILE_r05.json")


if __name__ == "__main__":
    main()
