"""Riccati-backend validation artifacts: closed-loop lap + warm accuracy.

Two phases, merged into RICCATI_VALIDATION.json:

  lap   (TPU):  full closed-loop lap-terminated sim (dynamic LTV,
                qp_backend="riccati", F32_OPTS) -- the same harness as
                the LAPS_TPU.json rows (reference metric block,
                ``main.m:196-228``), for direct comparison against the
                dense-backend row.
  warm  (CPU):  receding-horizon warm-chain accuracy: 4 warm-started
                riccati-f32 ticks, then the last tick's controls vs a
                TIGHT f64 dense solve of the SAME QP (matched
                x0/reference/linearisation) -- the production-regime
                accuracy number (the bench and the laps warm-start every
                tick; ACCURACY_TPU.json's RICCATI rows measure the
                harder COLD-solve case).

Run:
    python scripts/riccati_validation.py lap [track]
    JAX_PLATFORMS=cpu python scripts/riccati_validation.py warm
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

OUT = "RICCATI_VALIDATION.json"


def _merge(section, payload):
    data = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            data = json.load(fh)
    data[section] = payload
    with open(OUT, "w") as fh:
        json.dump(data, fh, indent=1)
    print(f"wrote {OUT}[{section}]")


def lap():
    """Riccati lap rows: dynamic LTV on all 3 tracks + one kinematic row
    (VERDICT r4 #2), with the per-tick solver-residual floor percentiles
    that calibrate sim.closed_loop.CONV_THRESHOLDS.

    Usage: python scripts/riccati_validation.py lap [preset]
    with preset in {f32_opts, restart}.
    """
    import dataclasses
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    import numpy as np
    from fsae_mpc_tpu.config import MPC_F32, VehicleParams
    from fsae_mpc_tpu.ops import ipm
    from fsae_mpc_tpu.sim.closed_loop import SimConfig, simulate_timed
    from fsae_mpc_tpu.track import load_track

    preset = sys.argv[2] if len(sys.argv) > 2 else "f32_opts"
    opts = (ipm.F32_OPTS if preset == "f32_opts" else ipm.F32_PRODUCTION)
    configs = [("fsg2019", "dynamic"), ("fso2020", "dynamic"),
               ("fss2019", "dynamic"), ("fsg2019", "kinematic")]
    for track_name, model in configs:
        track, _ = load_track(f"data/{track_name}.csv", dtype=jnp.float32)
        cfg = SimConfig(model=model, mode="ltv", n_ticks=1000, mpc=MPC_F32,
                        ipm=opts, qp_backend="riccati")
        t0 = time.time()
        out, timing = simulate_timed(track, VehicleParams(), cfg)
        act = np.asarray(out.active)
        pres = np.asarray(out.qp_pres)[act]
        mu = np.asarray(out.qp_mu)[act]
        row = dict(
            track=track_name, mode="ltv", model=model, dtype="f32",
            qp_backend="riccati", preset=preset,
            lap_done=bool(out.lap_done),
            lap_time=round(float(out.lap_time), 3),
            track_violation=round(float(out.track_violation), 5),
            max_track_violation=round(float(out.max_track_violation), 4),
            tyre_violation=round(float(out.tyre_violation), 5),
            max_tyre_violation=round(float(out.max_tyre_violation), 4),
            slack_n_frac=round(float(out.slack_n_frac), 4),
            abnormal_exit_frac=round(float(out.abnormal_exit_frac), 4),
            pres_median=float(np.median(pres)),
            pres_p95=float(np.percentile(pres, 95)),
            pres_max=float(pres.max()),
            mu_median=float(np.median(mu)),
            mu_p95=float(np.percentile(mu, 95)),
            wall_s=round(time.time() - t0, 1),
            tick_time_p99_s=round(timing["tick_time_p99_s"], 5))
        print(row, flush=True)
        _merge(f"lap_{track_name}_{model}_{preset}", row)


def warm():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from fsae_mpc_tpu.config import MPC_F32, VehicleParams
    from fsae_mpc_tpu.mpc import ltv
    from fsae_mpc_tpu.models import curvilinear as cm, integrators
    from fsae_mpc_tpu.ops import ipm
    from fsae_mpc_tpu.track import load_track

    B = 16
    mpc = MPC_F32
    params = VehicleParams()
    N = mpc.n_steps
    f32 = jnp.float32
    track32, _ = load_track("data/fsg2019.csv", dtype=f32)
    rng = np.random.default_rng(0)
    t = mpc.dt * np.arange(1, N + 1)
    x_lin = np.zeros((B, N, 7))
    x_lin[:, :, 0] = 8.0 * t
    x_lin[:, :, 3] = 8.0
    u_lin = np.zeros((B, N, 2))
    x0 = np.zeros((B, 7))
    x0[:, 0] = rng.uniform(0, 100, B)
    x0[:, 1] = rng.uniform(-0.2, 0.2, B)
    x0[:, 3] = 8.0

    def make_ref(x0_, dtype):
        v = jnp.minimum(x0_[3] + 10.0 * mpc.dt
                        * jnp.arange(1, N + 1, dtype=dtype), 20.0)
        return (jnp.zeros((N, 7), dtype).at[:, 3].set(v)
                .at[:, 0].set(x0_[0] + jnp.cumsum(v * mpc.dt)))

    f = lambda x, u: cm.f_curv_dyn_only(x, u, track32, params)
    step = lambda x, u: integrators.rk4_step(f, x, u, mpc.dt)
    preset = sys.argv[2] if len(sys.argv) > 2 else "f32_opts"
    opts = (ipm.F32_OPTS if preset == "f32_opts" else ipm.F32_PRODUCTION)

    carry = [jnp.asarray(a, f32) for a in (x0, x_lin, u_lin)]
    warm_state = None
    for _ in range(4):
        x0b, x_linb, u_linb = carry
        refb = jax.vmap(lambda a: make_ref(a, f32))(x0b)
        if warm_state is None:
            res = jax.jit(jax.vmap(
                lambda a, b, c, d: ltv.ltv_mpc_dynamic_riccati(
                    a, b, track32, params, mpc, c, d, opts)))(
                        x0b, refb, x_linb, u_linb)
        else:
            res = jax.jit(jax.vmap(
                lambda a, b, c, d, w: ltv.ltv_mpc_dynamic_riccati(
                    a, b, track32, params, mpc, c, d, opts, warm=w)))(
                        x0b, refb, x_linb, u_linb, warm_state)
        warm_state = res.qp
        last = (x0b, refb, x_linb, u_linb)
        carry = [jax.vmap(step)(x0b, res.u_opt[:, 0]), res.x_opt,
                 res.u_opt]

    jax.config.update("jax_enable_x64", True)
    track64, _ = load_track("data/fsg2019.csv", dtype=jnp.float64)
    args64 = [jnp.asarray(np.asarray(a), jnp.float64) for a in last]
    ref = jax.jit(jax.vmap(lambda a, b, c, d: ltv.ltv_mpc_dynamic(
        a, b, track64, params, mpc, c, d,
        ipm.IpmOptions(max_iters=60, tol=1e-12))))(*args64)
    du = np.abs(np.asarray(res.u_opt, np.float64)
                - np.asarray(ref.u_opt, np.float64))
    row = {"regime": f"warm tick 4 of a receding-horizon chain, riccati "
                     f"f32 {preset} vs tight f64 dense, same QP",
           "first_control_max_err": float(du[:, 0].max()),
           "mean_control_err": float(du.mean()),
           "p99_control_err": float(np.quantile(du, 0.99))}
    print(row)
    _merge(f"warm_accuracy_{preset}" if preset != "f32_opts"
           else "warm_accuracy", row)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "lap":
        lap()
    else:
        warm()
