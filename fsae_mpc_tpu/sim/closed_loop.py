"""Closed-loop lap simulator: the integration harness of the framework.

Port of the reference driver semantics (``main.m:91-190``) as one
``lax.scan`` over control ticks, entirely on device:

  tick:  project plant pose onto the track  ->  build speed-ramp reference
         ->  solve the LTV-MPC QP  ->  actuate via PID + RK6 plant substeps
         ->  accumulate metrics.

The controller's internal curvilinear model deliberately differs from the
Cartesian Pacejka plant (independent high-fidelity ground truth), so lap
metrics constitute a genuine end-to-end check -- the reference's only test
(SURVEY.md section 4).  Because the whole loop is one jitted scan, ``vmap``
turns it into a batched lap simulator over perturbed initial states /
vehicle parameters, which is the framework's data-parallel axis.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

from ..config import MPCParams, VehicleParams, VEL_PID, STEER_PID
from ..models import cartesian as cart
from ..models import curvilinear as cm
from ..models import integrators, transforms, pid
from ..mpc import ltv, sqp, collocation
from ..ops import ipm


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Static simulation configuration (``main.m:25-40,62``)."""

    model: str = "kinematic"        # "kinematic" | "dynamic"
    mode: str = "ltv"               # "ltv" | "ms-nmpc" | "c-nmpc"
                                    # (main.m:25-26 MODE/MODEL flags)
    n_ticks: int = 1000
    n_substeps: int = 10
    sqp_iters: int = 3              # SQP iterations per tick (NMPC modes)
    stepper: str = "rk2"            # MS-NMPC shooting integrator
                                    # ("euler" | "rk2" | "rk4" -- the
                                    # reference's {euler,rk2,rk4}_nmpc_*.m)
    transcription: str = "trapezoidal"  # C-NMPC transcription
                                    # ("trapezoidal" | "hs"; hs =
                                    # Hermite-Simpson, kinematic only,
                                    # hs_nmpc_kinematic_curvilinear.m)
    reference: str = "speed_ramp"   # "speed_ramp" (main.m:106-114) |
                                    # "raceline" (planner tracking, main.m:115)
    mpc: MPCParams = MPCParams()
    ipm: ipm.IpmOptions = ipm.IpmOptions()
    slack_eps: float = 1e-6         # slack-activation threshold (MATLAB: != 0)
    qp_backend: str = "dense"       # LTV QP backend: "dense" (condensed
                                    # IPM, ops/ipm.py) | "riccati"
                                    # (uncondensed stage-wise IPM,
                                    # ops/riccati.py)
    conv_thresholds: tuple | None = None
                                    # (pres, mu) bars for the converged /
                                    # abnormal-exit metric (the analogue of
                                    # qpOASES exitflag != 0, main.m:209,222).
                                    # None: per-backend defaults
                                    # (CONV_THRESHOLDS) -- each backend's
                                    # f32 residual floor differs (the
                                    # Riccati recursion's cancellation floor
                                    # sits above the dense path's), so one
                                    # global bar misreads the flagship
                                    # backend as "every tick failed".


@dataclasses.dataclass(frozen=True)
class SimOutputs:
    """Per-tick traces + scalar summary metrics (``main.m:196-228``)."""

    x_history: Any        # (T, 7) plant states after each tick
    u_history: Any        # (T, 2) first optimal control per tick
    n_history: Any        # (T,) lateral offsets
    obj_history: Any      # (T,) optimal objective values
    slack_n: Any          # (T,)
    slack_tyre: Any       # (T,)
    solver_iters: Any     # (T,)
    qp_pres: Any          # (T,) solver primal residual (backend floor data)
    qp_mu: Any            # (T,) solver complementarity measure
    converged: Any        # (T,) bool
    active: Any           # (T,) bool: tick ran before lap completion
    fcr: Any              # (T,) rear lateral tyre force (plant)
    lap_time: Any
    lap_done: Any
    track_violation: Any
    max_track_violation: Any
    tyre_violation: Any
    max_tyre_violation: Any
    mean_objective: Any
    abnormal_exit_frac: Any
    slack_n_frac: Any
    slack_tyre_frac: Any
    mean_iters: Any
    max_iters: Any


jax.tree_util.register_dataclass(
    SimOutputs,
    data_fields=[f.name for f in dataclasses.fields(SimOutputs)],
    meta_fields=[])


# Per-backend convergence bars (pres, mu) for the abnormal-exit metric,
# set just above each backend's measured f32 residual floor on warm
# production ticks (scripts/riccati_validation.py lap rows measure the
# floors; f64 runs sit far below either bar).  Measured on-chip lap
# medians (RICCATI_VALIDATION.json): dense f32 pres reaches < 1e-6 on
# most ticks; riccati + F32_PRODUCTION (the accuracy preset) floors at
# pres_median ~8e-6 / p95 ~1.2e-2; riccati + the 12-iteration F32_OPTS
# throughput preset floors at pres_median ~5e-3 (its converged flag
# honestly reads mostly-false -- use F32_PRODUCTION when the metric
# matters).  The (2e-3, 1e-3) riccati bar puts the flagship preset's
# abnormal_exit_frac at 0.25-0.45 across the lap matrix -- the same band
# as the dense rows under their own bar (0.15-0.42).
CONV_THRESHOLDS = {"dense": (1e-6, 1e-3), "riccati": (2e-3, 1e-3)}


def _conv_bars(cfg: "SimConfig"):
    if cfg.conv_thresholds is not None:
        return cfg.conv_thresholds
    return CONV_THRESHOLDS.get(cfg.qp_backend, (1e-6, 1e-3))


def _initial_guess(cfg: SimConfig, dtype):
    """MPC warm-start trajectory (``main.m:44-48``): quadratic arclength,
    linear velocity ramp at 10 m/s^2, constant accel control."""
    N = cfg.mpc.n_steps
    dt = cfg.mpc.dt
    if cfg.mode == "c-nmpc":
        if cfg.transcription == "hs":
            # 2N+1 points at dt/2 spacing (hs_nmpc_kinematic_curvilinear.m:25)
            N = 2 * N + 1
            dt = dt / 2.0
        else:
            N = N + 1  # collocation keeps the initial point (main.m:50-51)
    nx = 5 if cfg.model == "kinematic" else 7
    t = dt * jnp.arange(1, N + 1, dtype=dtype)
    x_opt = jnp.zeros((N, nx), dtype)
    x_opt = x_opt.at[:, 0].set(10.0 * t ** 2 / 2.0)
    x_opt = x_opt.at[:, 3].set(10.0 * t)
    u_opt = jnp.tile(jnp.asarray([10.0, 0.0], dtype), (N, 1))
    return x_opt, u_opt


def _reference(cfg: SimConfig, x0, plant_vx, dtype):
    """Speed-ramp reference toward the target velocity (``main.m:106-114``)."""
    N = cfg.mpc.n_steps
    dt = cfg.mpc.dt
    tv = cfg.mpc.target_vel
    nx = x0.shape[0]
    steps = jnp.arange(1, N + 1, dtype=dtype)
    up = jnp.minimum(x0[3] + 10.0 * dt * steps, tv)
    down = jnp.maximum(x0[3] - 10.0 * dt * steps, tv)
    v_ref = jnp.where(plant_vx < tv, up, down)
    x_ref = jnp.zeros((N, nx), dtype)
    x_ref = x_ref.at[:, 3].set(v_ref)
    x_ref = x_ref.at[:, 0].set(x0[0] + jnp.cumsum(v_ref * dt))
    return x_ref


def _build_tick(track, params: VehicleParams, cfg: SimConfig, x_init,
                plan):
    """Construct the per-tick transition ``tick(carry, _) -> (carry, out)``
    and its initial carry.  Shared by the scanned (:func:`simulate`) and the
    host-stepped timed (:func:`simulate_timed`) drivers."""
    dtype = track.px.dtype
    kinematic = cfg.model == "kinematic"
    nx = 5 if kinematic else 7
    dt = cfg.mpc.dt

    if x_init is None:
        x_init = jnp.zeros((7,), dtype)

    x_opt0, u_opt0 = _initial_guess(cfg, dtype)

    if kinematic:
        _f = lambda x, u: cm.f_curv_kin(x, u, track, params)
    else:
        _f = lambda x, u: cm.f_curv_dyn_only(x, u, track, params)
    _step = lambda x, u: integrators.rk2_step(_f, x, u, cfg.mpc.dt)

    # Warm-start policy (measured, round 3):
    #   * LTV carries the previous tick's duals/primal through the sim scan
    #     (qpOASES hot-start analogue; required for the 12-iteration f32
    #     budget).
    #   * SQP modes warm-start only WITHIN the SQP loop (mpc/sqp.py:
    #     run_sqp; ~1 IPM iteration saved per later subproblem,
    #     NMPC_WARM.json).  The ACROSS-tick warm start of subproblem 1 is
    #     deliberately NOT used: the previous solution is unshifted while
    #     the new subproblem is linearised at the SHIFTED trajectory, and
    #     that inconsistency measured neutral at best (0.9x) and
    #     destabilised the marginal trapezoidal-dynamic config on fss2019
    #     (divergence to ~5e7 slack; see round-3 commit history).
    if cfg.mode == "ltv":
        base_ltv = ltv.ltv_mpc_kinematic if kinematic else ltv.ltv_mpc_dynamic
        solver = (lambda x0, x_ref, track, params, mpc, x_lin, u_lin, opts,
                  warm=None: base_ltv(x0, x_ref, track, params, mpc, x_lin,
                                      u_lin, opts, warm=warm,
                                      backend=cfg.qp_backend))
    elif cfg.mode == "ms-nmpc":
        base = sqp.ms_nmpc_kinematic if kinematic else sqp.ms_nmpc_dynamic
        solver = (lambda x0, x_ref, track, params, mpc, x_lin, u_lin, opts,
                  warm=None:
                  base(x0, x_ref, track, params, mpc, *sqp.shift_trajectory(
                      x_lin, u_lin, _step), opts, stepper=cfg.stepper,
                      sqp_iters=cfg.sqp_iters, backend=cfg.qp_backend))
    elif cfg.mode == "c-nmpc" and cfg.transcription == "hs":
        if not kinematic:
            raise ValueError("hs transcription is kinematic-only "
                             "(reference parity: hs_nmpc_kinematic only)")
        _step_half = lambda x, u: integrators.rk2_step(_f, x, u, cfg.mpc.dt / 2.0)
        solver = (lambda x0, x_ref, track, params, mpc, x_lin, u_lin, opts,
                  warm=None:
                  collocation.hs_nmpc_kinematic(
                      x0, x_ref, track, params, mpc,
                      *collocation.hs_shift_trajectory(x_lin, u_lin,
                                                       _step_half),
                      opts, sqp_iters=cfg.sqp_iters))
    elif cfg.mode == "c-nmpc":
        base = (collocation.trapezoidal_nmpc_kinematic if kinematic
                else collocation.trapezoidal_nmpc_dynamic)
        solver = (lambda x0, x_ref, track, params, mpc, x_lin, u_lin, opts,
                  warm=None:
                  base(x0, x_ref, track, params, mpc, *sqp.shift_trajectory(
                      x_lin, u_lin, _step), opts,
                      sqp_iters=cfg.sqp_iters, backend=cfg.qp_backend))
    else:
        raise ValueError(f"unknown mode {cfg.mode}")

    def plant_substeps(x, v_ref, delta_ref, pids):
        vel_pid, steer_pid = pids

        def sub(carry, _):
            x, vel_pid, steer_pid = carry
            fx, vel_pid = pid.pid_step(v_ref, x[3], VEL_PID, vel_pid)
            sr, steer_pid = pid.pid_step(delta_ref, x[6], STEER_PID, steer_pid)
            u = jnp.stack([fx, sr])
            x = integrators.rk6_step(lambda xx, uu: cart.f_cart_dyn(xx, uu, params),
                                     x, u, dt / cfg.n_substeps)
            return (x, vel_pid, steer_pid), None

        (x, vel_pid, steer_pid), _ = lax.scan(
            sub, (x, vel_pid, steer_pid), None, length=cfg.n_substeps)
        return x, (vel_pid, steer_pid)

    def tick(carry, _):
        x, x_opt, u_opt, pids, done, qp_prev = carry

        # -- project onto track (warm start: first predicted s, main.m:93) --
        s, n, mu = transforms.cartesian_to_curvilinear(
            x[0], x[1], x[2], track, x_opt[0, 0])
        if kinematic:
            x0 = jnp.stack([s, n, mu, jnp.hypot(x[3], x[4]), x[6]])
        else:
            x0 = jnp.stack([s, n, mu, x[3], x[4], x[5], x[6]])

        done = done | (s >= track.L)

        if cfg.reference == "raceline":
            from ..planner.reference import obtain_reference as _obref
            ds_plan = track.L / plan.t_node.shape[0]
            x_ref = _obref(plan.y_opt, plan.u_opt, plan.t_node, ds_plan,
                           x0[0], dt, cfg.mpc.n_steps)
            x_ref = x_ref[:, :nx].astype(dtype)
        else:
            x_ref = _reference(cfg, x0, x[3], dtype)

        res = solver(x0, x_ref, track, params, cfg.mpc, x_opt, u_opt,
                     cfg.ipm, warm=qp_prev)

        # actuation setpoints: first predicted stage (main.m:167-173); for
        # collocation the first *free* point is index 1 (point 0 is x0;
        # for HS points are at dt/2 so the first full knot is index 2)
        if cfg.mode == "c-nmpc":
            lead = 2 if cfg.transcription == "hs" else 1
        else:
            lead = 0
        v_ref = res.x_opt[lead, 3]
        delta_ref = res.x_opt[lead, nx - 1]
        x_new, pids_new = plant_substeps(x, v_ref, delta_ref, pids)

        # freeze everything once the lap is complete
        x = jnp.where(done, x, x_new)
        x_opt = jnp.where(done, x_opt, res.x_opt)
        u_opt = jnp.where(done, u_opt, res.u_opt)
        pids = jax.tree_util.tree_map(
            lambda a, b: jnp.where(done, a, b), pids, pids_new)
        qp_prev = jax.tree_util.tree_map(
            lambda a, b: jnp.where(done, a, b), qp_prev, res.qp)

        fcr = cm.rear_lateral_force(
            jnp.concatenate([jnp.zeros((3,), dtype), x[3:7]]), params)
        c_pres, c_mu = _conv_bars(cfg)
        converged = (res.qp.primal_res < c_pres) & (res.qp.mu < c_mu)

        out = dict(
            x=x, u=res.u_opt[0], n=n, obj=res.fval,
            slack_n=res.slack[0], slack_tyre=res.slack[-1],
            iters=res.qp.iterations, converged=converged,
            pres=res.qp.primal_res, mu=res.qp.mu,
            active=jnp.logical_not(done), fcr=fcr,
        )
        return (x, x_opt, u_opt, pids, done, qp_prev), out

    pids0 = (pid.pid_init(jnp.zeros((), dtype)), pid.pid_init(jnp.zeros((), dtype)))

    # dual warm-start carry for the LTV mode: structure via eval_shape, seeded
    # with zeros (floored inside the IPM on the first tick)
    def _solve_for_shape():
        x0_t = jnp.zeros((nx,), dtype)
        x_ref_t = jnp.zeros((cfg.mpc.n_steps, nx), dtype)
        return solver(x0_t, x_ref_t, track, params, cfg.mpc, x_opt0,
                      u_opt0, cfg.ipm)

    shape = jax.eval_shape(_solve_for_shape)
    qp0 = jax.tree_util.tree_map(
        lambda sd: jnp.zeros(sd.shape, sd.dtype), shape.qp)

    carry0 = (x_init.astype(dtype), x_opt0, u_opt0, pids0,
              jnp.zeros((), jnp.bool_), qp0)
    return tick, carry0


def simulate(track, params: VehicleParams = VehicleParams(),
             cfg: SimConfig = SimConfig(), x_init=None,
             plan=None) -> SimOutputs:
    """Run one closed-loop simulation.  jit/vmap-safe.

    ``x_init``: optional (7,) initial Cartesian plant state (default zeros,
    ``main.m:63``).  ``plan``: a ``PlannerResult`` (dynamic planner) when
    ``cfg.reference == "raceline"`` -- the MPC then tracks the time-resampled
    minimum-time raceline instead of the speed ramp.
    """
    tick, carry0 = _build_tick(track, params, cfg, x_init, plan)
    _, tr = lax.scan(tick, carry0, None, length=cfg.n_ticks)
    return _summarise(tr, cfg, params, track.px.dtype)


def simulate_chunked(track, params, cfg: SimConfig, chunk_ticks: int = 100,
                     batched: bool = True) -> SimOutputs:
    """Batched :func:`simulate` split into host-dispatched scan chunks.

    The axon-tunnel TPU backend caps single-dispatch execution time: one
    600-tick scan at pod batch (3 x 4096 scenarios) dies with a device
    error, while the same work in 100-tick chunks runs fine (measured,
    scripts/pod_scale.py).  Each chunk is one jitted ``lax.scan`` segment
    whose carry is threaded through the host; the per-tick outputs stay
    on device and are concatenated before the single metric summary.

    ``track``/``params`` carry a leading batch axis when ``batched``.
    Chunks run ``ceil(n_ticks / chunk_ticks)`` times; the concatenated
    traces are trimmed back to exactly ``cfg.n_ticks`` before the metric
    summary, so results match :func:`simulate` for any ``n_ticks``.
    """
    if cfg.reference == "raceline":
        raise ValueError(
            "simulate_chunked does not thread a planner result; use "
            "simulate / simulate_timed for raceline-reference configs")
    n_chunks = -(-cfg.n_ticks // chunk_ticks)

    def init_fn(tr, pr):
        _, c0 = _build_tick(tr, pr, cfg, None, None)
        return c0

    def chunk_fn(tr, pr, carry):
        tick, _ = _build_tick(tr, pr, cfg, None, None)
        return lax.scan(tick, carry, None, length=chunk_ticks)

    dtype = jax.tree_util.tree_leaves(track)[0].dtype

    def summ_fn(tr_out, pr):
        return _summarise(tr_out, cfg, pr, dtype)

    if batched:
        init_fn = jax.vmap(init_fn)
        chunk_fn = jax.vmap(chunk_fn)
        summ_fn = jax.vmap(summ_fn)
    init_j = jax.jit(init_fn)
    chunk_j = jax.jit(chunk_fn)

    carry = init_j(track, params)
    outs = []
    for _ in range(n_chunks):
        carry, out = chunk_j(track, params, carry)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        outs.append(out)
    axis = 1 if batched else 0
    tr = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=axis)[
            (slice(None),) * axis + (slice(None, cfg.n_ticks),)],
        *outs)
    return jax.jit(summ_fn)(tr, params)


def simulate_timed(track, params: VehicleParams = VehicleParams(),
                   cfg: SimConfig = SimConfig(), x_init=None, plan=None):
    """Host-stepped :func:`simulate` that wall-clock-times every control
    tick -- the analogue of the reference's per-solve tic/toc metrics
    (``main.m:120,131`` timed, ``main.m:206-208,219-221`` reported as
    mean/median/max CPU time).

    Each tick is one jitted dispatch (projection + reference + MPC solve +
    PID/RK6 plant substeps), so the measured time is conservative: it
    includes the plant step the reference excludes (solve cost dominates).
    On the TPU-tunnel backend each dispatch also pays the host round trip;
    interpret absolute numbers accordingly (scripts/latency_bench.py
    isolates the solve).

    Stops as soon as the lap completes (host-side early exit -- the scanned
    driver cannot).  Returns ``(SimOutputs, timing)`` where ``timing`` has
    mean/median/p99/max tick seconds over the lap plus the tick count.
    """
    import time as _time

    # track/params are jit ARGUMENTS (not baked constants), so one compile
    # serves every track of the same shape -- the three FS tracks all load
    # at n_segments=100, cutting the per-config tunnel compiles 3x in the
    # on-chip lap matrix (scripts/lap_metrics.py tpu).
    def step_fn(tr, pr, carry):
        tick, _ = _build_tick(tr, pr, cfg, x_init, plan)
        return tick(carry, None)

    step_j = jax.jit(step_fn)
    _, carry0 = _build_tick(track, params, cfg, x_init, plan)
    step_j(track, params, carry0)  # compile (discarded; not advanced)

    carry = carry0
    outs, times = [], []
    for _ in range(cfg.n_ticks):
        t0 = _time.perf_counter()
        carry, out = step_j(track, params, carry)
        out = jax.block_until_ready(out)
        times.append(_time.perf_counter() - t0)
        outs.append(jax.device_get(out))
        if bool(jax.device_get(carry[4])):   # lap done
            break

    import numpy as _np
    tr = {k: jnp.asarray(_np.stack([o[k] for o in outs]))
          for k in outs[0]}
    summary = _summarise(tr, cfg, params, track.px.dtype)
    t = _np.asarray(times)
    timing = {
        "n_ticks_timed": int(t.size),
        "tick_time_mean_s": float(t.mean()),
        "tick_time_median_s": float(_np.median(t)),
        "tick_time_p99_s": float(_np.quantile(t, 0.99)),
        "tick_time_max_s": float(t.max()),
        "budget_s": float(cfg.mpc.dt),
    }
    return summary, timing


def _summarise(tr, cfg: SimConfig, params: VehicleParams, dtype):
    """Aggregate per-tick traces into the reference's metric set
    (``main.m:196-228``)."""
    dt = cfg.mpc.dt
    active = tr["active"]
    act = active.astype(dtype)
    n_act = jnp.maximum(jnp.sum(act), 1.0)

    n_abs = jnp.abs(tr["n"])
    tv = jnp.maximum(n_abs - cfg.mpc.n_max, 0.0) * act
    track_violation = jnp.sum(tv) * dt
    max_track_violation = jnp.max(tv)

    fe = ((tr["fcr"] / (params.m * params.ac_max)) ** 2
          + (tr["u"][:, 0] / params.al_max) ** 2)
    fe_exc = jnp.maximum(fe - 1.0, 0.0) * act
    tyre_violation = jnp.sum(fe_exc) * dt
    max_tyre_violation = jnp.max(fe_exc)

    slack_free = ((tr["slack_n"] < cfg.slack_eps)
                  & (tr["slack_tyre"] < cfg.slack_eps) & active)
    sf = slack_free.astype(dtype)
    mean_obj = jnp.sum(tr["obj"] * sf) / jnp.maximum(jnp.sum(sf), 1.0)

    lap_done = jnp.logical_not(active[-1])
    lap_time = jnp.sum(act) * dt

    return SimOutputs(
        x_history=tr["x"], u_history=tr["u"], n_history=tr["n"],
        obj_history=tr["obj"], slack_n=tr["slack_n"],
        slack_tyre=tr["slack_tyre"], solver_iters=tr["iters"],
        qp_pres=tr["pres"], qp_mu=tr["mu"],
        converged=tr["converged"], active=active, fcr=tr["fcr"],
        lap_time=lap_time, lap_done=lap_done,
        track_violation=track_violation,
        max_track_violation=max_track_violation,
        tyre_violation=tyre_violation,
        max_tyre_violation=max_tyre_violation,
        mean_objective=mean_obj,
        abnormal_exit_frac=jnp.sum(jnp.logical_not(tr["converged"]) * act) / n_act,
        slack_n_frac=jnp.sum((tr["slack_n"] >= cfg.slack_eps) * act) / n_act,
        slack_tyre_frac=jnp.sum((tr["slack_tyre"] >= cfg.slack_eps) * act) / n_act,
        mean_iters=jnp.sum(tr["iters"] * act) / n_act,
        max_iters=jnp.max(jnp.where(active, tr["iters"], 0)),
    )


def simulate_jit(track, params, cfg: SimConfig, x_init=None):
    """jit-compiled entry with the static config closed over."""
    fn = jax.jit(partial(simulate, cfg=cfg))
    return fn(track, params, x_init=x_init)
