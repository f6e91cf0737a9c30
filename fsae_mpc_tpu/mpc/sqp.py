"""SQP-based nonlinear MPC: the TPU-native replacement for the IPOPT stack.

The reference's eight NMPC solvers hand IPOPT five MATLAB callbacks and
cross the MATLAB<->C++ boundary twice per interior-point iteration (up to
5000 iterations, ``rk2_nmpc_kinematic_curvilinear.m``, SURVEY.md section
3.3).  Here each NMPC tick is a short SQP loop compiled into a single XLA
program:

    repeat K times:
        linearise the transcription at the current iterate (autodiff)
        -> condense states out               (ops.condense)
        -> solve the convex subproblem       (ops.ipm, exact objective
           Hessian -- the tracking objective is quadratic, so SQP's
           subproblem is exact and converges quadratically near the
           solution; the reference's L-BFGS approximation does not)
        -> take the full step (real-time-iteration style; the loop is
           warm-started by the shift-initialisation carried across ticks)

Soft slacks keep every subproblem feasible, matching the reference's
always-feasible design (SURVEY.md section 5).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..config import MPCParams, VehicleParams
from ..models import curvilinear as cm
from ..models import integrators
from ..ops.condense import condense, rollout
from ..ops import ipm
from ..ops import riccati
from . import constraints as cons
from .ltv import assemble_condensed_qp, build_stage_qp, _control_bounds


@dataclasses.dataclass(frozen=True)
class SqpResult:
    x_opt: Any      # (N, nx) state trajectory (multiple-shooting stages)
    u_opt: Any      # (NC, nu) control trajectory
    slack: Any      # (n_soft,)
    fval: Any       # NLP objective at the final iterate
    qp: Any         # last subproblem's IpmResult


jax.tree_util.register_dataclass(
    SqpResult, data_fields=["x_opt", "u_opt", "slack", "fval", "qp"],
    meta_fields=[])


def run_sqp(sqp_iter, x_init, u_init, sqp_iters: int, warm):
    """Shared SQP driver with subproblem warm-starting.

    ``sqp_iter((x_lin, u_lin), warm)`` solves one convex subproblem
    (``warm``: an :class:`ops.ipm.IpmResult` or ``None``) and returns
    ``((x_new, u_new), (slack, fval, res))``.  The driver unrolls the
    first subproblem (cold-centered when ``warm is None``, else started
    from the previous tick's solution -- the analogue of the reference's
    IPOPT zl/zu/lambda warm start, ``rk2_nmpc_kinematic_curvilinear.m:
    14-20``) and warm-starts every later subproblem from its predecessor
    inside a rolled ``lax.scan``.

    Returns ``(x_opt, u_opt, (slack, fval, res))`` of the last iterate.
    """
    carry, out1 = sqp_iter((x_init, u_init), warm)
    if sqp_iters <= 1:
        return carry[0], carry[1], out1

    def body(c, _):
        (x, u, res_prev) = c
        (x_n, u_n), out = sqp_iter((x, u), res_prev)
        return (x_n, u_n, out[2]), out

    (x_opt, u_opt, _), outs = lax.scan(
        body, (*carry, out1[2]), None, length=sqp_iters - 1)
    last = jax.tree_util.tree_map(lambda a: a[-1], outs)
    return x_opt, u_opt, last


def shift_trajectory(x_opt, u_opt, step_fn):
    """Warm-start shift: drop the first stage, roll the last stage forward
    one step (``rk2_nmpc_kinematic_curvilinear.m:62-65``)."""
    x_last = step_fn(x_opt[-1], u_opt[-1])
    x_new = jnp.concatenate([x_opt[1:], x_last[None]], axis=0)
    u_new = jnp.concatenate([u_opt[1:], u_opt[-1:]], axis=0)
    return x_new, u_new


def _nmpc_weights(mpc: MPCParams, nx, N, dtype):
    q = jnp.zeros((nx,), dtype).at[0].set(mpc.q_s).at[1].set(mpc.q_n) \
        .at[2].set(mpc.q_mu)
    q_diag = jnp.concatenate([jnp.tile(q, N - 1), q * mpc.q_terminal_scale])
    r_diag = jnp.tile(jnp.asarray([mpc.r_a, mpc.r_delta_d], dtype), N)
    return q_diag, r_diag


def _align_prestep_group(grp, Ad, Bd, dd, x0):
    """Re-express a pre-step-state constraint group in the stage-aligned
    basis required by the stage-wise Riccati solver -- EXACTLY.

    The MS-NMPC friction rows constrain the step's ORIGIN state with the
    step's control (row k touches (x_k, u_k); ``state_rows = [-1,
    0..N-2]``, ``rk2_nmpc_dynamic_curvilinear.m:102-113``), while the
    stage solver's rows read C x_{k+1} + D u_k.  Substituting the (QP-
    exact) dynamics equality  x_k = Ad_k^{-1} (x_{k+1} - Bd_k u_k - dd_k)
    gives the same affine row on the (x_{k+1}, u_k) pair:

        C' = C Ad^{-1},  D' = D - C' Bd,  offset' = offset - C' dd.

    Row 0's origin state is the FIXED x0, so its C row folds into the
    offset.  The feasible set is unchanged (the substitution holds on
    every QP-feasible point), so the stage QP's minimiser equals the
    condensed QP's.
    """
    N = Ad.shape[0]
    exp = (np.array_equal(grp.state_rows,
                          np.concatenate([[-1], np.arange(N - 1)]))
           and np.array_equal(grp.ctrl_cols, np.arange(N)))
    if not exp:
        raise ValueError("_align_prestep_group expects rows on the "
                         "pre-step state: state_rows = [-1, 0..N-2]")
    Cp = jnp.swapaxes(
        jnp.linalg.solve(jnp.swapaxes(Ad, -1, -2),
                         jnp.swapaxes(grp.C, -1, -2)), -1, -2)
    Dp = grp.D - jnp.einsum("nri,nik->nrk", Cp, Bd)
    off = grp.offset_const - jnp.einsum("nri,ni->nr", Cp, dd)
    Cp = Cp.at[0].set(0.0)
    Dp = Dp.at[0].set(grp.D[0])
    off = off.at[0].set(grp.offset_const[0] + grp.C[0] @ x0)
    return dataclasses.replace(
        grp, C=Cp, D=Dp, offset_const=off,
        state_rows=np.arange(N, dtype=np.int32),
        ctrl_cols=np.arange(N, dtype=np.int32))


def ms_nmpc_kinematic(x0, x_ref, track, params: VehicleParams,
                      mpc: MPCParams, x_init, u_init,
                      opts: ipm.IpmOptions = ipm.IpmOptions(),
                      stepper: str = "rk2", sqp_iters: int = 3,
                      warm=None, backend: str = "dense") -> SqpResult:
    """Multiple-shooting NMPC, kinematic model.

    Equivalent problem to ``{euler,rk2,rk4}_nmpc_kinematic_curvilinear.m``:
    tracking cost Q=[5,250,2000,0,0] / R=[10,10] (terminal x10), RK defects
    eliminated by condensing, |n|<=0.75 and |v^2 delta/L|<=5 softened by ONE
    shared slack weighted 1e8 (``:106-113``).  ``x_init/u_init``: SQP
    starting trajectory (use :func:`shift_trajectory` across ticks).

    ``backend="riccati"`` solves every SQP subproblem in its uncondensed
    stage-wise form (``ops/riccati.py``) -- the constraint groups are
    stage-aligned already, so the subproblem maps directly onto
    :func:`mpc.ltv.build_stage_qp`.
    """
    N = mpc.n_steps
    dtype = x_init.dtype
    f = lambda x, u: cm.f_curv_kin(x, u, track, params)
    step = lambda x, u: integrators.STEPPERS[stepper](f, x, u, mpc.dt)
    q_diag, r_diag = _nmpc_weights(mpc, 5, N, dtype)
    q_vec = jnp.asarray([mpc.q_s, mpc.q_n, mpc.q_mu, 0.0, 0.0], dtype)
    r_ab = jnp.asarray([mpc.r_a, mpc.r_delta_d], dtype)
    u_lb, u_ub = _control_bounds(mpc, N, dtype)

    def sqp_iter(carry, qp_warm):
        x_lin, u_lin = carry
        # Newton linearisation of the defect x_i = step(x_{i-1}, u_i): the
        # step is linearised at its ORIGIN state (reference NMPC Jacobians,
        # ``rk2_nmpc_kinematic_curvilinear.m:166-199``) -- destination-state
        # linearisation (the LTV convention) leaves an O(step^2) fixed-point
        # bias in the defects.
        x_pre = jnp.concatenate([x0[None], x_lin[:-1]], axis=0)
        Ad, Bd, dd = integrators.linearize_discrete(step, x_pre, u_lin)
        groups = [
            cons.state_box_group([3, 4], np.array([0.0, -mpc.delta_max]),
                                 np.array([np.inf, mpc.delta_max]),
                                 np.array([-1, -1]), x_lin, u_lin),
            cons.state_box_group([1], np.array([-mpc.n_max]),
                                 np.array([mpc.n_max]), np.array([0]),
                                 x_lin, u_lin),
            cons.kinematic_tyre_group(x_lin, u_lin, mpc, params, slack=0),
        ]
        if backend == "riccati":
            qp_s, const = build_stage_qp(
                x0, x_ref, q_vec, r_ab, [mpc.w_track], groups, mpc,
                Ad, Bd, dd, u_lb, u_ub)
            res = riccati.solve_stage_qp(qp_s, opts, warm=qp_warm)
            u_new = res.u
            x_new = rollout(Ad, Bd, dd, x0, u_new)
            return (x_new, u_new), (res.s, res.objective + const, res)
        A_bar, B_bar, d_bar = condense(Ad, Bd, dd)
        H, g, A, lb, ub, lbA, ubA, const = assemble_condensed_qp(
            A_bar, B_bar, d_bar, x0, x_ref, q_diag, r_diag, [mpc.w_track],
            groups, u_lb, u_ub)
        res = ipm.solve_qp(H, g, A, lb, ub, lbA, ubA, opts, warm=qp_warm)
        u_new = res.x[:N * 2].reshape(N, 2)
        x_new = rollout(Ad, Bd, dd, x0, u_new)
        return (x_new, u_new), (res.x[N * 2:], res.objective + const, res)

    x_opt, u_opt, last = run_sqp(sqp_iter, x_init, u_init, sqp_iters, warm)
    return SqpResult(x_opt=x_opt, u_opt=u_opt, slack=last[0],
                     fval=last[1], qp=last[2])


def ms_nmpc_dynamic(x0, x_ref, track, params: VehicleParams,
                    mpc: MPCParams, x_init, u_init,
                    opts: ipm.IpmOptions = ipm.IpmOptions(),
                    stepper: str = "rk2", sqp_iters: int = 3,
                    trust_u=(4.0, 0.3), warm=None,
                    backend: str = "dense") -> SqpResult:
    """Multiple-shooting NMPC, dynamic model.

    Equivalent problem to ``{euler,rk2,rk4}_nmpc_dynamic_curvilinear.m``:
    exact friction-ellipse rows (Fcr/(m ac))^2 + (a/al)^2 <= 1 + sigma_tyre
    evaluated at the *pre-step* state with the step's control
    (``rk2_nmpc_dynamic_curvilinear.m:102-113``), track softening 1e8,
    tyre softening 1e5, acceleration unbounded (the ellipse bounds it).
    Slack order: [track, tyre].

    ``trust_u``: per-component trust region |u - u_lin| <= trust_u for the
    QP subproblem.  The quadratic (u1/al)^2 ellipse term has zero gradient
    at u_lin ~ 0, so an unguarded linearised subproblem can command huge
    braking; the trust region keeps the model honest and is inactive at the
    SQP fixed point (no effect on the converged solution).

    ``backend="riccati"``: stage-wise subproblem solves.  The friction
    rows touch the step's ORIGIN state; :func:`_align_prestep_group`
    re-expresses them exactly on the (x_{k+1}, u_k) pair, so the stage QP
    is the SAME subproblem.
    """
    N = mpc.n_steps
    dtype = x_init.dtype
    f = lambda x, u: cm.f_curv_dyn_only(x, u, track, params)
    step = lambda x, u: integrators.STEPPERS[stepper](f, x, u, mpc.dt)
    q_diag, r_diag = _nmpc_weights(mpc, 7, N, dtype)
    q_vec = jnp.asarray([mpc.q_s, mpc.q_n, mpc.q_mu, 0.0, 0.0, 0.0, 0.0],
                        dtype)
    r_ab = jnp.asarray([mpc.r_a, mpc.r_delta_d], dtype)
    inf = np.inf
    u_lb = jnp.tile(jnp.asarray([-inf, -mpc.delta_d_max], dtype), (N, 1))
    u_ub = jnp.tile(jnp.asarray([inf, mpc.delta_d_max], dtype), (N, 1))

    pre_rows = np.concatenate([[-1], np.arange(N - 1)])

    def sqp_iter(carry, qp_warm):
        x_lin, u_lin = carry
        # origin-state Newton linearisation (see ms_nmpc_kinematic)
        x_pre = jnp.concatenate([x0[None], x_lin[:-1]], axis=0)
        Ad, Bd, dd = integrators.linearize_discrete(step, x_pre, u_lin)
        groups = [
            cons.state_box_group([3, 6], np.array([0.0, -mpc.delta_max]),
                                 np.array([np.inf, mpc.delta_max]),
                                 np.array([-1, -1]), x_lin, u_lin),
            cons.state_box_group([1], np.array([-mpc.n_max]),
                                 np.array([mpc.n_max]), np.array([0]),
                                 x_lin, u_lin),
            cons.friction_ellipse_group(x_pre, u_lin, mpc, params, slack=1,
                                        state_rows=pre_rows),
        ]
        tr = jnp.asarray(trust_u, dtype)
        lb_eff = jnp.maximum(u_lb, u_lin - tr)
        ub_eff = jnp.minimum(u_ub, u_lin + tr)
        if backend == "riccati":
            groups[2] = _align_prestep_group(groups[2], Ad, Bd, dd, x0)
            qp_s, const = build_stage_qp(
                x0, x_ref, q_vec, r_ab, [mpc.w_track, mpc.w_slip], groups,
                mpc, Ad, Bd, dd, lb_eff, ub_eff)
            res = riccati.solve_stage_qp(qp_s, opts, warm=qp_warm)
            u_new = res.u
            x_new = rollout(Ad, Bd, dd, x0, u_new)
            return (x_new, u_new), (res.s, res.objective + const, res)
        A_bar, B_bar, d_bar = condense(Ad, Bd, dd)
        H, g, A, lb, ub, lbA, ubA, const = assemble_condensed_qp(
            A_bar, B_bar, d_bar, x0, x_ref, q_diag, r_diag,
            [mpc.w_track, mpc.w_slip], groups, lb_eff, ub_eff)
        res = ipm.solve_qp(H, g, A, lb, ub, lbA, ubA, opts, warm=qp_warm)
        u_new = res.x[:N * 2].reshape(N, 2)
        x_new = rollout(Ad, Bd, dd, x0, u_new)
        return (x_new, u_new), (res.x[N * 2:], res.objective + const, res)

    x_opt, u_opt, last = run_sqp(sqp_iter, x_init, u_init, sqp_iters, warm)
    return SqpResult(x_opt=x_opt, u_opt=u_opt, slack=last[0],
                     fval=last[1], qp=last[2])
