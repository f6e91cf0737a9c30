"""LTV-MPC controllers (kinematic + dynamic curvilinear bicycle).

Per control tick (the 20 Hz hot path, ``mpc/ltv/ltvmpc_*_curvilinear.m``):

  1. linearise the discrete RK step along the previous optimal trajectory
     (autodiff; reference hand chain rule ``rk4_dynamic_curvilinear.m``),
  2. condense to dense prediction matrices with a ``lax.scan``
     (reference ``sequential_integration.m``),
  3. build the condensed QP cost (``generate_qp.m:29-33``) and the
     state/soft/slip/friction-polygon constraint rows,
  4. solve with the batched interior-point method (reference: qpOASES MEX).

The whole tick is one jit-compiled function; ``vmap`` turns it into
thousands of concurrent MPC solves per chip.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..config import MPCParams, VehicleParams
from ..models import curvilinear as cm
from ..models import integrators
from ..ops.condense import condense as _condense, rollout as _rollout
from ..ops import ipm
from . import constraints as cons


@dataclasses.dataclass(frozen=True)
class LtvResult:
    u_opt: Any      # (N, nu) optimal control trajectory
    x_opt: Any      # (N, nx) predicted optimal states
    slack: Any      # (n_soft,) slack values
    fval: Any       # objective incl. the constant dropped by the QP
    qp: Any         # IpmResult


jax.tree_util.register_dataclass(
    LtvResult, data_fields=["u_opt", "x_opt", "slack", "fval", "qp"],
    meta_fields=[])


def assemble_condensed_qp(A_bar, B_bar, d_bar, x0, x_ref, q_diag, r_diag,
                          r_soft: Sequence[float], groups, u_lb, u_ub,
                          x_lin, u_lin):
    """Assemble the condensed QP over v = [u_0..u_{N-1}, sigma_1..sigma_k].

    ``groups`` is a list of :class:`constraints.StageConstraint` whose
    ``lb/ub/slack_idx`` must be *static* numpy arrays (they define the row
    structure).  Returns (H, g, A, lb, ub, lbA, ubA, const).
    """
    N, nx = d_bar.shape
    nu = u_lin.shape[1]
    n_soft = len(r_soft)
    nv = N * nu + n_soft
    dtype = B_bar.dtype

    B_flat = B_bar.reshape(N * nx, N * nu)
    err = (jnp.einsum("nij,j->ni", A_bar, x0) + d_bar - x_ref).reshape(-1)

    QB = B_flat * q_diag[:, None]
    Hu = 2.0 * (B_flat.T @ QB)
    Hu = Hu + jnp.diag(2.0 * r_diag)
    H = jnp.zeros((nv, nv), dtype).at[:N * nu, :N * nu].set(Hu)
    g = jnp.zeros((nv,), dtype).at[:N * nu].set(2.0 * (QB.T @ err))
    g = g.at[N * nu:].set(jnp.asarray(r_soft, dtype))
    const = err @ (q_diag * err)

    lb_v = jnp.concatenate([u_lb.reshape(-1), jnp.zeros((n_soft,), dtype)])
    ub_v = jnp.concatenate([u_ub.reshape(-1),
                            jnp.full((n_soft,), jnp.inf, dtype)])

    # --- constraint rows -------------------------------------------------
    x_pred_err = jnp.einsum("nij,j->ni", A_bar, x0) + d_bar - x_lin  # (N, nx)
    A_rows, lbA_rows, ubA_rows = [], [], []

    for grp in groups:
        r = grp.g0.shape[1]
        # rows over u: C_i @ B_bar[i]  (batched over the horizon)
        CB = jnp.einsum("nri,nij->nrj", grp.C, B_bar)           # (N, r, N*nu)
        # add D_i at this stage's control columns
        D_full = jnp.zeros((N, r, N * nu), dtype)
        idx = jnp.arange(N)
        D_full = jax.vmap(
            lambda Df, D, i: jax.lax.dynamic_update_slice(Df, D, (0, i * nu))
        )(D_full, grp.D, idx)
        rows_u = (CB + D_full).reshape(N * r, N * nu)
        offset = (grp.g0 + jnp.einsum("nri,ni->nr", grp.C, x_pred_err)
                  - jnp.einsum("nri,ni->nr", grp.D, u_lin)).reshape(N * r)

        lb_g = np.broadcast_to(np.asarray(grp.lb, np.float64), (N, r)).reshape(-1)
        ub_g = np.broadcast_to(np.asarray(grp.ub, np.float64), (N, r)).reshape(-1)
        sidx = np.broadcast_to(np.asarray(grp.slack_idx), (N, r)).reshape(-1)

        def emit(rows, off, lo, hi, slack_col, sign):
            s_cols = jnp.zeros((rows.shape[0], n_soft), dtype)
            if slack_col is not None:
                s_cols = s_cols.at[np.arange(rows.shape[0]), slack_col].set(sign)
            A_rows.append(jnp.concatenate([rows, s_cols], axis=1))
            lbA_rows.append(lo - off)
            ubA_rows.append(hi - off)

        hard = sidx < 0
        if np.all(hard):
            emit(rows_u, offset, jnp.asarray(lb_g, dtype), jnp.asarray(ub_g, dtype),
                 None, 0.0)
        else:
            assert not np.any(hard), "mix of hard/soft rows within a group"
            inf = jnp.asarray(jnp.inf, dtype)
            if np.all(np.isfinite(lb_g)):
                # lower side softened: g + sigma >= lb
                emit(rows_u, offset, jnp.asarray(lb_g, dtype), inf * jnp.ones(len(lb_g), dtype),
                     sidx, +1.0)
            if np.all(np.isfinite(ub_g)):
                # upper side softened: g - sigma <= ub
                emit(rows_u, offset, -inf * jnp.ones(len(ub_g), dtype),
                     jnp.asarray(ub_g, dtype), sidx, -1.0)

    A = jnp.concatenate(A_rows, axis=0)
    lbA = jnp.concatenate(lbA_rows)
    ubA = jnp.concatenate(ubA_rows)
    return H, g, A, lb_v, ub_v, lbA, ubA, const


def _control_bounds(mpc: MPCParams, N, dtype):
    u_lb = jnp.tile(jnp.asarray([-mpc.a_max, -mpc.delta_d_max], dtype), (N, 1))
    u_ub = jnp.tile(jnp.asarray([mpc.a_max, mpc.delta_d_max], dtype), (N, 1))
    return u_lb, u_ub


def ltv_mpc_kinematic(x0, x_ref, track, params: VehicleParams,
                      mpc: MPCParams, x_lin, u_lin,
                      opts: ipm.IpmOptions = ipm.IpmOptions(),
                      stepper: str = "rk2") -> LtvResult:
    """Kinematic-model LTV-MPC tick.

    (``mpc/ltv/kinematic/ltvmpc_kinetmatic_curvilinear.m``: RK2 linearizer,
    weights Q=[5,250,2000,0,0], one track slack with weight 1e8, lateral
    -accel proxy constraint.)  ``x_ref``: (N, 5) time-major.
    """
    N = mpc.n_steps
    dtype = x_lin.dtype
    f = lambda x, u: cm.f_curv_kin(x, u, track, params)
    step = lambda x, u: integrators.STEPPERS[stepper](f, x, u, mpc.dt)

    Ad, Bd, dd = integrators.linearize_discrete(step, x_lin, u_lin)
    A_bar, B_bar, d_bar = _condense(Ad, Bd, dd)

    q = jnp.asarray([mpc.q_s, mpc.q_n, mpc.q_mu, 0.0, 0.0], dtype)
    q_diag = jnp.concatenate([jnp.tile(q, N - 1), q * mpc.q_terminal_scale])
    r_diag = jnp.tile(jnp.asarray([mpc.r_a, mpc.r_delta_d], dtype), N)

    groups = [
        cons.state_box_group([3, 4],
                             np.array([0.0, -mpc.delta_max]),
                             np.array([np.inf, mpc.delta_max]),
                             np.array([-1, -1]), x_lin, u_lin),
        cons.state_box_group([1], np.array([-mpc.n_max]),
                             np.array([mpc.n_max]), np.array([0]),
                             x_lin, u_lin),
        cons.kinematic_tyre_group(x_lin, u_lin, mpc, params, slack=0),
    ]
    u_lb, u_ub = _control_bounds(mpc, N, dtype)

    H, g, A, lb, ub, lbA, ubA, const = assemble_condensed_qp(
        A_bar, B_bar, d_bar, x0, x_ref, q_diag, r_diag, [mpc.w_track],
        groups, u_lb, u_ub, x_lin, u_lin)

    res = ipm.solve_qp(H, g, A, lb, ub, lbA, ubA, opts)
    u_flat = res.x[:N * 2]
    u_opt = u_flat.reshape(N, 2)
    x_opt = _rollout(Ad, Bd, dd, x0, u_opt)
    return LtvResult(u_opt=u_opt, x_opt=x_opt, slack=res.x[N * 2:],
                     fval=res.objective + const, qp=res)


def ltv_mpc_dynamic(x0, x_ref, track, params: VehicleParams,
                    mpc: MPCParams, x_lin, u_lin,
                    opts: ipm.IpmOptions = ipm.IpmOptions(),
                    stepper: str = "rk4") -> LtvResult:
    """Dynamic-model LTV-MPC tick.

    (``mpc/ltv/dynamic/ltvmpc_dynamic_curvilinear.m``: RK4 linearizer, four
    slacks weighted [1e8, 1e6, 1e6, 1e4] for track / rear-slip / front-slip
    / friction-polygon softening.)  ``x_ref``: (N, 7) time-major.
    """
    N = mpc.n_steps
    dtype = x_lin.dtype
    f = lambda x, u: cm.f_curv_dyn_only(x, u, track, params)
    step = lambda x, u: integrators.STEPPERS[stepper](f, x, u, mpc.dt)

    Ad, Bd, dd = integrators.linearize_discrete(step, x_lin, u_lin)
    A_bar, B_bar, d_bar = _condense(Ad, Bd, dd)

    q = jnp.asarray([mpc.q_s, mpc.q_n, mpc.q_mu, 0.0, 0.0, 0.0, 0.0], dtype)
    q_diag = jnp.concatenate([jnp.tile(q, N - 1), q * mpc.q_terminal_scale])
    r_diag = jnp.tile(jnp.asarray([mpc.r_a, mpc.r_delta_d], dtype), N)

    groups = [
        cons.state_box_group([3, 6],
                             np.array([0.0, -mpc.delta_max]),
                             np.array([np.inf, mpc.delta_max]),
                             np.array([-1, -1]), x_lin, u_lin),
        cons.state_box_group([1], np.array([-mpc.n_max]),
                             np.array([mpc.n_max]), np.array([0]),
                             x_lin, u_lin),
        cons.dynamic_slip_group(x_lin, u_lin, mpc, params,
                                slack_rear=1, slack_front=2),
        cons.friction_polygon_group(x_lin, u_lin, mpc, params, slack=3),
    ]
    u_lb, u_ub = _control_bounds(mpc, N, dtype)

    H, g, A, lb, ub, lbA, ubA, const = assemble_condensed_qp(
        A_bar, B_bar, d_bar, x0, x_ref, q_diag, r_diag,
        [mpc.w_track, mpc.w_slip, mpc.w_slip, mpc.w_tyre],
        groups, u_lb, u_ub, x_lin, u_lin)

    res = ipm.solve_qp(H, g, A, lb, ub, lbA, ubA, opts)
    u_flat = res.x[:N * 2]
    u_opt = u_flat.reshape(N, 2)
    x_opt = _rollout(Ad, Bd, dd, x0, u_opt)
    return LtvResult(u_opt=u_opt, x_opt=x_opt, slack=res.x[N * 2:],
                     fval=res.objective + const, qp=res)
