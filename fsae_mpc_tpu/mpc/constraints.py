"""Stage constraint builders for the curvilinear MPC controllers.

Each physical constraint is written once as a scalar stage function
``g(x, u)``; its linearisation rows come from ``jax.jacfwd`` vmapped over
the horizon.  This replaces the reference's hand-derived constraint
linearisers (``kinematic_tyre_linearise_constraints.m``,
``dynamic_slip_linearise_constraints.m``,
``dynamic_tyre_linearise_constraints.m`` -- 231 LoC of manual chain rule).

A group is a batch of affine rows

    lb <= offset_const_i + C_i x_{state_rows[i]} + D_i u_{ctrl_cols[i]}
          + sign * sigma_{slack_idx}  <= ub

where ``offset_const = g(x_lin, u_lin) - C x_lin - D u_lin`` is folded in by
the builder, ``state_rows[i]`` indexes the predicted-state trajectory
(-1 = the fixed initial state x0, used by transcriptions whose rows touch
the pre-step state, e.g. the MS-NMPC friction rows
``rk2_nmpc_dynamic_curvilinear.m:102-113``), and ``ctrl_cols[i]`` indexes
the control trajectory (-1 = no control dependence).

``lb/ub/slack_idx/state_rows/ctrl_cols`` are *static numpy* -- they define
the QP row structure and must stay concrete under jit tracing.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import numpy as np
import jax
import jax.numpy as jnp

from ..config import MPCParams, VehicleParams
from ..models import curvilinear as cm


@dataclasses.dataclass(frozen=True)
class StageConstraint:
    C: Any                 # (Ng, r, nx) traced
    D: Any                 # (Ng, r, nu) traced
    offset_const: Any      # (Ng, r) traced
    lb: np.ndarray         # (r,) static
    ub: np.ndarray         # (r,) static
    slack_idx: np.ndarray  # (r,) static; -1 = hard row
    state_rows: np.ndarray  # (Ng,) static; -1 = fixed x0
    ctrl_cols: np.ndarray   # (Ng,) static; -1 = no control column


def linearize_group(g_fn: Callable, x_lin, u_lin, lb, ub, slack_idx,
                    state_rows=None, ctrl_cols=None):
    """Build a StageConstraint from a vector stage function via jacfwd.

    ``x_lin/u_lin``: (Ng, nx)/(Ng, nu) linearisation points matching
    ``state_rows``/``ctrl_cols`` (defaults: identity mapping 0..Ng-1).
    """
    def one(x, u):
        g0 = jnp.atleast_1d(g_fn(x, u))
        C = jnp.atleast_2d(jax.jacfwd(g_fn, argnums=0)(x, u))
        D = jnp.atleast_2d(jax.jacfwd(g_fn, argnums=1)(x, u))
        return g0, C, D

    g0, C, D = jax.vmap(one)(x_lin, u_lin)
    offset_const = (g0 - jnp.einsum("nri,ni->nr", C, x_lin)
                    - jnp.einsum("nri,ni->nr", D, u_lin))
    Ng = x_lin.shape[0]
    if state_rows is None:
        state_rows = np.arange(Ng)
    if ctrl_cols is None:
        ctrl_cols = np.arange(Ng)
    return StageConstraint(
        C=C, D=D, offset_const=offset_const,
        lb=np.atleast_1d(np.asarray(lb, np.float64)),
        ub=np.atleast_1d(np.asarray(ub, np.float64)),
        slack_idx=np.atleast_1d(np.asarray(slack_idx, np.int32)),
        state_rows=np.asarray(state_rows, np.int32),
        ctrl_cols=np.asarray(ctrl_cols, np.int32))


def state_box_group(idx, lb, ub, slack_idx, x_lin, u_lin, state_rows=None):
    """Box constraints on selected state components (hard or soft).

    Mirrors the selected-row machinery of
    ``kinematic_state_constraints.m:14-29`` / ``dynamic_state_constraints.m``.
    """
    sel = np.asarray(idx, np.int64)

    def g(x, u):
        return x[jnp.asarray(sel)]

    return linearize_group(g, x_lin, u_lin, lb, ub, slack_idx,
                           state_rows=state_rows)


def kinematic_tyre_group(x_lin, u_lin, mpc: MPCParams, params: VehicleParams,
                         slack: int, state_rows=None):
    """Kinematic lateral-acceleration proxy  |v^2 delta / (lr+lf)| <= ay_max.

    (``kinematic_tyre_linearise_constraints.m:18-32``; also the MS-NMPC
    friction rows ``rk2_nmpc_kinematic_curvilinear.m:110-113``.)
    """
    def g(x, u):
        return x[3] ** 2 * x[4] / (params.lr + params.lf)

    return linearize_group(g, x_lin, u_lin, [-mpc.ay_max], [mpc.ay_max],
                           [slack], state_rows=state_rows)


def dynamic_slip_group(x_lin, u_lin, mpc: MPCParams, params: VehicleParams,
                       slack_rear: int, slack_front: int):
    """Slip-angle linear-region constraints |alpha_r|, |alpha_f| <= slip_max.

    (``dynamic_slip_linearise_constraints.m:20-44``; row order rear, front
    matching the reference's C matrix.)
    """
    def g(x, u):
        q = cm.rear_slip_quantities(x, params)
        return jnp.stack([q["alpha_r"], q["alpha_f"]])

    return linearize_group(
        g, x_lin, u_lin,
        [-mpc.slip_max, -mpc.slip_max], [mpc.slip_max, mpc.slip_max],
        [slack_rear, slack_front])


def friction_polygon_group(x_lin, u_lin, mpc: MPCParams, params: VehicleParams,
                           slack: int):
    """Friction ellipse outer-approximated by tangent lines at
    ``n_tyre_polygon`` points -- the LTV-safe convexification of
    (Fcr/(m ac_max))^2 + (Fx/al_max)^2 <= 1
    (``dynamic_tyre_linearise_constraints.m:18-61``).

    Row j:  (u1 - al_j) dac_j - (Fcr/m - ac_j) dal_j <= 0.
    """
    K = mpc.n_tyre_polygon
    theta = jnp.linspace(0.0, 2.0 * jnp.pi, K + 1, dtype=x_lin.dtype)
    ac = params.ac_max * jnp.sin(theta)
    al = params.al_max * jnp.cos(theta)
    dac = ac[1:] - ac[:-1]
    dal = al[1:] - al[:-1]

    def g(x, u):
        fcr_norm = cm.rear_lateral_force(x, params) / params.m
        return (u[0] - al[:-1]) * dac - (fcr_norm - ac[:-1]) * dal

    return linearize_group(g, x_lin, u_lin,
                           np.full((K,), -np.inf), np.zeros((K,)),
                           np.full((K,), slack, np.int32))


def friction_ellipse_group(x_lin, u_lin, mpc: MPCParams,
                           params: VehicleParams, slack: int,
                           state_rows=None, ctrl_cols=None):
    """Exact (nonconvex) friction-ellipse row for the SQP transcriptions:
    (Fcr/(m ac_max))^2 + (u1/al_max)^2 <= 1 + sigma
    (``rk2_nmpc_dynamic_curvilinear.m:109-112``)."""
    def g(x, u):
        fcr = cm.rear_lateral_force(x, params)
        return ((fcr / (params.m * params.ac_max)) ** 2
                + (u[0] / params.al_max) ** 2)

    return linearize_group(g, x_lin, u_lin, [-np.inf], [1.0], [slack],
                           state_rows=state_rows, ctrl_cols=ctrl_cols)


def friction_ellipse_value(fcr, fx_per_m, params: VehicleParams):
    """Exact friction-ellipse utilisation  (Fcr/(m ac_max))^2 + (a/al_max)^2
    (``main.m:199``)."""
    return ((fcr / (params.m * params.ac_max)) ** 2
            + (fx_per_m / params.al_max) ** 2)
