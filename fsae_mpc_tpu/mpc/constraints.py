"""Stage constraint builders for the curvilinear MPC controllers.

Each physical constraint is written once as a scalar stage function
``g(x, u)``; its linearisation rows come from ``jax.jacfwd`` vmapped over
the horizon.  This replaces the reference's hand-derived constraint
linearisers (``kinematic_tyre_linearise_constraints.m``,
``dynamic_slip_linearise_constraints.m``,
``dynamic_tyre_linearise_constraints.m`` -- 231 LoC of manual chain rule).

A constraint group is reduced to the canonical affine form used by the QP
assembler:

    lb_g <= g0_i + C_i (x_i - x_lin_i) + D_i (u_i - u_lin_i) + sign * sigma_k <= ub_g

with ``sigma_k`` an optional soft slack (one of the QP's extra variables).
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
    """Linearised stage constraint group over the horizon.

    g0: (N, r) values at the linearisation point
    C:  (N, r, nx) state jacobians;  D: (N, r, nu) control jacobians
    lb, ub: (r,) bounds (inf = one-sided)
    slack_idx: (r,) int32 index of the slack variable softening each row,
        or -1 for hard rows.
    """

    g0: Any
    C: Any
    D: Any
    lb: Any
    ub: Any
    slack_idx: Any


def _linearize_group(g_fn: Callable, x_lin, u_lin):
    """vmap jacfwd of a vector stage function over the horizon."""
    def one(x, u):
        g0 = g_fn(x, u)
        C = jax.jacfwd(g_fn, argnums=0)(x, u)
        D = jax.jacfwd(g_fn, argnums=1)(x, u)
        return g0, C, D
    return jax.vmap(one)(x_lin, u_lin)


def state_box_group(idx, lb, ub, slack_idx, x_lin, u_lin):
    """Box constraints on selected state components (hard or soft).

    Mirrors the selected-row machinery of
    ``kinematic_state_constraints.m:14-29`` / ``dynamic_state_constraints.m``.
    """
    idx = jnp.asarray(idx, jnp.int32)
    nx = x_lin.shape[1]
    nu = u_lin.shape[1]
    N = x_lin.shape[0]
    r = idx.shape[0]
    C = jnp.zeros((r, nx), x_lin.dtype).at[jnp.arange(r), idx].set(1.0)
    g0 = x_lin[:, idx]
    # lb/ub/slack_idx stay host-side numpy: they define the static row
    # structure and must remain concrete under jit tracing.
    return StageConstraint(
        g0=g0,
        C=jnp.broadcast_to(C, (N, r, nx)),
        D=jnp.zeros((N, r, nu), x_lin.dtype),
        lb=np.asarray(lb, np.float64),
        ub=np.asarray(ub, np.float64),
        slack_idx=np.asarray(slack_idx, np.int32),
    )


def kinematic_tyre_group(x_lin, u_lin, mpc: MPCParams, params: VehicleParams,
                         slack: int):
    """Kinematic lateral-acceleration proxy  |v^2 delta / (lr+lf)| <= ay_max.

    (``kinematic_tyre_linearise_constraints.m:18-32``; also the MS-NMPC
    friction rows ``rk2_nmpc_kinematic_curvilinear.m:110-113``.)
    """
    def g(x, u):
        return jnp.atleast_1d(x[3] ** 2 * x[4] / (params.lr + params.lf))

    g0, C, D = _linearize_group(g, x_lin, u_lin)
    return StageConstraint(
        g0=g0, C=C, D=D,
        lb=np.asarray([-mpc.ay_max], np.float64),
        ub=np.asarray([mpc.ay_max], np.float64),
        slack_idx=np.asarray([slack], np.int32),
    )


def dynamic_slip_group(x_lin, u_lin, mpc: MPCParams, params: VehicleParams,
                       slack_rear: int, slack_front: int):
    """Slip-angle linear-region constraints |alpha_r|, |alpha_f| <= slip_max.

    (``dynamic_slip_linearise_constraints.m:20-44``; row order rear, front
    matching the reference's C matrix.)
    """
    def g(x, u):
        q = cm.rear_slip_quantities(x, params)
        return jnp.stack([q["alpha_r"], q["alpha_f"]])

    g0, C, D = _linearize_group(g, x_lin, u_lin)
    return StageConstraint(
        g0=g0, C=C, D=D,
        lb=np.asarray([-mpc.slip_max, -mpc.slip_max], np.float64),
        ub=np.asarray([mpc.slip_max, mpc.slip_max], np.float64),
        slack_idx=np.asarray([slack_rear, slack_front], np.int32),
    )


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

    g0, C, D = _linearize_group(g, x_lin, u_lin)
    return StageConstraint(
        g0=g0, C=C, D=D,
        lb=np.full((K,), -np.inf),
        ub=np.zeros((K,), np.float64),
        slack_idx=np.full((K,), slack, np.int32),
    )


def friction_ellipse_value(fcr, fx_per_m, params: VehicleParams):
    """Exact friction-ellipse utilisation  (Fcr/(m ac_max))^2 + (a/al_max)^2
    (``main.m:199``; NMPC constraint ``rk2_nmpc_dynamic_curvilinear.m:109-112``)."""
    return ((fcr / (params.m * params.ac_max)) ** 2
            + (fx_per_m / params.al_max) ** 2)
