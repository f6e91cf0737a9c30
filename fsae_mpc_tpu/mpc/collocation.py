"""Direct-collocation NMPC (trapezoidal + Hermite-Simpson) via SQP.

The reference's C-NMPC solvers
(``collocation/trapezoidal_nmpc_{kinematic,dynamic}_curvilinear.m``,
``collocation/hs_nmpc_kinematic_curvilinear.m``) keep all knot states as
IPOPT decision variables.  Here the linearised implicit defects are solved
for the states stage-by-stage and condensed out, so each SQP subproblem is
a dense QP over controls + slacks only:

trapezoidal defect  x_i - x_{i+1} + dt/2 (f_i + f_{i+1}) = 0  linearises to

    (I - dt/2 A_{i+1}) dx_{i+1} = (I + dt/2 A_i) dx_i
        + dt/2 (B_i du_i + B_{i+1} du_{i+1}) + r_i

an affine recurrence with a two-control coupling handled by
``ops.condense.condense_general``; Hermite-Simpson eliminates the midpoint
analytically and couples three controls per interval.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..config import MPCParams, VehicleParams
from ..models import curvilinear as cm
from ..ops.condense import condense_general
from ..ops import ipm
from ..ops.linalg import solve_unrolled
from . import constraints as cons
from .ltv import assemble_condensed_qp
from .sqp import SqpResult


def _linearize_continuous(f, x_pts, u_pts):
    """Continuous jacobians A=df/dx, B=df/du at each collocation point."""
    def one(x, u):
        return (f(x, u), jax.jacfwd(f, argnums=0)(x, u),
                jax.jacfwd(f, argnums=1)(x, u))
    return jax.vmap(one)(x_pts, u_pts)


def _trapezoidal_stages(f, x_pts, u_pts, dt):
    """Linearised trapezoidal recurrence in absolute coordinates.

    ``x_pts``: (N+1, nx) current iterate including the fixed initial point.
    Returns (Ad, Ba, Bb, dd) with x_{i+1} = Ad_i x_i + Ba_i u_i
    + Bb_i u_{i+1} + dd_i  (i = 0..N-1).
    """
    fv, Av, Bv = _linearize_continuous(f, x_pts, u_pts)
    nx = x_pts.shape[1]
    I = jnp.eye(nx, dtype=x_pts.dtype)

    A_i, A_n = Av[:-1], Av[1:]
    B_i, B_n = Bv[:-1], Bv[1:]
    M = I - 0.5 * dt * A_n                      # (N, nx, nx)
    rhs_A = I + 0.5 * dt * A_i
    # defect residual at the linearisation point
    r = x_pts[:-1] - x_pts[1:] + 0.5 * dt * (fv[:-1] + fv[1:])

    Ad = solve_unrolled(M, rhs_A)
    Ba = solve_unrolled(M, 0.5 * dt * B_i)
    Bb = solve_unrolled(M, 0.5 * dt * B_n)
    dr = solve_unrolled(M, r[..., None])[..., 0]
    # absolute-coordinate offset: x_{i+1} = x_lin_{i+1} + dx_{i+1}
    dd = (dr + x_pts[1:]
          - jnp.einsum("nij,nj->ni", Ad, x_pts[:-1])
          - jnp.einsum("nij,nj->ni", Ba, u_pts[:-1])
          - jnp.einsum("nij,nj->ni", Bb, u_pts[1:]))
    return Ad, Ba, Bb, dd


def _collocation_weights(mpc: MPCParams, nx, N, dtype):
    """Trapezoid-rule cost weights over points 0..N
    (``trapezoidal_nmpc_kinematic_curvilinear.m:37-43``); point 0 is fixed
    so only points 1..N enter the QP."""
    q = jnp.zeros((nx,), dtype).at[0].set(mpc.q_s).at[1].set(mpc.q_n) \
        .at[2].set(mpc.q_mu)
    Qt = mpc.q_terminal_scale
    q_factor = np.concatenate([np.ones(N - 2), [(1.0 + Qt) / 2.0, Qt / 2.0]])
    q_diag = jnp.concatenate([q * w for w in q_factor])
    r = jnp.asarray([mpc.r_a, mpc.r_delta_d], dtype)
    r_factor = np.concatenate([[0.5], np.ones(N - 1), [0.5]])
    r_diag = jnp.concatenate([r * w for w in r_factor])
    return q_diag, r_diag


def trapezoidal_nmpc_kinematic(x0, x_ref, track, params: VehicleParams,
                               mpc: MPCParams, x_init, u_init,
                               opts: ipm.IpmOptions = ipm.IpmOptions(),
                               sqp_iters: int = 3) -> SqpResult:
    """Trapezoidal C-NMPC, kinematic model
    (``trapezoidal_nmpc_kinematic_curvilinear.m``).

    ``x_init``: (N+1, 5) iterate over collocation points (point 0 will be
    pinned to x0); ``u_init``: (N+1, 2).  ``x_ref``: (N, 5) for points 1..N.
    """
    N = mpc.n_steps
    dtype = x_init.dtype
    f = lambda x, u: cm.f_curv_kin(x, u, track, params)
    q_diag, r_diag = _collocation_weights(mpc, 5, N, dtype)
    u_lb = jnp.tile(jnp.asarray([-mpc.a_max, -mpc.delta_d_max], dtype),
                    (N + 1, 1))
    u_ub = -u_lb

    def sqp_iter(carry, _):
        x_pts, u_pts = carry
        x_pts = x_pts.at[0].set(x0)
        Ad, Ba, Bb, dd = _trapezoidal_stages(f, x_pts, u_pts, mpc.dt)
        A_bar, B_bar, d_bar = condense_general(
            Ad, dd, [(Ba, 0), (Bb, 1)], n_controls=N + 1)
        x_in = x_pts[1:]
        u_in = u_pts[1:]
        groups = [
            cons.state_box_group([3, 4], np.array([0.0, -mpc.delta_max]),
                                 np.array([np.inf, mpc.delta_max]),
                                 np.array([-1, -1]), x_in, u_in),
            cons.state_box_group([1], np.array([-mpc.n_max]),
                                 np.array([mpc.n_max]), np.array([0]),
                                 x_in, u_in),
            cons.kinematic_tyre_group(x_in, u_in, mpc, params, slack=0),
        ]
        H, g, A, lb, ub, lbA, ubA, const = assemble_condensed_qp(
            A_bar, B_bar, d_bar, x0, x_ref, q_diag, r_diag, [mpc.w_track],
            groups, u_lb, u_ub)
        res = ipm.solve_qp(H, g, A, lb, ub, lbA, ubA, opts)
        u_new = res.x[:(N + 1) * 2].reshape(N + 1, 2)

        def roll(x, inp):
            Ad_i, Ba_i, Bb_i, dd_i, u_i, u_n = inp
            x_next = Ad_i @ x + Ba_i @ u_i + Bb_i @ u_n + dd_i
            return x_next, x_next

        _, x_new_tail = lax.scan(
            roll, x0, (Ad, Ba, Bb, dd, u_new[:-1], u_new[1:]))
        x_new = jnp.concatenate([x0[None], x_new_tail], axis=0)
        return (x_new, u_new), (res.x[(N + 1) * 2:], res.objective + const, res)

    (x_opt, u_opt), (slacks, fvals, results) = lax.scan(
        sqp_iter, (x_init, u_init), None, length=sqp_iters)
    last = jax.tree_util.tree_map(lambda a: a[-1], (slacks, fvals, results))
    return SqpResult(x_opt=x_opt, u_opt=u_opt, slack=last[0],
                     fval=last[1], qp=last[2])


def trapezoidal_nmpc_dynamic(x0, x_ref, track, params: VehicleParams,
                             mpc: MPCParams, x_init, u_init,
                             opts: ipm.IpmOptions = ipm.IpmOptions(),
                             sqp_iters: int = 3,
                             trust_u=(4.0, 0.3)) -> SqpResult:
    """Trapezoidal C-NMPC, dynamic model
    (``trapezoidal_nmpc_dynamic_curvilinear.m``): exact friction-ellipse
    rows at every collocation point (incl. point 0 through its control),
    track softening at points 1..N.  Slack order [track(1e8), tyre(1e5)].
    """
    N = mpc.n_steps
    dtype = x_init.dtype
    f = lambda x, u: cm.f_curv_dyn_only(x, u, track, params)
    q_diag, r_diag = _collocation_weights(mpc, 7, N, dtype)
    inf = np.inf
    u_lb = jnp.tile(jnp.asarray([-inf, -mpc.delta_d_max], dtype), (N + 1, 1))
    u_ub = jnp.tile(jnp.asarray([inf, mpc.delta_d_max], dtype), (N + 1, 1))

    fr_rows = np.concatenate([[-1], np.arange(N)])   # points 0..N
    fr_cols = np.arange(N + 1)

    def sqp_iter(carry, _):
        x_pts, u_pts = carry
        x_pts = x_pts.at[0].set(x0)
        Ad, Ba, Bb, dd = _trapezoidal_stages(f, x_pts, u_pts, mpc.dt)
        A_bar, B_bar, d_bar = condense_general(
            Ad, dd, [(Ba, 0), (Bb, 1)], n_controls=N + 1)
        x_in = x_pts[1:]
        u_in = u_pts[1:]
        groups = [
            cons.state_box_group([3, 6], np.array([0.0, -mpc.delta_max]),
                                 np.array([np.inf, mpc.delta_max]),
                                 np.array([-1, -1]), x_in, u_in),
            cons.state_box_group([1], np.array([-mpc.n_max]),
                                 np.array([mpc.n_max]), np.array([0]),
                                 x_in, u_in),
            cons.friction_ellipse_group(x_pts, u_pts, mpc, params, slack=1,
                                        state_rows=fr_rows,
                                        ctrl_cols=fr_cols),
        ]
        tr = jnp.asarray(trust_u, dtype)
        lb_eff = jnp.maximum(u_lb, u_pts - tr)
        ub_eff = jnp.minimum(u_ub, u_pts + tr)
        H, g, A, lb, ub, lbA, ubA, const = assemble_condensed_qp(
            A_bar, B_bar, d_bar, x0, x_ref, q_diag, r_diag,
            [mpc.w_track, mpc.w_slip], groups, lb_eff, ub_eff)
        res = ipm.solve_qp(H, g, A, lb, ub, lbA, ubA, opts)
        u_new = res.x[:(N + 1) * 2].reshape(N + 1, 2)

        def roll(x, inp):
            Ad_i, Ba_i, Bb_i, dd_i, u_i, u_n = inp
            x_next = Ad_i @ x + Ba_i @ u_i + Bb_i @ u_n + dd_i
            return x_next, x_next

        _, x_new_tail = lax.scan(
            roll, x0, (Ad, Ba, Bb, dd, u_new[:-1], u_new[1:]))
        x_new = jnp.concatenate([x0[None], x_new_tail], axis=0)
        return (x_new, u_new), (res.x[(N + 1) * 2:], res.objective + const, res)

    (x_opt, u_opt), (slacks, fvals, results) = lax.scan(
        sqp_iter, (x_init, u_init), None, length=sqp_iters)
    last = jax.tree_util.tree_map(lambda a: a[-1], (slacks, fvals, results))
    return SqpResult(x_opt=x_opt, u_opt=u_opt, slack=last[0],
                     fval=last[1], qp=last[2])
