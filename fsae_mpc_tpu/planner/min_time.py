"""Offline minimum-time raceline planners (s-domain, periodic).

Re-designs ``mpc/nonlinear/minimum_time_planner.m`` (kinematic, N=1000
Euler nodes) and ``mpc/nonlinear/dynamic_minimum_time_planner.m`` (dynamic,
N=500 trapezoidal nodes) as SQP loops with **periodic condensing**: the
linearised wrap-around defect chain is closed through

    y_1 = (I - Phi_N)^{-1} (B_N u + d_N)

so every node state becomes affine in the controls and each SQP subproblem
is a dense QP over the 2N controls (+ slacks), solved by the batched IPM.
The lap-time objective  sum_i ds / s_dot(y_i, s_i)  is expanded to second
order per node (autodiff gradient + Hessian, Gershgorin-shifted to PSD),
replacing IPOPT's L-BFGS model with an exact local model.  A 4-point
backtracking line search on the exact merit (cost + rho |defect|_1)
globalises the cold-started iteration; everything jits.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..config import VehicleParams
from ..models import curvilinear as cm
from ..ops import ipm
from ..ops.linalg import solve_unrolled


@dataclasses.dataclass(frozen=True)
class PlannerResult:
    y_opt: Any       # (N, ny) node states
    u_opt: Any       # (N, nu) node controls
    t_node: Any      # (N,) per-node traversal times ds / s_dot
    lap_time: Any    # sum of t_node
    slack: Any       # (n_soft,) (dynamic planner)
    merit: Any       # final merit value
    defect_norm: Any  # final max |nonlinear defect|


jax.tree_util.register_dataclass(
    PlannerResult,
    data_fields=["y_opt", "u_opt", "t_node", "lap_time", "slack", "merit",
                 "defect_norm"],
    meta_fields=[])


def _condense_periodic(Ad, Bd, dd):
    """Closed-chain condensing: per-node affine maps y_i = M_i u + c_i
    (node 1 = the wrap state) from y_{i+1} = Ad_i y_i + Bd_i u_i + dd_i
    with the periodic closure y_{N+1} = y_1
    (reference wrap: ``minimum_time_planner.m:134,148``)."""
    N, ny, nu = Bd.shape
    dtype = Ad.dtype

    def step(carry, inp):
        phi, G, delta = carry
        i, A_i, B_i, d_i = inp
        phi = A_i @ phi
        G = A_i @ G
        G = lax.dynamic_update_slice(G, B_i, (jnp.int32(0), i * nu))
        delta = A_i @ delta + d_i
        return (phi, G, delta), (phi, G, delta)

    init = (jnp.eye(ny, dtype=dtype), jnp.zeros((ny, N * nu), dtype),
            jnp.zeros((ny,), dtype))
    idx = jnp.arange(N, dtype=jnp.int32)
    _, (Phi, G, delta) = lax.scan(step, init, (idx, Ad, Bd, dd))

    I = jnp.eye(ny, dtype=dtype)
    S = solve_unrolled(I - Phi[-1], G[-1])            # (ny, N*nu)
    t0 = solve_unrolled(I - Phi[-1], delta[-1][:, None])[:, 0]

    M_rest = jnp.einsum("nij,jk->nik", Phi[:-1], S) + G[:-1]
    c_rest = jnp.einsum("nij,j->ni", Phi[:-1], t0) + delta[:-1]
    M = jnp.concatenate([S[None], M_rest], axis=0)    # node i -> row i-1
    c = jnp.concatenate([t0[None], c_rest], axis=0)
    return M, c


def _psd_shift(Hs):
    """Gershgorin shift to make per-node Hessians PSD (no eigh custom call)."""
    diag = jnp.diagonal(Hs, axis1=-2, axis2=-1)
    radius = jnp.sum(jnp.abs(Hs), axis=-1) - jnp.abs(diag)
    lam_min = jnp.min(diag - radius, axis=-1)
    shift = jnp.maximum(0.0, -lam_min) + 1e-8
    return Hs + shift[..., None, None] * jnp.eye(Hs.shape[-1], dtype=Hs.dtype)


def _plan_sqp(defect_fn, time_of, s_nodes, y0, u0, q_reg, r_reg, row_groups,
              u_lb, u_ub, n_soft, soft_w, opts, iters, rho=1e3):
    """Shared periodic-planner SQP loop.

    defect_fn(i, y_i, u_i) -> y_{i+1}: the (Euler/trapezoidal-resolved)
       step map in s; the wrap is closed by periodic condensing.
    time_of(y, s) -> node traversal time.
    row_groups: list of (sel_fn(y, u) -> values, lb, ub, slack_idx).
    """
    N, ny = y0.shape
    nu = u0.shape[1]
    dtype = y0.dtype

    t_grad = jax.vmap(jax.grad(time_of, argnums=0), in_axes=(0, 0))
    t_hess = jax.vmap(jax.hessian(time_of, argnums=0), in_axes=(0, 0))
    t_val = jax.vmap(time_of, in_axes=(0, 0))

    def defect_jacobians(y, u):
        def one(i, y_i, u_i):
            g = lambda yy, uu: defect_fn(i, yy, uu)
            Ad = jax.jacfwd(g, argnums=0)(y_i, u_i)
            Bd = jax.jacfwd(g, argnums=1)(y_i, u_i)
            dd = g(y_i, u_i) - Ad @ y_i - Bd @ u_i
            return Ad, Bd, dd
        return jax.vmap(one)(jnp.arange(N), y, u)

    def merit(y, u, slack_cost):
        cost = (jnp.sum(q_reg * y * y) + jnp.sum(r_reg * u * u)
                + jnp.sum(t_val(y, s_nodes)) + slack_cost)
        y_next = jnp.roll(y, -1, axis=0)
        F = jax.vmap(lambda i, yi, ui: defect_fn(i, yi, ui))(
            jnp.arange(N), y, u)
        viol = jnp.sum(jnp.abs(F - y_next))
        return cost + rho * viol, jnp.max(jnp.abs(F - y_next))

    def sqp_iter(carry, _):
        y, u = carry
        Ad, Bd, dd = defect_jacobians(y, u)
        M, c = _condense_periodic(Ad, Bd, dd)        # y_i = M_i u + c_i

        # quadratic objective model over u
        gt = t_grad(y, s_nodes)
        Ht = _psd_shift(t_hess(y, s_nodes))
        Wq = 2.0 * jax.vmap(jnp.diag)(q_reg) + Ht
        gy = 2.0 * q_reg * y + gt
        H_u = jnp.einsum("nri,nrs,nsj->ij", M, Wq, M)
        H_u = H_u + jnp.diag(2.0 * r_reg.reshape(-1))
        g_u = jnp.einsum("nri,nr->i", M,
                         gy + jnp.einsum("nrs,ns->nr", Wq, c - y))

        nv = N * nu + n_soft
        H = jnp.zeros((nv, nv), dtype).at[:N * nu, :N * nu].set(H_u)
        gvec = jnp.zeros((nv,), dtype).at[:N * nu].set(g_u)
        if n_soft:
            gvec = gvec.at[N * nu:].set(jnp.asarray(soft_w, dtype))

        lb_v = jnp.concatenate([
            jnp.broadcast_to(u_lb, (N, nu)).reshape(-1),
            jnp.zeros((n_soft,), dtype)])
        ub_v = jnp.concatenate([
            jnp.broadcast_to(u_ub, (N, nu)).reshape(-1),
            jnp.full((n_soft,), jnp.inf, dtype)])

        A_rows, lbs, ubs = [], [], []
        for sel_fn, lo, hi, sidx in row_groups:
            def one(y_i, u_i):
                v = jnp.atleast_1d(sel_fn(y_i, u_i))
                Jy = jnp.atleast_2d(jax.jacfwd(sel_fn, argnums=0)(y_i, u_i))
                Ju = jnp.atleast_2d(jax.jacfwd(sel_fn, argnums=1)(y_i, u_i))
                return v, Jy, Ju
            v0, Jy, Ju = jax.vmap(one)(y, u)
            rows = jnp.einsum("nri,nij->nrj", Jy, M)
            r = v0.shape[1]
            # scatter the direct control jacobian into each node's columns
            Ju_full = jnp.zeros(rows.shape, dtype)
            Ju_full = jax.vmap(
                lambda Df, Dm, i: jax.lax.dynamic_update_slice(
                    Df, Dm, (jnp.int32(0), i * nu))
            )(Ju_full, Ju, jnp.arange(N, dtype=jnp.int32))
            rows = rows + Ju_full
            off = (v0 + jnp.einsum("nri,ni->nr", Jy, c - y)
                   - jnp.einsum("nri,ni->nr", Ju, u))
            rows = rows.reshape(N * r, N * nu)
            off = off.reshape(N * r)
            lo_b = np.broadcast_to(np.asarray(lo, np.float64), (N, r)).reshape(-1)
            hi_b = np.broadcast_to(np.asarray(hi, np.float64), (N, r)).reshape(-1)
            si = np.broadcast_to(np.asarray(sidx), (N, r)).reshape(-1)
            scol0 = jnp.zeros((N * r, n_soft), dtype)
            if np.all(si < 0):
                A_rows.append(jnp.concatenate([rows, scol0], axis=1))
                lbs.append(jnp.asarray(lo_b, dtype) - off)
                ubs.append(jnp.asarray(hi_b, dtype) - off)
            else:
                inf_vec = jnp.full((N * r,), jnp.inf, dtype)
                if np.all(np.isfinite(lo_b)):
                    sc = scol0.at[np.arange(N * r), si].set(1.0)
                    A_rows.append(jnp.concatenate([rows, sc], axis=1))
                    lbs.append(jnp.asarray(lo_b, dtype) - off)
                    ubs.append(inf_vec)
                if np.all(np.isfinite(hi_b)):
                    sc = scol0.at[np.arange(N * r), si].set(-1.0)
                    A_rows.append(jnp.concatenate([rows, sc], axis=1))
                    lbs.append(-inf_vec)
                    ubs.append(jnp.asarray(hi_b, dtype) - off)
        A = jnp.concatenate(A_rows, axis=0)
        lbA = jnp.concatenate(lbs)
        ubA = jnp.concatenate(ubs)

        res = ipm.solve_qp(H, gvec, A, lb_v, ub_v, lbA, ubA, opts,
                           x0=jnp.concatenate(
                               [u.reshape(-1), jnp.zeros((n_soft,), dtype)]))
        u_full = res.x[:N * nu].reshape(N, nu)
        slack = res.x[N * nu:]
        slack_cost = (jnp.sum(jnp.asarray(soft_w, dtype) * slack)
                      if n_soft else jnp.zeros((), dtype))

        du = u_full - u

        def try_alpha(alpha):
            u_a = u + alpha * du
            y_a = jnp.einsum("nij,j->ni", M, u_a.reshape(-1)) + c
            m, dmax = merit(y_a, u_a, slack_cost)
            return m, (y_a, u_a, dmax)

        alphas = jnp.asarray([1.0, 0.5, 0.25, 0.1], dtype)
        ms, (ys, us, dmaxs) = jax.vmap(try_alpha)(alphas)
        k = jnp.argmin(ms)
        return (ys[k], us[k]), (slack, ms[k], dmaxs[k])

    (y, u), (slacks, merits, dnorms) = lax.scan(
        sqp_iter, (y0, u0), None, length=iters)
    t_node = t_val(y, s_nodes)
    slack_last = slacks[-1] if n_soft else jnp.zeros((0,), dtype)
    return y, u, t_node, slack_last, merits[-1], dnorms[-1]


def minimum_time_planner_kinematic(track,
                                   params: VehicleParams = VehicleParams(),
                                   n_nodes: int = 1000,
                                   opts: ipm.IpmOptions = ipm.IpmOptions(),
                                   iters: int = 30) -> PlannerResult:
    """Kinematic min-time raceline (``minimum_time_planner.m``).

    Node state [n, mu, v, delta], controls [a, delta_d]; Euler defects in s
    with periodic wrap; cost 0.01 n^2 + 0.01 mu^2 + 1e-6 a^2 + 0.01 dd^2
    + ds/s_dot per node; bounds n in +-1, v in [0, 50], delta in +-0.4,
    a in +-10 (``minimum_time_planner.m:22-36``).
    """
    dtype = track.px.dtype
    N = n_nodes
    ds = track.L / N
    s_nodes = ds * jnp.arange(N, dtype=dtype)

    def s_dot(y, s):
        n, mu, v, delta = y
        beta = jnp.arctan(params.lr_ratio * jnp.tan(delta))
        k = track.curvature(s)
        return v * jnp.cos(mu + beta) / (1.0 - n * k)

    def time_of(y, s):
        return ds / s_dot(y, s)

    def step_map(i, y, u):
        s = s_nodes[i]
        n, mu, v, delta = y
        beta = jnp.arctan(params.lr_ratio * jnp.tan(delta))
        k = track.curvature(s)
        sd = v * jnp.cos(mu + beta) / (1.0 - n * k)
        y_d = jnp.stack([v * jnp.sin(mu + beta),
                         v * jnp.sin(beta) / params.lr - sd * k,
                         u[0], u[1]]) / sd
        return y + ds * y_d

    y0 = jnp.zeros((N, 4), dtype).at[:, 2].set(20.0)   # v init (:58)
    u0 = jnp.zeros((N, 2), dtype)
    q_reg = jnp.tile(jnp.asarray([0.01, 0.01, 0.0, 0.0], dtype), (N, 1))
    r_reg = jnp.tile(jnp.asarray([1e-6, 0.01], dtype), (N, 1))
    row_groups = [
        (lambda y, u: y[jnp.asarray([0, 2, 3])],
         np.array([-1.0, 0.0, -0.4]), np.array([1.0, 50.0, 0.4]),
         np.array([-1, -1, -1])),
    ]
    u_lb = jnp.asarray([-10.0, -0.4], dtype)
    u_ub = jnp.asarray([10.0, 0.4], dtype)

    y, u, t_node, slack, merit, dnorm = _plan_sqp(
        step_map, time_of, s_nodes, y0, u0, q_reg, r_reg, row_groups,
        u_lb, u_ub, 0, [], opts, iters)
    return PlannerResult(y_opt=y, u_opt=u, t_node=t_node,
                         lap_time=jnp.sum(t_node), slack=slack,
                         merit=merit, defect_norm=dnorm)


def minimum_time_planner_dynamic(track,
                                 params: VehicleParams = VehicleParams(),
                                 n_nodes: int = 500,
                                 opts: ipm.IpmOptions = ipm.IpmOptions(),
                                 iters: int = 40) -> PlannerResult:
    """Dynamic min-time raceline (``dynamic_minimum_time_planner.m``).

    Node state [n, mu, x_d, y_d, theta_d, delta] (s removed), controls
    [a, delta_d]; trapezoidal s-domain defects with periodic wrap
    (``:137-149``); friction-ellipse utilisation <= 0.75 with slack
    (w=1e5) and track softening |n| <= 0.5 with slack (w=1e8)
    (``:44-45,158-168``).  Slack order [track, tyre].
    """
    dtype = track.px.dtype
    N = n_nodes
    ds = track.L / N
    s_nodes = ds * jnp.arange(N, dtype=dtype)

    def full_state(y, s):
        return jnp.concatenate([jnp.stack([s]), y])

    def y_prime(y, u, s):
        """dy/ds = f_curv_dyn([s; y], u) / s_dot."""
        x_full = full_state(y, s)
        f, _ = cm.f_curv_dyn(x_full, u, track, params)
        return f[1:] / f[0], f[0]

    def time_of(y, s):
        x_full = full_state(y, s)
        f, _ = cm.f_curv_dyn(x_full, u_dummy, track, params)
        return ds / f[0]

    # s_dot of the dynamic model does not depend on u; use a zero control
    u_dummy = jnp.zeros((2,), dtype)

    def step_map(i, y, u):
        """Heun (trapezoidal-predictor) step in s, the explicit resolution
        of the reference's trapezoidal defect."""
        s = s_nodes[i]
        s_next = s + ds
        k1, _ = y_prime(y, u, s)
        y_pred = y + ds * k1
        k2, _ = y_prime(y_pred, u, s_next)
        return y + 0.5 * ds * (k1 + k2)

    y0 = jnp.zeros((N, 6), dtype).at[:, 2].set(10.0)   # x_d init (:66-67)
    u0 = jnp.zeros((N, 2), dtype)
    q_reg = jnp.tile(jnp.asarray([0.01, 0.01, 0.0, 0.0, 0.0, 0.0], dtype),
                     (N, 1))
    r_reg = jnp.tile(jnp.asarray([1e-6, 0.01], dtype), (N, 1))

    def friction(y, uu):
        x_full = jnp.concatenate([jnp.zeros((1,), dtype), y])
        fcr = cm.rear_lateral_force(x_full, params)
        return ((fcr / (params.m * params.ac_max)) ** 2
                + (uu[0] / params.al_max) ** 2)

    row_groups = [
        # hard: x_d >= 0, delta in +-0.4
        (lambda y, u: y[jnp.asarray([2, 5])],
         np.array([0.0, -0.4]), np.array([np.inf, 0.4]),
         np.array([-1, -1])),
        # soft track: |n| <= 0.5 + sigma_track
        (lambda y, u: y[jnp.asarray([0])],
         np.array([-0.5]), np.array([0.5]), np.array([0])),
        # soft tyre: friction-ellipse utilisation <= 0.75 + sigma_tyre
        # (``dynamic_minimum_time_planner.m:158-168``)
        (friction, np.array([-np.inf]), np.array([0.75]), np.array([1])),
    ]
    u_lb = jnp.asarray([-10.0, -0.4], dtype)
    u_ub = jnp.asarray([10.0, 0.4], dtype)

    y, u, t_node, slack, merit, dnorm = _plan_sqp(
        step_map, time_of, s_nodes, y0, u0, q_reg, r_reg, row_groups,
        u_lb, u_ub, 2, [1e8, 1e5], opts, iters)
    return PlannerResult(y_opt=y, u_opt=u, t_node=t_node,
                         lap_time=jnp.sum(t_node), slack=slack,
                         merit=merit, defect_norm=dnorm)
