"""Offline minimum-time raceline planners (s-domain, periodic).

Re-designs ``mpc/nonlinear/minimum_time_planner.m`` (kinematic, N=1000
Euler nodes) and ``mpc/nonlinear/dynamic_minimum_time_planner.m`` (dynamic,
N=500 trapezoidal nodes) as SQP loops with **partial condensing**:

* The lap is split into K segments of M nodes.  Within a segment the
  linearised defect chain is condensed by a scan (vmapped over segments),
  so interior states become affine in (segment boundary state, segment
  controls).  Full-lap condensing is numerically impossible here -- the
  transition product over ~200 m of vehicle dynamics overflows -- while
  segment products stay O(1e2..1e4).  Trial points in the line search are
  evaluated by NONLINEAR within-segment rollout (multiple shooting), so
  interior defects are exactly zero at every iterate and only segment
  -boundary defects remain.  The dynamic planner uses M=1 (full multiple
  shooting): the Pacejka slip modes relax in ~0.5 m while nodes are ~3 m
  apart, so even a 2-step condensed rollout is forward-unstable enough to
  stall the line search.
* Segment boundary states remain decision variables; periodicity is K
  tight equality rows  end(segment k) = boundary k+1 (mod K)  handed to
  the same dense IPM as everything else.
* The lap-time objective  sum_i ds / s_dot(y_i, s_i)  is expanded to
  second order per node (autodiff gradient + Hessian, Gershgorin-shifted
  to PSD), replacing IPOPT's L-BFGS model with an exact local model.
* A 4-point backtracking line search on the exact merit
  (cost + rho |defect|_1) globalises the cold-started iteration.

**Deployment precision (design decision).** The planners run OFFLINE in
f64 on the host CPU, like the spline fitting (``track/spline.py``): the
reference runs them once before the lap, commented out of the control
loop (``main.m:20-22``), and their SQP subproblems use the adaptive f64
``IpmOptions`` (tol 5e-14) because the s-domain time-transformed defects
condition the KKT systems orders of magnitude worse than the control-loop
QPs (the 1/s_dot time change mixes ~1e-3..1e3 scales across a lap).  The
hot 20 Hz path consumes only the planner's OUTPUT -- the resampled
reference trajectory (``planner/reference.py``), a plain array that casts
to f32 losslessly for on-chip tracking (RICCATI_VALIDATION.json /
LAPS_TPU.json raceline rows).  Running the planner itself in f32 on chip
was considered and rejected: it is not latency-critical (once per track),
and f32 would force the same accuracy machinery (delta-form restarts,
compensated residuals) the control loop needed, for no deployment
benefit.
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


def _segment_condense(Ad, Bd, dd, K, M):
    """Per-segment condensing (vmapped scan).

    Inputs reshaped to (K, M, ...).  Returns, for each segment k and step
    j = 0..M-1, the affine map of the post-step state
    y_{kM+j+1} = A[k,j] xb_k + B[k,j] u_seg_k + d[k,j].
    """
    ny = Ad.shape[-1]
    nu = Bd.shape[-1]
    Ad = Ad.reshape(K, M, ny, ny)
    Bd = Bd.reshape(K, M, ny, nu)
    dd = dd.reshape(K, M, ny)

    def seg(Ad_s, Bd_s, dd_s):
        def step(carry, inp):
            phi, G, delta = carry
            j, A_j, B_j, d_j = inp
            phi = A_j @ phi
            G = A_j @ G
            G = lax.dynamic_update_slice(G, B_j, (jnp.int32(0), j * nu))
            delta = A_j @ delta + d_j
            return (phi, G, delta), (phi, G, delta)

        init = (jnp.eye(ny, dtype=Ad_s.dtype),
                jnp.zeros((ny, M * nu), Ad_s.dtype),
                jnp.zeros((ny,), Ad_s.dtype))
        idx = jnp.arange(M, dtype=jnp.int32)
        _, out = lax.scan(step, init, (idx, Ad_s, Bd_s, dd_s))
        return out

    return jax.vmap(seg)(Ad, Bd, dd)   # (K, M, ny, ny), (K,M,ny,M*nu), (K,M,ny)


def _node_maps(A_seg, B_seg, d_seg, K, M, ny, nu, nv, nu_total):
    """Dense affine maps y_i = P_i v + q_i for all N nodes over the decision
    vector v = [u (N*nu), xb (K*ny), slacks].  Node kM is the boundary
    variable itself; node kM+j (j>=1) uses segment row j-1."""
    dtype = A_seg.dtype
    N = K * M
    eye = jnp.eye(ny, dtype=dtype)

    def per_segment(k):
        # rows for nodes kM + j, j=0..M-1: node kM is the boundary variable
        # itself (identity selector), nodes kM+j use condensed rows j-1
        rows_x = jnp.concatenate([eye[None], A_seg[k, :M - 1]], axis=0)
        rows_u = jnp.concatenate(
            [jnp.zeros((1,) + B_seg.shape[2:], dtype), B_seg[k, :M - 1]],
            axis=0)
        qk = jnp.concatenate(
            [jnp.zeros((1, ny), dtype), d_seg[k, :M - 1]], axis=0)
        Pk = jnp.zeros((M, ny, nv), dtype)
        Pk = lax.dynamic_update_slice(
            Pk, rows_x,
            (jnp.int32(0), jnp.int32(0), jnp.int32(nu_total) + k * ny))
        Pk = lax.dynamic_update_slice(
            Pk, rows_u,
            (jnp.int32(0), jnp.int32(0), k * jnp.int32(B_seg.shape[-1])))
        return Pk, qk

    P, q = jax.vmap(per_segment)(jnp.arange(K, dtype=jnp.int32))
    return P.reshape(N, ny, nv), q.reshape(N, ny)


def _plan_sqp(defect_fn, time_of, s_nodes, y0, u0, q_reg, r_reg, row_groups,
              u_lb, u_ub, n_soft, soft_w, opts, iters, seg_len: int,
              rho=1e3, x_scale=None, tr0=1.0, tr_min=0.02, tr_max=4.0):
    """Shared periodic-planner SQP loop with partial condensing.

    defect_fn(i, y_i, u_i) -> y_{i+1}: step map in s (wrap via equality
    rows).  time_of(y, s) -> node traversal time.
    row_groups: list of (sel_fn(y, u) -> values, lb, ub, slack_idx).

    Globalisation (replaces IPOPT's internal filter/line search,
    ``dynamic_minimum_time_planner.m:39-67``): an exact l1 penalty merit
    cost + rho |defect|_1 + sum_s w_s (soft-row violation)_+, a monotone
    backtracking line search that can REJECT the step outright, and an
    adaptive trust region (box on controls and segment-boundary states,
    radius carried through the scan) that shrinks on rejection and grows
    on accepted full steps.  All branch-free: alphas are evaluated in a
    vmap and the trust-radius update is a pair of jnp.where -- the whole
    loop stays one lax.scan for XLA.
    """
    N, ny = y0.shape
    nu = u0.shape[1]
    dtype = y0.dtype
    M = seg_len
    assert N % M == 0, "segment length must divide node count"
    K = N // M
    nu_total = N * nu
    nv = nu_total + K * ny + n_soft
    if x_scale is None:
        x_scale = jnp.ones((ny,), dtype)
    x_scale = jnp.asarray(x_scale, dtype)
    u_scale = (jnp.asarray(u_ub, dtype) - jnp.asarray(u_lb, dtype)) / 2.0

    t_grad = jax.vmap(jax.grad(time_of, argnums=0), in_axes=(0, 0))
    t_hess = jax.vmap(jax.hessian(time_of, argnums=0), in_axes=(0, 0))
    t_val = jax.vmap(time_of, in_axes=(0, 0))

    # soft-row penalty weights resolved once (python, static shapes)
    soft_meta = []
    for sel_fn, lo, hi, sidx in row_groups:
        si = np.atleast_1d(np.asarray(sidx))
        if np.all(si < 0):
            continue
        w = np.asarray([soft_w[i] if i >= 0 else 0.0 for i in si],
                       np.float64)
        soft_meta.append((sel_fn, np.atleast_1d(np.asarray(lo, np.float64)),
                          np.atleast_1d(np.asarray(hi, np.float64)), w))

    def _psd_shift(Hs):
        diag = jnp.diagonal(Hs, axis1=-2, axis2=-1)
        radius = jnp.sum(jnp.abs(Hs), axis=-1) - jnp.abs(diag)
        lam_min = jnp.min(diag - radius, axis=-1)
        shift = jnp.maximum(0.0, -lam_min) + 1e-8
        return Hs + shift[..., None, None] * jnp.eye(ny, dtype=Hs.dtype)

    def defect_jacobians(y, u):
        def one(i, y_i, u_i):
            g = lambda yy, uu: defect_fn(i, yy, uu)
            Ad = jax.jacfwd(g, argnums=0)(y_i, u_i)
            Bd = jax.jacfwd(g, argnums=1)(y_i, u_i)
            dd = g(y_i, u_i) - Ad @ y_i - Bd @ u_i
            return Ad, Bd, dd
        return jax.vmap(one)(jnp.arange(N), y, u)

    def merit(y, u):
        cost = (jnp.sum(q_reg * y * y) + jnp.sum(r_reg * u * u)
                + jnp.sum(t_val(y, s_nodes)))
        # exact l1 penalty on soft rows: matches the QP's slack objective
        # at the solution, but is evaluable at any trial point
        for sel_fn, lo, hi, w in soft_meta:
            v = jax.vmap(lambda yi, ui: jnp.atleast_1d(sel_fn(yi, ui)))(y, u)
            lo_a = jnp.asarray(lo, dtype)
            hi_a = jnp.asarray(hi, dtype)
            w_a = jnp.asarray(w, dtype)
            cost = cost + jnp.sum(
                w_a * (jnp.maximum(lo_a - v, 0.0)
                       + jnp.maximum(v - hi_a, 0.0)))
        y_next = jnp.roll(y, -1, axis=0)
        F = jax.vmap(lambda i, yi, ui: defect_fn(i, yi, ui))(
            jnp.arange(N), y, u)
        viol = jnp.sum(jnp.abs(F - y_next))
        return cost + rho * viol, jnp.max(jnp.abs(F - y_next))

    def sqp_iter(carry, _):
        y, u, tr = carry
        Ad, Bd, dd = defect_jacobians(y, u)
        A_seg, B_seg, d_seg = _segment_condense(Ad, Bd, dd, K, M)
        P, q = _node_maps(A_seg, B_seg, d_seg, K, M, ny, nu, nv, nu_total)

        # ---- objective model --------------------------------------------
        gt = t_grad(y, s_nodes)
        Ht = _psd_shift(t_hess(y, s_nodes))
        Wq = 2.0 * jax.vmap(jnp.diag)(q_reg) + Ht
        gy = 2.0 * q_reg * y + gt
        H_v = jnp.einsum("nri,nrs,nsj->ij", P, Wq, P)
        H_v = H_v.at[:nu_total, :nu_total].add(jnp.diag(2.0 * r_reg.reshape(-1)))
        g_v = jnp.einsum("nri,nr->i", P,
                         gy + jnp.einsum("nrs,ns->nr", Wq, q - y))

        H = H_v
        gvec = g_v
        if n_soft:
            gvec = gvec.at[nu_total + K * ny:].set(jnp.asarray(soft_w, dtype))

        # trust-region box: controls clipped to the intersection of the
        # hard bounds and +-tr*scale around the incumbent; boundary states
        # to +-tr*scale around the incumbent boundary values
        xb_now = y[::M]                                      # (K, ny)
        lb_v = jnp.concatenate([
            jnp.maximum(jnp.broadcast_to(u_lb, (N, nu)),
                        u - tr * u_scale).reshape(-1),
            (xb_now - tr * x_scale).reshape(-1),
            jnp.zeros((n_soft,), dtype)])
        ub_v = jnp.concatenate([
            jnp.minimum(jnp.broadcast_to(u_ub, (N, nu)),
                        u + tr * u_scale).reshape(-1),
            (xb_now + tr * x_scale).reshape(-1),
            jnp.full((n_soft,), jnp.inf, dtype)])

        # ---- periodicity equality rows ----------------------------------
        # end of segment k (row M-1) == boundary k+1 (mod K)
        assert K >= 2, "need at least two segments (periodic closure)"

        def eq_rows(k):
            rows = jnp.zeros((ny, nv), dtype)
            rows = lax.dynamic_update_slice(
                rows, A_seg[k, M - 1],
                (jnp.int32(0), jnp.int32(nu_total) + k * ny))
            rows = lax.dynamic_update_slice(
                rows, B_seg[k, M - 1], (jnp.int32(0), k * jnp.int32(M * nu)))
            knext = jnp.mod(k + 1, K)
            sel = -jnp.eye(ny, dtype=dtype)
            rows = lax.dynamic_update_slice(
                rows, sel, (jnp.int32(0), jnp.int32(nu_total) + knext * ny))
            off = d_seg[k, M - 1]
            return rows, off

        eqA, eqOff = jax.vmap(eq_rows)(jnp.arange(K, dtype=jnp.int32))
        eqA = eqA.reshape(K * ny, nv)
        eqOff = eqOff.reshape(K * ny)

        A_rows = [eqA]
        lbs = [-eqOff]
        ubs = [-eqOff]

        # ---- node constraint rows ---------------------------------------
        for sel_fn, lo, hi, sidx in row_groups:
            def one(y_i, u_i):
                v = jnp.atleast_1d(sel_fn(y_i, u_i))
                Jy = jnp.atleast_2d(jax.jacfwd(sel_fn, argnums=0)(y_i, u_i))
                Ju = jnp.atleast_2d(jax.jacfwd(sel_fn, argnums=1)(y_i, u_i))
                return v, Jy, Ju
            v0, Jy, Ju = jax.vmap(one)(y, u)
            rows = jnp.einsum("nri,nij->nrj", Jy, P)
            r = v0.shape[1]
            Ju_full = jnp.zeros(rows.shape, dtype)
            Ju_full = jax.vmap(
                lambda Df, Dm, i: jax.lax.dynamic_update_slice(
                    Df, Dm, (jnp.int32(0), i * nu))
            )(Ju_full, Ju, jnp.arange(N, dtype=jnp.int32))
            rows = rows + Ju_full
            off = (v0 + jnp.einsum("nri,ni->nr", Jy, q - y)
                   - jnp.einsum("nri,ni->nr", Ju, u))
            rows = rows.reshape(N * r, nv)
            off = off.reshape(N * r)
            lo_b = np.broadcast_to(np.asarray(lo, np.float64), (N, r)).reshape(-1)
            hi_b = np.broadcast_to(np.asarray(hi, np.float64), (N, r)).reshape(-1)
            si = np.broadcast_to(np.asarray(sidx), (N, r)).reshape(-1)
            if np.all(si < 0):
                A_rows.append(rows)
                lbs.append(jnp.asarray(lo_b, dtype) - off)
                ubs.append(jnp.asarray(hi_b, dtype) - off)
            else:
                inf_vec = jnp.full((N * r,), jnp.inf, dtype)
                scol = nu_total + K * ny + si
                if np.all(np.isfinite(lo_b)):
                    rws = rows.at[np.arange(N * r), scol].add(1.0)
                    A_rows.append(rws)
                    lbs.append(jnp.asarray(lo_b, dtype) - off)
                    ubs.append(inf_vec)
                if np.all(np.isfinite(hi_b)):
                    rws = rows.at[np.arange(N * r), scol].add(-1.0)
                    A_rows.append(rws)
                    lbs.append(-inf_vec)
                    ubs.append(jnp.asarray(hi_b, dtype) - off)
        A = jnp.concatenate(A_rows, axis=0)
        lbA = jnp.concatenate(lbs)
        ubA = jnp.concatenate(ubs)

        xb0 = y[::M].reshape(-1)
        v0_init = jnp.concatenate(
            [u.reshape(-1), xb0, jnp.zeros((n_soft,), dtype)])
        res = ipm.solve_qp(H, gvec, A, lb_v, ub_v, lbA, ubA, opts, x0=v0_init)
        slack = res.x[nu_total + K * ny:]
        dv = res.x - v0_init

        # trial evaluation by NONLINEAR within-segment rollout (multiple
        # shooting): the condensed affine map P v + q is only used to model
        # the QP -- evaluating trials through it re-rolls interior states
        # with the *linearised* dynamics, whose one-segment error with the
        # stiff Pacejka slip modes at ds ~ 3 m has an O(1e-4) floor that
        # blocks quadratic convergence.  Rolling out nonlinearly makes the
        # interior defects exactly zero at every trial; only the K segment
        # -boundary defects remain for the Newton iteration to close.
        def rollout(xb, u_full):
            u_seg = u_full.reshape(K, M, nu)

            def seg(k, xb_k, u_k):
                def stp(y_j, j):
                    return defect_fn(k * M + j, y_j, u_k[j]), y_j
                _, ys = lax.scan(stp, xb_k, jnp.arange(M, dtype=jnp.int32))
                return ys

            ys = jax.vmap(seg)(jnp.arange(K, dtype=jnp.int32), xb, u_seg)
            return ys.reshape(N, ny)

        def try_alpha(alpha):
            v_a = v0_init + alpha * dv
            u_a = v_a[:nu_total].reshape(N, nu)
            xb_a = v_a[nu_total:nu_total + K * ny].reshape(K, ny)
            y_a = rollout(xb_a, u_a)
            m, dmax = merit(y_a, u_a)
            return m, (y_a, u_a, dmax)

        m_cur, d_cur = merit(y, u)
        alphas = jnp.asarray([1.0, 0.6, 0.35, 0.2, 0.1, 0.04, 0.015], dtype)
        ms, (ys, us, dmaxs) = jax.vmap(try_alpha)(alphas)
        k = jnp.argmin(ms)
        accepted = ms[k] < m_cur
        y_new = jnp.where(accepted, ys[k], y)
        u_new = jnp.where(accepted, us[k], u)
        m_new = jnp.where(accepted, ms[k], m_cur)
        d_new = jnp.where(accepted, dmaxs[k], d_cur)
        # trust-radius update: shrink hard on rejection, grow on an
        # accepted (near-)full step, hold otherwise
        tr_new = jnp.where(~accepted, tr * 0.25,
                           jnp.where(k <= 1,
                                     jnp.minimum(tr * 1.5, tr_max), tr))
        tr_new = jnp.maximum(tr_new, tr_min)
        diag = (k, tr, jnp.max(jnp.abs(dv)), accepted, ms)
        return (y_new, u_new, tr_new), (slack, m_new, d_new, diag)

    tr_init = jnp.asarray(tr0, dtype)
    (y, u, _), (slacks, merits, dnorms, diags) = lax.scan(
        sqp_iter, (y0, u0, tr_init), None, length=iters)
    if _DEBUG_HISTORY is not None:
        _DEBUG_HISTORY.update(merits=merits, dnorms=dnorms, diags=diags)
    t_node = t_val(y, s_nodes)
    slack_last = slacks[-1] if n_soft else jnp.zeros((0,), dtype)
    return y, u, t_node, slack_last, merits[-1], dnorms[-1]


# debugging hook: set to a dict to capture per-iteration SQP history
_DEBUG_HISTORY = None


def minimum_time_planner_kinematic(track,
                                   params: VehicleParams = VehicleParams(),
                                   n_nodes: int = 1000,
                                   opts: ipm.IpmOptions = ipm.IpmOptions(),
                                   iters: int = 30,
                                   seg_len: int = 4) -> PlannerResult:
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
        # clamp: the line search may probe states with s_dot <= 0; the time
        # model must stay finite (merit then rejects via the defect term)
        return ds / jnp.maximum(s_dot(y, s), 0.3)

    def step_map(i, y, u):
        s = s_nodes[i]
        n, mu, v, delta = y
        beta = jnp.arctan(params.lr_ratio * jnp.tan(delta))
        k = track.curvature(s)
        sd = v * jnp.cos(mu + beta) / (1.0 - n * k)
        sd = jnp.where(jnp.abs(sd) < 0.3, 0.3, sd)
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
        u_lb, u_ub, 0, [], opts, iters, seg_len,
        x_scale=jnp.asarray([0.5, 0.3, 5.0, 0.2], dtype))
    return PlannerResult(y_opt=y, u_opt=u, t_node=t_node,
                         lap_time=jnp.sum(t_node), slack=slack,
                         merit=merit, defect_norm=dnorm)


def minimum_time_planner_dynamic(track,
                                 params: VehicleParams = VehicleParams(),
                                 n_nodes: int = 500,
                                 opts: ipm.IpmOptions = ipm.IpmOptions(),
                                 iters: int = 40,
                                 seg_len: int = 1,
                                 friction_util: float = 1.0
                                 ) -> PlannerResult:
    """Dynamic min-time raceline (``dynamic_minimum_time_planner.m``).

    Node state [n, mu, x_d, y_d, theta_d, delta] (s removed), controls
    [a, delta_d]; Heun (trapezoidal-predictor) s-domain defects with
    periodic wrap (``:137-149``); friction-ellipse utilisation <=
    ``friction_util`` softened at w=1e5 and track softening |n| <= 0.5 at
    w=1e8 (``:44-45,158-168``).  Slack order [track, tyre].

    ``friction_util``: the reference planner imposes the FULL ellipse
    (utilisation <= 1) with slacks (``:158-168``); earlier rounds shipped
    a hard-coded 0.75 margin that cost ~40%% of predicted lap time.  The
    round-5 sweep (RACELINE_SWEEP.json) measures predicted + tracked lap
    time per utilisation on fsg2019; 1.0 is the measured-best default.
    """
    dtype = track.px.dtype
    N = n_nodes
    ds = track.L / N
    s_nodes = ds * jnp.arange(N, dtype=dtype)

    u_dummy = jnp.zeros((2,), dtype)

    def full_state(y, s):
        return jnp.concatenate([jnp.stack([s]), y])

    def y_prime(y, u, s):
        f, _ = cm.f_curv_dyn(full_state(y, s), u, track, params)
        sd = jnp.where(jnp.abs(f[0]) < 0.3, 0.3, f[0])
        return f[1:] / sd, sd

    def time_of(y, s):
        f, _ = cm.f_curv_dyn(full_state(y, s), u_dummy, track, params)
        return ds / jnp.maximum(f[0], 0.3)

    def step_map(i, y, u):
        s = s_nodes[i]
        k1, _ = y_prime(y, u, s)
        y_pred = y + ds * k1
        k2, _ = y_prime(y_pred, u, s + ds)
        return y + 0.5 * ds * (k1 + k2)

    # steady-state cornering cold start: the reference hands IPOPT a flat
    # x_d=10 init and lets 5000 interior-point iterations sort it out
    # (``:66-67``); a fixed-iteration SQP needs a consistent start, so seed
    # each node with the kinematic steady state of the local curvature
    # (theta_d = v k, delta = atan(L k), y_d = v tan(beta)), which makes
    # the initial defects O(Pacejka mismatch) instead of O(1).
    #
    # The SPEED of that seed decides which local optimum the SQP lands in
    # (round-5 measurement, RACELINE.json convergence block): a flat
    # 10 m/s start converges cleanly (defect ~3e-3 at 160 iterations) but
    # to a ~9 m/s-average line, far below what the closed-loop controller
    # demonstrably achieves.  Seed instead with the friction-limited
    # cornering speed of the local curvature, smoothed backward/forward by
    # the longitudinal-acceleration limit (the classic quasi-steady-state
    # speed-profile construction), capped at the target speed.
    k_nodes = jax.vmap(track.curvature)(s_nodes)
    v_corner = jnp.minimum(
        jnp.sqrt(params.ac_max / jnp.maximum(jnp.abs(k_nodes), 1e-4)),
        18.0)
    # accel-limit smoothing: two passes of v' <= sqrt(v^2 + 2 a ds)
    # around the loop (periodic)
    def smooth(v):
        def fwd(vp, vn):
            v_ok = jnp.minimum(vn, jnp.sqrt(vp * vp + 2.0 * 8.0 * ds))
            return v_ok, v_ok
        _, v1 = lax.scan(fwd, v[-1], v)
        _, v2 = lax.scan(fwd, v1[-1], v1)
        return v2

    v_nodes = smooth(smooth(v_corner)[::-1])[::-1]
    delta_init = jnp.arctan((params.lf + params.lr) * k_nodes)
    beta_init = jnp.arctan(params.lr_ratio * jnp.tan(delta_init))
    y0 = jnp.stack([
        jnp.zeros((N,), dtype),
        jnp.zeros((N,), dtype),
        v_nodes,
        v_nodes * jnp.tan(beta_init),
        v_nodes * k_nodes,
        delta_init,
    ], axis=1)
    # controls: a = v dv/ds (chain rule), delta_d = delta'(s) * s_dot
    dv = (jnp.roll(v_nodes, -1) - v_nodes) / ds
    a_init = jnp.clip(v_nodes * dv, -10.0, 10.0)
    ddel = (jnp.roll(delta_init, -1) - delta_init) / ds * v_nodes
    u0 = jnp.stack([a_init, ddel], axis=1)
    q_reg = jnp.tile(jnp.asarray([0.01, 0.01, 0.0, 0.0, 0.0, 0.0], dtype),
                     (N, 1))
    r_reg = jnp.tile(jnp.asarray([1e-6, 0.01], dtype), (N, 1))

    def friction(y, uu):
        x_full = jnp.concatenate([jnp.zeros((1,), dtype), y])
        fcr = cm.rear_lateral_force(x_full, params)
        return ((fcr / (params.m * params.ac_max)) ** 2
                + (uu[0] / params.al_max) ** 2)

    row_groups = [
        (lambda y, u: y[jnp.asarray([2, 5])],
         np.array([0.0, -0.4]), np.array([np.inf, 0.4]),
         np.array([-1, -1])),
        (lambda y, u: y[jnp.asarray([0])],
         np.array([-0.5]), np.array([0.5]), np.array([0])),
        (friction, np.array([-np.inf]), np.array([float(friction_util)]),
         np.array([1])),
    ]
    u_lb = jnp.asarray([-10.0, -0.4], dtype)
    u_ub = jnp.asarray([10.0, 0.4], dtype)

    y, u, t_node, slack, merit, dnorm = _plan_sqp(
        step_map, time_of, s_nodes, y0, u0, q_reg, r_reg, row_groups,
        u_lb, u_ub, 2, [1e8, 1e5], opts, iters, seg_len,
        x_scale=jnp.asarray([0.5, 0.3, 5.0, 1.0, 0.5, 0.2], dtype))
    return PlannerResult(y_opt=y, u_opt=u, t_node=t_node,
                         lap_time=jnp.sum(t_node), slack=slack,
                         merit=merit, defect_norm=dnorm)
