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
from ..ops import riccati
from ..ops.linalg import solve_unrolled
from . import constraints as cons
from .ltv import assemble_condensed_qp
from .sqp import SqpResult, run_sqp


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


def _trapezoidal_stage_qp(x0, x_ref, q_diag, r_diag, r_soft, groups,
                          fr_group, Ad, Ba, Bb, dd, u_lb, u_ub):
    """The trapezoidal SQP subproblem as an uncondensed
    :class:`ops.riccati.StageQP` on the AUGMENTED state z_k = [x_k; u_k].

    The two-control coupling x_{k+1} = Ad_k x_k + Ba_k u_k + Bb_k u_{k+1}
    + dd_k becomes a one-step recurrence on z with stage control
    w_k = u_k:

        stage 0:    z_0 = [x0; u_0]          (A = 0, B = [0; I], d = [x0; 0])
        stage k>=1: z_k = [Ad Ba; 0 0] z_{k-1} + [Bb; I] w_k + [dd; 0]

    Constraint rows at point k touch (x_k, u_k) -- both inside z_k, so
    every row is a pure augmented-state row on the stage's post-state
    (C_tilde = [C_x, D_u], D = 0).  Same minimiser as the condensed QP of
    :func:`trapezoidal_nmpc_*` (tests/test_nmpc.py parity), with no B_bar
    ever formed.

    ``groups``: x-only StageConstraint list at points 1..N (Ng = N);
    ``fr_group``: optional (x, u) group at points 0..N (Ng = N + 1,
    e.g. the dynamic friction ellipse) or None.
    Returns (qp, const).
    """
    N1, nx, nu = Ba.shape[0] + 1, Ba.shape[1], Ba.shape[2]   # N1 = N + 1
    N = N1 - 1
    dtype = Ad.dtype
    nz = nx + nu
    n_soft = len(r_soft)

    # augmented transition
    Atil = jnp.zeros((N1, nz, nz), dtype)
    Atil = Atil.at[1:, :nx, :nx].set(Ad)
    Atil = Atil.at[1:, :nx, nx:].set(Ba)
    Btil = jnp.zeros((N1, nz, nu), dtype)
    Btil = Btil.at[1:, :nx, :].set(Bb)
    Btil = Btil.at[:, nx:, :].set(jnp.eye(nu, dtype=dtype)[None])
    dtil = jnp.zeros((N1, nz), dtype)
    dtil = dtil.at[0, :nx].set(x0)
    dtil = dtil.at[1:, :nx].set(dd)

    # costs: tracking on the x-part of z_1..z_N, control cost on w_k
    q_st = q_diag.reshape(N, nx)
    Qx = jnp.zeros((N1, nz), dtype).at[1:, :nx].set(2.0 * q_st)
    qx = jnp.zeros((N1, nz), dtype).at[1:, :nx].set(-2.0 * q_st * x_ref)
    Ru = 2.0 * r_diag.reshape(N1, nu)
    const = jnp.sum(q_st * x_ref * x_ref)

    # rows: emit each group's sides like ltv.build_stage_rows, padded with
    # an inactive stage-0 row block for the point-1..N groups
    C_parts, Ws_parts, lo_parts, hi_parts = [], [], [], []

    def emit(Ct, off, lo, hi, slack_col, sign, lead_pad):
        rr = Ct.shape[1]
        if lead_pad:
            Ct = jnp.concatenate([jnp.zeros((1, rr, nz), dtype), Ct],
                                 axis=0)
            off = jnp.concatenate([jnp.zeros((1, rr), dtype), off], axis=0)
        Ws = np.zeros((rr, n_soft), np.float64)
        if slack_col is not None:
            Ws[np.arange(rr), slack_col] = sign
        lo_b = jnp.asarray(lo, dtype)[None, :] - off
        hi_b = jnp.asarray(hi, dtype)[None, :] - off
        if lead_pad:
            # stage-0 block is structurally absent: deactivate both sides
            lo_b = lo_b.at[0].set(-jnp.inf)
            hi_b = hi_b.at[0].set(jnp.inf)
        C_parts.append(Ct)
        Ws_parts.append(jnp.broadcast_to(jnp.asarray(Ws, dtype),
                                         (N1, rr, n_soft)))
        lo_parts.append(lo_b)
        hi_parts.append(hi_b)

    def group_rows(grp, lead_pad):
        Ng, rr, _ = grp.C.shape
        Ct = jnp.concatenate([grp.C, grp.D], axis=-1)        # (Ng, r, nz)
        lb_g = np.broadcast_to(grp.lb, (rr,))
        ub_g = np.broadcast_to(grp.ub, (rr,))
        sidx = np.broadcast_to(grp.slack_idx, (rr,))
        hard = sidx < 0
        if np.all(hard):
            emit(Ct, grp.offset_const, lb_g, ub_g, None, 0.0, lead_pad)
        else:
            assert not np.any(hard), "mixed hard/soft rows in one group"
            inf_v = np.full((rr,), np.inf)
            if np.all(np.isfinite(lb_g)):
                emit(Ct, grp.offset_const, lb_g, inf_v, sidx, +1.0,
                     lead_pad)
            if np.all(np.isfinite(ub_g)):
                emit(Ct, grp.offset_const, -inf_v, ub_g, sidx, -1.0,
                     lead_pad)

    for grp in groups:
        group_rows(grp, lead_pad=True)
    if fr_group is not None:
        group_rows(fr_group, lead_pad=False)

    C = jnp.concatenate(C_parts, axis=1)
    Ws = jnp.concatenate(Ws_parts, axis=1)
    lbA = jnp.concatenate(lo_parts, axis=1)
    ubA = jnp.concatenate(hi_parts, axis=1)
    r_rows = C.shape[1]
    D = jnp.zeros((N1, r_rows, nu), dtype)

    qp = riccati.StageQP(
        Ad=Atil, Bd=Btil, dd=dtil, x0=jnp.zeros((nz,), dtype),
        Qx=Qx, qx=qx, Ru=Ru, ru=jnp.zeros((N1, nu), dtype),
        g_s=jnp.asarray(r_soft, dtype),
        C=C, D=D, Ws=Ws, lbA=lbA, ubA=ubA,
        u_lb=u_lb, u_ub=u_ub,
        s_lb=jnp.zeros((n_soft,), dtype),
        s_ub=jnp.full((n_soft,), jnp.inf, dtype))
    return qp, const


def trapezoidal_nmpc_kinematic(x0, x_ref, track, params: VehicleParams,
                               mpc: MPCParams, x_init, u_init,
                               opts: ipm.IpmOptions = ipm.IpmOptions(),
                               sqp_iters: int = 3, warm=None,
                               backend: str = "dense") -> SqpResult:
    """Trapezoidal C-NMPC, kinematic model
    (``trapezoidal_nmpc_kinematic_curvilinear.m``).

    ``x_init``: (N+1, 5) iterate over collocation points (point 0 will be
    pinned to x0); ``u_init``: (N+1, 2).  ``x_ref``: (N, 5) for points 1..N.

    ``backend="riccati"`` solves the subproblems stage-wise on the
    augmented state (:func:`_trapezoidal_stage_qp`).
    """
    N = mpc.n_steps
    dtype = x_init.dtype
    f = lambda x, u: cm.f_curv_kin(x, u, track, params)
    q_diag, r_diag = _collocation_weights(mpc, 5, N, dtype)
    u_lb = jnp.tile(jnp.asarray([-mpc.a_max, -mpc.delta_d_max], dtype),
                    (N + 1, 1))
    u_ub = -u_lb

    def sqp_iter(carry, qp_warm):
        x_pts, u_pts = carry
        x_pts = x_pts.at[0].set(x0)
        Ad, Ba, Bb, dd = _trapezoidal_stages(f, x_pts, u_pts, mpc.dt)
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

        def roll_states(u_new):
            def roll(x, inp):
                Ad_i, Ba_i, Bb_i, dd_i, u_i, u_n = inp
                x_next = Ad_i @ x + Ba_i @ u_i + Bb_i @ u_n + dd_i
                return x_next, x_next

            _, tail = lax.scan(
                roll, x0, (Ad, Ba, Bb, dd, u_new[:-1], u_new[1:]))
            return jnp.concatenate([x0[None], tail], axis=0)

        if backend == "riccati":
            qp_s, const = _trapezoidal_stage_qp(
                x0, x_ref, q_diag, r_diag, [mpc.w_track], groups, None,
                Ad, Ba, Bb, dd, u_lb, u_ub)
            res = riccati.solve_stage_qp(qp_s, opts, warm=qp_warm)
            u_new = res.u
            return (roll_states(u_new), u_new), (res.s,
                                                 res.objective + const, res)

        A_bar, B_bar, d_bar = condense_general(
            Ad, dd, [(Ba, 0), (Bb, 1)], n_controls=N + 1)
        H, g, A, lb, ub, lbA, ubA, const = assemble_condensed_qp(
            A_bar, B_bar, d_bar, x0, x_ref, q_diag, r_diag, [mpc.w_track],
            groups, u_lb, u_ub)
        res = ipm.solve_qp(H, g, A, lb, ub, lbA, ubA, opts, warm=qp_warm)
        u_new = res.x[:(N + 1) * 2].reshape(N + 1, 2)
        x_new = roll_states(u_new)
        return (x_new, u_new), (res.x[(N + 1) * 2:], res.objective + const, res)

    x_opt, u_opt, last = run_sqp(sqp_iter, x_init, u_init, sqp_iters, warm)
    return SqpResult(x_opt=x_opt, u_opt=u_opt, slack=last[0],
                     fval=last[1], qp=last[2])


def _hs_stages(f, x_knots, x_mids, u_pts, dt):
    """Linearised Hermite-Simpson interval maps in absolute coordinates.

    Points: knots x_0..x_N (x_knots, (N+1, nx)) and midpoints (N, nx);
    controls u at all 2N+1 points (u_pts).  The midpoint-interpolation
    constraint  (x_p + x_q)/2 + dt/8 (f_p - f_q) = x_m  is solved for x_m
    and substituted into the Simpson defect
    x_p - x_q + dt/6 (f_p + 4 f_m + f_q) = 0
    (``hs_nmpc_kinematic_curvilinear.m:124-125``), giving the knot
    recurrence  M_q dx_q = G_p dx_p + (controls) + r  plus the affine
    midpoint map.  Returns
      (Ad, B0, B1, B2, dd)  for  x_{q} = Ad x_p + B0 u_p + B1 u_m + B2 u_q + dd
      (Am_p, Am_q, Bm0, Bm2, dm) for x_m = Am_p x_p + Am_q x_q + Bm0 u_p
                                         + Bm2 u_q + dm.
    """
    nx = x_knots.shape[1]
    I = jnp.eye(nx, dtype=x_knots.dtype)
    u_kn = u_pts[0::2]       # (N+1, nu) knot controls
    u_md = u_pts[1::2]       # (N, nu) midpoint controls

    fk, Ak, Bk = _linearize_continuous(f, x_knots, u_kn)
    fm, Am, Bm = _linearize_continuous(f, x_mids, u_md)

    A_p, A_q = Ak[:-1], Ak[1:]
    B_p, B_q = Bk[:-1], Bk[1:]
    f_p, f_q = fk[:-1], fk[1:]

    # midpoint map in delta coordinates:
    # dx_m = P dx_p + Q dx_q + (dt/8) B_p du_p - (dt/8) B_q du_q + r_m
    P = 0.5 * I + (dt / 8.0) * A_p
    Q = 0.5 * I - (dt / 8.0) * A_q
    r_m = (x_knots[:-1] + x_knots[1:]) / 2.0 + (dt / 8.0) * (f_p - f_q) - x_mids

    # Simpson defect linearised, substituting dx_m:
    # [I + dt/6 A_p + (2dt/3) A_m P] dx_p + [-I + dt/6 A_q + (2dt/3) A_m Q] dx_q
    #   + dt/6 B_p du_p + (2dt/3) B_m du_m + dt/6 B_q du_q
    #   + (2dt/3) A_m [(dt/8)(B_p du_p - B_q du_q) + r_m] + r_s = 0
    r_s = x_knots[:-1] - x_knots[1:] + (dt / 6.0) * (f_p + 4.0 * fm + f_q)
    AmP = jnp.einsum("nij,njk->nik", Am, P)
    AmQ = jnp.einsum("nij,njk->nik", Am, Q)
    G_p = I + (dt / 6.0) * A_p + (2.0 * dt / 3.0) * AmP
    M_q = I - (dt / 6.0) * A_q - (2.0 * dt / 3.0) * AmQ
    C0 = (dt / 6.0) * B_p + (dt * dt / 12.0) * jnp.einsum("nij,njk->nik", Am, B_p)
    C1 = (2.0 * dt / 3.0) * Bm
    C2 = (dt / 6.0) * B_q - (dt * dt / 12.0) * jnp.einsum("nij,njk->nik", Am, B_q)
    r_tot = r_s + (2.0 * dt / 3.0) * jnp.einsum("nij,nj->ni", Am, r_m)

    Ad = solve_unrolled(M_q, G_p)
    B0 = solve_unrolled(M_q, C0)
    B1 = solve_unrolled(M_q, C1)
    B2 = solve_unrolled(M_q, C2)
    dr = solve_unrolled(M_q, r_tot[..., None])[..., 0]
    # absolute offsets
    dd = (dr + x_knots[1:]
          - jnp.einsum("nij,nj->ni", Ad, x_knots[:-1])
          - jnp.einsum("nij,nj->ni", B0, u_kn[:-1])
          - jnp.einsum("nij,nj->ni", B1, u_md)
          - jnp.einsum("nij,nj->ni", B2, u_kn[1:]))

    Bm0 = (dt / 8.0) * B_p
    Bm2 = -(dt / 8.0) * B_q
    dm = (r_m + x_mids
          - jnp.einsum("nij,nj->ni", P, x_knots[:-1])
          - jnp.einsum("nij,nj->ni", Q, x_knots[1:])
          - jnp.einsum("nij,nj->ni", Bm0, u_kn[:-1])
          - jnp.einsum("nij,nj->ni", Bm2, u_kn[1:]))
    return (Ad, B0, B1, B2, dd), (P, Q, Bm0, Bm2, dm)


def hs_nmpc_kinematic(x0, x_ref, track, params: VehicleParams,
                      mpc: MPCParams, x_init, u_init,
                      opts: ipm.IpmOptions = ipm.IpmOptions(),
                      sqp_iters: int = 3, warm=None) -> SqpResult:
    """Hermite-Simpson C-NMPC, kinematic model
    (``hs_nmpc_kinematic_curvilinear.m``): 2N+1 collocation points with
    midpoints eliminated analytically, Simpson cost weights
    [1/6, 4/6, 2/6, ...] (``:43-44``), soft track + lateral-accel rows at
    every interior point sharing one slack (w=1e8).

    ``x_init``: (2N+1, nx) iterate over all points (point 0 pinned to x0);
    ``u_init``: (2N+1, nu).  ``x_ref``: (N, nx) knot references (midpoint
    references interpolated, ``:31-38``).
    """
    N = mpc.n_steps
    dtype = x_init.dtype
    nx = 5
    nu = 2
    f = lambda x, u: cm.f_curv_kin(x, u, track, params)
    NC = 2 * N + 1

    # Simpson cost factors over points 0..2N (``hs...m:43-44``); point 0 is
    # fixed so only points 1..2N enter.
    Qt = mpc.q_terminal_scale
    qf = np.empty(NC)
    qf[0] = 1.0 / 6.0
    qf[1::2] = 4.0 / 6.0             # midpoints
    qf[2::2] = 2.0 / 6.0             # interior knots
    qf[2 * N - 2] = (1.0 + Qt) / 6.0
    qf[2 * N - 1] = 4.0 * Qt / 6.0
    qf[2 * N] = Qt / 6.0
    rf = np.empty(NC)
    rf[1::2] = 4.0 / 6.0
    rf[0::2] = 2.0 / 6.0
    rf[0] = rf[-1] = 1.0 / 6.0

    q = jnp.zeros((nx,), dtype).at[0].set(mpc.q_s).at[1].set(mpc.q_n) \
        .at[2].set(mpc.q_mu)
    q_diag = jnp.concatenate([q * float(w) for w in qf[1:]])
    r = jnp.asarray([mpc.r_a, mpc.r_delta_d], dtype)
    r_diag = jnp.concatenate([r * float(w) for w in rf])

    # references at interior points: midpoints interpolated between knots
    x_ref_k = jnp.concatenate([x0[None], x_ref], axis=0)      # (N+1, nx)
    x_ref_m = 0.5 * (x_ref_k[:-1] + x_ref_k[1:])
    x_ref_all = jnp.zeros((2 * N, nx), dtype)
    x_ref_all = x_ref_all.at[0::2].set(x_ref_m)
    x_ref_all = x_ref_all.at[1::2].set(x_ref)

    u_lb = jnp.tile(jnp.asarray([-mpc.a_max, -mpc.delta_d_max], dtype),
                    (NC, 1))
    u_ub = -u_lb
    NCnu = NC * nu

    def sqp_iter(carry, qp_warm):
        x_pts, u_pts = carry
        x_pts = x_pts.at[0].set(x0)
        x_knots = x_pts[0::2]
        x_mids = x_pts[1::2]
        (Ad, B0, B1, B2, dd), (Pm, Qm, Bm0, Bm2, dm) = _hs_stages(
            f, x_knots, x_mids, u_pts, mpc.dt)

        # knot chain condensed with the (u_2i, u_2i+1, u_2i+2) coupling
        A_bar_k, B_bar_k, d_bar_k = condense_general(
            Ad, dd, [(B0, 0), (B1, 1), (B2, 2)], n_controls=NC,
            ctrl_stride=2)

        # knot maps including knot 0 (= x0 exactly: A=I, B=0, d=0)
        eye = jnp.eye(nx, dtype=dtype)
        knotA = jnp.concatenate([eye[None], A_bar_k], axis=0)
        knotB = jnp.concatenate([jnp.zeros((1, nx, NCnu), dtype), B_bar_k],
                                axis=0)
        knotd = jnp.concatenate([jnp.zeros((1, nx), dtype), d_bar_k], axis=0)

        # midpoint maps composed from the adjacent knots:
        # x_m(i) = Pm_i x_knot(i) + Qm_i x_knot(i+1)
        #          + Bm0_i u_{2i} + Bm2_i u_{2i+2} + dm_i
        A_mid = (jnp.einsum("nij,njk->nik", Pm, knotA[:-1])
                 + jnp.einsum("nij,njk->nik", Qm, knotA[1:]))
        B_mid = (jnp.einsum("nij,njk->nik", Pm, knotB[:-1])
                 + jnp.einsum("nij,njk->nik", Qm, knotB[1:]))
        d_mid = (dm + jnp.einsum("nij,nj->ni", Pm, knotd[:-1])
                 + jnp.einsum("nij,nj->ni", Qm, knotd[1:]))
        idx = jnp.arange(N, dtype=jnp.int32)

        def add_at(Bf, D, col):
            cur = lax.dynamic_slice(Bf, (jnp.int32(0), col), (nx, nu))
            return lax.dynamic_update_slice(Bf, cur + D, (jnp.int32(0), col))

        B_mid = jax.vmap(lambda Bf, D, i: add_at(Bf, D, i * (2 * nu)))(
            B_mid, Bm0, idx)
        B_mid = jax.vmap(
            lambda Bf, D, i: add_at(Bf, D, i * (2 * nu) + 2 * nu))(
            B_mid, Bm2, idx)

        # interleave into virtual stages 1..2N: [mid_0, knot_1, mid_1, ...]
        A_all = jnp.zeros((2 * N, nx, nx), dtype)
        A_all = A_all.at[0::2].set(A_mid)
        A_all = A_all.at[1::2].set(knotA[1:])
        B_all = jnp.zeros((2 * N, nx, NCnu), dtype)
        B_all = B_all.at[0::2].set(B_mid)
        B_all = B_all.at[1::2].set(knotB[1:])
        d_all = jnp.zeros((2 * N, nx), dtype)
        d_all = d_all.at[0::2].set(d_mid)
        d_all = d_all.at[1::2].set(knotd[1:])

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
            A_all, B_all, d_all, x0, x_ref_all, q_diag, r_diag,
            [mpc.w_track], groups, u_lb, u_ub)
        res = ipm.solve_qp(H, g, A, lb, ub, lbA, ubA, opts, warm=qp_warm)
        u_new = res.x[:NCnu].reshape(NC, nu)

        x_all_new = (jnp.einsum("nij,j->ni", A_all, x0)
                     + jnp.einsum("nij,j->ni", B_all, res.x[:NCnu])
                     + d_all)
        x_new = jnp.concatenate([x0[None], x_all_new], axis=0)
        return (x_new, u_new), (res.x[NCnu:], res.objective + const, res)

    x_opt, u_opt, last = run_sqp(sqp_iter, x_init, u_init, sqp_iters, warm)
    return SqpResult(x_opt=x_opt, u_opt=u_opt, slack=last[0],
                     fval=last[1], qp=last[2])


def trapezoidal_nmpc_dynamic(x0, x_ref, track, params: VehicleParams,
                             mpc: MPCParams, x_init, u_init,
                             opts: ipm.IpmOptions = ipm.IpmOptions(),
                             sqp_iters: int = 3,
                             trust_u=(2.0, 0.15), warm=None,
                             backend: str = "dense") -> SqpResult:
    """Trapezoidal C-NMPC, dynamic model
    (``trapezoidal_nmpc_dynamic_curvilinear.m``): exact friction-ellipse
    rows at every collocation point (incl. point 0 through its control),
    track softening at points 1..N.  Slack order [track(1e8), tyre(1e5)].

    ``backend="riccati"``: stage-wise subproblems on the augmented state
    (:func:`_trapezoidal_stage_qp`); the friction rows pair each point's
    state with its own control, which the augmented state carries
    natively.
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

    def sqp_iter(carry, qp_warm):
        x_pts, u_pts = carry
        x_pts = x_pts.at[0].set(x0)
        Ad, Ba, Bb, dd = _trapezoidal_stages(f, x_pts, u_pts, mpc.dt)
        x_in = x_pts[1:]
        u_in = u_pts[1:]
        groups = [
            cons.state_box_group([3, 6], np.array([0.0, -mpc.delta_max]),
                                 np.array([np.inf, mpc.delta_max]),
                                 np.array([-1, -1]), x_in, u_in),
            cons.state_box_group([1], np.array([-mpc.n_max]),
                                 np.array([mpc.n_max]), np.array([0]),
                                 x_in, u_in),
        ]
        fr_group = cons.friction_ellipse_group(
            x_pts, u_pts, mpc, params, slack=1, state_rows=fr_rows,
            ctrl_cols=fr_cols)
        tr = jnp.asarray(trust_u, dtype)
        lb_eff = jnp.maximum(u_lb, u_pts - tr)
        ub_eff = jnp.minimum(u_ub, u_pts + tr)

        def roll_states(u_new):
            def roll(x, inp):
                Ad_i, Ba_i, Bb_i, dd_i, u_i, u_n = inp
                x_next = Ad_i @ x + Ba_i @ u_i + Bb_i @ u_n + dd_i
                return x_next, x_next

            _, tail = lax.scan(
                roll, x0, (Ad, Ba, Bb, dd, u_new[:-1], u_new[1:]))
            return jnp.concatenate([x0[None], tail], axis=0)

        if backend == "riccati":
            qp_s, const = _trapezoidal_stage_qp(
                x0, x_ref, q_diag, r_diag, [mpc.w_track, mpc.w_slip],
                groups, fr_group, Ad, Ba, Bb, dd, lb_eff, ub_eff)
            res = riccati.solve_stage_qp(qp_s, opts, warm=qp_warm)
            u_new = res.u
            return (roll_states(u_new), u_new), (res.s,
                                                 res.objective + const, res)

        A_bar, B_bar, d_bar = condense_general(
            Ad, dd, [(Ba, 0), (Bb, 1)], n_controls=N + 1)
        H, g, A, lb, ub, lbA, ubA, const = assemble_condensed_qp(
            A_bar, B_bar, d_bar, x0, x_ref, q_diag, r_diag,
            [mpc.w_track, mpc.w_slip], groups + [fr_group], lb_eff, ub_eff)
        res = ipm.solve_qp(H, g, A, lb, ub, lbA, ubA, opts, warm=qp_warm)
        u_new = res.x[:(N + 1) * 2].reshape(N + 1, 2)
        x_new = roll_states(u_new)
        return (x_new, u_new), (res.x[(N + 1) * 2:], res.objective + const, res)

    x_opt, u_opt, last = run_sqp(sqp_iter, x_init, u_init, sqp_iters, warm)
    return SqpResult(x_opt=x_opt, u_opt=u_opt, slack=last[0],
                     fval=last[1], qp=last[2])

def hs_shift_trajectory(x_opt, u_opt, step_half_fn):
    """Warm-start shift for the Hermite-Simpson point grid.

    One control tick advances one KNOT = two collocation points: drop the
    first two points and extend the tail by two half-steps of the dynamics
    (the HS analogue of ``sqp.shift_trajectory`` /
    ``rk2_nmpc_kinematic_curvilinear.m:62-65``).
    """
    x_a = step_half_fn(x_opt[-1], u_opt[-1])
    x_b = step_half_fn(x_a, u_opt[-1])
    x_new = jnp.concatenate([x_opt[2:], x_a[None], x_b[None]], axis=0)
    u_new = jnp.concatenate([u_opt[2:], u_opt[-1:], u_opt[-1:]], axis=0)
    return x_new, u_new
