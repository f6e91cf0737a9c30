"""LTV-MPC controllers (kinematic + dynamic curvilinear bicycle).

Per control tick (the 20 Hz hot path, ``mpc/ltv/ltvmpc_*_curvilinear.m``):

  1. linearise the discrete RK step along the previous optimal trajectory
     (autodiff; reference hand chain rule ``rk4_dynamic_curvilinear.m``),
  2. condense to dense prediction matrices -- on TPU a single fused
     Pallas kernel runs the whole horizon recurrence in VMEM
     (reference ``sequential_integration.m``; see CONDENSERS),
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
from ..ops.condense import (condense as _condense,
                            condense_dnc as _condense_dnc,
                            rollout as _rollout)
from ..ops.pallas.condense import condense_fused as _condense_pallas
from ..ops import ipm
from ..ops import riccati
from ..ops.precision import highest as _highest_precision
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


# Condensing backends (reference ``sequential_integration.m:21-47``):
# "scan" = O(N)-depth lax.scan; "dnc" = log-depth divide-and-conquer
# (~6 MXU dispatches); "pallas" = single fused batch-in-lanes kernel
# (ops/pallas/condense.py) that keeps the whole recurrence in VMEM.
# All oracle-tested (tests/test_condense.py, tests/test_pallas.py).
# Default chosen by on-chip measurement (PERF_VARIANTS.json: pallas
# 15,644 solves/s vs scan 13,606 at batch 1024; dnc loses to the scan
# already at the component level, 14.3 ms vs 11.3 ms, PROFILE_r03.json);
# off-TPU the pallas entry falls back to the scan, so CPU golden tests
# and virtual-device dryruns are unchanged.
CONDENSERS = {"scan": _condense, "dnc": _condense_dnc,
              "pallas": _condense_pallas}
DEFAULT_CONDENSE = "pallas"


@_highest_precision
def _qp_cost(A_bar, B_bar, d_bar, x0, x_ref, q_diag, r_diag,
             r_soft: Sequence[float], u_lb, u_ub):
    """Shared cost/bounds assembly (``generate_qp.m:29-33``)."""
    N, nx, NCnu = B_bar.shape
    nu = u_lb.shape[1]
    NC = NCnu // nu
    n_soft = len(r_soft)
    nv = NC * nu + n_soft
    dtype = B_bar.dtype

    B_flat = B_bar.reshape(N * nx, NC * nu)
    x_pred = jnp.einsum("nij,j->ni", A_bar, x0) + d_bar          # (N, nx)
    err = (x_pred - x_ref).reshape(-1)

    QB = B_flat * q_diag[:, None]
    Hu = 2.0 * (B_flat.T @ QB)
    Hu = Hu + jnp.diag(2.0 * r_diag)
    H = jnp.zeros((nv, nv), dtype).at[:NC * nu, :NC * nu].set(Hu)
    g = jnp.zeros((nv,), dtype).at[:NC * nu].set(2.0 * (QB.T @ err))
    g = g.at[NC * nu:].set(jnp.asarray(r_soft, dtype))
    const = err @ (q_diag * err)

    lb_v = jnp.concatenate([u_lb.reshape(-1), jnp.zeros((n_soft,), dtype)])
    ub_v = jnp.concatenate([u_ub.reshape(-1),
                            jnp.full((n_soft,), jnp.inf, dtype)])
    return H, g, lb_v, ub_v, const, x_pred


@_highest_precision
def assemble_gen_dynamic(A_bar, B_bar, d_bar, x0, x_ref, q_diag, r_diag,
                         r_soft: Sequence[float], track, params, mpc,
                         x_lin, u_lin, u_lb, u_ub):
    """Generator-factored assembly of the dynamic-LTV QP rows.

    The 800 dense rows (20 per stage) are static combinations of SEVEN
    per-stage generators in variable space (ops/structured.py:GenRows):

      0: e_v  @ B_bar[s]      (v >= 0 hard box)
      1: e_d  @ B_bar[s]      (|delta| <= delta_max hard box)
      2: e_n  @ B_bar[s]      (|n| <= n_max, soft, two emitted sides)
      3: da_r @ B_bar[s]      (rear slip gradient, soft, two sides)
      4: da_f @ B_bar[s]      (front slip gradient, soft, two sides)
      5: gfcr @ B_bar[s]      (rear-force gradient: all 12 polygon rows
                               are -dal_j * gfcr + dac_j * e_u0,
                               ``dynamic_tyre_linearise_constraints.m``)
      6: e_{u0,s}             (the stage's own Fx/m control column)

    Returns (H, g, A: GenRows, lb, ub, lbA, ubA, const) with rows in
    STAGE-MAJOR order ([box2, n_lo, n_up, slip_lo2, slip_up2, poly12]
    per stage); lbA/ubA match that order.
    """
    from ..ops.structured import GenRows

    N, nx, NCnu = B_bar.shape
    nu = u_lb.shape[1]
    n_soft = len(r_soft)
    dtype = B_bar.dtype
    H, g, lb_v, ub_v, const, x_pred = _qp_cost(
        A_bar, B_bar, d_bar, x0, x_ref, q_diag, r_diag, r_soft, u_lb, u_ub)
    n = NCnu + n_soft

    slip = cons.dynamic_slip_group(x_lin, u_lin, mpc, params, 1, 2)
    poly = cons.friction_polygon_group(x_lin, u_lin, mpc, params, 3)
    K = mpc.n_tyre_polygon

    # state-space generator rows (N, 6, nx)
    e = np.eye(nx)
    gfcr = jax.vmap(jax.jacfwd(
        lambda x: cm.rear_lateral_force(x, params) / params.m))(x_lin)
    Cg = jnp.concatenate([
        jnp.broadcast_to(jnp.asarray(e[[3, 6, 1]], dtype), (N, 3, nx)),
        slip.C,
        gfcr[:, None, :],
    ], axis=1)                                           # (N, 6, nx)
    Ag_state = jnp.einsum("ngi,nij->ngj", Cg, B_bar)     # (N, 6, NCnu)
    # generator 6: the stage's own first-control column (static one-hots)
    u0 = np.zeros((N, 1, NCnu))
    u0[np.arange(N), 0, np.arange(N) * nu] = 1.0
    Ag = jnp.concatenate([Ag_state, jnp.asarray(u0, dtype)], axis=1)
    Ag = jnp.concatenate([Ag, jnp.zeros((N, 7, n_soft), dtype)], axis=-1)

    # static row coefficients (R = 8 + K rows per stage)
    R = 8 + K
    theta = np.linspace(0.0, 2.0 * np.pi, K + 1)
    dac = float(params.ac_max) * np.diff(np.sin(theta))
    dal = float(params.al_max) * np.diff(np.cos(theta))
    W = np.zeros((R, 7))
    W[0, 0] = 1.0                 # v box
    W[1, 1] = 1.0                 # delta box
    W[2, 2] = W[3, 2] = 1.0       # n lower / upper
    W[4, 3] = W[6, 3] = 1.0       # rear slip lower / upper
    W[5, 4] = W[7, 4] = 1.0       # front slip lower / upper
    W[8:, 5] = -dal               # polygon: -dal_j * gfcr
    W[8:, 6] = dac                # polygon: +dac_j * u0
    Ws = np.zeros((R, n_soft))
    Ws[2, 0], Ws[3, 0] = 1.0, -1.0
    Ws[4, 1], Ws[6, 1] = 1.0, -1.0
    Ws[5, 2], Ws[7, 2] = 1.0, -1.0
    Ws[8:, 3] = -1.0
    A = GenRows(Ag=Ag,
                W=jnp.broadcast_to(jnp.asarray(W, dtype), (N, R, 7)),
                Ws=jnp.broadcast_to(jnp.asarray(Ws, dtype), (N, R, n_soft)))

    # per-row offsets (offset_const + C @ x_pred) and bounds, stage-major
    inf = np.inf
    off_box = jnp.einsum("ri,ni->nr", jnp.asarray(e[[3, 6]], dtype), x_pred)
    off_n = x_pred[:, 1:2]
    off_slip = slip.offset_const + jnp.einsum("nri,ni->nr", slip.C, x_pred)
    off_poly = poly.offset_const + jnp.einsum("nri,ni->nr", poly.C, x_pred)
    offset = jnp.concatenate([
        off_box, off_n, off_n, off_slip, off_slip, off_poly], axis=1)

    sm = float(mpc.slip_max)
    lo = np.concatenate([[0.0, -float(mpc.delta_max)],
                         [-float(mpc.n_max), -inf],
                         [-sm, -sm], [-inf, -inf],
                         np.full(K, -inf)])
    hi = np.concatenate([[inf, float(mpc.delta_max)],
                         [inf, float(mpc.n_max)],
                         [inf, inf], [sm, sm],
                         np.zeros(K)])
    lbA = (jnp.asarray(lo, dtype)[None, :] - offset).reshape(-1)
    ubA = (jnp.asarray(hi, dtype)[None, :] - offset).reshape(-1)
    return H, g, A, lb_v, ub_v, lbA, ubA, const


@_highest_precision
def assemble_condensed_qp(A_bar, B_bar, d_bar, x0, x_ref, q_diag, r_diag,
                          r_soft: Sequence[float], groups, u_lb, u_ub):
    """Assemble the condensed QP over v = [u_0..u_{NC-1}, sigma_1..sigma_k].

    ``B_bar``: (N, nx, NC*nu) control-sensitivity blocks (NC may exceed N
    for collocation transcriptions); ``q_diag``: (N*nx,), ``r_diag``:
    (NC*nu,); ``groups``: list of :class:`constraints.StageConstraint`.
    Returns (H, g, A, lb, ub, lbA, ubA, const).
    """
    N, nx, NCnu = B_bar.shape
    nu = u_lb.shape[1]
    NC = NCnu // nu
    n_soft = len(r_soft)
    nv = NC * nu + n_soft
    dtype = B_bar.dtype

    H, g, lb_v, ub_v, const, x_pred = _qp_cost(
        A_bar, B_bar, d_bar, x0, x_ref, q_diag, r_diag, r_soft, u_lb, u_ub)

    A_rows, lbA_rows, ubA_rows = [], [], []

    # Stage-aligned fast path (every LTV group: state_rows == ctrl_cols ==
    # arange(N)): ONE fused (N, R_tot, nx) @ (N, nx, NC*nu) product and one
    # block-diagonal D placement for ALL groups together, then per-group
    # slicing -- bit-identical rows (each output row's contraction is
    # independent), far fewer small batched-matmul dispatches on TPU.
    aligned = NC == N and all(
        grp.C.shape[0] == N
        and np.array_equal(grp.state_rows, np.arange(N))
        and np.array_equal(grp.ctrl_cols, np.arange(N))
        for grp in groups)
    if aligned:
        C_all = jnp.concatenate([g.C for g in groups], axis=1)   # (N,R,nx)
        D_all = jnp.concatenate([g.D for g in groups], axis=1)   # (N,R,nu)
        P = np.zeros((N, nu, NC * nu))
        for k in range(N):
            P[k, :, k * nu:(k + 1) * nu] = np.eye(nu)
        rows_all = (jnp.einsum("nri,nij->nrj", C_all, B_bar)
                    + jnp.einsum("nrk,nkj->nrj", D_all,
                                 jnp.asarray(P, dtype)))
        off_all = (jnp.concatenate([g.offset_const for g in groups], axis=1)
                   + jnp.einsum("nri,ni->nr", C_all, x_pred))
        r_off = 0

    for grp in groups:
        Ng, r, _ = grp.C.shape
        if aligned:
            rows_u = rows_all[:, r_off:r_off + r].reshape(Ng * r, NC * nu)
            offset = off_all[:, r_off:r_off + r].reshape(Ng * r)
            r_off += r
        else:
            srows = grp.state_rows               # static (Ng,)
            ccols = grp.ctrl_cols                # static (Ng,)

            # state sensitivity: select B_bar rows (fixed-x0 rows -> 0)
            sel = np.clip(srows, 0, N - 1)
            B_sel = jnp.where((srows >= 0)[:, None, None], B_bar[sel], 0.0)
            x_sel = jnp.where((srows >= 0)[:, None],
                              x_pred[sel], jnp.broadcast_to(x0, (Ng, nx)))
            rows_u = jnp.einsum("nri,nij->nrj", grp.C, B_sel)   # (Ng,r,NCnu)

            # control sensitivity: place D into the stage's control columns
            # via a STATIC one-hot projection (ctrl_cols is compile-time):
            # one batched (r, nu) @ (nu, NC*nu) matmul instead of Ng vmapped
            # dynamic_update_slice scatters (measured latency win on TPU).
            has_d = ccols >= 0
            if np.any(has_d):
                P = np.zeros((Ng, nu, NC * nu))
                for k in range(Ng):
                    if has_d[k]:
                        c = int(ccols[k])
                        P[k, :, c * nu:(c + 1) * nu] = np.eye(nu)
                rows_u = rows_u + jnp.einsum("nrk,nkj->nrj", grp.D,
                                             jnp.asarray(P, dtype))

            offset = (grp.offset_const
                      + jnp.einsum("nri,ni->nr", grp.C, x_sel)).reshape(Ng * r)
            rows_u = rows_u.reshape(Ng * r, NC * nu)

        lb_g = np.broadcast_to(grp.lb, (Ng, r)).reshape(-1)
        ub_g = np.broadcast_to(grp.ub, (Ng, r)).reshape(-1)
        sidx = np.broadcast_to(grp.slack_idx, (Ng, r)).reshape(-1)

        def emit(rows, off, lo, hi, slack_col, sign):
            s_cols = jnp.zeros((rows.shape[0], n_soft), dtype)
            if slack_col is not None:
                s_cols = s_cols.at[np.arange(rows.shape[0]), slack_col].set(sign)
            A_rows.append(jnp.concatenate([rows, s_cols], axis=1))
            lbA_rows.append(lo - off)
            ubA_rows.append(hi - off)

        hard = sidx < 0
        if np.all(hard):
            emit(rows_u, offset, jnp.asarray(lb_g, dtype),
                 jnp.asarray(ub_g, dtype), None, 0.0)
        else:
            assert not np.any(hard), "mix of hard/soft rows within a group"
            inf_vec = jnp.full((len(lb_g),), jnp.inf, dtype)
            if np.all(np.isfinite(lb_g)):
                # lower side softened: g + sigma >= lb
                emit(rows_u, offset, jnp.asarray(lb_g, dtype), inf_vec,
                     sidx, +1.0)
            if np.all(np.isfinite(ub_g)):
                # upper side softened: g - sigma <= ub
                emit(rows_u, offset, -inf_vec, jnp.asarray(ub_g, dtype),
                     sidx, -1.0)

    A = jnp.concatenate(A_rows, axis=0)
    lbA = jnp.concatenate(lbA_rows)
    ubA = jnp.concatenate(ubA_rows)
    return H, g, A, lb_v, ub_v, lbA, ubA, const


def build_stage_rows(groups, N, nx, nu, n_soft, dtype):
    """Emit stage-aligned constraint groups as per-stage row arrays.

    Returns (C (N, r, nx), D (N, r, nu), Ws (N, r, ns), lbA (N, r),
    ubA (N, r)) with rows  lbA <= C x_{k+1} + D u_k + Ws sigma <= ubA --
    the reference's constraint semantics on ABSOLUTE states
    (``dynamic_state_constraints.m``), i.e. the group's linearisation
    constant is folded into the bounds, not into a predicted-state offset.
    Soft two-sided groups emit separate lower(+sigma)/upper(-sigma) rows,
    matching the dense assembly's convention.  Requires every group to be
    stage-aligned (``state_rows == ctrl_cols == arange(N)``), which holds
    for all LTV controllers.
    """
    C_parts, D_parts, Ws_parts, lo_parts, hi_parts = [], [], [], [], []

    def emit(C, D, off, lo, hi, slack_col, sign):
        rr = C.shape[1]
        Ws = np.zeros((rr, n_soft), np.float64)
        if slack_col is not None:
            Ws[np.arange(rr), slack_col] = sign
        C_parts.append(C)
        D_parts.append(D)
        Ws_parts.append(jnp.broadcast_to(jnp.asarray(Ws, dtype),
                                         (N, rr, n_soft)))
        lo_parts.append(jnp.asarray(lo, dtype)[None, :] - off)
        hi_parts.append(jnp.asarray(hi, dtype)[None, :] - off)

    for grp in groups:
        Ng, rr, _ = grp.C.shape
        if (Ng != N or not np.array_equal(grp.state_rows, np.arange(N))
                or not np.array_equal(grp.ctrl_cols, np.arange(N))):
            raise ValueError("stage-QP assembly requires stage-aligned "
                             "groups")
        lb_g = np.broadcast_to(grp.lb, (rr,))
        ub_g = np.broadcast_to(grp.ub, (rr,))
        sidx = np.broadcast_to(grp.slack_idx, (rr,))
        hard = sidx < 0
        if np.all(hard):
            emit(grp.C, grp.D, grp.offset_const, lb_g, ub_g, None, 0.0)
        else:
            assert not np.any(hard), "mix of hard/soft rows within a group"
            inf_v = np.full((rr,), np.inf)
            if np.all(np.isfinite(lb_g)):
                emit(grp.C, grp.D, grp.offset_const, lb_g, inf_v, sidx,
                     +1.0)
            if np.all(np.isfinite(ub_g)):
                emit(grp.C, grp.D, grp.offset_const, -inf_v, ub_g, sidx,
                     -1.0)

    return (jnp.concatenate(C_parts, axis=1),
            jnp.concatenate(D_parts, axis=1),
            jnp.concatenate(Ws_parts, axis=1),
            jnp.concatenate(lo_parts, axis=1),
            jnp.concatenate(hi_parts, axis=1))


def _stage_cost(x_ref, q, r_ab, mpc, N, dtype):
    """Per-stage diagonal costs matching the condensed assembly
    (``generate_qp.m:29-31`` semantics): Qx = 2 q_k, qx = -2 q_k xref_k,
    Ru = 2 R.  Returns (Qx, qx, Ru, const) with ``const`` the dropped
    constant sum_k xref' q_k xref."""
    q_stage = jnp.concatenate(
        [jnp.tile(q[None], (N - 1, 1)),
         (q * mpc.q_terminal_scale)[None]], axis=0)            # (N, nx)
    Qx = 2.0 * q_stage
    qx = -2.0 * q_stage * x_ref
    Ru = jnp.tile(2.0 * r_ab[None], (N, 1))
    const = jnp.sum(q_stage * x_ref * x_ref)
    return Qx, qx, Ru, const


def build_stage_qp(x0, x_ref, q, r_ab, r_soft: Sequence[float], groups,
                   mpc: MPCParams, Ad, Bd, dd, u_lb, u_ub):
    """Assemble a :class:`ops.riccati.StageQP` from the discrete
    linearisation + stage-aligned constraint groups.  Same minimiser as
    the condensed dense QP of :func:`assemble_condensed_qp` (checked to
    solver precision in tests/test_riccati.py), but no B_bar or dense
    (N*r, N*nu) A is ever formed."""
    N, nx, nu = Bd.shape
    n_soft = len(r_soft)
    dtype = Bd.dtype
    Qx, qx, Ru, const = _stage_cost(x_ref, q, r_ab, mpc, N, dtype)
    C, D, Ws, lbA, ubA = build_stage_rows(groups, N, nx, nu, n_soft, dtype)
    qp = riccati.StageQP(
        Ad=Ad, Bd=Bd, dd=dd, x0=x0, Qx=Qx, qx=qx, Ru=Ru,
        ru=jnp.zeros((N, nu), dtype), g_s=jnp.asarray(r_soft, dtype),
        C=C, D=D, Ws=Ws, lbA=lbA, ubA=ubA,
        u_lb=u_lb, u_ub=u_ub,
        s_lb=jnp.zeros((n_soft,), dtype),
        s_ub=jnp.full((n_soft,), jnp.inf, dtype))
    return qp, const


def _control_bounds(mpc: MPCParams, N, dtype):
    u_lb = jnp.tile(jnp.asarray([-mpc.a_max, -mpc.delta_d_max], dtype), (N, 1))
    u_ub = jnp.tile(jnp.asarray([mpc.a_max, mpc.delta_d_max], dtype), (N, 1))
    return u_lb, u_ub


def _kinematic_groups(x_lin, u_lin, mpc, params):
    return [
        cons.state_box_group([3, 4],
                             np.array([0.0, -mpc.delta_max]),
                             np.array([np.inf, mpc.delta_max]),
                             np.array([-1, -1]), x_lin, u_lin),
        cons.state_box_group([1], np.array([-mpc.n_max]),
                             np.array([mpc.n_max]), np.array([0]),
                             x_lin, u_lin),
        cons.kinematic_tyre_group(x_lin, u_lin, mpc, params, slack=0),
    ]


def ltv_mpc_kinematic(x0, x_ref, track, params: VehicleParams,
                      mpc: MPCParams, x_lin, u_lin,
                      opts: ipm.IpmOptions = ipm.IpmOptions(),
                      stepper: str = "rk2", warm=None,
                      condense: str | None = None,
                      backend: str = "dense") -> LtvResult:
    """Kinematic-model LTV-MPC tick.

    (``mpc/ltv/kinematic/ltvmpc_kinetmatic_curvilinear.m``: RK2 linearizer,
    weights Q=[5,250,2000,0,0], one track slack with weight 1e8, lateral
    -accel proxy constraint.)  ``x_ref``: (N, 5) time-major.

    ``backend="riccati"`` solves the same QP in its uncondensed stage-wise
    form (``ops/riccati.py``) -- no condensing, no dense constraint
    matrix.  ``warm`` must then be a :class:`ops.riccati.StageIpmResult`.
    """
    N = mpc.n_steps
    dtype = x_lin.dtype
    f = lambda x, u: cm.f_curv_kin(x, u, track, params)
    step = lambda x, u: integrators.STEPPERS[stepper](f, x, u, mpc.dt)

    Ad, Bd, dd = integrators.linearize_discrete(step, x_lin, u_lin)
    q = jnp.asarray([mpc.q_s, mpc.q_n, mpc.q_mu, 0.0, 0.0], dtype)
    r_ab = jnp.asarray([mpc.r_a, mpc.r_delta_d], dtype)
    groups = _kinematic_groups(x_lin, u_lin, mpc, params)
    u_lb, u_ub = _control_bounds(mpc, N, dtype)

    if backend == "riccati":
        qp, const = build_stage_qp(x0, x_ref, q, r_ab, [mpc.w_track],
                                   groups, mpc, Ad, Bd, dd, u_lb, u_ub)
        res = riccati.solve_stage_qp(qp, opts, warm=warm)
        return LtvResult(u_opt=res.u, x_opt=res.x, slack=res.s,
                         fval=res.objective + const, qp=res)

    A_bar, B_bar, d_bar = CONDENSERS[condense or DEFAULT_CONDENSE](Ad, Bd, dd)
    q_diag = jnp.concatenate([jnp.tile(q, N - 1), q * mpc.q_terminal_scale])
    r_diag = jnp.tile(r_ab, N)

    H, g, A, lb, ub, lbA, ubA, const = assemble_condensed_qp(
        A_bar, B_bar, d_bar, x0, x_ref, q_diag, r_diag, [mpc.w_track],
        groups, u_lb, u_ub)

    res = ipm.solve_qp(H, g, A, lb, ub, lbA, ubA, opts, warm=warm)
    u_flat = res.x[:N * 2]
    u_opt = u_flat.reshape(N, 2)
    x_opt = _rollout(Ad, Bd, dd, x0, u_opt)
    return LtvResult(u_opt=u_opt, x_opt=x_opt, slack=res.x[N * 2:],
                     fval=res.objective + const, qp=res)


def _dynamic_groups(x_lin, u_lin, mpc, params):
    return [
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


def build_stage_qp_dynamic(x0, x_ref, track, params: VehicleParams,
                           mpc: MPCParams, x_lin, u_lin,
                           stepper: str = "rk4"):
    """Assemble the dynamic-model LTV tick as an uncondensed
    :class:`ops.riccati.StageQP` (same minimiser as
    :func:`build_qp_dynamic`'s condensed QP).  Returns (qp, const)."""
    dtype = x_lin.dtype
    f = lambda x, u: cm.f_curv_dyn_only(x, u, track, params)
    step = lambda x, u: integrators.STEPPERS[stepper](f, x, u, mpc.dt)
    Ad, Bd, dd = integrators.linearize_discrete(step, x_lin, u_lin)
    q = jnp.asarray([mpc.q_s, mpc.q_n, mpc.q_mu, 0.0, 0.0, 0.0, 0.0], dtype)
    r_ab = jnp.asarray([mpc.r_a, mpc.r_delta_d], dtype)
    groups = _dynamic_groups(x_lin, u_lin, mpc, params)
    u_lb, u_ub = _control_bounds(mpc, mpc.n_steps, dtype)
    r_soft = [mpc.w_track, mpc.w_slip, mpc.w_slip, mpc.w_tyre]
    return build_stage_qp(x0, x_ref, q, r_ab, r_soft, groups, mpc,
                          Ad, Bd, dd, u_lb, u_ub)


def ltv_mpc_dynamic_riccati(x0, x_ref, track, params: VehicleParams,
                            mpc: MPCParams, x_lin, u_lin,
                            opts: ipm.IpmOptions = ipm.IpmOptions(),
                            stepper: str = "rk4", warm=None) -> LtvResult:
    """Dynamic-model LTV-MPC tick on the stage-wise Riccati backend.

    Solves the SAME QP as :func:`ltv_mpc_dynamic` (checked to solver
    precision, tests/test_riccati.py) without ever materialising B_bar or
    the (800, 84) constraint matrix -- the structural escape from the
    dense path's measured HBM roofline (PROFILE_r03.json).  ``warm`` is a
    :class:`ops.riccati.StageIpmResult` from a previous tick.
    """
    qp, const = build_stage_qp_dynamic(x0, x_ref, track, params, mpc,
                                       x_lin, u_lin, stepper)
    res = riccati.solve_stage_qp(qp, opts, warm=warm)
    return LtvResult(u_opt=res.u, x_opt=res.x, slack=res.s,
                     fval=res.objective + const, qp=res)


def build_qp_dynamic(x0, x_ref, track, params: VehicleParams,
                     mpc: MPCParams, x_lin, u_lin, stepper: str = "rk4",
                     structured: bool = False, condense: str | None = None):
    """Assemble the dynamic-model LTV QP for one tick.

    Returns ``((H, g, A, lb, ub, lbA, ubA, const), (Ad, Bd, dd))`` -- the
    condensed QP plus the discrete linearisation (needed to recover the
    predicted states from the control solution).  ``structured="gen"``
    returns A as an :class:`ops.structured.GenRows` (generator-factored;
    wins for the F32_ACCURATE preset, loses for the throughput presets
    -- AB_STRUCTURED.json / PERF_VARIANTS.json -- so off by default).
    """
    N = mpc.n_steps
    dtype = x_lin.dtype
    f = lambda x, u: cm.f_curv_dyn_only(x, u, track, params)
    step = lambda x, u: integrators.STEPPERS[stepper](f, x, u, mpc.dt)

    Ad, Bd, dd = integrators.linearize_discrete(step, x_lin, u_lin)
    A_bar, B_bar, d_bar = CONDENSERS[condense or DEFAULT_CONDENSE](Ad, Bd, dd)

    q = jnp.asarray([mpc.q_s, mpc.q_n, mpc.q_mu, 0.0, 0.0, 0.0, 0.0], dtype)
    q_diag = jnp.concatenate([jnp.tile(q, N - 1), q * mpc.q_terminal_scale])
    r_diag = jnp.tile(jnp.asarray([mpc.r_a, mpc.r_delta_d], dtype), N)

    groups = _dynamic_groups(x_lin, u_lin, mpc, params)
    u_lb, u_ub = _control_bounds(mpc, N, dtype)

    r_soft = [mpc.w_track, mpc.w_slip, mpc.w_slip, mpc.w_tyre]
    if structured == "gen":
        qp = assemble_gen_dynamic(
            A_bar, B_bar, d_bar, x0, x_ref, q_diag, r_diag, r_soft,
            track, params, mpc, x_lin, u_lin, u_lb, u_ub)
    else:
        if structured:
            raise ValueError(
                "the StageRows structured path was retired in round 4 "
                "(lost at every measured operating point); use "
                "structured='gen' or the dense default")
        qp = assemble_condensed_qp(
            A_bar, B_bar, d_bar, x0, x_ref, q_diag, r_diag, r_soft,
            groups, u_lb, u_ub)
    return qp, (Ad, Bd, dd)


def ltv_mpc_dynamic(x0, x_ref, track, params: VehicleParams,
                    mpc: MPCParams, x_lin, u_lin,
                    opts: ipm.IpmOptions = ipm.IpmOptions(),
                    stepper: str = "rk4", warm=None,
                    structured: bool = False,
                    condense: str | None = None,
                    backend: str = "dense") -> LtvResult:
    """Dynamic-model LTV-MPC tick.

    (``mpc/ltv/dynamic/ltvmpc_dynamic_curvilinear.m``: RK4 linearizer, four
    slacks weighted [1e8, 1e6, 1e6, 1e4] for track / rear-slip / front-slip
    / friction-polygon softening.)  ``x_ref``: (N, 7) time-major.

    ``structured="gen"`` keeps the 800 constraint rows in the
    generator-factored representation through the IPM (same solution:
    tests/test_structured.py checks dense-vs-structured solve equality);
    it wins only for the F32_ACCURATE preset (AB_STRUCTURED.json /
    PERF_VARIANTS.json), so dense is the default.  The retired round-3
    StageRows path (``structured=True``) now raises ValueError.  Note the
    structured dual vector (``res.qp.z_rows``) is ordered stage-major, so
    warm starts must come from a same-layout solve.
    """
    if backend == "riccati":
        return ltv_mpc_dynamic_riccati(x0, x_ref, track, params, mpc,
                                       x_lin, u_lin, opts, stepper, warm)
    N = mpc.n_steps
    (H, g, A, lb, ub, lbA, ubA, const), (Ad, Bd, dd) = build_qp_dynamic(
        x0, x_ref, track, params, mpc, x_lin, u_lin, stepper,
        structured=structured, condense=condense)

    res = ipm.solve_qp(H, g, A, lb, ub, lbA, ubA, opts, warm=warm)
    u_flat = res.x[:N * 2]
    u_opt = u_flat.reshape(N, 2)
    x_opt = _rollout(Ad, Bd, dd, x0, u_opt)
    return LtvResult(u_opt=u_opt, x_opt=x_opt, slack=res.x[N * 2:],
                     fval=res.objective + const, qp=res)
