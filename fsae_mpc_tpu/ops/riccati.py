"""Stage-wise block-Riccati primal-dual interior-point QP solver.

The condensed dense IPM (``ops/ipm.py``) is measured at ~97% of the HBM
roofline on the chip (PROFILE_r03.json: 52.9 ms speed-of-light vs 54.3 ms
actual for the 12-iteration solve): its per-iteration cost is dominated by
streaming the (800, 84) constraint matrix and the (84, 84) KKT factor
through HBM several times.  This solver keeps the QP in its *uncondensed*
stage-wise form -- the structure the reference's qpOASES backend receives
implicitly through the condensed matrices (``optimizers/matlab/qpOASES/
qpOASES.m:20-37``) -- and factors the Newton KKT system with a backward
block-Riccati sweep over the horizon:

    variables   u_k (nu), x_{k+1} (nx) for k = 0..N-1, global slacks sigma
    dynamics    x_{k+1} = Ad_k x_k + Bd_k u_k + dd_k          (equalities)
    rows        lbA_k <= C_k x_{k+1} + D_k u_k + Ws_k sigma <= ubA_k
    bounds      u_lb <= u <= u_ub,  sigma >= 0

Per IPM iteration the only dense objects ever touched are the per-stage
blocks: (nx, nx) transition/cost, (r, nx)/(r, nu) row gradients, and tiny
(nu, nu) factors -- neither the condensed B_bar (N*nx, N*nu) nor the dense
(N*r, N*nu) constraint matrix exists at any point.  HBM traffic per
iteration drops from ~1 MB/instance (dense path) to ~0.1 MB/instance; the
arithmetic is small-matrix batched work that rides the VPU lanes under
``vmap`` (and the fused Pallas kernel in ``ops/pallas/riccati.py``).

The four global soft-constraint slacks couple every stage; they are
eliminated with a Schur complement: the Riccati factorisation is applied to
ns extra column right-hand-sides once per iteration, giving the (ns, ns)
Schur system for d_sigma.

Numerics mirror ``ops.ipm.solve_qp`` (same Mehrotra predictor-corrector,
power-of-two objective/row scalings, masked infinite sides, complementarity
capping, NaN rejection with inertia escalation, convergence freeze and
best-iterate tracking), so the two backends are drop-in alternatives and
cross-check each other (tests/test_riccati.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

from .ipm import IpmOptions, _pow2
from .pallas import riccati as priccati
from .precision import highest as _highest_precision


# ---------------------------------------------------------------------------
# problem / result containers
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class StageQP:
    """One stage-wise QP instance (vmap for batches).

    Objective  sum_k [ 0.5 x_{k+1}' diag(Qx_k) x_{k+1} + qx_k' x_{k+1}
                       + 0.5 u_k' diag(Ru_k) u_k + ru_k' u_k ] + g_s' sigma
    """

    Ad: Any        # (N, nx, nx)   discrete transition
    Bd: Any        # (N, nx, nu)   discrete input map
    dd: Any        # (N, nx)       affine offset
    x0: Any        # (nx,)         fixed initial state
    Qx: Any        # (N, nx)       diagonal state cost (on x_{k+1})
    qx: Any        # (N, nx)       linear state cost
    Ru: Any        # (N, nu)       diagonal control cost
    ru: Any        # (N, nu)       linear control cost
    g_s: Any       # (ns,)         linear slack cost
    C: Any         # (N, r, nx)    row gradients wrt x_{k+1}
    D: Any         # (N, r, nu)    row gradients wrt u_k
    Ws: Any        # (N, r, ns)    row slack coefficients
    lbA: Any       # (N, r)        row lower bounds (-inf = absent)
    ubA: Any       # (N, r)        row upper bounds (+inf = absent)
    u_lb: Any      # (N, nu)
    u_ub: Any      # (N, nu)
    s_lb: Any      # (ns,)
    s_ub: Any      # (ns,)


jax.tree_util.register_dataclass(
    StageQP,
    data_fields=["Ad", "Bd", "dd", "x0", "Qx", "qx", "Ru", "ru", "g_s",
                 "C", "D", "Ws", "lbA", "ubA", "u_lb", "u_ub", "s_lb",
                 "s_ub"],
    meta_fields=[])


@dataclasses.dataclass(frozen=True)
class StageIpmResult:
    u: Any         # (N, nu)
    x: Any         # (N, nx)  optimal x_1..x_N
    s: Any         # (ns,)
    lam: Any       # (N, nx)  equality multipliers (unscaled)
    z_u: Any       # (N, nu)  combined control-bound dual (z_l - z_u)
    z_s: Any       # (ns,)    combined slack-bound dual
    z_rows: Any    # (N, r)   combined row dual (z_l - z_u)
    iterations: Any
    mu: Any
    primal_res: Any
    dual_res: Any
    objective: Any


jax.tree_util.register_dataclass(
    StageIpmResult,
    data_fields=["u", "x", "s", "lam", "z_u", "z_s", "z_rows", "iterations",
                 "mu", "primal_res", "dual_res", "objective"],
    meta_fields=[])


# ---------------------------------------------------------------------------
# tiny SPD helpers (static n, unrolled -- no LAPACK custom calls on TPU)
# ---------------------------------------------------------------------------


def _spd_inv_small(A):
    """Inverse of a tiny SPD matrix; closed form for n=2, unrolled
    Cholesky otherwise.  Non-positive pivots poison the result with NaN
    (picked up by the solver's finite-iterate rejection)."""
    n = A.shape[-1]
    if n == 2:
        a, b, c = A[0, 0], A[0, 1], A[1, 1]
        det = a * c - b * b
        det = jnp.where((det > 0) & (a > 0), det, jnp.nan)
        return jnp.array([[c, -b], [-b, a]], A.dtype) / det
    L = _chol_small(A)
    return _cho_solve_small(L, jnp.eye(n, dtype=A.dtype))


def _chol_small(A):
    """Unrolled Cholesky for static tiny n."""
    n = A.shape[-1]
    rows = [[None] * n for _ in range(n)]
    for j in range(n):
        c = A[j, j] - sum((rows[j][k] * rows[j][k] for k in range(j)),
                          start=jnp.zeros((), A.dtype))
        piv = jnp.where(c > 0, c, jnp.nan)
        d = lax.rsqrt(piv)
        rows[j][j] = c * d
        for i in range(j + 1, n):
            s = A[i, j] - sum((rows[i][k] * rows[j][k] for k in range(j)),
                              start=jnp.zeros((), A.dtype))
            rows[i][j] = s * d
    return jnp.stack([jnp.stack([rows[i][j] if j <= i else
                                 jnp.zeros((), A.dtype)
                                 for j in range(n)]) for i in range(n)])


def _cho_solve_small(L, B):
    """Solve L L' X = B, unrolled; B: (n,) or (n, m)."""
    n = L.shape[-1]
    vec = B.ndim == 1
    if vec:
        B = B[:, None]
    ys = []
    for j in range(n):
        acc = B[j]
        for k in range(j):
            acc = acc - L[j, k] * ys[k]
        ys.append(acc / L[j, j])
    xs = [None] * n
    for j in reversed(range(n)):
        acc = ys[j]
        for k in range(j + 1, n):
            acc = acc - L[k, j] * xs[k]
        xs[j] = acc / L[j, j]
    X = jnp.stack(xs)
    return X[:, 0] if vec else X


# ---------------------------------------------------------------------------
# Riccati factor / apply
# ---------------------------------------------------------------------------


def _factor_scan(Ad, Bd, Qb, Rb, M):
    """Backward block-Riccati factorisation of the equality-constrained
    Newton KKT system with stage quadratics on the (x_{k+1}, u_k) pair:

        0.5 x'Qb_k x + x'M_k u + 0.5 u'Rb_k u,   x_{k+1} = Ad x_k + Bd u + d

    Returns per-stage (Huinv (N,nu,nu), G (N,nu,nx), W (N,nx,nx)) with
        W_k    = Qb_k + P_{k+1}
        Hu_k   = Rb_k + B'W B + B'M + M'B
        G_k    = (B'W + M') A
        P_k    = A'W A - G' Huinv G        (P_N = 0)
    """
    nx = Ad.shape[-1]
    dtype = Ad.dtype

    def bwd(P, stage):
        A, B, Qbk, Rbk, Mk = stage
        W = Qbk + P
        WB = W @ B                                    # (nx, nu)
        Hu = Rbk + B.T @ WB + B.T @ Mk + Mk.T @ B
        Huinv = _spd_inv_small(Hu)
        G = (WB + Mk).T @ A                           # (nu, nx)
        WA = W @ A
        P_new = A.T @ WA - G.T @ (Huinv @ G)
        P_new = 0.5 * (P_new + P_new.T)
        return P_new, (Huinv, G, W)

    P0 = jnp.zeros((nx, nx), dtype)
    _, fac = lax.scan(bwd, P0, (Ad, Bd, Qb, Rb, M), reverse=True)
    return fac


def _apply_scan(fac, Ad, Bd, M, rx, ru, re):
    """Solve the factored KKT system for multiple right-hand sides.

    ``rx`` (K, N, nx): stationarity rhs on x_{k+1}; ``ru`` (K, N, nu):
    stationarity rhs on u_k; ``re`` (K, N, nx): equality rhs (the Newton
    step satisfies dx_{k+1} = Ad dx_k + Bd du_k + re_k with dx_0 = 0).

    Returns (du (K, N, nu), dx (K, N, nx), dlam (K, N, nx)).
    """
    Huinv, G, W = fac
    K = rx.shape[0]
    nx = Ad.shape[-1]
    dtype = Ad.dtype

    def bwd(p, stage):
        A, B, Mk, Huik, Gk, Wk, rxk, ruk, rek = stage
        w = rxk + p                                   # (K, nx)
        Wd = rek @ Wk.T                               # (K, nx)
        h = (Wd - w) @ B + rek @ Mk - ruk             # (K, nu)
        Kg = Huik @ Gk                                # (nu, nx)
        p_new = h @ Kg + (w - Wd) @ A
        return p_new, (h, w)

    p0 = jnp.zeros((K, nx), dtype)
    _, (h_all, w_all) = lax.scan(
        bwd, p0, (Ad, Bd, M, Huinv, G, W, jnp.swapaxes(rx, 0, 1),
                  jnp.swapaxes(ru, 0, 1), jnp.swapaxes(re, 0, 1)),
        reverse=True)

    def fwd(dx, stage):
        A, B, Mk, Huik, Gk, Wk, hk, wk, rek = stage
        du = -(dx @ Gk.T + hk) @ Huik.T               # (K, nu)
        dx_new = dx @ A.T + du @ B.T + rek
        dlam = dx_new @ Wk.T + du @ Mk.T - wk
        return dx_new, (du, dx_new, dlam)

    dx0 = jnp.zeros((K, nx), dtype)
    _, (du, dx, dlam) = lax.scan(
        fwd, dx0, (Ad, Bd, M, Huinv, G, W, h_all, w_all,
                   jnp.swapaxes(re, 0, 1)))
    return (jnp.swapaxes(du, 0, 1), jnp.swapaxes(dx, 0, 1),
            jnp.swapaxes(dlam, 0, 1))


@jax.custom_batching.custom_vmap
def riccati_factor(Ad, Bd, Qb, Rb, M):
    """Riccati factorisation (see :func:`_factor_scan`).  Per-instance
    calls run the lax.scan sweep; under ``vmap`` on TPU/f32 the whole
    sweep runs as one fused batch-in-lanes Pallas kernel
    (``ops/pallas/riccati.py``)."""
    return _factor_scan(Ad, Bd, Qb, Rb, M)


@riccati_factor.def_vmap
def _riccati_factor_vmap(axis_size, in_batched, Ad, Bd, Qb, Rb, M):
    args = []
    for batched, a in zip(in_batched, (Ad, Bd, Qb, Rb, M)):
        if not batched:
            a = jnp.broadcast_to(a[None], (axis_size,) + a.shape)
        args.append(a)
    if priccati.use_kernel(args[0], args[1]):
        out = priccati.factor_lanes(*args)
    else:
        out = jax.vmap(_factor_scan)(*args)
    return out, (True, True, True)


@jax.custom_batching.custom_vmap
def _riccati_apply_flat(Huinv, G, W, Ad, Bd, M, rx, ru, re):
    return _apply_scan((Huinv, G, W), Ad, Bd, M, rx, ru, re)


@_riccati_apply_flat.def_vmap
def _riccati_apply_vmap(axis_size, in_batched, *args):
    args = list(args)
    for i, batched in enumerate(in_batched):
        if not batched:
            args[i] = jnp.broadcast_to(args[i][None],
                                       (axis_size,) + args[i].shape)
    if priccati.use_kernel(args[3], args[4]):
        out = priccati.apply_lanes(*args)
    else:
        out = jax.vmap(lambda hu, g, w, ad, bd, m, rx, ru, re:
                       _apply_scan((hu, g, w), ad, bd, m, rx, ru, re))(
                           *args)
    return out, (True, True, True)


def riccati_apply(fac, Ad, Bd, M, rx, ru, re):
    """Riccati substitution (see :func:`_apply_scan`); fused Pallas
    sweeps under ``vmap`` on TPU/f32."""
    Huinv, G, W = fac
    return _riccati_apply_flat(Huinv, G, W, Ad, Bd, M, rx, ru, re)


def _assemble_factor_scan(C, D, Ws, D_r, qb_diag, rb_diag, Ad, Bd):
    Xq = jnp.einsum("nri,nr,nrj->nij", C, D_r, C)
    Uq = jnp.einsum("nrk,nr,nrl->nkl", D, D_r, D)
    Mq = jnp.einsum("nri,nr,nrk->nik", C, D_r, D)
    Qb = Xq + jax.vmap(jnp.diag)(qb_diag)
    Rb = Uq + jax.vmap(jnp.diag)(rb_diag)
    Huinv, G, W = _factor_scan(Ad, Bd, Qb, Rb, Mq)
    Lx = jnp.einsum("nri,nr,nrj->nij", C, D_r, Ws)
    Lu = jnp.einsum("nrk,nr,nrj->nkj", D, D_r, Ws)
    Hss = jnp.einsum("nri,nr,nrj->nij", Ws, D_r, Ws)     # per-stage
    return Huinv, G, W, Mq, Lx, Lu, Hss


@jax.custom_batching.custom_vmap
def assemble_factor(C, D, Ws, D_r, qb_diag, rb_diag, Ad, Bd):
    """Quadform assembly + Riccati factorisation in one step.

    Builds Qb = diag(qb_diag) + C'diag(D_r)C, Rb = diag(rb_diag) +
    D'diag(D_r)D, Mq = C'diag(D_r)D, factors, and returns the sigma
    couplings (Lx, Lu, per-stage Hss) alongside.  Under ``vmap`` on
    TPU/f32 the whole thing is ONE fused Pallas sweep that reads the row
    data exactly once (the XLA einsum assembly measured 15-45x over its
    HBM speed-of-light -- tiny batched matmuls)."""
    return _assemble_factor_scan(C, D, Ws, D_r, qb_diag, rb_diag, Ad, Bd)


@assemble_factor.def_vmap
def _assemble_factor_vmap(axis_size, in_batched, *args):
    args = list(args)
    for i, batched in enumerate(in_batched):
        if not batched:
            args[i] = jnp.broadcast_to(args[i][None],
                                       (axis_size,) + args[i].shape)
    if priccati.use_kernel(args[7], args[7]) and args[2].shape[-1] > 0:
        out = priccati.assemble_factor_lanes(*args)
    else:
        out = jax.vmap(_assemble_factor_scan)(*args)
    return out, (True,) * 7


# ---------------------------------------------------------------------------
# the solver
# ---------------------------------------------------------------------------


# Complementarity-diagonal caps, kept EQUAL to the dense solver's
# (1e14/1e7 for f64/f32).  The Riccati recursion subtracts near-equal
# cap-scale terms (P = A'WA - G'Huinv G), so its cancellation error is
# ~cap * eps -- but a measured sweep of the f32 cap over 1e4..1e20 moved
# neither the cold-QP stall nor the warm-chain accuracy (round-4
# investigation), so the caps stay at the dense values; the f32 accuracy
# recovery comes from the delta-form restart below instead.
D_CAP_F64 = 1e14
D_CAP_F32 = 1e7
TRACE = False    # debug: per-iteration prints via jax.debug.print


def _mask_side(val):
    finite = jnp.isfinite(val)
    return finite, jnp.where(finite, val, 0.0)


def _rollout_scan(Ad, Bd, dd, x0, u):
    """x_{k+1} = Ad_k x_k + Bd_k u_k + dd_k rollout -> (N, nx)."""
    def roll(xk, stage):
        A, B, d, uk = stage
        xn = A @ xk + B @ uk + d
        return xn, xn

    _, xs = lax.scan(roll, x0, (Ad, Bd, dd, u))
    return xs


# IpmOptions fields with no stage-wise analogue: they compensate for the
# condensed Hessian's conditioning, which the stage-wise KKT system never
# forms.  Setting any of them non-default with backend="riccati" is a
# configuration error and fails loudly (a preset/backend mismatch would
# otherwise silently change accuracy).
_UNSUPPORTED_STAGE_OPTS = ("polish", "scale_kkt", "comp_resid",
                           "correctors", "var_scale")


def _check_stage_opts(opts: IpmOptions) -> None:
    defaults = IpmOptions()
    bad = [f for f in _UNSUPPORTED_STAGE_OPTS
           if getattr(opts, f) != getattr(defaults, f)]
    if bad:
        raise ValueError(
            f"IpmOptions fields {bad} are condensed-only and have no "
            "effect in the stage-wise Riccati solver; clear them (the "
            "supported accuracy refinement here is refine_restart)")


def _delta_stage_qp(qp: StageQP, res: StageIpmResult) -> StageQP:
    """Restate ``qp`` in DELTA FORM about the incumbent ``res``.

    The delta problem's variables are (du, dx, ds) with du = u - u_bar
    etc.; its data is the residual of the incumbent, evaluated with
    error-free transforms (``ops.precision``, ~48-bit):

      * dynamics offset  dd <- Ad x_prev + Bd u_bar + dd - x_bar
        (the incumbent's equality residual; dx_0 = 0),
      * row bounds shifted by the compensated row values
        y_bar = C x_bar + D u_bar + Ws s_bar,
      * cost gradients re-anchored:  qx <- qx + Qx x_bar,
        ru <- ru + Ru u_bar (g_s is constant -- the slack cost is linear),
      * variable bounds shifted (exact by Sterbenz for near-active sides).

    At the incumbent the shifted data is SMALL, so the second solve works
    at full f32 relative precision where the first solve's global
    objective scale (the 1e8 soft weights divide Ru down to ~1e-7 scaled)
    had pushed the control curvature below f32 gradient noise.
    """
    from .precision import fma_add, residual_affine

    N, r, nx = qp.C.shape
    ns = qp.g_s.shape[0]
    dtype = qp.Ad.dtype
    u, x, s = res.u, res.x, res.s

    def stage_y(C_k, D_k, Ws_k, x_k, u_k):
        h1, l1 = residual_affine(C_k, x_k, jnp.zeros((r,), dtype))
        h2, l2 = residual_affine(D_k, u_k, h1)
        if ns:
            h2, l3 = residual_affine(Ws_k, s, h2)
            l2 = l2 + l3
        return h2, l1 + l2

    y_hi, y_lo = jax.vmap(stage_y)(qp.C, qp.D, qp.Ws, x, u)
    lbA_d = (qp.lbA - y_hi) - y_lo
    ubA_d = (qp.ubA - y_hi) - y_lo

    x_prev = jnp.concatenate([qp.x0[None], x[:-1]], axis=0)

    def stage_eq(Ad_k, Bd_k, dd_k, xp_k, u_k, x_k):
        h1, l1 = residual_affine(Ad_k, xp_k, dd_k)
        h2, l2 = residual_affine(Bd_k, u_k, h1)
        return (h2 - x_k) + (l1 + l2)

    dd_d = jax.vmap(stage_eq)(qp.Ad, qp.Bd, qp.dd, x_prev, u, x)

    return dataclasses.replace(
        qp,
        dd=dd_d, x0=jnp.zeros_like(qp.x0),
        qx=fma_add(qp.Qx, x, qp.qx),
        ru=fma_add(qp.Ru, u, qp.ru),
        lbA=lbA_d, ubA=ubA_d,
        u_lb=qp.u_lb - u, u_ub=qp.u_ub - u,
        s_lb=qp.s_lb - s, s_ub=qp.s_ub - s)


@_highest_precision
def solve_stage_qp(qp: StageQP, opts: IpmOptions = IpmOptions(),
                   warm: "StageIpmResult | None" = None) -> StageIpmResult:
    """Solve one stage-wise QP instance (vmap for batches).

    Supports the core of :class:`ops.ipm.IpmOptions`: max_iters / tol /
    tau / reg / adaptive / freeze / equilibrate / init ("centered" |
    "basic") / mu0 / warm_duals / warm_mu0 / warm_floor, plus
    ``refine_restart``: after the main solve, ``refine_restart`` rounds
    re-solve the problem in delta form about the incumbent
    (:func:`_delta_stage_qp`) with the incumbent's duals reused -- the
    stage-wise port of the dense solver's delta-form restart, the one
    ingredient measured to move f32 control accuracy (PRESET_MAP.json).
    The condensed-only refinements (polish, var_scale, scale_kkt,
    comp_resid, correctors) raise ValueError when set.

    The soft-slack VARIABLES are rescaled (power-of-two, roundoff-free)
    so the 1e8 slack gradient no longer sets the global objective scale:
    without this the internal c_scale divides the control curvature Ru
    down to ~1e-7 scaled -- below f32 gradient noise -- which was the
    measured driver of the cold-QP accuracy stall (first-control max
    0.047 -> 0.014 with the restart preset, round-5 probe).  All result
    fields are reported in original units except the residuals, which
    (like the dense solver's var_scale) are measured on the transformed
    problem.
    """
    _check_stage_opts(opts)
    ns = qp.g_s.shape[0]
    if ns:
        gx = jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(qp.Qx)), jnp.max(jnp.abs(qp.qx))),
            jnp.maximum(jnp.max(jnp.abs(qp.Ru)), 1.0))
        ss = jnp.minimum(_pow2(gx / jnp.maximum(jnp.max(jnp.abs(qp.g_s)),
                                                1.0)),
                         1.0).astype(qp.g_s.dtype)
        qp = dataclasses.replace(qp, g_s=qp.g_s * ss, Ws=qp.Ws * ss,
                                 s_lb=qp.s_lb / ss, s_ub=qp.s_ub / ss)
        if warm is not None:
            warm = dataclasses.replace(warm, s=warm.s / ss,
                                       z_s=warm.z_s * ss)
        res = _solve_scaled(qp, opts, warm)
        return dataclasses.replace(res, s=res.s * ss, z_s=res.z_s / ss)
    return _solve_scaled(qp, opts, warm)


def _solve_scaled(qp: StageQP, opts: IpmOptions,
                  warm: "StageIpmResult | None") -> StageIpmResult:
    """Restart driver on the (slack-scaled) problem."""
    if not opts.refine_restart:
        return _solve_stage_core(qp, opts, warm)

    o1 = dataclasses.replace(opts, refine_restart=0)
    res = _solve_stage_core(qp, o1, warm)
    o2 = dataclasses.replace(
        opts, refine_restart=0, max_iters=opts.refine_iters,
        warm_duals="reuse", warm_floor=1e-7)
    ns = qp.g_s.shape[0]
    # merit weight: the largest unscaled gradient magnitude (the 1e8 soft
    # slack costs dominate) -- same exact-penalty scale as the dense path
    W = jnp.maximum(jnp.max(jnp.abs(qp.g_s)) if ns else 0.0,
                    jnp.maximum(jnp.max(jnp.abs(qp.qx)),
                                jnp.max(jnp.abs(qp.ru)))) + 1.0
    for _ in range(int(opts.refine_restart)):
        dqp = _delta_stage_qp(qp, res)
        warm2 = dataclasses.replace(
            res, u=jnp.zeros_like(res.u), x=jnp.zeros_like(res.x),
            s=jnp.zeros_like(res.s))
        res2 = _solve_stage_core(dqp, o2, warm=warm2)

        # accept the round only if it improves an exact-penalty merit on
        # the COMPENSATED delta data (catches both divergence and slack
        # corruption; mirror of ops.ipm.solve_qp's restart gate)
        du, dx, ds = res2.u, res2.x, res2.s

        def _viol(du_, dx_, ds_):
            y = (jnp.einsum("nri,ni->nr", dqp.C, dx_)
                 + jnp.einsum("nrk,nk->nr", dqp.D, du_))
            if ns:
                y = y + jnp.einsum("nrj,j->nr", dqp.Ws, ds_)
            v = jnp.maximum(jnp.maximum(dqp.lbA - y, y - dqp.ubA), 0.0)
            v = jnp.max(jnp.where(jnp.isfinite(v), v, 0.0))
            vu = jnp.maximum(jnp.maximum(dqp.u_lb - du_, du_ - dqp.u_ub),
                             0.0)
            v = jnp.maximum(v, jnp.max(jnp.where(jnp.isfinite(vu), vu,
                                                 0.0)))
            if ns:
                vs = jnp.maximum(jnp.maximum(dqp.s_lb - ds_,
                                             ds_ - dqp.s_ub), 0.0)
                v = jnp.maximum(v, jnp.max(jnp.where(jnp.isfinite(vs), vs,
                                                     0.0)))
            return v

        df = (jnp.sum(dqp.qx * dx) + 0.5 * jnp.sum(dqp.Qx * dx * dx)
              + jnp.sum(dqp.ru * du) + 0.5 * jnp.sum(dqp.Ru * du * du)
              + (dqp.g_s @ ds if ns else 0.0))
        dmerit = df + W * (_viol(du, dx, ds)
                           - _viol(jnp.zeros_like(du), jnp.zeros_like(dx),
                                   jnp.zeros_like(ds)))
        ok = (jnp.all(jnp.stack([jnp.all(jnp.isfinite(v)) for v in
                                 (du, dx, ds)]))
              & (dmerit <= 1e-3 * W))
        pick = lambda a, b: jnp.where(ok, a, b)
        u_n, x_n, s_n = res.u + du, res.x + dx, res.s + ds
        obj = (0.5 * jnp.sum(qp.Qx * x_n * x_n) + jnp.sum(qp.qx * x_n)
               + 0.5 * jnp.sum(qp.Ru * u_n * u_n) + jnp.sum(qp.ru * u_n)
               + (qp.g_s @ s_n if ns else 0.0))
        res = StageIpmResult(
            u=pick(u_n, res.u), x=pick(x_n, res.x), s=pick(s_n, res.s),
            lam=pick(res2.lam, res.lam),
            z_u=pick(res2.z_u, res.z_u), z_s=pick(res2.z_s, res.z_s),
            z_rows=pick(res2.z_rows, res.z_rows),
            iterations=res.iterations + res2.iterations,
            mu=pick(res2.mu, res.mu),
            primal_res=pick(res2.primal_res, res.primal_res),
            dual_res=pick(res2.dual_res, res.dual_res),
            objective=pick(obj, res.objective))
    return res


@_highest_precision
def _solve_stage_core(qp: StageQP, opts: IpmOptions = IpmOptions(),
                      warm: "StageIpmResult | None" = None
                      ) -> StageIpmResult:
    """One plain stage-wise IPM solve (no restart handling; see
    :func:`solve_stage_qp`)."""
    N, r, nx = qp.C.shape
    nu = qp.Bd.shape[-1]
    ns = qp.g_s.shape[0]
    dtype = qp.Ad.dtype

    # ---- objective scaling (pow2: roundoff-free) -------------------------
    gmax = jnp.maximum(
        jnp.maximum(jnp.max(jnp.abs(qp.Qx)), jnp.max(jnp.abs(qp.qx))),
        jnp.maximum(jnp.max(jnp.abs(qp.Ru)),
                    jnp.max(jnp.abs(qp.g_s)) if ns else 0.0))
    c_scale = _pow2(1.0 / jnp.maximum(gmax, 1.0))
    Qx = qp.Qx * c_scale
    qx = qp.qx * c_scale
    Ru = qp.Ru * c_scale
    ru_lin = qp.ru * c_scale
    g_s = qp.g_s * c_scale

    # ---- row equilibration (pow2 of the 2-norm) --------------------------
    if opts.equilibrate:
        n2 = (jnp.sum(qp.C ** 2, -1) + jnp.sum(qp.D ** 2, -1)
              + jnp.sum(qp.Ws ** 2, -1))
        r_scale = _pow2(lax.rsqrt(jnp.maximum(n2, 1e-24)))     # (N, r)
    else:
        r_scale = jnp.ones((N, r), dtype)
    C = qp.C * r_scale[..., None]
    D = qp.D * r_scale[..., None]
    Ws = qp.Ws * r_scale[..., None]
    lbA = qp.lbA * r_scale
    ubA = qp.ubA * r_scale

    # ---- masks -----------------------------------------------------------
    mrl, lbA_s = _mask_side(lbA)
    mru, ubA_s = _mask_side(ubA)
    mul, u_lb = _mask_side(qp.u_lb)
    muu, u_ub = _mask_side(qp.u_ub)
    msl, s_lb = _mask_side(qp.s_lb)
    msu, s_ub = _mask_side(qp.s_ub)
    n_active = (jnp.sum(mrl) + jnp.sum(mru) + jnp.sum(mul) + jnp.sum(muu)
                + jnp.sum(msl) + jnp.sum(msu))
    n_active = jnp.maximum(n_active, 1).astype(dtype)

    Ad, Bd, dd, x0 = qp.Ad, qp.Bd, qp.dd, qp.x0
    eye_x = jnp.eye(nx, dtype=dtype)
    eye_u = jnp.eye(nu, dtype=dtype)
    maxdiag = 1.0 + jnp.maximum(jnp.max(Qx), jnp.max(Ru))
    d_cap = D_CAP_F64 if jnp.finfo(dtype).eps < 1e-10 else D_CAP_F32

    def rows_of(x, u, s):
        y = (jnp.einsum("nri,ni->nr", C, x)
             + jnp.einsum("nrk,nk->nr", D, u))
        if ns:
            y = y + jnp.einsum("nrj,j->nr", Ws, s)
        return y

    def adjoint_lam(x, z_r):
        """Equality multipliers that zero the x-stationarity residual at
        (x, z_r): lam_k = Qx_k x_k + qx_k + Ad_{k+1}' lam_{k+1} - C_k' z_k.
        Used to (re)initialise lam -- a stale lam (previous tick's QP)
        measurably blows up the first warm iterations, since the Newton
        rhs then carries an O(model-delta) x-residual into every stage."""
        base = Qx * x + qx - jnp.einsum("nri,nr->ni", C, z_r)
        A_next = jnp.concatenate([Ad[1:],
                                  jnp.zeros((1, nx, nx), dtype)], axis=0)

        def bwd(lam_next, stage):
            b, An = stage
            lam = b + An.T @ lam_next
            return lam, lam

        _, lam = lax.scan(bwd, jnp.zeros((nx,), dtype), (base, A_next),
                          reverse=True)
        return lam

    def x_prev_of(x):
        return jnp.concatenate([x0[None], x[:-1]], axis=0)

    # ---- Newton solve given current diagonal weights ---------------------
    def factor_and_columns(D_r, D_u, D_s, regm, rhs_p):
        """Riccati factorisation + sigma Schur data for one iteration.

        ``rhs_p = (rhs_x, rhs_u, re)``: the PREDICTOR right-hand side,
        which is known before the factorisation -- it rides the SAME
        fused apply sweep as the ns sigma columns (one K = ns + 1 apply
        instead of a K = ns and a separate K = 1 launch; the sweeps are
        latency-bound, so fewer launches is the lever)."""
        reg = opts.reg * regm * maxdiag
        Huinv_f, G_f, W_f, Mq, Lx, Lu, Hss_st = assemble_factor(
            C, D, Ws, D_r, Qx + reg, Ru + D_u + reg, Ad, Bd)
        fac = (Huinv_f, G_f, W_f)
        rhs_x_p, rhs_u_p, re_p = rhs_p
        if ns:
            Hss = (jnp.sum(Hss_st, axis=0)
                   + jnp.diag(D_s) + reg * jnp.eye(ns, dtype=dtype))
            rx_all = jnp.concatenate(
                [jnp.moveaxis(Lx, -1, 0), rhs_x_p[None]], axis=0)
            ru_all = jnp.concatenate(
                [jnp.moveaxis(Lu, -1, 0), rhs_u_p[None]], axis=0)
            re_all = jnp.concatenate(
                [jnp.zeros((ns, N, nx), dtype), re_p[None]], axis=0)
            Yu_a, Yx_a, Yl_a = riccati_apply(fac, Ad, Bd, Mq, rx_all,
                                             ru_all, re_all)
            Yu, Yx, Yl = Yu_a[:ns], Yx_a[:ns], Yl_a[:ns]
            pred0 = (Yu_a[ns], Yx_a[ns], Yl_a[ns])
            # Schur complement  S = Hss - L' K^-1 L
            LtY = (jnp.einsum("nij,kni->jk", Lx, Yx)
                   + jnp.einsum("nuj,knu->jk", Lu, Yu))
            S = Hss - 0.5 * (LtY + LtY.T)
            S_chol = _chol_small(S)
        else:
            du0, dx0_, dl0 = riccati_apply(
                fac, Ad, Bd, Mq, rhs_x_p[None], rhs_u_p[None], re_p[None])
            pred0 = (du0[0], dx0_[0], dl0[0])
            Lx = Lu = Yu = Yx = Yl = S_chol = None
        return (fac, Mq, Lx, Lu, Yu, Yx, Yl, S_chol), pred0

    def schur_correct(facdata, base, rhs_s):
        """Back out the sigma step and correct a base solution."""
        fac, Mq, Lx, Lu, Yu, Yx, Yl, S_chol = facdata
        du0, dx0_, dl0 = base
        if ns:
            Ltv = (jnp.einsum("nij,ni->j", Lx, dx0_)
                   + jnp.einsum("nuj,nu->j", Lu, du0))
            dsg = _cho_solve_small(S_chol, rhs_s - Ltv)
            du = du0 - jnp.einsum("jnk,j->nk", Yu, dsg)
            dx = dx0_ - jnp.einsum("jni,j->ni", Yx, dsg)
            dlam = dl0 - jnp.einsum("jni,j->ni", Yl, dsg)
        else:
            dsg = jnp.zeros((ns,), dtype)
            du, dx, dlam = du0, dx0_, dl0
        return du, dx, dlam, dsg

    def kkt_solve(facdata, rhs_x, rhs_u, rhs_s, re):
        """Solve the full KKT (incl. sigma Schur) for ONE rhs."""
        fac, Mq = facdata[0], facdata[1]
        du0, dx0_, dl0 = riccati_apply(fac, Ad, Bd, Mq, rhs_x[None],
                                       rhs_u[None], re[None])
        return schur_correct(facdata, (du0[0], dx0_[0], dl0[0]), rhs_s)

    # ---- residuals -------------------------------------------------------
    def residuals(state):
        (u, x, s, _, (srl, sru, sul, suu, ssl, ssu),
         (zrl, zru, zul, zuu, zsl, zsu)) = state
        y = rows_of(x, u, s)
        z_r = zrl - zru
        # lam is ALWAYS the exact adjoint of the current (x, z_r), never a
        # separately-stepped iterate: stepping lam with the dual step
        # length leaves an O(step-mismatch) x-stationarity residual that
        # measurably destabilises the f32 dual residual (it collapses to
        # ~1e-5 scaled then bounces to ~1e-3 the next iteration).  With
        # the adjoint, r_dx is ~roundoff and the dual residual is the
        # REDUCED control gradient -- the dense solver's semantics.
        lam = adjoint_lam(x, z_r)
        r_du = (Ru * u + ru_lin
                + jnp.einsum("nik,ni->nk", Bd, lam)
                - (zul - zuu) - jnp.einsum("nrk,nr->nk", D, z_r))
        adj = jnp.einsum("nij,ni->nj", Ad[1:], lam[1:])
        adj = jnp.concatenate([adj, jnp.zeros((1, nx), dtype)], axis=0)
        r_dx = (Qx * x + qx - lam + adj
                - jnp.einsum("nri,nr->ni", C, z_r))
        r_ds = g_s - (zsl - zsu) - jnp.einsum("nrj,nr->j", Ws, z_r)
        r_eq = (jnp.einsum("nij,nj->ni", Ad, x_prev_of(x))
                + jnp.einsum("nik,nk->ni", Bd, u) + dd - x)
        r_prl = jnp.where(mrl, srl - (y - lbA_s), 0.0)
        r_pru = jnp.where(mru, sru - (ubA_s - y), 0.0)
        r_pul = jnp.where(mul, sul - (u - u_lb), 0.0)
        r_puu = jnp.where(muu, suu - (u_ub - u), 0.0)
        r_psl = jnp.where(msl, ssl - (s - s_lb), 0.0)
        r_psu = jnp.where(msu, ssu - (s_ub - s), 0.0)
        return (r_du, r_dx, r_ds, r_eq,
                (r_prl, r_pru, r_pul, r_puu, r_psl, r_psu))

    def pres_of(r_eq, rp):
        r_prl, r_pru, r_pul, r_puu, r_psl, r_psu = rp
        m = jnp.maximum(jnp.max(jnp.abs(r_prl / r_scale)),
                        jnp.max(jnp.abs(r_pru / r_scale)))
        m = jnp.maximum(m, jnp.max(jnp.abs(r_pul)))
        m = jnp.maximum(m, jnp.max(jnp.abs(r_puu)))
        if ns:
            m = jnp.maximum(m, jnp.maximum(jnp.max(jnp.abs(r_psl)),
                                           jnp.max(jnp.abs(r_psu))))
        return jnp.maximum(m, jnp.max(jnp.abs(r_eq)))

    def dres_of(r_du, r_dx, r_ds):
        m = jnp.maximum(jnp.max(jnp.abs(r_du)), jnp.max(jnp.abs(r_dx)))
        if ns:
            m = jnp.maximum(m, jnp.max(jnp.abs(r_ds)))
        return m

    def mu_of(state):
        S, Z = state[4], state[5]
        masks = (mrl, mru, mul, muu, msl, msu)
        tot = sum(jnp.sum(jnp.where(mk, s_ * z_, 0.0))
                  for mk, s_, z_ in zip(masks, S, Z))
        return tot / n_active

    def score_of(state):
        r_du, r_dx, r_ds, r_eq, rp = residuals(state)
        return (pres_of(r_eq, rp) + 10.0 * dres_of(r_du, r_dx, r_ds)
                + mu_of(state))

    # ---- initial point ---------------------------------------------------
    def init_solve():
        """Equality-constrained minimiser (no inequalities) via one
        regularised Riccati solve -- the stage-wise analogue of the dense
        solver's centered initialisation."""
        shift0 = 1e-3 if jnp.finfo(dtype).eps > 1e-10 else 1e-8
        reg0 = shift0 * maxdiag
        Qb0 = jax.vmap(jnp.diag)(Qx) + reg0 * eye_x
        Rb0 = jax.vmap(jnp.diag)(Ru) + reg0 * eye_u
        M0 = jnp.zeros((N, nx, nu), dtype)
        fac0 = riccati_factor(Ad, Bd, Qb0, Rb0, M0)
        re0 = dd.at[0].add(Ad[0] @ x0)
        u_i, x_i, lam_i = riccati_apply(
            fac0, Ad, Bd, M0, (-qx)[None], (-ru_lin)[None], re0[None])
        return u_i[0], x_i[0], lam_i[0]

    if warm is None and opts.init == "centered":
        u0_, x0_, _ = init_solve()
        ok = jnp.all(jnp.isfinite(u0_)) & jnp.all(jnp.isfinite(x0_))
        u0_ = jnp.where(ok, u0_, 0.0)
        u0_ = jnp.clip(u0_, jnp.where(mul, u_lb, -jnp.inf),
                       jnp.where(muu, u_ub, jnp.inf))
        x0_ = _rollout_scan(Ad, Bd, dd, x0, u0_)
        s0_ = jnp.zeros((ns,), dtype)
        mu0 = opts.mu0
    elif warm is not None:
        # warm primal: controls + slacks carry over, but the STATES must be
        # re-rolled under THIS tick's dynamics (the warm x satisfies the
        # previous linearisation's equalities; reusing it verbatim starts
        # the solve with an O(model-delta) equality residual that the
        # fraction-to-boundary steps then never fully burn off -- measured
        # slack divergence in the f32 receding-horizon chain).
        u0_ = jnp.clip(warm.u, jnp.where(mul, u_lb, -jnp.inf),
                       jnp.where(muu, u_ub, jnp.inf))
        x0_ = _rollout_scan(Ad, Bd, dd, x0, u0_)
        s0_ = warm.s
        mu0 = opts.warm_mu0
    else:
        u0_ = jnp.zeros((N, nu), dtype)
        x0_ = _rollout_scan(Ad, Bd, dd, x0, u0_)
        s0_ = jnp.zeros((ns,), dtype)
        mu0 = opts.mu0
    s_init0 = s0_
    y0 = rows_of(x0_, u0_, s_init0)
    raw = [jnp.where(mrl, y0 - lbA_s, jnp.inf),
           jnp.where(mru, ubA_s - y0, jnp.inf),
           jnp.where(mul, u0_ - u_lb, jnp.inf),
           jnp.where(muu, u_ub - u0_, jnp.inf),
           jnp.where(msl, s_init0 - s_lb, jnp.inf),
           jnp.where(msu, s_ub - s_init0, jnp.inf)]
    masks = (mrl, mru, mul, muu, msl, msu)
    if warm is None:
        # Mehrotra-style GLOBAL positive shift, duals on the central path
        # (s_i z_i = mu0) -- standard for cold starts (a per-element
        # floor was measured WORSE cold: 5.2 vs 1.9 first-control error
        # on f32 production QPs).
        smin = jnp.minimum(
            jnp.minimum(jnp.minimum(jnp.min(raw[0]), jnp.min(raw[1])),
                        jnp.minimum(jnp.min(raw[2]), jnp.min(raw[3]))),
            jnp.minimum(jnp.min(raw[4]) if ns else jnp.inf,
                        jnp.min(raw[5]) if ns else jnp.inf))
        shift = jnp.maximum(-1.5 * smin, 0.0) + 1e-2
        S0 = tuple(jnp.where(mk, rw + shift, 1.0)
                   for mk, rw in zip(masks, raw))
    elif opts.warm_duals == "reuse":
        # delta-form restart regime: the warm point (primal 0) is the
        # incumbent, whose duals are near-optimal for the delta problem --
        # reuse them with a tiny positivity floor instead of re-centering
        # (the dense restart's warm_duals="reuse" semantics).  The stored
        # duals are unscaled; bring them into this solve's scaling.
        fl = opts.warm_floor
        S0 = tuple(jnp.where(mk, jnp.maximum(rw, fl), 1.0)
                   for mk, rw in zip(masks, raw))
        wz_r = warm.z_rows * c_scale / r_scale
        wz_u = warm.z_u * c_scale
        wz_s = warm.z_s * c_scale
        Z0 = tuple(jnp.where(mk, jnp.maximum(sgn * wz, fl), 0.0)
                   .astype(dtype)
                   for mk, wz, sgn in [(mrl, wz_r, 1.0), (mru, wz_r, -1.0),
                                       (mul, wz_u, 1.0), (muu, wz_u, -1.0),
                                       (msl, wz_s, 1.0),
                                       (msu, wz_s, -1.0)])
    else:
        # PER-ELEMENT floor for warm starts: a receding-horizon warm point
        # can violate a single row badly (the shifted trajectory leaving
        # the track at the horizon tail); a global shift would displace
        # every slack by that violation and destroy the warm proximity
        # (measured: mu climbs 30x over the first warm iterations and the
        # 12-iteration budget returns garbage).  Flooring concentrates the
        # primal residual on the violated rows only.
        S0 = tuple(jnp.where(mk, jnp.maximum(rw, 1e-2), 1.0)
                   for mk, rw in zip(masks, raw))
    if not (warm is not None and opts.warm_duals == "reuse"):
        Z0 = tuple(jnp.where(mk, mu0 / s_, 0.0).astype(dtype)
                   for mk, s_ in zip(masks, S0))
    # consistent multipliers for THIS QP at the initial point (stale /
    # init-solve lam would leave an O(1) x-stationarity residual)
    lam0 = adjoint_lam(x0_, Z0[0] - Z0[1])
    state0 = (u0_, x0_, s_init0, lam0, S0, Z0)

    # ---- one Mehrotra iteration -----------------------------------------
    def iterate(state, regm):
        (u, x, s, lam, S, Z) = state
        srl, sru, sul, suu, ssl, ssu = S
        zrl, zru, zul, zuu, zsl, zsu = Z
        mu = mu_of(state)
        r_du, r_dx, r_ds, r_eq, rp = residuals(state)
        r_prl, r_pru, r_pul, r_puu, r_psl, r_psu = rp
        pres_in = pres_of(r_eq, rp)
        dres_in = dres_of(r_du, r_dx, r_ds)
        score_in = pres_in + 10.0 * dres_in + mu

        if opts.freeze is not None:
            fp, fd, fm = opts.freeze
            frozen = (pres_in < fp) & (dres_in < fd) & (mu < fm)
        else:
            frozen = jnp.zeros((), jnp.bool_)

        clipd = lambda z_, s_, mk: jnp.clip(
            jnp.where(mk, z_ / s_, 0.0), 0.0, d_cap)
        drl, dru = clipd(zrl, srl, mrl), clipd(zru, sru, mru)
        dul, duu = clipd(zul, sul, mul), clipd(zuu, suu, muu)
        dsl, dsu = clipd(zsl, ssl, msl), clipd(zsu, ssu, msu)
        D_r = drl + dru
        D_u = dul + duu
        D_s = dsl + dsu

        def build_rhs(rc):
            rc_rl, rc_ru, rc_ul, rc_uu, rc_sl, rc_su = rc
            t_r = (jnp.where(mrl, (rc_rl + zrl * r_prl) / srl, 0.0)
                   - jnp.where(mru, (rc_ru + zru * r_pru) / sru, 0.0))
            t_u = (jnp.where(mul, (rc_ul + zul * r_pul) / sul, 0.0)
                   - jnp.where(muu, (rc_uu + zuu * r_puu) / suu, 0.0))
            t_s = (jnp.where(msl, (rc_sl + zsl * r_psl) / ssl, 0.0)
                   - jnp.where(msu, (rc_su + zsu * r_psu) / ssu, 0.0))
            rhs_u = -r_du + t_u + jnp.einsum("nrk,nr->nk", D, t_r)
            rhs_x = -r_dx + jnp.einsum("nri,nr->ni", C, t_r)
            rhs_s = -r_ds + t_s + jnp.einsum("nrj,nr->j", Ws, t_r)
            return rhs_x, rhs_u, rhs_s

        def finish(dv4, rc):
            rc_rl, rc_ru, rc_ul, rc_uu, rc_sl, rc_su = rc
            du, dx, dlam, dsg = dv4
            dy = rows_of(dx, du, dsg)      # rows_of is linear
            dsrl = jnp.where(mrl, dy - r_prl, 0.0)
            dsru = jnp.where(mru, -dy - r_pru, 0.0)
            dsul = jnp.where(mul, du - r_pul, 0.0)
            dsuu = jnp.where(muu, -du - r_puu, 0.0)
            dssl = jnp.where(msl, dsg - r_psl, 0.0)
            dssu = jnp.where(msu, -dsg - r_psu, 0.0)
            dS = (dsrl, dsru, dsul, dsuu, dssl, dssu)
            dz = lambda rc_, z_, s_, ds_, mk: jnp.where(
                mk, (rc_ - z_ * ds_) / s_, 0.0)
            dZ = (dz(rc_rl, zrl, srl, dsrl, mrl),
                  dz(rc_ru, zru, sru, dsru, mru),
                  dz(rc_ul, zul, sul, dsul, mul),
                  dz(rc_uu, zuu, suu, dsuu, muu),
                  dz(rc_sl, zsl, ssl, dssl, msl),
                  dz(rc_su, zsu, ssu, dssu, msu))
            return (du, dx, dsg, dlam), dS, dZ

        def full_solve(rc):
            rhs_x, rhs_u, rhs_s = build_rhs(rc)
            dv4 = kkt_solve(facdata, rhs_x, rhs_u, rhs_s, -r_eq)
            return finish(dv4, rc)

        def max_step(s_, ds_, mk):
            lim = jnp.where(mk & (ds_ < 0),
                            -opts.tau * s_ / jnp.minimum(ds_, -1e-30), 1.0)
            return jnp.min(lim)

        def steps_of(dS, dZ):
            a_p = jnp.ones((), dtype)
            a_d = jnp.ones((), dtype)
            for mk, s_, ds_ in zip(masks, S, dS):
                a_p = jnp.minimum(a_p, max_step(s_, ds_, mk))
            for mk, z_, dz_ in zip(masks, Z, dZ):
                a_d = jnp.minimum(a_d, max_step(z_, dz_, mk))
            return jnp.minimum(a_p, 1.0), jnp.minimum(a_d, 1.0)

        # predictor -- its rhs is known before the factorisation, so it
        # rides the sigma-columns apply sweep (see factor_and_columns)
        rc_aff = tuple(jnp.where(mk, -s_ * z_, 0.0)
                       for mk, s_, z_ in zip(masks, S, Z))
        rhs_aff = build_rhs(rc_aff)
        facdata, pred0 = factor_and_columns(
            D_r, D_u, D_s, regm, (rhs_aff[0], rhs_aff[1], -r_eq))
        dv4_a = schur_correct(facdata, pred0, rhs_aff[2])
        dv_a, dS_a, dZ_a = finish(dv4_a, rc_aff)
        a_p, a_d = steps_of(dS_a, dZ_a)
        tot_aff = sum(
            jnp.sum(jnp.where(mk, (s_ + a_p * ds_) * (z_ + a_d * dz_), 0.0))
            for mk, s_, ds_, z_, dz_ in zip(masks, S, dS_a, Z, dZ_a))
        mu_aff = tot_aff / n_active
        sigma = jnp.clip((mu_aff / jnp.maximum(mu, 1e-300)) ** 3, 0.0, 1.0)

        # corrector
        rc_c = tuple(
            jnp.where(mk, sigma * mu - s_ * z_ - ds_ * dz_, 0.0)
            for mk, s_, z_, ds_, dz_ in zip(masks, S, Z, dS_a, dZ_a))
        dv, dS, dZ = full_solve(rc_c)
        a_p, a_d = steps_of(dS, dZ)

        du, dx, dsg, dlam = dv
        u_n = u + a_p * du
        x_n = x + a_p * dx
        s_n = s + a_p * dsg
        lam_n = lam + a_d * dlam
        S_n = tuple(jnp.where(mk, s_ + a_p * ds_, 1.0)
                    for mk, s_, ds_ in zip(masks, S, dS))
        Z_n = tuple(jnp.where(mk, z_ + a_d * dz_, 0.0)
                    for mk, z_, dz_ in zip(masks, Z, dZ))
        new = (u_n, x_n, s_n, lam_n, S_n, Z_n)
        if TRACE:
            names = ["rl", "ru", "ul", "uu", "sl", "su"]
            lims = {nm + "_p": max_step(s_, ds_, mk)
                    for nm, mk, s_, ds_ in zip(names, masks, S, dS)}
            lims.update({nm + "_d": max_step(z_, dz_, mk)
                         for nm, mk, z_, dz_ in zip(names, masks, Z, dZ)})
            jax.debug.print(
                "it pres={p:.2e} dres={d:.2e} mu={m:.2e} a_p={ap:.3f} "
                "a_d={ad:.3f} sig={sg:.2e} muaff={ma:.2e} du_max={dm:.2e} "
                "lims={l}",
                p=pres_in, d=dres_in, m=mu, ap=a_p, ad=a_d, sg=sigma,
                ma=mu_aff, dm=jnp.max(jnp.abs(dv[0])), l=lims)
        finite = jnp.all(jnp.stack(
            [jnp.all(jnp.isfinite(v)) for v in
             jax.tree_util.tree_leaves(new)]))
        good = finite & jnp.logical_not(frozen)
        kept = jax.tree_util.tree_map(
            lambda a, b: jnp.where(good, a, b), new, state)
        return kept, good, score_in

    def regm_next(regm, good):
        return jnp.where(good, jnp.maximum(regm * 0.1, 1.0),
                         jnp.minimum(regm * 100.0, 1e12))

    inf_score = jnp.asarray(jnp.inf, dtype)
    regm0 = jnp.asarray(1.0, dtype)

    def converged(state):
        r_du, r_dx, r_ds, r_eq, rp = residuals(state)
        return ((pres_of(r_eq, rp) < opts.tol)
                & (dres_of(r_du, r_dx, r_ds) < opts.tol)
                & (mu_of(state) < opts.tol))

    if opts.adaptive:
        def cond(carry):
            it, state, best, bscore, regm = carry
            return (it < opts.max_iters) & jnp.logical_not(converged(state))

        def body(carry):
            it, state, best, bscore, regm = carry
            new_state, good, sc = iterate(state, regm)
            better = sc < bscore
            best = jax.tree_util.tree_map(
                lambda a, b: jnp.where(better, a, b), state, best)
            bscore = jnp.where(better, sc, bscore)
            return it + 1, new_state, best, bscore, regm_next(regm, good)

        iters, state, best, bscore, _ = lax.while_loop(
            cond, body,
            (jnp.zeros((), jnp.int32), state0, state0, inf_score, regm0))
    else:
        def body(i, carry):
            state, best, bscore, regm = carry
            new_state, good, sc = iterate(state, regm)
            better = sc < bscore
            best = jax.tree_util.tree_map(
                lambda a, b: jnp.where(better, a, b), state, best)
            bscore = jnp.where(better, sc, bscore)
            return new_state, best, bscore, regm_next(regm, good)

        state, best, bscore, _ = lax.fori_loop(
            0, opts.max_iters, body, (state0, state0, inf_score, regm0))
        iters = jnp.asarray(opts.max_iters, jnp.int32)

    final_better = score_of(state) < bscore
    state = jax.tree_util.tree_map(
        lambda a, b: jnp.where(final_better, a, b), state, best)

    (u, x, s, _, S, Z) = state
    zrl, zru, zul, zuu, zsl, zsu = Z
    lam = adjoint_lam(x, zrl - zru)
    r_du, r_dx, r_ds, r_eq, rp = residuals(state)
    obj = (0.5 * jnp.sum(qp.Qx * x * x) + jnp.sum(qp.qx * x)
           + 0.5 * jnp.sum(qp.Ru * u * u) + jnp.sum(qp.ru * u)
           + (qp.g_s @ s if ns else 0.0))
    return StageIpmResult(
        u=u, x=x, s=s, lam=lam / c_scale,
        z_u=(zul - zuu) / c_scale,
        z_s=(zsl - zsu) / c_scale,
        z_rows=(zrl - zru) * r_scale / c_scale,
        iterations=iters,
        mu=mu_of(state) / c_scale,
        primal_res=pres_of(r_eq, rp),
        dual_res=dres_of(r_du, r_dx, r_ds) / c_scale,
        objective=obj)
