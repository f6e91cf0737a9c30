"""Batched dense primal-dual interior-point QP solver.

Measured dead end (round 3, PERF_VARIANTS.json / ACCURACY_TPU.json): a
bf16 copy of A for the Newton-direction products (quadform and/or KKT
matvecs).  bf16 KKT matvecs floor the dual residual (their inputs mix
1e7-scale t_r terms with 1e-5 residuals) -- 10x control-error blowup;
a bf16-only quadform is ALSO a regression: slower on the chip (the
materialised bf16 intermediate breaks XLA's (A'*d)@A fusion, 12.7k vs
13.6k solves/s) and 10x less accurate at the fixed 12-iteration budget
(near-tie active sets flip under a 0.4%-perturbed Newton matrix).

TPU-native replacement for the reference's qpOASES C++ MEX backend
(``optimizers/matlab/qpOASES/qpOASES.m:20-37``): solves

    min  1/2 x' H x + g' x
    s.t. lb  <=  x  <= ub          (variable bounds)
         lbA <= A x <= ubA         (general rows)

qpOASES's online active-set strategy is branch-heavy and inherently
sequential -- the wrong shape for a TPU.  This solver is a Mehrotra
predictor-corrector interior-point method with:

  * two-sided slacks for bounds and rows, with **masked infinite sides**
    (the reference encodes one-sided rows as +-1e10 big-M entries,
    ``kinematic_state_constraints.m:38-39``; here they are true infinities
    that simply drop out of the complementarity system),
  * a single dense Cholesky factorisation of the condensed KKT matrix
    ``H + A' D A + D_b`` per iteration, shared by predictor and corrector,
  * fixed-shape control flow (``lax.while_loop`` with a hard iteration cap,
    or a fully static ``fori_loop``), so the whole solve jits, vmaps over
    thousands of scenario instances, and scans over simulation time,
  * automatic objective scaling so the reference's 1e8 soft-constraint
    costs stay well-conditioned in float32 on TPU.

Everything is pure JAX: under ``vmap`` the per-iteration work becomes
batched (n x n) Cholesky + (m x n) matmuls that map straight onto the MXU.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

from . import linalg as xlinalg
from .pallas import chol as pchol
from .precision import highest as _highest_precision
from .structured import is_structured


def _mv(A, x):
    """A @ x for dense or stage-structured A."""
    return A.matvec(x) if is_structured(A) else A @ x


def _rmv(A, z):
    """A' @ z for dense or stage-structured A."""
    return A.rmatvec(z) if is_structured(A) else A.T @ z


def _qf(A, d):
    """A' diag(d) A for dense or stage-structured A."""
    return A.quadform(d) if is_structured(A) else (A.T * d) @ A



def _pow2(x):
    """Round a positive scale factor DOWN to the nearest power of two.

    Scaling by exact powers of two is roundoff-free in binary floating
    point, so the scaled problem's optimum is EXACTLY the original's
    (scaled) -- an arbitrary f32 scale perturbs (H, g, A) at relative
    eps32, which the MPC QP's ill-conditioned solution map amplifies ~1e4x
    into ~5e-3 first-control error (measured; tests/test_f32_accuracy.py).
    The <=2x loss of equilibration tightness is harmless.
    """
    return jnp.exp2(jnp.floor(jnp.log2(x)))


@dataclasses.dataclass(frozen=True)
class IpmOptions:
    max_iters: int = 50
    tol: float = 5e-14         # residual tolerance (on the scaled problem;
                               # the internal cost scaling divides the
                               # reference's 1e8 soft weights through, so
                               # control-level accuracy needs ~1e-13; the
                               # inertia-corrected endgame makes the tighter
                               # target safe to chase)
    tau: float = 0.995          # fraction-to-boundary
    reg: float = 1e-9           # static KKT regularisation (relative to diag)
    s_init: float = 1.0         # initial slack floor
    z_init: float = 1.0         # initial dual value
    adaptive: bool = True       # while_loop early exit (False: fixed fori)
    freeze: tuple | None = None  # (pres, dres, mu) scaled thresholds: once a
                                # problem instance reaches them its iterate is
                                # frozen.  Essential in f32: past convergence
                                # the capped complementarity diagonals distort
                                # the Newton system and the iterate can
                                # diverge again (observed slack excursions).
    chol: str = "auto"          # "auto" | "lapack" | "blocked" | "pallas".
                                # TPU lowers lapack cholesky/cho_solve to a
                                # custom call that exhausts scoped VMEM for
                                # batched 84x84 systems; "blocked" is the
                                # pure-XLA implementation in ops.linalg;
                                # "pallas" is the batch-in-lanes TPU kernel
                                # (ops.pallas.chol) used automatically under
                                # vmap on TPU ("auto").
    equilibrate: bool = True    # scale general rows to unit inf-norm.  The
                                # MPC rows mix friction-polygon coefficients
                                # (~40) with unit state boxes; unequilibrated
                                # they stall Mehrotra steps for ~10 extra
                                # iterations on production QPs.
    init: str = "centered"      # "centered" | "basic".  Centered: project
                                # the regularised unconstrained minimiser
                                # into the box, shift slacks positive
                                # (Mehrotra's heuristic) and set z = mu0/s so
                                # the start lies on the central path; costs
                                # one extra factorisation.  "basic": x0 = 0,
                                # z = z_init.
    mu0: float = 1.0            # initial centrality target (scaled problem)
    warm_duals: str = "centered"  # "centered" | "reuse".  Warm starts keep
                                # the previous primal; "centered" re-places
                                # the duals on the central path at warm_mu0
                                # (stale duals from the neighbouring QP were
                                # measured to be WORSE than a cold centered
                                # start: scripts/accuracy_iters.py), "reuse"
                                # rescales and floors the previous duals
                                # (qpOASES-hot-start analogue).
    warm_mu0: float = 1e-2      # centrality target for warm starts
    warm_floor: float = 1e-3    # slack/dual positivity floor for warm
                                # starts (scaled units).  The floor plants
                                # a spurious dual on every inactive side;
                                # the delta-form refinement uses a much
                                # smaller value because its warm duals are
                                # already near-optimal.
    correctors: int = 0         # Gondzio centrality correctors per
                                # iteration: extra backsolves on the SAME
                                # factorisation targeting outlier
                                # complementarity pairs; each costs ~1/4 of
                                # an iteration and typically saves 30-50% of
                                # the iterations.
    polish: int = 0             # active-set polish iterations after the IPM
                                # (semismooth-Newton augmented Lagrangian on
                                # the identified active set).  The f32 IPM's
                                # accuracy floor (~1e-1 max control error on
                                # production QPs) is set by the barrier's
                                # KKT conditioning: the capped z/s diagonals
                                # reach 1e7 and forward error ~ cond * eps_32
                                # dominates.  The active-set system has only
                                # the problem's own conditioning, so a few
                                # Newton/multiplier rounds in f32 recover
                                # ~1e-5 control accuracy.  Each iteration
                                # costs one K formation + factor + solve
                                # (about half an IPM iteration).
    polish_rho: float = 1e3     # AL penalty weight (scaled-problem units;
                                # Hs is scaled to unit max).  Larger rho =
                                # faster multiplier convergence but worse
                                # K conditioning; 1e3 contracts the
                                # constraint error ~1e-3x per iteration
                                # while keeping cond(K) f32-safe.
    var_scale: bool = False     # per-variable symmetric equilibration
                                # D = 1/sqrt(max(diag H, |g|)): the MPC QP
                                # mixes 1e7-magnitude B'QB entries with the
                                # R=20 control-smoothness curvature, and a
                                # single global scale pushes the R block to
                                # ~1e-8 -- below f32 gradient noise, which
                                # floors the achievable control accuracy.
                                # Variable scaling gives every direction
                                # O(1) curvature.
    scale_kkt: bool = False     # Jacobi-equilibrate K before each
                                # factorisation and add one iterative-
                                # refinement backsolve per KKT solve: the
                                # complementarity diagonals span ~1e7 and
                                # dominate the f32 forward error; symmetric
                                # diagonal scaling + refinement recovers
                                # most of it for ~1 extra matmul per solve.
    refine_restart: int = 0     # after the IPM, re-solve the problem in
                                # DELTA FORM about the returned iterate: the
                                # residual gradient g + H @ x_bar is
                                # evaluated with error-free transforms
                                # (ops.precision.residual_affine, ~48-bit),
                                # the bounds are shifted (exact by Sterbenz
                                # for the near-active sides), and a short
                                # second IPM solves for the correction dx
                                # with per-variable scaling.  This removes
                                # the f32 floor caused by the global
                                # objective scale (the 1e7 dynamic range of
                                # H pushes the R-block curvature below f32
                                # gradient noise in the first solve).  The
                                # value is the number of delta-form rounds
                                # (each re-anchors at the improved iterate
                                # and contracts the remaining error).
    refine_iters: int = 10      # iteration budget per delta-form round
    refine_comp: bool = True    # evaluate compensated dual residuals
                                # INSIDE the delta-form rounds (the
                                # compensated *data* -- shifted bounds and
                                # gradients -- is always used).  On-chip
                                # comp_resid costs ~4x per iteration; with
                                # the delta data already compensated most
                                # of the accuracy survives without it
                                # (PRESET_MAP.json round-5 rows), which is
                                # what makes a >=10k solves/s restart
                                # preset possible.
    comp_resid: bool = False    # evaluate the dual residual Hx + g - A'z
                                # - z_b with error-free transforms
                                # (ops.precision.residual_affine) inside
                                # every iteration.  The MPC QP's H@x mixes
                                # ~1e6-magnitude terms that cancel to O(1);
                                # plain f32 evaluation carries ~0.05-1.0
                                # absolute noise there, which drowns the
                                # stationarity signal of the R-block
                                # directions.  ~2x f32 precision removes
                                # it; cost is a few elementwise (m, n)
                                # products per iteration -- small next to
                                # the A'DA formation.


@dataclasses.dataclass(frozen=True)
class IpmResult:
    x: Any                 # (n,) primal solution
    z_bounds: Any          # (n,) combined bound dual (z_l - z_u); satisfies
    z_rows: Any            # (m,)  Hx + g - A'z_rows - z_bounds = 0
    iterations: Any
    mu: Any                # final complementarity measure
    primal_res: Any
    dual_res: Any
    objective: Any         # 1/2 x'Hx + g'x  (unscaled)


jax.tree_util.register_dataclass(
    IpmResult,
    data_fields=["x", "z_bounds", "z_rows", "iterations", "mu",
                 "primal_res", "dual_res", "objective"],
    meta_fields=[])


def _side(val):
    """Prepare one inequality side: finite mask and a safe bound value."""
    finite = jnp.isfinite(val)
    safe = jnp.where(finite, val, 0.0)
    return finite, safe


def _polish(state, Hs, gs, A, lb_s, ub_s, lbA_s, ubA_s, masks, opts, eye,
            use_pallas, use_blocked, score_of):
    """Active-set polish: semismooth-Newton augmented Lagrangian.

    Works on the SCALED problem.  Each iteration evaluates the clipped
    multiplier estimates ``h = max(0, mu - rho * slack)`` (exactly the AL /
    method-of-multipliers update for one-sided inequalities), takes one
    Newton step on the AL in x with the currently-active rows contributing
    ``rho`` curvature, then updates the multipliers at the new point.  The
    mask is re-derived every iteration, so a misidentified marginal
    constraint self-corrects.  The polished state is kept only if its
    optimality score beats the IPM iterate's (an indefinite or diverged
    polish can never degrade the answer).
    """
    mbl, mbu, mrl, mru = masks
    dtype = Hs.dtype
    rho_max = jnp.asarray(opts.polish_rho, dtype)
    x0 = state[0]
    sbl, sbu, srl, sru = state[1], state[2], state[3], state[4]
    zbl, zbu, zrl, zru = state[5], state[6], state[7], state[8]
    # Per-constraint AL penalty = the IPM's own complementarity ratio z/s,
    # capped at polish_rho.  No binary active-set classification: strongly
    # active sides (z/s >> rho_max) get the full capped penalty, inactive
    # sides (z/s ~ mu) get ~zero, marginal ones interpolate -- so a
    # misjudged marginal constraint costs an error of its own (small)
    # magnitude instead of a wrong equality face.  This is exactly the
    # IPM's KKT diagonal with the 1e7/1e14 cap lowered to an f32-safe
    # value, plus multiplier (rather than barrier) feedback.
    rho = tuple(jnp.where(mk, jnp.clip(z / s, 0.0, rho_max), 0.0)
                for mk, z, s in [(mbl, zbl, sbl), (mbu, zbu, sbu),
                                 (mrl, zrl, srl), (mru, zru, sru)])
    m0 = (jnp.where(mbl, zbl, 0.0), jnp.where(mbu, zbu, 0.0),
          jnp.where(mrl, zrl, 0.0), jnp.where(mru, zru, 0.0))
    reg = 10.0 * opts.reg * (1.0 + jnp.max(jnp.abs(jnp.diag(Hs))))

    def make_solver(K):
        """Jacobi-equilibrated factorisation with one refinement backsolve.

        The weighted-AL K mixes rho (1e3) with scaled-Hessian entries as
        small as ~1e-6 (the R block after objective scaling); symmetric
        diagonal scaling bounds the condition number seen by the f32
        Cholesky by the *intrinsic* conditioning, and the extra backsolve
        removes most of the remaining forward error.
        """
        d = jax.lax.rsqrt(jnp.maximum(jnp.diag(K), 1e-30))
        Ks = K * d[:, None] * d[None, :]
        if use_pallas:
            f = pchol.chol_factor(Ks)
            slv = lambda r: pchol.chol_solve(f, r)
        elif use_blocked:
            c = xlinalg.cholesky_invdiag(Ks)
            slv = lambda r: xlinalg.cho_solve_invdiag(c[0], c[1], r)
        else:
            f = jnp.linalg.cholesky(Ks)
            slv = lambda r: jax.scipy.linalg.cho_solve((f, True), r)

        def solve(rhs):
            u = slv(d * rhs)
            u = u + slv(d * rhs - Ks @ u)
            return d * u

        return solve

    def signed_slacks(x, y):
        return (x - lb_s, ub_s - x, y - lbA_s, ubA_s - y)

    # the Hessian of the weighted AL is constant: factor ONCE, reuse across
    # polish iterations (rho is frozen at the IPM's ratios)
    K = (Hs + _qf(A, rho[2] + rho[3]) + jnp.diag(rho[0] + rho[1])
         + reg * eye)
    solve2 = make_solver(K)

    def body(carry, _):
        # weighted-AL Newton step, then clipped multiplier update
        x, m = carry
        y = _mv(A, x)
        c = signed_slacks(x, y)
        h = tuple(jnp.maximum(mu - r * ci, 0.0) for mu, r, ci in
                  zip(m, rho, c))
        grad = Hs @ x + gs - (h[0] - h[1]) - _rmv(A, h[2] - h[3])
        dx = solve2(-grad)
        dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, 0.0)
        x_new = x + dx
        c_new = signed_slacks(x_new, _mv(A, x_new))
        m_new = tuple(jnp.maximum(mu - r * ci, 0.0) for mu, r, ci in
                      zip(m, rho, c_new))
        return (x_new, m_new), None

    (x_p, m_p), _ = lax.scan(body, (x0, m0), None, length=opts.polish)
    hbl, hbu, hrl, hru = m_p
    y_p = _mv(A, x_p)
    # report true violations: slack = max(signed slack, 0) so the residual
    # fields expose any remaining constraint violation instead of hiding it
    sbl_p = jnp.where(mbl, jnp.maximum(x_p - lb_s, 0.0), 1.0)
    sbu_p = jnp.where(mbu, jnp.maximum(ub_s - x_p, 0.0), 1.0)
    srl_p = jnp.where(mrl, jnp.maximum(y_p - lbA_s, 0.0), 1.0)
    sru_p = jnp.where(mru, jnp.maximum(ubA_s - y_p, 0.0), 1.0)
    polished = (x_p, sbl_p, sbu_p, srl_p, sru_p, hbl, hbu, hrl, hru)
    better = (score_of(polished) < score_of(state)) & jnp.all(jnp.isfinite(x_p))
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(better, a, b), polished, state)


@_highest_precision
def solve_qp(H, g, A, lb, ub, lbA, ubA, opts: IpmOptions = IpmOptions(),
             x0=None, dtype=None, warm: "IpmResult | None" = None) -> IpmResult:
    """Solve one QP instance (vmap for batches).

    Shapes: H (n,n), g (n,), A (m,n), lb/ub (n,), lbA/ubA (m,).
    Infinite entries in lb/ub/lbA/ubA deactivate that side.

    ``warm``: a previous :class:`IpmResult` for a same-shape QP.  Primal and
    duals are re-seeded from it (floored away from the boundary), the MPC
    analogue of qpOASES's hot-start sequence API
    (``qpOASES_sequence.m:20-78``) and IPOPT's zl/zu/lambda warm start
    (``rk2_nmpc_kinematic_curvilinear.m:14-20``): sequential ticks solve
    neighbouring QPs, so the active set barely changes.
    """
    if dtype is None:
        dtype = H.dtype

    if opts.refine_restart:
        # phase 1: ordinary solve; then `refine_restart` delta-form rounds
        # about the current iterate with compensated residual data (see
        # IpmOptions).
        from .precision import residual_affine
        o1 = dataclasses.replace(opts, refine_restart=0)
        res = solve_qp(H, g, A, lb, ub, lbA, ubA, o1, x0=x0, dtype=dtype,
                       warm=warm)
        o2 = dataclasses.replace(
            opts, refine_restart=0, var_scale=True,
            comp_resid=opts.refine_comp,
            max_iters=opts.refine_iters, polish=0, warm_duals="reuse",
            warm_floor=1e-7)
        zero_m = jnp.zeros((A.shape[0],), dtype)
        for _ in range(int(opts.refine_restart)):
            xb = res.x
            g_hi, g_lo = residual_affine(H, xb, g)
            gd = g_hi + g_lo
            if is_structured(A):
                y_hi, y_lo = A.matvec_compensated(xb)
            else:
                y_hi, y_lo = residual_affine(A, xb, zero_m)
            lbAd = (lbA - y_hi) - y_lo
            ubAd = (ubA - y_hi) - y_lo
            # the delta problem's optimal duals equal the original's:
            # warm-start them (primal dx = 0)
            warm2 = dataclasses.replace(res, x=jnp.zeros_like(xb))
            lbd, ubd = lb - xb, ub - xb
            res2 = solve_qp(H, gd, A, lbd, ubd, lbAd, ubAd, o2,
                            dtype=dtype, warm=warm2)
            # accept the round only if it improves an exact-penalty merit
            # evaluated on the COMPENSATED delta data: df = gd'dx +
            # 1/2 dx'H dx is the true objective change (gd is ~f32^2
            # accurate), and the violation change is read off the shifted
            # bounds.  This catches both divergence and the slack-column
            # corruption a small-looking dx can carry.
            dx = res2.x
            Adx = _mv(A, dx)

            def _viol(db, dr):
                vb = jnp.maximum(jnp.maximum(lbd - db, db - ubd), 0.0)
                vr = jnp.maximum(jnp.maximum(lbAd - dr, dr - ubAd), 0.0)
                return jnp.maximum(jnp.max(jnp.where(jnp.isfinite(vb), vb,
                                                     0.0)),
                                   jnp.max(jnp.where(jnp.isfinite(vr), vr,
                                                     0.0)))

            df = gd @ dx + 0.5 * (dx @ (H @ dx))
            W = jnp.max(jnp.abs(g)) + 1.0
            dmerit = df + W * (_viol(dx, Adx) - _viol(jnp.zeros_like(dx),
                                                      jnp.zeros_like(Adx)))
            # tolerance 1e-3 * W: a legitimate refinement may raise the
            # objective by ~(slack noise ~1e-5) * (1e5 soft weights) while
            # fixing the control components; a diverged round raises it by
            # O(W).  The threshold sits three orders below the latter.
            ok = jnp.all(jnp.isfinite(dx)) & (dmerit <= 1e-3 * W)
            pick = lambda a, b: jnp.where(ok, a, b)
            x = pick(xb + res2.x, xb)
            res = IpmResult(
                x=x,
                z_bounds=pick(res2.z_bounds, res.z_bounds),
                z_rows=pick(res2.z_rows, res.z_rows),
                iterations=res.iterations + res2.iterations,
                mu=pick(res2.mu, res.mu),
                primal_res=pick(res2.primal_res, res.primal_res),
                dual_res=pick(res2.dual_res, res.dual_res),
                objective=0.5 * x @ (H @ x) + g @ x)
        return res

    if opts.var_scale:
        # per-variable symmetric equilibration (see IpmOptions.var_scale):
        # transform, solve with the option cleared, untransform.
        # relative floor: variables with no quadratic AND ~zero gradient
        # (delta-form slack columns) must not be blown up unboundedly
        vs = _pow2(lax.rsqrt(jnp.maximum(
            jnp.maximum(jnp.diag(H), jnp.abs(g)),
            1e-9 * jnp.max(jnp.diag(H)) + 1e-12)))
        inner = dataclasses.replace(opts, var_scale=False)
        warm_i = None
        if warm is not None:
            warm_i = dataclasses.replace(
                warm, x=warm.x / vs, z_bounds=warm.z_bounds * vs)
        res = solve_qp(H * vs[:, None] * vs[None, :], g * vs,
                       A.scale_cols(vs) if is_structured(A) else
                       A * vs[None, :], lb / vs, ub / vs, lbA, ubA, inner,
                       x0=None if x0 is None else x0 / vs, dtype=dtype,
                       warm=warm_i)
        x_u = res.x * vs
        return dataclasses.replace(
            res, x=x_u, z_bounds=res.z_bounds / vs,
            objective=0.5 * x_u @ (H @ x_u) + g @ x_u)

    n = g.shape[0]
    m = lbA.shape[0]

    # ---- objective scaling (keeps 1e8 soft costs f32-safe) --------------
    gmax = jnp.maximum(jnp.max(jnp.abs(g)), jnp.max(jnp.abs(H)))
    c_scale = _pow2(1.0 / jnp.maximum(gmax, 1.0))
    Hs = H * c_scale
    gs = g * c_scale

    # ---- row equilibration (unit inf-norm general rows) ------------------
    if opts.equilibrate:
        if is_structured(A):
            # 2-norm row equilibration (the inf-norm needs dense rows)
            r_scale = _pow2(lax.rsqrt(jnp.maximum(A.row_sq_norms(),
                                                  1e-24)))
            A = A.scale_rows(r_scale)
        else:
            r_scale = _pow2(
                1.0 / jnp.maximum(jnp.max(jnp.abs(A), axis=1), 1e-12))
            A = A * r_scale[:, None]
        lbA = lbA * r_scale          # r_scale > 0: directions and infinities
        ubA = ubA * r_scale          # are preserved
    else:
        r_scale = jnp.ones((m,), dtype)

    # ---- masks and safe bound values ------------------------------------
    mbl, lb_s = _side(lb)
    mbu, ub_s = _side(ub)
    mrl, lbA_s = _side(lbA)
    mru, ubA_s = _side(ubA)
    n_active = (jnp.sum(mbl) + jnp.sum(mbu) + jnp.sum(mrl) + jnp.sum(mru))
    n_active = jnp.maximum(n_active, 1).astype(dtype)

    use_pallas = (opts.chol == "pallas"
                  or (opts.chol == "auto" and jax.default_backend() == "tpu"))
    use_blocked = opts.chol == "blocked"

    eye = jnp.eye(n, dtype=dtype)

    def make_kkt_solver(K):
        """Factor K once, return a rhs -> K^-1 rhs closure.

        With ``opts.scale_kkt``: symmetric Jacobi equilibration before the
        factorisation plus one iterative-refinement backsolve per solve
        (the complementarity diagonals span up to the d_cap and dominate
        the f32 forward error otherwise).
        """
        if opts.scale_kkt:
            dsc = lax.rsqrt(jnp.maximum(jnp.diag(K), 1e-30))
            Ks = K * dsc[:, None] * dsc[None, :]
        else:
            dsc = None
            Ks = K
        if use_pallas:
            f = pchol.chol_factor(Ks)
            slv = lambda r: pchol.chol_solve(f, r)
        elif use_blocked:
            c = xlinalg.cholesky_invdiag(Ks)
            slv = lambda r: xlinalg.cho_solve_invdiag(c[0], c[1], r)
        else:
            f = jnp.linalg.cholesky(Ks)
            slv = lambda r: jax.scipy.linalg.cho_solve((f, True), r)
        if dsc is None:
            return slv

        def solve(r):
            r2 = dsc * r
            u = slv(r2)
            u = u + slv(r2 - Ks @ u)
            return dsc * u

        return solve

    use_centered = (opts.init == "centered" and warm is None and x0 is None)

    if warm is not None and x0 is None:
        x0 = warm.x
    if use_centered:
        # regularised unconstrained minimiser, projected into the box.
        # One extra factorisation, but the start has ~zero dual residual
        # in the unconstrained directions (cold x0 = 0 starts at dual
        # residual |g|, which costs ~10 Mehrotra iterations to burn off on
        # production MPC QPs with 1e5..1e7 soft-weight gradients).
        # shift large enough to stay SPD under TPU f32 matmul error (the
        # per-iteration K gets O(1) complementarity diagonals; K0 does not)
        shift0 = 1e-3 if jnp.finfo(dtype).eps > 1e-10 else 1e-8
        diag0 = shift0 * (1.0 + jnp.max(jnp.abs(jnp.diag(Hs))))
        K0 = Hs + diag0 * eye
        x0 = make_kkt_solver(K0)(-gs)
        x0 = jnp.where(jnp.all(jnp.isfinite(x0)), x0, 0.0)
        x0 = jnp.clip(x0, jnp.where(mbl, lb_s, -jnp.inf),
                      jnp.where(mbu, ub_s, jnp.inf))
    if x0 is None:
        x0 = jnp.zeros((n,), dtype)

    s_floor = opts.s_init if warm is None else opts.warm_floor
    z_floor = opts.z_init if warm is None else opts.warm_floor
    y0 = _mv(A, x0)

    if warm is not None and opts.warm_duals == "centered":
        use_centered = True          # reuse the centered slack/dual placement
    if use_centered:
        # Mehrotra-style shift: make every slack positive by a common
        # offset, then place the duals exactly on the central path
        # (s_i z_i = mu0 for every active side).
        raw = [jnp.where(mbl, x0 - lb_s, jnp.inf),
               jnp.where(mbu, ub_s - x0, jnp.inf),
               jnp.where(mrl, y0 - lbA_s, jnp.inf),
               jnp.where(mru, ubA_s - y0, jnp.inf)]
        smin = jnp.minimum(jnp.minimum(jnp.min(raw[0]), jnp.min(raw[1])),
                           jnp.minimum(jnp.min(raw[2]), jnp.min(raw[3])))
        shift = jnp.maximum(-1.5 * smin, 0.0) + 1e-2
        sbl = jnp.where(mbl, raw[0] + shift, 1.0)
        sbu = jnp.where(mbu, raw[1] + shift, 1.0)
        srl = jnp.where(mrl, raw[2] + shift, 1.0)
        sru = jnp.where(mru, raw[3] + shift, 1.0)
        mu0 = opts.mu0 if warm is None else opts.warm_mu0
        zbl = jnp.where(mbl, mu0 / sbl, 0.0).astype(dtype)
        zbu = jnp.where(mbu, mu0 / sbu, 0.0).astype(dtype)
        zrl = jnp.where(mrl, mu0 / srl, 0.0).astype(dtype)
        zru = jnp.where(mru, mu0 / sru, 0.0).astype(dtype)
    else:
        def slacks_init(y, lo, hi, ml, mu_):
            s_l = jnp.where(ml, jnp.maximum(y - lo, s_floor), 1.0)
            s_u = jnp.where(mu_, jnp.maximum(hi - y, s_floor), 1.0)
            return s_l, s_u

        sbl, sbu = slacks_init(x0, lb_s, ub_s, mbl, mbu)
        srl, sru = slacks_init(y0, lbA_s, ubA_s, mrl, mru)
        if warm is None:
            zbl = jnp.where(mbl, opts.z_init, 0.0).astype(dtype)
            zbu = jnp.where(mbu, opts.z_init, 0.0).astype(dtype)
            zrl = jnp.where(mrl, opts.z_init, 0.0).astype(dtype)
            zru = jnp.where(mru, opts.z_init, 0.0).astype(dtype)
        else:
            # previous duals are for the UNSCALED, UNEQUILIBRATED problem
            wzb = warm.z_bounds * c_scale
            wzr = warm.z_rows * c_scale / r_scale
            zbl = jnp.where(mbl, jnp.maximum(wzb, z_floor), 0.0).astype(dtype)
            zbu = jnp.where(mbu, jnp.maximum(-wzb, z_floor), 0.0).astype(dtype)
            zrl = jnp.where(mrl, jnp.maximum(wzr, z_floor), 0.0).astype(dtype)
            zru = jnp.where(mru, jnp.maximum(-wzr, z_floor), 0.0).astype(dtype)

    def mu_of(state):
        x, sbl, sbu, srl, sru, zbl, zbu, zrl, zru = state
        tot = (jnp.sum(jnp.where(mbl, sbl * zbl, 0.0))
               + jnp.sum(jnp.where(mbu, sbu * zbu, 0.0))
               + jnp.sum(jnp.where(mrl, srl * zrl, 0.0))
               + jnp.sum(jnp.where(mru, sru * zru, 0.0)))
        return tot / n_active

    if opts.comp_resid:
        from .precision import residual_affine
        if not is_structured(A):
            A_Tn = -A.T                  # precomputed once per solve

    def residuals(state):
        x, sbl, sbu, srl, sru, zbl, zbu, zrl, zru = state
        y = _mv(A, x)
        if opts.comp_resid:
            h1, l1 = residual_affine(Hs, x, gs - (zbl - zbu))
            if is_structured(A):
                h2, l2 = A.rmatvec_compensated(-(zrl - zru), h1)
            else:
                h2, l2 = residual_affine(A_Tn, zrl - zru, h1)
            r_dual = h2 + (l2 + l1)
        else:
            r_dual = (Hs @ x + gs - (zbl - zbu) - _rmv(A, zrl - zru))
        r_pbl = jnp.where(mbl, sbl - (x - lb_s), 0.0)
        r_pbu = jnp.where(mbu, sbu - (ub_s - x), 0.0)
        r_prl = jnp.where(mrl, srl - (y - lbA_s), 0.0)
        r_pru = jnp.where(mru, sru - (ubA_s - y), 0.0)
        return r_dual, r_pbl, r_pbu, r_prl, r_pru

    def pres_of(r_pbl, r_pbu, r_prl, r_pru):
        """Primal residual measured in ORIGINAL row units: equilibration
        scales rows by r_scale, so convergence thresholds stay comparable
        with and without it."""
        return jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(r_pbl)), jnp.max(jnp.abs(r_pbu))),
            jnp.maximum(jnp.max(jnp.abs(r_prl / r_scale)),
                        jnp.max(jnp.abs(r_pru / r_scale))))

    def score_fn(pres, dres, mu):
        """Best-iterate ranking score.

        With ``comp_resid`` the dual residual is accurate to ~f32^2, so a
        control-level error of 1e-3 is visible as a ~1e-9 (scaled) dres
        difference -- far below the mu/pres noise floor of the plain
        score.  Rank lexicographically: among converged-ish states (pres
        and mu below the thresholds f32 Mehrotra reliably reaches), rank
        purely by dres; otherwise fall back to the combined score plus an
        offset that keeps every non-converged state behind every converged
        one."""
        base = pres + 10.0 * dres + mu
        if not opts.comp_resid:
            return base
        ok = (pres < 1e-4) & (mu < 1e-6)
        return jnp.where(ok, dres, 1e3 + base)

    def iterate(state, regm):
        x, sbl, sbu, srl, sru, zbl, zbu, zrl, zru = state
        mu = mu_of(state)
        r_dual, r_pbl, r_pbu, r_prl, r_pru = residuals(state)
        pres_in = pres_of(r_pbl, r_pbu, r_prl, r_pru)
        dres_in = jnp.max(jnp.abs(r_dual))
        score_in = score_fn(pres_in, dres_in, mu)

        if opts.freeze is not None:
            fp, fd, fm = opts.freeze
            frozen = (pres_in < fp) & (dres_in < fd) & (mu < fm)
        else:
            frozen = jnp.zeros((), jnp.bool_)

        # diagonal complementarity scalings (masked sides contribute 0).
        # Cap them: near convergence z/s reaches 1/eps^2 and the KKT matrix
        # goes numerically indefinite (observed cond ~1e22 in f64 -> Cholesky
        # breakdown); the cap bounds the condition number without affecting
        # the active-set identification.
        d_cap = 1e14 if jnp.finfo(dtype).eps < 1e-10 else 1e7
        dbl = jnp.clip(jnp.where(mbl, zbl / sbl, 0.0), 0.0, d_cap)
        dbu = jnp.clip(jnp.where(mbu, zbu / sbu, 0.0), 0.0, d_cap)
        drl = jnp.clip(jnp.where(mrl, zrl / srl, 0.0), 0.0, d_cap)
        dru = jnp.clip(jnp.where(mru, zru / sru, 0.0), 0.0, d_cap)

        D_b = dbl + dbu
        D_r = drl + dru

        K = Hs + _qf(A, D_r) + jnp.diag(D_b)
        # static regularisation relative to the *Hessian* scale only -- the
        # complementarity diagonals z/s grow unboundedly near convergence and
        # must not inflate the shift (that freezes the dual residual).
        # ``regm`` is the inertia-correction multiplier: it grows 100x after
        # each factorisation breakdown (non-finite iterate) so the next
        # attempt from the SAME state succeeds instead of looping on NaN.
        K = K + opts.reg * regm * (1.0 + jnp.max(jnp.abs(jnp.diag(Hs)))) * eye
        ksolve = make_kkt_solver(K)

        def kkt_solve(rc_bl, rc_bu, rc_rl, rc_ru):
            """Assemble reduced rhs and back out all direction components."""
            t_b = (jnp.where(mbl, (rc_bl + zbl * r_pbl) / sbl, 0.0)
                   - jnp.where(mbu, (rc_bu + zbu * r_pbu) / sbu, 0.0))
            t_r = (jnp.where(mrl, (rc_rl + zrl * r_prl) / srl, 0.0)
                   - jnp.where(mru, (rc_ru + zru * r_pru) / sru, 0.0))
            rhs = -r_dual + t_b + _rmv(A, t_r)
            dx = ksolve(rhs)
            dy = _mv(A, dx)
            dsbl = jnp.where(mbl, dx - r_pbl, 0.0)
            dsbu = jnp.where(mbu, -dx - r_pbu, 0.0)
            dsrl = jnp.where(mrl, dy - r_prl, 0.0)
            dsru = jnp.where(mru, -dy - r_pru, 0.0)
            dzbl = jnp.where(mbl, (rc_bl - zbl * dsbl) / sbl, 0.0)
            dzbu = jnp.where(mbu, (rc_bu - zbu * dsbu) / sbu, 0.0)
            dzrl = jnp.where(mrl, (rc_rl - zrl * dsrl) / srl, 0.0)
            dzru = jnp.where(mru, (rc_ru - zru * dsru) / sru, 0.0)
            return dx, (dsbl, dsbu, dsrl, dsru), (dzbl, dzbu, dzrl, dzru)

        def max_step(s, ds, mask):
            """Largest alpha in (0, 1] keeping s + alpha ds >= (1-tau) s."""
            lim = jnp.where(mask & (ds < 0), -opts.tau * s / jnp.minimum(ds, -1e-30), 1.0)
            return jnp.minimum(1.0, jnp.min(lim))

        # ---- predictor (affine) step ------------------------------------
        rc = lambda s, z, mask: jnp.where(mask, -s * z, 0.0)
        dx_a, ds_a, dz_a = kkt_solve(rc(sbl, zbl, mbl), rc(sbu, zbu, mbu),
                                     rc(srl, zrl, mrl), rc(sru, zru, mru))
        a_p = jnp.minimum(jnp.minimum(max_step(sbl, ds_a[0], mbl),
                                      max_step(sbu, ds_a[1], mbu)),
                          jnp.minimum(max_step(srl, ds_a[2], mrl),
                                      max_step(sru, ds_a[3], mru)))
        a_d = jnp.minimum(jnp.minimum(max_step(zbl, dz_a[0], mbl),
                                      max_step(zbu, dz_a[1], mbu)),
                          jnp.minimum(max_step(zrl, dz_a[2], mrl),
                                      max_step(zru, dz_a[3], mru)))

        def aff_mu():
            tot = (jnp.sum(jnp.where(mbl, (sbl + a_p * ds_a[0]) * (zbl + a_d * dz_a[0]), 0.0))
                   + jnp.sum(jnp.where(mbu, (sbu + a_p * ds_a[1]) * (zbu + a_d * dz_a[1]), 0.0))
                   + jnp.sum(jnp.where(mrl, (srl + a_p * ds_a[2]) * (zrl + a_d * dz_a[2]), 0.0))
                   + jnp.sum(jnp.where(mru, (sru + a_p * ds_a[3]) * (zru + a_d * dz_a[3]), 0.0)))
            return tot / n_active

        mu_aff = aff_mu()
        sigma = jnp.clip((mu_aff / jnp.maximum(mu, 1e-300)) ** 3, 0.0, 1.0)

        # ---- corrector step ---------------------------------------------
        rc2 = lambda s, z, ds, dz, mask: jnp.where(
            mask, sigma * mu - s * z - ds * dz, 0.0)
        rc_c = (rc2(sbl, zbl, ds_a[0], dz_a[0], mbl),
                rc2(sbu, zbu, ds_a[1], dz_a[1], mbu),
                rc2(srl, zrl, ds_a[2], dz_a[2], mrl),
                rc2(sru, zru, ds_a[3], dz_a[3], mru))
        dx, ds, dz = kkt_solve(*rc_c)

        def steps_of(ds, dz):
            a_p = jnp.minimum(jnp.minimum(max_step(sbl, ds[0], mbl),
                                          max_step(sbu, ds[1], mbu)),
                              jnp.minimum(max_step(srl, ds[2], mrl),
                                          max_step(sru, ds[3], mru)))
            a_d = jnp.minimum(jnp.minimum(max_step(zbl, dz[0], mbl),
                                          max_step(zbu, dz[1], mbu)),
                              jnp.minimum(max_step(zrl, dz[2], mrl),
                                          max_step(zru, dz[3], mru)))
            return a_p, a_d

        a_p, a_d = steps_of(ds, dz)

        # ---- Gondzio centrality correctors --------------------------------
        # Reuse the factorisation: push outlier complementarity products of
        # the TRIAL point back into [beta_min, beta_max] * mu_t.  Accept a
        # corrected direction only if it extends both step lengths.
        mu_t = sigma * mu
        svars = (sbl, sbu, srl, sru)
        zvars = (zbl, zbu, zrl, zru)
        masks = (mbl, mbu, mrl, mru)
        for _ in range(opts.correctors):
            ap_t = jnp.minimum(a_p + 0.1, 1.0)
            ad_t = jnp.minimum(a_d + 0.1, 1.0)
            rc_g = []
            for s_v, z_v, ds_v, dz_v, mk, rc_v in zip(
                    svars, zvars, ds, dz, masks, rc_c):
                comp = (s_v + ap_t * ds_v) * (z_v + ad_t * dz_v)
                target = jnp.clip(comp, 0.1 * mu_t, 10.0 * mu_t)
                rc_g.append(jnp.where(mk, rc_v + (target - comp), 0.0))
            dx2, ds2, dz2 = kkt_solve(*rc_g)
            a_p2, a_d2 = steps_of(ds2, dz2)
            better = (a_p2 >= a_p) & (a_d2 >= a_d)
            pick = lambda a, b: jnp.where(better, a, b)
            dx = pick(dx2, dx)
            ds = jax.tree_util.tree_map(pick, ds2, ds)
            dz = jax.tree_util.tree_map(pick, dz2, dz)
            a_p = jnp.where(better, a_p2, a_p)
            a_d = jnp.where(better, a_d2, a_d)

        x_n = x + a_p * dx
        sbl_n = jnp.where(mbl, sbl + a_p * ds[0], 1.0)
        sbu_n = jnp.where(mbu, sbu + a_p * ds[1], 1.0)
        srl_n = jnp.where(mrl, srl + a_p * ds[2], 1.0)
        sru_n = jnp.where(mru, sru + a_p * ds[3], 1.0)
        zbl_n = jnp.where(mbl, zbl + a_d * dz[0], 0.0)
        zbu_n = jnp.where(mbu, zbu + a_d * dz[1], 0.0)
        zrl_n = jnp.where(mrl, zrl + a_d * dz[2], 0.0)
        zru_n = jnp.where(mru, zru + a_d * dz[3], 0.0)
        new = (x_n, sbl_n, sbu_n, srl_n, sru_n, zbl_n, zbu_n, zrl_n, zru_n)
        # NaN rejection + convergence freeze: a failed factorisation (or a
        # post-convergence excursion) must not destroy the good iterate.
        good = (jnp.all(jnp.stack([jnp.all(jnp.isfinite(v)) for v in new]))
                & jnp.logical_not(frozen))
        kept = jax.tree_util.tree_map(
            lambda a, b: jnp.where(good, a, b), new,
            (x, sbl, sbu, srl, sru, zbl, zbu, zrl, zru))
        return kept, good, score_in

    state0 = (x0.astype(dtype), sbl, sbu, srl, sru, zbl, zbu, zrl, zru)

    def score_of(state):
        """Combined optimality score for best-iterate tracking."""
        r_dual, r_pbl, r_pbu, r_prl, r_pru = residuals(state)
        pres = pres_of(r_pbl, r_pbu, r_prl, r_pru)
        return score_fn(pres, jnp.max(jnp.abs(r_dual)), mu_of(state))

    def converged(state):
        r_dual, r_pbl, r_pbu, r_prl, r_pru = residuals(state)
        pres = pres_of(r_pbl, r_pbu, r_prl, r_pru)
        dres = jnp.max(jnp.abs(r_dual))
        return (pres < opts.tol) & (dres < opts.tol) & (mu_of(state) < opts.tol)

    inf_score = jnp.asarray(jnp.inf, dtype)
    regm0 = jnp.asarray(1.0, dtype)

    def regm_next(regm, good):
        # breakdown -> escalate 100x; success -> decay back toward 1
        return jnp.where(good, jnp.maximum(regm * 0.1, 1.0),
                         jnp.minimum(regm * 100.0, 1e12))

    if opts.adaptive:
        def cond(carry):
            it, state, best, bscore, regm = carry
            return (it < opts.max_iters) & jnp.logical_not(converged(state))

        def body(carry):
            it, state, best, bscore, regm = carry
            # iterate returns the score of its INCOMING state (residuals are
            # computed there anyway); track the best pre-state cheaply
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

    # return the best iterate seen (f32 trajectories can degrade after
    # convergence; the last iterate is not necessarily the best)
    final_better = score_of(state) < bscore
    state = jax.tree_util.tree_map(
        lambda a, b: jnp.where(final_better, a, b), state, best)

    if opts.polish > 0:
        state = _polish(state, Hs, gs, A, lb_s, ub_s, lbA_s, ubA_s,
                        (mbl, mbu, mrl, mru), opts, eye,
                        use_pallas, use_blocked, score_of)

    x = state[0]
    r_dual, r_pbl, r_pbu, r_prl, r_pru = residuals(state)
    pres = pres_of(r_pbl, r_pbu, r_prl, r_pru)
    obj = 0.5 * x @ (H @ x) + g @ x
    return IpmResult(
        x=x,
        z_bounds=(state[5] - state[6]) / c_scale,
        z_rows=(state[7] - state[8]) * r_scale / c_scale,
        iterations=iters,
        mu=mu_of(state) / c_scale,
        primal_res=pres,
        dual_res=jnp.max(jnp.abs(r_dual)) / c_scale,
        objective=obj,
    )


# float32 preset for on-TPU solves: residuals bottom out near f32 epsilon,
# so run a fixed iteration budget with a matching tolerance and heavier
# regularisation.
# max_iters=12: warm-started receding-horizon accuracy saturates there
# (scripts/accuracy_iters.py: warm12 == warm16 to 1e-4 on fsg2019 ticks)
F32_OPTS = IpmOptions(max_iters=12, tol=5e-7, reg=1e-7, adaptive=False,
                      freeze=(1e-4, 1e-5, 1e-7))

# accuracy-certified float32 preset: Jacobi-equilibrated KKT solves with a
# refinement backsolve, error-free-transform dual residuals, one
# compensated delta-form restart, and power-of-two internal scalings
# (:func:`_pow2` -- roundoff-free, so the solver adds no data
# perturbation of its own).  Measured ON THE TPU CHIP (round 3,
# ACCURACY_TPU.json) on production warm-tick QPs (fsg2019 dynamic LTV,
# N=40, the shipped dense assembly) against a tight f64 solve of the
# SAME data:
#   max feasibility violation   ~2.3e-6
#   first-control error         ~2.8e-3   (F32_OPTS: 6.6e-2)
#   mean control error          ~7.5e-4   (F32_OPTS: 5.9e-3)
#   p99 control error           ~1.1e-2
# The remaining tail error lives in near-tie late-horizon steering-rate
# components, whose intrinsic sensitivity is ~4e-2 per 1e-6 RELATIVE
# data perturbation (measured, tests/test_f32_accuracy.py); the pure
# data-representation floor (f64 solve of f32-cast data) is ~6e-4 on
# the first controls, so the preset sits within ~4x of what any f32
# solver could achieve.
F32_ACCURATE = IpmOptions(max_iters=16, tol=5e-7, reg=1e-7, adaptive=False,
                          scale_kkt=True, comp_resid=True,
                          refine_restart=1, refine_iters=8)

# middle of the measured accuracy/throughput frontier (round 4,
# PRESET_MAP.json): ONE cheap delta-form restart round on top of
# F32_OPTS.  On production QPs vs tight f64: first-control max 8.8e-3,
# mean 5.8e-4, p99 9.2e-3 (MEETS the BASELINE accuracy bars) at 4,906
# solves/s on the chip -- 2.9x F32_ACCURATE's throughput at ~3x its
# error.  The full frontier measurement (single-ingredient variants all
# mapped; scale_kkt / comp_resid / polish alone do NOT move the
# first-control error -- only the delta-form restart does) is the
# committed PRESET_MAP.json.
F32_BALANCED = IpmOptions(max_iters=12, tol=5e-7, reg=1e-7, adaptive=False,
                          freeze=(1e-4, 1e-5, 1e-7),
                          refine_restart=1, refine_iters=4)

# FIRST preset measured to meet BOTH BASELINE bars at once (round 5,
# PRESET_MAP.json "RICCATI(ss)+restart2(6it)"): run it on the stage-wise
# Riccati backend (backend="riccati"), whose slack-variable scaling +
# two delta-form restart rounds give, on COLD production QPs vs tight
# f64 ON THE CHIP:
#   16,579 solves/s   (bar: >= 10,000)
#   3.6e-3 first-control max error (bar: <= 1e-2)
#   4.6e-4 mean control error      (bar: <= 1e-3)
# Warm receding-horizon chains are ~2x more accurate still
# (RICCATI_VALIDATION.json warm rows).  The restart mechanism is
# ops.riccati.solve_stage_qp's refine_restart; on the dense backend this
# preset is also valid but slower (see "+restart2(4it,light)" rows).
F32_PRODUCTION = IpmOptions(max_iters=12, tol=5e-7, reg=1e-7,
                            adaptive=False, freeze=(1e-4, 1e-5, 1e-7),
                            refine_restart=2, refine_iters=6,
                            refine_comp=False)


solve_qp_batched = jax.vmap(
    solve_qp, in_axes=(0, 0, 0, 0, 0, 0, 0, None), out_axes=0)
