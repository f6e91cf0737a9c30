"""Batched dense primal-dual interior-point QP solver.

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


@dataclasses.dataclass(frozen=True)
class IpmOptions:
    max_iters: int = 40
    tol: float = 1e-12         # residual tolerance (on the scaled problem;
                               # the internal cost scaling divides the
                               # reference's 1e8 soft weights through, so
                               # meaningful control accuracy needs ~1e-12)
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


def _side(val, x_of, sign):
    """Prepare one inequality side: finite mask and signed residual anchor."""
    finite = jnp.isfinite(val)
    safe = jnp.where(finite, val, 0.0)
    return finite, safe


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
    n = g.shape[0]
    m = lbA.shape[0]

    # ---- objective scaling (keeps 1e8 soft costs f32-safe) --------------
    gmax = jnp.maximum(jnp.max(jnp.abs(g)), jnp.max(jnp.abs(H)))
    c_scale = 1.0 / jnp.maximum(gmax, 1.0)
    Hs = H * c_scale
    gs = g * c_scale

    # ---- masks and safe bound values ------------------------------------
    mbl, lb_s = _side(lb, None, +1)
    mbu, ub_s = _side(ub, None, -1)
    mrl, lbA_s = _side(lbA, None, +1)
    mru, ubA_s = _side(ubA, None, -1)
    n_active = (jnp.sum(mbl) + jnp.sum(mbu) + jnp.sum(mrl) + jnp.sum(mru))
    n_active = jnp.maximum(n_active, 1).astype(dtype)

    use_pallas = (opts.chol == "pallas"
                  or (opts.chol == "auto" and jax.default_backend() == "tpu"))
    use_blocked = opts.chol == "blocked"

    if warm is not None and x0 is None:
        x0 = warm.x
    if x0 is None:
        x0 = jnp.zeros((n,), dtype)

    s_floor = opts.s_init if warm is None else 1e-3
    z_floor = opts.z_init if warm is None else 1e-3

    def slacks_init(y, lo, hi, ml, mu_):
        s_l = jnp.where(ml, jnp.maximum(y - lo, s_floor), 1.0)
        s_u = jnp.where(mu_, jnp.maximum(hi - y, s_floor), 1.0)
        return s_l, s_u

    y0 = A @ x0
    sbl, sbu = slacks_init(x0, lb_s, ub_s, mbl, mbu)
    srl, sru = slacks_init(y0, lbA_s, ubA_s, mrl, mru)
    if warm is None:
        zbl = jnp.where(mbl, opts.z_init, 0.0).astype(dtype)
        zbu = jnp.where(mbu, opts.z_init, 0.0).astype(dtype)
        zrl = jnp.where(mrl, opts.z_init, 0.0).astype(dtype)
        zru = jnp.where(mru, opts.z_init, 0.0).astype(dtype)
    else:
        # previous combined duals are for the UNSCALED problem; rescale
        wzb = warm.z_bounds * c_scale
        wzr = warm.z_rows * c_scale
        zbl = jnp.where(mbl, jnp.maximum(wzb, z_floor), 0.0).astype(dtype)
        zbu = jnp.where(mbu, jnp.maximum(-wzb, z_floor), 0.0).astype(dtype)
        zrl = jnp.where(mrl, jnp.maximum(wzr, z_floor), 0.0).astype(dtype)
        zru = jnp.where(mru, jnp.maximum(-wzr, z_floor), 0.0).astype(dtype)

    eye = jnp.eye(n, dtype=dtype)

    def mu_of(state):
        x, sbl, sbu, srl, sru, zbl, zbu, zrl, zru = state
        tot = (jnp.sum(jnp.where(mbl, sbl * zbl, 0.0))
               + jnp.sum(jnp.where(mbu, sbu * zbu, 0.0))
               + jnp.sum(jnp.where(mrl, srl * zrl, 0.0))
               + jnp.sum(jnp.where(mru, sru * zru, 0.0)))
        return tot / n_active

    def residuals(state):
        x, sbl, sbu, srl, sru, zbl, zbu, zrl, zru = state
        y = A @ x
        r_dual = (Hs @ x + gs - (zbl - zbu) - A.T @ (zrl - zru))
        r_pbl = jnp.where(mbl, sbl - (x - lb_s), 0.0)
        r_pbu = jnp.where(mbu, sbu - (ub_s - x), 0.0)
        r_prl = jnp.where(mrl, srl - (y - lbA_s), 0.0)
        r_pru = jnp.where(mru, sru - (ubA_s - y), 0.0)
        return r_dual, r_pbl, r_pbu, r_prl, r_pru

    def iterate(state):
        x, sbl, sbu, srl, sru, zbl, zbu, zrl, zru = state
        mu = mu_of(state)
        r_dual, r_pbl, r_pbu, r_prl, r_pru = residuals(state)
        pres_in = jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(r_pbl)), jnp.max(jnp.abs(r_pbu))),
            jnp.maximum(jnp.max(jnp.abs(r_prl)), jnp.max(jnp.abs(r_pru))))
        dres_in = jnp.max(jnp.abs(r_dual))
        score_in = pres_in + 10.0 * dres_in + mu

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

        K = Hs + (A.T * D_r) @ A + jnp.diag(D_b)
        # static regularisation relative to the *Hessian* scale only -- the
        # complementarity diagonals z/s grow unboundedly near convergence and
        # must not inflate the shift (that freezes the dual residual).
        K = K + opts.reg * (1.0 + jnp.max(jnp.abs(jnp.diag(Hs)))) * eye
        if use_pallas:
            chol = pchol.chol_factor(K)
        elif use_blocked:
            chol = xlinalg.cholesky_invdiag(K)
        else:
            chol = jnp.linalg.cholesky(K)

        def kkt_solve(rc_bl, rc_bu, rc_rl, rc_ru):
            """Assemble reduced rhs and back out all direction components."""
            t_b = (jnp.where(mbl, (rc_bl + zbl * r_pbl) / sbl, 0.0)
                   - jnp.where(mbu, (rc_bu + zbu * r_pbu) / sbu, 0.0))
            t_r = (jnp.where(mrl, (rc_rl + zrl * r_prl) / srl, 0.0)
                   - jnp.where(mru, (rc_ru + zru * r_pru) / sru, 0.0))
            rhs = -r_dual + t_b + A.T @ t_r
            if use_pallas:
                dx = pchol.chol_solve(chol, rhs)
            elif use_blocked:
                dx = xlinalg.cho_solve_invdiag(chol[0], chol[1], rhs)
            else:
                dx = jax.scipy.linalg.cho_solve((chol, True), rhs)
            dy = A @ dx
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
        dx, ds, dz = kkt_solve(
            rc2(sbl, zbl, ds_a[0], dz_a[0], mbl),
            rc2(sbu, zbu, ds_a[1], dz_a[1], mbu),
            rc2(srl, zrl, ds_a[2], dz_a[2], mrl),
            rc2(sru, zru, ds_a[3], dz_a[3], mru))

        a_p = jnp.minimum(jnp.minimum(max_step(sbl, ds[0], mbl),
                                      max_step(sbu, ds[1], mbu)),
                          jnp.minimum(max_step(srl, ds[2], mrl),
                                      max_step(sru, ds[3], mru)))
        a_d = jnp.minimum(jnp.minimum(max_step(zbl, dz[0], mbl),
                                      max_step(zbu, dz[1], mbu)),
                          jnp.minimum(max_step(zrl, dz[2], mrl),
                                      max_step(zru, dz[3], mru)))

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
        pres = jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(r_pbl)), jnp.max(jnp.abs(r_pbu))),
            jnp.maximum(jnp.max(jnp.abs(r_prl)), jnp.max(jnp.abs(r_pru))))
        return pres + 10.0 * jnp.max(jnp.abs(r_dual)) + mu_of(state)

    def converged(state):
        r_dual, r_pbl, r_pbu, r_prl, r_pru = residuals(state)
        pres = jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(r_pbl)), jnp.max(jnp.abs(r_pbu))),
            jnp.maximum(jnp.max(jnp.abs(r_prl)), jnp.max(jnp.abs(r_pru))))
        dres = jnp.max(jnp.abs(r_dual))
        return (pres < opts.tol) & (dres < opts.tol) & (mu_of(state) < opts.tol)

    inf_score = jnp.asarray(jnp.inf, dtype)
    if opts.adaptive:
        def cond(carry):
            it, state, best, bscore, ok = carry
            return (it < opts.max_iters) & ok & jnp.logical_not(converged(state))

        def body(carry):
            it, state, best, bscore, _ = carry
            # iterate returns the score of its INCOMING state (residuals are
            # computed there anyway); track the best pre-state cheaply
            new_state, good, sc = iterate(state)
            better = sc < bscore
            best = jax.tree_util.tree_map(
                lambda a, b: jnp.where(better, a, b), state, best)
            bscore = jnp.where(better, sc, bscore)
            return it + 1, new_state, best, bscore, good

        iters, state, best, bscore, _ = lax.while_loop(
            cond, body,
            (jnp.zeros((), jnp.int32), state0, state0, inf_score,
             jnp.ones((), jnp.bool_)))
    else:
        def body(i, carry):
            state, best, bscore = carry
            new_state, _, sc = iterate(state)
            better = sc < bscore
            best = jax.tree_util.tree_map(
                lambda a, b: jnp.where(better, a, b), state, best)
            bscore = jnp.where(better, sc, bscore)
            return new_state, best, bscore

        state, best, bscore = lax.fori_loop(
            0, opts.max_iters, body, (state0, state0, inf_score))
        iters = jnp.asarray(opts.max_iters, jnp.int32)

    # return the best iterate seen (f32 trajectories can degrade after
    # convergence; the last iterate is not necessarily the best)
    final_better = score_of(state) < bscore
    state = jax.tree_util.tree_map(
        lambda a, b: jnp.where(final_better, a, b), state, best)

    x = state[0]
    r_dual, r_pbl, r_pbu, r_prl, r_pru = residuals(state)
    pres = jnp.maximum(
        jnp.maximum(jnp.max(jnp.abs(r_pbl)), jnp.max(jnp.abs(r_pbu))),
        jnp.maximum(jnp.max(jnp.abs(r_prl)), jnp.max(jnp.abs(r_pru))))
    obj = 0.5 * x @ (H @ x) + g @ x
    return IpmResult(
        x=x,
        z_bounds=(state[5] - state[6]) / c_scale,
        z_rows=(state[7] - state[8]) / c_scale,
        iterations=iters,
        mu=mu_of(state) / c_scale,
        primal_res=pres,
        dual_res=jnp.max(jnp.abs(r_dual)) / c_scale,
        objective=obj,
    )


# float32 preset for on-TPU solves: residuals bottom out near f32 epsilon,
# so run a fixed iteration budget with a matching tolerance and heavier
# regularisation.
F32_OPTS = IpmOptions(max_iters=12, tol=5e-7, reg=1e-7, adaptive=False,
                      freeze=(1e-4, 1e-5, 1e-7))


solve_qp_batched = jax.vmap(
    solve_qp, in_axes=(0, 0, 0, 0, 0, 0, 0, None), out_axes=0)
