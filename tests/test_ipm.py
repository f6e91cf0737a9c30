"""IPM QP solver tests: hand-solvable cases, KKT optimality certificates,
scipy SLSQP cross-checks, masked infinite bounds, batching, and f32.

(The reference validated its solvers only through closed-loop behaviour;
here the QP layer gets direct golden tests per SURVEY.md section 4.)
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.optimize import minimize

from fsae_mpc_tpu.ops import IpmOptions, solve_qp


def _solve(H, g, A, lb, ub, lbA, ubA, **kw):
    return solve_qp(jnp.asarray(H, jnp.float64), jnp.asarray(g, jnp.float64),
                    jnp.asarray(A, jnp.float64), jnp.asarray(lb, jnp.float64),
                    jnp.asarray(ub, jnp.float64), jnp.asarray(lbA, jnp.float64),
                    jnp.asarray(ubA, jnp.float64), **kw)


def test_unconstrained_quadratic():
    H = np.diag([2.0, 4.0])
    g = np.array([-2.0, -8.0])
    A = np.zeros((1, 2))
    res = _solve(H, g, A, [-np.inf] * 2, [np.inf] * 2, [-np.inf], [np.inf])
    np.testing.assert_allclose(np.asarray(res.x), [1.0, 2.0], atol=1e-7)


def test_active_bound():
    # min (x-3)^2 s.t. x <= 1  ->  x = 1
    H = np.array([[2.0]])
    g = np.array([-6.0])
    A = np.zeros((1, 1))
    res = _solve(H, g, A, [-np.inf], [1.0], [-np.inf], [np.inf])
    np.testing.assert_allclose(np.asarray(res.x), [1.0], atol=1e-7)
    # stationarity Hx + g - z_bounds = 0 with z = z_l - z_u => z = -4
    assert abs(float(res.z_bounds[0]) + 4.0) < 1e-5


def test_equality_like_row():
    # min x1^2 + x2^2 s.t. x1 + x2 = 1 (tight two-sided row)
    H = 2.0 * np.eye(2)
    g = np.zeros(2)
    A = np.array([[1.0, 1.0]])
    res = _solve(H, g, A, [-np.inf] * 2, [np.inf] * 2, [1.0], [1.0])
    np.testing.assert_allclose(np.asarray(res.x), [0.5, 0.5], atol=1e-6)


def _random_qp(rng, n, m):
    M = rng.normal(size=(n, n))
    H = M @ M.T + n * np.eye(n)
    g = rng.normal(size=n) * 2.0
    A = rng.normal(size=(m, n))
    lb = -1.0 - rng.uniform(size=n)
    ub = 1.0 + rng.uniform(size=n)
    lbA = -1.0 - rng.uniform(size=m)
    ubA = 1.0 + rng.uniform(size=m)
    return H, g, A, lb, ub, lbA, ubA


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_qp_vs_slsqp(seed):
    rng = np.random.default_rng(seed)
    n, m = 6, 4
    H, g, A, lb, ub, lbA, ubA = _random_qp(rng, n, m)

    res = _solve(H, g, A, lb, ub, lbA, ubA)

    cons = [{"type": "ineq", "fun": lambda x: A @ x - lbA,
             "jac": lambda x: A},
            {"type": "ineq", "fun": lambda x: ubA - A @ x,
             "jac": lambda x: -A}]
    ref = minimize(lambda x: 0.5 * x @ H @ x + g @ x, np.zeros(n),
                   jac=lambda x: H @ x + g, bounds=list(zip(lb, ub)),
                   constraints=cons, method="SLSQP",
                   options={"maxiter": 200, "ftol": 1e-12})
    assert ref.success
    np.testing.assert_allclose(np.asarray(res.x), ref.x, atol=1e-6)
    np.testing.assert_allclose(float(res.objective), ref.fun, atol=1e-7)


def test_kkt_certificate_with_soft_slack_structure():
    """QP shaped like the reference's: zero Hessian block for the slack,
    huge linear cost 1e8, slack >= 0, rows coupling slack (+-1)."""
    rng = np.random.default_rng(3)
    n_u, n_s = 8, 1
    n = n_u + n_s
    M = rng.normal(size=(n_u, n_u))
    H = np.zeros((n, n))
    H[:n_u, :n_u] = M @ M.T + np.eye(n_u)
    g = np.concatenate([rng.normal(size=n_u), [1e8]])
    # rows: y_i - slack <= c_i and y_i + slack >= -c_i with tight c => slack active
    C = rng.normal(size=(3, n_u))
    A = np.zeros((6, n))
    A[:3, :n_u] = C
    A[:3, n_u] = 1.0
    A[3:, :n_u] = C
    A[3:, n_u] = -1.0
    lbA = np.concatenate([np.full(3, -0.001), np.full(3, -np.inf)])
    ubA = np.concatenate([np.full(3, np.inf), np.full(3, 0.001)])
    lb = np.concatenate([np.full(n_u, -10.0), [0.0]])
    ub = np.concatenate([np.full(n_u, 10.0), [np.inf]])

    res = _solve(H, g, A, lb, ub, lbA, ubA)
    x = np.asarray(res.x)

    # feasibility
    y = A @ x
    assert np.all(y >= lbA - 1e-6) and np.all(y <= ubA + 1e-6)
    assert np.all(x >= lb - 1e-8) and np.all(x <= ub + 1e-8)
    # stationarity: Hx + g - A'z - w = 0 with recovered duals
    z = np.asarray(res.z_rows)
    w = np.asarray(res.z_bounds)
    r = H @ x + g - A.T @ z - w
    assert np.max(np.abs(r)) < 1e-3 * max(1.0, np.max(np.abs(g)))


def test_one_sided_rows_masked():
    # only upper side finite: min x^2 - 2x s.t. 2x <= 1
    H = np.array([[2.0]])
    g = np.array([-2.0])
    A = np.array([[2.0]])
    res = _solve(H, g, A, [-np.inf], [np.inf], [-np.inf], [1.0])
    np.testing.assert_allclose(np.asarray(res.x), [0.5], atol=1e-7)


def test_batched_vmap():
    rng = np.random.default_rng(7)
    B, n, m = 16, 5, 3
    Hs, gs, As, lbs, ubs, lbAs, ubAs = [], [], [], [], [], [], []
    for _ in range(B):
        H, g, A, lb, ub, lbA, ubA = _random_qp(rng, n, m)
        Hs.append(H); gs.append(g); As.append(A)
        lbs.append(lb); ubs.append(ub); lbAs.append(lbA); ubAs.append(ubA)
    args = [jnp.asarray(np.stack(v), jnp.float64)
            for v in (Hs, gs, As, lbs, ubs, lbAs, ubAs)]
    batched = jax.vmap(lambda *a: solve_qp(*a))( *args)
    for i in range(B):
        single = _solve(Hs[i], gs[i], As[i], lbs[i], ubs[i], lbAs[i], ubAs[i])
        np.testing.assert_allclose(np.asarray(batched.x[i]),
                                   np.asarray(single.x), atol=1e-7)


def test_float32_accuracy():
    rng = np.random.default_rng(11)
    H, g, A, lb, ub, lbA, ubA = _random_qp(rng, 6, 4)
    gold = _solve(H, g, A, lb, ub, lbA, ubA)
    f32 = solve_qp(*[jnp.asarray(v, jnp.float32)
                     for v in (H, g, A, lb, ub, lbA, ubA)],
                   IpmOptions(tol=1e-6, reg=1e-7))
    np.testing.assert_allclose(np.asarray(f32.x), np.asarray(gold.x),
                               atol=2e-4)


def test_fixed_iteration_mode_matches():
    rng = np.random.default_rng(13)
    H, g, A, lb, ub, lbA, ubA = _random_qp(rng, 6, 4)
    gold = _solve(H, g, A, lb, ub, lbA, ubA)
    fixed = _solve(H, g, A, lb, ub, lbA, ubA,
                   opts=IpmOptions(adaptive=False, max_iters=30))
    np.testing.assert_allclose(np.asarray(fixed.x), np.asarray(gold.x),
                               atol=1e-7)
