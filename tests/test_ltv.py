"""LTV-MPC tests: QP assembly cross-checked against SLSQP on the same
problem, constraint satisfaction, and a short closed-prediction sanity run."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.optimize import minimize

from fsae_mpc_tpu.config import MPCParams, VehicleParams
from fsae_mpc_tpu.mpc import ltv
from fsae_mpc_tpu.ops import ipm
from fsae_mpc_tpu.track import track_from_points


@pytest.fixture(scope="module")
def circ():
    R, n = 25.0, 48
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    return track_from_points(R * np.cos(th), R * np.sin(th), n_segments=96,
                             dtype=jnp.float64)


def _ref_and_lin(nx, N, dt, v0=8.0):
    """Speed-ramp reference + rolling linearisation guess (main.m:44-48,106-114)."""
    x_ref = np.zeros((N, nx))
    v_ref = np.minimum(v0 + 10 * dt * np.arange(1, N + 1), 20.0)
    x_ref[:, 3] = v_ref
    x_ref[:, 0] = np.cumsum(v_ref * dt)
    x_lin = np.zeros((N, nx))
    x_lin[:, 0] = v0 * dt * np.arange(1, N + 1)
    x_lin[:, 3] = v0
    u_lin = np.zeros((N, 2))
    return jnp.asarray(x_ref), jnp.asarray(x_lin), jnp.asarray(u_lin)


def test_kinematic_qp_matches_slsqp(circ):
    N = 8
    mpc = MPCParams(n_steps=N)
    params = VehicleParams()
    x_ref, x_lin, u_lin = _ref_and_lin(5, N, mpc.dt)
    x0 = jnp.asarray([0.0, 0.1, 0.05, 8.0, 0.0])

    res = ltv.ltv_mpc_kinematic(x0, x_ref, circ, params, mpc, x_lin, u_lin)

    # independently re-solve the same assembled QP with scipy
    from fsae_mpc_tpu.models import integrators, curvilinear as cm
    from fsae_mpc_tpu.ops.condense import condense, rollout
    from fsae_mpc_tpu.mpc import constraints as cons
    f = lambda x, u: cm.f_curv_kin(x, u, circ, params)
    step = lambda x, u: integrators.rk2_step(f, x, u, mpc.dt)
    Ad, Bd, dd = integrators.linearize_discrete(step, x_lin, u_lin)
    A_bar, B_bar, d_bar = condense(Ad, Bd, dd)
    q = jnp.asarray([5.0, 250.0, 2000.0, 0.0, 0.0], jnp.float64)
    q_diag = jnp.concatenate([jnp.tile(q, N - 1), q * 10.0])
    r_diag = jnp.tile(jnp.asarray([10.0, 10.0], jnp.float64), N)
    groups = [
        cons.state_box_group([3, 4], np.array([0.0, -0.4]),
                             np.array([np.inf, 0.4]), np.array([-1, -1]),
                             x_lin, u_lin),
        cons.state_box_group([1], np.array([-0.75]), np.array([0.75]),
                             np.array([0]), x_lin, u_lin),
        cons.kinematic_tyre_group(x_lin, u_lin, mpc, params, slack=0),
    ]
    u_lb, u_ub = ltv._control_bounds(mpc, N, jnp.float64)
    H, g, A, lb, ub, lbA, ubA, const = ltv.assemble_condensed_qp(
        A_bar, B_bar, d_bar, x0, x_ref, q_diag, r_diag, [1e8], groups,
        u_lb, u_ub)

    H_n, g_n, A_n = np.asarray(H), np.asarray(g), np.asarray(A)
    lb_n, ub_n = np.asarray(lb), np.asarray(ub)
    lbA_n, ubA_n = np.asarray(lbA), np.asarray(ubA)

    consset = [{"type": "ineq",
                "fun": lambda v: np.concatenate(
                    [(A_n @ v - lbA_n)[np.isfinite(lbA_n)],
                     (ubA_n - A_n @ v)[np.isfinite(ubA_n)]])}]
    bnds = [(l if np.isfinite(l) else None, u if np.isfinite(u) else None)
            for l, u in zip(lb_n, ub_n)]
    # start from a feasible-ish point (slack open) and scale the objective so
    # SLSQP is not thrown off by the 1e8 soft cost; the minimiser is invariant
    x_init = np.zeros(len(g_n))
    x_init[-1] = 1.0
    sc = 1.0 / np.max(np.abs(g_n))
    ref = minimize(lambda v: sc * (0.5 * v @ H_n @ v + g_n @ v), x_init,
                   jac=lambda v: sc * (H_n @ v + g_n), bounds=bnds,
                   constraints=consset, method="SLSQP",
                   options={"maxiter": 1000, "ftol": 1e-16})
    assert ref.success
    v_ipm = np.concatenate([np.asarray(res.u_opt).reshape(-1),
                            np.asarray(res.slack)])
    # controls agree to SLSQP's own accuracy
    np.testing.assert_allclose(v_ipm[:2 * N], ref.x[:2 * N], atol=5e-3)
    # and the IPM point is at least as optimal while staying feasible
    obj_ipm = float(res.qp.objective)
    obj_ref = 0.5 * ref.x @ H_n @ ref.x + g_n @ ref.x
    assert obj_ipm <= obj_ref + 1e-5 * max(1.0, abs(obj_ref))
    y = A_n @ v_ipm
    assert np.all(y >= lbA_n - 1e-7) and np.all(y <= ubA_n + 1e-7)


def test_kinematic_respects_bounds(circ):
    N = 20
    mpc = MPCParams(n_steps=N)
    params = VehicleParams()
    x_ref, x_lin, u_lin = _ref_and_lin(5, N, mpc.dt)
    x0 = jnp.asarray([0.0, 0.3, -0.1, 8.0, 0.1])
    res = ltv.ltv_mpc_kinematic(x0, x_ref, circ, params, mpc, x_lin, u_lin)
    u = np.asarray(res.u_opt)
    assert np.all(np.abs(u[:, 0]) <= 10.0 + 1e-6)
    assert np.all(np.abs(u[:, 1]) <= 0.4 + 1e-6)
    x = np.asarray(res.x_opt)
    slack = float(res.slack[0])
    assert np.all(np.abs(x[:, 1]) <= 0.75 + slack + 1e-5)
    assert np.all(x[:, 3] >= -1e-6)           # v >= 0
    assert np.all(np.abs(x[:, 4]) <= 0.4 + 1e-5)  # |delta| bound


def test_dynamic_solves_and_respects_bounds(circ):
    N = 15
    mpc = MPCParams(n_steps=N)
    params = VehicleParams()
    x_ref, x_lin, u_lin = _ref_and_lin(7, N, mpc.dt)
    x0 = jnp.asarray([0.0, 0.05, 0.02, 8.0, 0.0, 8.0 / 25.0, 0.0])
    xl = np.array(x_lin)
    xl[:, 5] = 8.0 / 25.0  # plausible yaw rate on the circle
    res = ltv.ltv_mpc_dynamic(x0, x_ref, circ, params, mpc,
                              jnp.asarray(xl), u_lin)
    u = np.asarray(res.u_opt)
    assert np.all(np.abs(u[:, 0]) <= 10.0 + 1e-6)
    assert np.all(np.abs(u[:, 1]) <= 0.4 + 1e-6)
    assert res.qp.primal_res < 1e-6
    assert np.all(np.asarray(res.slack) >= -1e-9)
    # prediction consistent: x_opt[0] comes from x0 via stage dynamics
    assert abs(float(res.x_opt[0, 3]) - 8.0) < 1.0


def test_receding_horizon_improves_tracking(circ):
    """Iterating linearisation about the previous solution (the reference's
    warm-start pattern, main.m:122-126) should keep the QP feasible and the
    track error small over several re-solves."""
    N = 20
    mpc = MPCParams(n_steps=N)
    params = VehicleParams()
    x_ref, x_lin, u_lin = _ref_and_lin(5, N, mpc.dt)
    x0 = jnp.asarray([0.0, 0.2, 0.0, 8.0, 0.0])
    for _ in range(4):
        res = ltv.ltv_mpc_kinematic(x0, x_ref, circ, params, mpc, x_lin, u_lin)
        x_lin, u_lin = res.x_opt, res.u_opt
    x = np.asarray(res.x_opt)
    # n should be pulled toward the centreline along the horizon
    assert abs(x[-1, 1]) < 0.1
    assert float(res.slack[0]) < 1e-6
