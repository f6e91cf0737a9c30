"""Native runtime tests: C++ Goldfarb-Idnani active-set QP solver as an
independent oracle vs the JAX IPM, and the native CSV loader vs numpy."""

import numpy as np
import jax.numpy as jnp
import pytest

from fsae_mpc_tpu.runtime import (native_available, qp_solve_activeset,
                                  read_matrix)
from fsae_mpc_tpu.ops import ipm

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native library build failed")


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


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_active_set_matches_ipm_random(seed):
    rng = np.random.default_rng(seed)
    H, g, A, lb, ub, lbA, ubA = _random_qp(rng, 8, 6)
    x_as, obj_as, status = qp_solve_activeset(H, g, A, lb, ub, lbA, ubA)
    assert status == 0
    res = ipm.solve_qp(*[jnp.asarray(v) for v in (H, g, A, lb, ub, lbA, ubA)])
    np.testing.assert_allclose(x_as, np.asarray(res.x), atol=1e-6)
    assert abs(obj_as - float(res.objective)) < 1e-7 * max(1.0, abs(obj_as))


def test_active_set_on_ltv_qp():
    """Cross-check on a real condensed LTV QP (kinematic, small N)."""
    import jax
    from fsae_mpc_tpu.config import MPCParams, VehicleParams
    from fsae_mpc_tpu.mpc import ltv
    from fsae_mpc_tpu.mpc import constraints as cons
    from fsae_mpc_tpu.models import integrators, curvilinear as cm
    from fsae_mpc_tpu.ops.condense import condense
    from fsae_mpc_tpu.track import track_from_points

    R, npts = 25.0, 48
    th = np.linspace(0, 2 * np.pi, npts, endpoint=False)
    circ = track_from_points(R * np.cos(th), R * np.sin(th), n_segments=96,
                             dtype=jnp.float64)
    N = 6
    mpc = MPCParams(n_steps=N)
    params = VehicleParams()
    x_ref = np.zeros((N, 5))
    x_ref[:, 3] = 8.0 + 0.5 * np.arange(1, N + 1)
    x_ref[:, 0] = np.cumsum(x_ref[:, 3] * mpc.dt)
    x_lin = np.zeros((N, 5))
    x_lin[:, 0] = 8.0 * mpc.dt * np.arange(1, N + 1)
    x_lin[:, 3] = 8.0
    u_lin = np.zeros((N, 2))
    x_ref, x_lin, u_lin = map(jnp.asarray, (x_ref, x_lin, u_lin))
    x0 = jnp.asarray([0.0, 0.1, 0.05, 8.0, 0.0])

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

    x_as, obj_as, status = qp_solve_activeset(
        np.asarray(H), np.asarray(g), np.asarray(A), np.asarray(lb),
        np.asarray(ub), np.asarray(lbA), np.asarray(ubA), max_iter=2000)
    assert status == 0
    res = ipm.solve_qp(H, g, A, lb, ub, lbA, ubA)
    # controls agree between the two independent solvers
    np.testing.assert_allclose(x_as[:2 * N], np.asarray(res.x[:2 * N]),
                               atol=1e-5)


def test_native_csv_matches_numpy():
    m_native = read_matrix("data/fsg2019.csv")
    m_np = np.genfromtxt("data/fsg2019.csv", delimiter=",", skip_header=1)
    np.testing.assert_allclose(m_native, m_np, atol=1e-12)
