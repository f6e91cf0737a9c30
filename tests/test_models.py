"""Vehicle model tests: physical sanity on closed-form tracks, Jacobian
property tests (autodiff vs. finite differences -- the role IPOPT's
``derivative_test`` played in the reference), and integrator order checks."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fsae_mpc_tpu.config import VehicleParams
from fsae_mpc_tpu import models
from fsae_mpc_tpu.models import integrators
from fsae_mpc_tpu.track import track_from_points


@pytest.fixture(scope="module")
def straight():
    # long straight (open spline) along +x => kappa ~ 0
    x = np.linspace(0.0, 200.0, 30)
    y = np.zeros_like(x)
    return track_from_points(x, y, n_segments=50, periodic=False,
                             dtype=jnp.float64)


@pytest.fixture(scope="module")
def circ():
    R, n = 20.0, 48
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    return track_from_points(R * np.cos(th), R * np.sin(th), n_segments=96,
                             dtype=jnp.float64)


P = VehicleParams()


def test_kinematic_straight_line(straight):
    # driving straight on the centreline: s_dot = v, all else steady
    x = jnp.array([5.0, 0.0, 0.0, 10.0, 0.0])
    u = jnp.array([2.0, 0.1])
    f = models.f_curv_kin(x, u, straight)
    np.testing.assert_allclose(np.asarray(f), [10.0, 0.0, 0.0, 2.0, 0.1],
                               atol=1e-6)


def test_kinematic_circle_steady_state(circ):
    # steady-state cornering: choose delta so the kinematic path curvature
    # matches the track's => mu_dot = 0, n stays 0
    R = 20.0
    v = 8.0
    # path curvature of kinematic bicycle: sin(beta)/lr = 1/R
    beta = np.arcsin(P.lr / R)
    delta = np.arctan(np.tan(beta) / P.lr_ratio)
    x = jnp.array([3.0, 0.0, -beta, v, delta])
    f = models.f_curv_kin(x, u=jnp.zeros(2), track=circ)
    f = np.asarray(f)
    assert abs(f[1]) < 1e-2   # n_dot ~ 0
    assert abs(f[2]) < 1e-2   # mu_dot ~ 0
    assert abs(f[0] - v) < 0.1


def test_dynamic_model_straight(straight):
    # rolling straight, no slip: lateral dynamics quiet
    x = jnp.array([5.0, 0.0, 0.0, 15.0, 0.0, 0.0, 0.0])
    u = jnp.array([3.0, 0.0])
    f, Fcr = models.f_curv_dyn(x, u, straight)
    f = np.asarray(f)
    np.testing.assert_allclose(f[:3], [15.0, 0.0, 0.0], atol=1e-8)
    assert abs(f[3] - 3.0) < 1e-8  # u[0] is Fx/m = accel
    assert abs(float(Fcr)) < 1e-8


def test_pacejka_shape():
    # odd function, saturates near D
    a = jnp.linspace(-0.5, 0.5, 101)
    mu = np.asarray(models.pacejka(a, P))
    np.testing.assert_allclose(mu, -mu[::-1], atol=1e-12)
    assert np.max(mu) <= P.pD + 1e-9
    assert np.max(mu) > 0.9 * P.pD


def _fd_jac(f, x, eps=1e-6):
    n = x.shape[0]
    cols = []
    for i in range(n):
        dx = np.zeros(n)
        dx[i] = eps
        cols.append((np.asarray(f(jnp.asarray(x + dx)))
                     - np.asarray(f(jnp.asarray(x - dx)))) / (2 * eps))
    return np.stack(cols, axis=1)


@pytest.mark.parametrize("model", ["kin", "dyn"])
def test_jacobians_match_finite_difference(circ, model):
    if model == "kin":
        x0 = np.array([7.0, 0.2, 0.1, 9.0, 0.05])
        u0 = np.array([1.0, 0.02])
        ffn = lambda x, u: models.f_curv_kin(x, u, circ)
    else:
        x0 = np.array([7.0, 0.2, 0.1, 9.0, 0.4, 0.3, 0.05])
        u0 = np.array([1.0, 0.02])
        ffn = lambda x, u: models.f_curv_dyn_only(x, u, circ, diff_kappa=True)

    A = np.asarray(jax.jacfwd(ffn, argnums=0)(jnp.asarray(x0), jnp.asarray(u0)))
    B = np.asarray(jax.jacfwd(ffn, argnums=1)(jnp.asarray(x0), jnp.asarray(u0)))
    if model == "kin":
        # finite differences include kappa'(s) effects; restrict the check to
        # non-s columns since diff_kappa=False freezes kappa (reference parity)
        A_fd = _fd_jac(lambda x: ffn(x, jnp.asarray(u0)), x0)
        np.testing.assert_allclose(A[:, 1:], A_fd[:, 1:], atol=1e-5)
    else:
        A_fd = _fd_jac(lambda x: ffn(x, jnp.asarray(u0)), x0)
        np.testing.assert_allclose(A, A_fd, atol=1e-4)
    B_fd = _fd_jac(lambda u: ffn(jnp.asarray(x0), u), u0)
    np.testing.assert_allclose(B, B_fd, atol=1e-6)


def test_stop_gradient_kappa_parity(circ):
    """With diff_kappa=False the s-column must match the reference's
    convention: ds_dot/ds = 0 and dmu_dot/ds = 0 (``A_curv_kin.m:29,40``)."""
    x0 = jnp.array([7.0, 0.2, 0.1, 9.0, 0.05])
    u0 = jnp.array([1.0, 0.02])
    A = np.asarray(jax.jacfwd(
        lambda x: models.f_curv_kin(x, u0, circ), argnums=0)(x0))
    np.testing.assert_allclose(A[:, 0], 0.0, atol=1e-12)


def test_integrator_convergence_order():
    # dx/dt = [x2, -x1] rotation; exact solution known
    def f(x, u):
        return jnp.stack([x[1], -x[0]])

    x0 = jnp.array([1.0, 0.0])
    T = 1.0
    exact = np.array([np.cos(T), -np.sin(T)])

    def err(step, n):
        dt = T / n
        x = x0
        for _ in range(n):
            x = step(f, x, None, dt)
        return np.linalg.norm(np.asarray(x) - exact)

    for step, order in [(integrators.euler_step, 1), (integrators.rk2_step, 2),
                        (integrators.rk4_step, 4)]:
        e1, e2 = err(step, 16), err(step, 32)
        rate = np.log2(e1 / e2)
        assert rate > order - 0.3, f"order {rate} < {order}"


def test_linearize_discrete_consistency(circ):
    """Ad/Bd/dd from autodiff must reproduce the step to first order and be
    exact at the linearisation point."""
    N = 7
    x_traj = jnp.stack([jnp.array([2.0 + i, 0.1, 0.05, 8.0, 0.02])
                        for i in range(N)])
    u_traj = jnp.tile(jnp.array([1.0, 0.01]), (N, 1))
    step = lambda x, u: integrators.rk2_step(
        lambda xx, uu: models.f_curv_kin(xx, uu, circ), x, u, 0.05)
    Ad, Bd, dd = integrators.linearize_discrete(step, x_traj, u_traj)
    # exactness at linearisation point
    for i in range(N):
        lhs = Ad[i] @ x_traj[i] + Bd[i] @ u_traj[i] + dd[i]
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(step(x_traj[i], u_traj[i])),
                                   atol=1e-10)
    # first-order accuracy nearby
    i = 3
    dx = jnp.array([0.0, 1e-4, -1e-4, 2e-4, 0.0])
    pred = Ad[i] @ (x_traj[i] + dx) + Bd[i] @ u_traj[i] + dd[i]
    act = step(x_traj[i] + dx, u_traj[i])
    assert float(jnp.max(jnp.abs(pred - act))) < 1e-7


def test_rk6_plant_step_sane():
    x = jnp.array([0.0, 0.0, 0.0, 10.0, 0.0, 0.0, 0.0])
    u = jnp.array([500.0, 0.0])
    xn = integrators.rk6_step(lambda xx, uu: models.f_cart_dyn(xx, uu), x, u, 0.005)
    xn = np.asarray(xn)
    assert xn[0] > 0.049  # moved forward ~ v*dt
    assert xn[3] > 10.0   # accelerated
    assert abs(xn[1]) < 1e-6


def test_pid_clamp_and_state():
    from fsae_mpc_tpu.config import VEL_PID
    from fsae_mpc_tpu.models import pid_init, pid_step
    st = pid_init()
    out, st = pid_step(20.0, 0.0, VEL_PID, st)
    assert float(out) == 2800.0  # clamped
    out2, st = pid_step(0.05, 0.0, VEL_PID, st)
    assert abs(float(out2) - 16000.0 * 0.05) < 1e-9
