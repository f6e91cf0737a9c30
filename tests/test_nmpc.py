"""SQP-NMPC tests: dynamics consistency after convergence, golden
comparison against scipy SLSQP on the full NLP (small horizon), and
cross-transcription agreement."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.optimize import minimize

from fsae_mpc_tpu.config import MPCParams, VehicleParams
from fsae_mpc_tpu.models import curvilinear as cm
from fsae_mpc_tpu.models import integrators
from fsae_mpc_tpu.mpc import sqp, collocation
from fsae_mpc_tpu.ops import ipm
from fsae_mpc_tpu.track import track_from_points

P = VehicleParams()


@pytest.fixture(scope="module")
def circ():
    R, n = 25.0, 48
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    return track_from_points(R * np.cos(th), R * np.sin(th), n_segments=96,
                             dtype=jnp.float64)


def _setup(N, nx, v0=8.0, dt=0.05):
    x_ref = np.zeros((N, nx))
    v_ref = np.minimum(v0 + 10 * dt * np.arange(1, N + 1), 20.0)
    x_ref[:, 3] = v_ref
    x_ref[:, 0] = np.cumsum(v_ref * dt)
    x_init = np.zeros((N, nx))
    x_init[:, 0] = v0 * dt * np.arange(1, N + 1)
    x_init[:, 3] = v0
    u_init = np.zeros((N, 2))
    return jnp.asarray(x_ref), jnp.asarray(x_init), jnp.asarray(u_init)


def test_ms_kinematic_dynamics_consistency(circ):
    N = 12
    mpc = MPCParams(n_steps=N)
    x_ref, x_init, u_init = _setup(N, 5)
    x0 = jnp.asarray([0.0, 0.1, 0.02, 8.0, 0.0])
    res = sqp.ms_nmpc_kinematic(x0, x_ref, circ, P, mpc, x_init, u_init,
                                sqp_iters=5)
    # nonlinear defects of the converged trajectory must be ~0
    f = lambda x, u: cm.f_curv_kin(x, u, circ, P)
    step = lambda x, u: integrators.rk2_step(f, x, u, mpc.dt)
    x_prev = x0
    for i in range(N):
        x_next = step(x_prev, res.u_opt[i])
        np.testing.assert_allclose(np.asarray(res.x_opt[i]),
                                   np.asarray(x_next), atol=1e-6)
        x_prev = res.x_opt[i]
    assert float(res.slack[0]) < 1e-6


def _slsqp_polish(x0, x_ref, track, mpc, N, z0, scale):
    """Run SLSQP *from* a candidate NLP solution; if the candidate is
    optimal, SLSQP cannot materially improve it."""
    nx, nu = 5, 2
    f = lambda x, u: cm.f_curv_kin(x, u, track, P)
    step = jax.jit(lambda x, u: integrators.rk2_step(f, x, u, mpc.dt))
    step_np = lambda x, u: np.asarray(step(jnp.asarray(x), jnp.asarray(u)))

    q = np.array([5.0, 250.0, 2000.0, 0.0, 0.0])
    x_ref_n = np.asarray(x_ref)

    def unpack(z):
        xs = z[:N * nx].reshape(N, nx)
        us = z[N * nx:N * (nx + nu)].reshape(N, nu)
        return xs, us, z[-1]

    def obj(z):
        xs, us, sl = unpack(z)
        qw = np.concatenate([np.tile(q, N - 1), q * 10.0]).reshape(N, nx)
        return scale * (np.sum(qw * (xs - x_ref_n) ** 2)
                        + 10.0 * np.sum(us ** 2) + 1e8 * sl)

    def defects(z):
        xs, us, sl = unpack(z)
        out = []
        x_prev = np.asarray(x0)
        for i in range(N):
            out.append(step_np(x_prev, us[i]) - xs[i])
            x_prev = xs[i]
        return np.concatenate(out)

    def ineq(z):
        xs, us, sl = unpack(z)
        ay = xs[:, 3] ** 2 * xs[:, 4] / (P.lr + P.lf)
        return np.concatenate([0.75 + sl - xs[:, 1], 0.75 + sl + xs[:, 1],
                               5.0 + sl - ay, 5.0 + sl + ay])

    bnds = ([(None, None), (None, None), (None, None), (0, None), (-0.4, 0.4)] * N
            + [(-10, 10), (-0.4, 0.4)] * N + [(0, None)])
    return minimize(obj, z0, bounds=bnds, method="SLSQP",
                    constraints=[{"type": "eq", "fun": defects},
                                 {"type": "ineq", "fun": ineq}],
                    options={"maxiter": 80, "ftol": 1e-14}), obj


def test_ms_kinematic_is_nlp_optimal(circ):
    """SLSQP started AT the SQP solution must not improve it materially."""
    N = 5
    mpc = MPCParams(n_steps=N)
    x_ref, x_init, u_init = _setup(N, 5)
    x0 = jnp.asarray([0.0, 0.1, 0.02, 8.0, 0.0])
    res = sqp.ms_nmpc_kinematic(x0, x_ref, circ, P, mpc, x_init, u_init,
                                sqp_iters=8)
    z0 = np.concatenate([np.asarray(res.x_opt).reshape(-1),
                         np.asarray(res.u_opt).reshape(-1),
                         np.asarray(res.slack)])
    scale = 1e-4
    ref, obj = _slsqp_polish(x0, x_ref, circ, mpc, N, z0, scale)
    obj0 = obj(z0)
    # SLSQP may wiggle within its own tolerance; it must not find a
    # significantly better feasible point
    assert obj(ref.x) >= obj0 - 1e-4 * max(1.0, abs(obj0))
    u_ref = ref.x[N * 5:N * 7].reshape(N, 2)
    np.testing.assert_allclose(np.asarray(res.u_opt), u_ref, atol=5e-3)


def test_trapezoidal_kinematic_defects(circ):
    N = 10
    mpc = MPCParams(n_steps=N)
    x_ref, _, _ = _setup(N, 5)
    x0 = jnp.asarray([0.0, 0.1, 0.02, 8.0, 0.0])
    x_init = jnp.concatenate([x0[None], _setup(N, 5)[1]], axis=0)
    u_init = jnp.zeros((N + 1, 2))
    res = collocation.trapezoidal_nmpc_kinematic(
        x0, x_ref, circ, P, mpc, x_init, u_init, sqp_iters=6)
    # trapezoidal defect residuals of the converged trajectory
    f = lambda x, u: cm.f_curv_kin(x, u, circ, P)
    xs = res.x_opt
    us = res.u_opt
    for i in range(N):
        fi = f(xs[i], us[i])
        fn = f(xs[i + 1], us[i + 1])
        defect = xs[i] - xs[i + 1] + mpc.dt * (fi + fn) / 2.0
        assert float(jnp.max(jnp.abs(defect))) < 1e-6
    assert abs(float(xs[0, 1]) - 0.1) < 1e-12  # point 0 pinned to x0
    # track bound respected on the converged trajectory
    assert np.all(np.abs(np.asarray(xs[1:, 1]))
                  <= 0.75 + float(res.slack[0]) + 1e-6)


def test_trapezoidal_dynamic_runs(circ):
    N = 10
    mpc = MPCParams(n_steps=N)
    x_ref, x_init_tail, _ = _setup(N, 7)
    x0 = jnp.asarray([0.0, 0.05, 0.0, 8.0, 0.0, 8.0 / 25.0, 0.0])
    x_init = jnp.concatenate([x0[None], x_init_tail], axis=0)
    u_init = jnp.zeros((N + 1, 2))
    res = collocation.trapezoidal_nmpc_dynamic(
        x0, x_ref, circ, P, mpc, x_init, u_init, sqp_iters=5)
    assert bool(jnp.all(jnp.isfinite(res.u_opt)))
    # friction-ellipse respected (within slack) at all points
    for i in range(N + 1):
        fcr = cm.rear_lateral_force(res.x_opt[i], P)
        e = float((fcr / (P.m * P.ac_max)) ** 2
                  + (res.u_opt[i, 0] / P.al_max) ** 2)
        assert e <= 1.0 + float(res.slack[1]) + 1e-5
    assert np.all(np.abs(np.asarray(res.u_opt[:, 1])) <= 0.4 + 1e-7)


def test_ms_dynamic_runs_and_consistent(circ):
    N = 10
    mpc = MPCParams(n_steps=N)
    x_ref, x_init, u_init = _setup(N, 7)
    x0 = jnp.asarray([0.0, 0.05, 0.0, 8.0, 0.0, 8.0 / 25.0, 0.0])
    res = sqp.ms_nmpc_dynamic(x0, x_ref, circ, P, mpc, x_init, u_init,
                              sqp_iters=5)
    f = lambda x, u: cm.f_curv_dyn_only(x, u, circ, P)
    step = lambda x, u: integrators.rk2_step(f, x, u, mpc.dt)
    x_prev = x0
    for i in range(N):
        x_next = step(x_prev, res.u_opt[i])
        np.testing.assert_allclose(np.asarray(res.x_opt[i]),
                                   np.asarray(x_next), atol=1e-5)
        x_prev = res.x_opt[i]


def test_shift_trajectory(circ):
    N = 6
    mpc = MPCParams(n_steps=N)
    f = lambda x, u: cm.f_curv_kin(x, u, circ, P)
    step = lambda x, u: integrators.rk2_step(f, x, u, mpc.dt)
    x_opt = jnp.asarray(np.random.default_rng(0).normal(size=(N, 5)))
    u_opt = jnp.asarray(np.random.default_rng(1).normal(size=(N, 2)))
    x_s, u_s = sqp.shift_trajectory(x_opt, u_opt, step)
    np.testing.assert_allclose(np.asarray(x_s[:-1]), np.asarray(x_opt[1:]))
    np.testing.assert_allclose(np.asarray(x_s[-1]),
                               np.asarray(step(x_opt[-1], u_opt[-1])))


def test_hs_kinematic_defects(circ):
    """Hermite-Simpson: converged trajectory satisfies both the midpoint
    interpolation and Simpson defects (``hs_nmpc_kinematic_curvilinear.m
    :124-125``)."""
    N = 8
    mpc = MPCParams(n_steps=N)
    x_ref, x_init_knots, _ = _setup(N, 5)
    x0 = jnp.asarray([0.0, 0.1, 0.02, 8.0, 0.0])
    # all-points init: interleave knots with midpoints
    knots = jnp.concatenate([x0[None], x_init_knots], axis=0)
    mids = 0.5 * (knots[:-1] + knots[1:])
    x_init = jnp.zeros((2 * N + 1, 5))
    x_init = x_init.at[0::2].set(knots)
    x_init = x_init.at[1::2].set(mids)
    u_init = jnp.zeros((2 * N + 1, 2))
    res = collocation.hs_nmpc_kinematic(x0, x_ref, circ, P, mpc, x_init,
                                        u_init, sqp_iters=6)
    xs = res.x_opt
    us = res.u_opt
    f = lambda x, u: cm.f_curv_kin(x, u, circ, P)
    dt = mpc.dt
    for i in range(N):
        xp, xm, xq = xs[2 * i], xs[2 * i + 1], xs[2 * i + 2]
        up, um, uq = us[2 * i], us[2 * i + 1], us[2 * i + 2]
        fp, fm_, fq = f(xp, up), f(xm, um), f(xq, uq)
        c_mid = (xp + xq) / 2.0 + (fp - fq) * dt / 8.0 - xm
        c_simp = xp - xq + (fp + 4.0 * fm_ + fq) * dt / 6.0
        assert float(jnp.max(jnp.abs(c_mid))) < 1e-6, f"interval {i} mid"
        assert float(jnp.max(jnp.abs(c_simp))) < 1e-6, f"interval {i} simpson"
    # bounds respected at every point
    assert np.all(np.abs(np.asarray(us[:, 1])) <= 0.4 + 1e-7)
    assert np.all(np.abs(np.asarray(xs[1:, 1]))
                  <= 0.75 + float(res.slack[0]) + 1e-6)


def test_ms_dynamic_riccati_matches_dense(circ):
    """The stage-wise subproblem (pre-step friction rows re-expressed via
    the dynamics substitution, sqp._align_prestep_group) is the SAME
    subproblem: SQP on the riccati backend must land on the dense
    backend's trajectory."""
    N = 10
    mpc = MPCParams(n_steps=N)
    x_ref, x_init, u_init = _setup(N, 7)
    x0 = jnp.asarray([0.0, 0.05, 0.0, 8.0, 0.0, 8.0 / 25.0, 0.0])
    res_d = sqp.ms_nmpc_dynamic(x0, x_ref, circ, P, mpc, x_init, u_init,
                                sqp_iters=4)
    res_r = sqp.ms_nmpc_dynamic(x0, x_ref, circ, P, mpc, x_init, u_init,
                                sqp_iters=4, backend="riccati")
    np.testing.assert_allclose(np.asarray(res_r.u_opt),
                               np.asarray(res_d.u_opt), atol=2e-5)
    np.testing.assert_allclose(np.asarray(res_r.x_opt),
                               np.asarray(res_d.x_opt), atol=2e-5)


def test_ms_kinematic_riccati_matches_dense(circ):
    N = 12
    mpc = MPCParams(n_steps=N)
    x_ref, x_init, u_init = _setup(N, 5)
    x0 = jnp.asarray([0.0, 0.1, 0.02, 8.0, 0.0])
    res_d = sqp.ms_nmpc_kinematic(x0, x_ref, circ, P, mpc, x_init, u_init,
                                  sqp_iters=3)
    res_r = sqp.ms_nmpc_kinematic(x0, x_ref, circ, P, mpc, x_init, u_init,
                                  sqp_iters=3, backend="riccati")
    np.testing.assert_allclose(np.asarray(res_r.u_opt),
                               np.asarray(res_d.u_opt), atol=2e-5)


def test_trapezoidal_dynamic_riccati_matches_dense(circ):
    """The augmented-state stage QP (collocation._trapezoidal_stage_qp)
    is the same subproblem as the condensed two-control-coupled QP."""
    N = 10
    mpc = MPCParams(n_steps=N)
    x_ref, _, _ = _setup(N, 7)
    x_init = np.zeros((N + 1, 7))
    x_init[:, 0] = 8.0 * mpc.dt * np.arange(N + 1)
    x_init[:, 3] = 8.0
    u_init = np.zeros((N + 1, 2))
    x_init, u_init = jnp.asarray(x_init), jnp.asarray(u_init)
    x0 = jnp.asarray([0.0, 0.05, 0.0, 8.0, 0.0, 8.0 / 25.0, 0.0])
    res_d = collocation.trapezoidal_nmpc_dynamic(
        x0, x_ref, circ, P, mpc, x_init, u_init, sqp_iters=3)
    res_r = collocation.trapezoidal_nmpc_dynamic(
        x0, x_ref, circ, P, mpc, x_init, u_init, sqp_iters=3,
        backend="riccati")
    np.testing.assert_allclose(np.asarray(res_r.u_opt),
                               np.asarray(res_d.u_opt), atol=3e-5)
    np.testing.assert_allclose(np.asarray(res_r.x_opt),
                               np.asarray(res_d.x_opt), atol=3e-5)


def test_trapezoidal_kinematic_riccati_matches_dense(circ):
    N = 10
    mpc = MPCParams(n_steps=N)
    x_ref, _, _ = _setup(N, 5)
    x_init = np.zeros((N + 1, 5))
    x_init[:, 0] = 8.0 * mpc.dt * np.arange(N + 1)
    x_init[:, 3] = 8.0
    u_init = np.zeros((N + 1, 2))
    x_init, u_init = jnp.asarray(x_init), jnp.asarray(u_init)
    x0 = jnp.asarray([0.0, 0.1, 0.02, 8.0, 0.0])
    res_d = collocation.trapezoidal_nmpc_kinematic(
        x0, x_ref, circ, P, mpc, x_init, u_init, sqp_iters=3)
    res_r = collocation.trapezoidal_nmpc_kinematic(
        x0, x_ref, circ, P, mpc, x_init, u_init, sqp_iters=3,
        backend="riccati")
    np.testing.assert_allclose(np.asarray(res_r.u_opt),
                               np.asarray(res_d.u_opt), atol=3e-5)
