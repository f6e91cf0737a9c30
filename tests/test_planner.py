"""Minimum-time planner tests on a closed circle track (closed-form
optimum: constant speed limited by the lateral-acceleration/friction
constraint) + reference resampler semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fsae_mpc_tpu.config import VehicleParams
from fsae_mpc_tpu.planner import (minimum_time_planner_kinematic,
                                  minimum_time_planner_dynamic,
                                  obtain_reference)
from fsae_mpc_tpu.track import track_from_points

P = VehicleParams()


@pytest.fixture(scope="module")
def circ():
    R, n = 30.0, 48
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    return track_from_points(R * np.cos(th), R * np.sin(th), n_segments=64,
                             dtype=jnp.float64)


def test_kinematic_planner_circle(circ):
    res = minimum_time_planner_kinematic(circ, P, n_nodes=64, iters=25)
    assert float(res.defect_norm) < 1e-6
    y = np.asarray(res.y_opt)
    # on a circle the optimal raceline is ~circular: n near-constant,
    # v near-constant, delta near the steady-state Ackermann angle
    assert np.std(y[:, 2]) < 0.5          # v steady
    assert np.all(np.abs(y[:, 0]) <= 1.0 + 1e-6)
    v = np.mean(y[:, 2])
    # bound set by the delta<=0.4 or v limited implicitly; lap time sane
    R_eff = 30.0 - np.mean(y[:, 0])
    lap_ref = 2 * np.pi * R_eff / max(v, 1e-9)
    assert abs(float(res.lap_time) - lap_ref) / lap_ref < 0.05


def test_dynamic_planner_circle(circ):
    # iters: 40 (was 30) -- power-of-two IPM equilibration (ops/ipm.py:
    # _pow2) shifted this instance's SQP path; defect at 30 iters sat 3%
    # over the bound (1.03e-4), at 40 it is 8.1e-5 and still decreasing
    res = minimum_time_planner_dynamic(circ, P, n_nodes=64, iters=40)
    assert float(res.defect_norm) < 1e-4
    y = np.asarray(res.y_opt)
    assert np.all(np.isfinite(y))
    # friction-ellipse utilisation below the planner cap (+slack)
    from fsae_mpc_tpu.models import curvilinear as cm
    for i in range(0, 64, 8):
        x_full = jnp.concatenate([jnp.zeros(1), jnp.asarray(y[i])])
        fcr = float(cm.rear_lateral_force(x_full, P))
        u1 = float(res.u_opt[i, 0])
        e = (fcr / (P.m * P.ac_max)) ** 2 + (u1 / P.al_max) ** 2
        assert e <= 1.0 + float(res.slack[1]) + 1e-3
    # track bound respected within slack
    assert np.all(np.abs(y[:, 0]) <= 0.5 + float(res.slack[0]) + 1e-6)
    # lap completes at reasonable speed
    assert 5.0 < float(res.lap_time) < 60.0


def test_obtain_reference_uniform_speed():
    # uniform nodes at constant speed: reference advances v*dt per step
    N, ds, v = 50, 2.0, 10.0
    t_nodes = jnp.full((N,), ds / v)
    y = jnp.zeros((N, 3)).at[:, 2].set(v)
    x_ref = obtain_reference(y, None, t_nodes, ds, s0=jnp.asarray(7.3),
                             dt=0.1, n_steps=12)
    s = np.asarray(x_ref[:, 0])
    np.testing.assert_allclose(np.diff(s), v * 0.1, atol=1e-9)
    assert abs(s[0] - (7.3 + v * 0.1)) < 1e-9


def test_obtain_reference_interpolates_states():
    # node state varies linearly in s; interpolation must reproduce it
    N, ds, v = 40, 1.0, 5.0
    svals = np.arange(N) * ds
    y = np.zeros((N, 2))
    y[:, 0] = np.sin(2 * np.pi * svals / (N * ds))
    t_nodes = jnp.full((N,), ds / v)
    x_ref = obtain_reference(jnp.asarray(y), None, t_nodes, ds,
                             s0=jnp.asarray(0.0), dt=0.05, n_steps=20)
    s = np.asarray(x_ref[:, 0])
    expect = np.interp(s % (N * ds), np.arange(N + 1) * ds,
                       np.concatenate([y[:, 0], y[:1, 0]]))
    np.testing.assert_allclose(np.asarray(x_ref[:, 1]), expect, atol=1e-6)
