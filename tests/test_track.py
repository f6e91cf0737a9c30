"""Track geometry tests: closed-form circle/line cases, spline properties,
projection, and frame transforms.  (Test strategy per SURVEY.md section 4:
the reference has no tests; L1 is validated against closed forms.)"""

import numpy as np
import jax.numpy as jnp
import pytest

from fsae_mpc_tpu.track import Track, track_from_points, load_track
from fsae_mpc_tpu.track import spline as sp
from fsae_mpc_tpu.models import cartesian_to_curvilinear, curvilinear_to_cartesian


def circle_track(R=20.0, n_pts=40, n_segments=80):
    th = np.linspace(0.0, 2.0 * np.pi, n_pts, endpoint=False)
    return track_from_points(R * np.cos(th), R * np.sin(th),
                             n_segments=n_segments, dtype=jnp.float64)


@pytest.fixture(scope="module")
def circ():
    return circle_track()


def test_spline_interpolates_knots():
    pts = np.array([0.0, 1.0, 3.0, 2.0, -1.0, 0.5])
    P = sp.make_spline(pts)
    # open spline passes through every knot at integer parameter (dl=1)
    for i, v in enumerate(pts[:-1]):
        assert np.isclose(float(sp.interpolate(jnp.asarray(float(i)), jnp.asarray(P), 1.0)), v)
    # last point: end of final segment
    assert np.isclose(P[-1, 3], pts[-1])


def test_spline_c1_c2_continuity():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=12)
    P = jnp.asarray(sp.make_spline_periodic(pts))
    eps = 1e-6
    for j in [1.0, 5.0, 11.0]:  # segment joins (dl=1 parametrisation)
        d_l = float(sp.interpolate_d(jnp.asarray(j - eps), P, 1.0))
        d_r = float(sp.interpolate_d(jnp.asarray(j + eps), P, 1.0))
        dd_l = float(sp.interpolate_dd(jnp.asarray(j - eps), P, 1.0))
        dd_r = float(sp.interpolate_dd(jnp.asarray(j + eps), P, 1.0))
        assert abs(d_l - d_r) < 1e-4
        assert abs(dd_l - dd_r) < 1e-3


def test_periodic_wrap():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=10)
    P = jnp.asarray(sp.make_spline_periodic(pts))
    M = P.shape[0]
    s = jnp.asarray(2.37)
    assert np.isclose(float(sp.interpolate(s, P, 1.0)),
                      float(sp.interpolate(s + M, P, 1.0)))
    assert np.isclose(float(sp.interpolate(s, P, 1.0)),
                      float(sp.interpolate(s - M, P, 1.0)))


def test_circle_curvature_and_length(circ):
    R = 20.0
    # total length ~ 2*pi*R
    assert np.isclose(float(circ.L), 2.0 * np.pi * R, rtol=1e-3)
    s = jnp.linspace(0.0, float(circ.L), 50)
    k = circ.curvature(s)
    np.testing.assert_allclose(np.asarray(k), 1.0 / R, rtol=3e-3)
    # curvature derivative ~ 0 on a circle
    kd = circ.curvature_d(s)
    assert float(jnp.max(jnp.abs(kd))) < 1e-3
    # radius check
    x, y = circ.position(s)
    np.testing.assert_allclose(np.hypot(np.asarray(x), np.asarray(y)), R, rtol=1e-4)


def test_arclength_parametrisation_unit_speed(circ):
    s = jnp.linspace(0.0, float(circ.L), 97)
    tx, ty = circ.tangent(s)
    speed = np.hypot(np.asarray(tx), np.asarray(ty))
    np.testing.assert_allclose(speed, 1.0, rtol=5e-3)


def test_closest_point_projection(circ):
    R = 20.0
    # point slightly outside the circle at 45 degrees
    ang = np.pi / 4.0
    x0, y0 = (R + 0.5) * np.cos(ang), (R + 0.5) * np.sin(ang)
    s_expected = ang * R
    s = float(circ.closest_point(jnp.asarray(x0), jnp.asarray(y0),
                                 jnp.asarray(s_expected + 1.5)))
    assert abs(s - s_expected) < 1e-2


def test_frame_transform_roundtrip(circ):
    s0, n0, mu0 = 13.0, 0.4, 0.12
    x, y, th = curvilinear_to_cartesian(jnp.asarray(s0), jnp.asarray(n0),
                                        jnp.asarray(mu0), circ)
    s, n, mu = cartesian_to_curvilinear(x, y, th, circ, jnp.asarray(s0 - 0.8))
    assert abs(float(s) - s0) < 1e-6
    assert abs(float(n) - n0) < 1e-6
    assert abs(float(mu) - mu0) < 1e-6


def test_load_real_track():
    track, cols = load_track("data/fsg2019.csv", dtype=jnp.float64)
    assert track.px.shape == (100, 4)
    assert float(track.L) > 100.0
    # spline should stay near the input centreline points
    s = jnp.linspace(0.0, float(track.L), 400)
    x, y = track.position(s)
    d = []
    for px, py in zip(cols["x"], cols["y"]):
        d.append(np.min(np.hypot(np.asarray(x) - px, np.asarray(y) - py)))
    assert np.max(d) < 1.0  # every centreline point within 1 m of the spline
