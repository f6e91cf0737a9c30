"""Cartesian <-> curvilinear frame transforms.

(``vehicle_models/cartesian_to_curvilinear.m``,
``vehicle_models/curvilinear_to_cartesian.m``)
"""

from __future__ import annotations

import jax.numpy as jnp


def angdiff(a, b):
    """Signed smallest difference b - a wrapped to (-pi, pi], matching
    MATLAB's ``angdiff`` used at ``cartesian_to_curvilinear.m:27``."""
    d = b - a
    return jnp.mod(d + jnp.pi, 2.0 * jnp.pi) - jnp.pi


def cartesian_to_curvilinear(x, y, theta, track, s_init, num_iters: int = 12):
    """Project a Cartesian pose onto the track.

    Returns ``(s, n, mu)``: arclength via warm-started Newton projection,
    signed normal offset via the left-normal dot product, and heading
    deviation (``cartesian_to_curvilinear.m:17-27``).
    """
    s = track.closest_point(x, y, s_init, num_iters=num_iters)
    cx, cy = track.position(s)
    tx, ty = track.tangent(s)
    inv_norm = 1.0 / jnp.sqrt(tx ** 2 + ty ** 2)
    # left normal of the tangent: (-ty, tx)
    n = ((x - cx) * (-ty) + (y - cy) * tx) * inv_norm
    mu = angdiff(track.angle(s), theta)
    return s, n, mu


def curvilinear_to_cartesian(s, n, mu, track):
    """Inverse transform, vectorised over inputs
    (``curvilinear_to_cartesian.m:16-28``)."""
    cx, cy = track.position(s)
    tx, ty = track.tangent(s)
    inv_norm = 1.0 / jnp.sqrt(tx ** 2 + ty ** 2)
    x = cx + n * (-ty) * inv_norm
    y = cy + n * tx * inv_norm
    theta = track.angle(s) + mu
    return x, y, theta
