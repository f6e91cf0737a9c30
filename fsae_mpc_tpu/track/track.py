"""The ``Track`` pytree: arclength-parametrised closed-track geometry.

Bundles the spline coefficient arrays produced by the host-side fit into a
single pytree that flows through jit/vmap/scan.  The curvature closure the
reference threads everywhere (``main.m:18``) becomes the ``Track.curvature``
method.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from . import spline as sp
from ..utils.io import read_raceline_csv


@dataclasses.dataclass(frozen=True)
class Track:
    """Arclength-parametrised spline track.

    Fields are pytree leaves; ``px``/``py`` have shape ``(M, 4)``.  ``dl`` is
    the nominal segment length, ``L = M * dl`` the total length (conventions
    of ``spline/arclength_reparam.m``).
    """

    px: Any
    py: Any
    dl: Any
    L: Any

    # -- geometry queries (all JAX, vectorised over s) ---------------------
    def position(self, s):
        return sp.interpolate(s, self.px, self.dl), sp.interpolate(s, self.py, self.dl)

    def tangent(self, s):
        return sp.interpolate_d(s, self.px, self.dl), sp.interpolate_d(s, self.py, self.dl)

    def angle(self, s):
        return sp.angle(s, self.px, self.py, self.dl)

    def curvature(self, s):
        return sp.curvature(s, self.px, self.py, self.dl)

    def curvature_d(self, s):
        return sp.curvature_d(s, self.px, self.py, self.dl)

    def closest_point(self, x, y, s_init, num_iters: int = 12):
        return sp.closest_point(x, y, self.px, self.py, self.dl, s_init,
                                num_iters=num_iters)

    def astype(self, dtype):
        return Track(px=jnp.asarray(self.px, dtype), py=jnp.asarray(self.py, dtype),
                     dl=jnp.asarray(self.dl, dtype), L=jnp.asarray(self.L, dtype))


jax.tree_util.register_dataclass(
    Track, data_fields=["px", "py", "dl", "L"], meta_fields=[])


def track_from_points(x: np.ndarray, y: np.ndarray, n_segments: int = 100,
                      periodic: bool = True, dtype=jnp.float32) -> Track:
    """Fit + arclength-reparametrise a track through centreline points.

    Mirrors the pipeline at ``main.m:14-18``.
    """
    x_P = sp.make_spline_periodic(x) if periodic else sp.make_spline(x)
    y_P = sp.make_spline_periodic(y) if periodic else sp.make_spline(y)
    x_P, y_P, dl, L = sp.arclength_reparam(x_P, y_P, n_segments, periodic)
    return Track(px=jnp.asarray(x_P, dtype), py=jnp.asarray(y_P, dtype),
                 dl=jnp.asarray(dl, dtype), L=jnp.asarray(L, dtype))


def load_track(csv_path: str, n_segments: int = 100, dtype=jnp.float32):
    """Load a raceline CSV and build the arclength-parametrised ``Track``.

    Returns ``(track, raceline_dict)``.
    """
    cols = read_raceline_csv(csv_path)
    track = track_from_points(cols["x"], cols["y"], n_segments=n_segments,
                              dtype=dtype)
    return track, cols
