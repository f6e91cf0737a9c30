"""Raceline CSV IO.

Python/numpy loader mirroring ``util/read_raceline_csv.m``; a native C++
fast-path (``runtime/native/csv_loader.cpp``) is used when the shared library
has been built (large batched-scenario sweeps load thousands of perturbed
racelines).
"""

from __future__ import annotations

import numpy as np

_COLUMNS = ["x", "y", "vx", "vy", "ax", "ay", "dt", "rx", "ry", "lx", "ly"]


def read_raceline_csv(path: str) -> dict:
    """Read a raceline CSV into a dict of float64 column vectors.

    Columns: centreline X,Y, velocity vX,vY, accel aX,aY, segment dt, and
    right/left cone lines rX,rY,lX,lY (``util/read_raceline_csv.m:6-19``).
    """
    try:
        from ..runtime import native_lib  # optional C++ fast path
        data = native_lib.read_matrix(path)
    except Exception:
        data = np.genfromtxt(path, delimiter=",", skip_header=1, dtype=np.float64)
    if data.ndim != 2 or data.shape[1] < len(_COLUMNS):
        raise ValueError(f"bad raceline CSV {path}: shape {data.shape}")
    return {name: np.ascontiguousarray(data[:, i]) for i, name in enumerate(_COLUMNS)}
