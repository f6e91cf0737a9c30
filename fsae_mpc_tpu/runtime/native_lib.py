"""ctypes bindings for the native runtime (builds on demand)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_NATIVE_DIR = os.path.join(_DIR, "native")
_SO = os.path.join(_NATIVE_DIR, "libfsae_native.so")

_lib: Optional[ctypes.CDLL] = None


def load_native(build: bool = True) -> Optional[ctypes.CDLL]:
    """Load (building if necessary) the native shared library."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) and build:
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(_SO):
        return None
    lib = ctypes.CDLL(_SO)
    lib.qp_solve_activeset.restype = ctypes.c_int
    lib.qp_solve_activeset.argtypes = [
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int)]
    lib.csv_read_matrix.restype = ctypes.c_int
    lib.csv_read_matrix.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.csv_free.restype = None
    lib.csv_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
    _lib = lib
    return lib


def native_available() -> bool:
    return load_native() is not None


def _as_ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def qp_solve_activeset(H, g, A, lb, ub, lbA, ubA, max_iter: int = 500):
    """Solve a dense QP with the native Goldfarb-Idnani active-set solver.

    Returns (x, objective, status): status 0 = optimal, 1 = iteration
    limit, 2 = numerical failure, 3 = infeasible.
    """
    lib = load_native()
    if lib is None:
        raise RuntimeError("native library unavailable (build failed?)")
    H = np.ascontiguousarray(H, np.float64)
    g = np.ascontiguousarray(g, np.float64)
    A = np.ascontiguousarray(A, np.float64)
    lb = np.ascontiguousarray(lb, np.float64)
    ub = np.ascontiguousarray(ub, np.float64)
    lbA = np.ascontiguousarray(lbA, np.float64)
    ubA = np.ascontiguousarray(ubA, np.float64)
    n = g.shape[0]
    m = lbA.shape[0]
    x = np.zeros(n)
    obj = ctypes.c_double(0.0)
    nact = ctypes.c_int(0)
    status = lib.qp_solve_activeset(
        n, m, _as_ptr(H), _as_ptr(g), _as_ptr(A), _as_ptr(lb), _as_ptr(ub),
        _as_ptr(lbA), _as_ptr(ubA), max_iter, _as_ptr(x),
        ctypes.byref(obj), ctypes.byref(nact))
    return x, obj.value, status


def read_matrix(path: str) -> np.ndarray:
    """Read a numeric CSV through the native loader."""
    lib = load_native()
    if lib is None:
        raise RuntimeError("native library unavailable")
    data = ctypes.POINTER(ctypes.c_double)()
    rows = ctypes.c_int(0)
    cols = ctypes.c_int(0)
    rc = lib.csv_read_matrix(path.encode(), ctypes.byref(data),
                             ctypes.byref(rows), ctypes.byref(cols))
    if rc != 0:
        raise IOError(f"csv_read_matrix({path}) failed with {rc}")
    try:
        out = np.ctypeslib.as_array(data, shape=(rows.value, cols.value)).copy()
    finally:
        lib.csv_free(data)
    return out
