"""Native (C++) runtime components, loaded through ctypes.

The reference ships two pre-built C++ MEX solver binaries (qpOASES, IPOPT)
as its native layer (SURVEY.md section 2, L3).  This package provides the
framework's native layer: a Goldfarb-Idnani active-set QP solver used as the
trusted f64 oracle for the on-device IPM, and a fast CSV loader.  Build with
``make -C fsae_mpc_tpu/runtime/native`` (done automatically on first use).
"""

from . import native_lib
from .native_lib import (load_native, native_available, qp_solve_activeset,
                         read_matrix)
