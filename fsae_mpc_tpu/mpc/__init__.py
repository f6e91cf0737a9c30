from .ltv import LtvResult, ltv_mpc_kinematic, ltv_mpc_dynamic, assemble_condensed_qp
from .sqp import SqpResult, ms_nmpc_kinematic, ms_nmpc_dynamic, shift_trajectory
from .collocation import (trapezoidal_nmpc_kinematic, trapezoidal_nmpc_dynamic,
                          hs_nmpc_kinematic)
from . import constraints
