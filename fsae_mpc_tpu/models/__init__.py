from .curvilinear import (f_curv_kin, f_curv_dyn, f_curv_dyn_only, pacejka,
                          rear_slip_quantities, rear_lateral_force,
                          KIN_NX, DYN_NX, NU)
from .cartesian import f_cart_kin, f_cart_dyn
from .integrators import (euler_step, rk2_step, rk4_step, rk6_step, STEPPERS,
                          linearize_discrete)
from .transforms import cartesian_to_curvilinear, curvilinear_to_cartesian, angdiff
from .pid import pid_init, pid_step
