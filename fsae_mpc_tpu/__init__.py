"""fsae_mpc_tpu: TPU-native MPC / trajectory-optimization engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
kerry-he/fsae-mpc (MATLAB + C++ MEX): spline track geometry, bicycle vehicle
models, LTV-MPC / SQP-NMPC / collocation controllers, minimum-time planners,
a batched interior-point QP solver, and a vmappable closed-loop simulator.
"""

from . import config, track, models, ops, mpc, planner, sim, parallel, utils

__version__ = "0.1.0"
