"""Central configuration dataclasses.

The reference hard-codes vehicle constants in ~20 separate files (e.g.
``vehicle_models/curvilinear_dynamic/f_curv_dyn.m:12-18``,
``mpc/ltv/kinematic/kinematic_tyre_linearise_constraints.m:5-6``).  Here they
live in one registered-pytree dataclass so they can be jitted through,
vmapped over (scenario batching with perturbed parameters), and sharded.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


def _pytree_dataclass(cls):
    """Register a (frozen) dataclass as a JAX pytree with all fields as leaves."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_pytree_dataclass
class VehicleParams:
    """Vehicle + tyre constants.

    Values match the reference (``f_curv_dyn.m:12-18`` mass/geometry,
    ``f_curv_dyn.m:47-50`` Pacejka, ``dynamic_tyre_linearise_constraints.m``
    ``ac_max``/``al_max``).  All fields are pytree leaves so a batch of
    perturbed vehicles can be vmapped through every model and solver.
    """

    m: Any = 280.0        # mass [kg]
    Iz: Any = 200.0       # yaw inertia [kg m^2]
    lr: Any = 0.6183      # CoG -> rear axle [m]
    lf: Any = 0.8672      # CoG -> front axle [m]
    g: Any = 9.81
    # Pacejka magic-formula coefficients
    pB: Any = 12.56
    pC: Any = 1.38
    pD: Any = 1.60
    pE: Any = -0.58
    # friction-ellipse semi-axes (lateral accel, longitudinal accel)
    ac_max: Any = 9.163
    al_max: Any = 10.0
    # low-speed softening scale: x_d_hat = x_d + v_soft * exp(-x_d / v_soft)
    v_soft: Any = 5.0
    # cartesian-plant slip-angle regulariser (``f_cart_dyn.m:31-32``)
    v_eps: Any = 0.01

    @property
    def wheelbase(self):
        return self.lr + self.lf

    @property
    def lr_ratio(self):
        return self.lr / (self.lr + self.lf)


@_pytree_dataclass
class PidParams:
    """Gains + output clamp of one PID loop (``pid_controller.m``)."""

    kp: Any = 0.0
    ki: Any = 0.0
    kd: Any = 0.0
    max_output: Any = 0.0


# Reference actuator-controller instances (``main.m:84-88``)
VEL_PID = PidParams(kp=16000.0, ki=0.0, kd=0.0, max_output=2800.0)
STEER_PID = PidParams(kp=80.0, ki=0.0, kd=0.0, max_output=0.8)


@dataclasses.dataclass(frozen=True)
class MPCParams:
    """Static MPC shape/weight configuration (hashable: safe as a jit-static arg).

    Defaults mirror ``main.m:36-40`` and the per-controller weight blocks
    (``ltvmpc_kinetmatic_curvilinear.m:31-35``,
    ``ltvmpc_dynamic_curvilinear.m:31-35``).
    """

    n_steps: int = 40
    dt: float = 0.05
    target_vel: float = 20.0

    # cost weights
    q_s: float = 5.0
    q_n: float = 250.0
    q_mu: float = 2000.0
    r_a: float = 10.0
    r_delta_d: float = 10.0
    q_terminal_scale: float = 10.0

    # bounds
    n_max: float = 0.75       # track half-width (soft)
    delta_max: float = 0.4    # steering angle bound
    a_max: float = 10.0       # accel input bound
    delta_d_max: float = 0.4  # steering-rate bound
    ay_max: float = 5.0       # kinematic lateral-accel proxy bound
    slip_max: float = 0.1     # dynamic slip-angle bound

    # soft-constraint weights
    w_track: float = 1e8
    w_slip: float = 1e6
    w_tyre: float = 1e4

    n_tyre_polygon: int = 12  # friction-ellipse polygon sides (LTV dynamic)


DEFAULT_MPC = MPCParams()

# float32 (TPU) soft-constraint profile: the reference's 1e8/1e6/1e4 weights
# (``ltvmpc_dynamic_curvilinear.m:35``) exceed the exact-penalty threshold by
# ~4 orders of magnitude; in float32 that dynamic range destroys the IPM's
# KKT conditioning.  These compressed weights stay above every observed
# constraint dual (so the minimiser is unchanged -- exact-penalty
# equivalence, verified against the 1e8 solution in f64) while keeping the
# scaled Hessian representable.
MPC_F32 = MPCParams(w_track=1e5, w_slip=1e4, w_tyre=1e3)
