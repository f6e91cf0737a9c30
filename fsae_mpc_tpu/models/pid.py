"""PID actuator controller as a pure function with explicit carried state.

(``vehicle_models/pid_controller.m:5-19``; instances at ``main.m:84-88``.)
The state tuple ``(integral_error, prev_error)`` threads through
``lax.scan`` carries in the closed-loop simulator.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import PidParams


def pid_init(like=0.0):
    return (jnp.zeros_like(like + 0.0), jnp.zeros_like(like + 0.0))


def pid_step(target, current, params: PidParams, state):
    integral, prev_error = state
    error = target - current
    integral = integral + error
    derivative = error - prev_error
    out = params.kp * error + params.ki * integral + params.kd * derivative
    out = jnp.clip(out, -params.max_output, params.max_output)
    return out, (integral, error)
