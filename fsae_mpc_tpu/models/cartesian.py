"""Cartesian-frame vehicle ODEs (simulation ground-truth plant)."""

from __future__ import annotations

import jax.numpy as jnp

from ..config import VehicleParams
from .curvilinear import pacejka


def f_cart_kin(x, u, params: VehicleParams = VehicleParams()):
    """Kinematic bicycle, Cartesian frame.  State ``[x, y, theta, v, delta]``,
    control ``[a, delta_d]``.  (``cartesian_kinematic/f_cart_kin.m:12-25``)"""
    _, _, theta, v, delta = x
    beta = jnp.arctan(params.lr_ratio * jnp.tan(delta))
    return jnp.stack([
        v * jnp.cos(theta + beta),
        v * jnp.sin(theta + beta),
        v / params.lr * jnp.sin(beta),
        u[0],
        u[1],
    ])


def f_cart_dyn(x, u, params: VehicleParams = VehicleParams()):
    """Dynamic Pacejka bicycle, Cartesian frame -- the closed-loop
    simulation plant.  State ``[x, y, theta, x_d, y_d, theta_d, delta]``,
    control ``[Fx, delta_d]`` (raw force, unlike the curvilinear model).
    (``cartesian_dynamic/f_cart_dyn.m:12-55``)"""
    _, _, theta, x_d, y_d, theta_d, delta = x
    p = params
    Fx = u[0]

    # the plant regularises slip angles with +v_eps rather than the
    # exponential softening of the curvilinear model (f_cart_dyn.m:31-32)
    xd_reg = x_d + p.v_eps
    alpha_f = delta - jnp.arctan((y_d + p.lf * theta_d) / xd_reg)
    alpha_r = -jnp.arctan((y_d - p.lr * theta_d) / xd_reg)

    Fzf = p.m * p.g * p.lr / (p.lr + p.lf)
    Fzr = p.m * p.g * p.lf / (p.lr + p.lf)
    Fcf = Fzf * pacejka(alpha_f, p)
    Fcr = Fzr * pacejka(alpha_r, p)

    return jnp.stack([
        x_d * jnp.cos(theta) - y_d * jnp.sin(theta),
        x_d * jnp.sin(theta) + y_d * jnp.cos(theta),
        theta_d,
        (Fx - Fcf * jnp.sin(delta) + p.m * y_d * theta_d) / p.m,
        (Fcr + Fcf * jnp.cos(delta) - p.m * x_d * theta_d) / p.m,
        (p.lf * Fcf * jnp.cos(delta) - p.lr * Fcr) / p.Iz,
        u[1],
    ])


def integrate_cart_dyn(x, u, dt, params: VehicleParams = VehicleParams()):
    """One RK6 step of the dynamic plant
    (``cartesian_dynamic/integrate_cart_dyn.m``)."""
    from .integrators import rk6_step
    return rk6_step(lambda xx, uu: f_cart_dyn(xx, uu, params), x, u, dt)


def kinematic_bicycle(x, u, dt, params: VehicleParams = VehicleParams()):
    """One RK6 step of the kinematic bicycle
    (``vehicle_models/kinematic_bicycle.m``)."""
    from .integrators import rk6_step
    return rk6_step(lambda xx, uu: f_cart_kin(xx, uu, params), x, u, dt)


def kinematic_bicycle_horizon(x0, u_traj, dt,
                              params: VehicleParams = VehicleParams()):
    """Sequential rollout of the kinematic bicycle over a control
    trajectory (``vehicle_models/kinematic_bicycle_horizon.m``); returns
    (N+1, 5) including the initial state."""
    import jax.numpy as jnp
    from jax import lax

    def step(x, u):
        x_next = kinematic_bicycle(x, u, dt, params)
        return x_next, x_next

    _, xs = lax.scan(step, x0, u_traj)
    return jnp.concatenate([x0[None], xs], axis=0)
