"""Explicit Runge-Kutta step combinators + discrete-step linearisation.

The reference implements six hand-rolled "linearizer" files
(``mpc/ltv/{kinematic,dynamic}/{euler,rk2,rk4}_*.m``, 296 LoC) that propagate
Jacobians through the RK stages by hand chain rule
(``rk4_kinematic_curvilinear.m:43-52``).  Differentiating the *discrete* step
with ``jax.jacfwd`` computes exactly the same matrices, for any integrator,
in a few lines -- and is trivially vmapped across the horizon (the reference's
``for i = 1:N_steps`` loop has no cross-iteration dependence).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.precision import highest as _highest_precision


def euler_step(f, x, u, dt):
    return x + dt * f(x, u)


def rk2_step(f, x, u, dt):
    """Explicit midpoint.  Matches the discrete map implied by
    ``rk2_kinematic_curvilinear.m`` + ``sequential_integration.m:16-18``
    (x_{k+1} = x + dt * k2)."""
    k1 = f(x, u)
    k2 = f(x + 0.5 * dt * k1, u)
    return x + dt * k2


def rk4_step(f, x, u, dt):
    k1 = f(x, u)
    k2 = f(x + 0.5 * dt * k1, u)
    k3 = f(x + 0.5 * dt * k2, u)
    k4 = f(x + dt * k3, u)
    return x + dt * (k1 + 2.0 * k2 + 2.0 * k3 + k4) / 6.0


def rk6_step(f, x, u, dt):
    """Six-stage explicit RK used by the simulation plant.

    This reproduces the reference tableau verbatim, including its quirks:
    the k5 stage combines ``7/27*k2 + 10/27*k2`` (k3 is unused there) --
    see ``cartesian_dynamic/integrate_cart_dyn.m:11-19``.  The plant defines
    the closed-loop ground truth, so behavioural parity beats textbook
    coefficients.
    """
    k1 = f(x, u)
    k2 = f(x + k1 * dt / 2.0, u)
    k3 = f(x + k1 * dt / 4.0 + k2 * dt / 8.0, u)
    k4 = f(x - k2 * dt + 2.0 * k3 * dt, u)
    k5 = f(x + (7.0 / 27.0) * k2 * dt + (10.0 / 27.0) * k2 * dt + k4 * dt / 27.0, u)
    k6 = f(x + (28.0 / 625.0) * k1 * dt - k2 * dt / 5.0 + (546.0 / 625.0) * k3 * dt
           + (54.0 / 625.0) * k4 * dt - (378.0 / 625.0) * k5 * dt, u)
    fbar = k1 / 24.0 + 5.0 / 48.0 * k4 + 27.0 / 56.0 * k5 + 125.0 / 336.0 * k6
    return x + dt * fbar


STEPPERS = {"euler": euler_step, "rk2": rk2_step, "rk4": rk4_step, "rk6": rk6_step}


@_highest_precision
def linearize_discrete(step, x_traj, u_traj):
    """Linearise a discrete step along a trajectory: returns stage matrices
    ``(Ad, Bd, dd)`` with ``x_{k+1} ~= Ad_k x_k + Bd_k u_k + dd_k``.

    ``step(x, u) -> x_next``; ``x_traj (N, nx)``, ``u_traj (N, nu)``.
    ``Ad/Bd`` equal the reference's hand-propagated RK chain rule
    (``rk4_dynamic_curvilinear.m:36-59``) composed with the Euler
    discretisation of ``sequential_integration.m:16-18``; ``dd`` is the
    affine remainder ``step(x,u) - Ad x - Bd u``.
    """
    def one(x, u):
        Ad = jax.jacfwd(step, argnums=0)(x, u)
        Bd = jax.jacfwd(step, argnums=1)(x, u)
        dd = step(x, u) - Ad @ x - Bd @ u
        return Ad, Bd, dd

    return jax.vmap(one)(x_traj, u_traj)
