"""Curvilinear-frame vehicle ODEs.

Each model is written ONCE as a pure function ``f(x, u, track, params)``;
every Jacobian the reference hand-derives (``A_curv_kin.m`` 77 LoC,
``A_curv_dyn.m`` 129 LoC, plus all RK chain rules in the LTV linearizers and
NMPC jacobian callbacks, ~1,500 LoC total) is obtained with ``jax.jacfwd``
of these functions or of their discrete steps.

Reference parity note on curvature sensitivity: the reference's Jacobians
treat kappa(s) as locally constant -- ``A_curv_kin.m:27-56`` only adds the
kappa'(s) terms when the optional ``kappa_d`` argument is supplied, and no
solver supplies it.  We reproduce that convention by evaluating kappa at
``stop_gradient(s)`` unless ``diff_kappa=True``, in which case autodiff
differentiates straight through the spline (strictly more accurate than the
reference's dormant finite-difference kappa' path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..config import VehicleParams

KIN_NX = 5  # [s, n, mu, v, delta]
DYN_NX = 7  # [s, n, mu, x_d, y_d, theta_d, delta]
NU = 2


def _kappa_at(track, s, diff_kappa: bool):
    return track.curvature(s if diff_kappa else lax.stop_gradient(s))


def f_curv_kin(x, u, track, params: VehicleParams = VehicleParams(),
               diff_kappa: bool = False):
    """Kinematic bicycle in curvilinear coordinates.

    State ``[s, n, mu, v, delta]``, control ``[a, delta_d]``.
    (``vehicle_models/curvilinear_kinematic/f_curv_kin.m:12-30``)
    """
    s, n, mu, v, delta = x
    k = _kappa_at(track, s, diff_kappa)
    beta = jnp.arctan(params.lr_ratio * jnp.tan(delta))
    c = jnp.cos(mu + beta)
    sn = jnp.sin(mu + beta)
    denom = 1.0 / (1.0 - n * k)
    s_dot = v * c * denom
    return jnp.stack([
        s_dot,
        v * sn,
        v * jnp.sin(beta) / params.lr - s_dot * k,
        u[0],
        u[1],
    ])


def f_curv_dyn(x, u, track, params: VehicleParams = VehicleParams(),
               diff_kappa: bool = False):
    """Dynamic (Pacejka) bicycle in curvilinear coordinates.

    State ``[s, n, mu, x_d, y_d, theta_d, delta]``, control
    ``[Fx/m, delta_d]`` (the first input is acceleration; it is scaled by
    mass inside, matching ``f_curv_dyn.m:29``).  Returns ``(f, Fcr)`` --
    the rear lateral tyre force is reused by friction-ellipse constraints
    (``f_curv_dyn.m:20-63``).
    """
    s, n, mu, x_d, y_d, theta_d, delta = x
    p = params
    Fx = u[0] * p.m

    x_d_hat = x_d + p.v_soft * jnp.exp(-x_d / p.v_soft)

    k = _kappa_at(track, s, diff_kappa)
    denom = 1.0 / (1.0 - n * k)

    alpha_f = delta - jnp.arctan((y_d + p.lf * theta_d) / x_d_hat)
    alpha_r = -jnp.arctan((y_d - p.lr * theta_d) / x_d_hat)

    Fzf = p.m * p.g * p.lr / (p.lr + p.lf)
    Fzr = p.m * p.g * p.lf / (p.lr + p.lf)
    Fcf = Fzf * pacejka(alpha_f, p)
    Fcr = Fzr * pacejka(alpha_r, p)

    s_dot = (x_d * jnp.cos(mu) - y_d * jnp.sin(mu)) * denom
    f = jnp.stack([
        s_dot,
        x_d * jnp.sin(mu) + y_d * jnp.cos(mu),
        theta_d - s_dot * k,
        (Fx - Fcf * jnp.sin(delta) + p.m * y_d * theta_d) / p.m,
        (Fcr + Fcf * jnp.cos(delta) - p.m * x_d * theta_d) / p.m,
        (p.lf * Fcf * jnp.cos(delta) - p.lr * Fcr) / p.Iz,
        u[1],
    ])
    return f, Fcr


def f_curv_dyn_only(x, u, track, params: VehicleParams = VehicleParams(),
                    diff_kappa: bool = False):
    """``f_curv_dyn`` without the auxiliary tyre-force output."""
    return f_curv_dyn(x, u, track, params, diff_kappa)[0]


def pacejka(alpha, p: VehicleParams):
    """Normalised Pacejka magic-formula lateral force
    (``f_curv_dyn.m:47-53``); multiply by the axle normal load."""
    Ba = p.pB * alpha
    return p.pD * jnp.sin(p.pC * jnp.arctan(Ba - p.pE * (Ba - jnp.arctan(Ba))))


def rear_slip_quantities(x, params: VehicleParams = VehicleParams()):
    """Intermediates shared by slip/friction constraint linearisation.

    Matches the extra outputs of ``A_curv_dyn.m:1`` (vr, vf, x_d_hat, ...).
    Everything downstream is autodiffed, so only the primal values are
    needed.
    """
    _, _, _, x_d, y_d, theta_d, delta = x
    p = params
    x_d_hat = x_d + p.v_soft * jnp.exp(-x_d / p.v_soft)
    vf = (y_d + p.lf * theta_d) / x_d_hat
    vr = (y_d - p.lr * theta_d) / x_d_hat
    return {"x_d_hat": x_d_hat, "vf": vf, "vr": vr,
            "alpha_f": delta - jnp.arctan(vf), "alpha_r": -jnp.arctan(vr)}


def rear_lateral_force(x, params: VehicleParams = VehicleParams()):
    """Rear lateral tyre force Fcr(x) as a standalone differentiable scalar."""
    q = rear_slip_quantities(x, params)
    Fzr = params.m * params.g * params.lf / (params.lr + params.lf)
    return Fzr * pacejka(q["alpha_r"], params)


def curvilinear_kinematic_bicycle(x, u, dt, track,
                                  params: VehicleParams = VehicleParams()):
    """One Euler step of the curvilinear kinematic model
    (``vehicle_models/curvilinear_kinematic_bicycle.m``)."""
    return x + dt * f_curv_kin(x, u, track, params)
