"""Numpy transcription of the reference's hand-derived LTV-MPC pipeline.

This is the reference-parity oracle demanded by SURVEY.md section 7 step 2:
every formula below is transcribed from the MATLAB source (file:line cited
per function) so a single sign/index error anywhere in the repo's autodiff
/condensing/assembly stack is caught by comparing against these f64
matrices and the controls solved from them.

Two deliberate reference quirks are reproduced under ``bug_compatible=True``
(the default, matching what the MATLAB actually computes):

* ``rk4_*_curvilinear.m:56``: the k4 control chain-rule term uses ``dt/2``
  where the true derivative of the RK4 step has ``dt``
  (``dkdu4 = B(...) + dfdx4*dkdu3*dt / 2``).
* ``sequential_integration.m:32``: every diagonal block of B_bar is filled
  with stage **1**'s B (``B(:, :, 1)``) instead of stage i's.

With ``bug_compatible=False`` both are corrected, which must match the
repo's autodiff linearisation/condensing EXACTLY (1e-10); with ``True`` the
solved controls quantify the reference deviation (<= 1e-3 BASELINE bar).

All arrays are row-major: trajectories are (N, nx); stacked vectors follow
MATLAB's per-step-contiguous layout (x(:) of an (nx, N) matrix == reshape
of our (N, nx)).
"""

import numpy as np

# vehicle constants as hard-coded throughout the reference
# (f_curv_dyn.m:12-18, A_curv_kin.m:15-17, ...)
LR = 0.6183
LF = 0.8672
MASS = 280.0
IZ = 200.0
GRAV = 9.81
PB, PC, PD, PE = 12.56, 1.38, 1.60, -0.58
LR_RATIO = LR / (LR + LF)


# --------------------------------------------------------------------------
# L2: vehicle models and hand Jacobians
# --------------------------------------------------------------------------

def f_curv_kin(x, u, kappa):
    """``vehicle_models/curvilinear_kinematic/f_curv_kin.m:12-30``."""
    k = kappa(x[0])
    beta = np.arctan(LR_RATIO * np.tan(x[4]))
    s_mu_beta = np.sin(x[2] + beta)
    c_mu_beta = np.cos(x[2] + beta)
    denom_nk = 1.0 / (1.0 - x[1] * k)
    return np.array([
        x[3] * c_mu_beta * denom_nk,
        x[3] * s_mu_beta,
        x[3] * np.sin(beta) / LR - x[3] * c_mu_beta * denom_nk * k,
        u[0],
        u[1],
    ])


def A_curv_kin(x, u, kappa, kappa_d=None):
    """``vehicle_models/curvilinear_kinematic/A_curv_kin.m:20-56``."""
    k = kappa(x[0])
    beta = np.arctan(LR_RATIO * np.tan(x[4]))
    s_mu_beta = np.sin(x[2] + beta)
    c_mu_beta = np.cos(x[2] + beta)
    beta_d = (LR_RATIO / np.cos(x[4]) ** 2
              / (1.0 + (LR_RATIO * np.tan(x[4])) ** 2))
    denom_nk = 1.0 / (1.0 - x[1] * k)

    s_s = 0.0
    s_n = x[3] * c_mu_beta * denom_nk ** 2 * k
    s_mu = -x[3] * s_mu_beta * denom_nk
    s_v = c_mu_beta * denom_nk
    s_delta = -x[3] * s_mu_beta * denom_nk * beta_d

    n_mu = x[3] * c_mu_beta
    n_v = s_mu_beta
    n_delta = x[3] * c_mu_beta * beta_d

    mu_s = 0.0
    mu_n = -s_n * k
    mu_mu = -s_mu * k
    mu_v = np.sin(beta) / LR - s_v * k
    mu_delta = x[3] * np.cos(beta) * beta_d / LR - s_delta * k

    if kappa_d is not None:   # dormant path, A_curv_kin.m:44-48
        k_d = kappa_d(x[0])
        s_s = x[3] * c_mu_beta * denom_nk ** 2 * k_d * x[1]
        mu_s = -x[3] * c_mu_beta * denom_nk * k_d - s_s * k

    return np.array([
        [s_s, s_n, s_mu, s_v, s_delta],
        [0, 0, n_mu, n_v, n_delta],
        [mu_s, mu_n, mu_mu, mu_v, mu_delta],
        [0, 0, 0, 0, 0],
        [0, 0, 0, 0, 0],
    ])


# ``B_curv_kin.m:12-16``
B_CURV_KIN = np.array([[0.0, 0], [0, 0], [0, 0], [1, 0], [0, 1]])

# ``B_curv_dyn.m:12-18``
B_CURV_DYN = np.array([[0.0, 0], [0, 0], [0, 0], [1, 0], [0, 0], [0, 0],
                       [0, 1]])


def _pacejka(alpha):
    Ba = PB * alpha
    return PD * np.sin(PC * np.arctan(Ba - PE * (Ba - np.arctan(Ba))))


def _pacejka_d(alpha):
    """dF/dalpha of the magic formula (``A_curv_dyn.m:49-57``)."""
    Ba = PB * alpha
    inner = Ba - PE * (Ba - np.arctan(Ba))
    return (PD * np.cos(PC * np.arctan(inner)) * PC / (1.0 + inner ** 2)
            * (PB - PE * (PB - PB / (1.0 + PB ** 2 * alpha ** 2))))


def f_curv_dyn(x, u, kappa):
    """``vehicle_models/curvilinear_dynamic/f_curv_dyn.m:20-63``."""
    s, n, mu, x_d, y_d, theta_d, delta = x
    Fx = u[0] * MASS
    x_d_hat = x_d + 5.0 * np.exp(-x_d / 5.0)
    k = kappa(s)
    denom_nk = 1.0 / (1.0 - n * k)
    alpha_f = delta - np.arctan((y_d + LF * theta_d) / x_d_hat)
    alpha_r = -np.arctan((y_d - LR * theta_d) / x_d_hat)
    Fzf = MASS * GRAV * LR / (LR + LF)
    Fzr = MASS * GRAV * LF / (LR + LF)
    Fcf = Fzf * _pacejka(alpha_f)
    Fcr = Fzr * _pacejka(alpha_r)
    f = np.array([
        (x_d * np.cos(mu) - y_d * np.sin(mu)) * denom_nk,
        x_d * np.sin(mu) + y_d * np.cos(mu),
        theta_d - (x_d * np.cos(mu) - y_d * np.sin(mu)) * denom_nk * k,
        (Fx - Fcf * np.sin(delta) + MASS * y_d * theta_d) / MASS,
        (Fcr + Fcf * np.cos(delta) - MASS * x_d * theta_d) / MASS,
        (LF * Fcf * np.cos(delta) - LR * Fcr) / IZ,
        u[1],
    ])
    return f, Fcr


def A_curv_dyn(x, u, kappa, bug_compatible=True):
    """``vehicle_models/curvilinear_dynamic/A_curv_dyn.m:28-105``.

    Returns (A, Fcr, Fcr_d, vr, denom_vr2, x_d_hat, x_d_hat_d, vf,
    denom_vf2) -- the 8 intermediates the constraint linearisers reuse.

    Third reference quirk (``A_curv_dyn.m:88``): ``yd_thetad`` uses
    ``- m * x_d_hat`` where the true derivative of the Coriolis term
    ``- m x_d theta_d`` is ``- x_d`` -- off by ``5 exp(-x_d/5)`` (~0.14 at
    racing speed, ~3.6 near standstill).  ``bug_compatible=False`` corrects
    it to match autodiff of ``f_curv_dyn``.
    """
    s, n, mu, x_d, y_d, theta_d, delta = x
    x_d_hat = x_d + 5.0 * np.exp(-x_d / 5.0)
    x_d_hat_d = 1.0 - np.exp(-x_d / 5.0)
    alpha_f = delta - np.arctan((y_d + LF * theta_d) / x_d_hat)
    alpha_r = -np.arctan((y_d - LR * theta_d) / x_d_hat)
    Fzf = MASS * GRAV * LR / (LR + LF)
    Fzr = MASS * GRAV * LF / (LR + LF)
    Fcf = Fzf * _pacejka(alpha_f)
    Fcr = Fzr * _pacejka(alpha_r)
    Fcf_d = Fzf * _pacejka_d(alpha_f)
    Fcr_d = Fzr * _pacejka_d(alpha_r)

    k = kappa(s)
    denom_nk = 1.0 / (1.0 - n * k)
    vf = (y_d + LF * theta_d) / x_d_hat
    vr = (y_d - LR * theta_d) / x_d_hat
    denom_vf2 = 1.0 / (1.0 + vf ** 2)
    denom_vr2 = 1.0 / (1.0 + vr ** 2)

    s_n = (x_d * np.cos(mu) - y_d * np.sin(mu)) * denom_nk ** 2 * k
    s_mu = (-x_d * np.sin(mu) - y_d * np.cos(mu)) * denom_nk
    s_xd = np.cos(mu) * denom_nk
    s_yd = -np.sin(mu) * denom_nk

    n_mu = x_d * np.cos(mu) - y_d * np.sin(mu)
    n_xd = np.sin(mu)
    n_yd = np.cos(mu)

    mu_n = -s_n * k
    mu_mu = -s_mu * k
    mu_xd = -s_xd * k
    mu_yd = -s_yd * k

    m = MASS
    xd_xd = -Fcf_d * denom_vf2 * vf * np.sin(delta) * x_d_hat_d / (m * x_d_hat)
    xd_yd = (Fcf_d * denom_vf2 * np.sin(delta) / x_d_hat + m * theta_d) / m
    xd_thetad = (Fcf_d * denom_vf2 * LF * np.sin(delta) / x_d_hat
                 + m * y_d) / m
    xd_delta = (-Fcf * np.cos(delta) - Fcf_d * np.sin(delta)) / m

    yd_xd = (Fcr_d * denom_vr2 * vr * x_d_hat_d / x_d_hat
             + Fcf_d * denom_vf2 * vf * np.cos(delta) * x_d_hat_d / x_d_hat
             - m * theta_d) / m
    yd_yd = (-Fcr_d * denom_vr2 / x_d_hat
             - Fcf_d * denom_vf2 / x_d_hat * np.cos(delta)) / m
    yd_thetad = (Fcr_d * denom_vr2 * LR / x_d_hat
                 - Fcf_d * denom_vf2 * LF / x_d_hat * np.cos(delta)
                 - m * (x_d_hat if bug_compatible else x_d)) / m
    yd_delta = (-Fcf * np.sin(delta) + Fcf_d * np.cos(delta)) / m

    t_xd = (LF * Fcf_d * denom_vf2 * vf * np.cos(delta) * x_d_hat_d / x_d_hat
            - LR * Fcr_d * denom_vr2 * vr * x_d_hat_d / x_d_hat) / IZ
    t_yd = (-LF * Fcf_d * denom_vf2 * np.cos(delta) / x_d_hat
            + LR * Fcr_d * denom_vr2 / x_d_hat) / IZ
    t_thetad = (-LF * Fcf_d * denom_vf2 * LF * np.cos(delta) / x_d_hat
                - LR * Fcr_d * denom_vr2 * LR / x_d_hat) / IZ
    t_delta = (-LF * Fcf * np.sin(delta) + LF * Fcf_d * np.cos(delta)) / IZ

    A = np.array([
        [0, s_n, s_mu, s_xd, s_yd, 0, 0],
        [0, 0, n_mu, n_xd, n_yd, 0, 0],
        [0, mu_n, mu_mu, mu_xd, mu_yd, 1, 0],
        [0, 0, 0, xd_xd, xd_yd, xd_thetad, xd_delta],
        [0, 0, 0, yd_xd, yd_yd, yd_thetad, yd_delta],
        [0, 0, 0, t_xd, t_yd, t_thetad, t_delta],
        [0, 0, 0, 0, 0, 0, 0],
    ])
    return A, Fcr, Fcr_d, vr, denom_vr2, x_d_hat, x_d_hat_d, vf, denom_vf2


# --------------------------------------------------------------------------
# L4: per-stage RK linearizers
# --------------------------------------------------------------------------

def rk2_lin(x_lin, u_lin, kappa, dt, f_fn, A_fn, B_const):
    """``mpc/ltv/kinematic/rk2_kinematic_curvilinear.m:25-59`` (and the
    identical dynamic variant).  Returns continuous-style (A, B, d) of
    ``dx/dt = Ax + Bu + d``."""
    N, nx = x_lin.shape
    nu = u_lin.shape[1]
    I = np.eye(nx)
    A = np.zeros((N, nx, nx))
    B = np.zeros((N, nx, nu))
    d = np.zeros((N, nx))
    for i in range(N):
        x_i, u_i = x_lin[i], u_lin[i]
        k1 = f_fn(x_i, u_i, kappa)
        f = f_fn(x_i + k1 * dt / 2, u_i, kappa)
        dfdx1 = A_fn(x_i, u_i, kappa)
        dfdx2 = A_fn(x_i + k1 * dt / 2, u_i, kappa)
        dkdx2 = dfdx2 @ (I + dfdx1 * dt / 2)
        dkdu2 = B_const + dfdx2 @ B_const * dt / 2
        A[i], B[i] = dkdx2, dkdu2
        d[i] = f - dkdx2 @ x_i - dkdu2 @ u_i
    return A, B, d


def rk4_lin(x_lin, u_lin, kappa, dt, f_fn, A_fn, B_const,
            bug_compatible=True):
    """``mpc/ltv/dynamic/rk4_dynamic_curvilinear.m:25-64``.

    ``bug_compatible=True`` reproduces line :56's ``dkdu4 = ... dt / 2``
    (the true RK4 chain rule has ``dt``)."""
    N, nx = x_lin.shape
    nu = u_lin.shape[1]
    I = np.eye(nx)
    A = np.zeros((N, nx, nx))
    B = np.zeros((N, nx, nu))
    d = np.zeros((N, nx))
    last = dt / 2 if bug_compatible else dt
    for i in range(N):
        x_i, u_i = x_lin[i], u_lin[i]
        k1 = f_fn(x_i, u_i, kappa)
        k2 = f_fn(x_i + k1 * dt / 2, u_i, kappa)
        k3 = f_fn(x_i + k2 * dt / 2, u_i, kappa)
        k4 = f_fn(x_i + k3 * dt, u_i, kappa)
        f = (k1 + 2 * k2 + 2 * k3 + k4) / 6

        dfdx1 = A_fn(x_i, u_i, kappa)
        dfdx2 = A_fn(x_i + k1 * dt / 2, u_i, kappa)
        dfdx3 = A_fn(x_i + k2 * dt / 2, u_i, kappa)
        dfdx4 = A_fn(x_i + k3 * dt, u_i, kappa)

        dkdx1 = dfdx1
        dkdx2 = dfdx2 @ (I + dkdx1 * dt / 2)
        dkdx3 = dfdx3 @ (I + dkdx2 * dt / 2)
        dkdx4 = dfdx4 @ (I + dkdx3 * dt)

        dkdu1 = B_const
        dkdu2 = B_const + dfdx2 @ dkdu1 * dt / 2
        dkdu3 = B_const + dfdx3 @ dkdu2 * dt / 2
        dkdu4 = B_const + dfdx4 @ dkdu3 * last

        A[i] = (dkdx1 + 2 * dkdx2 + 2 * dkdx3 + dkdx4) / 6
        B[i] = (dkdu1 + 2 * dkdu2 + 2 * dkdu3 + dkdu4) / 6
        d[i] = f - A[i] @ x_i - B[i] @ u_i
    return A, B, d


def _f_kin_only(x, u, kappa):
    return f_curv_kin(x, u, kappa)


def _f_dyn_only(x, u, kappa):
    return f_curv_dyn(x, u, kappa)[0]


def _A_kin(x, u, kappa):
    return A_curv_kin(x, u, kappa)


def _A_dyn(x, u, kappa):
    return A_curv_dyn(x, u, kappa)[0]


def _A_dyn_fixed(x, u, kappa):
    return A_curv_dyn(x, u, kappa, bug_compatible=False)[0]


# --------------------------------------------------------------------------
# L4: condensing + QP assembly
# --------------------------------------------------------------------------

def sequential_integration(A, B, d, dt, bug_compatible=True):
    """``mpc/ltv/sequential_integration.m:14-49``.

    ``bug_compatible=True`` reproduces line :32: every diagonal block of
    B_bar is ``B(:, :, 1)`` (stage 1's B) instead of stage i's."""
    N, nx, nu = B.shape
    Ah = A * dt + np.eye(nx)
    Bh = B * dt
    dh = d * dt

    A_bar = np.zeros((N * nx, nx))
    A_bar[:nx] = Ah[0]
    for i in range(1, N):
        A_bar[i * nx:(i + 1) * nx] = Ah[i] @ A_bar[(i - 1) * nx:i * nx]

    B_bar = np.zeros((N * nx, N * nu))
    for i in range(N):
        B_bar[i * nx:(i + 1) * nx, i * nu:(i + 1) * nu] = (
            Bh[0] if bug_compatible else Bh[i])
        for j in range(i + 1, N):
            B_bar[j * nx:(j + 1) * nx, i * nu:(i + 1) * nu] = (
                Ah[j] @ B_bar[(j - 1) * nx:j * nx, i * nu:(i + 1) * nu])

    D = np.zeros((N * nx, N * nx))
    for i in range(N):
        D[i * nx:(i + 1) * nx, i * nx:(i + 1) * nx] = np.eye(nx)
        for j in range(i + 1, N):
            D[j * nx:(j + 1) * nx, i * nx:(i + 1) * nx] = (
                Ah[j] @ D[(j - 1) * nx:j * nx, i * nx:(i + 1) * nx])
    d_bar = D @ dh.reshape(-1)
    return A_bar, B_bar, d_bar


def generate_qp(A_bar, B_bar, d_bar, x0, x_ref, Q, Q_terminal, R, R_soft):
    """``mpc/ltv/generate_qp.m:17-34``.  ``B_bar`` already carries the
    appended zero slack columns (the MATLAB passes the appended matrix)."""
    N, nx = x_ref.shape
    n_soft = len(R_soft)
    nu = len(R)
    q_diag = np.concatenate([np.tile(Q, N - 1), Q_terminal])
    r_diag = np.concatenate([np.tile(R, N), np.zeros(n_soft)])
    err = A_bar @ x0 + d_bar - x_ref.reshape(-1)
    H = 2.0 * (B_bar.T @ (q_diag[:, None] * B_bar) + np.diag(r_diag))
    f = 2.0 * B_bar.T @ (q_diag * err)
    f[-n_soft:] = R_soft
    const = err @ (q_diag * err)
    return H, f, const


def kinematic_tyre_constraints(A_bar, B_bar_app, d_bar, x_lin, x0):
    """``mpc/ltv/kinematic/kinematic_tyre_linearise_constraints.m:14-31``."""
    N, nx = x_lin.shape
    C_bar = np.zeros((N, N * nx))
    g_bar = np.zeros(N)
    for i in range(N):
        x = x_lin[i]
        g_bar[i] = x[3] ** 2 * x[4] / (LR + LF)
        C_bar[i, i * nx:(i + 1) * nx] = (
            np.array([0, 0, 0, 2 * x[3] * x[4], x[3] ** 2]) / (LF + LR))
    A = C_bar @ B_bar_app
    const = g_bar + C_bar @ (A_bar @ x0 + d_bar - x_lin.reshape(-1))
    return A, -5.0 - const, 5.0 - const


def kinematic_state_constraints(A_bar, B_bar, d_bar, x0, x_lb, x_ub,
                                state_idx, soft_idx, x_lin):
    """``mpc/ltv/kinematic/kinematic_state_constraints.m:1-55``.

    ``state_idx``/``soft_idx``: 0-based state component indices.  ``x_lb``/
    ``x_ub``: (N*(n_state+n_soft),) in the reference's column-major layout
    (all bounds of component 1, then component 2, ...)."""
    N = x_lin.shape[0]
    nx = x_lin.shape[1]
    n_state = len(state_idx)
    n_soft = len(soft_idx)
    B_app = np.concatenate([B_bar, np.zeros((N * nx, n_soft))], axis=1)

    state_rows = np.concatenate(
        [np.arange(idx, N * nx, nx) for idx in state_idx])
    soft_rows = np.concatenate(
        [np.arange(idx, N * nx, nx) for idx in soft_idx])
    cons_rows = np.concatenate([state_rows, soft_rows])

    A_sel = A_bar[cons_rows]
    xA = B_app[np.concatenate([cons_rows, soft_rows])]
    const = A_sel @ x0 + d_bar[cons_rows]

    lbA = x_lb - const
    ubA = x_ub - const
    lbA = np.concatenate([lbA, -np.full(n_soft * N, 1e10)])
    ubA = np.concatenate([ubA[:n_state * N], np.full(n_soft * N, 1e10),
                          ubA[n_state * N:]])
    # shared slack on both soft copies (:42)
    xA[-2 * n_soft * N:, -1] = np.concatenate(
        [np.ones(n_soft * N), -np.ones(n_soft * N)])

    A_ay, lb_ay, ub_ay = kinematic_tyre_constraints(
        A_bar, B_app, d_bar, x_lin, x0)
    xA = np.concatenate([xA, A_ay, A_ay], axis=0)
    lbA = np.concatenate([lbA, lb_ay, -np.full(N, np.inf)])
    ubA = np.concatenate([ubA, np.full(N, np.inf), ub_ay])
    xA[-2 * N:, -1] = np.concatenate([np.ones(N), -np.ones(N)])
    return B_app, xA, lbA, ubA


def dynamic_slip_constraints(A_bar, B_bar_app, d_bar, x_lin, u_lin, x0,
                             kappa):
    """``mpc/ltv/dynamic/dynamic_slip_linearise_constraints.m:16-46``."""
    N, nx = x_lin.shape
    nu = u_lin.shape[1]
    C_bar = np.zeros((2 * N, N * nx))
    g_bar = np.zeros(2 * N)
    for i in range(N):
        x, u = x_lin[i], u_lin[i]
        (_, _, _, vr, dvr2, xdh, xdh_d, vf, dvf2) = A_curv_dyn(x, u, kappa)
        g_bar[2 * i] = -np.arctan(vr)
        g_bar[2 * i + 1] = x[6] - np.arctan(vf)
        C_bar[2 * i, i * nx:(i + 1) * nx] = [
            0, 0, 0, dvr2 * vr * xdh_d / xdh, -dvr2 / xdh, dvr2 * LR / xdh, 0]
        C_bar[2 * i + 1, i * nx:(i + 1) * nx] = [
            0, 0, 0, dvf2 * vf * xdh_d / xdh, -dvf2 / xdh, -dvf2 * LF / xdh,
            1]
    A = C_bar @ B_bar_app   # D_bar is all-zero (:32-33)
    const = g_bar + C_bar @ (A_bar @ x0 + d_bar - x_lin.reshape(-1))
    lb = np.tile([-0.1, -0.1], N) - const
    ub = np.tile([0.1, 0.1], N) - const
    return A, lb, ub


def dynamic_tyre_constraints(A_bar, B_bar_app, d_bar, x_lin, u_lin, x0,
                             kappa, n_soft=4):
    """``mpc/ltv/dynamic/dynamic_tyre_linearise_constraints.m:14-61``
    (12-gon outer approximation of the friction ellipse)."""
    AC_MAX, AL_MAX = 9.163, 10.0
    N, nx = x_lin.shape
    nu = u_lin.shape[1]
    K = 12
    theta = np.linspace(0.0, 2.0 * np.pi, K + 1)
    ac_list = AC_MAX * np.sin(theta)
    al_list = AL_MAX * np.cos(theta)
    dac = ac_list[1:] - ac_list[:K]
    dal = al_list[1:] - al_list[:K]

    C_bar = np.zeros((N * K, N * nx))
    D_bar = np.zeros((N * K, N * nu))
    g_bar = np.zeros(N * K)
    for i in range(N):
        x, u = x_lin[i], u_lin[i]
        (_, Fcr, Fcr_d, vr, dvr2, xdh, xdh_d, _, _) = A_curv_dyn(x, u, kappa)
        for j in range(K):
            g_bar[K * i + j] = ((u[0] - al_list[j]) * dac[j]
                                - (Fcr / 280.0 - ac_list[j]) * dal[j])
            C_bar[K * i + j, i * nx:(i + 1) * nx] = [
                0, 0, 0,
                -dal[j] * Fcr_d * dvr2 * vr * xdh_d / xdh / 280.0,
                dal[j] * Fcr_d * dvr2 / xdh / 280.0,
                -dal[j] * Fcr_d * dvr2 * LR / xdh / 280.0,
                0]
            D_bar[K * i + j, i * nu:(i + 1) * nu] = [dac[j], 0.0]
    A = C_bar @ B_bar_app + np.concatenate(
        [D_bar, np.zeros((N * K, n_soft))], axis=1)
    const = (g_bar + C_bar @ (A_bar @ x0 + d_bar - x_lin.reshape(-1))
             - D_bar @ u_lin.reshape(-1))
    return A, np.full(N * K, -np.inf), -const


def dynamic_state_constraints(A_bar, B_bar, d_bar, x0, x_lb, x_ub,
                              state_idx, soft_idx, x_lin, u_lin, kappa):
    """``mpc/ltv/dynamic/dynamic_state_constraints.m:1-58``."""
    N, nx = x_lin.shape
    n_state = len(state_idx)
    n_soft_track = len(soft_idx)
    B_app = np.concatenate([B_bar, np.zeros((N * nx, 4))], axis=1)

    state_rows = np.concatenate(
        [np.arange(idx, N * nx, nx) for idx in state_idx])
    soft_rows = np.concatenate(
        [np.arange(idx, N * nx, nx) for idx in soft_idx])
    cons_rows = np.concatenate([state_rows, soft_rows])

    A_sel = A_bar[cons_rows]
    xA = B_app[np.concatenate([cons_rows, soft_rows])]
    const = A_sel @ x0 + d_bar[cons_rows]

    lbA = x_lb - const
    ubA = x_ub - const
    lbA = np.concatenate([lbA, -np.full(n_soft_track * N, 1e10)])
    ubA = np.concatenate([ubA[:n_state * N],
                          np.full(n_soft_track * N, 1e10),
                          ubA[n_state * N:]])
    # track slack is column -4 (:44)
    xA[-2 * n_soft_track * N:, -4] = np.concatenate(
        [np.ones(n_soft_track * N), -np.ones(n_soft_track * N)])

    A_sl, lb_sl, ub_sl = dynamic_slip_constraints(
        A_bar, B_app, d_bar, x_lin, u_lin, x0, kappa)
    xA = np.concatenate([xA, A_sl, A_sl], axis=0)
    lbA = np.concatenate([lbA, lb_sl, -np.full(2 * N, np.inf)])
    ubA = np.concatenate([ubA, np.full(2 * N, np.inf), ub_sl])
    # rear slack col -3, front col -2, both copies (:52)
    eye2 = np.tile(np.eye(2), (N, 1))
    xA[-4 * N:, -3:-1] = np.concatenate([eye2, -eye2], axis=0)

    A_ty, lb_ty, ub_ty = dynamic_tyre_constraints(
        A_bar, B_app, d_bar, x_lin, u_lin, x0, kappa)
    xA = np.concatenate([xA, A_ty], axis=0)
    lbA = np.concatenate([lbA, lb_ty])
    ubA = np.concatenate([ubA, ub_ty])
    xA[-len(A_ty):, -1] = -1.0   # tyre slack col -1 (:57)
    return B_app, xA, lbA, ubA


# --------------------------------------------------------------------------
# Full LTV front-ends
# --------------------------------------------------------------------------

def ltv_kinematic_qp(x0, x_ref, kappa, dt, x_lin, u_lin,
                     bug_compatible=True):
    """``mpc/ltv/kinematic/ltvmpc_kinetmatic_curvilinear.m:17-58``.

    Returns a dict with the assembled QP (H, f, xA, u_lb, u_ub, lbA, ubA,
    const) plus A_bar/B_bar_app/d_bar for x_opt recovery."""
    N = x_ref.shape[0]
    x_lb = np.concatenate([np.zeros(N), np.full(N, -0.4),
                           np.full(N, -0.75)])
    x_ub = np.concatenate([np.full(N, np.inf), np.full(N, 0.4),
                           np.full(N, 0.75)])
    u_lb = np.concatenate([np.tile([-10.0, -0.4], N), [0.0]])
    u_ub = np.concatenate([np.tile([10.0, 0.4], N), [np.inf]])
    Q = np.array([5.0, 250.0, 2000.0, 0.0, 0.0])
    R = np.array([10.0, 10.0])
    R_soft = np.array([1e8])

    A, B, d = rk2_lin(x_lin, u_lin, kappa, dt, _f_kin_only, _A_kin,
                      B_CURV_KIN)
    A_bar, B_bar, d_bar = sequential_integration(
        A, B, d, dt, bug_compatible=bug_compatible)
    B_app, xA, lbA, ubA = kinematic_state_constraints(
        A_bar, B_bar, d_bar, x0, x_lb, x_ub, state_idx=[3, 4], soft_idx=[1],
        x_lin=x_lin)
    H, f, const = generate_qp(A_bar, B_app, d_bar, x0, x_ref, Q, Q * 10.0,
                              R, R_soft)
    return dict(H=H, f=f, xA=xA, u_lb=u_lb, u_ub=u_ub, lbA=lbA, ubA=ubA,
                const=const, A_bar=A_bar, B_app=B_app, d_bar=d_bar)


def ltv_dynamic_qp(x0, x_ref, kappa, dt, x_lin, u_lin, bug_compatible=True):
    """``mpc/ltv/dynamic/ltvmpc_dynamic_curvilinear.m:17-58``."""
    N = x_ref.shape[0]
    x_lb = np.concatenate([np.zeros(N), np.full(N, -0.4),
                           np.full(N, -0.75)])
    x_ub = np.concatenate([np.full(N, np.inf), np.full(N, 0.4),
                           np.full(N, 0.75)])
    u_lb = np.concatenate([np.tile([-10.0, -0.4], N), np.zeros(4)])
    u_ub = np.concatenate([np.tile([10.0, 0.4], N), np.full(4, np.inf)])
    Q = np.array([5.0, 250.0, 2000.0, 0.0, 0.0, 0.0, 0.0])
    R = np.array([10.0, 10.0])
    R_soft = np.array([1e8, 1e6, 1e6, 1e4])

    A_fn = _A_dyn if bug_compatible else _A_dyn_fixed
    A, B, d = rk4_lin(x_lin, u_lin, kappa, dt, _f_dyn_only, A_fn,
                      B_CURV_DYN, bug_compatible=bug_compatible)
    A_bar, B_bar, d_bar = sequential_integration(
        A, B, d, dt, bug_compatible=bug_compatible)
    B_app, xA, lbA, ubA = dynamic_state_constraints(
        A_bar, B_bar, d_bar, x0, x_lb, x_ub, state_idx=[3, 6], soft_idx=[1],
        x_lin=x_lin, u_lin=u_lin, kappa=kappa)
    H, f, const = generate_qp(A_bar, B_app, d_bar, x0, x_ref, Q, Q * 10.0,
                              R, R_soft)
    return dict(H=H, f=f, xA=xA, u_lb=u_lb, u_ub=u_ub, lbA=lbA, ubA=ubA,
                const=const, A_bar=A_bar, B_app=B_app, d_bar=d_bar)
