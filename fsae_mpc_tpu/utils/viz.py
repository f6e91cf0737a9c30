"""Headless visualisation of closed-loop runs.

Port of ``util/visualise_mpc.m`` (predicted trajectory over the track) and
the final trajectory plot (``main.m:230-239``) to matplotlib's Agg backend:
instead of live figure animation, render the lap overview / per-tick frames
to files (simulations run on accelerators; plots are post-hoc).
"""

from __future__ import annotations

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from ..models import transforms


def plot_lap(track, sim_out, raceline=None, path="lap.png", title=None):
    """Lap overview: track centreline, cones, and driven trajectory.

    ``sim_out``: a ``SimOutputs``; ``raceline``: optional dict from
    ``read_raceline_csv`` with rx/ry/lx/ly cone lines.
    """
    import jax.numpy as jnp

    L = float(track.L)
    s = jnp.linspace(0.0, L, 800)
    cx, cy = track.position(s)

    fig, ax = plt.subplots(figsize=(9, 7))
    ax.plot(np.asarray(cx), np.asarray(cy), "k-", lw=0.8, label="centreline")
    if raceline is not None:
        ax.plot(raceline["rx"], raceline["ry"], "y.", ms=3, label="right cones")
        ax.plot(raceline["lx"], raceline["ly"], "b.", ms=3, label="left cones")

    x = np.asarray(sim_out.x_history)
    act = np.asarray(sim_out.active)
    ax.plot(x[act, 0], x[act, 1], "r--", lw=1.2, label="driven")
    ax.set_aspect("equal")
    ax.legend(loc="best", fontsize=8)
    if title:
        ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path, dpi=130)
    plt.close(fig)
    return path


def plot_prediction(track, x_cart, x_opt_curv, path="pred.png"):
    """One tick's predicted trajectory over the track
    (``visualise_mpc.m:12-35``): converts the predicted curvilinear states
    back to Cartesian and overlays them on the local track segment."""
    import jax.numpy as jnp

    s = jnp.asarray(x_opt_curv[:, 0])
    n = jnp.asarray(x_opt_curv[:, 1])
    mu = jnp.asarray(x_opt_curv[:, 2])
    px, py, _ = transforms.curvilinear_to_cartesian(s, n, mu, track)

    span = jnp.linspace(float(s[0]) - 10.0, float(s[-1]) + 10.0, 200)
    cx, cy = track.position(span)

    fig, ax = plt.subplots(figsize=(7, 6))
    ax.plot(np.asarray(cx), np.asarray(cy), "k-", lw=0.8)
    ax.plot(np.asarray(px), np.asarray(py), "g.-", ms=4, label="prediction")
    ax.plot([float(x_cart[0])], [float(x_cart[1])], "r*", ms=12, label="car")
    ax.set_aspect("equal")
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(path, dpi=130)
    plt.close(fig)
    return path


def plot_telemetry(sim_out, dt=0.05, path="telemetry.png"):
    """Velocity / steering / lateral-offset traces (``visualise_mpc.m``
    second figure)."""
    x = np.asarray(sim_out.x_history)
    act = np.asarray(sim_out.active)
    t = np.arange(x.shape[0]) * dt

    fig, axes = plt.subplots(3, 1, figsize=(9, 7), sharex=True)
    axes[0].plot(t[act], x[act, 3])
    axes[0].set_ylabel("v_x [m/s]")
    axes[1].plot(t[act], x[act, 6])
    axes[1].set_ylabel("delta [rad]")
    axes[2].plot(t[act], np.asarray(sim_out.n_history)[act])
    axes[2].axhline(0.75, color="r", ls=":", lw=0.8)
    axes[2].axhline(-0.75, color="r", ls=":", lw=0.8)
    axes[2].set_ylabel("n [m]")
    axes[2].set_xlabel("t [s]")
    fig.tight_layout()
    fig.savefig(path, dpi=130)
    plt.close(fig)
    return path
