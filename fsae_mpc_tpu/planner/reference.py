"""s -> t reference resampling for planner-tracking MPC.

Converts the s-parameterised minimum-time raceline (node states + per-node
traversal times) into the time-parameterised N-step reference the MPC
tracks.  Replaces ``util/obtain_reference.m``, whose incremental
segment-walking while-loop (``obtain_reference.m:24-37``) becomes a
vectorised cumulative-time ``searchsorted`` -- identical semantics
(linear interpolation within a node by elapsed-time fraction), but
shape-static and jit/vmap-safe so it can run inside the simulation scan.
"""

from __future__ import annotations

import jax.numpy as jnp


def obtain_reference(y_nodes, u_nodes, t_nodes, ds, s0, dt, n_steps):
    """Time-resample a periodic s-domain plan.

    Args:
      y_nodes: (N, ny) node states (dynamic planner: [n, mu, x_d, y_d,
        theta_d, delta]).
      u_nodes: (N, nu) node controls (used only for completeness).
      t_nodes: (N,) per-node traversal times (``ds / s_dot``).
      ds: node spacing in s;  s0: current arclength position;
      dt: MPC step;  n_steps: horizon length.

    Returns:
      x_ref: (n_steps, 1 + ny) rows ``[s, *y]`` at times s0 + k*dt,
      k = 1..n_steps, with s unwrapped to be monotonically increasing from
      s0 (``obtain_reference.m:41-48``).
    """
    N = t_nodes.shape[0]
    L = ds * N
    T_cum = jnp.concatenate([jnp.zeros((1,), t_nodes.dtype),
                             jnp.cumsum(t_nodes)])
    T_lap = T_cum[-1]

    # starting node + fraction from s0
    s_wrap = jnp.mod(s0, L)
    idx0 = jnp.clip(jnp.floor(s_wrap / ds).astype(jnp.int32), 0, N - 1)
    rto0 = s_wrap / ds - idx0
    tau0 = T_cum[idx0] + rto0 * t_nodes[idx0]

    # query times, wrapped onto the lap
    k = jnp.arange(1, n_steps + 1, dtype=t_nodes.dtype)
    tau = jnp.mod(tau0 + k * dt, T_lap)
    j = jnp.clip(jnp.searchsorted(T_cum, tau, side="right") - 1, 0, N - 1)
    rto = (tau - T_cum[j]) / t_nodes[j]

    # unwrapped arclength progressed since (idx0, rto0)
    prog = jnp.mod((j + rto) - (idx0 + rto0), N) * ds
    s_ref = s0 + prog

    y_j = y_nodes[j]
    y_nxt = y_nodes[jnp.mod(j + 1, N)]
    y_ref = y_j + (y_nxt - y_j) * rto[:, None]
    return jnp.concatenate([s_ref[:, None], y_ref], axis=1)
