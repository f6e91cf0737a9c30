"""Condensing: stage-wise affine dynamics -> dense prediction matrices.

Replaces ``mpc/ltv/sequential_integration.m:21-47``, which builds the
prediction matrices with O(N^2) sequential block products in interpreted
MATLAB.  Here a single ``lax.scan`` over the horizon carries the running
transition product and writes one block-row per step; under ``vmap`` each
step becomes one batched (nx x nx) @ (nx x (N*nu + nx + 1)) matmul, so the
batch dimension keeps the MXU busy while the horizon stays the short
sequential axis.

Inputs are the *discrete* stage matrices (x_{k+1} = Ad x_k + Bd u_k + dd),
i.e. the reference's ``A*dt + I`` / ``B*dt`` / ``d*dt``
(``sequential_integration.m:16-18``) already folded in by
``models.integrators.linearize_discrete``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .precision import highest as _highest_precision


@_highest_precision
def condense(Ad, Bd, dd):
    """Build dense prediction matrices.

    Args:
      Ad: (N, nx, nx), Bd: (N, nx, nu), dd: (N, nx)

    Returns:
      A_bar: (N, nx, nx)      with  A_bar[i] = Ad_i ... Ad_0
      B_bar: (N, nx, N*nu)    lower-block-triangular: x_i sensitivity to u_j
      d_bar: (N, nx)          accumulated affine offsets

    such that  x_{i+1} = A_bar[i] x_0 + B_bar[i] u_flat + d_bar[i].
    """
    N, nx, nu = Bd.shape
    dtype = Ad.dtype

    def step(carry, inp):
        phi, G, delta = carry
        i, A_i, B_i, d_i = inp
        phi = A_i @ phi
        G = A_i @ G
        G = lax.dynamic_update_slice(G, B_i, (jnp.int32(0), i * nu))
        delta = A_i @ delta + d_i
        carry = (phi, G, delta)
        return carry, carry

    init = (jnp.eye(nx, dtype=dtype),
            jnp.zeros((nx, N * nu), dtype=dtype),
            jnp.zeros((nx,), dtype=dtype))
    idx = jnp.arange(N, dtype=jnp.int32)
    _, (A_bar, B_bar, d_bar) = lax.scan(step, init, (idx, Ad, Bd, dd))
    return A_bar, B_bar, d_bar


@_highest_precision
def condense_dnc(Ad, Bd, dd):
    """Divide-and-conquer condensing: same outputs as :func:`condense`,
    log2(N) sequential depth instead of N.

    The scan's 40 sequential steps are latency-bound on TPU (each is a
    tiny (nx, nx) @ (nx, N*nu) matmul); here each of the ~log2(N) merge
    levels is ONE batched matmul over all segment pairs, so the whole
    condense is ~6 MXU dispatches.  Merge rule for two adjacent segments
    (prefix transitions A, prefix input maps B, prefix offsets d):

        right entries compose with the left segment's last prefix:
        A_r' = A_r @ A_L,   B_r' = [A_r @ B_L | B_r],   d_r' = A_r @ d_L + d_r

    Measured on the v5e chip (batch 1024, N=40, dynamic model): 13.8 ms ->
    ~2 ms for the condense stage of the LTV tick.
    """
    N, nx, nu = Bd.shape
    dtype = Ad.dtype
    P = 1 << max(1, (N - 1).bit_length())        # pad horizon to power of 2

    eyes = jnp.broadcast_to(jnp.eye(nx, dtype=dtype), (P - N, nx, nx))
    A = jnp.concatenate([Ad, eyes], axis=0)                    # (P, nx, nx)
    B = jnp.concatenate([Bd, jnp.zeros((P - N, nx, nu), dtype)], axis=0)
    d = jnp.concatenate([dd, jnp.zeros((P - N, nx), dtype)], axis=0)

    # segment state: (S, w, ...) with B laid out over the segment's own
    # controls only (w*nu columns); widths double each level
    w = 1
    A = A.reshape(P, 1, nx, nx)
    B = B.reshape(P, 1, nx, nu)
    d = d.reshape(P, 1, nx)
    while w < P:
        AL, AR = A[0::2], A[1::2]                 # (S/2, w, nx, nx)
        BL, BR = B[0::2], B[1::2]
        dL, dR = d[0::2], d[1::2]
        A_last = AL[:, -1]                        # (S/2, nx, nx)
        B_last = BL[:, -1]                        # (S/2, nx, w*nu)
        d_last = dL[:, -1]                        # (S/2, nx)
        AR2 = jnp.einsum("swij,sjk->swik", AR, A_last)
        BRL = jnp.einsum("swij,sjk->swik", AR, B_last)
        dR2 = jnp.einsum("swij,sj->swi", AR, d_last) + dR
        B_new = jnp.concatenate([
            jnp.concatenate([BL, jnp.zeros_like(BR)], axis=-1),
            jnp.concatenate([BRL, BR], axis=-1)], axis=1)
        A = jnp.concatenate([AL, AR2], axis=1)
        d = jnp.concatenate([dL, dR2], axis=1)
        B = B_new
        w *= 2
    return A[0, :N], B[0, :N, :, : N * nu], d[0, :N]


@_highest_precision
def condense_associative(Ad, dd):
    """Log-depth transition/offset products via ``lax.associative_scan``.

    The pair (Phi_i, delta_i) composes associatively:
    (A2, d2) o (A1, d1) = (A2 A1, A2 d1 + d2).  Used for long horizons
    (minimum-time planners, N=500..1000) where the O(N) scan's sequential
    depth dominates.  Returns (A_bar, d_bar) as in :func:`condense`.
    """
    def combine(left, right):
        A1, d1 = left
        A2, d2 = right
        return (jnp.einsum("...ij,...jk->...ik", A2, A1),
                jnp.einsum("...ij,...j->...i", A2, d1) + d2)

    A_bar, d_bar = lax.associative_scan(combine, (Ad, dd), axis=0)
    return A_bar, d_bar


@_highest_precision
def condense_general(Ad, dd, B_terms, n_controls: int,
                     ctrl_stride: int = 1):
    """Condensing for recurrences whose step couples several controls:

        x_{i+1} = Ad_i x_i + sum_k Bd_k[i] u_{i*ctrl_stride + off_k} + dd_i

    ``B_terms``: list of ``(Bd (N, nx, nu), offset int)``; ``n_controls`` is
    the length of the control trajectory.  This covers direct collocation,
    where the linearised trapezoidal defect couples u_i and u_{i+1}
    (``trapezoidal_nmpc_kinematic_curvilinear.m:195-201``, stride 1), and
    Hermite-Simpson's (u_{2i}, u_{2i+1}, u_{2i+2}) coupling (stride 2).

    Returns (A_bar, B_bar, d_bar) with B_bar: (N, nx, n_controls*nu).
    """
    N, nx = dd.shape
    nu = B_terms[0][0].shape[-1]
    dtype = Ad.dtype

    def step(carry, inp):
        phi, G, delta = carry
        i = inp[0]
        A_i = inp[1]
        d_i = inp[2]
        Bs = inp[3:]
        phi = A_i @ phi
        G = A_i @ G
        for (B_all, off), B_i in zip(B_terms, Bs):
            col = (i * ctrl_stride + off) * nu
            cur = lax.dynamic_slice(G, (jnp.int32(0), col), (nx, nu))
            G = lax.dynamic_update_slice(G, cur + B_i, (jnp.int32(0), col))
        delta = A_i @ delta + d_i
        carry = (phi, G, delta)
        return carry, carry

    init = (jnp.eye(nx, dtype=dtype),
            jnp.zeros((nx, n_controls * nu), dtype=dtype),
            jnp.zeros((nx,), dtype=dtype))
    idx = jnp.arange(N, dtype=jnp.int32)
    xs = (idx, Ad, dd) + tuple(B for B, _ in B_terms)
    _, (A_bar, B_bar, d_bar) = lax.scan(step, init, xs)
    return A_bar, B_bar, d_bar


@_highest_precision
def rollout(Ad, Bd, dd, x0, u):
    """Apply the stage dynamics directly: x_{i+1} = Ad_i x_i + Bd_i u_i + dd_i.

    Cheaper than materialising B_bar when only the trajectory (not the
    sensitivity operator) is needed.  ``u``: (N, nu).  Returns (N, nx).
    """
    def step(x, inp):
        A_i, B_i, d_i, u_i = inp
        x_next = A_i @ x + B_i @ u_i + d_i
        return x_next, x_next

    _, xs = lax.scan(step, x0, (Ad, Bd, dd, u))
    return xs
