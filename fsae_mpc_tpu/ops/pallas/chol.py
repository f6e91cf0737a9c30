"""Pallas TPU kernels: batched Cholesky factor/solve in batch-lanes layout.

The IPM hot loop (``ops/ipm.py``) factors thousands of small dense KKT
matrices (n = 84 for the reference's dynamic LTV QP,
``ltvmpc_dynamic_curvilinear.m:28-29``) every iteration.  XLA's blocked
Cholesky (``ops/linalg.py``) expresses this as many small batched matmuls
and slice updates -- dozens of kernel launches over awkward (28, 28)
shapes.  Here the *batch* dimension is laid out along the TPU vector
lanes: K is stored as ``(n, n, B)`` so the classic left-looking column
recursion becomes ~n fully-vectorized VPU steps, each operating on
``(n-j, j, 128)`` registers.  One grid step factors 128 problem instances
entirely in VMEM.

Exposed as :func:`chol_factor` / :func:`chol_solve` with
``jax.custom_batching.custom_vmap``: the unbatched call falls back to the
pure-XLA blocked implementation (used on CPU / in f64 golden tests), while
a ``vmap`` over problem instances dispatches to the lanes kernel -- so
``ipm.solve_qp`` stays a per-instance function and picks up the kernel
automatically under ``vmap``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import linalg as xlinalg

LANES = 128          # batch elements per grid step (TPU lane width)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _factor_kernel(k_ref, l_ref):
    """Left-looking Cholesky of (n, n, TB): L columns overwrite l_ref.

    A non-positive pivot (indefinite K) poisons that instance's factor
    with NaN instead of being silently clamped: the IPM's finite-iterate
    rejection (``ops/ipm.py``: ``good``/inertia escalation) then handles
    the breakdown exactly as it does for the XLA backends.
    """
    n = k_ref.shape[0]
    for j in range(n):
        if j == 0:
            c = k_ref[:, 0, :]                                   # (n, TB)
        else:
            c = k_ref[j:, j, :] - jnp.sum(
                l_ref[j:, :j, :] * l_ref[j, :j, :][None, :, :], axis=1)
        piv = jnp.where(c[0] > 0.0, c[0], jnp.nan)               # (TB,)
        d = jax.lax.rsqrt(piv)
        l_ref[j:, j, :] = c * d[None, :]


def _solve_kernel(l_ref, b_ref, x_ref, y_ref):
    """Solve L L' x = b with L from :func:`_factor_kernel`; b: (n, TB)."""
    n = l_ref.shape[0]
    # forward substitution  L y = b
    for j in range(n):
        if j == 0:
            y = b_ref[0, :]
        else:
            y = b_ref[j, :] - jnp.sum(l_ref[j, :j, :] * y_ref[:j, :], axis=0)
        y_ref[j, :] = y / l_ref[j, j, :]
    # back substitution  L' x = y
    for j in reversed(range(n)):
        if j == n - 1:
            x = y_ref[n - 1, :]
        else:
            x = y_ref[j, :] - jnp.sum(
                l_ref[j + 1:, j, :] * x_ref[j + 1:, :], axis=0)
        x_ref[j, :] = x / l_ref[j, j, :]


# ---------------------------------------------------------------------------
# lanes-layout entry points (operate on (B, ...) arrays)
# ---------------------------------------------------------------------------

def _pad_lanes(x, axis):
    b = x.shape[axis]
    pad = (-b) % LANES
    if pad:
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, pad)
        x = jnp.pad(x, widths)
    return x, b


def factor_lanes(K):
    """Batched Cholesky, K: (B, n, n) SPD -> L: (B, n, n) lower."""
    n = K.shape[-1]
    Kt, b0 = _pad_lanes(jnp.moveaxis(K, 0, -1), -1)              # (n, n, B')
    nb = Kt.shape[-1] // LANES
    Lt = pl.pallas_call(
        _factor_kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((n, n, LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n, n, LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(Kt.shape, K.dtype),
        interpret=_interpret(),
    )(Kt)
    return jnp.moveaxis(Lt[..., :b0], -1, 0)


def solve_lanes(L, rhs):
    """Batched triangular solve pair, L: (B, n, n), rhs: (B, n)."""
    n = L.shape[-1]
    Lt, b0 = _pad_lanes(jnp.moveaxis(L, 0, -1), -1)              # (n, n, B')
    bt, _ = _pad_lanes(jnp.moveaxis(rhs, 0, -1), -1)             # (n, B')
    nb = Lt.shape[-1] // LANES
    xt = pl.pallas_call(
        _solve_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((n, n, LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(bt.shape, rhs.dtype),
        scratch_shapes=[pltpu.VMEM((n, LANES), rhs.dtype)],
        interpret=_interpret(),
    )(Lt, bt)
    return jnp.moveaxis(xt[..., :b0], -1, 0)


# ---------------------------------------------------------------------------
# custom-vmap wrappers: per-instance fallback, lanes kernel under vmap
# ---------------------------------------------------------------------------

@jax.custom_batching.custom_vmap
def chol_factor(K):
    """Cholesky of one (n, n) SPD matrix; batched -> Pallas lanes kernel."""
    return xlinalg.cholesky(K)


@chol_factor.def_vmap
def _chol_factor_vmap(axis_size, in_batched, K):
    (kb,) = in_batched
    if not kb:
        K = jnp.broadcast_to(K[None], (axis_size,) + K.shape)
    return factor_lanes(K), True


@jax.custom_batching.custom_vmap
def chol_solve(L, rhs):
    """Solve L L' x = rhs for one instance; batched -> lanes kernel."""
    return xlinalg.cho_solve(L, rhs)


@chol_solve.def_vmap
def _chol_solve_vmap(axis_size, in_batched, L, rhs):
    lb, rb = in_batched
    if not lb:
        L = jnp.broadcast_to(L[None], (axis_size,) + L.shape)
    if not rb:
        rhs = jnp.broadcast_to(rhs[None], (axis_size,) + rhs.shape)
    return solve_lanes(L, rhs), True
