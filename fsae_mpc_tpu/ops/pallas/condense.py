"""Pallas TPU kernel: fused batched condensing in batch-lanes layout.

The LTV tick's condense stage (``ops/condense.py:condense``, the TPU
rewrite of ``mpc/ltv/sequential_integration.m:21-47``) is a 40-step
``lax.scan`` whose per-step work is a tiny (nx, nx) @ (nx, N*nu + nx + 1)
batched matmul.  On the chip that is latency-bound: 40 kernel dispatches,
each reading and writing the whole running carry through HBM -- measured
11 ms at batch 1024 against a 0.5 ms HBM speed-of-light (PROFILE_r03).

This kernel runs the entire recurrence on-chip: the grid is
(batch blocks, stages) with the stage axis innermost and sequential; the
carry (phi', G, delta) lives in VMEM scratch that persists across the
stage iterations, and each stage writes its (A_bar[i], B_bar[i],
d_bar[i]) output block directly.  The batch dimension rides the 128 TPU
vector lanes, so each per-stage contraction is an unrolled sum of nx
fully-vectorised VPU FMAs -- no MXU involvement, no HBM round trips for
the carry.

Mosaic-friendly layout trick: the kernel receives Ad TRANSPOSED
(At[j, r] = Ad[r, j]) and keeps every carry in column-major form
(phi'[c, r], G[c, r]).  All three recurrences then share one
slice-only broadcast shape,

    new[c, r, b] = sum_j old[c, j, b] * At[j, r, b]
                 = sum_j old[:, j:j+1, :] * At[j:j+1, :, :],

with no newaxis/gather ops (Mosaic lowers only 2D gathers), and the
per-stage control insert ``G[i*nu:(i+1)*nu] = Bd_i'`` is a cheap
major-axis dynamic store.  The host-side wrapper transposes inputs and
outputs back; those XLA transposes are a fraction of the saved traffic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..condense import condense as _condense_scan

LANES = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _condense_kernel(adt_ref, bd_ref, dd_ref, abar_ref, bbar_ref, dbar_ref,
                     phiT, G, delta):
    """One stage of the condensing recurrence for one batch block.

    Block shapes (TB = LANES):
      adt_ref:  (1, nx, nx, TB)      stage transition, TRANSPOSED (j, r)
      bd_ref:   (1, nu, nx, TB)      stage input map, control-major (k, r)
      dd_ref:   (1, nx, TB)          stage offset (r)
      abar_ref: (1, nx, nx, TB)      out: A_bar[i]' (c, r)
      bbar_ref: (1, NCnu, nx, TB)    out: B_bar[i]' (c, r)
      dbar_ref: (1, nx, TB)          out: d_bar[i] (r)
      phiT:     (nx, nx, TB)         scratch carry (c, r); persists
      G:        (NCnu, nx, TB)       scratch carry (c, r); persists
      delta:    (1, nx, TB)          scratch carry (r); persists
    """
    i = pl.program_id(1)
    nx = adt_ref.shape[1]
    nu = bd_ref.shape[1]

    At = adt_ref[0]                  # (nx_j, nx_r, TB)

    @pl.when(i == 0)
    def _():
        # carry init: phi = I (symmetric, so phi' = I too), G = 0, d = 0
        shp = phiT.shape
        eye = (jax.lax.broadcasted_iota(jnp.int32, shp, 0)
               == jax.lax.broadcasted_iota(jnp.int32, shp, 1))
        phiT[:] = jnp.where(eye, 1.0, 0.0).astype(phiT.dtype)
        G[:] = jnp.zeros_like(G)
        delta[:] = jnp.zeros_like(delta)

    phiT_old = phiT[:]
    G_old = G[:]
    delta_old = delta[:]             # (1, nx, TB)

    phi_new = phiT_old[:, 0:1, :] * At[0:1, :, :]        # (nx, nx, TB)
    G_new = G_old[:, 0:1, :] * At[0:1, :, :]             # (NCnu, nx, TB)
    d_new = delta_old[:, 0:1, :] * At[0:1, :, :]         # (1, nx, TB)
    for j in range(1, nx):
        phi_new += phiT_old[:, j:j + 1, :] * At[j:j + 1, :, :]
        G_new += G_old[:, j:j + 1, :] * At[j:j + 1, :, :]
        d_new += delta_old[:, j:j + 1, :] * At[j:j + 1, :, :]
    d_new = d_new + dd_ref[:]

    phiT[:] = phi_new
    delta[:] = d_new
    G[:] = G_new
    G[pl.ds(i * nu, nu)] = bd_ref[0]

    abar_ref[0] = phi_new
    bbar_ref[0] = G[:]
    dbar_ref[:] = d_new


def _pad_lanes(x):
    b = x.shape[-1]
    pad = (-b) % LANES
    if pad:
        widths = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
        x = jnp.pad(x, widths)
    return x, b


def condense_lanes(Ad, Bd, dd):
    """Batched fused condense.  Ad: (B, N, nx, nx), Bd: (B, N, nx, nu),
    dd: (B, N, nx) -> (A_bar (B, N, nx, nx), B_bar (B, N, nx, N*nu),
    d_bar (B, N, nx))."""
    B, N, nx, nu = Bd.shape
    NCnu = N * nu
    dtype = Ad.dtype

    # transposed stage matrices, batch in lanes
    Adt, b0 = _pad_lanes(jnp.moveaxis(jnp.swapaxes(Ad, -1, -2), 0, -1))
    Bdt, _ = _pad_lanes(jnp.moveaxis(jnp.swapaxes(Bd, -1, -2), 0, -1))
    ddt, _ = _pad_lanes(jnp.moveaxis(dd, 0, -1))         # (N, nx, B')
    Bp = Adt.shape[-1]
    nb = Bp // LANES

    out_shapes = (
        jax.ShapeDtypeStruct((N, nx, nx, Bp), dtype),
        jax.ShapeDtypeStruct((N, NCnu, nx, Bp), dtype),
        jax.ShapeDtypeStruct((N, nx, Bp), dtype),
    )
    A_bar_t, B_bar_t, d_bar_t = pl.pallas_call(
        _condense_kernel,
        grid=(nb, N),
        in_specs=[
            pl.BlockSpec((1, nx, nx, LANES), lambda b, i: (i, 0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nu, nx, LANES), lambda b, i: (i, 0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nx, LANES), lambda b, i: (i, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, nx, nx, LANES), lambda b, i: (i, 0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NCnu, nx, LANES), lambda b, i: (i, 0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nx, LANES), lambda b, i: (i, 0, b),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((nx, nx, LANES), dtype),
            pltpu.VMEM((NCnu, nx, LANES), dtype),
            pltpu.VMEM((1, nx, LANES), dtype),
        ],
        interpret=_interpret(),
    )(Adt, Bdt, ddt)

    A_bar = jnp.moveaxis(jnp.swapaxes(A_bar_t[..., :b0], 1, 2), -1, 0)
    B_bar = jnp.moveaxis(jnp.swapaxes(B_bar_t[..., :b0], 1, 2), -1, 0)
    d_bar = jnp.moveaxis(d_bar_t[..., :b0], -1, 0)
    return A_bar, B_bar, d_bar


@jax.custom_batching.custom_vmap
def condense_fused(Ad, Bd, dd):
    """Per-instance condense; batched -> fused Pallas lanes kernel.

    Unbatched calls (CPU golden tests, single-instance latency path) fall
    back to the ``lax.scan`` implementation; under ``vmap`` the whole
    horizon recurrence runs in one Pallas dispatch.
    """
    return _condense_scan(Ad, Bd, dd)


@condense_fused.def_vmap
def _condense_fused_vmap(axis_size, in_batched, Ad, Bd, dd):
    ab, bb, db = in_batched
    if not ab:
        Ad = jnp.broadcast_to(Ad[None], (axis_size,) + Ad.shape)
    if not bb:
        Bd = jnp.broadcast_to(Bd[None], (axis_size,) + Bd.shape)
    if not db:
        dd = jnp.broadcast_to(dd[None], (axis_size,) + dd.shape)
    if _interpret() or Ad.dtype != jnp.float32:
        # off-TPU (CPU tests, virtual-device dryruns) the interpreter would
        # run the grid in Python; non-f32 dtypes (x64 debugging runs on a
        # TPU backend) are unsupported by Mosaic -- batched scan for both.
        return jax.vmap(_condense_scan)(Ad, Bd, dd), (True, True, True)
    return condense_lanes(Ad, Bd, dd), (True, True, True)
