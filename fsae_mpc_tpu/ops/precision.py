"""True-f32 matmul precision for the numerical chokepoints.

JAX's DEFAULT matmul precision on TPU computes f32 contractions with
bf16 passes (~8 mantissa bits).  That is fine for neural nets but fatal
for the MPC pipeline: the KKT products ``H + A'DA`` mix magnitudes up to
the 1e8 soft-constraint weights, and the condensing products compound
over the N=40 horizon.  Measured on production QPs (fsg2019, dynamic LTV):
bf16-pass matmuls floor the control accuracy at ~0.4 mean / 8 max error
regardless of IPM iteration count; HIGHEST precision restores ~5e-3 mean
/ 0.12 max at a ~20%% throughput cost (scripts/accuracy_iters.py).

Apply :func:`highest` to the solver/condensing entry points so every
contraction traced inside runs at HIGHEST; model evaluation and other
bulk math stay at DEFAULT.
"""

from __future__ import annotations

import functools

import jax


def highest(fn):
    """Decorator: trace ``fn`` under ``jax.default_matmul_precision("highest")``."""
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)
    return wrapped


# ---------------------------------------------------------------------------
# double-f32 (error-free transform) helpers
# ---------------------------------------------------------------------------
#
# TPUs have no native f64.  For the one place the MPC pipeline genuinely
# needs more than f32 -- evaluating the residual gradient g + H @ x at a
# near-optimal iterate, where ~1e6-magnitude terms cancel to O(1) -- we
# compute the sum with error-free transformations: Dekker-split exact
# partial products plus a double-compensated (hi, lo) tree reduction.
# Everything is plain f32 VPU arithmetic, so it runs at full speed on any
# backend and keeps ~2x f32 precision (~48 mantissa bits).

_SPLIT = 4097.0        # 2**12 + 1: Dekker split constant for f32 (24-bit)


def _split(a):
    """Exact split a = hi + lo with <=12-bit mantissas each."""
    import jax.numpy as jnp
    t = jnp.asarray(_SPLIT, a.dtype) * a
    hi = t - (t - a)
    return hi, a - hi


def _dd_add(a, b):
    """Add two double-f32 numbers (hi, lo) -> (hi, lo) (Knuth two-sum)."""
    ah, al = a
    bh, bl = b
    s = ah + bh
    v = s - ah
    e = (ah - (s - v)) + (bh - v)
    e = e + (al + bl)
    hi = s + e
    lo = e - (hi - s)
    return hi, lo


def fma_add(a, b, c):
    """Elementwise ``a * b + c`` to ~double-f32 accuracy (broadcasting).

    Dekker two-product for the rounding error of ``a * b`` plus a Knuth
    two-sum against ``c`` -- the elementwise analogue of
    :func:`residual_affine`, used for the stage-wise (diagonal-cost)
    delta-form gradients ``qx + Qx * x_bar`` where the product and the
    linear term cancel to the small reduced gradient.
    """
    import jax.numpy as jnp
    a, b, c = jnp.broadcast_arrays(a, b, c)
    a1, a2 = _split(a)
    b1, b2 = _split(b)
    p = a * b
    err = ((a1 * b1 - p) + a1 * b2 + a2 * b1) + a2 * b2
    s = p + c
    v = s - p
    e = (p - (s - v)) + (c - v)
    return s + (e + err)


def residual_affine(M, x, b):
    """Compute ``b + M @ x`` to ~double-f32 accuracy.  Returns (hi, lo).

    The four Dekker-split partial products are each exactly representable
    in f32; the row sums are reduced pairwise in double-f32.  Cost: ~4
    elementwise (m, n) products + a log2(n)-depth compensated tree -- VPU
    work, no MXU involvement, so it is cheap relative to one KKT solve.
    """
    import jax.numpy as jnp

    m, n = M.shape
    M1, M2 = _split(M)
    x1, x2 = _split(x)
    # exact partial products (12x12- and 12x24-bit mantissa products)
    hi = jnp.concatenate([
        b[:, None], M1 * x1[None, :], M1 * x2[None, :],
        M2 * x1[None, :], M2 * x2[None, :]], axis=1)       # (m, 4n+1)
    lo = jnp.zeros_like(hi)
    T = hi.shape[1]
    # pad to a power of two, then halve with dd_add until one column is left
    P = 1 << (T - 1).bit_length()
    hi = jnp.pad(hi, ((0, 0), (0, P - T)))
    lo = jnp.pad(lo, ((0, 0), (0, P - T)))
    while P > 1:
        P //= 2
        hi, lo = _dd_add((hi[:, :P], lo[:, :P]), (hi[:, P:], lo[:, P:]))
    return hi[:, 0], lo[:, 0]
