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
