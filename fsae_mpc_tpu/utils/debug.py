"""Numerical-debugging helpers (the framework's race-detector/sanitizer
analogue, SURVEY.md section 5): NaN tracing and cross-shard determinism
checks."""

from __future__ import annotations

import contextlib

import numpy as np
import jax


@contextlib.contextmanager
def nan_checking():
    """Raise on the first NaN produced inside the context
    (jax_debug_nans; forces re-execution in op-by-op mode on failure)."""
    prev = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def assert_finite(tree, name="pytree"):
    """Assert every leaf of a pytree is finite; report offending leaves."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.all(np.isfinite(arr)):
            bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(f"non-finite leaves in {name}: {bad}")


def check_shard_determinism(fn, args_batch, mesh, tol=1e-12):
    """Run a batched fn with and without sharding and return the max
    per-element deviation (deterministic-DP check: the partitioned program
    may fuse differently, so agreement is to fp tolerance, not bitwise)."""
    from ..parallel import mesh as pm

    unsharded = jax.jit(jax.vmap(fn))(*args_batch)
    sharded_args = [pm.shard_batch(a, mesh) for a in args_batch]
    sharded = jax.jit(jax.vmap(fn))(*sharded_args)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        unsharded, sharded)
    return diffs
