"""Checkpoint / resume for long batched simulation campaigns.

The reference has no cross-run persistence (SURVEY.md section 5); its
within-run warm starting (previous trajectories, shifted solutions) lives in
our scan carries.  For pod-scale multi-hour scenario sweeps this module
persists arbitrary pytrees (sim carries, batched metrics, planner results)
with orbax, so a preempted run resumes from the last completed chunk.
"""

from __future__ import annotations

import os
from typing import Any

import jax


def save(path: str, tree: Any):
    """Save a pytree checkpoint (overwrites)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    if os.path.exists(path):
        import shutil
        shutil.rmtree(path)
    ckpt.save(path, tree)
    ckpt.wait_until_finished()
    return path


def restore(path: str, like: Any):
    """Restore a pytree checkpoint; ``like`` supplies structure/shapes."""
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    target = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "shape") else x, like)
    return ckpt.restore(os.path.abspath(path), target)


def run_chunked(step_fn, carry, n_chunks: int, ckpt_dir: str | None = None,
                start_chunk: int = 0):
    """Run ``carry = step_fn(carry)`` n_chunks times, checkpointing each.

    Resume by passing ``start_chunk`` = index of the first chunk still to
    run and the restored carry.
    """
    for k in range(start_chunk, n_chunks):
        carry = step_fn(carry)
        if ckpt_dir is not None:
            save(os.path.join(ckpt_dir, f"chunk_{k:05d}"), carry)
    return carry
