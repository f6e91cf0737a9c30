"""Device mesh + sharded batched solving.

The reference is single-process/single-thread (SURVEY.md section 2: no MPI /
NCCL / threads).  The TPU-native scaling model is:

* **batch = the parallel axis**: thousands of scenario instances (perturbed
  initial states, vehicle parameters, references) are ``vmap``-ed per chip
  and sharded across the mesh with ``shard_map``;
* **collectives only for summaries**: per-shard lap metrics are reduced with
  ``psum``/``pmean`` over ICI -- the solves themselves never communicate, so
  scaling is embarrassingly parallel and DCN only ever carries scalars;
* **multi-host**: ``jax.distributed.initialize`` + the same mesh spanning
  all hosts (``initialize_distributed``).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "batch"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the scenario batch axis."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (BATCH_AXIS,))


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None):
    """Multi-host bring-up (no-op when single-process).

    Call before any jax computation on pod slices; the global mesh then
    spans every host's chips automatically via ``jax.devices()``.
    """
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def shard_batch(tree: Any, mesh: Mesh):
    """Place a batch-leading pytree with its first axis sharded on the mesh."""
    sharding = NamedSharding(mesh, P(BATCH_AXIS))
    return jax.device_put(tree, sharding)


def replicate(tree: Any, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def sharded_batch_apply(fn: Callable, mesh: Mesh, batched_args: Any,
                        replicated_args: Any = ()):
    """Run ``vmap(fn)`` over a batch sharded across the mesh.

    ``fn`` maps one scenario's args to a pytree of outputs; outputs come
    back batch-sharded.  This is the standard launch shape for pod-scale
    scenario sweeps: XLA partitions the vmapped computation with zero
    communication.
    """
    vfn = jax.vmap(lambda b: fn(*b, *replicated_args))
    in_sh = NamedSharding(mesh, P(BATCH_AXIS))
    out_sh = NamedSharding(mesh, P(BATCH_AXIS))
    jfn = jax.jit(vfn, in_shardings=(in_sh,), out_shardings=out_sh)
    return jfn(batched_args)


def pmean_metrics(metrics: Any, mesh: Mesh):
    """Global mean of per-scenario metric pytrees (scalar-only DCN traffic)."""
    def reduce_leaf(x):
        return jnp.mean(x, axis=0)
    sharding = NamedSharding(mesh, P())
    return jax.jit(
        lambda m: jax.tree_util.tree_map(reduce_leaf, m),
        out_shardings=sharding)(metrics)
