"""Batched / sharded lap simulation: the pod-scale entry point.

``vmap`` of :func:`sim.closed_loop.simulate` over perturbed initial states
and vehicle parameters, sharded over the device mesh.  This is the
framework's answer to SURVEY.md section 2's "scenario batching" deliverable:
the reference runs ONE car; this runs thousands per chip.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import VehicleParams
from ..parallel import mesh as pm
from .closed_loop import SimConfig, simulate


def perturbed_params(base: VehicleParams, rng_key, batch: int,
                     rel_sigma: float = 0.02) -> VehicleParams:
    """A batch of vehicles with lognormal-perturbed mass/inertia/tyre grip."""
    k1, k2, k3 = jax.random.split(rng_key, 3)

    def jitter(key, val):
        return val * jnp.exp(rel_sigma * jax.random.normal(key, (batch,)))

    return VehicleParams(
        m=jitter(k1, base.m), Iz=jitter(k2, base.Iz),
        lr=base.lr * jnp.ones((batch,)), lf=base.lf * jnp.ones((batch,)),
        g=base.g * jnp.ones((batch,)),
        pB=base.pB * jnp.ones((batch,)), pC=base.pC * jnp.ones((batch,)),
        pD=jitter(k3, base.pD), pE=base.pE * jnp.ones((batch,)),
        ac_max=base.ac_max * jnp.ones((batch,)),
        al_max=base.al_max * jnp.ones((batch,)),
        v_soft=base.v_soft * jnp.ones((batch,)),
        v_eps=base.v_eps * jnp.ones((batch,)),
    )


def simulate_batch(track, params_batch: VehicleParams, cfg: SimConfig,
                   x_init_batch=None, mesh=None):
    """vmap the closed-loop simulator over a scenario batch; optionally
    shard the batch axis across a device mesh."""
    def one(params, x_init):
        return simulate(track, params, cfg, x_init)

    vfn = jax.vmap(one)
    if x_init_batch is None:
        batch = jax.tree_util.tree_leaves(params_batch)[0].shape[0]
        x_init_batch = jnp.zeros((batch, 7), track.px.dtype)

    if mesh is None:
        return jax.jit(vfn)(params_batch, x_init_batch)

    in_sh = NamedSharding(mesh, P(pm.BATCH_AXIS))
    jfn = jax.jit(vfn, in_shardings=(in_sh, in_sh),
                  out_shardings=NamedSharding(mesh, P(pm.BATCH_AXIS)))
    params_batch = pm.shard_batch(params_batch, mesh)
    x_init_batch = pm.shard_batch(x_init_batch, mesh)
    return jfn(params_batch, x_init_batch)
