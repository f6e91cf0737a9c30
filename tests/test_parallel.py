"""Parallel layer tests on the virtual 8-device CPU mesh: sharded results
match unsharded bitwise, metric reductions, distributed helpers."""

import numpy as np
import jax
import jax.numpy as jnp

from fsae_mpc_tpu.parallel import make_mesh, shard_batch, pmean_metrics, BATCH_AXIS
from fsae_mpc_tpu.config import MPCParams, VehicleParams
from fsae_mpc_tpu.utils.debug import check_shard_determinism, assert_finite


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_solve_matches_unsharded():
    """The DP layout must not change numerics: per-element solve results on
    the sharded batch equal the single-device results exactly."""
    from fsae_mpc_tpu.ops import ipm

    rng = np.random.default_rng(0)
    B, n, m = 16, 6, 4
    M = rng.normal(size=(B, n, n))
    H = jnp.asarray(M @ np.swapaxes(M, 1, 2) + n * np.eye(n))
    g = jnp.asarray(rng.normal(size=(B, n)))
    A = jnp.asarray(rng.normal(size=(B, m, n)))
    lb = jnp.asarray(np.full((B, n), -2.0))
    ub = jnp.asarray(np.full((B, n), 2.0))
    lbA = jnp.asarray(np.full((B, m), -1.0))
    ubA = jnp.asarray(np.full((B, m), 1.0))

    mesh = make_mesh()
    fn = lambda *a: ipm.solve_qp(*a).x
    diff = check_shard_determinism(fn, (H, g, A, lb, ub, lbA, ubA), mesh)
    assert diff < 1e-12


def test_pmean_metrics():
    mesh = make_mesh()
    metrics = {"lap": jnp.arange(8.0), "viol": 2.0 * jnp.ones((8,))}
    out = pmean_metrics(shard_batch(metrics, mesh), mesh)
    assert abs(float(out["lap"]) - 3.5) < 1e-12
    assert abs(float(out["viol"]) - 2.0) < 1e-12


def test_assert_finite():
    assert_finite({"a": jnp.ones(3)})
    try:
        assert_finite({"a": jnp.asarray([1.0, np.nan])})
        raise AssertionError("should have raised")
    except FloatingPointError:
        pass


def test_multitrack_vmap():
    """Tracks fit with equal segment counts stack into one batched Track;
    the simulator vmaps over (track, params) pairs (pod-scale layout)."""
    import jax.numpy as jnp
    from fsae_mpc_tpu.track import load_track
    from fsae_mpc_tpu.sim import SimConfig, simulate, perturbed_params

    tracks = [load_track(f"data/{n}.csv", dtype=jnp.float64)[0]
              for n in ("fsg2019", "fso2020", "fss2019")]
    tb = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *tracks)
    cfg = SimConfig(model="kinematic", n_ticks=8,
                    mpc=MPCParams(n_steps=8))
    params = perturbed_params(VehicleParams(), jax.random.key(1), 3,
                              rel_sigma=0.0)
    params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float64),
                                    params)
    out = jax.jit(jax.vmap(lambda t, p: simulate(t, p, cfg)))(tb, params)
    assert out.x_history.shape[0] == 3
    x = np.asarray(out.x_history)
    assert np.all(np.isfinite(x))
    # different tracks -> different trajectories
    assert np.max(np.abs(x[0] - x[1])) > 1e-3
