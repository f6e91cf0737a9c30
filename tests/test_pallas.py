"""Pallas lanes-layout Cholesky kernels vs the pure-XLA blocked reference.

On CPU these run in interpret mode; the same code compiles with Mosaic on
TPU (exercised by bench.py and the driver's compile checks).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fsae_mpc_tpu.ops import linalg as xl
from fsae_mpc_tpu.ops.pallas import chol as pchol


def _spd_batch(key, b, n, dtype=jnp.float64):
    M = jax.random.normal(key, (b, n, n), dtype)
    return M @ jnp.swapaxes(M, -1, -2) + n * jnp.eye(n, dtype=dtype)


@pytest.mark.parametrize("n", [12, 84])
def test_factor_lanes_matches_blocked(n):
    K = _spd_batch(jax.random.key(0), 5, n)
    L = pchol.factor_lanes(K)
    L_ref = xl.cholesky(K)
    np.testing.assert_allclose(np.tril(L), L_ref, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("n", [12, 84])
def test_solve_lanes_solves(n):
    key = jax.random.key(1)
    K = _spd_batch(key, 7, n)
    rhs = jax.random.normal(jax.random.key(2), (7, n), jnp.float64)
    L = pchol.factor_lanes(K)
    x = pchol.solve_lanes(L, rhs)
    np.testing.assert_allclose(jnp.einsum("bij,bj->bi", K, x), rhs,
                               rtol=1e-8, atol=1e-8)


def test_lane_padding_odd_batch():
    # batch 130 exercises the pad-to-128 path in both kernels
    K = _spd_batch(jax.random.key(3), 130, 16)
    rhs = jax.random.normal(jax.random.key(4), (130, 16), jnp.float64)
    x = pchol.solve_lanes(pchol.factor_lanes(K), rhs)
    np.testing.assert_allclose(jnp.einsum("bij,bj->bi", K, x), rhs,
                               rtol=1e-8, atol=1e-8)


def test_custom_vmap_dispatch():
    """Unbatched call = XLA fallback; vmapped call = lanes kernel; equal."""
    K = _spd_batch(jax.random.key(5), 4, 20)
    rhs = jax.random.normal(jax.random.key(6), (4, 20), jnp.float64)

    single = [xl.cho_solve(xl.cholesky(K[i]), rhs[i]) for i in range(4)]
    batched = jax.vmap(lambda k, r: pchol.chol_solve(pchol.chol_factor(k), r)
                       )(K, rhs)
    np.testing.assert_allclose(batched, jnp.stack(single), rtol=1e-8,
                               atol=1e-8)


def test_ipm_pallas_path_matches_blocked():
    """Full IPM solve with chol='pallas' equals chol='blocked' (f64)."""
    from fsae_mpc_tpu.ops import ipm

    key = jax.random.key(7)
    b, n, m = 3, 12, 20
    M = jax.random.normal(key, (b, n, n), jnp.float64)
    H = M @ jnp.swapaxes(M, -1, -2) + n * jnp.eye(n, dtype=jnp.float64)
    g = jax.random.normal(jax.random.key(8), (b, n), jnp.float64)
    A = jax.random.normal(jax.random.key(9), (b, m, n), jnp.float64)
    lb = -jnp.ones((b, n), jnp.float64)
    ub = jnp.ones((b, n), jnp.float64)
    lbA = -2 * jnp.ones((b, m), jnp.float64)
    ubA = 2 * jnp.ones((b, m), jnp.float64)

    def solve(chol):
        opts = ipm.IpmOptions(max_iters=30, tol=1e-10, chol=chol)
        return jax.vmap(lambda *a: ipm.solve_qp(*a, opts))(
            H, g, A, lb, ub, lbA, ubA).x

    np.testing.assert_allclose(solve("pallas"), solve("blocked"),
                               rtol=1e-6, atol=1e-8)


def test_factor_lanes_indefinite_poisons_nan():
    """An indefinite K must yield NaN in its factor, not silent garbage
    (the 1e-30 pivot clamp this replaces could return finite-but-wrong
    directions that bypass the IPM's breakdown detection)."""
    K = _spd_batch(jax.random.key(10), 4, 16)
    K = K.at[2].set(K[2] - 40.0 * jnp.eye(16, dtype=K.dtype))  # indefinite
    L = np.tril(np.asarray(pchol.factor_lanes(K)))  # upper part is scratch
    assert np.all(np.isfinite(L[0]))
    assert np.all(np.isfinite(L[1]))
    assert not np.all(np.isfinite(L[2]))
    assert np.all(np.isfinite(L[3]))


@pytest.mark.parametrize("chol", ["pallas", "blocked"])
def test_ipm_indefinite_escalates_regularisation(chol):
    """A (slightly) indefinite Hessian trips the factorisation; the IPM's
    NaN rejection + inertia escalation must still produce a finite,
    feasible iterate under both Cholesky backends
    (``ops/ipm.py``: ``good`` / ``regm_next``)."""
    from fsae_mpc_tpu.ops import ipm

    n, m = 10, 6
    key = jax.random.key(11)
    M = jax.random.normal(key, (n, n), jnp.float64)
    H = M @ M.T + n * jnp.eye(n, dtype=jnp.float64)
    # one strongly negative eigenvalue -> K = H + A'DA + D_b indefinite at
    # the start (bound duals contribute only ~1 to the diagonal)
    w, V = jnp.linalg.eigh(H)
    H = (V * w.at[-1].set(-5.0 * w[-1])) @ V.T
    g = jax.random.normal(jax.random.key(12), (n,), jnp.float64)
    A = jax.random.normal(jax.random.key(13), (m, n), jnp.float64)
    lb, ub = -jnp.ones((n,)), jnp.ones((n,))
    lbA, ubA = -2 * jnp.ones((m,)), 2 * jnp.ones((m,))

    opts = ipm.IpmOptions(max_iters=30, chol=chol, init="basic")
    res = jax.vmap(lambda *a: ipm.solve_qp(*a, opts))(
        *[a[None] for a in (H, g, A, lb, ub, lbA, ubA)])
    x = np.asarray(res.x[0])
    assert np.all(np.isfinite(x)), f"{chol}: non-finite iterate"
    assert np.all(x >= -1.0 - 1e-6) and np.all(x <= 1.0 + 1e-6)
    y = np.asarray(A) @ x
    assert np.all(y >= -2.0 - 1e-5) and np.all(y <= 2.0 + 1e-5)


# ---------------------------------------------------------------------------
# fused condense kernel (ops/pallas/condense.py)
# ---------------------------------------------------------------------------

def _stage_batch(b=5, N=40, nx=7, nu=2):
    rng = np.random.default_rng(0)
    Ad = jnp.asarray(np.eye(nx) + 0.05 * rng.standard_normal((b, N, nx, nx)))
    Bd = jnp.asarray(0.05 * rng.standard_normal((b, N, nx, nu)))
    dd = jnp.asarray(0.05 * rng.standard_normal((b, N, nx)))
    return Ad, Bd, dd


@pytest.mark.parametrize("shape", [(5, 40, 7, 2), (3, 17, 5, 2)])
def test_condense_lanes_matches_scan(shape):
    """Interpret-mode oracle check of the fused condense kernel (the TPU
    compile path is exercised by bench.py; PERF_VARIANTS.json records the
    on-chip win that made it the LTV default)."""
    from fsae_mpc_tpu.ops.condense import condense
    from fsae_mpc_tpu.ops.pallas.condense import condense_lanes

    Ad, Bd, dd = _stage_batch(*shape)
    ref = jax.vmap(condense)(Ad, Bd, dd)
    out = condense_lanes(Ad, Bd, dd)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=1e-12, atol=1e-12)


def test_condense_fused_unbatched_fallback():
    from fsae_mpc_tpu.ops.condense import condense
    from fsae_mpc_tpu.ops.pallas.condense import condense_fused

    Ad, Bd, dd = _stage_batch(b=1)
    ref = condense(Ad[0], Bd[0], dd[0])
    out = condense_fused(Ad[0], Bd[0], dd[0])
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=1e-14)
    # vmapped off-TPU: routes to the batched scan (identical values)
    outv = jax.jit(jax.vmap(condense_fused))(Ad, Bd, dd)
    refv = jax.vmap(condense)(Ad, Bd, dd)
    for r, o in zip(refv, outv):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=1e-14)
