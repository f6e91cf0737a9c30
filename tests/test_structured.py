"""Structured (GenRows) vs dense constraint-path equivalence.

The dynamic LTV QP (``ltvmpc_dynamic_curvilinear.m:28-29``: 84 vars, 800
general rows at N=40) can be assembled either as a dense (800, 84) matrix
or as the generator-factored :class:`fsae_mpc_tpu.ops.structured.GenRows`
representation (the measured-winning structured form; the earlier
StageRows stage-basis form lost at every operating point and was retired
in round 4).  Every linear-algebra hook the IPM uses (matvec, rmatvec,
quadform, row norms, row/col scaling, compensated products) must agree
with the materialised dense matrix, the two assemblies must describe the
same constraint set, and full ``solve_qp`` results must coincide.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fsae_mpc_tpu.config import MPC_F32, VehicleParams
from fsae_mpc_tpu.mpc import ltv
from fsae_mpc_tpu.ops import ipm
from fsae_mpc_tpu.ops.structured import GenRows
from fsae_mpc_tpu.track import track_from_points


@pytest.fixture(scope="module")
def circ():
    R, n = 25.0, 48
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    return track_from_points(R * np.cos(th), R * np.sin(th), n_segments=96,
                             dtype=jnp.float64)


def _tick_inputs(N, dt, v0=8.0):
    x_ref = np.zeros((N, 7))
    v_ref = np.minimum(v0 + 10 * dt * np.arange(1, N + 1), 20.0)
    x_ref[:, 3] = v_ref
    x_ref[:, 0] = np.cumsum(v_ref * dt)
    x_lin = np.zeros((N, 7))
    x_lin[:, 0] = v0 * dt * np.arange(1, N + 1)
    x_lin[:, 3] = v0
    u_lin = np.zeros((N, 2))
    x0 = np.array([0.0, 0.12, 0.04, v0, 0.1, 0.05, 0.02])
    return (jnp.asarray(x0), jnp.asarray(x_ref), jnp.asarray(x_lin),
            jnp.asarray(u_lin))


@pytest.fixture(scope="module")
def pair(circ):
    """Production-shape (N=40: 84 vars, 800 rows) QP, both assemblies."""
    mpc = MPC_F32
    params = VehicleParams()
    x0, x_ref, x_lin, u_lin = _tick_inputs(mpc.n_steps, mpc.dt)
    dense, _ = ltv.build_qp_dynamic(x0, x_ref, circ, params, mpc,
                                    x_lin, u_lin)
    gen, _ = ltv.build_qp_dynamic(x0, x_ref, circ, params, mpc,
                                  x_lin, u_lin, structured="gen")
    return dense, gen


def test_production_shape(pair):
    dense, gen = pair
    assert dense[2].shape == (800, 84)
    assert isinstance(gen[2], GenRows)
    assert gen[2].shape == (800, 84)


def test_genrows_products_match_materialized(pair):
    _, gen = pair
    A = gen[2]
    Am = np.asarray(A.materialize())
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(Am.shape[1]))
    z = jnp.asarray(rng.standard_normal(Am.shape[0]))
    d = jnp.asarray(rng.uniform(0.1, 2.0, Am.shape[0]))
    np.testing.assert_allclose(np.asarray(A.matvec(x)), Am @ np.asarray(x),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(A.rmatvec(z)),
                               Am.T @ np.asarray(z), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(A.quadform(d)),
                               (Am.T * np.asarray(d)) @ Am,
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(A.row_sq_norms()),
                               (Am ** 2).sum(axis=1), rtol=1e-10,
                               atol=1e-12)
    r = jnp.asarray(rng.uniform(0.5, 2.0, Am.shape[0]))
    vs = jnp.asarray(rng.uniform(0.5, 2.0, Am.shape[1]))
    np.testing.assert_allclose(np.asarray(A.scale_rows(r).materialize()),
                               np.asarray(r)[:, None] * Am, rtol=1e-12,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(A.scale_cols(vs).materialize()),
                               Am * np.asarray(vs)[None, :], rtol=1e-12,
                               atol=1e-12)


def test_genrows_compensated_products(pair):
    """hi+lo of the compensated products must match the f64 truth much
    tighter than a plain f32 evaluation (the whole point of the EFT
    path used by F32_ACCURATE's delta-form restart)."""
    _, gen = pair
    A64 = gen[2]
    Am = np.asarray(A64.materialize(), np.float64)
    A32 = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), A64)
    # truth = f64 product of the f32 FACTORS (materialize() would round
    # the W @ Ag product in f32 before casting -- the EFT path is MORE
    # accurate than that)
    S, R, G, ns, n = A32._dims()
    W64 = np.asarray(A32.W, np.float64)
    Ag64 = np.asarray(A32.Ag, np.float64)
    Am = np.einsum("srg,sgn->srn", W64, Ag64)
    Am[:, :, n - ns:] += np.asarray(A32.Ws, np.float64)
    Am = Am.reshape(S * R, n)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(Am.shape[1]).astype(np.float32)
    z = rng.standard_normal(Am.shape[0]).astype(np.float32)
    base = rng.standard_normal(Am.shape[1]).astype(np.float32)

    hi, lo = A32.matvec_compensated(jnp.asarray(x))
    y = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
    truth = Am @ x.astype(np.float64)
    scale = np.abs(Am) @ np.abs(x).astype(np.float64) + 1e-30
    assert np.max(np.abs(y - truth) / scale) < 1e-11    # ~f32^2

    hi, lo = A32.rmatvec_compensated(jnp.asarray(z), jnp.asarray(base))
    y = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
    truth = base.astype(np.float64) + Am.T @ z.astype(np.float64)
    scale = (np.abs(Am.T) @ np.abs(z).astype(np.float64)
             + np.abs(base) + 1e-30)
    assert np.max(np.abs(y - truth) / scale) < 1e-11


def test_genrows_same_row_set_as_dense(pair):
    """Same constraint set: every dense row (with its bounds) appears in
    the GenRows assembly (stage-major vs group-major ordering)."""
    dense, gen = pair
    Ad, lbd, ubd = (np.asarray(dense[2]), np.asarray(dense[5]),
                    np.asarray(dense[6]))
    Ag, lbg, ubg = (np.asarray(gen[2].materialize()), np.asarray(gen[5]),
                    np.asarray(gen[6]))

    def key(A, lo, hi):
        fin = lambda v: np.where(np.isfinite(v), v, 1e30)
        rows = np.concatenate([A, fin(lo)[:, None], fin(hi)[:, None]], 1)
        return rows[np.lexsort(np.round(rows, 6).T)]

    np.testing.assert_allclose(key(Ad, lbd, ubd), key(Ag, lbg, ubg),
                               rtol=1e-6, atol=1e-8)


def test_genrows_solve_matches_dense(pair):
    dense, gen = pair
    res_d = ipm.solve_qp(*dense[:7], ipm.IpmOptions(max_iters=50))
    res_g = ipm.solve_qp(*gen[:7], ipm.IpmOptions(max_iters=50))
    np.testing.assert_allclose(np.asarray(res_g.x), np.asarray(res_d.x),
                               rtol=0, atol=2e-6)


def test_f32_accurate_on_both_paths(circ):
    """f32 + the accuracy-certified preset on both assemblies against the
    f64 truth (first control and mean control error -- the quantities the
    BASELINE bar cares about)."""
    mpc = MPC_F32
    params = VehicleParams()
    x0, x_ref, x_lin, u_lin = _tick_inputs(mpc.n_steps, mpc.dt)
    dense, _ = ltv.build_qp_dynamic(x0, x_ref, circ, params, mpc, x_lin,
                                    u_lin)
    gen, _ = ltv.build_qp_dynamic(x0, x_ref, circ, params, mpc, x_lin,
                                  u_lin, structured="gen")
    truth = np.asarray(ipm.solve_qp(*dense[:7]).x)

    def to32(qp):
        return tuple(jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32), q) for q in qp[:7])

    res32_d = ipm.solve_qp(*to32(dense), ipm.F32_ACCURATE)
    res32_g = ipm.solve_qp(*to32(gen), ipm.F32_ACCURATE)
    N = mpc.n_steps
    for res, fc_bound in ((res32_d, 1e-2), (res32_g, 3e-2)):
        x = np.asarray(res.x, np.float64)
        assert np.all(np.isfinite(x))
        err = np.abs(x[: N * 2] - truth[: N * 2])
        assert err[0] < fc_bound and err[1] < fc_bound  # first control
        assert err.mean() < 5e-3
