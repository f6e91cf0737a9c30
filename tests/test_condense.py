"""Condensing tests against a straightforward O(N^2) numpy oracle
(the block-product semantics of ``sequential_integration.m:21-47``)."""

import numpy as np
import jax.numpy as jnp

from fsae_mpc_tpu.ops import condense, condense_associative, rollout


def _oracle(Ad, Bd, dd):
    N, nx, nu = Bd.shape
    A_bar = np.zeros((N, nx, nx))
    B_bar = np.zeros((N, nx, N * nu))
    d_bar = np.zeros((N, nx))
    A_bar[0] = Ad[0]
    B_bar[0][:, :nu] = Bd[0]
    d_bar[0] = dd[0]
    for i in range(1, N):
        A_bar[i] = Ad[i] @ A_bar[i - 1]
        B_bar[i] = Ad[i] @ B_bar[i - 1]
        B_bar[i][:, i * nu:(i + 1) * nu] = Bd[i]
        d_bar[i] = Ad[i] @ d_bar[i - 1] + dd[i]
    return A_bar, B_bar, d_bar


def _rand_stages(seed, N=9, nx=4, nu=2):
    rng = np.random.default_rng(seed)
    Ad = np.eye(nx) + 0.05 * rng.normal(size=(N, nx, nx))
    Bd = 0.05 * rng.normal(size=(N, nx, nu))
    dd = 0.05 * rng.normal(size=(N, nx))
    return Ad, Bd, dd


def test_condense_matches_oracle():
    Ad, Bd, dd = _rand_stages(0)
    A_ref, B_ref, d_ref = _oracle(Ad, Bd, dd)
    A, B, d = condense(jnp.asarray(Ad), jnp.asarray(Bd), jnp.asarray(dd))
    np.testing.assert_allclose(np.asarray(A), A_ref, atol=1e-12)
    np.testing.assert_allclose(np.asarray(B), B_ref, atol=1e-12)
    np.testing.assert_allclose(np.asarray(d), d_ref, atol=1e-12)


def test_associative_scan_matches():
    Ad, Bd, dd = _rand_stages(1, N=16)
    A_ref, _, d_ref = _oracle(Ad, Bd, dd)
    A, d = condense_associative(jnp.asarray(Ad), jnp.asarray(dd))
    np.testing.assert_allclose(np.asarray(A), A_ref, atol=1e-11)
    np.testing.assert_allclose(np.asarray(d), d_ref, atol=1e-11)


def test_rollout_equals_condensed_prediction():
    Ad, Bd, dd = _rand_stages(2)
    N, nx, nu = Bd.shape
    rng = np.random.default_rng(3)
    x0 = rng.normal(size=nx)
    u = rng.normal(size=(N, nu))
    A, B, d = condense(jnp.asarray(Ad), jnp.asarray(Bd), jnp.asarray(dd))
    xs = rollout(jnp.asarray(Ad), jnp.asarray(Bd), jnp.asarray(dd),
                 jnp.asarray(x0), jnp.asarray(u))
    pred = (np.asarray(A) @ x0 + np.asarray(B) @ u.reshape(-1)
            + np.asarray(d))
    np.testing.assert_allclose(np.asarray(xs), pred, atol=1e-12)


def test_condense_dnc_matches_scan():
    """Divide-and-conquer condensing == the scan, incl. non-power-of-2 N."""
    from fsae_mpc_tpu.ops.condense import condense, condense_dnc
    rng = np.random.default_rng(7)
    for N, nx, nu in [(40, 7, 2), (5, 3, 2), (1, 4, 2), (64, 5, 1)]:
        Ad = jnp.asarray(rng.standard_normal((N, nx, nx)) * 0.3 + np.eye(nx))
        Bd = jnp.asarray(rng.standard_normal((N, nx, nu)))
        dd = jnp.asarray(rng.standard_normal((N, nx)))
        ref = condense(Ad, Bd, dd)
        out = condense_dnc(Ad, Bd, dd)
        for a, b in zip(ref, out):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-10, atol=1e-10)
