"""Batched dense linear algebra in pure XLA ops (no LAPACK custom calls).

On TPU, ``jnp.linalg.cholesky`` / ``cho_solve`` lower to the
``InvertDiagBlocksLowerTriangular`` custom call, which allocates a fixed
~18 MB scoped-VMEM buffer and fails outright for vmapped 84x84 KKT systems
(observed on v5e).  These routines build the same factorisation out of
plain matmuls + static slicing, so under ``vmap`` they become batched
(b x b) MXU matmuls and vectorised scalar ops -- the right shape for the
interior-point hot loop.

Everything here is trace-time-static in ``n`` (Python loops unroll), which
keeps the op count modest (n + n/b block steps) and lets XLA fuse the
per-column work.
"""

from __future__ import annotations

import jax.numpy as jnp


def _chol_base(A):
    """Cholesky of a tiny (b, b) SPD matrix via static column recursion."""
    b = A.shape[-1]
    cols = []
    for j in range(b):
        a_j = A[..., :, j]                      # (..., b)
        # subtract contributions of previous columns
        s = a_j
        for k, Lk in enumerate(cols):
            s = s - Lk * Lk[..., j][..., None]
        d = jnp.sqrt(jnp.maximum(s[..., j], 1e-30))
        col = s / d[..., None]
        # zero the strictly-upper part of this column
        mask = jnp.arange(b) >= j
        col = jnp.where(mask, col, 0.0)
        cols.append(col)
    return jnp.stack(cols, axis=-1)


def _tri_solve_lower_small(L, B):
    """Solve L X = B for small lower-triangular (b,b) L; B is (..., b, m)."""
    return _tri_inv_lower_small(L) @ B


def _tri_solve_upper_small(U, B):
    """Solve U X = B for small upper-triangular (b,b) U; B is (..., b, m)."""
    Li = _tri_inv_lower_small(jnp.swapaxes(U, -1, -2))
    return jnp.swapaxes(Li, -1, -2) @ B


def _chol_unblocked(A, base: int = 8):
    """Cholesky of a small (b,b) SPD block, recursively:

        chol([[A11, .], [A21, A22]]) = [[L11, 0], [A21 L11^-T, chol(S)]]
        with S = A22 - L21 L21^T.

    Keeps the traced graph matmul-dominated (the plain column recursion is
    O(b^3) scalar ops and explodes XLA compile time at b ~ 28).
    """
    b = A.shape[-1]
    if b <= base:
        return _chol_base(A)
    h = b // 2
    L11 = _chol_unblocked(A[..., :h, :h], base)
    L11i = _tri_inv_lower_small(L11, base)
    L21 = A[..., h:, :h] @ jnp.swapaxes(L11i, -1, -2)
    S = A[..., h:, h:] - L21 @ jnp.swapaxes(L21, -1, -2)
    L22 = _chol_unblocked(S, base)
    top = jnp.concatenate(
        [L11, jnp.zeros(L11.shape[:-2] + (h, b - h), A.dtype)], axis=-1)
    bot = jnp.concatenate([L21, L22], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _pick_block(n: int) -> int:
    for b in (32, 28, 24, 16, 12, 8):
        if n % b == 0:
            return b
    return n


def cholesky(A, block: int | None = None):
    """Blocked right-looking Cholesky of (..., n, n) SPD A -> lower L.

    Diagonal blocks factor with the static unblocked recursion; panels use
    small triangular solves; trailing updates are (batched) matmuls that
    land on the MXU.
    """
    n = A.shape[-1]
    if block is None:
        block = _pick_block(n)
    if n <= block:
        return _chol_unblocked(A)

    nb = -(-n // block)
    # pad to a multiple of block with identity (keeps SPD)
    n_pad = nb * block
    if n_pad != n:
        pad = n_pad - n
        eye_pad = jnp.zeros(A.shape[:-2] + (n_pad, n_pad), A.dtype)
        eye_pad = eye_pad.at[..., :n, :n].set(A)
        idx = jnp.arange(n, n_pad)
        eye_pad = eye_pad.at[..., idx, idx].set(1.0)
        A = eye_pad

    Awork = A
    L = jnp.zeros_like(A)
    for k in range(nb):
        lo, hi = k * block, (k + 1) * block
        Akk = Awork[..., lo:hi, lo:hi]
        Lkk = _chol_unblocked(Akk)
        L = L.at[..., lo:hi, lo:hi].set(Lkk)
        if hi < n_pad:
            panel = Awork[..., hi:, lo:hi]             # (..., m, b)
            # solve X Lkk^T = panel  =>  Lkk X^T = panel^T
            Xt = _tri_solve_lower_small(Lkk, jnp.swapaxes(panel, -1, -2))
            X = jnp.swapaxes(Xt, -1, -2)
            L = L.at[..., hi:, lo:hi].set(X)
            trailing = Awork[..., hi:, hi:] - X @ jnp.swapaxes(X, -1, -2)
            Awork = Awork.at[..., hi:, hi:].set(trailing)
    return L[..., :n, :n] if n_pad != n else L


def _tri_inv_unrolled(L):
    """Inverse of a tiny lower-triangular block by substitution (base case)."""
    b = L.shape[-1]
    cols = []
    for j in range(b):
        rows = []
        for i in range(b):
            if i < j:
                rows.append(jnp.zeros_like(L[..., 0, 0]))
                continue
            r = jnp.where(jnp.asarray(i == j), jnp.ones_like(L[..., 0, 0]),
                          jnp.zeros_like(L[..., 0, 0]))
            for k in range(j, i):
                r = r - L[..., i, k] * rows[k]
            rows.append(r / L[..., i, i])
        cols.append(jnp.stack(rows, axis=-1))
    return jnp.stack(cols, axis=-1)


def _tri_inv_lower_small(L, base: int = 8):
    """Inverse of a lower-triangular (b,b) block, recursively:

        inv([[A, 0], [B, C]]) = [[Ainv, 0], [-Cinv B Ainv, Cinv]]

    The recursion keeps the traced graph O(b log b) ops of matmuls instead
    of the O(b^3) scalar chain of plain substitution (which explodes XLA
    trace/compile time at b ~ 28).
    """
    b = L.shape[-1]
    if b <= base:
        return _tri_inv_unrolled(L)
    h = b // 2
    A = L[..., :h, :h]
    B = L[..., h:, :h]
    C = L[..., h:, h:]
    Ai = _tri_inv_lower_small(A, base)
    Ci = _tri_inv_lower_small(C, base)
    BL = -(Ci @ (B @ Ai))
    top = jnp.concatenate(
        [Ai, jnp.zeros(Ai.shape[:-2] + (h, b - h), L.dtype)], axis=-1)
    bot = jnp.concatenate([BL, Ci], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def cholesky_invdiag(A, block: int | None = None):
    """Blocked Cholesky that additionally returns the INVERTED diagonal
    blocks, so triangular solves become pure matmuls (MXU work instead of
    long unrolled substitution chains -- the XLA op-count killer on TPU).

    Returns (L, Dinv) with Dinv: (nb, b, b) stacked inverse diagonal blocks.
    """
    n = A.shape[-1]
    if block is None:
        block = _pick_block(n)
    assert n % block == 0, "cholesky_invdiag needs n divisible by block"
    nb = n // block

    Awork = A
    L = jnp.zeros_like(A)
    Dinvs = []
    for k in range(nb):
        lo, hi = k * block, (k + 1) * block
        Lkk = _chol_unblocked(Awork[..., lo:hi, lo:hi])
        Dinv = _tri_inv_lower_small(Lkk)
        Dinvs.append(Dinv)
        L = L.at[..., lo:hi, lo:hi].set(Lkk)
        if hi < n:
            panel = Awork[..., hi:, lo:hi]
            # X Lkk^T = panel  =>  X = panel Lkk^{-T}
            X = panel @ jnp.swapaxes(Dinv, -1, -2)
            L = L.at[..., hi:, lo:hi].set(X)
            trailing = Awork[..., hi:, hi:] - X @ jnp.swapaxes(X, -1, -2)
            Awork = Awork.at[..., hi:, hi:].set(trailing)
    return L, jnp.stack(Dinvs, axis=-3)


def cho_solve_invdiag(L, Dinv, rhs, block: int | None = None):
    """Solve A x = rhs from :func:`cholesky_invdiag` factors using only
    matmuls (no unrolled substitutions)."""
    vec = rhs.ndim == L.ndim - 1
    if vec:
        rhs = rhs[..., None]
    n = L.shape[-1]
    if block is None:
        block = _pick_block(n)
    nb = n // block

    # forward: L y = rhs
    y_blocks = []
    for k in range(nb):
        lo, hi = k * block, (k + 1) * block
        r = rhs[..., lo:hi, :]
        for j, yb in enumerate(y_blocks):
            jlo, jhi = j * block, (j + 1) * block
            r = r - L[..., lo:hi, jlo:jhi] @ yb
        y_blocks.append(Dinv[..., k, :, :] @ r)

    # backward: L^T x = y
    x_blocks = [None] * nb
    for k in reversed(range(nb)):
        lo, hi = k * block, (k + 1) * block
        r = y_blocks[k]
        for j in range(k + 1, nb):
            jlo, jhi = j * block, (j + 1) * block
            r = r - jnp.swapaxes(L[..., jlo:jhi, lo:hi], -1, -2) @ x_blocks[j]
        x_blocks[k] = jnp.swapaxes(Dinv[..., k, :, :], -1, -2) @ r

    x = jnp.concatenate(x_blocks, axis=-2)
    return x[..., 0] if vec else x


def solve_unrolled(A, B):
    """Solve A X = B for small square A via unrolled Gauss-Jordan
    (no pivoting -- intended for near-identity matrices such as the
    implicit collocation factors I - dt/2 * A_c).  ``B``: (..., n, m)."""
    n = A.shape[-1]
    Aw = A
    Bw = B
    for k in range(n):
        piv = Aw[..., k, k][..., None]
        piv = jnp.where(jnp.abs(piv) < 1e-30, 1e-30, piv)
        row_a = Aw[..., k, :] / piv
        row_b = Bw[..., k, :] / piv
        factors = Aw[..., :, k][..., None]            # (..., n, 1)
        mask = jnp.arange(n) == k                      # static
        Aw = jnp.where(mask[:, None], row_a[..., None, :],
                       Aw - factors * row_a[..., None, :])
        Bw = jnp.where(mask[:, None], row_b[..., None, :],
                       Bw - factors * row_b[..., None, :])
    return Bw


def cho_solve(L, rhs, block: int | None = None):
    """Solve A x = rhs given the blocked Cholesky factor L (lower).

    ``rhs``: (..., n) or (..., n, m).
    """
    vec = rhs.ndim == L.ndim - 1
    if vec:
        rhs = rhs[..., None]
    n = L.shape[-1]
    if block is None:
        block = _pick_block(n)
    nb = -(-n // block)

    # forward: L y = rhs
    y_blocks = []
    for k in range(nb):
        lo, hi = k * block, min((k + 1) * block, n)
        r = rhs[..., lo:hi, :]
        for j, yb in enumerate(y_blocks):
            jlo, jhi = j * block, min((j + 1) * block, n)
            r = r - L[..., lo:hi, jlo:jhi] @ yb
        y_blocks.append(_tri_solve_lower_small(L[..., lo:hi, lo:hi], r))

    # backward: L^T x = y
    x_blocks = [None] * nb
    for k in reversed(range(nb)):
        lo, hi = k * block, min((k + 1) * block, n)
        r = y_blocks[k]
        for j in range(k + 1, nb):
            jlo, jhi = j * block, min((j + 1) * block, n)
            r = r - jnp.swapaxes(L[..., jlo:jhi, lo:hi], -1, -2) @ x_blocks[j]
        Ukk = jnp.swapaxes(L[..., lo:hi, lo:hi], -1, -2)
        x_blocks[k] = _tri_solve_upper_small(Ukk, r)

    x = jnp.concatenate(x_blocks, axis=-2)
    return x[..., 0] if vec else x
