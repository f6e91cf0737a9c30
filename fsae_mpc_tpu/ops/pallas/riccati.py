"""Pallas TPU kernels: fused batched block-Riccati factor / solve sweeps.

The stage-wise IPM's KKT solve (``ops/riccati.py``) is a backward
factorisation sweep plus backward/forward substitution sweeps over N=40
stages of tiny (7x7)/(7x2)/(2x2) blocks.  As ``lax.scan`` that is 40
sequential dispatches per sweep, each reading and writing its small carry
through HBM -- measured 4.6x SLOWER than the condensed dense path at
batch 1024 (AB_RICCATI.json, scan backend).  Here each sweep is ONE
kernel: the grid is (batch blocks, stages) with the stage axis innermost
and sequential (reversed for the backward sweeps via the index map), the
carry (Riccati matrix P / linear terms p / rollout state dx) lives in
VMEM scratch persisting across stage steps, and the batch dimension rides
the 128 vector lanes -- every block contraction is an unrolled sum of
fully-vectorised VPU FMAs, like ``ops/pallas/condense.py``.

Mosaic-friendly layout rules (no in-kernel transposes of computed
values except tiny element-copy loops into scratch):

  * all host-side constants that appear on the RIGHT of a contraction
    are passed BOTH row-major and transposed (A/At, B/Bt, M/Mt),
  * every product is written as  acc[a, b] = sum_k X[:, k:k+1, :] *
    Y[k:k+1, :, :]  over (a, k, TB) x (k, b, TB) blocks,
  * W and P are symmetric, so their transposes are themselves,
  * the few genuinely needed transposes of computed values (G',
    P-symmetrisation) are element-copy loops over (1, 1, TB) slices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
MAX_TB = 512       # batch elements per grid step: the per-stage blocks are
                   # small, so wide blocks amortise the
                   # Mosaic grid-step overhead; 1024 exceeds the 16 MB scoped
                   # VMEM limit for the fused assemble+factor kernel


def _tb(batch: int) -> int:
    padded = ((batch + LANES - 1) // LANES) * LANES
    return min(padded, MAX_TB)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def use_kernel(Ad, Bd) -> bool:
    """Kernel path supported: TPU backend, f32, nu == 2."""
    return (not _interpret() and Ad.dtype == jnp.float32
            and Bd.shape[-1] == 2)


def _mm(X, Y, k):
    """(a, k, TB) x (k, b, TB) -> (a, b, TB) slice-broadcast product."""
    acc = X[:, 0:1, :] * Y[0:1, :, :]
    for j in range(1, k):
        acc = acc + X[:, j:j + 1, :] * Y[j:j + 1, :, :]
    return acc


def _sym(scratch, X, n):
    """Write 0.5 (X + X') into scratch (n, n, TB) via element copies."""
    for i in range(n):
        scratch[i, i, :] = X[i, i, :]
        for j in range(i + 1, n):
            v = 0.5 * (X[i, j, :] + X[j, i, :])
            scratch[i, j, :] = v
            scratch[j, i, :] = v


# ---------------------------------------------------------------------------
# factor sweep
# ---------------------------------------------------------------------------


def _factor_kernel(a_ref, at_ref, b_ref, bt_ref, mt_ref, qb_ref, rb_ref,
                   m_ref, w_ref, huinv_ref, g_ref, P, P2):
    """One backward stage of the Riccati factorisation (nu = 2).

    Block shapes (TB = LANES):
      a_ref/at_ref: (1, nx, nx, TB)   A row-major / transposed
      b_ref:        (1, nx, nu, TB)   B row-major
      bt_ref/mt_ref:(1, nu, nx, TB)   B' / M'
      qb_ref:       (1, nx, nx, TB)   stage x-quadratic (symmetric)
      rb_ref:       (1, nu, nu, TB)   stage u-quadratic
      m_ref:        (1, nx, nu, TB)   cross term
      outputs: w_ref (1, nx, nx, TB), huinv_ref (1, nu, nu, TB),
               g_ref (1, nu, nx, TB) -- G row-major
      scratch: P, P2 (nx, nx, TB) -- Riccati carry + transpose buffer
    """
    i = pl.program_id(1)
    nx = a_ref.shape[1]
    nu = b_ref.shape[2]

    @pl.when(i == 0)
    def _():
        P[:] = jnp.zeros_like(P)

    A = a_ref[0]
    At = at_ref[0]
    B = b_ref[0]
    Bt = bt_ref[0]
    Mt = mt_ref[0]
    W = qb_ref[0] + P[:]                     # (nx, nx), symmetric
    V = _mm(W, B, nx) + m_ref[0]             # (nx, nu) = WB + M
    Hu = rb_ref[0] + _mm(Bt, V, nx) + _mm(Mt, B, nx)

    # closed-form symmetric 2x2 inverse; non-SPD -> NaN poison
    a = Hu[0, 0, :]
    b2 = 0.5 * (Hu[0, 1, :] + Hu[1, 0, :])
    c = Hu[1, 1, :]
    det = a * c - b2 * b2
    det = jnp.where((det > 0.0) & (a > 0.0), det, jnp.nan)
    idet = 1.0 / det
    huinv_ref[0, 0, 0, :] = c * idet
    huinv_ref[0, 0, 1, :] = -b2 * idet
    huinv_ref[0, 1, 0, :] = -b2 * idet
    huinv_ref[0, 1, 1, :] = a * idet

    Gt = _mm(At, V, nx)                      # (nx, nu) = G'
    for u in range(nu):                      # G output, row-major
        for j in range(nx):
            g_ref[0, u, j, :] = Gt[j, u, :]

    KgT = _mm(Gt, huinv_ref[0], nu)          # (nx, nu) = G' Huinv
    # GHG[i, j] = sum_u KgT[i, u] Gt[j, u]  (element-unrolled over nu)
    GHG = KgT[:, 0:1, :] * g_ref[0][0:1, :, :]
    for u in range(1, nu):
        GHG = GHG + KgT[:, u:u + 1, :] * g_ref[0][u:u + 1, :, :]
    P_new = _mm(At, _mm(W, A, nx), nx) - GHG
    _sym(P2, P_new, nx)
    P[:] = P2[:]
    w_ref[0] = W


def factor_lanes(Ad, Bd, Qb, Rb, M):
    """Batched fused Riccati factorisation.  All inputs (B, N, ...);
    returns (Huinv (B,N,nu,nu), G (B,N,nu,nx), W (B,N,nx,nx))."""
    Bsz, N, nx, nu = Bd.shape
    dtype = Ad.dtype

    def lanes(x):
        x = jnp.moveaxis(x, 0, -1)           # batch last
        pad = (-Bsz) % _tb(Bsz)
        if pad:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
        return x

    At = jnp.swapaxes(Ad, -1, -2)
    Bt = jnp.swapaxes(Bd, -1, -2)
    Mt = jnp.swapaxes(M, -1, -2)
    TB = _tb(Bsz)
    args = [lanes(v) for v in (Ad, At, Bd, Bt, Mt, Qb, Rb, M)]
    Bp = args[0].shape[-1]
    nb = Bp // TB

    rev = lambda b, i: (N - 1 - i, 0, 0, b)
    spec = lambda s1, s2: pl.BlockSpec((1, s1, s2, TB), rev,
                                       memory_space=pltpu.VMEM)
    in_specs = [spec(nx, nx), spec(nx, nx), spec(nx, nu), spec(nu, nx),
                spec(nu, nx), spec(nx, nx), spec(nu, nu), spec(nx, nu)]
    out_specs = (spec(nx, nx), spec(nu, nu), spec(nu, nx))
    out_shape = (
        jax.ShapeDtypeStruct((N, nx, nx, Bp), dtype),
        jax.ShapeDtypeStruct((N, nu, nu, Bp), dtype),
        jax.ShapeDtypeStruct((N, nu, nx, Bp), dtype),
    )
    W, Huinv, G = pl.pallas_call(
        _factor_kernel,
        grid=(nb, N),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((nx, nx, TB), dtype),
                        pltpu.VMEM((nx, nx, TB), dtype)],
        interpret=_interpret(),
    )(*args)

    unl = lambda x: jnp.moveaxis(x[..., :Bsz], -1, 0)
    return unl(Huinv), unl(G), unl(W)


def _assemble_factor_kernel(c_ref, ct_ref, d_ref, dt_ref, ws_ref, wst_ref,
                            dr_ref, qbd_ref, rbd_ref, a_ref, at_ref, b_ref,
                            bt_ref, w_ref, huinv_ref, g_ref, mq_ref,
                            lx_ref, lu_ref, hss_ref, P, P2, MT):
    """Fused quadform assembly + Riccati factor stage (nu = 2).

    Builds the per-stage Newton blocks from the ROW data directly --
    Qb = diag(qbd) + C'diag(Dr)C, Rb = diag(rbd) + D'diag(Dr)D,
    Mq = C'diag(Dr)D, plus the sigma couplings Lx/Lu/Hss -- then runs the
    factor recursion.  C/D/Ws/Dr are read exactly once per iteration;
    none of the (N, nx, nx) quadform intermediates ever exist in HBM
    (the XLA einsum formulation of this assembly measured 15-45x over
    its HBM speed-of-light: tiny batched matmuls).

    Extra block shapes vs _factor_kernel:
      c_ref (1, r, nx, TB), ct_ref (1, nx, r, TB), d_ref (1, r, nu, TB),
      dt_ref (1, nu, r, TB), ws_ref (1, r, ns, TB), wst_ref (1, ns, r, TB),
      dr_ref (1, r, 1, TB), qbd_ref (1, nx, 1, TB), rbd_ref (1, nu, 1, TB)
      outputs: mq_ref (1, nx, nu, TB), lx_ref (1, nx, ns, TB),
               lu_ref (1, nu, ns, TB), hss_ref (1, ns, ns, TB)
      scratch: MT (nu, nx, TB) -- Mq transpose buffer
    """
    i = pl.program_id(1)
    r = c_ref.shape[1]
    nx = a_ref.shape[1]
    nu = b_ref.shape[2]
    ns = ws_ref.shape[2]

    @pl.when(i == 0)
    def _():
        P[:] = jnp.zeros_like(P)

    dr = dr_ref[0]                            # (r, 1, TB)
    C = c_ref[0]
    Ct = ct_ref[0]
    Dd = d_ref[0]
    Dt = dt_ref[0]
    CD = C * dr                               # (r, nx, TB)
    DD = Dd * dr                              # (r, nu, TB)
    WD = ws_ref[0] * dr                       # (r, ns, TB)

    eye_x = (jax.lax.broadcasted_iota(jnp.int32, (nx, nx, 1), 0)
             == jax.lax.broadcasted_iota(jnp.int32, (nx, nx, 1), 1))
    eye_u = (jax.lax.broadcasted_iota(jnp.int32, (nu, nu, 1), 0)
             == jax.lax.broadcasted_iota(jnp.int32, (nu, nu, 1), 1))
    Qb = _mm(Ct, CD, r) + jnp.where(eye_x, qbd_ref[0], 0.0)
    Rb = _mm(Dt, DD, r) + jnp.where(eye_u, rbd_ref[0], 0.0)
    Mq = _mm(Ct, DD, r)                       # (nx, nu)
    mq_ref[0] = Mq
    lx_ref[0] = _mm(Ct, WD, r)
    lu_ref[0] = _mm(Dt, WD, r)
    hss_ref[0] = _mm(wst_ref[0], WD, r)
    for u in range(nu):                       # M' into scratch
        for j in range(nx):
            MT[u, j, :] = Mq[j, u, :]

    A = a_ref[0]
    At = at_ref[0]
    B = b_ref[0]
    Bt = bt_ref[0]
    W = Qb + P[:]
    V = _mm(W, B, nx) + Mq                    # (nx, nu)
    Hu = Rb + _mm(Bt, V, nx) + _mm(MT[:], B, nx)

    a = Hu[0, 0, :]
    b2 = 0.5 * (Hu[0, 1, :] + Hu[1, 0, :])
    c = Hu[1, 1, :]
    det = a * c - b2 * b2
    det = jnp.where((det > 0.0) & (a > 0.0), det, jnp.nan)
    idet = 1.0 / det
    huinv_ref[0, 0, 0, :] = c * idet
    huinv_ref[0, 0, 1, :] = -b2 * idet
    huinv_ref[0, 1, 0, :] = -b2 * idet
    huinv_ref[0, 1, 1, :] = a * idet

    Gt = _mm(At, V, nx)
    for u in range(nu):
        for j in range(nx):
            g_ref[0, u, j, :] = Gt[j, u, :]

    KgT = _mm(Gt, huinv_ref[0], nu)
    GHG = KgT[:, 0:1, :] * g_ref[0][0:1, :, :]
    for u in range(1, nu):
        GHG = GHG + KgT[:, u:u + 1, :] * g_ref[0][u:u + 1, :, :]
    P_new = _mm(At, _mm(W, A, nx), nx) - GHG
    _sym(P2, P_new, nx)
    P[:] = P2[:]
    w_ref[0] = W


def assemble_factor_lanes(C, D, Ws, Dr, qb_diag, rb_diag, Ad, Bd):
    """Fused assembly + factorisation.  C (B,N,r,nx), D (B,N,r,nu),
    Ws (B,N,r,ns), Dr (B,N,r), qb_diag (B,N,nx), rb_diag (B,N,nu),
    Ad (B,N,nx,nx), Bd (B,N,nx,nu) ->
    (Huinv, G, W, Mq, Lx, Lu, Hss (B,N,ns,ns) per-stage)."""
    Bsz, N, r, nx = C.shape
    nu = D.shape[-1]
    ns = Ws.shape[-1]
    dtype = C.dtype
    TB = _tb(Bsz)

    def lanes(x):
        x = jnp.moveaxis(x, 0, -1)
        pad = (-Bsz) % TB
        if pad:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
        return x

    args = [lanes(v) for v in (
        C, jnp.swapaxes(C, -1, -2), D, jnp.swapaxes(D, -1, -2),
        Ws, jnp.swapaxes(Ws, -1, -2), Dr[..., None],
        qb_diag[..., None], rb_diag[..., None],
        Ad, jnp.swapaxes(Ad, -1, -2), Bd, jnp.swapaxes(Bd, -1, -2))]
    Bp = args[0].shape[-1]
    nb = Bp // TB

    rev = lambda b, i: (N - 1 - i, 0, 0, b)
    spec = lambda s1, s2: pl.BlockSpec((1, s1, s2, TB), rev,
                                       memory_space=pltpu.VMEM)
    in_specs = [spec(r, nx), spec(nx, r), spec(r, nu), spec(nu, r),
                spec(r, ns), spec(ns, r), spec(r, 1), spec(nx, 1),
                spec(nu, 1), spec(nx, nx), spec(nx, nx), spec(nx, nu),
                spec(nu, nx)]
    out_specs = (spec(nx, nx), spec(nu, nu), spec(nu, nx), spec(nx, nu),
                 spec(nx, ns), spec(nu, ns), spec(ns, ns))
    out_shape = tuple(jax.ShapeDtypeStruct((N, s1, s2, Bp), dtype)
                      for s1, s2 in ((nx, nx), (nu, nu), (nu, nx),
                                     (nx, nu), (nx, ns), (nu, ns),
                                     (ns, ns)))
    W, Huinv, G, Mq, Lx, Lu, Hss = pl.pallas_call(
        _assemble_factor_kernel,
        grid=(nb, N),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((nx, nx, TB), dtype),
                        pltpu.VMEM((nx, nx, TB), dtype),
                        pltpu.VMEM((nu, nx, TB), dtype)],
        interpret=_interpret(),
    )(*args)

    unl = lambda x: jnp.moveaxis(x[..., :Bsz], -1, 0)
    return (unl(Huinv), unl(G), unl(W), unl(Mq), unl(Lx), unl(Lu),
            unl(Hss))


# ---------------------------------------------------------------------------
# backward substitution sweep
# ---------------------------------------------------------------------------


def _bwd_kernel(a_ref, b_ref, m_ref, kg_ref, w_mat_ref, rx_ref, ru_ref,
                re_ref, h_ref, wout_ref, p):
    """One backward stage of the linear-term recursion.

    rx/ru/re blocks: (1, K, nx/nu, TB); carry p: (K, nx, TB).
    """
    i = pl.program_id(1)
    nx = a_ref.shape[1]
    nu = b_ref.shape[2]

    @pl.when(i == 0)
    def _():
        p[:] = jnp.zeros_like(p)

    W = w_mat_ref[0]                          # symmetric
    w = rx_ref[0] + p[:]                      # (K, nx)
    Wd = _mm(re_ref[0], W, nx)                # (K, nx): re @ W (W sym)
    h = (_mm(Wd - w, b_ref[0], nx) + _mm(re_ref[0], m_ref[0], nx)
         - ru_ref[0])                         # (K, nu)
    p_new = _mm(h, kg_ref[0], nu) + _mm(w - Wd, a_ref[0], nx)
    p[:] = p_new
    h_ref[0] = h
    wout_ref[0] = w


def _fwd_kernel(at_ref, bt_ref, gt_ref, huinv_ref, w_mat_ref, mt_ref,
                h_ref, w_ref, re_ref, du_ref, dx_ref, dlam_ref, dx):
    """One forward rollout stage; carry dx: (K, nx, TB)."""
    i = pl.program_id(1)
    nx = at_ref.shape[1]
    nu = bt_ref.shape[1]

    @pl.when(i == 0)
    def _():
        dx[:] = jnp.zeros_like(dx)

    t = _mm(dx[:], gt_ref[0], nx) + h_ref[0]            # (K, nu)
    du = -_mm(t, huinv_ref[0], nu)                      # (K, nu)
    dx_new = (_mm(dx[:], at_ref[0], nx) + _mm(du, bt_ref[0], nu)
              + re_ref[0])                              # (K, nx)
    dlam = (_mm(dx_new, w_mat_ref[0], nx) + _mm(du, mt_ref[0], nu)
            - w_ref[0])
    dx[:] = dx_new
    du_ref[0] = du
    dx_ref[0] = dx_new
    dlam_ref[0] = dlam


def apply_lanes(Huinv, G, W, Ad, Bd, M, rx, ru, re):
    """Batched fused Riccati substitution.  fac arrays (B, N, ...);
    rx/re (B, K, N, nx), ru (B, K, N, nu) -> (du, dx, dlam) same layout.
    """
    Bsz, N, nx, nu = Bd.shape
    K = rx.shape[1]
    dtype = Ad.dtype

    TB = _tb(Bsz)

    def lanes(x):
        x = jnp.moveaxis(x, 0, -1)
        pad = (-Bsz) % TB
        if pad:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
        return x

    def lanes_rhs(x):
        # (B, K, N, n) -> (N, K, n, B')
        return lanes(jnp.moveaxis(x, 2, 1))

    Kg = jnp.einsum("bnuv,bnvj->bnuj", Huinv, G,
                    precision="highest")                # (B, N, nu, nx)
    Gt = jnp.swapaxes(G, -1, -2)
    At = jnp.swapaxes(Ad, -1, -2)
    Bt = jnp.swapaxes(Bd, -1, -2)
    Mt = jnp.swapaxes(M, -1, -2)

    rev = lambda b, i: (N - 1 - i, 0, 0, b)
    fwdm = lambda b, i: (i, 0, 0, b)
    spec = lambda s1, s2, im: pl.BlockSpec((1, s1, s2, TB), im,
                                           memory_space=pltpu.VMEM)
    Bp = ((Bsz + TB - 1) // TB) * TB
    nb = Bp // TB

    # ---- backward sweep ----
    h_t, w_t = pl.pallas_call(
        _bwd_kernel,
        grid=(nb, N),
        in_specs=[spec(nx, nx, rev), spec(nx, nu, rev), spec(nx, nu, rev),
                  spec(nu, nx, rev), spec(nx, nx, rev), spec(K, nx, rev),
                  spec(K, nu, rev), spec(K, nx, rev)],
        out_specs=(spec(K, nu, rev), spec(K, nx, rev)),
        out_shape=(jax.ShapeDtypeStruct((N, K, nu, Bp), dtype),
                   jax.ShapeDtypeStruct((N, K, nx, Bp), dtype)),
        scratch_shapes=[pltpu.VMEM((K, nx, TB), dtype)],
        interpret=_interpret(),
    )(lanes(Ad), lanes(Bd), lanes(M), lanes(Kg), lanes(W),
      lanes_rhs(rx), lanes_rhs(ru), lanes_rhs(re))

    # ---- forward sweep ----
    du_t, dx_t, dlam_t = pl.pallas_call(
        _fwd_kernel,
        grid=(nb, N),
        in_specs=[spec(nx, nx, fwdm), spec(nu, nx, fwdm),
                  spec(nx, nu, fwdm), spec(nu, nu, fwdm),
                  spec(nx, nx, fwdm), spec(nu, nx, fwdm),
                  spec(K, nu, fwdm), spec(K, nx, fwdm), spec(K, nx, fwdm)],
        out_specs=(spec(K, nu, fwdm), spec(K, nx, fwdm), spec(K, nx, fwdm)),
        out_shape=(jax.ShapeDtypeStruct((N, K, nu, Bp), dtype),
                   jax.ShapeDtypeStruct((N, K, nx, Bp), dtype),
                   jax.ShapeDtypeStruct((N, K, nx, Bp), dtype)),
        scratch_shapes=[pltpu.VMEM((K, nx, TB), dtype)],
        interpret=_interpret(),
    )(lanes(At), lanes(Bt), lanes(Gt), lanes(Huinv), lanes(W), lanes(Mt),
      h_t, w_t, lanes_rhs(re))

    def unl(x):
        # (N, K, n, B') -> (B, K, N, n)
        return jnp.moveaxis(jnp.moveaxis(x[..., :Bsz], -1, 0), 2, 1)

    return unl(du_t), unl(dx_t), unl(dlam_t)
