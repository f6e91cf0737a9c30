"""Stage-structured constraint matrix for the condensed MPC QP.

The dynamic LTV QP has 800 general rows (``dynamic_state_constraints.m``,
``dynamic_tyre_linearise_constraints.m:18``), but every row at stage s is
a linear combination of a small per-stage basis:

    row = alpha' B7[s]  +  beta' E_u[s]  +  gamma' E_sigma

where B7[s] is the stage's (nx, S*nu) block of the condensed prediction
matrix B_bar (it has no slack columns), E_u[s] selects the stage's own nu
control columns and E_sigma the n_soft trailing slack columns (the 12
friction-polygon rows per stage, for example, are 12 combinations of the
SAME two basis rows).  Storing (V, B7) instead of the dense A cuts the
IPM's dominant per-iteration HBM traffic and MXU work ~3x:

    A' diag(d) A  =  sum_s T_s' (V_s' diag(d_s) V_s) T_s

with T_s = [B7[s]; E_u[s]; E_sigma] applied block-wise -- the only large
contraction left is one (S*nu, S*nx) @ (S*nx, S*nu) matmul over the B7
basis (280 rows instead of 800 for the reference shape).

``StageRows`` quacks like the dense A wherever ``ops.ipm.solve_qp`` needs
it: matvec / rmatvec / quadform / row norms / row-column scaling /
compensated (error-free-transform) products.  It is a registered pytree,
so it vmaps/jits/shards exactly like an array.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

from .precision import residual_affine


@dataclasses.dataclass(frozen=True)
class StageRows:
    V_b: Any    # (S, R, nxb)  coefficients over the stage's B7 rows
    V_u: Any    # (S, R, nu)   coefficients over the stage's control cols
    V_s: Any    # (S, R, ns)   coefficients over the shared slack cols
    B7: Any     # (S, nxb, S*nu)  per-stage basis rows (B_bar blocks;
                #                  control columns only, no slack cols)

    @property
    def shape(self):
        S, R, _ = self.V_b.shape
        ns = self.V_s.shape[-1]
        return (S * R, self.B7.shape[-1] + ns)

    @property
    def dtype(self):
        return self.B7.dtype

    def _dims(self):
        S, R, nxb = self.V_b.shape
        nu = self.V_u.shape[-1]
        ns = self.V_s.shape[-1]
        return S, R, nxb, nu, ns, self.B7.shape[-1]

    # ---- products ---------------------------------------------------------

    def matvec(self, x):
        """A @ x -> (m,)"""
        S, R, nxb, nu, ns, Snu = self._dims()
        x_c = x[:Snu]
        w_b = jnp.einsum("sij,j->si", self.B7, x_c)
        x_u = x_c.reshape(S, nu)
        x_s = x[Snu:Snu + ns]
        y = (jnp.einsum("sri,si->sr", self.V_b, w_b)
             + jnp.einsum("srk,sk->sr", self.V_u, x_u)
             + jnp.einsum("srj,j->sr", self.V_s, x_s))
        return y.reshape(S * R)

    def rmatvec(self, z):
        """A' @ z -> (n,)"""
        S, R, nxb, nu, ns, Snu = self._dims()
        zs = z.reshape(S, R)
        c_b = jnp.einsum("sri,sr->si", self.V_b, zs)
        out_c = jnp.einsum("sij,si->j", self.B7, c_b)
        out_c = out_c + jnp.einsum("srk,sr->sk", self.V_u, zs).reshape(Snu)
        out_s = jnp.einsum("srj,sr->j", self.V_s, zs)
        return jnp.concatenate([out_c, out_s])

    def quadform(self, d):
        """A' diag(d) A -> (n, n) without materialising A."""
        S, R, nxb, nu, ns, Snu = self._dims()
        n = Snu + ns
        ds = d.reshape(S, R)
        Vb, Vu, Vs, B7 = self.V_b, self.V_u, self.V_s, self.B7
        dVb = Vb * ds[..., None]
        Mbb = jnp.einsum("sri,srj->sij", dVb, Vb)
        Mbu = jnp.einsum("sri,srk->sik", dVb, Vu)
        Mbs = jnp.einsum("sri,srj->sij", dVb, Vs)
        dVu = Vu * ds[..., None]
        Muu = jnp.einsum("srk,srl->skl", dVu, Vu)
        Mus = jnp.einsum("srk,srj->skj", dVu, Vs)
        Mss = jnp.einsum("srj,sr,srl->jl", Vs, ds, Vs)

        # dense core: one (Snu, S*nxb) @ (S*nxb, Snu) MXU contraction
        W = jnp.einsum("sij,sjk->sik", Mbb, B7)
        Kcc = jnp.einsum("sij,sik->jk", B7, W)         # (Snu, Snu)
        # B7 x control-cols cross terms
        P = jnp.einsum("sij,sik->sjk", B7, Mbu)        # (S, Snu, nu)
        Pu = jnp.moveaxis(P, 0, 1).reshape(Snu, Snu)
        Kcc = Kcc + Pu + Pu.T
        # control-control block diagonal
        uidx = (jnp.arange(S)[:, None] * nu + jnp.arange(nu)[None, :])
        Kcc = Kcc.at[uidx[:, :, None], uidx[:, None, :]].add(Muu)
        # B7 x slack cross + control x slack
        Q = jnp.einsum("sij,sik->jk", B7, Mbs)         # (Snu, ns)
        Q = Q + jnp.reshape(Mus, (Snu, ns))
        K = jnp.zeros((n, n), self.dtype)
        K = K.at[:Snu, :Snu].set(Kcc)
        K = K.at[:Snu, Snu:].set(Q)
        K = K.at[Snu:, :Snu].set(Q.T)
        K = K.at[Snu:, Snu:].set(Mss)
        return K

    # ---- compensated (double-f32) products ---------------------------------

    def rmatvec_compensated(self, z, base):
        """(hi, lo) of base + A' z, with the large B7 contraction done via
        error-free transforms (the E_u / E_sigma parts are short exact
        sums folded into the base)."""
        S, R, nxb, nu, ns, Snu = self._dims()
        zs = z.reshape(S, R)
        c_b = jnp.einsum("sri,sr->si", self.V_b, zs).reshape(S * nxb)
        u_part = jnp.einsum("srk,sr->sk", self.V_u, zs).reshape(Snu)
        s_part = jnp.einsum("srj,sr->j", self.V_s, zs)
        base = base.at[:Snu].add(u_part)
        base = base.at[Snu:Snu + ns].add(s_part)
        BfT = jnp.moveaxis(self.B7, -1, 0).reshape(Snu, S * nxb)
        hi_c, lo_c = residual_affine(BfT, c_b, base[:Snu])
        hi = jnp.concatenate([hi_c, base[Snu:]])
        lo = jnp.concatenate([lo_c, jnp.zeros((ns,), self.dtype)])
        return hi, lo

    def matvec_compensated(self, x):
        """(hi, lo) of A @ x: per-stage basis products via EFT."""
        S, R, nxb, nu, ns, Snu = self._dims()
        Bf = self.B7.reshape(S * nxb, Snu)
        w_hi, w_lo = residual_affine(Bf, x[:Snu],
                                     jnp.zeros((S * nxb,), self.dtype))
        w_hi = w_hi.reshape(S, nxb)
        w_lo = w_lo.reshape(S, nxb)
        x_u = x[:Snu].reshape(S, nu)
        x_s = x[Snu:Snu + ns]
        y = (jnp.einsum("sri,si->sr", self.V_b, w_hi)
             + jnp.einsum("sri,si->sr", self.V_b, w_lo)
             + jnp.einsum("srk,sk->sr", self.V_u, x_u)
             + jnp.einsum("srj,j->sr", self.V_s, x_s))
        return y.reshape(S * R), jnp.zeros((S * R,), self.dtype)

    # ---- scaling / norms ----------------------------------------------------

    def row_sq_norms(self):
        """||a_r||_2^2 for every row (used for row equilibration)."""
        S, R, nxb, nu, ns, Snu = self._dims()
        B7 = self.B7
        Gbb = jnp.einsum("sij,skj->sik", B7, B7)
        Bu = jax.vmap(lambda b, s: lax.dynamic_slice(
            b, (0, s * nu), (nxb, nu)))(B7, jnp.arange(S))
        n2 = (jnp.einsum("sri,sik,srk->sr", self.V_b, Gbb, self.V_b)
              + 2.0 * jnp.einsum("sri,sik,srk->sr", self.V_b, Bu, self.V_u)
              + jnp.sum(self.V_u ** 2, -1) + jnp.sum(self.V_s ** 2, -1))
        return n2.reshape(S * R)

    def scale_rows(self, r):
        S, R, *_ = self.V_b.shape
        rs = r.reshape(S, R)[..., None]
        return StageRows(self.V_b * rs, self.V_u * rs, self.V_s * rs,
                         self.B7)

    def scale_cols(self, vs):
        S, R, nxb, nu, ns, Snu = self._dims()
        Vu = self.V_u * vs[:Snu].reshape(S, 1, nu)
        Vs = self.V_s * vs[Snu:Snu + ns].reshape(1, 1, ns)
        return StageRows(self.V_b, Vu, Vs, self.B7 * vs[None, None, :Snu])

    def materialize(self):
        """Dense (m, n) A -- tests and one-off uses only."""
        S, R, nxb, nu, ns, Snu = self._dims()
        A_c = jnp.einsum("sri,sij->srj", self.V_b, self.B7)
        uidx = (jnp.arange(S)[:, None] * nu + jnp.arange(nu)[None, :])
        A_c = A_c.at[jnp.arange(S)[:, None, None],
                     jnp.arange(R)[None, :, None],
                     uidx[:, None, :]].add(self.V_u)
        return jnp.concatenate(
            [A_c, self.V_s], axis=-1).reshape(S * R, Snu + ns)


jax.tree_util.register_dataclass(
    StageRows, data_fields=["V_b", "V_u", "V_s", "B7"], meta_fields=[])


def is_structured(A) -> bool:
    return isinstance(A, (StageRows, GenRows))


@dataclasses.dataclass(frozen=True)
class GenRows:
    """Generator-factored constraint matrix: the round-3 redesign of
    :class:`StageRows` that actually wins on the chip.

    Every stage's R emitted rows are STATIC combinations of G << R
    per-stage generator rows already expressed in the full variable
    space (for the dynamic LTV QP: G = 7 -- track offset, v/delta
    boxes, two slip gradients, the friction-ellipse force gradient, and
    the stage's own-control direction -- versus R = 20 emitted rows, of
    which the 12-gon contributes 12 combinations of two generators and
    every soft two-sided pair is a duplicate).  Row (s, r):

        a_{s,r} = W[s, r, :] @ Ag[s]  +  Ws[s, r, :] @ E_sigma

    with ``Ag`` (S, G, n) materialised ONCE per solve and ``E_sigma``
    the static slack-column basis.  Unlike StageRows (whose products
    re-derived rows from the B_bar basis with per-stage einsum chains
    and a scatter -- measured SLOWER than dense), every hot product
    here is one or two large flat matmuls on (S*G, n):

        A @ x   = reorder(W @ (Ag @ x))           reads  S*G*n
        A' @ z  = Ag' @ (W' @ z)                  reads  S*G*n
        A'DA    = Ag_flat' @ ((W'DW) Ag)_flat     reads  2x S*G*n

    -- a ~2.9x HBM-traffic cut over the dense (S*R, n) A (94 KB vs
    269 KB per instance for the reference shape), with identical op
    shapes to the dense path (batched matmuls), just narrower.

    Rows are ordered STAGE-MAJOR ((s, r) flattened); bounds built by the
    matching assembly carry the same order.
    """

    Ag: Any     # (S, G, n)  per-stage generator rows, full variable space
                #            (slack columns present but zero)
    W: Any      # (S, R, G)  row coefficients over the stage's generators
    Ws: Any     # (S, R, ns) row coefficients over the slack columns

    @property
    def shape(self):
        S, R, _ = self.W.shape
        return (S * R, self.Ag.shape[-1])

    @property
    def dtype(self):
        return self.Ag.dtype

    def _dims(self):
        S, R, G = self.W.shape
        n = self.Ag.shape[-1]
        ns = self.Ws.shape[-1]
        return S, R, G, ns, n

    # ---- products ---------------------------------------------------------

    def matvec(self, x):
        """A @ x -> (m,), stage-major."""
        S, R, G, ns, n = self._dims()
        t = jnp.einsum("sgn,n->sg", self.Ag, x)
        y = (jnp.einsum("srg,sg->sr", self.W, t)
             + jnp.einsum("srj,j->sr", self.Ws, x[n - ns:]))
        return y.reshape(S * R)

    def rmatvec(self, z):
        """A' @ z -> (n,)."""
        S, R, G, ns, n = self._dims()
        zs = z.reshape(S, R)
        c = jnp.einsum("srg,sr->sg", self.W, zs)
        out = jnp.einsum("sgn,sg->n", self.Ag, c)
        s_part = jnp.einsum("srj,sr->j", self.Ws, zs)
        return out.at[n - ns:].add(s_part)

    def quadform(self, d):
        """A' diag(d) A -> (n, n) via one narrow MXU contraction."""
        S, R, G, ns, n = self._dims()
        ds = d.reshape(S, R)
        Wd = self.W * ds[..., None]                        # (S, R, G)
        Mgg = jnp.einsum("srg,srh->sgh", Wd, self.W)       # (S, G, G)
        P = jnp.einsum("sgh,shn->sgn", Mgg, self.Ag)
        K = jnp.einsum("sgn,sgm->nm", self.Ag, P)          # (n, n)
        if ns:
            Mgs = jnp.einsum("srg,srj->sgj", Wd, self.Ws)  # (S, G, ns)
            Ks = jnp.einsum("sgn,sgj->nj", self.Ag, Mgs)   # (n, ns)
            Mss = jnp.einsum("srj,sr,srl->jl", self.Ws, ds, self.Ws)
            K = K.at[:, n - ns:].add(Ks)
            K = K.at[n - ns:, :].add(Ks.T)
            K = K.at[n - ns:, n - ns:].add(Mss)
        return K

    # ---- compensated (double-f32) products --------------------------------

    def rmatvec_compensated(self, z, base):
        """(hi, lo) of base + A' z (EFT on the large contraction)."""
        S, R, G, ns, n = self._dims()
        zs = z.reshape(S, R)
        c = jnp.einsum("srg,sr->sg", self.W, zs).reshape(S * G)
        base = base.at[n - ns:].add(jnp.einsum("srj,sr->j", self.Ws, zs))
        AgT = jnp.moveaxis(self.Ag, -1, 0).reshape(n, S * G)
        return residual_affine(AgT, c, base)

    def matvec_compensated(self, x):
        """(hi, lo) of A @ x.

        The large Ag @ x contraction is error-free-transformed; its
        residual is carried through the (short, O(1)-coefficient) W
        recombination as a separate lo term, matching the dense /
        StageRows two-term contract used by the IPM's delta-form restart.
        """
        S, R, G, ns, n = self._dims()
        Af = self.Ag.reshape(S * G, n)
        t_hi, t_lo = residual_affine(Af, x, jnp.zeros((S * G,), self.dtype))
        t_hi = t_hi.reshape(S, G)
        t_lo = t_lo.reshape(S, G)
        y_hi = (jnp.einsum("srg,sg->sr", self.W, t_hi)
                + jnp.einsum("srj,j->sr", self.Ws, x[n - ns:]))
        y_lo = jnp.einsum("srg,sg->sr", self.W, t_lo)
        return y_hi.reshape(S * R), y_lo.reshape(S * R)

    # ---- scaling / norms --------------------------------------------------

    def row_sq_norms(self):
        """||a_r||_2^2 per row (slack columns of Ag are zero, so the
        cross term with Ws vanishes)."""
        S, R, G, ns, n = self._dims()
        Gram = jnp.einsum("sgn,shn->sgh", self.Ag, self.Ag)
        n2 = (jnp.einsum("srg,sgh,srh->sr", self.W, Gram, self.W)
              + jnp.sum(self.Ws ** 2, -1))
        return n2.reshape(S * R)

    def scale_rows(self, r):
        S, R, _ = self.W.shape
        rs = r.reshape(S, R)[..., None]
        return dataclasses.replace(self, W=self.W * rs, Ws=self.Ws * rs)

    def scale_cols(self, vs):
        S, R, G, ns, n = self._dims()
        return dataclasses.replace(
            self, Ag=self.Ag * vs[None, None, :],
            Ws=self.Ws * vs[n - ns:].reshape(1, 1, ns))

    def materialize(self):
        """Dense (m, n) A -- tests and one-off uses only."""
        S, R, G, ns, n = self._dims()
        A = jnp.einsum("srg,sgn->srn", self.W, self.Ag)
        A = A.at[:, :, n - ns:].add(self.Ws)
        return A.reshape(S * R, n)


jax.tree_util.register_dataclass(
    GenRows, data_fields=["Ag", "W", "Ws"], meta_fields=[])
