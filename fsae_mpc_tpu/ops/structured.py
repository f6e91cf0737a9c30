"""Generator-factored constraint matrix for the condensed MPC QP.

The dynamic LTV QP has 800 general rows (``dynamic_state_constraints.m``,
``dynamic_tyre_linearise_constraints.m:18``), but every stage's rows are
static combinations of a small per-stage generator basis.  :class:`GenRows`
stores that factorisation and quacks like the dense A wherever
``ops.ipm.solve_qp`` needs it: matvec / rmatvec / quadform / row norms /
row-column scaling / compensated (error-free-transform) products.  It is a
registered pytree, so it vmaps/jits/shards exactly like an array.

Measured regime (AB_STRUCTURED.json / PERF_VARIANTS.json): GenRows wins
for the F32_ACCURATE preset (1.65x) and loses to the dense path for the
throughput presets -- the dense A's single big matmuls beat the narrower
factored products once the IPM iteration count is small.  An earlier
stage-basis representation (StageRows: rows expressed over per-stage
B_bar blocks with per-stage einsum chains and a scatter) measured slower
than dense at EVERY operating point and was removed in round 4; see the
git history for its implementation.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

from .precision import residual_affine, _split, _dd_add


def _dd_contract_g(W, T_hi, T_lo):
    """Compensated contraction  sum_g W[..., g] * (T_hi + T_lo)[..., g]
    over the SHORT generator axis: Dekker two-products accumulated in
    double-f32.  Returns (hi, lo).  W (S, R, G); T_* (S, G) broadcast
    over R."""
    G = W.shape[-1]
    acc = (jnp.zeros(W.shape[:-1], W.dtype),
           jnp.zeros(W.shape[:-1], W.dtype))
    for g in range(G):
        w = W[..., g]
        t = T_hi[:, None, g] if T_hi.ndim == 2 else T_hi[..., g]
        p = w * t
        w1, w2 = _split(w)
        t1, t2 = _split(t)
        e = ((w1 * t1 - p) + w1 * t2 + w2 * t1) + w2 * t2
        if T_lo is not None:
            tl = T_lo[:, None, g] if T_lo.ndim == 2 else T_lo[..., g]
            e = e + w * tl
        acc = _dd_add(acc, (p, e))
    return acc





def is_structured(A) -> bool:
    return isinstance(A, GenRows)


@dataclasses.dataclass(frozen=True)
class GenRows:
    """Generator-factored constraint matrix.

    Every stage's R emitted rows are STATIC combinations of G << R
    per-stage generator rows already expressed in the full variable
    space (for the dynamic LTV QP: G = 7 -- track offset, v/delta
    boxes, two slip gradients, the friction-ellipse force gradient, and
    the stage's own-control direction -- versus R = 20 emitted rows, of
    which the 12-gon contributes 12 combinations of two generators and
    every soft two-sided pair is a duplicate).  Row (s, r):

        a_{s,r} = W[s, r, :] @ Ag[s]  +  Ws[s, r, :] @ E_sigma

    with ``Ag`` (S, G, n) materialised ONCE per solve and ``E_sigma``
    the static slack-column basis.  Every hot product is one or two
    large flat matmuls on (S*G, n):

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
        """(hi, lo) of base + A' z to ~double-f32 (EFT on the large
        contraction; the short W' pre-contraction accumulated with Dekker
        two-products, its residual folded through the hi/lo output)."""
        S, R, G, ns, n = self._dims()
        zs = z.reshape(S, R)
        # c = W' z over the short row axis, in double-f32
        c = (jnp.zeros((S, G), self.dtype), jnp.zeros((S, G), self.dtype))
        for r in range(R):
            w = self.W[:, r, :]                     # (S, G)
            t = zs[:, r:r + 1]                      # (S, 1)
            p = w * t
            w1, w2 = _split(w)
            t1, t2 = _split(t)
            e = ((w1 * t1 - p) + w1 * t2 + w2 * t1) + w2 * t2
            c = _dd_add(c, (p, e))
        c_hi, c_lo = c[0].reshape(S * G), c[1].reshape(S * G)
        AgT = jnp.moveaxis(self.Ag, -1, 0).reshape(n, S * G)
        hi, lo = residual_affine(AgT, c_hi, base)
        # fold the slack-column part and the W'-residual correction in
        # double-f32.  The Ws' z sum alone is ~480 +-z terms for the
        # polygon slack: a plain-f32 reduction re-rounds it at eps32
        # (measured 2.3e-8 relative on the slack components) -- run it
        # through the same compensated reduction.
        WsT = jnp.moveaxis(self.Ws, -1, 0).reshape(ns, S * R)
        ws_hi, ws_lo = residual_affine(WsT, z,
                                       jnp.zeros((ns,), self.dtype))
        pad = lambda v: jnp.zeros((n,), self.dtype).at[n - ns:].set(v)
        out = _dd_add((hi, lo), (pad(ws_hi), pad(ws_lo)))
        out = _dd_add(out, (AgT @ c_lo, jnp.zeros((n,), self.dtype)))
        return out

    def matvec_compensated(self, x):
        """(hi, lo) of A @ x to ~double-f32.

        The large Ag @ x contraction is error-free-transformed AND the
        short W recombination is accumulated with Dekker two-products
        (a plain-f32 recombination re-rounds at row-magnitude * eps32 --
        ~1e-7 relative, measured -- which would defeat the dense path's
        f32^2 contract used by the IPM's delta-form restart).
        """
        S, R, G, ns, n = self._dims()
        Af = self.Ag.reshape(S * G, n)
        t_hi, t_lo = residual_affine(Af, x, jnp.zeros((S * G,), self.dtype))
        y = _dd_contract_g(self.W, t_hi.reshape(S, G), t_lo.reshape(S, G))
        ws = jnp.einsum("srj,j->sr", self.Ws, x[n - ns:])
        y_hi, y_lo = _dd_add(y, (ws, jnp.zeros_like(ws)))
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
