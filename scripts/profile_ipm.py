"""Component-level TPU timing of the LTV-MPC tick: where do the ms go?

Times (batch=1024, f32, dynamic model, N=40):
  * linearize + condense + constraint/QP assembly (no solve)
  * one KKT matrix formation  K = Hs + (A' * D) A + diag(Db)
  * blocked cholesky_invdiag(K)
  * cho_solve_invdiag
  * full ipm.solve_qp
  * full ltv_mpc_dynamic tick
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from fsae_mpc_tpu.config import MPC_F32, VehicleParams
from fsae_mpc_tpu.mpc import ltv
from fsae_mpc_tpu.models import curvilinear as cm, integrators
from fsae_mpc_tpu.ops import ipm
from fsae_mpc_tpu.ops import linalg as xl
from fsae_mpc_tpu.track import load_track


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    dtype = jnp.float32
    batch = 1024
    mpc = MPC_F32
    track, _ = load_track("data/fsg2019.csv", dtype=dtype)
    params = VehicleParams()
    N = mpc.n_steps
    opts = ipm.F32_OPTS

    key = jax.random.key(0)
    x0 = jnp.zeros((batch, 7), dtype).at[:, 3].set(8.0)
    x0 = x0 + 0.01 * jax.random.normal(key, (batch, 7), dtype)
    t = mpc.dt * jnp.arange(1, N + 1, dtype=dtype)
    xr = jnp.zeros((N, 7), dtype).at[:, 3].set(jnp.minimum(8 + 10 * t, 20.0))
    xr = xr.at[:, 0].set(jnp.cumsum(xr[:, 3] * mpc.dt))
    x_ref = jnp.broadcast_to(xr, (batch, N, 7))
    x_lin = jnp.zeros((batch, N, 7), dtype).at[:, :, 3].set(8.0)
    x_lin = x_lin.at[:, :, 0].set(8.0 * t)
    u_lin = jnp.zeros((batch, N, 2), dtype)

    # --- assembly only ---------------------------------------------------
    def assemble(x0, x_ref, x_lin, u_lin):
        f = lambda x, u: cm.f_curv_dyn_only(x, u, track, params)
        step = lambda x, u: integrators.rk4_step(f, x, u, mpc.dt)
        Ad, Bd, dd = integrators.linearize_discrete(step, x_lin, u_lin)
        from fsae_mpc_tpu.ops.condense import condense as _c
        A_bar, B_bar, d_bar = _c(Ad, Bd, dd)
        import numpy as _np
        from fsae_mpc_tpu.mpc import constraints as cons
        q = jnp.asarray([mpc.q_s, mpc.q_n, mpc.q_mu, 0, 0, 0, 0], dtype)
        q_diag = jnp.concatenate([jnp.tile(q, N - 1),
                                  q * mpc.q_terminal_scale])
        r_diag = jnp.tile(jnp.asarray([mpc.r_a, mpc.r_delta_d], dtype), N)
        groups = [
            cons.state_box_group([3, 6], _np.array([0.0, -mpc.delta_max]),
                                 _np.array([_np.inf, mpc.delta_max]),
                                 _np.array([-1, -1]), x_lin, u_lin),
            cons.state_box_group([1], _np.array([-mpc.n_max]),
                                 _np.array([mpc.n_max]), _np.array([0]),
                                 x_lin, u_lin),
            cons.dynamic_slip_group(x_lin, u_lin, mpc, params, 1, 2),
            cons.friction_polygon_group(x_lin, u_lin, mpc, params, 3),
        ]
        u_lb, u_ub = ltv._control_bounds(mpc, N, dtype)
        return ltv.assemble_condensed_qp(
            A_bar, B_bar, d_bar, x0, x_ref, q_diag, r_diag,
            [mpc.w_track, mpc.w_slip, mpc.w_slip, mpc.w_tyre],
            groups, u_lb, u_ub)

    asm_b = jax.jit(jax.vmap(assemble, in_axes=(0, 0, 0, 0)))
    qp = asm_b(x0, x_ref, x_lin, u_lin)
    H, g, A, lb, ub, lbA, ubA, const = qp
    print("QP shapes:", {k: v.shape for k, v in
                         zip("H g A lb ub lbA ubA".split(), qp[:7])})
    t_asm = timeit(lambda *a: asm_b(*a), x0, x_ref, x_lin, u_lin)
    print(f"assembly (lin+condense+rows): {t_asm*1e3:8.2f} ms")

    n = g.shape[-1]
    m = lbA.shape[-1]
    D_r = jnp.abs(jax.random.normal(key, (batch, m), dtype))
    D_b = jnp.abs(jax.random.normal(key, (batch, n), dtype))

    @jax.jit
    def form_K(H, A, D_r, D_b):
        K = H + jnp.einsum("bmn,bm,bmk->bnk", A, D_r, A)
        idx = jnp.arange(n)
        return K.at[:, idx, idx].add(D_b + 1e-7)

    K = form_K(H, A, D_r, D_b)
    t_k = timeit(form_K, H, A, D_r, D_b)
    print(f"K = H + A'DA + Db:            {t_k*1e3:8.2f} ms  (x2/iter)")

    from fsae_mpc_tpu.ops.pallas import chol as pchol
    pfac = jax.jit(pchol.factor_lanes)
    Lp = pfac(K)
    t_pf = timeit(pfac, K)
    print(f"pallas factor_lanes:          {t_pf*1e3:8.2f} ms  (x1/iter)")
    psol = jax.jit(pchol.solve_lanes)
    rhs0 = jax.random.normal(key, (batch, n), dtype)
    psol(Lp, rhs0)
    t_ps = timeit(psol, Lp, rhs0)
    print(f"pallas solve_lanes:           {t_ps*1e3:8.2f} ms  (x2/iter)")

    chol_j = jax.jit(xl.cholesky_invdiag)
    L, Dinv = chol_j(K)
    t_c = timeit(chol_j, K)
    print(f"cholesky_invdiag:             {t_c*1e3:8.2f} ms  (x1/iter)")

    rhs = jax.random.normal(key, (batch, n), dtype)
    solve_j = jax.jit(xl.cho_solve_invdiag)
    t_s = timeit(solve_j, L, Dinv, rhs)
    print(f"cho_solve_invdiag:            {t_s*1e3:8.2f} ms  (x2/iter)")

    solve_b = jax.jit(lambda *a: ipm.solve_qp_batched(*a, opts))
    r = solve_b(H, g, A, lb, ub, lbA, ubA)
    t_q = timeit(solve_b, H, g, A, lb, ub, lbA, ubA)
    print(f"solve_qp ({opts.max_iters} iters):         {t_q*1e3:8.2f} ms")

    tick = jax.jit(jax.vmap(
        lambda x0, xr, xl_, ul: ltv.ltv_mpc_dynamic(
            x0, xr, track, params, mpc, xl_, ul, opts).u_opt))
    r2 = tick(x0, x_ref, x_lin, u_lin)
    t_t = timeit(tick, x0, x_ref, x_lin, u_lin)
    print(f"full tick:                    {t_t*1e3:8.2f} ms"
          f"  -> {batch/t_t:,.0f} solves/s")
    per_iter = 2 * t_k + t_c + 2 * t_s
    print(f"per-iter est (2K+chol+2solve):{per_iter*1e3:8.2f} ms;"
          f" x{opts.max_iters} = {per_iter*opts.max_iters*1e3:.1f} ms")


if __name__ == "__main__":
    main()
