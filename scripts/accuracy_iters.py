"""f32 IPM iteration budget vs control accuracy, on realistic warm ticks.

Generates warm-started receding-horizon QPs exactly as ``bench.py`` does
(dynamic LTV, N=40), solves them in f64 with the native C++ active-set
oracle (ground truth), then measures the f32 TPU IPM control error at
several ``max_iters`` budgets.  The BASELINE accuracy bar is 1e-3 on the
control sequence; the first control (the one actually applied) matters most.
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from fsae_mpc_tpu.config import MPC_F32, VehicleParams
from fsae_mpc_tpu.mpc import constraints as cons, ltv
from fsae_mpc_tpu.models import curvilinear as cm, integrators
from fsae_mpc_tpu.ops import ipm
from fsae_mpc_tpu.runtime import native_lib
from fsae_mpc_tpu.track import load_track


def main():
    dtype = jnp.float32
    batch = 32
    n_ticks = 5
    mpc = MPC_F32
    track, _ = load_track("data/fsg2019.csv", dtype=dtype)
    params = VehicleParams()
    N = mpc.n_steps
    opts = ipm.F32_OPTS

    f = lambda x, u: cm.f_curv_dyn_only(x, u, track, params)
    step = lambda x, u: integrators.rk4_step(f, x, u, mpc.dt)

    def make_ref(x0):
        v = jnp.minimum(x0[3] + 10.0 * mpc.dt
                        * jnp.arange(1, N + 1, dtype=dtype), 20.0)
        return (jnp.zeros((N, 7), dtype).at[:, 3].set(v)
                .at[:, 0].set(x0[0] + jnp.cumsum(v * mpc.dt)))

    def assemble(x0, x_ref, x_lin, u_lin):
        Ad, Bd, dd = integrators.linearize_discrete(step, x_lin, u_lin)
        from fsae_mpc_tpu.ops.condense import condense as _c
        A_bar, B_bar, d_bar = _c(Ad, Bd, dd)
        q = jnp.asarray([mpc.q_s, mpc.q_n, mpc.q_mu, 0, 0, 0, 0], dtype)
        q_diag = jnp.concatenate([jnp.tile(q, N - 1),
                                  q * mpc.q_terminal_scale])
        r_diag = jnp.tile(jnp.asarray([mpc.r_a, mpc.r_delta_d], dtype), N)
        groups = [
            cons.state_box_group([3, 6], np.array([0.0, -mpc.delta_max]),
                                 np.array([np.inf, mpc.delta_max]),
                                 np.array([-1, -1]), x_lin, u_lin),
            cons.state_box_group([1], np.array([-mpc.n_max]),
                                 np.array([mpc.n_max]), np.array([0]),
                                 x_lin, u_lin),
            cons.dynamic_slip_group(x_lin, u_lin, mpc, params, 1, 2),
            cons.friction_polygon_group(x_lin, u_lin, mpc, params, 3),
        ]
        u_lb, u_ub = ltv._control_bounds(mpc, N, dtype)
        return ltv.assemble_condensed_qp(
            A_bar, B_bar, d_bar, x0, x_ref, q_diag, r_diag,
            [mpc.w_track, mpc.w_slip, mpc.w_slip, mpc.w_tyre],
            groups, u_lb, u_ub)

    def tick(carry):
        x0, x_lin, u_lin, warm = carry
        x_ref = jax.vmap(make_ref)(x0)
        res = jax.vmap(
            lambda a, b, c, d, w: ltv.ltv_mpc_dynamic(
                a, b, track, params, mpc, c, d, opts, warm=w)
        )(x0, x_ref, x_lin, u_lin, warm)
        x0_next = jax.vmap(step)(x0, res.u_opt[:, 0])
        return (x0_next, res.x_opt, res.u_opt, res.qp)

    rng = np.random.default_rng(0)
    t = mpc.dt * np.arange(1, N + 1)
    x_lin = np.zeros((batch, N, 7))
    x_lin[:, :, 0] = 8.0 * t
    x_lin[:, :, 3] = 8.0
    u_lin = np.zeros((batch, N, 2))
    x0 = np.zeros((batch, 7))
    x0[:, 0] = rng.uniform(0.0, 100.0, batch)
    x0[:, 1] = rng.uniform(-0.2, 0.2, batch)
    x0[:, 3] = 8.0

    def cold(x0b, x_linb, u_linb):
        x_ref = jax.vmap(make_ref)(x0b)
        return jax.vmap(
            lambda a, b, c, d: ltv.ltv_mpc_dynamic(
                a, b, track, params, mpc, c, d, opts)
        )(x0b, x_ref, x_linb, u_linb)

    args0 = [jnp.asarray(a, dtype) for a in (x0, x_lin, u_lin)]
    res0 = jax.jit(cold)(*args0)
    carry = (args0[0], res0.x_opt, res0.u_opt, res0.qp)
    tick_j = jax.jit(tick)
    for _ in range(n_ticks):
        carry = tick_j(carry)
    x0_t, x_lin_t, u_lin_t, warm = carry
    x_ref_t = jax.jit(jax.vmap(make_ref))(x0_t)

    x0_np = np.asarray(x0_t)
    print(f"plant states after {n_ticks} ticks: "
          f"v in [{x0_np[:, 3].min():.2f}, {x0_np[:, 3].max():.2f}], "
          f"|n| max {np.abs(x0_np[:, 1]).max():.3f}, "
          f"|mu| max {np.abs(x0_np[:, 2]).max():.3f}")

    qp = jax.jit(jax.vmap(assemble))(x0_t, x_ref_t, x_lin_t, u_lin_t)
    H, g, A, lb, ub, lbA, ubA, const = [np.asarray(a, np.float64) for a in qp]

    # ---- f32 IPM at several iteration budgets, warm and cold --------------
    sols = {}
    for iters in (8, 12, 16, 20):
        o = ipm.IpmOptions(max_iters=iters, tol=opts.tol, reg=opts.reg,
                           adaptive=False, freeze=opts.freeze)
        qpd = [jnp.asarray(a, dtype) for a in (H, g, A, lb, ub, lbA, ubA)]
        sol_w = jax.jit(jax.vmap(
            lambda h, gg, aa, l, u, la, ua, w: ipm.solve_qp(
                h, gg, aa, l, u, la, ua, o, warm=w)))(*qpd, warm)
        sol_c = jax.jit(jax.vmap(
            lambda *a: ipm.solve_qp(*a, o)))(*qpd)
        sols[f"warm{iters}"] = np.asarray(sol_w.x, np.float64)
        sols[f"cold{iters}"] = np.asarray(sol_c.x, np.float64)

    np.savez("/tmp/acc_qps.npz", H=H, g=g, A=A, lb=lb, ub=ub, lbA=lbA,
             ubA=ubA, **{f"x_{k}": v for k, v in sols.items()})
    print("saved /tmp/acc_qps.npz; run `JAX_PLATFORMS=cpu python "
          "scripts/accuracy_iters.py check` for the f64 comparison")


def check():
    """CPU f64 phase: tight-tolerance reference solve + error table."""
    # the container pins JAX_PLATFORMS=axon; env alone is not enough
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    d = np.load("/tmp/acc_qps.npz")
    H, g, A, lb, ub, lbA, ubA = (d[k] for k in
                                 ("H", "g", "A", "lb", "ub", "lbA", "ubA"))
    batch, n = g.shape
    N2 = 80
    o = ipm.IpmOptions(max_iters=100, tol=1e-12)
    ref = jax.jit(jax.vmap(lambda *a: ipm.solve_qp(*a, o)))(
        *[jnp.asarray(a) for a in (H, g, A, lb, ub, lbA, ubA)])
    u_true = np.asarray(ref.x[:, :N2])
    print(f"f64 reference: max primal res {float(ref.primal_res.max()):.2e}, "
          f"max dual res {float(ref.dual_res.max()):.2e}")

    # cross-check a few instances against the native active-set oracle
    if native_lib.native_available():
        errs = []
        for i in range(min(4, batch)):
            x_as, _, status = native_lib.qp_solve_activeset(
                H[i], g[i], A[i], lb[i], ub[i], lbA[i], ubA[i],
                max_iter=5000)
            if status == 0:
                errs.append(np.abs(x_as[:N2] - u_true[i]).max())
        print(f"oracle cross-check ({len(errs)} clean): "
              + (f"max|du|={max(errs):.2e}" if errs else "none solved"))

    for k in sorted(s[2:] for s in d.files if s.startswith("x_")):
        u = d[f"x_{k}"][:, :N2]
        err = np.abs(u - u_true)
        print(f"{k:8s}  max|du|={err.max():.2e}  "
              f"mean|du|={err.mean():.2e}  max|du_0|={err[:, :2].max():.2e}  "
              f"p99|du|={np.quantile(err, 0.99):.2e}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "check":
        check()
    else:
        main()
