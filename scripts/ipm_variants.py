"""IPM convergence experiments on saved production QPs (CPU, f64+f32).

Measures control error vs a tight f64 reference at fixed iteration budgets
for solver option variants.  Drives the IPM improvements (equilibration,
Mehrotra start, Gondzio correctors) with production data from
``accuracy_iters.py`` phase 1 (/tmp/acc_qps.npz).
"""

import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from fsae_mpc_tpu.ops import ipm


def main():
    d = np.load("/tmp/acc_qps.npz")
    qp64 = [jnp.asarray(d[k]) for k in ("H", "g", "A", "lb", "ub",
                                        "lbA", "ubA")]
    qp32 = [jnp.asarray(a, jnp.float32) for a in qp64]

    o_ref = ipm.IpmOptions(max_iters=150, tol=1e-12)
    ref = jax.jit(jax.vmap(lambda *a: ipm.solve_qp(*a, o_ref)))(*qp64)
    u_true = np.asarray(ref.x[:, :80])
    print(f"ref: pres {float(ref.primal_res.max()):.1e} "
          f"dres {float(ref.dual_res.max()):.1e}")

    def run(tag, opts, dtype):
        qp = qp32 if dtype == "f32" else qp64
        sol = jax.jit(jax.vmap(lambda *a: ipm.solve_qp(*a, opts)))(*qp)
        err = np.abs(np.asarray(sol.x[:, :80], np.float64) - u_true)
        print(f"{tag:34s} max={err.max():9.2e} mean={err.mean():9.2e} "
              f"p99={np.quantile(err, 0.99):9.2e}")

    variants = [
        ("old", dict(equilibrate=False, init="basic", correctors=0)),
        ("equil", dict(equilibrate=True, init="basic", correctors=0)),
        ("equil+cent", dict(equilibrate=True, init="centered",
                            correctors=0)),
        ("equil+cent+g2", dict(equilibrate=True, init="centered",
                               correctors=2)),
        ("all-but-equil", dict(equilibrate=False, init="centered",
                               correctors=2)),
    ]
    for it in (8, 12, 16):
        for tag, kw in variants:
            run(f"f64 {tag:14s} it={it}",
                ipm.IpmOptions(max_iters=it, tol=1e-14, adaptive=False,
                               **kw), "f64")
            run(f"f32 {tag:14s} it={it}",
                ipm.IpmOptions(max_iters=it, tol=5e-7, reg=1e-7,
                               adaptive=False, freeze=(1e-4, 1e-5, 1e-7),
                               **kw), "f32")
        print()


if __name__ == "__main__":
    main()
