"""Marginal per-iteration cost of solve_qp on TPU, by chol variant.

Times the FULL jitted solve at several iteration budgets; the slope is the
true in-context per-iteration cost (isolated-component timings overstate it
because XLA fuses across the loop body).  Run on the realistic dynamic-LTV
QPs saved by ``accuracy_iters.py`` (falls back to synthetic if absent).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from fsae_mpc_tpu.ops import ipm


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
    try:
        d = np.load("/tmp/acc_qps.npz")
        qp = [jnp.asarray(np.tile(d[k], (32,) + (1,) * (d[k].ndim - 1)),
                          dtype)
              for k in ("H", "g", "A", "lb", "ub", "lbA", "ubA")]
        print("using saved QPs (tiled to", qp[0].shape[0], ")")
    except Exception:
        key = jax.random.key(0)
        b, n, m = 1024, 84, 800
        M = jax.random.normal(key, (b, n, n), dtype)
        H = M @ jnp.swapaxes(M, -1, -2) + n * jnp.eye(n, dtype=dtype)
        g = jax.random.normal(jax.random.key(1), (b, n), dtype)
        A = jax.random.normal(jax.random.key(2), (b, m, n), dtype)
        qp = [H, g, A, -jnp.ones((b, n)), jnp.ones((b, n)),
              -2 * jnp.ones((b, m)), 2 * jnp.ones((b, m))]
        print("using synthetic QPs")

    batch = qp[0].shape[0]
    for chol in ("pallas", "blocked"):
        ts = {}
        for iters in (4, 8, 12):
            o = ipm.IpmOptions(max_iters=iters, tol=5e-7, reg=1e-7,
                               adaptive=False, freeze=(1e-4, 1e-5, 1e-7),
                               chol=chol)
            f = jax.jit(jax.vmap(lambda *a: ipm.solve_qp(*a, o)))
            ts[iters] = timeit(lambda: f(*qp).x)
        slope = (ts[12] - ts[4]) / 8.0
        fixed = ts[4] - 4 * slope
        print(f"chol={chol:8s} t(4)={ts[4]*1e3:7.2f} t(8)={ts[8]*1e3:7.2f} "
              f"t(12)={ts[12]*1e3:7.2f} ms  per-iter={slope*1e3:6.2f} ms  "
              f"fixed={fixed*1e3:6.2f} ms  ({batch} instances)")


if __name__ == "__main__":
    main()
