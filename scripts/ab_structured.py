"""A/B: structured (StageRows) vs dense constraint path, on the chip.

Measures warm-started receding-horizon throughput of the dynamic LTV tick
(the bench.py regime) for both assembly paths at batch {128, 1024} and
writes AB_STRUCTURED.json.  This is the measurement that was missing when
round 2 flipped ``structured=True`` on as the default without benching it
(the flip halved throughput; see VERDICT.md round 2).

Run:  python scripts/ab_structured.py        (needs the TPU chip)
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

from fsae_mpc_tpu.config import MPC_F32, MPCParams, VehicleParams
from fsae_mpc_tpu.mpc import ltv
from fsae_mpc_tpu.models import curvilinear as cm, integrators
from fsae_mpc_tpu.ops import ipm
from fsae_mpc_tpu.track import load_track


def measure(structured: bool, batch: int, n_rep: int = 10,
            condense: str = "scan") -> float:
    on_tpu = jax.default_backend() != "cpu"
    dtype = jnp.float32 if on_tpu else jnp.float64
    mpc = MPC_F32 if on_tpu else MPCParams()
    opts = (ipm.F32_OPTS if on_tpu
            else ipm.IpmOptions(max_iters=16, adaptive=False))
    track, _ = load_track("data/fsg2019.csv", dtype=dtype)
    params = VehicleParams()
    N = mpc.n_steps

    f = lambda x, u: cm.f_curv_dyn_only(x, u, track, params)
    step = lambda x, u: integrators.rk4_step(f, x, u, mpc.dt)

    def make_ref(x0):
        v = jnp.minimum(x0[3] + 10.0 * mpc.dt
                        * jnp.arange(1, N + 1, dtype=dtype), 20.0)
        return (jnp.zeros((N, 7), dtype).at[:, 3].set(v)
                .at[:, 0].set(x0[0] + jnp.cumsum(v * mpc.dt)))

    def tick(carry):
        x0, x_lin, u_lin, warm = carry
        x_ref = jax.vmap(make_ref)(x0)
        res = jax.vmap(
            lambda a, b, c, d, w: ltv.ltv_mpc_dynamic(
                a, b, track, params, mpc, c, d, opts, warm=w,
                structured=structured, condense=condense)
        )(x0, x_ref, x_lin, u_lin, warm)
        x0_next = jax.vmap(step)(x0, res.u_opt[:, 0])
        return (x0_next, res.x_opt, res.u_opt, res.qp), res.u_opt[:, 0]

    tick_j = jax.jit(tick)

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
                a, b, track, params, mpc, c, d, opts,
                structured=structured, condense=condense)
        )(x0b, x_ref, x_linb, u_linb)

    args0 = [jnp.asarray(a, dtype) for a in (x0, x_lin, u_lin)]
    res0 = jax.jit(cold)(*args0)
    carry = (args0[0], res0.x_opt, res0.u_opt, res0.qp)

    carry, u = tick_j(carry)
    jax.block_until_ready(u)

    t0 = time.perf_counter()
    for _ in range(n_rep):
        carry, u = tick_j(carry)
    jax.block_until_ready(u)
    dt_run = (time.perf_counter() - t0) / n_rep
    assert np.all(np.isfinite(np.asarray(u))), "non-finite controls"
    return batch / dt_run


def main():
    out = {"backend": jax.default_backend(),
           "regime": "warm receding-horizon dynamic LTV, N=40, F32_OPTS",
           "results": []}
    # (structured, condense): the two assembly-path switches of the tick.
    configs = [(False, "scan"), (False, "dnc"), (True, "scan")]
    for batch in (128, 1024):
        for structured, condense in configs:
            sps = measure(structured, batch, condense=condense)
            row = {"batch": batch, "structured": structured,
                   "condense": condense,
                   "solves_per_sec": round(sps, 1),
                   "ms_per_tick": round(batch / sps * 1e3, 3)}
            out["results"].append(row)
            print(row, flush=True)
    with open("AB_STRUCTURED.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote AB_STRUCTURED.json")


if __name__ == "__main__":
    main()
