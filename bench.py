"""Benchmark: MPC solves/sec on one chip (dynamic-model LTV-MPC, N=40).

Headline metric from BASELINE.md: >= 10,000 MPC solves/sec/chip at N=40
(reference defines only the 20 Hz real-time budget; it has no published
numbers).  ``vs_baseline`` is value / 10,000.

Prints exactly one JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
"""

import json
import sys
import time

import numpy as np

BASELINE_SOLVES_PER_SEC = 10_000.0


def main():
    import jax
    import jax.numpy as jnp

    from fsae_mpc_tpu.config import MPCParams, VehicleParams
    from fsae_mpc_tpu.mpc import ltv
    from fsae_mpc_tpu.ops import ipm
    from fsae_mpc_tpu.track import load_track

    on_tpu = jax.default_backend() != "cpu"
    dtype = jnp.float32 if on_tpu else jnp.float64
    batch = 512 if on_tpu else 32

    mpc = MPCParams(n_steps=40)
    # fixed-iteration f32 solve: deterministic latency, fully batched
    opts = ipm.IpmOptions(max_iters=18, adaptive=False,
                          reg=1e-7 if on_tpu else 1e-9,
                          tol=5e-7 if on_tpu else 1e-12)
    track, _ = load_track("data/fsg2019.csv", dtype=dtype)
    params = VehicleParams()

    N = mpc.n_steps
    rng = np.random.default_rng(0)
    t = mpc.dt * np.arange(1, N + 1)
    x_ref = np.zeros((batch, N, 7))
    x_ref[:, :, 3] = np.minimum(8.0 + 10.0 * t, 20.0)
    x_ref[:, :, 0] = np.cumsum(x_ref[:, :, 3] * mpc.dt, axis=1)
    x_lin = np.zeros((batch, N, 7))
    x_lin[:, :, 0] = 8.0 * t
    x_lin[:, :, 3] = 8.0
    u_lin = np.zeros((batch, N, 2))
    x0 = np.zeros((batch, 7))
    x0[:, 1] = rng.uniform(-0.2, 0.2, batch)
    x0[:, 2] = rng.uniform(-0.05, 0.05, batch)
    x0[:, 3] = 8.0
    x0[:, 0] = rng.uniform(0.0, 100.0, batch)

    def one(x0, x_ref, x_lin, u_lin):
        res = ltv.ltv_mpc_dynamic(x0, x_ref, track, params, mpc, x_lin,
                                  u_lin, opts)
        return res.u_opt

    fn = jax.jit(jax.vmap(one))
    args = [jnp.asarray(a, dtype) for a in (x0, x_ref, x_lin, u_lin)]

    out = fn(*args)
    out.block_until_ready()  # compile

    # steady-state timing
    n_rep = 10 if on_tpu else 3
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = fn(*args)
    out.block_until_ready()
    dt_run = (time.perf_counter() - t0) / n_rep

    if not np.all(np.isfinite(np.asarray(out))):
        print(json.dumps({"metric": "mpc_solves_per_sec",
                          "value": 0.0, "unit": "solves/s",
                          "vs_baseline": 0.0, "error": "non-finite output"}))
        return

    solves_per_sec = batch / dt_run
    print(json.dumps({
        "metric": "mpc_solves_per_sec",
        "value": round(solves_per_sec, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_sec / BASELINE_SOLVES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
