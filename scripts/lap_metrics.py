"""Full-lap metric matrix: the repo's analogue of the reference's printf
block (``main.m:196-228``).

Runs lap-terminated closed-loop simulations for every MODE x MODEL x TRACK
combination the reference driver supports (``main.m:25-27``):

    {LTV-MPC, MS-NMPC, C-NMPC} x {KINEMATIC, DYNAMIC} x
    {fsg2019, fso2020, fss2019}

plus the HS-collocation kinematic variant, and records lap time, track /
tyre violations, slack activation, solver statistics, and per-tick solve
wall-time percentiles (``main.m:206-208,219-221``) to ``LAPS.json`` /
``LAPS_TPU.json`` and a markdown table on stdout.

Usage:
    JAX_PLATFORMS=cpu python scripts/lap_metrics.py            # f64 matrix
    JAX_PLATFORMS=cpu python scripts/lap_metrics.py f32        # f32 repeat
                                                               # (fsg2019)
    python scripts/lap_metrics.py tpu                          # f32 matrix
                                                               # ON THE CHIP
                                                               # -> LAPS_TPU.json

The CPU matrix uses the scanned simulator (one jit of the whole lap); the
TPU matrix uses the host-stepped :func:`simulate_timed` driver -- one
compiled tick dispatched per control period, which (a) keeps the tunnel
compile small, (b) allows early exit at the finish line, and (c) yields the
reference's per-solve timing metrics.  Tick times on the tunnel backend
include the ~13 ms host round trip; scripts/latency_bench.py isolates the
solve itself.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import os

ON_TPU = len(sys.argv) > 1 and sys.argv[1] == "tpu"
if not ON_TPU:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

if not ON_TPU:
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np

N_TICKS = 1000     # the reference's cap (main.m:62); fso2020 (385 m) needs
                   # ~900 ticks under the slower kinematic controller


def _flush_row(row, path):
    """Incrementally merge one finished row into the artifact so a
    timeout/crash late in a long matrix run loses nothing."""
    existing = []
    if os.path.exists(path):
        with open(path) as fh:
            existing = json.load(fh)
    key = lambda r: (r["track"], r["mode"], r["model"], r["dtype"])
    existing = [r for r in existing if key(r) != key(row)]
    with open(path, "w") as fh:
        json.dump(existing + [row], fh, indent=1)


def run_matrix(f32: bool = False, timed: bool = False, path=None):
    import jax.numpy as jnp
    from fsae_mpc_tpu.config import MPCParams, MPC_F32, VehicleParams
    from fsae_mpc_tpu.ops import ipm
    from fsae_mpc_tpu.sim.closed_loop import (SimConfig, simulate,
                                              simulate_timed)
    from fsae_mpc_tpu.track import load_track

    if not ON_TPU:
        jax.config.update("jax_enable_x64", not f32)
    dtype = jnp.float32 if f32 else jnp.float64

    tracks = ["fsg2019", "fso2020", "fss2019"]
    if f32 and not ON_TPU:
        tracks = ["fsg2019"]
    only = os.environ.get("LAP_TRACKS")
    if only:
        tracks = [t for t in tracks if t in only.split(",")]
    configs = [
        ("ltv", "kinematic", {}),
        ("ltv", "dynamic", {}),
        ("ms-nmpc", "kinematic", {}),
        ("ms-nmpc", "dynamic", {}),
        ("c-nmpc", "kinematic", {}),
        ("c-nmpc", "dynamic", {}),
        ("c-nmpc", "kinematic", {"transcription": "hs"}),
        ("ms-nmpc", "kinematic", {"stepper": "euler"}),
        ("ms-nmpc", "kinematic", {"stepper": "rk4"}),
    ]
    only_modes = os.environ.get("LAP_MODES")
    if only_modes:
        configs = [c for c in configs if c[0] in only_modes.split(",")]

    if f32:
        mpc = MPC_F32
        opts = ipm.F32_ACCURATE
    else:
        mpc = MPCParams()
        opts = ipm.IpmOptions(max_iters=30, adaptive=False)

    params = VehicleParams()
    rows = []
    for track_name in tracks:
        track, _ = load_track(f"data/{track_name}.csv", dtype=dtype)
        for mode, model, extra in configs:
            tag = mode + ("" if not extra else
                          "/" + "/".join(f"{v}" for v in extra.values()))
            cfg = SimConfig(model=model, mode=mode, n_ticks=N_TICKS,
                            mpc=mpc, ipm=opts, **extra)
            t0 = time.time()
            timing = None
            if timed:
                out, timing = simulate_timed(track, params, cfg)
            else:
                out = jax.jit(lambda t, p: simulate(t, p, cfg))(track, params)
                jax.block_until_ready(out.lap_time)
            wall = time.time() - t0
            row = dict(
                track=track_name, mode=tag, model=model,
                dtype="f32" if f32 else "f64",
                lap_done=bool(out.lap_done),
                lap_time=round(float(out.lap_time), 3),
                track_violation=round(float(out.track_violation), 5),
                max_track_violation=round(float(out.max_track_violation), 4),
                tyre_violation=round(float(out.tyre_violation), 5),
                max_tyre_violation=round(float(out.max_tyre_violation), 4),
                mean_objective=round(float(out.mean_objective), 2),
                abnormal_exit_frac=round(float(out.abnormal_exit_frac), 4),
                slack_n_frac=round(float(out.slack_n_frac), 4),
                slack_tyre_frac=round(float(out.slack_tyre_frac), 4),
                mean_iters=round(float(out.mean_iters), 2),
                max_iters=int(out.max_iters),
                wall_s=round(wall, 1),
            )
            if timing is not None:
                row.update(
                    tick_time_mean_s=round(timing["tick_time_mean_s"], 5),
                    tick_time_median_s=round(timing["tick_time_median_s"], 5),
                    tick_time_p99_s=round(timing["tick_time_p99_s"], 5),
                    tick_time_max_s=round(timing["tick_time_max_s"], 5),
                )
            rows.append(row)
            if path:
                _flush_row(row, path)
            extra_t = ""
            if timing is not None:
                extra_t = (f" tick p99={timing['tick_time_p99_s']*1e3:.1f}ms"
                           f"/{cfg.mpc.dt*1e3:.0f}ms")
            print(f"{track_name:8s} {tag:18s} {model:9s} "
                  f"lap_done={row['lap_done']} t={row['lap_time']:7.2f}s "
                  f"tv={row['track_violation']:.4f} "
                  f"fe={row['tyre_violation']:.4f} "
                  f"slack_n={row['slack_n_frac']:.2%} "
                  f"wall={wall:.0f}s" + extra_t, flush=True)
    return rows


def main():
    f32 = ON_TPU or (len(sys.argv) > 1 and sys.argv[1] == "f32")
    path = "LAPS_TPU.json" if ON_TPU else "LAPS.json"
    rows = run_matrix(f32, timed=ON_TPU, path=path)
    print(f"wrote {path} ({len(rows)} rows this run)")


if __name__ == "__main__":
    main()
