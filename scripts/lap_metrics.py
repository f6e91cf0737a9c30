"""Full-lap metric matrix: the repo's analogue of the reference's printf
block (``main.m:196-228``).

Runs lap-terminated closed-loop simulations for every MODE x MODEL x TRACK
combination the reference driver supports (``main.m:25-27``):

    {LTV-MPC, MS-NMPC, C-NMPC} x {KINEMATIC, DYNAMIC} x
    {fsg2019, fso2020, fss2019}

plus the HS-collocation kinematic variant, and records lap time, track /
tyre violations, slack activation and solver statistics to ``LAPS.json``
and a markdown table on stdout.

Usage:
    JAX_PLATFORMS=cpu python scripts/lap_metrics.py            # f64 matrix
    JAX_PLATFORMS=cpu python scripts/lap_metrics.py f32        # f32 repeat
                                                               # (fsg2019)
"""

import json
import sys
import time

sys.path.insert(0, ".")

import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

N_TICKS = 1000     # the reference's cap (main.m:62); fso2020 (385 m) needs
                   # ~900 ticks under the slower kinematic controller


def run_matrix(f32: bool = False):
    import jax.numpy as jnp
    from fsae_mpc_tpu.config import MPCParams, MPC_F32, VehicleParams
    from fsae_mpc_tpu.ops import ipm
    from fsae_mpc_tpu.sim.closed_loop import SimConfig, simulate
    from fsae_mpc_tpu.track import load_track

    jax.config.update("jax_enable_x64", not f32)
    dtype = jnp.float32 if f32 else jnp.float64

    tracks = ["fsg2019", "fso2020", "fss2019"] if not f32 else ["fsg2019"]
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
                wall_s=round(wall, 1),
            )
            rows.append(row)
            print(f"{track_name:8s} {tag:18s} {model:9s} "
                  f"lap_done={row['lap_done']} t={row['lap_time']:7.2f}s "
                  f"tv={row['track_violation']:.4f} "
                  f"fe={row['tyre_violation']:.4f} "
                  f"slack_n={row['slack_n_frac']:.2%} "
                  f"wall={wall:.0f}s", flush=True)
    return rows


def main():
    f32 = len(sys.argv) > 1 and sys.argv[1] == "f32"
    rows = run_matrix(f32)
    path = "LAPS.json"
    existing = []
    if os.path.exists(path):
        with open(path) as fh:
            existing = json.load(fh)
        key = lambda r: (r["track"], r["mode"], r["model"], r["dtype"])
        new = {key(r) for r in rows}
        existing = [r for r in existing if key(r) not in new]
    with open(path, "w") as fh:
        json.dump(existing + rows, fh, indent=1)
    print(f"wrote {path} ({len(existing + rows)} rows)")


if __name__ == "__main__":
    main()
