"""Friction-ellipse utilisation sweep for the dynamic min-time planner.

VERDICT round 4: the planner hard-capped friction utilisation at 0.75
where the reference imposes the FULL ellipse softened by slacks
(``dynamic_minimum_time_planner.m:158-168``), costing ~40% of predicted
lap time.  This sweeps utilisation in {0.75, 0.85, 0.95, 1.0} on
fsg2019: for each cap it plans (host f64), records the predicted lap
time + planner slacks, then tracks the raceline closed-loop (dynamic
LTV) and records the tracked lap + violations next to the speed-ramp
lap of the same controller.

Writes RACELINE_SWEEP.json.  Run: JAX_PLATFORMS=cpu python
scripts/raceline_sweep.py
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    import jax.numpy as jnp
    import numpy as np
    from fsae_mpc_tpu.config import MPCParams, VehicleParams
    from fsae_mpc_tpu.ops import ipm
    from fsae_mpc_tpu.planner import minimum_time_planner_dynamic
    from fsae_mpc_tpu.sim.closed_loop import SimConfig, simulate
    from fsae_mpc_tpu.track import load_track

    params = VehicleParams()
    mpc = MPCParams()
    opts = ipm.IpmOptions(max_iters=30, adaptive=False)
    track, _ = load_track("data/fsg2019.csv", dtype=jnp.float64)

    out = {"track": "fsg2019", "regime": "f64 CPU, planner n_nodes=160 "
           "iters=40, tracked by dynamic-LTV closed loop", "rows": []}

    # the ramp baseline the raceline must beat
    cfg_ramp = SimConfig(model="dynamic", mode="ltv", n_ticks=1000,
                         reference="speed_ramp", mpc=mpc, ipm=opts)
    ramp = jax.jit(lambda t_, p_: simulate(t_, p_, cfg_ramp))(track, params)
    jax.block_until_ready(ramp.lap_time)
    out["speed_ramp"] = {
        "lap_time": round(float(ramp.lap_time), 3),
        "track_violation": round(float(ramp.track_violation), 5),
        "tyre_violation": round(float(ramp.tyre_violation), 5),
    }
    print("ramp", out["speed_ramp"], flush=True)

    for util in (0.75, 0.85, 0.95, 1.0):
        t0 = time.time()
        plan = minimum_time_planner_dynamic(track, params, n_nodes=160,
                                            iters=40, friction_util=util)
        cfg = SimConfig(model="dynamic", mode="ltv", n_ticks=1000,
                        reference="raceline", mpc=mpc, ipm=opts)
        sim = jax.jit(lambda t_, p_, pl: simulate(t_, p_, cfg, plan=pl))(
            track, params, plan)
        jax.block_until_ready(sim.lap_time)
        row = {
            "friction_util": util,
            "pred_lap_time": round(float(plan.lap_time), 3),
            "planner_slack_track": float(plan.slack[0]),
            "planner_slack_tyre": float(plan.slack[1]),
            "planner_defect_norm": float(plan.defect_norm),
            "tracked_lap_done": bool(sim.lap_done),
            "tracked_lap_time": round(float(sim.lap_time), 3),
            "track_violation": round(float(sim.track_violation), 5),
            "max_track_violation": round(float(sim.max_track_violation), 4),
            "tyre_violation": round(float(sim.tyre_violation), 5),
            "max_tyre_violation": round(float(sim.max_tyre_violation), 4),
            "wall_s": round(time.time() - t0, 1),
        }
        out["rows"].append(row)
        print(row, flush=True)

    with open("RACELINE_SWEEP.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote RACELINE_SWEEP.json")


if __name__ == "__main__":
    main()
