"""Raceline pipeline end-to-end: planner -> obtain_reference -> full lap.

The reference's commented flagship path (``main.m:20-22,115``,
``util/obtain_reference.m:24-48``): plan a minimum-time raceline offline
(dynamic planner, host f64), resample it to a time-parameterised
reference, and track it closed-loop for a FULL lap.  For each track this
records the tracked lap alongside the speed-ramp lap of the same
controller -- does tracking the min-time raceline beat the ramp? -- plus
the planner's own predicted lap time.

Usage:
    JAX_PLATFORMS=cpu python scripts/raceline_laps.py           # f64 CPU,
                                                                # 3 tracks
    python scripts/raceline_laps.py tpu                         # f32 chip,
                                                                # fsg2019
Writes/merges RACELINE.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

ON_TPU = len(sys.argv) > 1 and sys.argv[1] == "tpu"
if not ON_TPU:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

if not ON_TPU:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
else:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

OUT = "RACELINE.json"


def _merge(key, payload):
    data = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            data = json.load(fh)
    data[key] = payload
    with open(OUT, "w") as fh:
        json.dump(data, fh, indent=1)
    print(f"wrote {OUT}[{key}]", flush=True)


def main():
    import jax.numpy as jnp
    import numpy as np
    from fsae_mpc_tpu.config import MPCParams, MPC_F32, VehicleParams
    from fsae_mpc_tpu.ops import ipm
    from fsae_mpc_tpu.planner import minimum_time_planner_dynamic
    from fsae_mpc_tpu.sim.closed_loop import (SimConfig, simulate,
                                              simulate_timed)
    from fsae_mpc_tpu.track import load_track

    dtype = jnp.float32 if ON_TPU else jnp.float64
    tracks = ["fsg2019"] if ON_TPU else ["fsg2019", "fso2020", "fss2019"]
    mpc = MPC_F32 if ON_TPU else MPCParams()
    opts = ipm.F32_ACCURATE if ON_TPU else ipm.IpmOptions(max_iters=30,
                                                          adaptive=False)
    params = VehicleParams()

    from fsae_mpc_tpu.planner.min_time import PlannerResult
    for name in tracks:
        # the PLANNER always runs host-side f64 (design decision,
        # planner/min_time.py docstring); only its output is cast.  The
        # TPU phase LOADS the plan the CPU phase saved (f64 planning
        # cannot run on the chip).
        cache = f"/tmp/raceline_plan_{name}.npz"
        t0 = time.time()
        if not ON_TPU:
            track64, _ = load_track(f"data/{name}.csv",
                                    dtype=jnp.float64)
            plan = minimum_time_planner_dynamic(track64, params,
                                                n_nodes=160, iters=40)
            np.savez(cache, **{f: np.asarray(getattr(plan, f))
                               for f in ("y_opt", "u_opt", "t_node",
                                         "lap_time", "slack", "merit",
                                         "defect_norm")})
        else:
            z = np.load(cache)
            plan = PlannerResult(**{f: jnp.asarray(z[f], jnp.float64)
                                    if False else jnp.asarray(z[f])
                                    for f in ("y_opt", "u_opt", "t_node",
                                              "lap_time", "slack",
                                              "merit", "defect_norm")})
        plan_wall = time.time() - t0
        t_lap_pred = float(plan.lap_time)
        plan_c = jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a), dtype), plan)

        track, _ = load_track(f"data/{name}.csv", dtype=dtype)
        rows = {}
        for ref in ("raceline", "speed_ramp"):
            for mode in (("ltv",) if ref == "speed_ramp"
                         else ("ltv", "ms-nmpc")):
                cfg = SimConfig(model="dynamic", mode=mode, n_ticks=1000,
                                reference=ref, mpc=mpc, ipm=opts)
                t0 = time.time()
                if ON_TPU:
                    out, timing = simulate_timed(
                        track, params, cfg,
                        plan=plan_c if ref == "raceline" else None)
                else:
                    out = jax.jit(lambda t_, p_: simulate(
                        t_, p_, cfg,
                        plan=plan_c if ref == "raceline" else None))(
                            track, params)
                    jax.block_until_ready(out.lap_time)
                key = f"{ref}/{mode}"
                rows[key] = dict(
                    lap_done=bool(out.lap_done),
                    lap_time=round(float(out.lap_time), 3),
                    track_violation=round(float(out.track_violation), 5),
                    max_track_violation=round(
                        float(out.max_track_violation), 4),
                    tyre_violation=round(float(out.tyre_violation), 5),
                    wall_s=round(time.time() - t0, 1))
                print(name, key, rows[key], flush=True)
        _merge(f"{name}_{'f32_tpu' if ON_TPU else 'f64_cpu'}", {
            "planner_pred_lap_time_s": round(t_lap_pred, 3),
            "planner_wall_s": round(plan_wall, 1),
            "rows": rows,
        })


if __name__ == "__main__":
    main()
