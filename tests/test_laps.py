"""Full-lap integration tests: the reference's only end-to-end check.

``main.m:91-190`` drives a full lap (or 1000 ticks) against the independent
Cartesian-Pacejka plant and reports the metric block (``main.m:196-228``).
These tests assert the flagship artifact directly: the car COMPLETES a lap
on fsg2019 under the LTV controller with bounded track violation, and the
f32 pipeline (compressed soft weights + the accuracy-certified IPM preset)
drives the same lap as the f64 pipeline to sub-percent lap-time agreement.

The full MODE x MODEL x TRACK matrix (incl. MS-NMPC / C-NMPC / HS, all
three tracks) runs offline via scripts/lap_metrics.py; its results are
committed in LAPS.json.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fsae_mpc_tpu.config import MPC_F32, VehicleParams
from fsae_mpc_tpu.ops import ipm
from fsae_mpc_tpu.sim.closed_loop import SimConfig, simulate
from fsae_mpc_tpu.track import load_track

N_TICKS = 700        # > 1 lap at the target speed; reference caps at 1000


def _lap(model, dtype, mpc=None, opts=None, mode="ltv"):
    track, _ = load_track("data/fsg2019.csv", dtype=dtype)
    kw = {}
    if mpc is not None:
        kw["mpc"] = mpc
    cfg = SimConfig(
        model=model, mode=mode, n_ticks=N_TICKS,
        ipm=opts or ipm.IpmOptions(max_iters=30, adaptive=False), **kw)
    return jax.jit(lambda t, p: simulate(t, p, cfg))(track, VehicleParams())


@pytest.mark.parametrize("model", ["kinematic", "dynamic"])
def test_full_lap_ltv(model):
    """LTV-MPC completes a lap of fsg2019 with bounded violations (f64,
    reference weights; ``main.m:102-104`` lap termination)."""
    out = _lap(model, jnp.float64)
    assert bool(out.lap_done), "car never completed the lap"
    lap_time = float(out.lap_time)
    assert 15.0 < lap_time < 45.0, f"implausible lap time {lap_time}"
    assert float(out.track_violation) < 0.05    # integrated (|n|-0.75)+ dt
    assert float(out.max_track_violation) < 0.25
    assert float(out.abnormal_exit_frac) < 0.05
    # the plant must actually reach racing speed
    v = np.asarray(out.x_history[:, 3])
    assert v.max() > 12.0


def test_f32_closed_loop_equivalence():
    """The f32 pipeline (MPC_F32 weights + F32_ACCURATE preset) drives the
    same lap as the f64 pipeline with the same weights: this is the
    closed-loop form of the BASELINE accuracy criterion (the pointwise QP
    vector match is ill-posed at 1e-3 -- see tests/test_f32_accuracy.py)."""
    out64 = _lap("dynamic", jnp.float64, mpc=MPC_F32)
    out32 = _lap("dynamic", jnp.float32, mpc=MPC_F32, opts=ipm.F32_ACCURATE)
    assert bool(out64.lap_done) and bool(out32.lap_done)
    t64, t32 = float(out64.lap_time), float(out32.lap_time)
    assert abs(t64 - t32) <= 0.20, f"lap times diverged: {t64} vs {t32}"
    assert float(out32.track_violation) < 0.02
    assert float(out32.tyre_violation) < float(out64.tyre_violation) + 0.05
