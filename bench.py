"""Benchmark: lo-mode odometry throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the reference maps the Binhai bag at ~1.96x realtime
on a 4-core CPU; at the 10 Hz scan rate that is ~19.6 scans/s. vs_baseline is
our end-to-end odometry scans/s divided by that.
"""

import json
import sys
import time

import numpy as np

BASELINE_FPS = 4020.541 / 2049.108 * 10.0  # Binhai bag, 4-core CPU, 10 Hz scans


def main() -> int:
    t_setup = time.perf_counter()
    from simpleslam_tpu.pipeline import app, simulate as sim
    from simpleslam_tpu.pipeline.streamed import run_streamed
    from simpleslam_tpu.utils.config import Params
    from simpleslam_tpu.utils.logging import Logger
    import logging

    Logger.get_instance().set_level(logging.ERROR)

    n_scans = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    warmup = 15

    Params.load({
        "mode": "lo",
        "backend": {"enable": False},
        "frontend": {"pcr": "loam"},
    })
    world = sim.make_world(seed=0)
    streams = sim.simulate_sequence(world, n_scans=n_scans, seed=0,
                                    n_az=1800, n_el=16)
    system = app.SlamSystem()

    # warmup: compile every kernel in the loop (streamed executor path)
    warm = sim.SensorStreams(
        streams.scan_stamps[:warmup], streams.scans[:warmup],
        streams.gt_poses[:warmup], streams.wheel_stamps[:0],
        streams.wheel_poses[:0], streams.imu_stamps[:0], streams.imu_quats[:0],
    )
    run_streamed(system, warm)

    rest = sim.SensorStreams(
        streams.scan_stamps[warmup:], streams.scans[warmup:],
        streams.gt_poses[warmup:], streams.wheel_stamps[:0],
        streams.wheel_poses[:0], streams.imu_stamps[:0], streams.imu_quats[:0],
    )
    t0 = time.perf_counter()
    result = run_streamed(system, rest)
    dt = time.perf_counter() - t0

    fps = (n_scans - warmup) / dt
    ate = sim.ate_rmse(streams.gt_poses[warmup:], result.poses, align=False)
    print(json.dumps({
        "metric": "odometry_scans_per_sec",
        "value": round(fps, 3),
        "unit": "scans/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "extras": {
            "ate_rmse_m": round(float(ate), 4),
            "n_scans": n_scans - warmup,
            "keyframes": result.keyframe_count,
            "converged_frac": round(result.converged_frac, 3),
            "stage_means_ms": {
                k: round(result.timers.mean(k) * 1e3, 2) for k in result.timers.total
            },
            "setup_s": round(time.perf_counter() - t_setup - dt, 1),
        },
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
