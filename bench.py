"""Benchmark: end-to-end mapping throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline is the HONEST configuration: full mapping with the pose-graph
backend and loop-closure manager enabled — the reference's published
mapping-time numbers include GTSAM + the map/LC threads
(/root/reference/app/main.cpp:176-206 times the whole pipeline). Extras
report the lo-only (backend off) and lio-mode (EKF fusion) rates too.

Baseline (BASELINE.md): the reference maps the Binhai bag at ~1.96x realtime
on a 4-core CPU; at the 10 Hz scan rate that is ~19.6 scans/s. vs_baseline is
our full-mapping scans/s divided by that.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_FPS = 4020.541 / 2049.108 * 10.0  # Binhai bag, 4-core CPU, 10 Hz scans


def _subseq(streams, sim, lo, hi):
    sl = slice(lo, hi)
    if len(streams.wheel_stamps):
        lo_t = streams.scan_stamps[lo] - 0.15
        hi_t = streams.scan_stamps[hi - 1] + 0.15 if hi is not None else np.inf
        wsel = (streams.wheel_stamps >= lo_t) & (streams.wheel_stamps < hi_t)
        isel = (streams.imu_stamps >= lo_t) & (streams.imu_stamps < hi_t)
    else:
        wsel = isel = slice(0, 0)
    return sim.SensorStreams(
        streams.scan_stamps[sl], streams.scans[sl], streams.gt_poses[sl],
        streams.wheel_stamps[wsel], streams.wheel_poses[wsel],
        streams.imu_stamps[isel], streams.imu_quats[isel])


def run_config(name, cfg, streams, sim, app, run_streamed, warmup):
    from simpleslam_tpu.utils.config import Params

    n = len(streams.scan_stamps)
    sync_every = int(os.environ.get("SIMPLESLAM_SYNC_EVERY", "16"))
    Params.load(cfg)
    system = app.SlamSystem()
    run_streamed(system, _subseq(streams, sim, 0, warmup),
                 sync_every=sync_every)
    rest = _subseq(streams, sim, warmup, None)
    t0 = time.perf_counter()
    result = run_streamed(system, rest, sync_every=sync_every)
    dt = time.perf_counter() - t0
    fps = (n - warmup) / dt
    ate = sim.ate_rmse(streams.gt_poses[warmup:], result.poses, align=False)
    return {
        "scans_per_sec": round(fps, 3),
        "ate_rmse_m": round(float(ate), 4),
        "n_scans": n - warmup,
        "keyframes": result.keyframe_count,
        "converged_frac": round(result.converged_frac, 3),
        "stage_means_ms": {
            k: round(result.timers.mean(k) * 1e3, 2) for k in result.timers.total
        },
    }


def main() -> int:
    t_setup = time.perf_counter()
    from simpleslam_tpu.pipeline import app, simulate as sim
    from simpleslam_tpu.pipeline.streamed import run_streamed
    from simpleslam_tpu.utils.logging import Logger
    import logging

    Logger.get_instance().set_level(logging.ERROR)

    n_scans = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    warmup = 15

    world = sim.make_world(seed=0)
    streams = sim.simulate_sequence(world, n_scans=n_scans, seed=0,
                                    n_az=1800, n_el=16)

    results = {}
    results["full"] = run_config(
        "full",
        {"mode": "lo", "backend": {"enable": True, "lc": {"enable": True}},
         "frontend": {"pcr": "loam"}},
        streams, sim, app, run_streamed, warmup)
    results["lo"] = run_config(
        "lo",
        {"mode": "lo", "backend": {"enable": False},
         "frontend": {"pcr": "loam"}},
        streams, sim, app, run_streamed, warmup)
    results["lio"] = run_config(
        "lio",
        {"mode": "lio", "backend": {"enable": True, "lc": {"enable": False}},
         "frontend": {"pcr": "loam"}},
        streams, sim, app, run_streamed, warmup)

    fps = results["full"]["scans_per_sec"]
    print(json.dumps({
        "metric": "full_mapping_scans_per_sec",
        "value": fps,
        "unit": "scans/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "extras": {
            **{k: v for k, v in results.items()},
            "setup_s": round(time.perf_counter() - t_setup, 1),
        },
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
