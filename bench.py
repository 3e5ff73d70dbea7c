"""Benchmark: end-to-end mapping throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline is the HONEST configuration: full mapping with the pose-graph
backend and loop-closure manager enabled — the reference's published
mapping-time numbers include GTSAM + the map/LC threads
(/root/reference/app/main.cpp:176-206 times the whole pipeline). Extras
report the lo-only (backend off) and lio-mode (EKF fusion) rates too.

Per-config extras carry the device-utilization breakdown the TPU build is
accountable for (the tictoc discipline of common/time/tictoc.hpp applied at
the device boundary): a sync-mode probe measures per-batch device-pipeline
time (device_exec); the throughput run splits the old opaque "fetch" into
fetch_wait (device time not hidden by host work) and fetch_xfer (link
transfer); device_busy_frac = probe device time x batches / wall; and an
analytic FLOP/byte roofline (ops/roofline.py) turns the probe time into MFU
/ HBM-utilization / speed-of-light fractions for the registration kernel.

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


def run_config(name, cfg, streams, sim, app, run_streamed, warmup, probe_n):
    from simpleslam_tpu.ops import roofline
    from simpleslam_tpu.utils.config import Params

    n = len(streams.scan_stamps)
    # 32-scan batches halve the per-batch link overhead (RTT + upload) vs
    # 16 at the cost of 2x coarser correction/keyframe lag — the throughput
    # knob of this executor, like the reference's `cores` (measured: lo
    # 228 -> 307 scans/s at 32 on the axon tunnel)
    sync_every = int(os.environ.get("SIMPLESLAM_SYNC_EVERY", "32"))
    Params.load(cfg)
    system = app.SlamSystem()
    t0 = time.perf_counter()
    # warmup: compiles every program of this config
    run_streamed(system, _subseq(streams, sim, 0, warmup),
                 sync_every=sync_every)
    warmup_s = time.perf_counter() - t0
    # sync-mode probe on a warm system: accurate per-batch device time
    probe = run_streamed(system, _subseq(streams, sim, warmup,
                                         warmup + probe_n),
                         sync_every=sync_every, device_probe=True)
    # throughput run (double-buffered)
    rest = _subseq(streams, sim, warmup + probe_n, None)
    t0 = time.perf_counter()
    result = run_streamed(system, rest, sync_every=sync_every)
    dt = time.perf_counter() - t0
    n_timed = n - warmup - probe_n
    fps = n_timed / dt
    ate = sim.ate_rmse(streams.gt_poses[warmup + probe_n:], result.poses,
                       align=False)

    dev_s = probe.timers.mean("device_exec")
    busy = dev_s * result.extras["n_batches"] / dt
    tpu_cfg = Params.get_instance()["tpu"]
    out = {
        "scans_per_sec": round(fps, 3),
        "ate_rmse_m": round(float(ate), 4),
        "n_scans": n_timed,
        "keyframes": result.keyframe_count,
        "converged_frac": round(result.converged_frac, 3),
        "gn_iters_mean": result.extras["gn_iters_mean"],
        "gn_gathers_mean": result.extras["gn_gathers_mean"],
        "warmup_s": round(warmup_s, 1),
        "device": {
            "exec_ms_per_batch": round(dev_s * 1e3, 2),
            "exec_ms_per_scan": round(dev_s * 1e3 / sync_every, 3),
            "busy_frac": round(busy, 3),
        },
        "stage_means_ms": {
            k: round(result.timers.mean(k) * 1e3, 2) for k in result.timers.total
        },
    }
    if cfg.get("frontend", {}).get("pcr", "loam") == "loam":
        slab_pts = int(tpu_cfg.get("loam_slab_size", 24))
        cost = roofline.loam_batch_cost(
            n_queries=result.extras["scan_capacity"], slab_rows=1,
            lane_width=8 * slab_pts * 3,
            slab_pts=slab_pts,
            n_scans=sync_every,
            mean_iters=result.extras["gn_iters_mean"],
            mean_gathers=result.extras["gn_gathers_mean"])
        out["device"]["roofline"] = {
            "gflops_per_batch": round(cost["flops"] / 1e9, 2),
            "hbm_gb_per_batch": round(cost["hbm_bytes"] / 1e9, 3),
            **roofline.utilization(cost, dev_s),
        }
    out["scan_capacity"] = result.extras["scan_capacity"]
    out["map_builds"] = getattr(system.map_manager, "n_device_builds", 0)
    if system.backend is not None:
        out["lc"] = {
            "accepted_edges": system.backend.n_lc_edges,
            "dropped_closures": (system.loop_closure.dropped_closures
                                 if system.loop_closure is not None else 0),
        }
    return out


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return float(line.split()[1]) / 1024.0
    return 0.0


def run_longrun(sim, app, run_streamed, n_scans=1024):
    """Long-run scale config: ~1.2 laps of a large loop, LC on, ~250
    keyframes — the regime the short headline runs never reach. Reports the
    evidence the short configs cannot: backend-lag trend (first vs last
    quartile), bucket-growth recompiles landing mid-run, LC accept/drop
    counts at real revisit density, and peak RSS."""
    import resource

    from simpleslam_tpu.utils.config import Params

    t0 = time.perf_counter()
    # loop-aware world: make_world's random boxes eventually sit ON the
    # circular path, the robot drives inside one, and the scan collapses to
    # ~600 occluded points (measured: registration support 1500 -> 168 in
    # a dozen scans, then divergence). make_loop_world keeps the drive
    # corridor clear — the simulator's road.
    world = sim.make_loop_world(seed=0, radius=40.0)
    # speed 3 / radius 40: 307 m arc = 1.22 laps -> ~250 unique keyframes
    # (bucket 128 -> 512 growth mid-run) + an end-of-run revisit for LC.
    # az 900 keeps the 1024-scan world sim inside the bench budget.
    streams = sim.simulate_sequence(world, n_scans=n_scans, seed=0,
                                    speed=3.0, radius=40.0,
                                    n_az=900, n_el=16)
    sim_s = time.perf_counter() - t0
    Params.load({"mode": "lo",
                 "backend": {"enable": True, "lc": {"enable": True}},
                 "frontend": {"pcr": "loam"}})
    system = app.SlamSystem()
    warm = 32
    run_streamed(system, _subseq(streams, sim, 0, warm))
    rss0 = _rss_mb()
    t0 = time.perf_counter()
    result = run_streamed(system, _subseq(streams, sim, warm, None))
    dt = time.perf_counter() - t0
    rss1 = _rss_mb()
    lag = result.timers.series.get("backend_lag", [])
    q = max(len(lag) // 4, 1)
    ate = sim.ate_rmse(streams.gt_poses[warm:], result.poses, align=False)
    return {
        "scans_per_sec": round((n_scans - warm) / dt, 3),
        "ate_rmse_m": round(float(ate), 4),
        "n_scans": n_scans - warm,
        "keyframes": result.keyframe_count,
        "converged_frac": round(result.converged_frac, 3),
        "sim_s": round(sim_s, 1),
        "map_builds": getattr(system.map_manager, "n_device_builds", 0),
        "bucket_growth_recompiles": getattr(system.backend,
                                            "n_bucket_growths", 0),
        "backend_lag_ms": {
            "first_quartile_mean": round(
                1e3 * float(np.mean(lag[:q])), 1) if lag else None,
            "last_quartile_mean": round(
                1e3 * float(np.mean(lag[-q:])), 1) if lag else None,
            "n_events": len(lag),
        },
        "lc": {
            "accepted_edges": system.backend.n_lc_edges,
            "dropped_closures": (system.loop_closure.dropped_closures
                                 if system.loop_closure is not None else 0),
        },
        "rss_mb": {"start": round(rss0, 1), "end": round(rss1, 1),
                   "peak": round(resource.getrusage(
                       resource.RUSAGE_SELF).ru_maxrss / 1024.0, 1)},
    }


def run_hard_world(name, world, cfg, sim, app, run_streamed, n_scans=100,
                   **seq_kw):
    """Hard-geometry config: ATE + throughput on a world where the friendly
    axis-aligned assumptions break (VERDICT r3: regressions on hard geometry
    were invisible to the driver)."""
    from simpleslam_tpu.utils.config import Params

    streams = sim.simulate_sequence(world, n_scans=n_scans, seed=2, **seq_kw)
    Params.load(cfg)
    system = app.SlamSystem()
    warm = 15
    run_streamed(system, _subseq(streams, sim, 0, warm))
    t0 = time.perf_counter()
    result = run_streamed(system, _subseq(streams, sim, warm, None))
    dt = time.perf_counter() - t0
    ate = sim.ate_rmse(streams.gt_poses[warm:], result.poses, align=False)
    return {
        "scans_per_sec": round((n_scans - warm) / dt, 3),
        "ate_rmse_m": round(float(ate), 4),
        "converged_frac": round(result.converged_frac, 3),
        "n_scans": n_scans - warm,
    }


def main() -> int:
    t_setup = time.perf_counter()
    from simpleslam_tpu.pipeline import app, simulate as sim
    from simpleslam_tpu.pipeline.streamed import run_streamed
    from simpleslam_tpu.utils.logging import Logger
    import jax
    import logging

    Logger.get_instance().set_level(logging.ERROR)

    n_scans = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    warmup = 15
    probe_n = 32 if n_scans >= 100 else 0

    world = sim.make_world(seed=0)
    streams = sim.simulate_sequence(world, n_scans=n_scans, seed=0,
                                    n_az=1800, n_el=16)
    setup_s = time.perf_counter() - t_setup

    # Wall budget: the tunnel's effective RTT/throughput varies several-fold
    # between runs (and a run killed mid-flight wedges the device server for
    # minutes). The headline config runs first; the extra configs run only
    # while budget remains, so one slow phase degrades the report instead of
    # producing NO json line.
    budget_s = float(os.environ.get("SIMPLESLAM_BENCH_BUDGET_S", "480"))

    results = {}
    results["full"] = run_config(
        "full",
        {"mode": "lo", "backend": {"enable": True, "lc": {"enable": True}},
         "frontend": {"pcr": "loam"}},
        streams, sim, app, run_streamed, warmup, probe_n)
    if time.perf_counter() - t_setup < budget_s * 0.55:
        results["lo"] = run_config(
            "lo",
            {"mode": "lo", "backend": {"enable": False},
             "frontend": {"pcr": "loam"}},
            streams, sim, app, run_streamed, warmup, probe_n)
    else:
        results["lo"] = {"skipped": "bench budget exhausted"}
    if time.perf_counter() - t_setup < budget_s * 0.8:
        results["lio"] = run_config(
            "lio",
            {"mode": "lio", "backend": {"enable": True, "lc": {"enable": False}},
             "frontend": {"pcr": "loam"}},
            streams, sim, app, run_streamed, warmup, probe_n)
    else:
        results["lio"] = {"skipped": "bench budget exhausted"}

    # hard-geometry configs (cheap: 100 scans each, no probe)
    if time.perf_counter() - t_setup < budget_s * 0.85:
        try:
            results["adversarial"] = run_hard_world(
                "adversarial", sim.make_adversarial_world(seed=5),
                {"mode": "lo", "backend": {"enable": False},
                 "frontend": {"pcr": "loam", "degeneracy_guard": True}},
                sim, app, run_streamed)
        except Exception as e:  # a hard-world failure must not kill the line
            results["adversarial"] = {"error": repr(e)[:200]}
    else:
        results["adversarial"] = {"skipped": "bench budget exhausted"}
    if time.perf_counter() - t_setup < budget_s * 0.9:
        try:
            results["corridor"] = run_hard_world(
                "corridor", sim.make_corridor_world(),
                {"mode": "lio", "backend": {"enable": False},
                 "frontend": {"pcr": "loam", "degeneracy_guard": True}},
                sim, app, run_streamed, n_scans=100, loop=False)
        except Exception as e:
            results["corridor"] = {"error": repr(e)[:200]}
    else:
        results["corridor"] = {"skipped": "bench budget exhausted"}

    # long-run scale config (the expensive one: ~1000 scans, LC on,
    # ~250 keyframes; world sim dominates its wall time)
    if (os.environ.get("SIMPLESLAM_BENCH_LONG", "1") != "0"
            and time.perf_counter() - t_setup < budget_s * 0.55):
        try:
            results["longrun"] = run_longrun(sim, app, run_streamed)
        except Exception as e:
            results["longrun"] = {"error": repr(e)[:200]}
    else:
        results["longrun"] = {"skipped": "bench budget exhausted"}

    cache_dir = jax.config.jax_compilation_cache_dir
    cache_entries = (len(os.listdir(cache_dir))
                     if cache_dir and os.path.isdir(cache_dir) else 0)

    fps = results["full"]["scans_per_sec"]
    print(json.dumps({
        "metric": "full_mapping_scans_per_sec",
        "value": fps,
        "unit": "scans/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "extras": {
            **{k: v for k, v in results.items()},
            "setup_s": round(setup_s, 1),
            "total_s": round(time.perf_counter() - t_setup, 1),
            "jax_cache": {"dir": cache_dir, "entries": cache_entries},
        },
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
