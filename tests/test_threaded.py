"""Threaded pipeline: resident-thread topology processes a sequence to the
same result quality as the synchronous harness (dataproxy.cpp backpressure +
thread lifecycle checks)."""

import numpy as np
import pytest

from simpleslam_tpu.pipeline import app, simulate as sim, threaded
from simpleslam_tpu.utils.config import Params


def test_threaded_lo_processes_all_scans():
    Params.load({"mode": "lo", "backend": {"enable": False},
                 "dataproxy": {"lidar_size": 4},
                 "tpu": {"scan_capacity": 16384}})
    world = sim.make_world(seed=5)
    streams = sim.cache_streams(
        "thr28s5", lambda: sim.simulate_sequence(world, n_scans=28, seed=5))
    system = app.SlamSystem()
    result = threaded.run_threaded(system, streams)
    # bag mode: blocking backpressure means no scan is dropped
    assert result.extras["n_processed"] == 28
    ate = sim.ate_rmse(streams.gt_poses, result.poses, align=False)
    assert ate < 0.2, ate
    assert result.keyframe_count >= 4


def test_threaded_with_backend():
    Params.load({"mode": "lo",
                 "backend": {"enable": True, "lc": {"enable": False}},
                 "dataproxy": {"lidar_size": 4},
                 "tpu": {"scan_capacity": 16384, "max_keyframes": 128,
                         "max_edges": 256}})
    world = sim.make_world(seed=6)
    streams = sim.cache_streams(
        "thr30s6", lambda: sim.simulate_sequence(world, n_scans=30, seed=6))
    system = app.SlamSystem()
    result = threaded.run_threaded(system, streams)
    assert result.extras["n_processed"] == 30
    # backend consumed the keyframe events (graph has odometry edges)
    assert len(system.backend.edge_i) >= result.keyframe_count - 1
