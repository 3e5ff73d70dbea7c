"""Streamed executor: parity with the classic per-scan path (lo mode).

The streamed executor (pipeline/streamed.py) is the TPU-latency-aware
odometry loop: device-resident pose chain, one host sync per batch. Its
trajectory must match the classic reference-faithful path's quality; its
keyframe/map bookkeeping must function with batch lag."""

import numpy as np
import pytest

from simpleslam_tpu.pipeline import app, simulate as sim
from simpleslam_tpu.pipeline.streamed import run_streamed
from simpleslam_tpu.utils.config import Params


def _run(mode_streamed: bool, n_scans: int = 45, backend: bool = False):
    Params.load({"mode": "lo",
                 "backend": {"enable": backend},
                 "frontend": {"pcr": "loam"},
                 "tpu": {"scan_capacity": 16384}})
    world = sim.make_world(seed=3)
    streams = sim.cache_streams(
        f"str{n_scans}s3",
        lambda: sim.simulate_sequence(world, n_scans=n_scans, seed=3))
    system = app.SlamSystem()
    if mode_streamed:
        result = run_streamed(system, streams, sync_every=8)
    else:
        result = app.run_offline(system, streams)
    ate = sim.ate_rmse(streams.gt_poses, result.poses, align=False)
    return result, ate


def test_streamed_matches_classic_quality():
    r_stream, ate_stream = _run(True)
    r_classic, ate_classic = _run(False)
    assert ate_stream < 0.25, ate_stream
    # batch-lagged keyframing may shift keyframe placement slightly but the
    # trajectory quality must stay in the same class
    assert ate_stream < max(2.5 * ate_classic, 0.15), (ate_stream, ate_classic)
    assert r_stream.keyframe_count >= r_classic.keyframe_count - 2
    assert r_stream.converged_frac > 0.9


def test_streamed_with_backend():
    r, ate = _run(True, backend=True)
    assert ate < 0.25, ate
    assert r.keyframe_count > 3


def test_streamed_lio():
    """lio mode rides the device chain: the whole EKF stream is fused up
    front (ekf_replay) and the odom2map loose coupling stays on device."""
    Params.load({"mode": "lio",
                 "backend": {"enable": False},
                 "frontend": {"pcr": "loam"},
                 "tpu": {"scan_capacity": 16384}})
    world = sim.make_world(seed=1)
    streams = sim.cache_streams(
        "str30s1", lambda: sim.simulate_sequence(world, n_scans=30, seed=1))
    system = app.SlamSystem()
    r = run_streamed(system, streams, sync_every=8)
    ate = sim.ate_rmse(streams.gt_poses, r.poses, align=False)
    assert ate < 0.3, ate
    assert r.converged_frac > 0.85
    assert r.keyframe_count > 2
