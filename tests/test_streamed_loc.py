"""Streamed-executor localization + relocalization (the test/loc.cpp role).

The classic per-scan path already supports pcd_file localization mode and
the /initialpose reloc flag (tests/test_pipeline_full.py); these tests cover
the same capabilities through the streamed executor — static global-map
target, no keyframe creation, and a reloc that resets the device pose chain
at the next batch boundary.
"""

import numpy as np
import pytest

from simpleslam_tpu.pipeline import app, simulate as sim
from simpleslam_tpu.pipeline.streamed import run_streamed
from simpleslam_tpu.utils import fileio
from simpleslam_tpu.utils.config import Params


@pytest.fixture(scope="module")
def global_map(tmp_path_factory):
    """A prebuilt global PCD assembled from ground-truth-posed scans."""
    out = tmp_path_factory.mktemp("streamed_loc")
    world = sim.make_world(seed=1)
    streams = sim.cache_streams(
        "loc80s1", lambda: sim.simulate_sequence(world, n_scans=80, seed=1))
    clouds = []
    for i in range(0, 80, 4):
        p = streams.gt_poses[i]
        xyz = streams.scans[i]
        clouds.append(xyz @ p[:3, :3].T.astype(np.float32)
                      + p[:3, 3].astype(np.float32))
    pcd = str(out / "global.pcd")
    fileio.save_pcd(pcd, np.concatenate(clouds))
    return pcd, streams


def _loc_system(pcd):
    Params.load({
        "mode": "lo", "saveMapDir": "", "backend": {"enable": False},
        "tpu": {"scan_capacity": 16384},
    })
    return app.SlamSystem(pcd_file=pcd)


def _subseq(streams, lo, hi):
    return sim.SensorStreams(
        streams.scan_stamps[lo:hi], streams.scans[lo:hi],
        streams.gt_poses[lo:hi], streams.wheel_stamps[:0],
        streams.wheel_poses[:0], streams.imu_stamps[:0],
        streams.imu_quats[:0])


def test_streamed_localization(global_map):
    pcd, streams = global_map
    system = _loc_system(pcd)
    assert not system.map_manager.is_mapping
    assert not system.map_manager.is_submap_empty()
    res = run_streamed(system, _subseq(streams, 0, 24), sync_every=8)
    ate = sim.ate_rmse(streams.gt_poses[:24], res.poses, align=False)
    assert ate < 0.15, ate
    assert res.keyframe_count == 0  # localization must not create keyframes


def test_streamed_relocalization(global_map):
    """Start mid-sequence (far from the identity start): without a reloc
    the chain is lost; with set_reloc_flag it localizes immediately."""
    pcd, streams = global_map
    k = 50
    sub = _subseq(streams, k, k + 16)
    assert np.linalg.norm(streams.gt_poses[k][:3, 3]) > 3.0

    system = _loc_system(pcd)
    system.lidar_odometry.set_reloc_flag(streams.gt_poses[k].copy())
    res = run_streamed(system, sub, sync_every=8)
    ate = sim.ate_rmse(sub.gt_poses, res.poses, align=False)
    assert ate < 0.15, ate
