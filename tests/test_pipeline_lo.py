"""End-to-end lo-mode odometry on a synthetic sequence.

The `loc.cpp`/bag-replay analogue (SURVEY.md §4 integration tests): run the
full frontend (downsample -> scan2map -> planar clamp -> keyframes -> submap
updates) over a simulated park world and check trajectory quality + artifact
persistence.
"""

import numpy as np
import pytest

from simpleslam_tpu.pipeline import app, simulate as sim
from simpleslam_tpu.utils.config import Params


@pytest.fixture(scope="module")
def lo_result():
    cfg = Params.load({"mode": "lo", "backend": {"enable": False},
                       "tpu": {"scan_capacity": 16384}})
    world = sim.make_world(seed=5)
    streams = sim.cache_streams(
        "lo80s5", lambda: sim.simulate_sequence(world, n_scans=80, seed=5))
    system = app.SlamSystem()
    result = app.run_offline(system, streams)
    return streams, result, system


def test_lo_trajectory_accuracy(lo_result):
    streams, result, _ = lo_result
    assert result.poses.shape == streams.gt_poses.shape
    ate = sim.ate_rmse(streams.gt_poses, result.poses, align=False)
    # 80 scans over 12 m of travel; the reference's own APE on real parks is
    # 1.3-23 m — demand much better here on clean synthetic data
    assert ate < 0.15, ate
    rpe = sim.rpe_rmse(streams.gt_poses, result.poses, delta=10)
    assert rpe < 0.1, rpe


def test_lo_convergence_and_keyframes(lo_result):
    streams, result, system = lo_result
    assert result.converged_frac > 0.95
    # ~12 m of travel at 1 m keyframe gap
    assert 8 <= result.keyframe_count <= 20
    # submap exists and keyframe poses are planar (SixDof2Mobile applied)
    assert not system.map_manager.is_submap_empty()
    for kf in system.map_manager.kf_obj.keyframes:
        assert abs(kf.pose[2, 3]) < 1e-9


def test_lo_artifact_persistence(tmp_path, lo_result):
    _, _, system = lo_result
    system.map_manager.save_map_dir = str(tmp_path)
    system.map_manager.save_trajectory()
    system.map_manager.save_kfs()
    from simpleslam_tpu.utils import fileio

    stamps, poses = fileio.load_tum(str(tmp_path))
    assert len(stamps) == len(system.map_manager.kf_obj.keyframes)
    xyz, _ = fileio.load_pcd(str(tmp_path / "0.pcd"))
    assert xyz.shape[0] > 100
