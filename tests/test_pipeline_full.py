"""Full mapping pipeline (frontend + backend) and localization mode.

Covers the reference's app main flow (mapping with pose-graph backend and
artifact save) and ``test/loc.cpp`` (frontend-only localization against a
prebuilt global PCD, including rviz-style re-localization)."""

import numpy as np
import pytest

from simpleslam_tpu.pipeline import app, simulate as sim
from simpleslam_tpu.utils import fileio
from simpleslam_tpu.utils.config import Params


def _map_cfg(out):
    return {
        "mode": "lo",
        "saveMapDir": str(out),
        "backend": {"enable": True, "lc": {"enable": False}},
        "tpu": {"scan_capacity": 16384, "max_keyframes": 256, "max_edges": 512},
    }


@pytest.fixture(scope="module")
def mapping_run(tmp_path_factory):
    out = tmp_path_factory.mktemp("mapdir")
    Params.load(_map_cfg(out))
    world = sim.make_world(seed=5)
    streams = sim.cache_streams(
        "full60s5", lambda: sim.simulate_sequence(world, n_scans=60, seed=5))
    system = app.SlamSystem()
    result = app.run_offline(system, streams)
    system.shutdown()
    return out, world, streams, result


def test_full_mapping_accuracy_and_artifacts(mapping_run):
    out, _, streams, result = mapping_run
    ate = sim.ate_rmse(streams.gt_poses, result.poses, align=False)
    assert ate < 0.15, ate
    # all three checkpoint artifacts exist (tum.txt, {i}.pcd, fg.g2o)
    stamps, poses = fileio.load_tum(str(out))
    assert len(stamps) == result.keyframe_count > 0
    assert (out / "0.pcd").is_file()
    assert (out / "fg.g2o").is_file()
    g2o_poses, edges = fileio.load_g2o(str(out / "fg.g2o"))
    assert len(g2o_poses) == result.keyframe_count
    assert len(edges) >= result.keyframe_count - 1


def test_mapping_resume(mapping_run):
    """Reference resume path: reload keyframes + factor graph, keep mapping."""
    out, world, streams, result = mapping_run
    Params.load(_map_cfg(out))
    system2 = app.SlamSystem()  # same config: reloads from saveMapDir
    with system2.map_manager.kf_obj.lock:
        n_reloaded = len(system2.map_manager.kf_obj.keyframes)
    assert n_reloaded == result.keyframe_count
    assert system2.backend is not None
    assert len(system2.backend.edge_i) > 0  # factor graph reloaded


def test_localization_mode(mapping_run):
    out, world, streams, result = mapping_run
    # build the global map pcd from the saved keyframes (run.sh/loc.cpp prep)
    stamps, poses = fileio.load_tum(str(out))
    clouds = []
    for i in range(len(stamps)):
        xyz, _ = fileio.load_pcd(str(out / f"{i}.pcd"))
        R, t = poses[i][:3, :3], poses[i][:3, 3]
        clouds.append(xyz @ R.T.astype(np.float32) + t.astype(np.float32))
    fileio.save_pcd(str(out / "global.pcd"), np.concatenate(clouds))

    Params.load({
        "mode": "lo",
        "saveMapDir": "",
        "backend": {"enable": False},
        "tpu": {"scan_capacity": 16384},
    })
    system = app.SlamSystem(pcd_file=str(out / "global.pcd"))
    assert not system.map_manager.is_mapping
    assert not system.map_manager.is_submap_empty()

    # localize the first 20 scans against the prebuilt map
    sub = sim.SensorStreams(
        streams.scan_stamps[:20], streams.scans[:20], streams.gt_poses[:20],
        streams.wheel_stamps[:0], streams.wheel_poses[:0],
        streams.imu_stamps[:0], streams.imu_quats[:0],
    )
    res = app.run_offline(system, sub)
    ate = sim.ate_rmse(sub.gt_poses, res.poses, align=False)
    assert ate < 0.15, ate
    # localization mode must not create keyframes
    assert res.keyframe_count == 0


def test_relocalization_flag(mapping_run):
    """RelocDataProxy semantics: a reloc pose overrides prediction."""
    out, world, streams, _ = mapping_run
    Params.load({
        "mode": "lo", "saveMapDir": "", "backend": {"enable": False},
        "tpu": {"scan_capacity": 16384},
    })
    system = app.SlamSystem(pcd_file=str(out / "global.pcd"))
    # feed a mid-sequence scan with a deliberately wrong history, then reloc
    k = 10
    system.lidar_odometry.set_reloc_flag(streams.gt_poses[k].copy())
    pose = system.lidar_odometry.generate_odom(
        float(streams.scan_stamps[k]), streams.scans[k])
    err = np.linalg.norm(pose[:3, 3] - streams.gt_poses[k][:3, 3])
    assert err < 0.3, err
