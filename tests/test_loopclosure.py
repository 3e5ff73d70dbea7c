"""Loop-closure manager: ScanContext detection + VGICP verification + the
backend LC solve — the ``test/lcm.cpp`` workflow (replay recorded keyframes
through the LC pipeline and expect a closure)."""

import numpy as np
import pytest

from simpleslam_tpu.models.backend import Backend
from simpleslam_tpu.models.frontend import Frontend
from simpleslam_tpu.models.loopclosure import LoopClosureManager
from simpleslam_tpu.models.mapmanager import KeyFrame, MapManager
from simpleslam_tpu.models.registration import LoamRegister
from simpleslam_tpu.pipeline import simulate as sim
from simpleslam_tpu.utils.config import Params


@pytest.fixture(scope="module")
def lc_world():
    """Keyframes around a closed circle; the tail revisits the start."""
    Params.load({
        "saveMapDir": "",
        "backend": {"lc": {"enable": True, "historySubmapRange": 1,
                           "fitnessThreshold": 0.3},
                    "context": {"scancontext": {
                        "numExcludeRecent": 16, "numCandidatesFromTree": 4,
                        "scDistThres": 0.4}}},
        "tpu": {"max_keyframes": 64, "max_edges": 128,
                "ds_scan_capacity": 8192, "submap_capacity": 32768,
                "map_voxel_capacity": 16384, "scan_capacity": 16384},
    })
    world = sim.make_world(seed=11)
    radius, n_ring, n_revisit = 10.0, 32, 5
    kfs = []
    rng = np.random.default_rng(11)
    for k in range(n_ring + n_revisit):
        th = 2 * np.pi * k / n_ring
        pose = np.eye(4)
        pose[0, 3] = radius * np.cos(th)
        pose[1, 3] = radius * np.sin(th)
        yaw = th + np.pi / 2
        c, s = np.cos(yaw), np.sin(yaw)
        pose[0, 0], pose[0, 1], pose[1, 0], pose[1, 1] = c, -s, s, c
        scan = sim.simulate_scan(world, sim.sensor_from_body(pose),
                                 n_az=720, n_el=12, rng=rng)
        kfs.append((pose, scan))
    return kfs, n_ring


@pytest.fixture(scope="module")
def lc_setup(lc_world):
    kfs, n_ring = lc_world
    reg = LoamRegister()
    mm = MapManager(reg)
    lcm = LoopClosureManager(mm)

    # drift injection: revisit keyframes are shifted, as if odometry drifted
    drift = np.eye(4)
    drift[0, 3], drift[1, 3] = 0.4, -0.3
    with mm.kf_obj.lock:
        for i, (pose, scan) in enumerate(kfs):
            stored = drift @ pose if i >= n_ring else pose
            mm.kf_obj.keyframes.append(
                KeyFrame(float(i), stored, mm._host_downsample(scan)))
    return mm, lcm, kfs, n_ring, drift


def test_detects_and_verifies_closure(lc_setup):
    mm, lcm, kfs, n_ring, drift = lc_setup
    with mm.kf_obj.lock:
        lcm.add_context()
    n = lcm.lc_handler_once()
    assert n >= 1, "no loop closure accepted"

    results = lcm.lc_queue.snapshot()
    r = results[0]
    assert r.to_idx >= n_ring  # a revisit keyframe closed against ...
    assert r.from_idx < r.to_idx - lcm.context.num_exclude_recent  # ... an old one

    # the between must reflect the TRUE relative pose (drift corrected by
    # VGICP against the undrifted history submap), not the drifted estimate
    true_between = np.linalg.inv(kfs[r.from_idx][0]) @ kfs[r.to_idx][0]
    err = np.linalg.inv(true_between) @ r.between
    assert np.linalg.norm(err[:3, 3]) < 0.25, err[:3, 3]


def test_backend_applies_lc_correction(lc_setup):
    mm, lcm, kfs, n_ring, drift = lc_setup
    fe = Frontend()
    bk = Backend(fe, mm, lcm)

    # register odometry factors for the whole chain: measured from the TRUE
    # relative motion (closest_kf_idx = previous kf here)
    with mm.kf_obj.lock:
        stored = [kf.pose.copy() for kf in mm.kf_obj.keyframes]
    bk.prior_pose = stored[0].copy()
    for i in range(1, len(stored)):
        true_rel = np.linalg.inv(kfs[i - 1][0]) @ kfs[i][0]
        bk._add_between(i - 1, i, true_rel, np.array([1e-1] * 3 + [1e-4] * 3))
    bk.add_loop_factor()
    assert len(bk.edge_i) > len(stored) - 1  # includes >= 1 LC edge

    opt = bk._solve(stored, strong=True)
    # drifted revisit keyframes must be pulled back toward ground truth
    for i in range(n_ring, len(kfs)):
        err0 = np.linalg.norm(stored[i][:3, 3] - kfs[i][0][:3, 3])
        err1 = np.linalg.norm(opt[i][:3, 3] - kfs[i][0][:3, 3])
        assert err1 < err0 * 0.6, (i, err0, err1)
