"""Backend pose-graph orchestration: factors, events, correction broadcast,
g2o persistence (reference backend/src/Backend.cpp semantics)."""

import numpy as np
import pytest

from simpleslam_tpu.models.backend import Backend
from simpleslam_tpu.models.frontend import Frontend, Odometry
from simpleslam_tpu.models.mapmanager import KeyFrame, MapManager
from simpleslam_tpu.models.registration import LoamRegister
from simpleslam_tpu.utils.config import Params


@pytest.fixture
def small_caps():
    return Params.load({
        "saveMapDir": "",
        "tpu": {"max_keyframes": 64, "max_edges": 128,
                "submap_capacity": 8192, "map_voxel_capacity": 4096},
        "backend": {"lc": {"enable": False}},
    })


def _pose(x, y, yaw=0.0):
    T = np.eye(4)
    c, s = np.cos(yaw), np.sin(yaw)
    T[0, 0], T[0, 1], T[1, 0], T[1, 1] = c, -s, s, c
    T[0, 3], T[1, 3] = x, y
    return T


def _mk_system(small_caps):
    reg = LoamRegister()
    mm = MapManager(reg)
    fe = Frontend()
    bk = Backend(fe, mm, None)
    return fe, mm, bk


def _push_kf(mm, stamp, pose):
    xyz = np.random.default_rng(0).uniform(-5, 5, (50, 3)).astype(np.float32)
    return mm.put_keyframe(KeyFrame(stamp, pose, xyz))


def test_odom_factors_use_nearest_keyframe(small_caps):
    fe, mm, bk = _mk_system(small_caps)
    _push_kf(mm, 0.0, _pose(0, 0))
    bk.optim_once()
    # a kf near kf0 but beyond the gate, then one returning near kf0:
    _push_kf(mm, 1.0, _pose(2, 0))
    _push_kf(mm, 2.0, _pose(4, 0))
    bk.optim_once()
    _push_kf(mm, 3.0, _pose(2.0, 1.5))  # nearest existing kf is idx 1, not 2
    bk.optim_once()
    assert bk.edge_i[-1] == 1  # nearest-keyframe topology (Backend.cpp:240-252)
    assert bk.edge_j[-1] == 3


def test_correction_broadcast(small_caps):
    fe, mm, bk = _mk_system(small_caps)
    fe.global_odom.push_back(Odometry(0.0, _pose(0, 0)), block=False)
    fe.odom2map.store(_pose(0, 0))

    _push_kf(mm, 0.0, _pose(0, 0))
    _push_kf(mm, 1.0, _pose(2, 0))
    # a CONSISTENT graph is a no-op solve: optim_once short-circuits
    # (returns False, broadcasts nothing) so float-noise "corrections"
    # never perturb downstream pose state (see Backend.optim_once)
    assert not bk.optim_once()
    np.testing.assert_allclose(bk.last_delta, np.eye(4), atol=1e-6)
    # poses and odom2map untouched
    np.testing.assert_allclose(
        mm.kf_obj.keyframes[1].pose[:3, 3], [2, 0, 0], atol=1e-3)
    o2m = fe.odom2map.load()
    np.testing.assert_allclose(o2m, np.eye(4), atol=1e-3)


def test_solver_corrects_inconsistent_estimates(small_caps):
    """Odometry factors measured before a drift injection pull poses back."""
    fe, mm, bk = _mk_system(small_caps)
    _push_kf(mm, 0.0, _pose(0, 0))
    _push_kf(mm, 1.0, _pose(2, 0))
    _push_kf(mm, 2.0, _pose(4, 0))
    bk.optim_once()  # factors measured at clean estimates

    # corrupt the stored estimates (as if drift accumulated)
    with mm.kf_obj.lock:
        mm.kf_obj.keyframes[2].pose = _pose(4.6, 0.4)
        mm.kf_obj.kf_nums = 2  # pretend kf2 is new again so an event re-fires
    mm.kf_obj.closest_kf_idx.append(1)
    # re-add as new event: the odometry edge measured at the corrupt pose
    # will fight the older clean edge; prior + chain keeps it near truth
    mm.kf_obj.new_kf_is_coming()
    bk.optim_once()
    p2 = mm.kf_obj.keyframes[2].pose[:3, 3]
    assert abs(p2[0] - 4.0) < 0.5 and abs(p2[1]) < 0.4


def test_noop_solve_skip_and_stress_triggers(small_caps):
    """Odometry-only in-session graphs are exactly consistent, so the solve
    round-trip is skipped; a duplicate (i, j) edge — the one in-session way
    consistency can break — re-arms it (see Backend._graph_stressed)."""
    fe, mm, bk = _mk_system(small_caps)
    _push_kf(mm, 0.0, _pose(0, 0))
    _push_kf(mm, 1.0, _pose(2, 0))
    assert not bk.optim_once()
    assert bk.n_skipped_noop_solves == 1  # no dispatch at all
    _push_kf(mm, 2.0, _pose(4, 0))
    mm.kf_obj.new_kf_is_coming()
    bk.optim_once()
    assert bk.n_skipped_noop_solves == 2

    # duplicate-pair stress: corrupt a pose, re-fire its event (the edge
    # re-measures at the corrupt pose and disagrees with the older edge)
    with mm.kf_obj.lock:
        mm.kf_obj.keyframes[2].pose = _pose(4.6, 0.4)
        mm.kf_obj.kf_nums = 2
    mm.kf_obj.closest_kf_idx.append(1)
    mm.kf_obj.new_kf_is_coming()
    bk.optim_once()
    assert bk._graph_stressed
    assert bk.n_skipped_noop_solves == 2  # this event actually solved
    p2 = mm.kf_obj.keyframes[2].pose[:3, 3]
    assert abs(p2[0] - 4.0) < 0.5  # and the solve pulled the pose back


def test_g2o_reload_marks_graph_stressed(tmp_path, small_caps):
    cfg = Params.get_instance()
    cfg["saveMapDir"] = str(tmp_path)
    Params.load(cfg)
    fe, mm, bk = _mk_system(small_caps)
    _push_kf(mm, 0.0, _pose(0, 0))
    _push_kf(mm, 1.0, _pose(2, 0))
    bk.optim_once()
    bk.save()
    reg2 = LoamRegister()
    mm2 = MapManager(reg2)
    bk2 = Backend(Frontend(), mm2, None)
    # a reloaded graph's consistency cannot be assumed: always solve
    assert bk2._graph_stressed


def test_prewarm_compiles_solver(small_caps):
    fe, mm, bk = _mk_system(small_caps)
    bk.prewarm()  # must not raise, nor touch graph state
    assert bk._g is None
    _push_kf(mm, 0.0, _pose(0, 0))
    _push_kf(mm, 1.0, _pose(2, 0))
    assert not bk.optim_once()  # behavior unchanged after prewarm


def test_g2o_save_reload(tmp_path, small_caps):
    cfg = Params.get_instance()
    cfg["saveMapDir"] = str(tmp_path)
    Params.load(cfg)
    reg = LoamRegister()
    mm = MapManager(reg)
    fe = Frontend()
    bk = Backend(fe, mm, None)
    _push_kf(mm, 0.0, _pose(0, 0))
    _push_kf(mm, 1.0, _pose(2, 0, 0.3))
    _push_kf(mm, 2.0, _pose(4, 1, 0.6))
    bk.optim_once()
    bk.save()
    assert (tmp_path / "fg.g2o").is_file()
    assert (tmp_path / "tum.txt").is_file()

    # fresh object graph reloads keyframes + factor graph (remapping mode)
    reg2 = LoamRegister()
    mm2 = MapManager(reg2)
    fe2 = Frontend()
    bk2 = Backend(fe2, mm2, None)
    assert len(mm2.kf_obj.keyframes) == 3
    assert len(bk2.edge_i) == len(bk.edge_i)
    assert bk2.prior_pose is not None
    np.testing.assert_allclose(
        mm2.kf_obj.keyframes[2].pose[:3, 3],
        mm.kf_obj.keyframes[2].pose[:3, 3], atol=1e-6)
