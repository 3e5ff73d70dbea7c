"""Eval tooling: GPS->ENU ground truth, stamp association, APE/RPE stats.

Mirrors the reference's offline evaluation protocol (eval/scripts/gps2tum.py
+ evo APE/RPE tables, SURVEY.md §4 "Offline eval")."""

import numpy as np
import pytest

from simpleslam_tpu.eval import GpsTool, ape, evaluate, gps_to_tum, rpe
from simpleslam_tpu.eval.metrics import associate
from simpleslam_tpu.utils import fileio


def test_lla_ecef_enu_roundtrip_scale():
    """1e-4 deg latitude ~ 11.1 m north; ENU must reproduce that locally."""
    gt = GpsTool(lla_origin=(34.0, 113.0, 72.0))
    enu0 = gt.get_enu(np.array([34.0, 113.0, 72.0]))
    np.testing.assert_allclose(enu0, 0.0, atol=1e-6)
    north = gt.get_enu(np.array([34.0001, 113.0, 72.0]))
    assert abs(north[1] - 11.09) < 0.05 and abs(north[0]) < 1e-3
    east = gt.get_enu(np.array([34.0, 113.0001, 72.0]))
    assert abs(east[0] - 9.19) < 0.05 and abs(east[1]) < 1e-3
    up = gt.get_enu(np.array([34.0, 113.0, 82.0]))
    assert abs(up[2] - 10.0) < 0.01


def test_gps_to_tum_rtk_gating(tmp_path):
    stamps = np.arange(5, dtype=np.float64)
    lla = np.tile([34.0, 113.0, 72.0], (5, 1))
    lla[:, 0] += np.arange(5) * 1e-5
    gga = np.array([4, 1, 4, 5, 4])  # only gga==4 rows survive
    out = str(tmp_path / "gps_tum.txt")
    rows = gps_to_tum(stamps, lla, gga, out_path=out)
    assert rows.shape == (3, 8)
    assert list(rows[:, 0]) == [0.0, 2.0, 4.0]
    loaded = np.loadtxt(out)
    np.testing.assert_allclose(loaded, rows, atol=1e-5)


def test_associate_nearest_stamp():
    ri, ei = associate(np.array([0.0, 1.0, 2.0, 3.0]),
                       np.array([0.005, 1.1, 2.004]), max_diff=0.02)
    assert list(ri) == [0, 2] and list(ei) == [0, 2]


def _circle_traj(n=50, r=10.0):
    th = np.linspace(0, np.pi, n)
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, 0, 3] = r * np.cos(th)
    poses[:, 1, 3] = r * np.sin(th)
    return poses


def test_ape_rpe_stats():
    gt = _circle_traj()
    est = gt.copy()
    est[:, :3, 3] += 0.1  # constant offset: alignment removes it
    a = ape(gt, est, align=True)
    assert a.rmse < 1e-6
    a_raw = ape(gt, est, align=False)
    assert abs(a_raw.rmse - np.sqrt(3) * 0.1) < 1e-6
    r = rpe(gt, est, delta=1)  # constant offset has zero relative error
    assert r.rmse < 1e-9 and r.n == len(gt) - 1


def test_evaluate_tum_files(tmp_path):
    gt = _circle_traj()
    stamps = np.arange(len(gt)) * 0.1
    est = gt.copy()
    est[:, :3, 3] += np.random.default_rng(0).normal(0, 0.05, (len(gt), 3))
    fileio.write_tum(str(tmp_path / "gt.txt"), stamps, gt)
    fileio.write_tum(str(tmp_path / "est.txt"), stamps + 0.001, est)
    a, r = evaluate(str(tmp_path / "gt.txt"), str(tmp_path / "est.txt"),
                    delta=5)
    assert 0.0 < a.rmse < 0.2
    assert 0.0 < r.rmse < 0.3
    with pytest.raises(ValueError):
        fileio.write_tum(str(tmp_path / "far.txt"), stamps + 99.0, est)
        evaluate(str(tmp_path / "gt.txt"), str(tmp_path / "far.txt"))
