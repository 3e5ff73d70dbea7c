"""NDT / VGICP registration backends: converge on synthetic scan pairs.

Mirrors the reference's `align` CLI workflow (test/align.cpp: run each PCR
backend on a scan/map pair from a perturbed init, check convergence and
fitness) — same fixture geometry as the LOAM tests.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from simpleslam_tpu.ops import geometry as geo
from simpleslam_tpu.ops import ndt as ndt_ops
from simpleslam_tpu.ops import vgicp as vgicp_ops
from simpleslam_tpu.ops import pointcloud as pcops
from simpleslam_tpu.ops import voxel as vox
from simpleslam_tpu.pipeline import simulate as sim


@pytest.fixture(scope="module")
def fixture():
    rng = np.random.default_rng(2)
    world = sim.make_world(seed=7)
    _, poses = sim.make_trajectory(60, 0.1, speed=1.5)
    map_poses = [poses[20], poses[27], poses[34]]
    clouds = None
    for mp in map_poses:
        scan = sim.simulate_scan(world, sim.sensor_from_body(mp), rng=rng)
        c = pcops.transform(pcops.from_numpy(scan, 32768), jnp.asarray(mp.astype(np.float32)))
        clouds = c if clouds is None else pcops.concat(clouds, c, 98304)
    submap = pcops.compact(vox.voxel_downsample(clouds, 0.5), 32768)
    origin = jnp.asarray(map_poses[0][:3, 3].astype(np.float32))

    T_b = poses[30]
    scan_b = sim.simulate_scan(world, sim.sensor_from_body(T_b), rng=rng)
    src = pcops.compact(vox.voxel_downsample(pcops.from_numpy(scan_b, 32768), 0.5), 8192)
    # odometry-scale initial error (10 Hz scans at 1.5 m/s move ~0.15 m);
    # NDT at 1.0 m resolution has a plateau beyond ~0.25 m offsets — true of
    # pclomp's score function as well
    guess = T_b.copy()
    guess[:3, 3] += [0.12, -0.1, 0.0]
    return submap, origin, src, T_b, guess


def pose_error(T_est, T_gt):
    d = np.linalg.inv(np.asarray(T_gt)) @ np.asarray(T_est)
    return np.linalg.norm(d[:3, 3]), np.arccos(np.clip((np.trace(d[:3, :3]) - 1) / 2, -1, 1))


DIMS = (192, 192, 32)


def test_ndt_align(fixture):
    submap, origin, src, T_gt, guess = fixture
    target = ndt_ops.build_target(submap, 1.0, origin, dims=DIMS)
    res = ndt_ops.align(src, target, jnp.asarray(guess.astype(np.float32)))
    trans, rot = pose_error(res.pose, T_gt)
    assert bool(res.converged), (int(res.iters), float(res.score))
    assert trans < 0.15, trans
    assert rot < 0.02, rot


def test_vgicp_align(fixture):
    submap, origin, src, T_gt, guess = fixture
    target = vgicp_ops.build_target(submap, 1.0, origin, dims=DIMS)
    res = vgicp_ops.align(src, target, jnp.asarray(guess.astype(np.float32)))
    trans, rot = pose_error(res.pose, T_gt)
    assert bool(res.converged), int(res.iters)
    assert trans < 0.12, trans
    assert rot < 0.02, rot
    # converged registration on true overlap must report a tight fitness
    # (floor ~0.05 set by the 0.5 m-downsampled target's NN spacing; the LC
    # acceptance threshold is 0.3)
    assert float(res.fitness) < 0.15, float(res.fitness)


def test_vgicp_fitness_discriminates(fixture):
    """Fitness must separate a correct alignment from a 2 m misalignment —
    the property the LC acceptance threshold (0.3) relies on."""
    submap, origin, src, T_gt, _ = fixture
    target = vgicp_ops.build_target(submap, 1.0, origin, dims=DIMS)
    good = vgicp_ops.fitness_score(src, target.pts, jnp.asarray(T_gt.astype(np.float32)))
    bad_pose = T_gt.copy()
    bad_pose[:3, 3] += [2.0, 0.0, 0.0]
    bad = vgicp_ops.fitness_score(src, target.pts, jnp.asarray(bad_pose.astype(np.float32)))
    assert float(good) < 0.15
    assert float(bad) > 3 * float(good)


@pytest.mark.parametrize("pcr", ["ndt", "vgicp"])
def test_pipeline_with_backend_swap(pcr):
    """Short lo-mode run with each alternative PCR backend (config swap)."""
    from simpleslam_tpu.pipeline import app
    from simpleslam_tpu.utils.config import Params

    Params.load({"mode": "lo", "backend": {"enable": False},
                 "frontend": {"pcr": pcr},
                 "tpu": {"scan_capacity": 16384}})
    world = sim.make_world(seed=5)
    streams = sim.cache_streams(
        "nv30s5", lambda: sim.simulate_sequence(world, n_scans=30, seed=5))
    system = app.SlamSystem()
    result = app.run_offline(system, streams)
    ate = sim.ate_rmse(streams.gt_poses, result.poses, align=False)
    assert ate < 0.3, (pcr, ate)
