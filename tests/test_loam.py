"""LOAM registration: recover known transforms on synthetic scans.

Mirrors the reference's registration drivers (test/align.cpp, PCR/test):
load/synthesize a scan-submap pair, run scan2Map from a perturbed initial
pose, check convergence and pose error.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from simpleslam_tpu.ops import geometry as geo
from simpleslam_tpu.ops import loam
from simpleslam_tpu.ops import pointcloud as pcops
from simpleslam_tpu.ops import voxel as vox
from simpleslam_tpu.pipeline import simulate as sim


@pytest.fixture(scope="module")
def world():
    return sim.make_world(seed=3)


def build_map_fixture(world, map_poses, rng):
    """Scans from ``map_poses`` merged into a map-frame voxel map (a submap)."""
    map_poses = np.asarray(map_poses)
    if map_poses.ndim == 2:
        map_poses = map_poses[None]
    clouds = []
    for mp in map_poses:
        scan = sim.simulate_scan(world, sim.sensor_from_body(mp), rng=rng)
        pc = pcops.from_numpy(scan, 32768)
        clouds.append(pcops.transform(pc, jnp.asarray(mp.astype(np.float32))))
    merged = clouds[0]
    for c in clouds[1:]:
        merged = pcops.concat(merged, c, 98304)
    ds = pcops.compact(vox.voxel_downsample(merged, 0.5), 32768)
    center = jnp.asarray(map_poses[0][:3, 3].astype(np.float32))
    return vox.build_voxel_map(ds, 1.0, center, num_voxels=65536, slab_size=8)


def run_case(world, body_a, body_b, init_pose, rng):
    vm = build_map_fixture(world, body_a, rng)
    scan_b = sim.simulate_scan(world, sim.sensor_from_body(body_b), rng=rng)
    pc_b = pcops.from_numpy(scan_b, 32768)
    ds_b = pcops.compact(vox.voxel_downsample(pc_b, 0.5), 8192)
    return loam.scan2map(ds_b, vm, jnp.asarray(init_pose.astype(np.float32)))


def pose_error(T_est, T_gt):
    d = np.linalg.inv(np.asarray(T_gt)) @ np.asarray(T_est)
    trans = np.linalg.norm(d[:3, 3])
    rot = np.arccos(np.clip((np.trace(d[:3, :3]) - 1) / 2, -1, 1))
    return trans, rot


def planar_error(T_est, T_gt):
    """(xy error, yaw error) — the components the planar pipeline consumes
    (z/roll/pitch are clamped by SixDof2Mobile each scan)."""
    d = np.linalg.inv(np.asarray(T_gt)) @ np.asarray(T_est)
    xy = np.linalg.norm(d[:2, 3])
    yaw = abs(np.arctan2(d[1, 0], d[0, 0]))
    return xy, yaw


def test_scan2map_identity(world, rng):
    """Same viewpoint, init at ground truth: must converge and stay put."""
    T = np.eye(4)
    res = run_case(world, T, T, T, rng)
    assert bool(res.converged)
    trans, rot = pose_error(res.pose, T)
    assert trans < 0.05 and rot < 0.01


def test_scan2map_recovers_offset_planar(world, rng):
    """Single-scan map, scan 0.5 m / 3 deg away, init at the map pose.

    A single-scan map under-constrains z for planar-only LOAM (ring-sparse
    ground after the collinearity gate), so assert the planar components the
    pipeline actually consumes.
    """
    T_a = np.eye(4)
    T_b = np.eye(4)
    T_b[:3, :3] = np.asarray(geo.so3_exp(jnp.array([0.0, 0.0, np.deg2rad(3.0)])))
    T_b[:3, 3] = [0.4, -0.3, 0.0]
    res = run_case(world, T_a, T_b, T_a, rng)
    assert bool(res.converged)
    xy, yaw = planar_error(res.pose, T_b)
    assert xy < 0.06, xy
    assert yaw < 0.01, yaw


def test_scan2map_multiscan_submap_full_se3(world, rng):
    """Multi-keyframe submap (the steady-state pipeline case): full SE(3)
    recovery including z."""
    _, poses = sim.make_trajectory(60, 0.1, speed=1.5)
    map_poses = [poses[20], poses[27], poses[34]]
    T_b = poses[30]
    guess = T_b.copy()
    guess[:3, 3] += [0.2, -0.2, 0.0]
    vm = build_map_fixture(world, map_poses, rng)
    scan_b = sim.simulate_scan(world, sim.sensor_from_body(T_b), rng=rng)
    ds_b = pcops.compact(vox.voxel_downsample(pcops.from_numpy(scan_b, 32768), 0.5), 8192)
    res = loam.scan2map(ds_b, vm, jnp.asarray(guess.astype(np.float32)))
    assert bool(res.converged)
    trans, rot = pose_error(res.pose, T_b)
    assert trans < 0.08, trans
    assert rot < 0.01, rot


def test_scan2map_empty_map_fails_gracefully(world, rng):
    vm = vox.build_voxel_map(
        pcops.empty(1024), 1.0, jnp.zeros(3), num_voxels=2048, slab_size=8
    )
    scan = sim.simulate_scan(world, sim.sensor_from_body(np.eye(4)), rng=rng)
    pc = pcops.compact(vox.voxel_downsample(pcops.from_numpy(scan, 32768), 0.5), 8192)
    res = loam.scan2map(pc, vm, jnp.eye(4))
    assert not bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.pose), np.eye(4), atol=1e-5)


def test_normal_equations_are_masked(world, rng):
    """Padding lanes must contribute nothing to JtJ."""
    T = np.eye(4)
    vm = build_map_fixture(world, T, rng)
    scan = sim.simulate_scan(world, sim.sensor_from_body(T), rng=rng)
    assert scan.shape[0] <= 16384
    pc_small = pcops.from_numpy(scan, 16384)
    pc_big = pcops.from_numpy(scan, 32768)  # same points, more padding
    J1 = loam.build_normal_equations(pc_small, vm, jnp.eye(4))
    J2 = loam.build_normal_equations(pc_big, vm, jnp.eye(4))
    np.testing.assert_allclose(np.asarray(J1[0]), np.asarray(J2[0]), rtol=2e-4, atol=2e-3)
    assert int(J1[2]) == int(J2[2])
