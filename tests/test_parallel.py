"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simpleslam_tpu.ops import loam, pointcloud as pcops, voxel as vox
from simpleslam_tpu.parallel.mesh import make_mesh
from simpleslam_tpu.parallel.dist_registration import sharded_scan2map
from simpleslam_tpu.pipeline import simulate as sim


@pytest.fixture(scope="module")
def reg_fixture():
    rng = np.random.default_rng(7)
    world = sim.make_world(seed=11)
    T = np.eye(4)
    scan = sim.simulate_scan(world, sim.sensor_from_body(T), rng=rng)
    pc_map = pcops.transform(pcops.from_numpy(scan, 32768), jnp.eye(4))
    ds = pcops.compact(vox.voxel_downsample(pc_map, 0.5), 16384)
    vm = vox.build_voxel_map(ds, 1.0, jnp.zeros(3, jnp.float32),
                             num_voxels=32768, slab_size=8)
    scan2 = sim.simulate_scan(world, sim.sensor_from_body(T), rng=rng)
    src = pcops.compact(vox.voxel_downsample(pcops.from_numpy(scan2, 32768), 0.5), 8192)
    guess = np.eye(4)
    guess[:3, 3] = [0.1, -0.1, 0.0]
    return src, vm, jnp.asarray(guess.astype(np.float32))


def test_mesh_factoring():
    m1 = make_mesh(8, ("dp",))
    assert m1.devices.shape == (8,)
    m2 = make_mesh(8, ("dp", "mp"))
    assert m2.devices.shape == (2, 4)


def test_sharded_scan2map_matches_single_device(reg_fixture):
    src, vm, guess = reg_fixture
    mesh = make_mesh(8, ("dp",))
    fn = sharded_scan2map(mesh)
    res_sharded = fn(src, vm, guess)
    res_single = loam.scan2map(src, vm, guess)
    assert bool(res_sharded.converged) == bool(res_single.converged)
    # identical math, different reduction order: tolerance is loose-ish
    np.testing.assert_allclose(
        np.asarray(res_sharded.pose), np.asarray(res_single.pose), atol=5e-3
    )
    assert abs(int(res_sharded.n_valid) - int(res_single.n_valid)) <= 2


def test_sharded_scan2map_dense_path(reg_fixture):
    """The dense-grid (fast single-chip) target shards too and matches it."""
    src, _, guess = reg_fixture
    dm = vox.build_dense_voxel_map(
        pcops.PointCloud(src.xyz, src.intensity, src.mask), 2.0,
        jnp.zeros(3, jnp.float32), dims=(96, 96, 16), slab_size=16)
    # rebuild the target from the module fixture's map points
    rng = np.random.default_rng(7)
    world = sim.make_world(seed=11)
    scan = sim.simulate_scan(world, sim.sensor_from_body(np.eye(4)), rng=rng)
    pc_map = pcops.from_numpy(scan, 32768)
    ds = pcops.compact(vox.voxel_downsample(pc_map, 0.5), 16384)
    dm = vox.build_dense_voxel_map(ds, 2.0, jnp.zeros(3, jnp.float32),
                                   dims=(96, 96, 16), slab_size=16)
    mesh = make_mesh(8, ("dp",))
    fn = sharded_scan2map(mesh)
    res_sharded = fn(src, dm, guess)
    res_single = loam.scan2map(src, dm, guess)
    assert bool(res_sharded.converged) == bool(res_single.converged)
    np.testing.assert_allclose(
        np.asarray(res_sharded.pose), np.asarray(res_single.pose), atol=5e-3
    )


def test_sharded_ndt_vgicp_match_single_device(reg_fixture):
    """NDT and VGICP sharded batch programs must match their single-device
    counterparts (the axis_reduce hook sums exactly what the local path
    sums, so only reduction order differs)."""
    import jax.numpy as jnp

    from simpleslam_tpu.ops import ndt as ndt_ops
    from simpleslam_tpu.ops import vgicp as vgicp_ops
    from simpleslam_tpu.pipeline.streamed import (make_sharded_batch,
                                                  UPLOAD_PAD, UPLOAD_SCALE,
                                                  _streamed_batch)

    src, _, guess = reg_fixture
    xyz = np.asarray(src.xyz)
    q = np.where(np.asarray(src.mask)[:, None],
                 np.clip(np.rint(xyz / UPLOAD_SCALE), -32766, 32766),
                 float(UPLOAD_PAD)).astype(np.int16)
    rows = jnp.asarray(np.tile(q[None], (2, 1, 1)))
    eyes = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (2, 1, 1)))
    map_pc = pcops.PointCloud(src.xyz, src.intensity, src.mask)
    center = jnp.zeros(3, jnp.float32)
    mesh = make_mesh(8, ("dp",))
    for kind, tgt in (("ndt", ndt_ops.build_target(map_pc, 1.0, center,
                                                   dims=(24, 24, 12))),
                      ("vgicp", vgicp_ops.build_target(map_pc, 1.0, center,
                                                       dims=(24, 24, 12)))):
        (_, _, _), p_single = _streamed_batch(
            rows, eyes, tgt, guess, guess, jnp.eye(4, dtype=jnp.float32),
            kind, "lo")
        fn = make_sharded_batch(mesh, kind, "lo", True, 0.0)
        (_, _, _), p_mesh = fn(rows, eyes, tgt, guess, guess,
                               jnp.eye(4, dtype=jnp.float32))
        np.testing.assert_allclose(np.asarray(p_mesh)[:, :16],
                                   np.asarray(p_single)[:, :16],
                                   atol=5e-3, err_msg=kind)
