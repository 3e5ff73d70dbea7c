"""Voxel map / downsample parity vs a straightforward numpy oracle.

Covers the roles the reference delegates to PCL VoxelGrid, VoxelDownSampleV2
(common/pcp/pcp.hpp) and nanoflann kd-trees (kNN correctness of the
voxel-slab map vs brute force).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from simpleslam_tpu.ops import pointcloud as pcops
from simpleslam_tpu.ops import voxel as vox


def make_cloud(rng, n=500, capacity=1024, scale=10.0):
    xyz = rng.normal(size=(n, 3)).astype(np.float32) * scale
    inten = rng.uniform(size=(n,)).astype(np.float32)
    return pcops.from_numpy(xyz, capacity, inten), xyz, inten


def oracle_downsample(xyz, grid, max_pts=20):
    """V2 semantics: centroid of first max_pts points per floor-voxel."""
    keys = np.floor(xyz / grid).astype(np.int64)
    voxels = {}
    for i, k in enumerate(map(tuple, keys)):
        voxels.setdefault(k, []).append(i)
    cents = []
    for k, idxs in voxels.items():
        pts = xyz[idxs[:max_pts]]
        cents.append(pts.mean(axis=0))
    return np.asarray(cents)


def test_voxel_downsample_matches_oracle(rng):
    pc, xyz, inten = make_cloud(rng)
    grid = 1.0
    out = vox.voxel_downsample(pc, grid)
    got = pcops.to_numpy(out)
    want = oracle_downsample(xyz, grid)
    assert got.shape == want.shape
    # compare as sets (order differs)
    got_sorted = got[np.lexsort(got.T)]
    want_sorted = want[np.lexsort(want.T)]
    np.testing.assert_allclose(got_sorted, want_sorted, atol=1e-4)


def test_voxel_downsample_max_pts_cap(rng):
    # 100 points in one voxel; cap 10 -> centroid of first 10 by input order
    xyz = rng.uniform(0.01, 0.49, size=(100, 3)).astype(np.float32)
    pc = pcops.from_numpy(xyz, 128)
    out = vox.voxel_downsample(pc, 0.5, max_pts_per_voxel=10)
    got = pcops.to_numpy(out)
    assert got.shape == (1, 3)
    np.testing.assert_allclose(got[0], xyz[:10].mean(axis=0), atol=1e-5)


def test_voxel_downsample_intensity_from_first_point(rng):
    xyz = np.array([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2], [5.0, 5.0, 5.0]], np.float32)
    inten = np.array([7.0, 8.0, 9.0], np.float32)
    pc = pcops.from_numpy(xyz, 8, inten)
    out = vox.voxel_downsample(pc, 1.0)
    vals = np.asarray(out.intensity)[np.asarray(out.mask)]
    assert set(np.round(vals, 3)) == {7.0, 9.0}


def test_voxel_downsample_empty():
    pc = pcops.empty(64)
    out = vox.voxel_downsample(pc, 0.5)
    assert int(out.count()) == 0


def test_build_voxel_map_and_lookup(rng):
    pc, xyz, _ = make_cloud(rng, n=300, capacity=512, scale=5.0)
    vm = vox.build_voxel_map(pc, 1.0, jnp.zeros(3), num_voxels=1024, slab_size=8)
    # every input point must be findable in its own voxel slab
    cand, valid = vox.gather_neighbors(vm, jnp.asarray(xyz), jnp.ones(len(xyz), bool), radius=0)
    cand = np.asarray(cand)
    valid = np.asarray(valid)
    for i in range(0, len(xyz), 37):
        d = np.linalg.norm(cand[i][valid[i]] - xyz[i], axis=1)
        assert d.min() < 1e-5


def test_knn_matches_bruteforce(rng):
    pc, xyz, _ = make_cloud(rng, n=400, capacity=512, scale=4.0)
    vm = vox.build_voxel_map(pc, 1.0, jnp.zeros(3), num_voxels=2048, slab_size=16)
    queries = xyz[:50] + rng.normal(size=(50, 3)).astype(np.float32) * 0.1
    sq, nbrs, valid = vox.knn(vm, jnp.asarray(queries), jnp.ones(50, bool), k=5, radius=1)
    sq, nbrs, valid = np.asarray(sq), np.asarray(nbrs), np.asarray(valid)
    for i in range(50):
        d2 = np.sum((xyz - queries[i]) ** 2, axis=1)
        brute = np.sort(d2)[:5]
        # voxel-knn only sees +-1 voxel: compare where brute-force NN is within
        # the guaranteed coverage radius (grid = 1.0)
        covered = brute < 1.0
        np.testing.assert_allclose(sq[i][covered], brute[covered], atol=1e-4)


def test_knn_respects_mask(rng):
    pc, xyz, _ = make_cloud(rng, n=100, capacity=128)
    vm = vox.build_voxel_map(pc, 1.0, jnp.zeros(3), num_voxels=512, slab_size=8)
    q = jnp.asarray(xyz[:4])
    sq, _, valid = vox.knn(vm, q, jnp.zeros(4, bool), k=3)
    assert not bool(np.asarray(valid).any())


def test_gaussian_voxel_map(rng):
    # one dense gaussian blob per known voxel
    centers = np.array([[0.5, 0.5, 0.5], [3.5, 0.5, 0.5]], np.float32)
    pts = np.concatenate(
        [c + rng.normal(size=(200, 3)).astype(np.float32) * 0.1 for c in centers]
    )
    pc = pcops.from_numpy(pts, 512)
    gvm = vox.build_gaussian_voxel_map(pc, 1.0, jnp.zeros(3), num_voxels=256, min_points=6)
    means, covs, valid = vox.gather_gaussians(
        gvm, jnp.asarray(centers), jnp.ones(2, bool), jnp.asarray(vox.DIRECT7_OFFSETS)
    )
    means, covs, valid = np.asarray(means), np.asarray(covs), np.asarray(valid)
    for i, c in enumerate(centers):
        assert valid[i, 0]  # own voxel found
        blob = pts[i * 200:(i + 1) * 200]
        inside = blob[np.all(np.floor(blob) == np.floor(c), axis=1)]
        np.testing.assert_allclose(means[i, 0], inside.mean(axis=0), atol=1e-3)
        np.testing.assert_allclose(
            covs[i, 0], np.cov(inside.T, bias=True), atol=1e-3
        )


def test_pointcloud_transform_and_compact(rng):
    from simpleslam_tpu.ops import geometry as geo

    pc, xyz, _ = make_cloud(rng, n=50, capacity=128)
    T = np.asarray(geo.se3_exp(jnp.array([1.0, -2.0, 0.5, 0.1, 0.2, 0.3])))
    moved = pcops.transform(pc, jnp.asarray(T))
    want = (T[:3, :3] @ xyz.T).T + T[:3, 3]
    np.testing.assert_allclose(pcops.to_numpy(moved), want, atol=1e-4)
    # compact keeps order of valid points
    small = pcops.compact(moved, 64)
    np.testing.assert_allclose(pcops.to_numpy(small), want, atol=1e-4)


def test_pointcloud_concat(rng):
    a, xa, _ = make_cloud(rng, n=30, capacity=64)
    b, xb, _ = make_cloud(rng, n=20, capacity=64)
    c = pcops.concat(a, b, 128)
    got = pcops.to_numpy(c)
    assert got.shape == (50, 3)
    np.testing.assert_allclose(got, np.concatenate([xa, xb]), atol=1e-5)


def test_crop_range(rng):
    xyz = np.array([[0.0, 0, 0], [10, 0, 0], [0, 3, 0]], np.float32)
    pc = pcops.from_numpy(xyz, 8)
    out = pcops.crop_range(pc, jnp.zeros(3), 5.0)
    got = pcops.to_numpy(out)
    assert got.shape == (2, 3)
