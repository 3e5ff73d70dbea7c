"""Native host-runtime kernels: C++ path vs numpy fallback parity."""

import numpy as np
import pytest

from simpleslam_tpu import native


def test_native_library_builds():
    assert native.available(), "g++ toolchain present in image; build must succeed"


def test_voxel_downsample_first_semantics(rng):
    xyz = rng.uniform(-10, 10, (5000, 3)).astype(np.float32)
    out = native.voxel_downsample_first(xyz, 0.5)
    # one point per occupied voxel, each output present in the input
    keys = np.floor(out / 0.5).astype(np.int64)
    assert len(np.unique(keys, axis=0)) == len(out)
    keys_in = np.floor(xyz / 0.5).astype(np.int64)
    assert len(out) == len(np.unique(keys_in, axis=0))
    # first-point semantics: the kept point is the first of its voxel
    all_keys = [tuple(k) for k in keys_in]
    first_of = {}
    for i, k in enumerate(all_keys):
        if k not in first_of:
            first_of[k] = xyz[i]
    for p in out[:100]:
        k = tuple(np.floor(p / 0.5).astype(np.int64))
        np.testing.assert_array_equal(first_of[k], p)


def test_pad_cloud(rng):
    xyz = rng.normal(size=(100, 3)).astype(np.float32)
    xyz[7] = np.nan
    out, mask, n = native.pad_cloud(xyz, 128, 1e6)
    assert n == 99 and mask.sum() == 99
    np.testing.assert_array_equal(out[99:], 1e6)
    np.testing.assert_array_equal(out[:7], xyz[:7])
    np.testing.assert_array_equal(out[7], xyz[8])  # NaN row skipped


def test_pad_cloud_truncates(rng):
    xyz = rng.normal(size=(100, 3)).astype(np.float32)
    out, mask, n = native.pad_cloud(xyz, 50, 1e6)
    assert n == 50 and mask.all()


def test_transform_concat(rng):
    clouds = [rng.normal(size=(50, 3)).astype(np.float32) for _ in range(4)]
    poses = []
    for i in range(4):
        T = np.eye(4)
        th = 0.3 * i
        T[0, 0], T[0, 1], T[1, 0], T[1, 1] = (np.cos(th), -np.sin(th),
                                              np.sin(th), np.cos(th))
        T[:3, 3] = [i, -i, 0.5 * i]
        poses.append(T)
    out = native.transform_concat(clouds, np.stack(poses))
    ref = np.concatenate([
        c @ p[:3, :3].T.astype(np.float32) + p[:3, 3].astype(np.float32)
        for c, p in zip(clouds, poses)
    ])
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_voxel_downsample_batch_matches_single(rng):
    scans = [rng.normal(size=(n, 3)).astype(np.float32) * 10.0
             for n in (1000, 3777, 256)]
    scans[1][5] = np.nan  # NaN rows stripped identically
    rows, cnts = native.voxel_downsample_centroid_pad_batch(
        scans, 0.5, 2048, 1e9)
    assert rows.shape == (3, 2048, 3)
    for i, s in enumerate(scans):
        row1, cnt1 = native.voxel_downsample_centroid_pad(s, 0.5, 2048, 1e9)
        assert cnt1 == cnts[i]
        np.testing.assert_array_equal(rows[i], row1)


def test_quant_batch_drops_out_of_range(rng):
    """Returns beyond the int16 quantization range are DROPPED, not clamped
    to phantom points on the +-125 m box (C++ kernel and numpy fallback)."""
    from simpleslam_tpu.pipeline.streamed import UPLOAD_SCALE

    pts = rng.uniform(-40, 40, size=(500, 3)).astype(np.float32)
    pts[:7] = [[300.0, 0.0, 1.0]] * 7        # beyond +-125 m on x
    pts[7:10] = [[5.0, -1.0, -4000.0]] * 3   # beyond on z
    rows, cnts = native.voxel_downsample_sort_quant_batch(
        [pts], 0.5, 2048, 0.0, UPLOAD_SCALE)
    c = int(cnts[0])
    xyz = rows[0][:c].astype(np.float32) * UPLOAD_SCALE
    assert np.abs(xyz).max() < 126.0
    # no clamped phantoms sitting on the box faces
    assert not np.any(np.abs(np.abs(xyz) - 32766 * UPLOAD_SCALE) < 1e-3)
    # everything in range survived the downsample
    assert c > 0
    # the padding tail carries the sentinel
    assert np.all(rows[0][c:] == 32767)
