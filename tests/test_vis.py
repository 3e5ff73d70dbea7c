"""Vis egress: non-blocking publish, PLY output, sink callback."""

import os
import time

import numpy as np

from simpleslam_tpu.pipeline.vis import Vis, write_ply
from simpleslam_tpu.utils.config import Params


def test_ply_roundtrip_header(tmp_path):
    xyz = np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32)
    p = tmp_path / "a.ply"
    write_ply(str(p), xyz)
    data = p.read_bytes()
    assert data.startswith(b"ply\nformat binary_little_endian")
    assert b"element vertex 100" in data
    body = data.split(b"end_header\n", 1)[1]
    np.testing.assert_array_equal(
        np.frombuffer(body, np.float32).reshape(-1, 3), xyz)


def test_publish_writes_files(tmp_path):
    Params.load({})
    vis = Vis(out_dir=str(tmp_path))
    vis.register_pc_pub("aligned")
    xyz = np.zeros((10, 3), np.float32)
    pose = np.eye(4)
    pose[0, 3] = 5.0
    ok = vis.publish_pc("aligned", xyz, pose)
    assert ok
    for _ in range(100):
        if any(f.startswith("aligned") for f in os.listdir(tmp_path)):
            break
        time.sleep(0.02)
    vis.close()
    files = [f for f in os.listdir(tmp_path) if f.startswith("aligned")]
    assert files
    body = (tmp_path / files[0]).read_bytes().split(b"end_header\n", 1)[1]
    pts = np.frombuffer(body, np.float32).reshape(-1, 3)
    np.testing.assert_allclose(pts[:, 0], 5.0)  # pose applied


def test_disabled_vis_is_noop():
    Params.load({})
    vis = Vis()
    assert not vis.publish_pc("x", np.zeros((1, 3), np.float32))


def test_sink_callback():
    Params.load({})
    got = []
    vis = Vis(sink=lambda name, xyz, pose: got.append((name, len(xyz))))
    vis.publish_pc("submap", np.zeros((7, 3), np.float32))
    for _ in range(100):
        if got:
            break
        time.sleep(0.02)
    vis.close()
    assert got and got[0] == ("submap", 7)
