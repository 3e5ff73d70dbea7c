"""Recorded-data ingest tests: ROS1 bag round-trip + KITTI reader.

The reference replays real rosbags (app/main.cpp:155-207); the private
recordings aren't available, so the writer (fixture converter) persists a
synthetic sequence as a real v2.0 bag and the reader is validated round-trip,
including on a bz2-recompressed copy.
"""

import bz2
import os
import struct

import numpy as np
import pytest

from simpleslam_tpu.pipeline import bagio, simulate as sim


@pytest.fixture(scope="module")
def streams():
    world = sim.make_world(seed=0)
    return sim.simulate_sequence(world, n_scans=8, seed=0)


def test_bag_roundtrip(tmp_path, streams):
    path = str(tmp_path / "seq.bag")
    bagio.bag_from_streams(streams, path)
    back = bagio.streams_from_bag(path, "/lidar_points", "/wheel_odom", "/imu")

    np.testing.assert_allclose(back.scan_stamps, streams.scan_stamps,
                               atol=1e-9)
    assert len(back.scans) == len(streams.scans)
    for a, b in zip(back.scans, streams.scans):
        np.testing.assert_allclose(a, np.asarray(b, np.float32), atol=1e-6)
    np.testing.assert_allclose(back.wheel_stamps, streams.wheel_stamps,
                               atol=1e-9)
    np.testing.assert_allclose(back.wheel_poses, streams.wheel_poses,
                               atol=1e-6)
    np.testing.assert_allclose(back.imu_stamps, streams.imu_stamps, atol=1e-9)
    # quaternions match up to sign
    dots = np.abs(np.einsum("ij,ij->i", back.imu_quats, streams.imu_quats))
    np.testing.assert_allclose(
        dots, np.linalg.norm(streams.imu_quats, axis=1) ** 2, atol=1e-6)


def test_bag_message_order_and_topics(tmp_path, streams):
    path = str(tmp_path / "seq.bag")
    bagio.bag_from_streams(streams, path)
    msgs = list(bagio.read_bag(path))
    stamps = [t for _, _, t in msgs]
    assert stamps == sorted(stamps)
    topics = {topic for topic, _, _ in msgs}
    assert topics == {"/lidar_points", "/wheel_odom", "/imu"}
    # topic filtering
    only = list(bagio.read_bag(path, topics=["/imu"]))
    assert all(t == "/imu" for t, _, _ in only)
    assert len(only) == len(streams.imu_stamps)


def test_bag_bz2_chunks(tmp_path, streams):
    """Reader handles bz2-compressed chunks (common in recorded bags)."""
    plain = str(tmp_path / "plain.bag")
    bagio.bag_from_streams(streams, plain)

    # recompress every chunk record as bz2
    with open(plain, "rb") as f:
        assert f.read(len(bagio.MAGIC)) == bagio.MAGIC
        buf = f.read()
    out = [bagio.MAGIC]
    for fields, data in bagio._iter_records(buf):
        if fields["op"][0] == bagio._OP_CHUNK:
            comp = bz2.compress(data)
            out.append(bagio._w_record(
                {"op": bytes([bagio._OP_CHUNK]), "compression": b"bz2",
                 "size": struct.pack("<I", len(data))}, comp))
        else:
            out.append(bagio._w_record(fields, data))
    packed = str(tmp_path / "packed.bag")
    with open(packed, "wb") as f:
        f.write(b"".join(out))

    a = list(bagio.read_bag(plain))
    b = list(bagio.read_bag(packed))
    assert len(a) == len(b)
    for (ta, ma, sa), (tb, mb, sb) in zip(a, b):
        assert ta == tb and sa == sb and type(ma) is type(mb)


def test_navsatfix_roundtrip(tmp_path):
    """GPS fix messages survive (the eval/gps.py ground-truth path)."""
    msgs = [("/gps", bagio.NavSatFix(float(i), "gps", 30.0 + i * 1e-5,
                                     114.0, 10.0, status=2), float(i))
            for i in range(5)]
    path = str(tmp_path / "gps.bag")
    bagio.write_bag(path, msgs)
    back = list(bagio.read_bag(path))
    assert len(back) == 5
    for i, (topic, m, t) in enumerate(back):
        assert topic == "/gps"
        assert m.lat == pytest.approx(30.0 + i * 1e-5)
        assert m.status == 2


def test_kitti_reader(tmp_path, streams):
    seq = tmp_path / "00"
    vdir = seq / "velodyne"
    os.makedirs(vdir)
    for i, scan in enumerate(streams.scans[:4]):
        arr = np.zeros((len(scan), 4), np.float32)
        arr[:, :3] = scan
        arr.tofile(str(vdir / f"{i:06d}.bin"))
    with open(seq / "times.txt", "w") as f:
        for t in streams.scan_stamps[:4]:
            f.write(f"{t:.6f}\n")

    got = bagio.kitti_streams(str(vdir))
    assert len(got.scans) == 4
    np.testing.assert_allclose(got.scan_stamps, streams.scan_stamps[:4],
                               atol=1e-6)
    np.testing.assert_allclose(got.scans[2],
                               np.asarray(streams.scans[2], np.float32),
                               atol=1e-6)


def test_mapping_from_bag(tmp_path, streams):
    """End-to-end: a bag-fed replay maps like the in-memory sequence."""
    from simpleslam_tpu.pipeline import app
    from simpleslam_tpu.pipeline.streamed import run_streamed
    from simpleslam_tpu.utils.config import Params

    path = str(tmp_path / "seq.bag")
    bagio.bag_from_streams(streams, path)
    back = bagio.streams_from_bag(path, "/lidar_points", "/wheel_odom", "/imu")

    Params.load({"mode": "lo", "backend": {"enable": False},
                 "frontend": {"pcr": "loam"}})
    res = run_streamed(app.SlamSystem(), back)
    ate = sim.ate_rmse(streams.gt_poses, res.poses, align=False)
    assert res.converged_frac > 0.8
    assert ate < 0.5


def test_cli_bag_replay(tmp_path, streams):
    """The app CLI replays a recorded bag through the streamed executor and
    persists the checkpoint artifacts (the app/main.cpp:155-207 user path)."""
    from simpleslam_tpu.pipeline import app

    path = str(tmp_path / "seq.bag")
    out = str(tmp_path / "map")
    bagio.bag_from_streams(streams, path)
    rc = app.main(["--bag", path, "--streamed", "--mode", "lo", "--out", out])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "tum.txt"))
    assert os.path.exists(os.path.join(out, "fg.g2o"))
    assert os.path.exists(os.path.join(out, "0.pcd"))
