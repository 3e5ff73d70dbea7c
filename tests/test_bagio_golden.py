"""Golden-fixture + robustness tests for the ROS1 bag reader.

``tests/data/golden_indexed.bag`` is a checked-in binary assembled
byte-by-byte from the public v2.0 spec by an INDEPENDENT generator
(tests/data/gen_golden_bag.py — not bagio.write_bag), with the layout real
rostools emit and the round-trip tests can't cover: 4096-padded bag header
with backpatched index_pos, connection records repeated per chunk, a
LATCHED connection, MIXED chunk compression (none + bz2), index data and
chunk-info records. The fuzz test exercises the reader against truncation
and byte corruption: every failure must be a clean ValueError, never a
stray low-level exception or a hang.
"""

import os

import numpy as np
import pytest

from simpleslam_tpu.pipeline import bagio

GOLDEN = os.path.join(os.path.dirname(__file__), "data", "golden_indexed.bag")


@pytest.fixture(scope="module")
def golden_msgs():
    return list(bagio.read_bag(GOLDEN))


def test_golden_layout_parses(golden_msgs):
    assert len(golden_msgs) == 7
    topics = [t for t, _, _ in golden_msgs]
    assert topics.count("/points_latched") == 4  # across all three chunks
    assert topics.count("/imu") == 3
    # messages from the bz2 chunk (12.0+) AND the lz4 chunk (13.0+) arrived
    stamps = sorted(s for _, _, s in golden_msgs)
    assert stamps == [10.0, 10.5, 11.0, 12.0, 12.25, 13.0, 13.5]


def test_golden_payloads_decode(golden_msgs):
    rng = np.random.default_rng(7)
    clouds = [rng.normal(size=(50, 3)).astype(np.float32) for _ in range(4)]
    pcs = [m for t, m, _ in golden_msgs if t == "/points_latched"]
    for got, want in zip(pcs, clouds):
        np.testing.assert_allclose(got.xyz, want, rtol=1e-6)
    imus = [m for t, m, _ in golden_msgs if t == "/imu"]
    np.testing.assert_allclose(imus[1].quat,
                               [0.9238795, 0.0, 0.0, 0.3826834], atol=1e-6)


def test_golden_topic_filter():
    msgs = list(bagio.read_bag(GOLDEN, topics=["/imu"]))
    assert len(msgs) == 3
    assert all(t == "/imu" for t, _, _ in msgs)


def test_lz4_codec_roundtrip():
    """Pure-python LZ4 frame codec: spec vectors + roundtrips, incl. the
    compressed-block path (the golden fixture's lz4 chunk uses raw blocks)."""
    # xxh32 reference vectors (the frame header checksum depends on it)
    assert bagio._xxh32(b"") == 0x02CC5D05
    assert bagio._xxh32(b"a") == 0x550D7456
    assert bagio._xxh32(b"abc") == 0x32D153FF
    rng = np.random.default_rng(3)
    for n in (0, 1, 17, 1000, 65536, 70001, 200000):
        data = bytes(rng.integers(0, 40, n, dtype=np.uint8))  # compressible
        assert bagio.lz4_decompress_frame(bagio.lz4_compress_frame(data)) \
            == data
    rep = b"the spammish repetition " * 4096
    frame = bagio.lz4_compress_frame(rep)
    assert len(frame) < len(rep) // 10  # actually compressed
    assert bagio.lz4_decompress_frame(frame) == rep


def test_lz4_bag_roundtrip(tmp_path):
    """write_bag(compression='lz4') -> read_bag end-to-end."""
    rng = np.random.default_rng(11)
    msgs = []
    for i in range(6):
        pc = bagio.PointCloud2(stamp=float(i), frame_id="l",
                               xyz=rng.normal(size=(200, 3)
                                              ).astype(np.float32),
                               intensity=None)
        msgs.append(("/pts", pc, float(i)))
    p = tmp_path / "lz4.bag"
    bagio.write_bag(str(p), msgs, chunk_msgs=2, compression="lz4")
    got = list(bagio.read_bag(str(p)))
    assert len(got) == 6
    for (_, m, _), (_, w, _) in zip(got, msgs):
        np.testing.assert_allclose(m.xyz, w.xyz, rtol=1e-6)


def test_lz4_frame_truncation_fuzz():
    """Truncated/corrupt lz4 frames must raise ValueError, never hang or
    throw a low-level exception."""
    rng = np.random.default_rng(5)
    data = bytes(rng.integers(0, 30, 50000, dtype=np.uint8))
    frame = bagio.lz4_compress_frame(data)
    for cut in list(range(0, len(frame), 97)) + [len(frame) - 1]:
        try:
            bagio.lz4_decompress_frame(frame[:cut])
        except ValueError:
            pass
    buf = bytearray(frame)
    for _ in range(80):
        pos = int(rng.integers(0, len(buf)))
        old = buf[pos]
        buf[pos] ^= 0xFF
        try:
            bagio.lz4_decompress_frame(bytes(buf))
        except ValueError:
            pass
        buf[pos] = old


def test_truncation_fuzz(tmp_path):
    """Every truncation point either parses a clean prefix or raises
    ValueError — never a random exception, never a hang."""
    raw = open(GOLDEN, "rb").read()
    for cut in list(range(0, len(raw), 173)) + [len(raw) - 1]:
        p = tmp_path / "t.bag"
        p.write_bytes(raw[:cut])
        try:
            list(bagio.read_bag(str(p)))
        except ValueError:
            pass


def test_corruption_fuzz(tmp_path):
    """Flipping bytes anywhere must fail cleanly (or parse, if the byte was
    slack padding)."""
    raw = bytearray(open(GOLDEN, "rb").read())
    rng = np.random.default_rng(0)
    for _ in range(60):
        pos = int(rng.integers(0, len(raw)))
        old = raw[pos]
        raw[pos] ^= 0xFF
        p = tmp_path / "c.bag"
        p.write_bytes(bytes(raw))
        try:
            list(bagio.read_bag(str(p)))
        except ValueError:
            pass
        raw[pos] = old
