"""One-off generator for tests/data/golden_indexed.bag.

Assembles an INDEXED ROS1 v2.0 bag byte-by-byte from the public format
spec (http://wiki.ros.org/Bags/Format/2.0) with its own record/header
helpers — deliberately NOT via bagio.write_bag — so the checked-in fixture
exercises the reader against an independent encoding of the layout real
rostools produce:

- 4096-byte padded bag header record (op=0x03) with a backpatched index_pos
- connection records REPEATED inside every chunk that uses them (rosbag
  behavior), with full connection headers including callerid and a LATCHED
  connection (latching=1)
- three chunks with MIXED compression: 'none', 'bz2', 'lz4' (the lz4 frame
  hand-assembled from the frame spec with uncompressed blocks — independent
  of bagio's own codec)
- index data records (op=0x04, ver=1) after each chunk
- trailing connection + chunk-info (op=0x06, ver=1) records

Run from the repo root: python tests/data/gen_golden_bag.py
"""

import bz2
import os
import struct
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np  # noqa: E402

from simpleslam_tpu.pipeline import bagio  # noqa: E402  (message payloads only)

OUT = os.path.join(os.path.dirname(__file__), "golden_indexed.bag")


def fields(d):
    out = b""
    for k, v in d.items():
        kv = k.encode() + b"=" + v
        out += struct.pack("<I", len(kv)) + kv
    return out


def record(hdr, data):
    h = fields(hdr)
    return struct.pack("<I", len(h)) + h + struct.pack("<I", len(data)) + data


def t_bytes(sec, nsec):
    return struct.pack("<II", sec, nsec)


def main():
    pc_type = "sensor_msgs/PointCloud2"
    imu_type = "sensor_msgs/Imu"
    conns = [
        # latched map-style topic (rosbag stores latching in the wrapped
        # connection header alongside callerid)
        (0, "/points_latched", pc_type, {b"latching": b"1",
                                         b"callerid": b"/map_server"}),
        (1, "/imu", imu_type, {b"callerid": b"/imu_driver"}),
    ]

    def conn_record(cid, topic, mtype, extra):
        inner = {"topic": topic.encode(), "type": mtype.encode(),
                 "md5sum": bagio._MD5[mtype].encode(),
                 "message_definition": b"spec text elided"}
        for k, v in extra.items():
            inner[k.decode()] = v
        return record({"op": b"\x07", "conn": struct.pack("<I", cid),
                       "topic": topic.encode()}, fields(inner))

    def msg_record(cid, sec, nsec, payload):
        return record({"op": b"\x02", "conn": struct.pack("<I", cid),
                       "time": t_bytes(sec, nsec)}, payload)

    rng = np.random.default_rng(7)
    clouds = [rng.normal(size=(50, 3)).astype(np.float32) for _ in range(4)]
    imus = [(1.0, 0.0, 0.0, 0.0), (0.9238795, 0.0, 0.0, 0.3826834)]

    def pc_payload(i, sec):
        m = bagio.PointCloud2(stamp=float(sec), frame_id="lidar",
                              xyz=clouds[i], intensity=None)
        return bagio.ser_pointcloud2(m)

    def imu_payload(q, sec):
        m = bagio.Imu(stamp=float(sec), frame_id="imu",
                      quat=np.array(q, np.float64))
        return bagio.ser_imu(m)

    # ---- chunk payloads (connections repeated per chunk) -------------------
    chunk0_msgs = [
        (0, 10, 0, pc_payload(0, 10)),
        (1, 10, 500000000, imu_payload(imus[0], 10)),
        (0, 11, 0, pc_payload(1, 11)),
    ]
    chunk1_msgs = [
        (1, 12, 0, imu_payload(imus[1], 12)),
        (0, 12, 250000000, pc_payload(2, 12)),
    ]
    chunk2_msgs = [
        (0, 13, 0, pc_payload(3, 13)),
        (1, 13, 500000000, imu_payload(imus[0], 13)),
    ]

    def lz4_frame_raw(payload):
        """Independent spec-level LZ4 frame: magic, FLG (v01 + block
        independence), BD (64 KB max block), header-checksum byte (xxh32 of
        FLG+BD >> 8 = 0x82 for these flags, per the frame spec), then the
        payload as UNCOMPRESSED blocks (size | 0x80000000) and the EndMark.
        A legal frame every decoder accepts — and deliberately NOT built by
        bagio's own encoder."""
        out = bytearray()
        out += (0x184D2204).to_bytes(4, "little")
        out += bytes([0x60, 0x40, 0x82])
        for i in range(0, len(payload), 65536):
            blk = payload[i:i + 65536]
            out += (len(blk) | 0x80000000).to_bytes(4, "little")
            out += blk
        out += (0).to_bytes(4, "little")
        return bytes(out)

    def build_chunk(msgs):
        parts = []
        offsets = []
        base = 0
        for cid, topic, mtype, extra in conns:
            if any(m[0] == cid for m in msgs):
                cr = conn_record(cid, topic, mtype, extra)
                parts.append(cr)
                base += len(cr)
        for cid, sec, nsec, payload in msgs:
            offsets.append((cid, sec, nsec, base))
            mr = msg_record(cid, sec, nsec, payload)
            parts.append(mr)
            base += len(mr)
        return b"".join(parts), offsets

    out = bytearray()
    out += b"#ROSBAG V2.0\n"

    # bag header record padded to 4096 total
    def bag_header(index_pos):
        h = fields({"op": b"\x03", "index_pos": struct.pack("<Q", index_pos),
                    "conn_count": struct.pack("<I", 2),
                    "chunk_count": struct.pack("<I", 3)})
        pad = 4096 - 8 - len(h)
        return (struct.pack("<I", len(h)) + h
                + struct.pack("<I", pad) + b" " * pad)

    out += bag_header(0)

    chunk_info = []
    for k, (msgs, comp) in enumerate(((chunk0_msgs, b"none"),
                                      (chunk1_msgs, b"bz2"),
                                      (chunk2_msgs, b"lz4"))):
        payload, offsets = build_chunk(msgs)
        stored = (bz2.compress(payload) if comp == b"bz2"
                  else lz4_frame_raw(payload) if comp == b"lz4"
                  else payload)
        pos = len(out)
        out += record({"op": b"\x05", "compression": comp,
                       "size": struct.pack("<I", len(payload))}, stored)
        # per-connection index data records (ver 1)
        per_conn = {}
        for cid, sec, nsec, off in offsets:
            per_conn.setdefault(cid, []).append((sec, nsec, off))
        for cid, entries in sorted(per_conn.items()):
            data = b"".join(t_bytes(s, ns) + struct.pack("<I", off)
                            for s, ns, off in entries)
            out += record({"op": b"\x04", "ver": struct.pack("<I", 1),
                           "conn": struct.pack("<I", cid),
                           "count": struct.pack("<I", len(entries))}, data)
        times = [(s, ns) for _, s, ns, _ in msgs]
        counts = {}
        for cid, *_ in msgs:
            counts[cid] = counts.get(cid, 0) + 1
        chunk_info.append((pos, min(times), max(times), counts))

    index_pos = len(out)
    for cid, topic, mtype, extra in conns:
        out += conn_record(cid, topic, mtype, extra)
    for pos, (s0, ns0), (s1, ns1), counts in chunk_info:
        data = b"".join(struct.pack("<II", cid, c)
                        for cid, c in sorted(counts.items()))
        out += record({"op": b"\x06", "ver": struct.pack("<I", 1),
                       "chunk_pos": struct.pack("<Q", pos),
                       "start_time": t_bytes(s0, ns0),
                       "end_time": t_bytes(s1, ns1),
                       "count": struct.pack("<I", len(counts))}, data)

    # backpatch index_pos
    out[13:13 + 4096] = bag_header(index_pos)

    with open(OUT, "wb") as f:
        f.write(bytes(out))
    print(f"wrote {OUT}: {len(out)} bytes")


if __name__ == "__main__":
    main()
