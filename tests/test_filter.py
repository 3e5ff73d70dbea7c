"""EKF fusion filter: streaming vs batched-scan parity + fusion quality.

The reference validates its EKF against ROS robot_pose_ekf on recorded bags
(filter/test/ekf.cpp, README.md:21). Our analogue: the streaming numpy proxy
is the behavioral spec (mirrors EkfOdomProxy.cpp line by line) and the
lax.scan replay must match it; fusion quality is checked on simulated
wheel+imu streams against ground truth.
"""

import numpy as np
import pytest

from simpleslam_tpu.models import filter as flt
from simpleslam_tpu.pipeline import simulate as sim
from simpleslam_tpu.utils.config import Params


@pytest.fixture(autouse=True)
def _params():
    Params.load({})
    yield
    Params.reset()


def _streams(n_scans=40, seed=3):
    world = sim.make_world(seed=seed, n_buildings=0)
    return sim.simulate_sequence(world, n_scans=n_scans, seed=seed, n_az=60,
                                 n_el=2)


def _run_streaming(streams):
    proxy = flt.EkfOdomProxy(deque_size=0)
    wi = ii = 0
    W, I = len(streams.wheel_stamps), len(streams.imu_stamps)
    while wi < W or ii < I:
        tw = streams.wheel_stamps[wi] if wi < W else np.inf
        ti = streams.imu_stamps[ii] if ii < I else np.inf
        if ti <= tw:
            proxy.imu_handler(float(ti), streams.imu_quats[ii])
            ii += 1
        else:
            proxy.wheel_handler(float(tw), streams.wheel_poses[wi])
            wi += 1
    return proxy.local_odom.snapshot()


def test_scan_replay_matches_streaming():
    streams = _streams()
    stream_odo = _run_streaming(streams)

    tape = flt.build_tape(streams.wheel_stamps, streams.wheel_poses,
                          streams.imu_stamps, streams.imu_quats)
    res = flt.ekf_replay(tape)
    scan_odo = flt.replay_to_odometry(res)

    assert len(scan_odo) == len(stream_odo) > 0
    for a, b in zip(stream_odo, scan_odo):
        assert a.stamp == pytest.approx(b.stamp, abs=1e-5)
        # scan path runs f32, streaming f64: allow f32 accumulation drift
        np.testing.assert_allclose(a.odom, b.odom, atol=1e-3)


def test_fusion_tracks_ground_truth():
    streams = _streams(n_scans=60)
    odo = _run_streaming(streams)
    stamps = np.array([o.stamp for o in odo])
    xy = np.stack([o.odom[:2, 3] for o in odo])
    gt_xy = np.stack([
        np.interp(stamps, streams.scan_stamps, streams.gt_poses[:, i, 3])
        for i in (0, 1)
    ], axis=1)
    rmse = np.sqrt(np.mean(np.sum((xy - gt_xy) ** 2, axis=1)))
    # wheel noise is ~1% slip over ~9 m of travel; fused estimate stays close
    assert rmse < 0.5


def test_imu_update_rate_gated_by_wheel():
    """The IMU update only fires once per wheel predict (mUpdateImuFlag)."""
    proxy = flt.EkfOdomProxy(deque_size=0)
    q = np.array([1.0, 0, 0, 0])
    proxy.imu_handler(0.0, q)  # init
    x0 = proxy.x.copy()
    # many imu messages without any wheel predict: no updates at all
    for k in range(5):
        proxy.imu_handler(0.01 * (k + 1), np.array([np.cos(0.1), 0, 0, np.sin(0.1)]))
    np.testing.assert_array_equal(proxy.x, x0)

    proxy.wheel_handler(0.06, np.eye(4))  # init wheel
    proxy.wheel_handler(0.11, np.eye(4))  # predict + sets flag
    proxy.imu_handler(0.12, np.array([np.cos(0.1), 0, 0, np.sin(0.1)]))
    assert proxy.x[2] != x0[2]  # update fired
    x1 = proxy.x.copy()
    proxy.imu_handler(0.13, np.array([np.cos(0.2), 0, 0, np.sin(0.2)]))
    np.testing.assert_array_equal(proxy.x, x1)  # flag consumed, gated again


def test_dt_squared_noise_scaling():
    """Parity with the modified Kalman lib: P grows with dt^2 on predict."""
    P = np.eye(3) * 1e-8
    var = np.array([1.0, 1.0, 0.01])
    P1 = flt.ekf_predict(P, 0.1, var)
    P2 = flt.ekf_predict(P, 0.2, var)
    np.testing.assert_allclose((P2 - P)[0, 0] / (P1 - P)[0, 0], 4.0, rtol=1e-6)


def test_chunked_replay_matches_whole_tape():
    """The incremental chunked replay (the lio feeder's path) is
    bit-identical to the whole-tape scan across chunk boundaries — interior
    chunks are unpadded, so the carried filter state must line up exactly."""
    streams = _streams(n_scans=40, seed=7)
    ev = flt.build_tape_arrays(streams.wheel_stamps, streams.wheel_poses,
                               streams.imu_stamps, streams.imu_quats)
    stamps, is_wheel, xy, wyaw, iyaw = ev
    n = len(stamps)
    assert n > 300  # enough events for several chunks below

    whole = flt.ekf_replay(flt.build_tape(
        streams.wheel_stamps, streams.wheel_poses,
        streams.imu_stamps, streams.imu_quats))
    w_em = np.asarray(whole.emitted)
    w_st = np.asarray(whole.stamps)[w_em]
    w_xs = np.asarray(whole.states)[w_em]

    chunk = 128  # force many boundaries
    carry = flt.ekf_carry0()
    c_st, c_xs = [], []
    pos = 0
    while pos < n:
        hi = min(pos + chunk, n)
        sl = slice(pos, hi)
        im = ~is_wheel[sl]
        last_iy = float(iyaw[sl][im][-1]) if im.any() else 0.0
        tape = flt.pad_tape_chunk(stamps[sl], is_wheel[sl], xy[sl],
                                  wyaw[sl], iyaw[sl], chunk, last_iy)
        carry, res = flt.ekf_replay_chunk(carry, tape)
        em = np.asarray(res.emitted)
        c_st.append(np.asarray(res.stamps)[em])
        c_xs.append(np.asarray(res.states)[em])
        pos = hi
    c_st = np.concatenate(c_st)
    c_xs = np.concatenate(c_xs)

    assert len(c_st) == len(w_st) > 0
    np.testing.assert_array_equal(c_st, w_st)
    np.testing.assert_array_equal(c_xs, w_xs)
