"""End-to-end lio-mode: EKF wheel+imu LocalOdom + scan matching.

The lio-mode object graph (app/main.cpp:107-118 'lio' branch): the frontend
shares the EKF proxy's deque, pose prediction comes from
``odom2map * local_odom`` (LidarOdometry.cpp:129), and odom2map is refreshed
after every scan (:233-239).
"""

import numpy as np
import pytest

from simpleslam_tpu.pipeline import app, simulate as sim
from simpleslam_tpu.utils.config import Params


@pytest.fixture(scope="module")
def lio_result():
    Params.load({"mode": "lio", "backend": {"enable": False},
                 "tpu": {"scan_capacity": 16384}})
    world = sim.make_world(seed=7)
    streams = sim.cache_streams(
        "lio60s7", lambda: sim.simulate_sequence(world, n_scans=60, seed=7))
    system = app.SlamSystem()
    result = app.run_offline(system, streams)
    return streams, result, system


def test_lio_trajectory_accuracy(lio_result):
    streams, result, _ = lio_result
    ate = sim.ate_rmse(streams.gt_poses, result.poses, align=False)
    assert ate < 0.15, ate


def test_lio_uses_local_odom(lio_result):
    _, result, system = lio_result
    # the EKF proxy produced a local odom stream and odom2map was initialized
    assert system.ekf_proxy is not None
    assert system.frontend.is_init_odom2map()
    # odom2map stays small: the EKF odom frame starts at the map origin and
    # only drifts by wheel slip over the short run
    o2m = system.frontend.odom2map.load()
    assert np.linalg.norm(o2m[:3, 3]) < 1.0
    assert result.converged_frac > 0.9
