"""Infra tests: config, logging flag, SafeDeque, ResidentThread, file IO.

Mirrors the reference's concurrency/infra drivers (test/safedeque.cpp,
test/thread.cpp, test/config.cpp, test/file.cpp).
"""

import threading
import time

import numpy as np
import pytest

from simpleslam_tpu.ops import geometry as geo
from simpleslam_tpu.utils import fileio
from simpleslam_tpu.utils.concurrency import AtomicVar, ResidentThread, SafeDeque
from simpleslam_tpu.utils.config import Params
from simpleslam_tpu.utils.logging import Logger


def test_config_defaults_and_overrides(tmp_path):
    p = Params.get_instance()
    assert p["frontend"]["pcr"] == "loam"
    cfg_file = tmp_path / "params.json"
    cfg_file.write_text('{\n // comment line\n "mode": "lio", "frontend": {"pcr": "ndt"}\n}')
    p = Params.load(str(cfg_file))
    assert p["mode"] == "lio"
    assert p["frontend"]["pcr"] == "ndt"
    assert p["frontend"]["local_size"] == 100  # deep-merge keeps defaults
    # returned copies are independent
    p["mode"] = "corrupted"
    assert Params.get_instance()["mode"] == "lio"


def test_logger_exit_flag():
    lg = Logger.get_instance()
    assert not lg.is_program_exit()
    lg.exit_program()
    assert lg.is_program_exit()


def test_safedeque_drop_oldest():
    q = SafeDeque(capacity=3)
    for i in range(5):
        q.push_back(i, block=False)
    assert q.snapshot() == [2, 3, 4]


def test_safedeque_blocking_backpressure():
    q = SafeDeque(capacity=2)
    q.push_back(0)
    q.push_back(1)
    done = []

    def producer():
        done.append(q.push_back(2, block=True, timeout=5))

    t = threading.Thread(target=producer)
    t.start()
    time.sleep(0.05)
    assert not done  # blocked while full
    assert q.consume_front() == 0
    t.join(timeout=5)
    assert done == [True]
    assert q.snapshot() == [1, 2]


def test_safedeque_abort_releases_producer():
    q = SafeDeque(capacity=1)
    q.push_back(0)
    results = []

    def producer():
        results.append(q.push_back(1, block=True, timeout=5))

    t = threading.Thread(target=producer)
    t.start()
    time.sleep(0.05)
    q.abort()
    t.join(timeout=5)
    assert results == [False]


def test_safedeque_mpmc_stress():
    q = SafeDeque(capacity=16)
    n_per = 200
    consumed = []
    lock = threading.Lock()

    def producer(base):
        for i in range(n_per):
            q.push_back(base + i, block=True)

    def consumer():
        while True:
            item = q.consume_front(block=True, timeout=1)
            if item is None:
                return
            with lock:
                consumed.append(item)

    producers = [threading.Thread(target=producer, args=(k * 1000,)) for k in range(3)]
    consumers = [threading.Thread(target=consumer) for _ in range(2)]
    for t in producers + consumers:
        t.start()
    for t in producers:
        t.join()
    for t in consumers:
        t.join()
    assert len(consumed) == 3 * n_per
    assert len(set(consumed)) == 3 * n_per


def test_resident_thread_stop_resume():
    counter = {"n": 0}
    ev = threading.Event()

    def work():
        counter["n"] += 1
        ev.set()
        time.sleep(0.005)

    rt = ResidentThread(work, name="worker")
    assert ev.wait(timeout=2)
    rt.pause()
    time.sleep(0.05)
    paused_at = counter["n"]
    time.sleep(0.05)
    assert counter["n"] <= paused_at + 1
    rt.resume()
    time.sleep(0.05)
    assert counter["n"] > paused_at
    rt.stop()
    rt.join(timeout=2)
    assert not rt.is_alive()


def test_atomic_var():
    av = AtomicVar(np.eye(4))
    av.store(np.ones((4, 4)))
    np.testing.assert_array_equal(av.load(), np.ones((4, 4)))


def test_tum_roundtrip(tmp_path, rng):
    import jax.numpy as jnp

    n = 5
    w = rng.normal(size=(n, 3)).astype(np.float32) * 0.5
    t = rng.normal(size=(n, 3)).astype(np.float32) * 10
    poses = np.asarray(geo.make_pose(geo.so3_exp(jnp.asarray(w)), jnp.asarray(t)))
    stamps = np.arange(n) * 0.1 + 100.0
    fileio.write_tum(str(tmp_path), stamps, poses)
    s2, p2 = fileio.load_tum(str(tmp_path))
    np.testing.assert_allclose(s2, stamps, atol=1e-3)
    np.testing.assert_allclose(p2[:, :3, 3], poses[:, :3, 3], atol=2e-3)
    np.testing.assert_allclose(p2[:, :3, :3], poses[:, :3, :3], atol=1e-4)
    # append mode
    fileio.write_tum(str(tmp_path), stamps[:1] + 10, poses[:1], append=True)
    s3, _ = fileio.load_tum(str(tmp_path))
    assert len(s3) == n + 1
    fileio.remove_tum(str(tmp_path))
    s4, _ = fileio.load_tum(str(tmp_path))
    assert len(s4) == 0


@pytest.mark.parametrize("binary", [True, False])
def test_pcd_roundtrip(tmp_path, rng, binary):
    xyz = rng.normal(size=(100, 3)).astype(np.float32) * 20
    inten = rng.uniform(size=(100,)).astype(np.float32)
    path = str(tmp_path / "cloud.pcd")
    fileio.save_pcd(path, xyz, inten, binary=binary)
    xyz2, inten2 = fileio.load_pcd(path)
    np.testing.assert_allclose(xyz2, xyz, atol=1e-5)
    np.testing.assert_allclose(inten2, inten, atol=1e-5)


def test_g2o_roundtrip(tmp_path, rng):
    import jax.numpy as jnp

    n = 4
    w = rng.normal(size=(n, 3)).astype(np.float32) * 0.4
    t = rng.normal(size=(n, 3)).astype(np.float32) * 5
    poses = np.asarray(geo.make_pose(geo.so3_exp(jnp.asarray(w)), jnp.asarray(t)))
    info = np.diag([1.0, 2, 3, 4, 5, 6])
    edges = [(0, 1, poses[1], info), (1, 2, poses[2], info)]
    path = str(tmp_path / "fg.g2o")
    fileio.write_g2o(path, poses, edges)
    p2, e2 = fileio.load_g2o(path)
    assert p2.shape == (n, 4, 4)
    np.testing.assert_allclose(p2, poses, atol=1e-5)
    assert len(e2) == 2
    i, j, bt, info2 = e2[0]
    assert (i, j) == (0, 1)
    np.testing.assert_allclose(bt, poses[1], atol=1e-5)
    np.testing.assert_allclose(info2, info, atol=1e-6)
