"""Multi-host layer tests: jax.distributed multi-process CPU simulation.

SURVEY.md §4's distributed test strategy ("simulate multi-host with
jax.distributed multi-process CPU"). Each simulated host is a subprocess
with its own XLA CPU client; cross-host collectives ride the same
jax.distributed machinery a DCN deployment uses. The reference has no
distributed path — this validates the framework's own north-star component
(BASELINE.json pod-slice sharding).
"""

import numpy as np
import pytest

from simpleslam_tpu.parallel import multihost as mh


@pytest.mark.slow
def test_two_hosts_devices_and_collective():
    res = mh.run_hosts(2, "simpleslam_tpu.parallel.workers:devices_worker",
                       {}, devices_per_host=2, timeout=300.0)
    assert len(res) == 2
    for pid, r in enumerate(res):
        assert r["n_global"] == 4
        assert r["n_local"] == 2
        assert r["process_id"] == pid
        # sum over the sharded array: 2 devices of pid 0 + 2 of pid 1 = 2.0
        assert r["psum"] == pytest.approx(2.0)


@pytest.mark.slow
def test_two_host_posegraph_parity():
    """The 2-host edge-sharded solve matches the single-process solve."""
    payload = {"k": 48, "k_cap": 64, "e_cap": 128, "max_iters": 4,
               "cg_iters": 16, "reps": 1, "n_lc": 2, "return_poses": 48}
    res = mh.run_hosts(
        2, "simpleslam_tpu.parallel.workers:posegraph_worker", payload,
        devices_per_host=1, timeout=300.0)
    assert res[0]["cost"] < res[0]["cost0"]
    # both hosts hold the same replicated result
    p0 = np.asarray(res[0]["poses"])
    p1 = np.asarray(res[1]["poses"])
    np.testing.assert_allclose(p0, p1, atol=1e-5)

    # single-process reference on the same graph
    from simpleslam_tpu.parallel.workers import posegraph_worker

    ref = posegraph_worker(payload, 1, 0)
    np.testing.assert_allclose(p0, np.asarray(ref["poses"]), atol=1e-3)
    assert ref["cost"] == pytest.approx(res[0]["cost"], rel=1e-2, abs=1e-4)
