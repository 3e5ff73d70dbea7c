"""End-to-end multi-chip mapping on the virtual 8-device mesh.

Round-2 review: "the sharded kernels are never reachable from any executor".
These tests run the WHOLE streamed pipeline with ``tpu.mesh_devices`` set —
scan points sharded over the "dp" axis with one fused psum per GN iteration,
the backend's pose-graph solves edge-sharded — and assert pose parity with
the single-device run.
"""

import numpy as np
import pytest

import __graft_entry__ as graft


@pytest.fixture(scope="module")
def parity_runs():
    return graft.multichip_pipeline_parity(8, n_scans=24, sync_every=8)


def test_mesh_pipeline_matches_single_device(parity_runs):
    single, meshed = parity_runs
    err = np.linalg.norm(single.poses[:, :3, 3] - meshed.poses[:, :3, 3],
                         axis=1)
    assert np.max(err) < 5e-3, np.max(err)
    assert meshed.converged_frac > 0.9


def test_mesh_pipeline_produces_keyframes(parity_runs):
    single, meshed = parity_runs
    assert meshed.keyframe_count == single.keyframe_count
    assert meshed.keyframe_count >= 3
