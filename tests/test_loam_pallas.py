"""Parity: the fused pallas GN linearization vs the jnp reference path.

The pallas kernel (ops/loam_pallas.py) runs the TPU hot path; CPU CI runs it
in pallas interpret mode on a small query block and requires the SAME normal
equations, gates, and valid-row counts as ``normal_equations_from_candidates``
— which itself carries the reference thresholds of
/root/reference/PCR/src/LoamRegister.cpp:122-176.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from simpleslam_tpu.ops import loam, loam_pallas
from simpleslam_tpu.ops import pointcloud as pcops
from simpleslam_tpu.ops import voxel as vox
from simpleslam_tpu.pipeline import simulate as sim


@pytest.fixture(scope="module")
def fixture():
    world = sim.make_world(seed=0)
    _, poses = sim.make_trajectory(10, 0.1, speed=1.5)
    rng = np.random.default_rng(0)
    s0 = sim.simulate_scan(world, sim.sensor_from_body(poses[0]),
                           n_az=720, n_el=12, rng=rng)
    sub = pcops.from_numpy(
        (s0 @ poses[0][:3, :3].T + poses[0][:3, 3]).astype(np.float32), 16384)
    center = jnp.asarray(poses[0][:3, 3].astype(np.float32))
    vm = vox.build_dense_voxel_map(sub, 2.0, center, dims=(48, 48, 8),
                                   slab_size=24)
    scan = sim.simulate_scan(world, sim.sensor_from_body(poses[1]),
                             n_az=720, n_el=12, rng=rng)
    ds = pcops.compact(vox.voxel_downsample(
        pcops.from_numpy(scan, 16384), 0.5), 1024)
    pose = jnp.asarray(poses[1].astype(np.float32))
    return ds, vm, pose


def test_normal_equations_parity(fixture):
    ds, vm, pose = fixture
    cand, ok = loam.gather_candidates(ds, vm, pose)
    JtJ0, JtE0, nv0 = loam.normal_equations_from_candidates(ds, cand, ok, pose)
    cand_t = jnp.transpose(cand, (2, 1, 0))
    ok_t = ok.T.astype(jnp.float32)
    JtJ1, JtE1, nv1 = loam_pallas.normal_equations_t(ds, cand_t, ok_t, pose,
                                                     interpret=True)
    assert int(nv0) == int(nv1) and int(nv0) > 30
    scale = float(jnp.max(jnp.abs(JtJ0)))
    np.testing.assert_allclose(np.asarray(JtJ1), np.asarray(JtJ0),
                               atol=2e-5 * scale)
    escale = float(jnp.max(jnp.abs(JtE0))) + 1e-9
    np.testing.assert_allclose(np.asarray(JtE1), np.asarray(JtE0),
                               atol=5e-4 * escale)


def test_normal_equations_parity_perturbed(fixture):
    """An off-pose linearization (nonzero residuals everywhere)."""
    ds, vm, pose = fixture
    bad = np.asarray(pose).copy()
    bad[:3, 3] += [0.25, -0.15, 0.05]
    pose_b = jnp.asarray(bad)
    cand, ok = loam.gather_candidates(ds, vm, pose_b)
    JtJ0, JtE0, nv0 = loam.normal_equations_from_candidates(
        ds, cand, ok, pose_b)
    JtJ1, JtE1, nv1 = loam_pallas.normal_equations_t(
        ds, jnp.transpose(cand, (2, 1, 0)), ok.T.astype(jnp.float32), pose_b,
        interpret=True)
    assert int(nv0) == int(nv1)
    scale = float(jnp.max(jnp.abs(JtJ0)))
    np.testing.assert_allclose(np.asarray(JtJ1), np.asarray(JtJ0),
                               atol=2e-5 * scale)
    escale = float(jnp.max(jnp.abs(JtE0)))
    np.testing.assert_allclose(np.asarray(JtE1), np.asarray(JtE0),
                               atol=5e-4 * escale)


def test_acos_poly_accuracy():
    x = jnp.linspace(-1.0, 1.0, 4001)
    err = np.abs(np.asarray(loam_pallas._acos(x)) - np.arccos(np.asarray(x)))
    assert err.max() < 5e-7
