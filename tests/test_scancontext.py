"""ScanContext descriptor + retrieval (reference ScanContext.cpp semantics)."""

import numpy as np
import jax.numpy as jnp
import pytest

from simpleslam_tpu.ops import scancontext as sc


def _ring_scene(rng, n=2000, yaw=0.0):
    """A seed-dependent asymmetric scene of points, optionally yawed.

    The height field is a random low-frequency function of (theta, r) so each
    seed produces a structurally distinct descriptor (distinct 'places')."""
    th = rng.uniform(0, 2 * np.pi, n)
    r = 5 + 60 * rng.beta(2, 2, n)
    amp = rng.uniform(0.5, 2.0, 4)
    freq = rng.integers(1, 6, 4)
    phase = rng.uniform(0, 2 * np.pi, 4)
    # heights stay above ground (z > -lidar_height in sensor frame)
    z = 4.0 + sum(a * np.sin(f * th + p) for a, f, p in zip(amp, freq, phase))
    z = z + 0.02 * r * np.sin(th * freq[0])
    x = r * np.cos(th + yaw)
    y = r * np.sin(th + yaw)
    return np.stack([x, y, z - 2.0], 1).astype(np.float32)


def _desc(xyz):
    m = jnp.ones(len(xyz), bool)
    return sc.make_descriptor(jnp.asarray(xyz), m, 2.0)


def test_descriptor_shape_and_bins(rng):
    xyz = _ring_scene(rng)
    d = np.asarray(_desc(xyz))
    assert d.shape == (20, 60)
    assert (d >= 0).all()  # empty bins zero, heights shifted positive
    # max-height semantics: the tall half (theta < pi) is taller
    assert d[:, :30].max() > d[:, 31:].max() - 1e-3


def test_out_of_range_points_dropped(rng):
    far = np.array([[100.0, 0, 0], [0, 200.0, 1.0]], np.float32)
    d = np.asarray(_desc(far))
    assert d.max() == 0.0


def test_rotation_shifts_descriptor_columns():
    k_sectors = 7
    yaw = k_sectors * 2 * np.pi / sc.NUM_SECTOR
    d0 = _desc(_ring_scene(np.random.default_rng(42), yaw=0.0))
    d1 = _desc(_ring_scene(np.random.default_rng(42), yaw=yaw))
    dist, shift = sc.distance_between(d0, d1)
    # rotated scene matches at the corresponding circular shift
    assert float(dist) < 0.1
    assert int(shift) % sc.NUM_SECTOR in (
        (-k_sectors) % sc.NUM_SECTOR, (sc.NUM_SECTOR - k_sectors) % sc.NUM_SECTOR,
        k_sectors,
    )


def test_ring_key_rotation_invariant():
    d0 = _desc(_ring_scene(np.random.default_rng(42), yaw=0.0))
    d1 = _desc(_ring_scene(np.random.default_rng(42), yaw=1.234))
    rk0, rk1 = sc.ring_key(d0), sc.ring_key(d1)
    assert float(jnp.linalg.norm(rk0 - rk1)) < 0.1 * float(jnp.linalg.norm(rk0))


def test_query_finds_revisit(rng):
    cap = 64
    descs = np.zeros((cap, 20, 60), np.float32)
    rkeys = np.zeros((cap, 20), np.float32)
    # distinct scenes; scene 45 revisits scene 2 (same seed 102)
    for i in range(46):
        seed_rng = np.random.default_rng(102 if i == 45 else 100 + i)
        d = np.asarray(_desc(_ring_scene(seed_rng)))
        descs[i] = d
        rkeys[i] = d.mean(axis=1)
    q = sc.query(jnp.asarray(descs), jnp.asarray(rkeys), jnp.int32(45),
                 jnp.int32(10), jnp.float32(0.4), num_candidates=10)
    assert int(q.idx) == 2
    assert float(q.min_dist) < 0.1


def test_query_excludes_recent(rng):
    cap = 32
    descs = np.zeros((cap, 20, 60), np.float32)
    rkeys = np.zeros((cap, 20), np.float32)
    for i in range(20):
        seed_rng = np.random.default_rng(5 if i == 19 else 200 + i)
        d = np.asarray(_desc(_ring_scene(seed_rng)))
        descs[i] = d
        rkeys[i] = d.mean(axis=1)
    # revisit of context 17 (= recent) must not match it when excluded
    descs[19] = descs[17]
    rkeys[19] = rkeys[17]
    q = sc.query(jnp.asarray(descs), jnp.asarray(rkeys), jnp.int32(19),
                 jnp.int32(5), jnp.float32(0.4), num_candidates=3)
    assert int(q.idx) != 17


def test_query_not_eligible_early(rng):
    cap = 16
    descs = jnp.zeros((cap, 20, 60), jnp.float32)
    rkeys = jnp.zeros((cap, 20), jnp.float32)
    q = sc.query(descs, rkeys, jnp.int32(5), jnp.int32(10), jnp.float32(0.4),
                 num_candidates=10)
    assert int(q.idx) == -1
