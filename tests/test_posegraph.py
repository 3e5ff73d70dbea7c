"""Pose-graph LM+PCG solver: convergence, gauge handling, loop-closure pull.

The GTSAM-replacement role (backend/src/Backend.cpp): given odometry chains
with drift and loop-closure constraints, the solver must pull the trajectory
back — validated here on synthetic graphs with known ground truth.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from simpleslam_tpu.ops import geometry as geo
from simpleslam_tpu.ops import posegraph as pg


def _circle_gt(k, radius=10.0):
    """k poses around a circle, yaw tangent."""
    th = np.linspace(0, 2 * np.pi, k, endpoint=False)
    poses = np.tile(np.eye(4, dtype=np.float32), (k, 1, 1))
    poses[:, 0, 3] = radius * np.cos(th)
    poses[:, 1, 3] = radius * np.sin(th)
    c, s = np.cos(th + np.pi / 2), np.sin(th + np.pi / 2)
    poses[:, 0, 0], poses[:, 0, 1] = c, -s
    poses[:, 1, 0], poses[:, 1, 1] = s, c
    return poses


def _build_graph(K_cap=32, E_cap=64, k=16, drift=0.05, seed=0,
                 with_lc=True):
    rng = np.random.default_rng(seed)
    gt = _circle_gt(k)

    # odometry measurements = exact relative poses (from gt)
    edges_i, edges_j, edges_T, infos = [], [], [], []
    odom_info = np.array([10.0, 10.0, 10.0, 1e4, 1e4, 1e4], np.float32)
    lc_info = np.full(6, 10.0, np.float32)
    for a in range(k - 1):
        T_ab = np.linalg.inv(gt[a]) @ gt[a + 1]
        edges_i.append(a)
        edges_j.append(a + 1)
        edges_T.append(T_ab)
        infos.append(odom_info)
    if with_lc:
        T_lc = np.linalg.inv(gt[k - 1]) @ gt[0]
        edges_i.append(k - 1)
        edges_j.append(0)
        edges_T.append(T_lc)
        infos.append(lc_info)

    # initial estimate: integrate odometry with injected drift -> accumulates
    init = np.tile(np.eye(4, dtype=np.float32), (K_cap, 1, 1))
    init[0] = gt[0]
    for a in range(k - 1):
        noise = np.asarray(geo.se3_exp(jnp.asarray(
            rng.normal(0, drift, 6).astype(np.float32) * np.array([1, 1, 1, .2, .2, .2], np.float32))))
        init[a + 1] = init[a] @ (np.linalg.inv(gt[a]) @ gt[a + 1]) @ noise

    E = len(edges_i)
    ei = np.zeros(E_cap, np.int32)
    ej = np.zeros(E_cap, np.int32)
    eT = np.tile(np.eye(4, dtype=np.float32), (E_cap, 1, 1))
    einfo = np.zeros((E_cap, 6), np.float32)
    ei[:E] = edges_i
    ej[:E] = edges_j
    eT[:E] = edges_T
    einfo[:E] = infos
    emask = np.arange(E_cap) < E
    kmask = np.arange(K_cap) < k

    g = pg.PoseGraph(
        poses=jnp.asarray(init),
        kf_mask=jnp.asarray(kmask),
        edge_i=jnp.asarray(ei),
        edge_j=jnp.asarray(ej),
        edge_T=jnp.asarray(eT),
        edge_info=jnp.asarray(einfo),
        edge_mask=jnp.asarray(emask),
        prior_pose=jnp.asarray(gt[0]),
        prior_info=jnp.asarray(np.full(6, 1e4, np.float32)),
    )
    return g, gt, k


def test_solver_reduces_cost_and_recovers_circle():
    g, gt, k = _build_graph()
    res = pg.solve(g, max_iters=20, cg_iters=96)
    assert float(res.cost) < float(res.cost0) * 1e-2
    est = np.asarray(res.poses)[:k]
    err = np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=1)
    # drifted init is decimeters off; solved graph must be cm-level
    assert err.max() < 0.05, err.max()


def test_solver_without_lc_keeps_chain_consistent():
    g, gt, k = _build_graph(with_lc=False, drift=0.02)
    res = pg.solve(g, max_iters=15, cg_iters=96)
    est = np.asarray(res.poses)[:k]
    # without LC the graph is a chain anchored by the prior: relative poses
    # must match odometry measurements tightly
    for a in range(k - 1):
        rel_est = np.linalg.inv(est[a]) @ est[a + 1]
        rel_gt = np.linalg.inv(gt[a]) @ gt[a + 1]
        assert np.linalg.norm(rel_est[:3, 3] - rel_gt[:3, 3]) < 1e-2


def test_padding_nodes_untouched():
    g, gt, k = _build_graph()
    res = pg.solve(g, max_iters=5, cg_iters=32)
    est = np.asarray(res.poses)
    np.testing.assert_array_equal(est[k:], np.asarray(g.poses)[k:])


def test_cost_zero_at_ground_truth():
    g, gt, k = _build_graph(drift=0.0)
    c = float(pg.graph_cost(g))
    assert c < 1e-3, c
