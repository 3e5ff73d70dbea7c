"""Large-K pose-graph stress: f32 convergence at realistic graph sizes.

SURVEY.md §7 hard-part (e) flags f32 (vs the reference's f64 Eigen/GTSAM)
as a numerics risk in the solver; round-1 only exercised K <= 40. This
validates the LM+PCG solver at K ~ 1500 / E ~ 6000 — the scale of a long
mapping session (Binhai-class bag at 1 m keyframe gap) — checking that the
optimized trajectory actually recovers ground truth, not just that chi2
drops.
"""

import numpy as np
import pytest

from simpleslam_tpu.ops import posegraph as pgo
from simpleslam_tpu.parallel.dist_posegraph import _ring_graph


@pytest.mark.slow
def test_large_graph_f32_convergence():
    k = 1536
    g, gt = _ring_graph(k=k, k_cap=k, e_cap=6144, n_lc=512, drift=0.03,
                        seed=3, return_gt=True)
    init_err = np.linalg.norm(
        np.asarray(g.poses[:k, :3, 3]) - gt[:, :3, 3], axis=1)
    assert init_err.max() > 1.0  # the drift actually corrupted the chain

    # the large-K budget: low-frequency error modes of a 1536-node loop need
    # a deep Krylov space (cg=96 leaves ~0.5 m residual error; 256 converges
    # to mm) — the f32 arithmetic itself is NOT the limiter
    res = pgo.solve(g, max_iters=40, cg_iters=256)
    assert np.isfinite(float(res.cost))
    assert float(res.cost) < 1e-3 * float(res.cost0)

    opt = np.asarray(res.poses[:k], np.float64)
    err = np.linalg.norm(opt[:, :3, 3] - gt[:, :3, 3], axis=1)
    # f32 LM+PCG pulls a >1 m-drifted 1536-node loop back to cm-level vs gt
    assert err.max() < 0.05, (err.max(), err.mean())

    # rotations stay orthonormal through 20 f32 iterations
    R = opt[:, :3, :3]
    rtr = np.einsum("kij,kil->kjl", R, R)
    np.testing.assert_allclose(rtr, np.tile(np.eye(3), (k, 1, 1)), atol=5e-4)


@pytest.mark.slow
def test_incremental_solve_matches_batch():
    """Growing the graph via donated row updates == solving from scratch.

    (The backend's device-resident graph path, models/backend.py _sync_graph.)
    """
    import jax.numpy as jnp

    k = 256
    g_full, gt = _ring_graph(k=k, k_cap=k, e_cap=512, n_lc=32, drift=0.02,
                             seed=5, return_gt=True)
    res_batch = pgo.solve(g_full, max_iters=10, cg_iters=64)

    # build the same graph by starting empty-masked and enabling rows in two
    # increments (the donated .at[].set path the backend uses)
    half = k // 2
    kmask = np.asarray(g_full.kf_mask).copy()
    emask = np.asarray(g_full.edge_mask).copy()
    ei = np.asarray(g_full.edge_i)
    ej = np.asarray(g_full.edge_j)
    first = (ei < half) & (ej < half) & emask
    g1 = g_full._replace(
        kf_mask=jnp.asarray(np.arange(k) < half),
        edge_mask=jnp.asarray(first))
    r1 = pgo.solve(g1, max_iters=10, cg_iters=64)
    assert float(r1.cost) < float(r1.cost0)

    g2 = g_full._replace(poses=r1.poses.at[half:].set(g_full.poses[half:]))
    res_inc = pgo.solve(g2, max_iters=10, cg_iters=64)
    p_b = np.asarray(res_batch.poses[:k, :3, 3])
    p_i = np.asarray(res_inc.poses[:k, :3, 3])
    # both reach the same optimum (warm start just gets there faster)
    np.testing.assert_allclose(p_i, p_b, atol=2e-2)
