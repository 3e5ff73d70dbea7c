"""Batched SE(3) pose-graph solver — the framework's GTSAM/iSAM2 replacement.

The reference backend delegates to GTSAM iSAM2 (``backend/src/Backend.cpp:29-123``:
prior + Between factors, diagonal noise, incremental update after every
keyframe/LC event). This module re-architects that role TPU-first
(SURVEY.md §7): the factor graph is a padded edge tensor, residuals and
Jacobians are one vmapped autodiff evaluation, and the normal equations are
never materialized — Levenberg-Marquardt steps solve
``(H + lambda D) dx = -g`` by **block-Jacobi preconditioned conjugate
gradient** whose matvec is an edge gather + 6x6 einsum + segment-sum scatter.
Everything is static-shape and jit-compiled once; the same edge-wise matvec
shards over a keyframe mesh axis for distributed BA (parallel/dist_posegraph).

Conventions:
- twist ordering [rho (trans), w (rot)] as everywhere in the framework
  (ops/geometry.py). Note GTSAM orders (rot, trans) — noise vectors from the
  reference (Backend.cpp:90-97) are re-ordered by the backend model layer.
- right perturbation ``T_k <- T_k exp(xi_k)`` (GTSAM convention), so the
  between-factor residual is ``r_e = log(Tij^-1 (T_i exp(xi_i))^-1 (T_j exp(xi_j)))``.
- ``edge_info`` is the diagonal information (1/variance) of each edge; padding
  edges carry zero info and contribute nothing.
- gauge freedom is fixed by a diagonal prior on node 0 (PriorFactor role).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import geometry as geo


class PoseGraph(NamedTuple):
    """Padded pose-graph tensors (static shapes K, E)."""

    poses: jax.Array       # (K, 4, 4) current estimates
    kf_mask: jax.Array     # (K,) bool valid nodes
    edge_i: jax.Array      # (E,) int32 from-node
    edge_j: jax.Array      # (E,) int32 to-node
    edge_T: jax.Array      # (E, 4, 4) measured between T_i^-1 T_j
    edge_info: jax.Array   # (E, 6) diagonal information [trans, rot]
    edge_mask: jax.Array   # (E,) bool
    prior_pose: jax.Array  # (4, 4) prior on node 0
    prior_info: jax.Array  # (6,) diagonal information of the prior


class SolveResult(NamedTuple):
    poses: jax.Array     # (K, 4, 4) optimized
    cost0: jax.Array     # () initial chi2
    cost: jax.Array      # () final chi2
    iters: jax.Array     # () int32 LM iterations executed
    accepted: jax.Array  # () int32 accepted LM steps


def _edge_residual(xi_i, xi_j, Ti, Tj, Tij):
    """r = log(Tij^-1 (Ti exp(xi_i))^-1 (Tj exp(xi_j))), (6,)."""
    A = geo.pose_compose(Ti, geo.se3_exp(xi_i))
    B = geo.pose_compose(Tj, geo.se3_exp(xi_j))
    return geo.se3_log(
        geo.pose_compose(geo.pose_inverse(Tij),
                         geo.pose_compose(geo.pose_inverse(A), B))
    )


def _prior_residual(xi, T, Tp):
    """r = log(Tp^-1 (T exp(xi))), (6,)."""
    return geo.se3_log(
        geo.pose_compose(geo.pose_inverse(Tp), geo.pose_compose(T, geo.se3_exp(xi)))
    )


# host scalar zeros: a module-level jnp array is a device-resident capture
# that costs ~2 ms on every later dispatch under the axon IFRT proxy
# (same pitfall as voxel.INVALID_KEY)
_zero6 = np.zeros((6,), np.float32)


def _linearize_edges(g: PoseGraph):
    """Vmapped residuals + autodiff Jacobians at xi = 0.

    Returns (r (E,6), Ji (E,6,6), Jj (E,6,6)) with padding edges zeroed.
    """
    Ti = g.poses[g.edge_i]
    Tj = g.poses[g.edge_j]

    def one(Ti, Tj, Tij):
        r = _edge_residual(_zero6, _zero6, Ti, Tj, Tij)
        Ji = jax.jacfwd(_edge_residual, argnums=0)(_zero6, _zero6, Ti, Tj, Tij)
        Jj = jax.jacfwd(_edge_residual, argnums=1)(_zero6, _zero6, Ti, Tj, Tij)
        return r, Ji, Jj

    r, Ji, Jj = jax.vmap(one)(Ti, Tj, g.edge_T)
    m = g.edge_mask[:, None]
    return jnp.where(m, r, 0.0), Ji * m[:, :, None], Jj * m[:, :, None]


def _linearize_prior(g: PoseGraph):
    r = _prior_residual(_zero6, g.poses[0], g.prior_pose)
    Jp = jax.jacfwd(_prior_residual, argnums=0)(_zero6, g.poses[0], g.prior_pose)
    return r, Jp


def _psum(x, axis):
    return jax.lax.psum(x, axis) if axis is not None else x


def graph_cost(g: PoseGraph, axis: str | None = None) -> jax.Array:
    """Total chi2 = sum_e r^T W r + prior (the GTSAM error function role).

    With ``axis`` set (inside shard_map, edges sharded over that mesh axis)
    the edge sum rides a psum; the prior is added once post-reduction.
    """
    r, _, _ = _linearize_edges(g)
    rp, _ = _linearize_prior(g)
    edge_chi2 = _psum(jnp.sum(r * r * g.edge_info), axis)
    return edge_chi2 + jnp.sum(rp * rp * g.prior_info)


def _build_gradient_and_diag(g: PoseGraph, r, Ji, Jj, rp, Jp,
                             axis: str | None = None):
    """g_vec (K,6) = J^T W r and the (K,6,6) block diagonal of H.

    Edge contributions are local to this shard and psum'ed over ``axis``;
    the prior block is added once after the reduction.
    """
    K = g.poses.shape[0]
    wi = Ji * g.edge_info[:, :, None]          # W Ji  (rows weighted)
    wj = Jj * g.edge_info[:, :, None]
    grad_i = jnp.einsum("eab,ea->eb", wi, r)   # Ji^T W r
    grad_j = jnp.einsum("eab,ea->eb", wj, r)
    grad = jax.ops.segment_sum(grad_i, g.edge_i, num_segments=K)
    grad += jax.ops.segment_sum(grad_j, g.edge_j, num_segments=K)
    grad = _psum(grad, axis)
    grad = grad.at[0].add(jnp.einsum("ab,a->b", Jp * g.prior_info[:, None], rp))

    blk_i = jnp.einsum("eab,eac->ebc", wi, Ji)  # Ji^T W Ji
    blk_j = jnp.einsum("eab,eac->ebc", wj, Jj)
    diag = jax.ops.segment_sum(blk_i, g.edge_i, num_segments=K)
    diag += jax.ops.segment_sum(blk_j, g.edge_j, num_segments=K)
    diag = _psum(diag, axis)
    diag = diag.at[0].add(jnp.einsum("ab,ac->bc", Jp * g.prior_info[:, None], Jp))
    return grad, diag


def _make_hvp(g: PoseGraph, Ji, Jj, Jp, lam, diag, axis: str | None = None):
    """H v (+ LM damping lambda * diag(H) v) as a closure over the tensors.

    The edge-wise matvec is the shard-local part (psum over ``axis``); the
    prior block and the damping act on the replicated state once.
    """
    K = g.poses.shape[0]
    damp = lam * jnp.diagonal(diag, axis1=-2, axis2=-1)  # (K, 6)
    damp = jnp.maximum(damp, lam * 1e-6)

    def hvp(v):  # v: (K, 6)
        ui = jnp.einsum("eab,eb->ea", Ji, v[g.edge_i])   # Ji v_i
        uj = jnp.einsum("eab,eb->ea", Jj, v[g.edge_j])
        u = (ui + uj) * g.edge_info                      # W (Ji v_i + Jj v_j)
        out = jax.ops.segment_sum(
            jnp.einsum("eab,ea->eb", Ji, u), g.edge_i, num_segments=K)
        out += jax.ops.segment_sum(
            jnp.einsum("eab,ea->eb", Jj, u), g.edge_j, num_segments=K)
        out = _psum(out, axis)
        up = jnp.einsum("ab,b->a", Jp, v[0]) * g.prior_info
        out = out.at[0].add(jnp.einsum("ab,a->b", Jp, up))
        return out + damp * v

    return hvp


def _pcg(hvp, b, precond_inv, mask, iters: int, tol: float = 1e-8):
    """Block-Jacobi preconditioned CG on H dx = b (masked nodes pinned to 0)."""
    m = mask[:, None].astype(b.dtype)

    def apply_p(r):
        return jnp.einsum("kab,kb->ka", precond_inv, r) * m

    x0 = jnp.zeros_like(b)
    r0 = b * m
    z0 = apply_p(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)

    def cond(c):
        _, r, _, _, rz, it = c
        return (it < iters) & (rz > tol)

    def body(c):
        x, r, z, p, rz, it = c
        Hp = hvp(p) * m
        alpha = rz / jnp.maximum(jnp.sum(p * Hp), 1e-30)
        x = x + alpha * p
        r = r - alpha * Hp
        z = apply_p(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        return (x, r, z, p, rz_new, it + 1)

    x, _, _, _, _, _ = jax.lax.while_loop(cond, body, (x0, r0, z0, p0, rz0, 0))
    return x


def solve_impl(g: PoseGraph, max_iters: int = 10, cg_iters: int = 64,
               lambda0: float = 1e-4, axis: str | None = None) -> SolveResult:
    """Levenberg-Marquardt with PCG inner solves (trace-time body).

    Per LM iteration: relinearize, solve the damped normal equations by PCG,
    apply the trial update ``T_k exp(dx_k)``, accept iff the chi2 drops
    (lambda /= 4) else reject (lambda *= 8). Matches iSAM2's role — a few
    fast damped GN steps warm-started from the current estimate — without its
    Bayes-tree machinery.

    With ``axis`` set this runs SPMD inside shard_map: edge tensors are this
    shard's partition, poses are replicated, and every edge reduction rides a
    psum over the mesh axis (parallel/dist_posegraph.py wraps this).
    """
    eye = jnp.broadcast_to(jnp.eye(6, dtype=g.poses.dtype), (g.poses.shape[0], 6, 6))

    def lm_body(carry):
        poses, lam, cost, it, accepted = carry
        gg = g._replace(poses=poses)
        r, Ji, Jj = _linearize_edges(gg)
        rp, Jp = _linearize_prior(gg)
        grad, diag = _build_gradient_and_diag(gg, r, Ji, Jj, rp, Jp, axis)
        damped_diag = diag + lam * (
            diag * jnp.broadcast_to(jnp.eye(6, dtype=diag.dtype), diag.shape)
        ) + 1e-8 * eye
        precond_inv = jnp.linalg.inv(damped_diag)
        hvp = _make_hvp(gg, Ji, Jj, Jp, lam, diag, axis)
        dx = _pcg(hvp, -grad, precond_inv, gg.kf_mask, cg_iters)

        trial = geo.pose_compose(poses, geo.se3_exp(dx))
        trial = geo.reorthonormalize(trial)
        trial = jnp.where(g.kf_mask[:, None, None], trial, poses)
        new_cost = graph_cost(g._replace(poses=trial), axis)
        accept = new_cost < cost
        poses = jnp.where(accept, trial, poses)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, lam * 0.25, lam * 8.0)
        lam = jnp.clip(lam, 1e-9, 1e6)
        return poses, lam, cost, it + 1, accepted + accept.astype(jnp.int32)

    def lm_cond(carry):
        _, lam, _, it, _ = carry
        return (it < max_iters) & (lam < 1e5)

    cost0 = graph_cost(g, axis)
    init = (g.poses, jnp.asarray(lambda0, g.poses.dtype), cost0, jnp.int32(0),
            jnp.int32(0))
    poses, _, cost, iters, accepted = jax.lax.while_loop(lm_cond, lm_body, init)
    return SolveResult(poses, cost0, cost, iters, accepted)


@partial(jax.jit, static_argnames=("max_iters", "cg_iters"))
def solve(g: PoseGraph, max_iters: int = 10, cg_iters: int = 64,
          lambda0: float = 1e-4) -> SolveResult:
    """Single-device jitted LM+PCG solve (see ``solve_impl``)."""
    return solve_impl(g, max_iters, cg_iters, lambda0)
