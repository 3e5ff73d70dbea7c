"""Point-parallel (data-parallel) scan-to-map registration over a mesh.

The scan's points are sharded across the ``dp`` mesh axis; every device
computes the normal-equation contribution of its point shard against a
replicated map, and the 6x6 / 6-vector reductions ride ICI ``psum`` — the
canonical "big batched residual + tiny reduced state" SPMD pattern
(SURVEY.md §2.3 north star: batched registration data-parallel over points).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import geometry as geo
from ..ops import loam
from ..ops.pointcloud import PointCloud
from ..ops.voxel import VoxelMap


def sharded_scan2map(mesh: Mesh, axis: str = "dp", max_iters: int = loam.MAX_ITERS):
    """Build a jitted sharded scan2map: (src, vm, init_pose) -> LoamResult.

    ``src`` leaves must be shardable by ``mesh.shape[axis]`` along dim 0;
    the voxel map and pose are replicated. The GN loop runs replicated on
    every device with one psum per iteration.
    """

    def local_step(src_local: PointCloud, vm: VoxelMap, pose: jax.Array):
        JtJ, JtE, n_valid = loam.build_normal_equations(src_local, vm, pose)
        JtJ = jax.lax.psum(JtJ, axis)
        JtE = jax.lax.psum(JtE, axis)
        n_valid = jax.lax.psum(n_valid, axis)
        return JtJ, JtE, n_valid

    def shard_body(src: PointCloud, vm: VoxelMap, init_pose: jax.Array):
        def cond(carry):
            pose, it, conv, failed, _ = carry
            return (it < max_iters) & (~conv) & (~failed)

        def body(carry):
            pose, it, conv, failed, _ = carry
            JtJ, JtE, n_valid = local_step(src, vm, pose)
            enough = n_valid >= loam.MIN_VALID_ROWS
            JtJ_safe = JtJ + jnp.eye(6, dtype=JtJ.dtype) * jnp.where(enough, 0.0, 1.0)
            dx = jnp.linalg.solve(JtJ_safe, -JtE)
            conv_now = (jnp.linalg.norm(dx[:3]) <= loam.POS_CONVERGE) & (
                jnp.linalg.norm(dx[3:]) <= loam.ROT_CONVERGE
            )
            new_pose = jnp.where(
                conv_now | ~enough, pose, geo.pose_compose(geo.se3_exp(dx), pose)
            )
            return (new_pose, it + 1, conv_now & enough, ~enough, n_valid)

        init = (init_pose.astype(jnp.float32), jnp.int32(0),
                jnp.array(False), jnp.array(False), jnp.int32(0))
        pose, iters, conv, _, n_valid = jax.lax.while_loop(cond, body, init)
        return loam.LoamResult(geo.reorthonormalize(pose), conv, iters, n_valid)

    sharded = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(axis), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded)
