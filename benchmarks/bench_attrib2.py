"""Attribution round 2: decompose the REDESIGNED batch's device time.

bench_attrib.py measured the primitives and motivated the merged-row gather
+ frozen-plane loop; this script measures the composed new design — fit,
per-iteration work, the 6x6 solve, the while_loop/cond machinery, and the
16-scan batch against a MERGED map — to locate whatever cost survives
composition. Prints one JSON line.

Usage: python benchmarks/bench_attrib2.py [reps]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from micro_loam import timeit

AMP = 32


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    import jax
    import jax.numpy as jnp

    from simpleslam_tpu.ops import loam
    from simpleslam_tpu.ops import pointcloud as pcops
    from simpleslam_tpu.ops import voxel as vox
    from simpleslam_tpu.pipeline import simulate as sim

    out = {"platform": jax.devices()[0].platform, "amp": AMP}

    world = sim.make_world(seed=0)
    _, poses = sim.make_trajectory(40, 0.1, speed=1.5)
    rng = np.random.default_rng(0)
    clouds = []
    for i in range(0, 40, 3):
        s = sim.simulate_scan(world, sim.sensor_from_body(poses[i]),
                              n_az=1800, n_el=16, rng=rng)
        R, t = poses[i][:3, :3], poses[i][:3, 3]
        clouds.append((s @ R.T + t).astype(np.float32))
    sub = pcops.from_numpy(np.concatenate(clouds), 131072)
    center = jnp.asarray(poses[20][:3, 3].astype(np.float32))
    mm = vox.build_merged_dense_voxel_map(sub, 2.0, center, dims=(96, 96, 16),
                                          slab_size=24)
    jax.block_until_ready(mm.rows)

    scan = sim.simulate_scan(world, sim.sensor_from_body(poses[20]),
                             n_az=1800, n_el=16, rng=rng)
    pose_w = jnp.asarray(poses[20].astype(np.float32))
    Q = 6144
    ds = pcops.compact(vox.voxel_downsample(
        pcops.from_numpy(scan, 32768), 0.5), Q)
    # host-sorted queries, as the streamed prep produces
    xyz = np.array(ds.xyz)  # writable copy
    n_val = int(np.asarray(ds.mask).sum())
    v = np.floor(xyz[:n_val] / 2.0).astype(np.int64) + (1 << 20)
    key = (v[:, 0] << 42) + (v[:, 1] << 21) + v[:, 2]
    xyz[:n_val] = xyz[:n_val][np.argsort(key)]
    ds = pcops.PointCloud(jnp.asarray(xyz), ds.intensity, ds.mask)
    jax.block_until_ready(ds.xyz)

    tiny = jax.jit(lambda x: x + 1.0)
    rtt = timeit(lambda: tiny(jnp.zeros(())), reps)
    out["rtt_ms"] = round(rtt * 1e3, 3)

    def amp_ms(t):
        return round(max(t - rtt, 0.0) / AMP * 1e3, 3)

    # fit_planes (gather + 5-NN + plane fit), amplified through the pose
    @jax.jit
    def amp_fit(s, m, p0):
        def body(i, p):
            cand, ok = loam.gather_candidates(s, m, p)
            pl = loam.fit_planes(s, cand, ok, p)
            return p + jnp.sum(pl.normal) * 1e-30
        return jnp.sum(jax.lax.fori_loop(0, AMP, body, p0))
    out["fit_planes_ms"] = amp_ms(timeit(lambda: amp_fit(ds, mm, pose_w),
                                         reps))

    # per-iteration work: plane_normal_equations + 6x6 solve + exp update
    cand, ok = loam.gather_candidates(ds, mm, pose_w)
    planes = jax.block_until_ready(loam.fit_planes(ds, cand, ok, pose_w))

    @jax.jit
    def amp_iter(s, pl, p0):
        from simpleslam_tpu.ops import geometry as geo

        def body(i, p):
            JtJ, JtE, nv = loam.plane_normal_equations(s, pl, p)
            dx = jnp.linalg.solve(JtJ + jnp.eye(6), -JtE)
            return geo.pose_compose(geo.se3_exp(dx * 1e-6), p)
        return jnp.sum(jax.lax.fori_loop(0, AMP, body, p0))
    out["gn_iteration_ms"] = amp_ms(timeit(lambda: amp_iter(ds, planes,
                                                            pose_w), reps))

    # the normal equations alone (no solve)
    @jax.jit
    def amp_ne(s, pl, p0):
        def body(i, p):
            JtJ, _, _ = loam.plane_normal_equations(s, pl, p)
            return p + jnp.sum(JtJ) * 1e-30
        return jnp.sum(jax.lax.fori_loop(0, AMP, body, p0))
    out["normal_eq_ms"] = amp_ms(timeit(lambda: amp_ne(ds, planes, pose_w),
                                        reps))

    # full scan2map at converged pose (1 effective iteration) and with a
    # realistic per-scan motion error (~2 iterations)
    s2m = jax.jit(lambda s, m, p: jnp.sum(loam.scan2map(s, m, p).pose))
    out["scan2map_conv_ms"] = round(
        (timeit(lambda: s2m(ds, mm, pose_w), reps) - rtt) * 1e3, 3)
    bad = np.asarray(poses[20]).copy()
    bad[:3, 3] += [0.05, -0.03, 0.01]
    bad_j = jnp.asarray(bad.astype(np.float32))
    out["scan2map_motion_ms"] = round(
        (timeit(lambda: s2m(ds, mm, bad_j), reps) - rtt) * 1e3, 3)
    res = loam.scan2map(ds, mm, bad_j)
    out["motion_iters"] = int(res.iters)

    # 16-scan batch against the merged map (the streamed program)
    from simpleslam_tpu.pipeline.streamed import (_streamed_batch,
                                                  UPLOAD_PAD, UPLOAD_SCALE)
    q16 = np.where(xyz < 1e5,
                   np.clip(np.rint(xyz / UPLOAD_SCALE), -32766, 32766),
                   float(UPLOAD_PAD)).astype(np.int16)
    rows_d = jnp.asarray(np.tile(q16[None], (16, 1, 1)))
    loc_d = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (16, 1, 1)))

    def batch():
        (_, _, _), packed = _streamed_batch(
            rows_d, loc_d, mm, bad_j, bad_j, jnp.eye(4, dtype=jnp.float32),
            "loam", "lo")
        return jnp.sum(packed)

    out["batch16_ms"] = round((timeit(batch, reps) - rtt) * 1e3, 3)

    # merged map build (the map_update device cost now)
    bld = jax.jit(lambda s: jnp.sum(vox.build_merged_dense_voxel_map(
        s, 2.0, center, dims=(96, 96, 16), slab_size=24).rows[::97, ::29]))
    out["merged_build_ms"] = round((timeit(lambda: bld(sub), reps) - rtt)
                                   * 1e3, 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
