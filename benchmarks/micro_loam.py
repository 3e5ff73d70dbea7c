"""Microbenchmark: where does the registration batch's device time go?

Times (on the current default platform — the real chip when run through the
axon tunnel) each component of the streamed hot path against a
production-shaped fixture: dispatch RTT baseline, the neighborhood gather,
one normal-equation evaluation, scan2map at forced iteration counts, the
dense-map build, and the 16-scan fused batch. Prints one JSON line.

Usage: python benchmarks/micro_loam.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timeit(fn, reps=5):
    """min-of-reps wall time with a FORCED host sync.

    ``block_until_ready`` measured inconsistently through the axon IFRT
    proxy (sub-HBM-floor times on some programs); ``np.asarray`` of a leaf
    forces a real device->host round-trip, so every number here includes
    one ~25 ms tunnel RTT — compare against ``rtt_ms``, deltas are compute.
    """
    import jax
    import numpy as _np

    def sync():
        out = fn()
        leaf = jax.tree_util.tree_leaves(out)[0]
        _np.asarray(leaf)

    sync()  # warm/compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    import jax
    import jax.numpy as jnp

    from simpleslam_tpu.ops import loam
    from simpleslam_tpu.ops import pointcloud as pcops
    from simpleslam_tpu.ops import voxel as vox
    from simpleslam_tpu.pipeline import simulate as sim

    out = {"platform": jax.devices()[0].platform,
           "device": str(jax.devices()[0])}

    # production-shaped fixture: a multi-keyframe submap + one scan
    world = sim.make_world(seed=0)
    _, poses = sim.make_trajectory(40, 0.1, speed=1.5)
    rng = np.random.default_rng(0)
    clouds = []
    for i in range(0, 40, 3):
        s = sim.simulate_scan(world, sim.sensor_from_body(poses[i]),
                              n_az=1800, n_el=16, rng=rng)
        R, t = poses[i][:3, :3], poses[i][:3, 3]
        clouds.append((s @ R.T + t).astype(np.float32))
    merged = np.concatenate(clouds)
    sub = pcops.from_numpy(merged, 131072)
    center = jnp.asarray(poses[20][:3, 3].astype(np.float32))
    dims = (96, 96, 16)
    vm = vox.build_dense_voxel_map(sub, 2.0, center, dims=dims, slab_size=24)
    jax.block_until_ready(vm.slab)

    scan = sim.simulate_scan(world, sim.sensor_from_body(poses[20]),
                             n_az=1800, n_el=16, rng=rng)
    ds = pcops.compact(vox.voxel_downsample(
        pcops.from_numpy(scan, 32768), 0.5), 8192)
    pose_w = jnp.asarray(poses[20].astype(np.float32))
    jax.block_until_ready(ds.xyz)

    # dispatch round-trip baseline (empty program)
    tiny = jax.jit(lambda x: x + 1.0)
    x0 = jnp.zeros(())
    out["rtt_ms"] = round(timeit(lambda: tiny(x0), reps) * 1e3, 3)

    # neighborhood gather alone
    gath = jax.jit(lambda s, m, p: loam.gather_candidates(s, m, p))
    out["gather_ms"] = round(
        timeit(lambda: gath(ds, vm, pose_w), reps) * 1e3, 3)

    # one full normal-equation evaluation (gather + 5NN + plane fit + einsums)
    ne = jax.jit(lambda s, m, p: loam.build_normal_equations(s, m, p))
    out["normal_eq_ms"] = round(
        timeit(lambda: ne(ds, vm, pose_w), reps) * 1e3, 3)

    # scan2map at forced iteration counts (0.3 m / 2 deg off so the loop
    # actually runs its budget instead of converging instantly)
    bad = np.asarray(poses[20]).copy()
    bad[:3, 3] += [0.3, -0.2, 0.05]
    c, s_ = np.cos(0.035), np.sin(0.035)
    rz = np.array([[c, -s_, 0], [s_, c, 0], [0, 0, 1.0]])
    bad[:3, :3] = rz @ bad[:3, :3]
    bad_j = jnp.asarray(bad.astype(np.float32))
    for k in (1, 2, 4, 8):
        out[f"scan2map_{k}it_ms"] = round(
            timeit(lambda k=k: loam.scan2map(ds, vm, bad_j, max_iters=k).pose,
                   reps) * 1e3, 3)
    res = loam.scan2map(ds, vm, bad_j)
    out["iters_used"] = int(res.iters)
    out["gathers_used"] = int(res.n_gathers)
    out["converged"] = bool(res.converged)

    # dense-map build (the map_update device cost)
    bld = jax.jit(lambda s: vox.build_dense_voxel_map(
        s, 2.0, center, dims=dims, slab_size=24))
    out["map_build_ms"] = round(timeit(lambda: bld(sub), reps) * 1e3, 3)

    # the fused 16-scan batch (what the streamed executor dispatches),
    # plus upload cost of its rows
    from simpleslam_tpu.pipeline.streamed import (_streamed_batch,
                                                  UPLOAD_PAD, UPLOAD_SCALE)
    xyzf = np.asarray(ds.xyz)
    q = np.where(xyzf < 1e5,
                 np.clip(np.rint(xyzf / UPLOAD_SCALE), -32766, 32766),
                 float(UPLOAD_PAD)).astype(np.int16)
    rows = np.tile(q[None], (16, 1, 1))
    eye16 = np.tile(np.eye(4, dtype=np.float32), (16, 1, 1))

    def upload():
        return jnp.asarray(rows)

    out["upload16_ms"] = round(timeit(upload, reps) * 1e3, 3)
    rows_d = jnp.asarray(rows)
    loc_d = jnp.asarray(eye16)

    def batch():
        (_, _, _), packed = _streamed_batch(
            rows_d, loc_d, vm, pose_w, pose_w, jnp.eye(4, dtype=jnp.float32),
            "loam", "lo")
        return packed

    out["batch16_ms"] = round(timeit(batch, reps) * 1e3, 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
