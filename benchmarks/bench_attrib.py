"""Attribution: where the registration batch's 90 ms/batch actually lives.

Round-3 verdict: busy_frac ~1.0 but sol_frac 0.0074 — the device pipeline is
the bottleneck AND ~135x off the analytic HBM bound. This bench decomposes
the per-scan device time into its physical parts at production shapes and
prototypes the candidate fixes (query trim, merged-neighborhood rows, int16
rows, spatially sorted queries) so the chosen design is measured, not
guessed. Prints one JSON line.

Methodology: the axon tunnel's ~25 ms RTT floor swamps sub-millisecond
device ops, so each op is AMPLIFIED — ``AMP`` data-dependent repetitions
chained inside one compiled ``fori_loop`` (the carry feeds the next
iteration so XLA cannot parallelize or DCE them) — and the reported
per-op number is (total - rtt) / AMP.

Usage: python benchmarks/bench_attrib.py [reps]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from micro_loam import timeit

AMP = 32


def build_merged_rows(vm, dtype="f32"):
    """Prototype: per-voxel slabs -> per-voxel 2x2x2 MERGED rows.

    Row v holds the points of voxels v + {0,1}^3 concatenated, so the corner
    gather needs ONE row per query instead of 8. Built from contiguous
    shifted slices (no random access).
    """
    import jax.numpy as jnp

    from simpleslam_tpu.ops.pointcloud import PAD_COORD

    gx, gy, gz = vm.dims
    m = vm.slab_pts
    pts = vm.slab[:-1, : m * 3].reshape(gx, gy, gz, m * 3)
    padded = jnp.pad(pts, ((0, 1), (0, 1), (0, 1), (0, 0)),
                     constant_values=PAD_COORD)
    parts = []
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                parts.append(padded[dx:dx + gx, dy:dy + gy, dz:dz + gz])
    merged = jnp.concatenate(parts, axis=-1).reshape(gx * gy * gz, 8 * m * 3)
    merged = jnp.concatenate(
        [merged, jnp.full((1, 8 * m * 3), PAD_COORD, jnp.float32)])
    if dtype == "i16":
        # quantize relative to the window corner: 192 m extent / 2^15 ~ 6 mm
        scale = np.float32(float(gx) * 2.0 / 32767.0)
        q = jnp.clip(jnp.round((merged - vm.corner[0]) / scale),
                     -32768, 32767).astype(jnp.int16)
        q = jnp.where(merged >= 0.5 * PAD_COORD, jnp.int16(32767), q)
        return q, scale
    return merged, None


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
    merged_pts = np.concatenate(clouds)
    sub = pcops.from_numpy(merged_pts, 131072)
    center = jnp.asarray(poses[20][:3, 3].astype(np.float32))
    dims = (96, 96, 16)
    vm = vox.build_dense_voxel_map(sub, 2.0, center, dims=dims, slab_size=24)
    jax.block_until_ready(vm.slab)

    scan = sim.simulate_scan(world, sim.sensor_from_body(poses[20]),
                             n_az=1800, n_el=16, rng=rng)
    pose_w = jnp.asarray(poses[20].astype(np.float32))

    tiny = jax.jit(lambda x: x + 1.0)
    x0 = jnp.zeros(())
    rtt = timeit(lambda: tiny(x0), reps)
    out["rtt_ms"] = round(rtt * 1e3, 3)

    def amp_ms(t):
        return round(max(t - rtt, 0.0) / AMP * 1e3, 3)

    def ds_at(cap):
        return pcops.compact(vox.voxel_downsample(
            pcops.from_numpy(scan, 32768), 0.5), cap)

    # -- gathers, amplified: carry perturbs the queries so iterations chain.
    # Big tables ride as EXPLICIT jit args (closed-over arrays are embedded
    # in the serialized program — the axon remote-compile endpoint rejects
    # those bodies with HTTP 413).
    def make_amp_gather(kind):
        @jax.jit
        def f(table, queries):
            def body(i, q):
                s = kind(table, q)  # scalar summary of the gathered rows
                return q + (s * 1e-30 + 1e-7)
            return jnp.sum(jax.lax.fori_loop(0, AMP, body, queries))
        return f

    mf32, _ = build_merged_rows(vm, "f32")
    mf32 = jax.block_until_ready(mf32)
    mi16, scale = build_merged_rows(vm, "i16")
    mi16 = jax.block_until_ready(mi16)
    out["merged_row_lanes"] = int(mf32.shape[1])

    bld = jax.jit(lambda v: jnp.sum(build_merged_rows(v, "f32")[0][::97, ::29]))
    out["merged_build_f32_ms"] = round(
        (timeit(lambda: bld(vm), reps) - rtt) * 1e3, 3)

    def flat_of(q):
        base = jnp.floor((q - vm.corner) / vm.grid - 0.5).astype(jnp.int32)
        return vox._dense_flat(base, vm.dims, jnp.ones(q.shape[:1], bool))

    for cap in (8192, 5120):
        ds = ds_at(cap)
        p_map = jax.block_until_ready(
            jax.jit(lambda s, p: (s.xyz @ p[:3, :3].T) + p[:3, 3])(ds, pose_w))
        mask = ds.mask

        g8 = make_amp_gather(lambda t, q: jnp.sum(
            vox.gather_neighbors_corner(t, q, mask)[0]))
        gm = make_amp_gather(lambda t, q: jnp.sum(t[flat_of(q)]))
        gmi = make_amp_gather(lambda t, q: jnp.sum(
            t[flat_of(q)].astype(jnp.float32)))

        out[f"gather8_q{cap}_ms"] = amp_ms(
            timeit(lambda: g8(vm, p_map), reps))
        out[f"gather_merged_f32_q{cap}_ms"] = amp_ms(
            timeit(lambda: gm(mf32, p_map), reps))
        out[f"gather_merged_i16_q{cap}_ms"] = amp_ms(
            timeit(lambda: gmi(mi16, p_map), reps))

        order = np.argsort(np.asarray(flat_of(jnp.asarray(p_map))))
        pm_sorted = jnp.asarray(np.asarray(p_map)[order])
        out[f"gather8_q{cap}_sorted_ms"] = amp_ms(
            timeit(lambda: g8(vm, pm_sorted), reps))
        out[f"gather_merged_f32_q{cap}_sorted_ms"] = amp_ms(
            timeit(lambda: gm(mf32, pm_sorted), reps))
        out[f"gather_merged_i16_q{cap}_sorted_ms"] = amp_ms(
            timeit(lambda: gmi(mi16, pm_sorted), reps))

        # -- linearization alone (XLA fusions), amplified through the pose --
        cand, ok = loam.gather_candidates(ds, vm, pose_w)
        cand = jax.block_until_ready(cand)

        @jax.jit
        def amp_lin(s, c, o, p0):
            def body(i, p):
                JtJ, _, _ = loam.normal_equations_from_candidates(s, c, o, p)
                return p + jnp.sum(JtJ) * 1e-30
            return jnp.sum(jax.lax.fori_loop(0, AMP, body, p0))
        out[f"linearize_xla_q{cap}_ms"] = amp_ms(timeit(
            lambda: amp_lin(ds, cand, ok, pose_w), reps))

    # -- full GN iteration (gather + linearize), amplified ------------------
    ds = ds_at(8192)

    @jax.jit
    def amp_gn(s, m, p0):
        def body(i, p):
            JtJ, _, _ = loam.build_normal_equations(s, m, p)
            return p + jnp.sum(JtJ) * 1e-30
        return jnp.sum(jax.lax.fori_loop(0, AMP, body, p0))
    out["gn_iter_q8192_ms"] = amp_ms(timeit(
        lambda: amp_gn(ds, vm, pose_w), reps))

    # -- while_loop / scan chain overhead: scan2map at forced iteration
    # counts (converged scan -> 1 iter body + cond machinery)
    s2m = jax.jit(lambda s, m, p, k: jnp.sum(
        loam.scan2map(s, m, p, max_iters=k).pose), static_argnums=3)
    for k in (1, 8):
        out[f"scan2map_{k}it_ms"] = round(
            (timeit(lambda k=k: s2m(ds, vm, pose_w, k), reps) - rtt) * 1e3, 3)

    # -- the 16-scan fused batch (cross-check vs BENCH device_exec) ---------
    from simpleslam_tpu.pipeline.streamed import (_streamed_batch,
                                                  UPLOAD_PAD, UPLOAD_SCALE)
    xyzf = np.asarray(ds.xyz)
    q = np.where(xyzf < 1e5,
                 np.clip(np.rint(xyzf / UPLOAD_SCALE), -32766, 32766),
                 float(UPLOAD_PAD)).astype(np.int16)
    rows = np.tile(q[None], (16, 1, 1))
    rows_d = jnp.asarray(rows)
    loc_d = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (16, 1, 1)))

    def batch():
        (_, _, _), packed = _streamed_batch(
            rows_d, loc_d, vm, pose_w, pose_w, jnp.eye(4, dtype=jnp.float32),
            "loam", "lo")
        return jnp.sum(packed)

    out["batch16_ms"] = round((timeit(batch, reps) - rtt) * 1e3, 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
