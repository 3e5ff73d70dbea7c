"""Stage-by-stage timing of the odometry hot path on the real chip."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from simpleslam_tpu.ops import loam, pointcloud as pcops, voxel as vox
from simpleslam_tpu.models.registration import _fused_odometry_step
from simpleslam_tpu.pipeline import simulate as sim
from simpleslam_tpu.utils.config import Params

Params.load({})
cfg = Params.get_instance()


def t(name, fn, n=10):
    fn()  # warmup/compile
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:40s} {dt:8.2f} ms")
    return dt


world = sim.make_world(seed=0)
streams = sim.simulate_sequence(world, n_scans=3, seed=0, n_az=1800, n_el=16)
scan = streams.scans[2]
print("scan pts:", len(scan))

# 1. host->device transfer
cap = int(cfg["tpu"]["scan_capacity"])
t("from_numpy+put (393KB)", lambda: jax.block_until_ready(
    pcops.from_numpy(scan, cap).xyz))

pc = pcops.from_numpy(scan, cap)
jax.block_until_ready(pc.xyz)

# 2. downsample + compact
from simpleslam_tpu.models.registration import _fused_downsample
dsc = int(cfg["tpu"]["ds_scan_capacity"])
origin = jnp.zeros(3, jnp.float32)
t("voxel_downsample+compact (32768)", lambda: _fused_downsample(
    pc, jnp.float32(0.5), origin, dsc))

ds = _fused_downsample(pc, jnp.float32(0.5), origin, dsc)
jax.block_until_ready(ds.xyz)
print("ds count:", int(ds.mask.sum()))

# 3. build voxel map from submap-sized cloud
sub_cap = int(cfg["tpu"]["submap_capacity"])
submap_np = np.concatenate([streams.scans[0], streams.scans[1], scan])
sub = pcops.from_numpy(submap_np, sub_cap)
jax.block_until_ready(sub.xyz)
nv = int(cfg["tpu"]["map_voxel_capacity"])
sl = int(cfg["tpu"]["max_pts_per_voxel"])
t("build_voxel_map (131072 -> 65536 vox)", lambda: vox.build_voxel_map(
    sub, 1.0, origin, num_voxels=nv, slab_size=sl).slab)

vm = vox.build_voxel_map(sub, 1.0, origin, num_voxels=nv, slab_size=sl)
jax.block_until_ready(vm.slab)

# 4. one knn gather
t("knn k=5 r=1 (8192 q)", lambda: vox.knn(vm, ds.xyz, ds.mask, 5, 1)[0])

# 5. one normal-equations build
ne = jax.jit(lambda s, v, p: loam.build_normal_equations(s, v, p))
pose = jnp.eye(4, dtype=jnp.float32)
t("build_normal_equations", lambda: ne(ds, vm, pose))

# 6. scan2map 1 iter vs 8
t("scan2map max_iters=1", lambda: loam.scan2map(ds, vm, pose, max_iters=1).pose)
t("scan2map max_iters=8", lambda: loam.scan2map(ds, vm, pose, max_iters=8).pose)

# 7. fused odometry step (what the pipeline calls per scan)
t("fused odometry step", lambda: _fused_odometry_step(
    pc, vm, pose, jnp.float32(0.5), dsc, "loam")[0])

# 8. fetch results to host
res = _fused_odometry_step(pc, vm, pose, jnp.float32(0.5), dsc, "loam")
jax.block_until_ready(res)
t("np.asarray(pose 4x4)", lambda: np.asarray(
    _fused_odometry_step(pc, vm, pose, jnp.float32(0.5), dsc, "loam")[0]))
