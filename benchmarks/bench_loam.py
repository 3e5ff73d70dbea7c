"""Verify the dense-grid LOAM path speed on the real chip."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from simpleslam_tpu.models.registration import (LoamRegister,
                                                _fused_odometry_step,
                                                _fused_downsample)
from simpleslam_tpu.ops import loam, pointcloud as pcops
from simpleslam_tpu.pipeline import simulate as sim
from simpleslam_tpu.utils.config import Params

Params.load({})
cfg = Params.get_instance()


def t(name, fn, n=10):
    jax.block_until_ready(fn(0))
    t0 = time.perf_counter()
    outs = [fn(i + 1) for i in range(n)]
    jax.block_until_ready(outs)
    print(f"{name:46s} {(time.perf_counter() - t0) / n * 1e3:8.2f} ms", flush=True)


world = sim.make_world(seed=0)
streams = sim.simulate_sequence(world, n_scans=6, seed=0, n_az=1800, n_el=16)
cap = int(cfg["tpu"]["scan_capacity"])
dsc = int(cfg["tpu"]["ds_scan_capacity"])
sub_cap = int(cfg["tpu"]["submap_capacity"])

reg = LoamRegister()
submap_np = np.concatenate(streams.scans[:3])
sub = pcops.from_numpy(submap_np, sub_cap)
origin = jnp.zeros(3, jnp.float32)
t("build dense target (131072)", lambda i: reg.build_target(sub, origin).slab,
  n=5)
vm = reg.build_target(sub, origin)
jax.block_until_ready(vm.slab)

pcs = [pcops.from_numpy(s, cap) for s in streams.scans]
jax.block_until_ready([p.xyz for p in pcs])
poses = [jnp.asarray(streams.gt_poses[i].astype(np.float32)) for i in range(6)]

dss = [_fused_downsample(p, jnp.float32(0.5), origin, dsc) for p in pcs]
jax.block_until_ready([d.xyz for d in dss])

ne = jax.jit(loam.build_normal_equations)
t("build_normal_equations [dense]", lambda i: ne(dss[i % 6], vm, poses[i % 6]))
t("scan2map 8 iters [dense]", lambda i: loam.scan2map(
    dss[i % 6], vm, poses[i % 6]).pose)
t("fused odometry step [dense]", lambda i: _fused_odometry_step(
    pcs[i % 6], vm, poses[i % 6], jnp.float32(0.5), dsc, "loam")[0])

res = [loam.scan2map(dss[i], vm, poses[i]) for i in range(6)]
print("iters:", [int(r.iters) for r in res],
      "conv:", [bool(r.converged) for r in res],
      "nvalid:", [int(r.n_valid) for r in res])
