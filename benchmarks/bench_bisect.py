"""Bisect the LOAM iteration: where do the milliseconds actually go."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from simpleslam_tpu.models.registration import LoamRegister, _fused_downsample
from simpleslam_tpu.ops import geometry as geo, pointcloud as pcops
from simpleslam_tpu.ops.voxel import _dense_flat, _neighbor_offsets, gather_neighbors_dense
from simpleslam_tpu.pipeline import simulate as sim
from simpleslam_tpu.utils.config import Params

Params.load({})
cfg = Params.get_instance()
N = 8


def t(name, fn, n=N):
    jax.block_until_ready(fn(0))
    t0 = time.perf_counter()
    outs = [fn(i + 1) for i in range(n)]
    jax.block_until_ready(outs)
    print(f"{name:52s} {(time.perf_counter() - t0) / n * 1e3:8.2f} ms", flush=True)


world = sim.make_world(seed=0)
streams = sim.simulate_sequence(world, n_scans=N + 2, seed=0, n_az=1800, n_el=16)
cap, dsc, sub_cap = (int(cfg["tpu"][k]) for k in
                     ("scan_capacity", "ds_scan_capacity", "submap_capacity"))
origin = jnp.zeros(3, jnp.float32)
reg = LoamRegister()
sub = pcops.from_numpy(np.concatenate(streams.scans[:2]), sub_cap)
vm = reg.build_target(sub, origin)
pcs = [pcops.from_numpy(s, cap) for s in streams.scans]
dss = [_fused_downsample(p, jnp.float32(0.5), origin, dsc) for p in pcs]
jax.block_until_ready([d.xyz for d in dss] + [vm.slab])
poses = [jnp.asarray(streams.gt_poses[i].astype(np.float32)) for i in range(N)]

rng = np.random.default_rng(0)
rand_q = jnp.asarray(rng.normal(size=(N, dsc, 3)).astype(np.float32) * 30)
mask = jnp.ones((dsc,), bool)

gnd = jax.jit(lambda v, q, m: gather_neighbors_dense(v, q, m, 1)[0].sum())
t("gather_neighbors_dense random queries", lambda i: gnd(vm, rand_q[i % N], mask))
t("gather_neighbors_dense real ds points", lambda i: gnd(
    vm, dss[i % N].xyz, dss[i % N].mask))


@jax.jit
def flat_only(v, q, m):
    offs = jnp.asarray(_neighbor_offsets(1))
    c = jnp.floor((q - v.corner) / v.grid).astype(jnp.int32)
    nc = c[:, None, :] + offs[None, :, :]
    flat = _dense_flat(nc, v.dims, m[:, None])
    return flat.sum()


t("index computation only", lambda i: flat_only(vm, rand_q[i % N], mask))


@jax.jit
def rows_only(v, q, m):
    offs = jnp.asarray(_neighbor_offsets(1))
    c = jnp.floor((q - v.corner) / v.grid).astype(jnp.int32)
    nc = c[:, None, :] + offs[None, :, :]
    flat = _dense_flat(nc, v.dims, m[:, None])
    return v.slab[flat].sum()


t("index + slab rows", lambda i: rows_only(vm, rand_q[i % N], mask))


@jax.jit
def counts_only(v, q, m):
    offs = jnp.asarray(_neighbor_offsets(1))
    c = jnp.floor((q - v.corner) / v.grid).astype(jnp.int32)
    nc = c[:, None, :] + offs[None, :, :]
    flat = _dense_flat(nc, v.dims, m[:, None])
    lane = jnp.arange(v.slab_size, dtype=jnp.int32)
    valid = lane[None, None, :] < v.counts[flat][:, :, None]
    return valid.sum()


t("index + counts/valid", lambda i: counts_only(vm, rand_q[i % N], mask))

tp = jax.jit(lambda p, q: geo.transform_points(p, q).sum())
t("transform_points only", lambda i: tp(poses[i % N], rand_q[i % N]))
