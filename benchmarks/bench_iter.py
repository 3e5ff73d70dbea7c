"""Per-component timing of one LOAM GN iteration (varying inputs)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from simpleslam_tpu.models.registration import (LoamRegister,
                                                _fused_downsample,
                                                _fused_odometry_step)
from simpleslam_tpu.ops import geometry as geo, loam, pointcloud as pcops
from simpleslam_tpu.ops.linalg3 import symeig3x3_smallest
from simpleslam_tpu.ops.voxel import gather_neighbors_dense
from simpleslam_tpu.pipeline import simulate as sim
from simpleslam_tpu.utils.config import Params

Params.load({})
cfg = Params.get_instance()
N = 10


def t(name, fn, n=N):
    jax.block_until_ready(fn(0))
    t0 = time.perf_counter()
    outs = [fn(i + 1) for i in range(n)]
    jax.block_until_ready(outs)
    print(f"{name:46s} {(time.perf_counter() - t0) / n * 1e3:8.2f} ms", flush=True)


world = sim.make_world(seed=0)
streams = sim.simulate_sequence(world, n_scans=N + 2, seed=0, n_az=1800, n_el=16)
cap = int(cfg["tpu"]["scan_capacity"])
dsc = int(cfg["tpu"]["ds_scan_capacity"])
sub_cap = int(cfg["tpu"]["submap_capacity"])
origin = jnp.zeros(3, jnp.float32)

pcs = [pcops.from_numpy(s, cap) for s in streams.scans]
jax.block_until_ready([p.xyz for p in pcs])

t("voxel_downsample+compact 32768", lambda i: _fused_downsample(
    pcs[i % N], jnp.float32(0.5), origin, dsc).xyz)

reg = LoamRegister()
subs = [pcops.from_numpy(np.concatenate(streams.scans[i:i + 2]), sub_cap)
        for i in range(N)]
jax.block_until_ready([s.xyz for s in subs])
t("build dense target (131072 cap)", lambda i: reg.build_target(
    subs[i % N], origin).slab)

vm = reg.build_target(subs[0], origin)
jax.block_until_ready(vm.slab)
dss = [_fused_downsample(p, jnp.float32(0.5), origin, dsc) for p in pcs]
jax.block_until_ready([d.xyz for d in dss])
poses = [jnp.asarray(streams.gt_poses[i].astype(np.float32)) for i in range(N)]

# components of one iteration
@jax.jit
def just_gather(ds, vm, pose):
    p_map = geo.transform_points(pose, ds.xyz)
    cand, ok = gather_neighbors_dense(vm, p_map, ds.mask, 1)
    return cand.sum() + ok.sum()


t("transform+gather (8192x216)", lambda i: just_gather(
    dss[i % N], vm, poses[i % N]))


@jax.jit
def gather_select(ds, vm, pose):
    p_map = geo.transform_points(pose, ds.xyz)
    cand, ok = gather_neighbors_dense(vm, p_map, ds.mask, 1)
    d2 = jnp.sum((cand - p_map[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(ok, d2, jnp.inf)
    w5 = jnp.zeros_like(d2)
    dd = d2
    d_k = jnp.zeros((d2.shape[0],), d2.dtype)
    for _ in range(5):
        d_k = jnp.min(dd, axis=1)
        hit = (dd == d_k[:, None]) & jnp.isfinite(d_k)[:, None]
        first = jnp.cumsum(hit.astype(jnp.int32), axis=1) == 1
        hit = hit & first
        w5 = w5 + hit.astype(w5.dtype)
        dd = jnp.where(hit, jnp.inf, dd)
    return w5.sum() + d_k.sum()


t("... + 5-NN select", lambda i: gather_select(dss[i % N], vm, poses[i % N]))


@jax.jit
def gather_select_fit(ds, vm, pose):
    p_map = geo.transform_points(pose, ds.xyz)
    cand, ok = gather_neighbors_dense(vm, p_map, ds.mask, 1)
    d2 = jnp.sum((cand - p_map[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(ok, d2, jnp.inf)
    w5 = jnp.zeros_like(d2)
    dd = d2
    for _ in range(5):
        d_k = jnp.min(dd, axis=1)
        hit = (dd == d_k[:, None]) & jnp.isfinite(d_k)[:, None]
        first = jnp.cumsum(hit.astype(jnp.int32), axis=1) == 1
        hit = hit & first
        w5 = w5 + hit.astype(w5.dtype)
        dd = jnp.where(hit, jnp.inf, dd)
    centroid = jnp.einsum("nc,nci->ni", w5, cand) / 5.0
    Bc = cand - centroid[:, None, :]
    Bw = Bc * w5[..., None]
    M = jnp.einsum("nci,ncj->nij", Bw, Bc)
    return M.sum()


t("... + centroid/scatter einsums", lambda i: gather_select_fit(
    dss[i % N], vm, poses[i % N]))

ne = jax.jit(loam.build_normal_equations)
t("full build_normal_equations", lambda i: ne(dss[i % N], vm, poses[i % N]))

M_test = jnp.asarray(np.random.default_rng(0).normal(
    size=(N, 8192, 3, 3)).astype(np.float32))
M_test = M_test @ jnp.swapaxes(M_test, -1, -2)
se = jax.jit(lambda m: symeig3x3_smallest(m)[1].sum())
t("symeig3x3_smallest (8192)", lambda i: se(M_test[i % N]))

t("scan2map gt init", lambda i: loam.scan2map(
    dss[i % N], vm, poses[i % N]).pose)
prev = [jnp.asarray(streams.gt_poses[max(i - 1, 0)].astype(np.float32))
        for i in range(N)]
t("scan2map last-pose init", lambda i: loam.scan2map(
    dss[i % N], vm, prev[i % N]).pose)
t("fused step last-pose init", lambda i: _fused_odometry_step(
    pcs[i % N], vm, prev[i % N], jnp.float32(0.5), dsc, "loam")[0])
