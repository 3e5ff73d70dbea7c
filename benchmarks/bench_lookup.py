"""Round 2: vary inputs each call to defeat any result caching."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from simpleslam_tpu.ops import voxel as vox
from simpleslam_tpu.ops import pointcloud as pcops


def t(name, fn, n=10):
    jax.block_until_ready(fn(0))
    t0 = time.perf_counter()
    outs = [fn(i + 1) for i in range(n)]
    jax.block_until_ready(outs)
    print(f"{name:52s} {(time.perf_counter() - t0) / n * 1e3:8.2f} ms", flush=True)


rng = np.random.default_rng(0)
Q, K, V, M = 8192, 27, 65536, 8

# exact knn-shaped gather: (Q,K) rows from (V, M, 3)
slab = jnp.asarray(rng.normal(size=(V, M, 3)).astype(np.float32))
idxs = jnp.asarray(rng.integers(0, V, size=(n8 := 12, Q, K)).astype(np.int32))
g1 = jax.jit(lambda tb, ix: tb[ix].sum())
t("gather (Q,27) rows from (V,8,3) [vary idx]", lambda i: g1(slab, idxs[i % n8]))

slab2 = jnp.asarray(rng.normal(size=(V, M * 3)).astype(np.float32))
g2 = jax.jit(lambda tb, ix: tb[ix].sum())
t("gather (Q,27) rows from (V,24) [vary idx]", lambda i: g2(slab2, idxs[i % n8]))

# full knn with varying queries
pts = rng.normal(size=(n8, Q, 3)).astype(np.float32) * 20
qs = jnp.asarray(pts)
mask = jnp.ones((Q,), bool)
cloud = pcops.from_numpy(rng.normal(size=(100000, 3)).astype(np.float32) * 20, 131072)
vm = vox.build_voxel_map(cloud, 1.0, jnp.zeros(3, jnp.float32),
                         num_voxels=V, slab_size=M)
jax.block_until_ready(vm.slab)
t("vox.knn k=5 r=1 [vary queries]", lambda i: vox.knn(vm, qs[i % n8], mask, 5, 1)[0])

# knn pieces with varying queries
gn = jax.jit(lambda v, q, m: vox.gather_neighbors(v, q, m, 1)[0].sum())
t("gather_neighbors [vary queries]", lambda i: gn(vm, qs[i % n8], mask))


@jax.jit
def keys_and_lookup(vm_, q):
    c = vox.voxel_coords(q, vm_.origin, vm_.grid)
    offs = jnp.asarray(vox._neighbor_offsets(1))
    nc = c[:, None, :] + offs[None, :, :]
    nkeys = vox.pack_coords(nc, jnp.ones((q.shape[0], 1), bool))
    idx, found = vox.lookup_voxels(vm_.keys, nkeys)
    return idx.sum() + found.sum()


t("coords+pack+searchsorted [vary queries]", lambda i: keys_and_lookup(vm, qs[i % n8]))


@jax.jit
def topk_part(vm_, q, m):
    cand, valid = vox.gather_neighbors(vm_, q, m, 1)
    d2 = jnp.sum((cand - q[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(valid, d2, jnp.inf)
    neg_top, top_idx = jax.lax.top_k(-d2, 5)
    nbrs = jnp.take_along_axis(cand, top_idx[:, :, None], axis=1)
    return nbrs.sum()


t("gather+d2+top_k+take_along [vary queries]", lambda i: topk_part(vm, qs[i % n8], mask))
