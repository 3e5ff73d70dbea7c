"""Isolate per-call dispatch overhead through the axon tunnel."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np


def t(name, fn, n=20):
    jax.block_until_ready(fn(0))
    t0 = time.perf_counter()
    outs = [fn(i + 1) for i in range(n)]
    jax.block_until_ready(outs)
    print(f"{name:56s} {(time.perf_counter() - t0) / n * 1e3:8.2f} ms", flush=True)


tiny = jnp.arange(8.0)
f_id = jax.jit(lambda x: x + 1.0)
t("tiny x+1 (fresh interpreter)", lambda i: f_id(tiny + i))

rng = np.random.default_rng(0)

# allocate a 113MB buffer like the dense map
big = jnp.asarray(rng.normal(size=(1179649, 8, 3)).astype(np.float32))
jax.block_until_ready(big)
t("tiny x+1 (after 113MB buffer alive)", lambda i: f_id(tiny + i))

# build through the actual voxel-map builder
from simpleslam_tpu.ops import pointcloud as pcops
from simpleslam_tpu.ops.voxel import build_dense_voxel_map

cloud = pcops.from_numpy(rng.normal(size=(100000, 3)).astype(np.float32) * 30,
                         131072)
vm = build_dense_voxel_map(cloud, 1.0, jnp.zeros(3, jnp.float32),
                           (192, 192, 32), 8)
jax.block_until_ready(vm.slab)
t("tiny x+1 (after build_dense_voxel_map)", lambda i: f_id(tiny + i))

# pass the big pytree as an argument
f_use = jax.jit(lambda v, x: x + v.grid)
t("tiny + vm ARG (pytree w/ 113MB leaf)", lambda i: f_use(vm, tiny + i))

# gather from it
idx = jnp.asarray(rng.integers(0, 1179649, size=(8, 8192, 27)).astype(np.int32))
g = jax.jit(lambda v, ix: v.slab[ix].sum())
t("gather (8192,27) rows from vm.slab", lambda i: g(vm, idx[i % 8]))

# sequence effect: interleave tiny ops
t("tiny x+1 again", lambda i: f_id(tiny + i))
