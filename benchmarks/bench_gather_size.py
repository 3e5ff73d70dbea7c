"""Gather cost vs table size / row width / index shape (varying inputs)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np


def t(name, fn, n=10):
    jax.block_until_ready(fn(0))
    t0 = time.perf_counter()
    outs = [fn(i + 1) for i in range(n)]
    jax.block_until_ready(outs)
    print(f"{name:52s} {(time.perf_counter() - t0) / n * 1e3:8.2f} ms", flush=True)


rng = np.random.default_rng(0)
QK = 8192 * 27
NV = 8

idx_sets = jnp.asarray(rng.integers(0, 65536, size=(NV, QK)).astype(np.int32))

for V, W, dt in [(65536, 24, np.float32), (262144, 24, np.float32),
                 (1179649, 24, np.float32), (1179649, 32, np.float32),
                 (1179649, 128, np.float32), (1179649, 24, np.float16)]:
    table = jnp.asarray(rng.normal(size=(V, W)).astype(dt))
    idxs = jnp.asarray(rng.integers(0, V, size=(NV, QK)).astype(np.int32))
    g = jax.jit(lambda tb, ix: tb[ix].sum())
    t(f"flat gather {QK} rows from ({V},{W}) {np.dtype(dt).name}",
      lambda i: g(table, idxs[i % NV]))

# 2D index shape like the kernel uses
table = jnp.asarray(rng.normal(size=(1179649, 8, 3)).astype(np.float32))
idx2 = jnp.asarray(rng.integers(0, 1179649, size=(NV, 8192, 27)).astype(np.int32))
g2 = jax.jit(lambda tb, ix: tb[ix].sum())
t("gather (8192,27) rows from (1.18M,8,3)", lambda i: g2(table, idx2[i % NV]))

# scalar int gather (two-level indirection step)
itab = jnp.asarray(rng.integers(0, 65536, size=(1179649,)).astype(np.int32))
g3 = jax.jit(lambda tb, ix: tb[ix].sum())
t("scalar gather 221k from (1.18M,) int32", lambda i: g3(itab, idx2[i % NV]))

# two-level: scalar indirection then compact row gather
ctab = jnp.asarray(rng.normal(size=(65537, 8, 3)).astype(np.float32))


@jax.jit
def two_level(itab, ctab, ix):
    slot = itab[ix]
    return ctab[slot].sum()


t("two-level: int32 then (65537,8,3) rows", lambda i: two_level(
    itab, ctab, idx2[i % NV]))

# counts gather included (the kernel also gathers counts)
cnt = jnp.asarray(rng.integers(0, 9, size=(1179649,)).astype(np.int32))


@jax.jit
def full_like_kernel(tb, cn, ix):
    return tb[ix].sum() + cn[ix].sum()


t("rows + counts from 1.18M (current kernel)", lambda i: full_like_kernel(
    table, cnt, idx2[i % NV]))
