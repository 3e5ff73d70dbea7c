"""Micro-bench: gather layouts / top-k strategies on the real chip."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np


def t(name, fn, n=20):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    print(f"{name:48s} {(time.perf_counter() - t0) / n * 1e3:8.2f} ms")


rng = np.random.default_rng(0)
Q = 8192
K = 27

for V, W in [(65536, 24), (65536, 128), (16384, 128), (16384, 256), (8192, 512)]:
    table = jnp.asarray(rng.normal(size=(V, W)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, V, size=(Q, K)).astype(np.int32))
    f = jax.jit(lambda tb, ix: tb[ix])
    t(f"gather ({Q}x{K}) rows from ({V},{W})", lambda: f(table, idx))

# searchsorted cost
keys = jnp.asarray(np.sort(rng.integers(0, 1 << 30, size=65536)).astype(np.int32))
q = jnp.asarray(rng.integers(0, 1 << 30, size=(Q, K)).astype(np.int32))
f2 = jax.jit(lambda k, qq: jnp.searchsorted(k, qq))
t("searchsorted 221k into 65536", lambda: f2(keys, q))

# top-k strategies over (Q, 216)
d2 = jnp.asarray(rng.normal(size=(Q, 216)).astype(np.float32) ** 2)
f3 = jax.jit(lambda d: jax.lax.top_k(-d, 5))
t("lax.top_k k=5 over (8192,216)", lambda: f3(d2))


def five_argmin(d):
    outs = []
    idxs = []
    for _ in range(5):
        i = jnp.argmin(d, axis=1)
        v = jnp.take_along_axis(d, i[:, None], axis=1)
        outs.append(v[:, 0])
        idxs.append(i)
        d = d.at[jnp.arange(d.shape[0]), i].set(jnp.inf)
    return jnp.stack(outs, 1), jnp.stack(idxs, 1)


f4 = jax.jit(five_argmin)
t("5x argmin over (8192,216)", lambda: f4(d2))

# approx_max_k
f5 = jax.jit(lambda d: jax.lax.approx_max_k(-d, 5, recall_target=0.95))
t("approx_max_k k=5 (8192,216)", lambda: f5(d2))

# full sort comparison
f6 = jax.jit(lambda d: jnp.sort(d, axis=1)[:, :5])
t("full sort (8192,216) take 5", lambda: f6(d2))

# argsort of 131072 (submap downsample cost check)
big = jnp.asarray(rng.integers(0, 1 << 30, size=131072).astype(np.int32))
f7 = jax.jit(lambda x: jnp.argsort(x))
t("argsort 131072 int32", lambda: f7(big))

# dense grid scatter build: 131072 points -> (16384, 8, 3)
pts = jnp.asarray(rng.normal(size=(131072, 3)).astype(np.float32) * 8)
f8 = jax.jit(lambda p: jnp.zeros((16384 * 8, 3), jnp.float32).at[
    jnp.clip((p[:, 0] * 100).astype(jnp.int32) % (16384 * 8), 0, 16384 * 8 - 1)
].add(p, mode="drop"))
t("scatter-add 131072 -> 131072 rows", lambda: f8(pts))
