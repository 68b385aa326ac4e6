"""Primitive costs for sort-based expansion: multi-operand sorts, small
gathers, compare-reduce. Slope-timed (k chained calls amortize dispatch)."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
print(f"devices: {jax.devices()}", flush=True)
rng = np.random.default_rng(0)


def fetch1(x):
    return np.asarray(jnp.ravel(x)[:1])


def bench(label, fn, args, k=8):
    r = fn(*args)
    fetch1(jax.tree_util.tree_leaves(r)[0])
    t0 = time.time()
    for _ in range(k):
        r = fn(*args)
    fetch1(jax.tree_util.tree_leaves(r)[0])
    print(f"{label}: {(time.time()-t0)/k*1e3:.1f} ms/call", flush=True)


B, W, M = 2048, 4096, 128
a = jnp.asarray(rng.integers(0, 1 << 20, (B, W)).astype(np.int32))
b2 = jnp.asarray(rng.integers(0, 1 << 20, (B, W)).astype(np.int32))
c = jnp.asarray(rng.integers(0, 1 << 20, (B, W)).astype(np.int32))
sm = jnp.asarray(rng.integers(0, M, (B, M)).astype(np.int32))
sm2 = jnp.asarray(rng.integers(0, 2 * M, (B, 2 * M)).astype(np.int32))
idx_mm = jnp.asarray(rng.integers(0, M, (B, M)).astype(np.int32))
idx_mw = jnp.asarray(rng.integers(0, W, (B, M)).astype(np.int32))

bench("sort3 [B,W] 1key+2pay",
      jax.jit(lambda x, y, z: jax.lax.sort((x, y, z), dimension=1,
                                           num_keys=1)), [a, b2, c])
bench("sort2 [B,2M]",
      jax.jit(lambda x, y: jax.lax.sort((x, y), dimension=1, num_keys=2)),
      [sm2, sm2])
bench("gather [B,M]<-[B,M]",
      jax.jit(lambda v, i: jnp.take_along_axis(v, i, axis=1)), [sm, idx_mm])
bench("gather [B,M]<-[B,W]",
      jax.jit(lambda v, i: jnp.take_along_axis(v, i, axis=1)), [a, idx_mw])
bench("gather x4 [B,M]<-[B,W] fused",
      jax.jit(lambda v, i: jnp.take_along_axis(v, i, axis=1)
              + jnp.take_along_axis(v, i + 1, axis=1)
              + jnp.take_along_axis(v, jnp.maximum(i - 1, 0), axis=1)
              + jnp.take_along_axis(v, i // 2, axis=1)), [a, idx_mw])
bench("cmp-reduce [B,M,W/8]",
      jax.jit(lambda v, i: jnp.sum(
          v[:, None, :W // 8] <= i[:, :, None], axis=2, dtype=jnp.int32)),
      [a, idx_mw])
_ = None
bench("binsearch 12it [B,M] in [B,W]",
      jax.jit(lambda v, s: _bs(v, s)), [jnp.sort(a, axis=1), idx_mw])


def _bs(offs, slots):
    b, m = slots.shape
    w = offs.shape[1]
    lo = jnp.zeros((b, m), jnp.int32)
    hi = jnp.full((b, m), w - 1, jnp.int32)
    for _ in range(12):
        mid = (lo + hi) >> 1
        v = jnp.take_along_axis(offs, mid, axis=1)
        gt = v > slots
        hi = jnp.where(gt, mid, hi)
        lo = jnp.where(gt, lo, jnp.minimum(mid + 1, w - 1))
    return hi
