"""Which op inside merge_join_expand is slow? Time each constituent."""
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
B, W, M = 2048, 4096, 128


def fetch1(x):
    return np.asarray(jnp.ravel(x)[:1])


def bench(label, fn, args, k=8):
    r = fn(*args)
    fetch1(jax.tree_util.tree_leaves(r)[0])
    t0 = time.time()
    for _ in range(k):
        r = fn(*args)
    fetch1(jax.tree_util.tree_leaves(r)[0])
    dt = (time.time() - t0) / k
    print(f"{label}: {dt*1e3:.1f} ms/call", flush=True)
    return dt


vals = jnp.asarray(rng.integers(0, W, size=(B, W)).astype(np.int32))
idx_m = jnp.asarray(rng.integers(0, W, size=(B, M)).astype(np.int32))
idx_w = jnp.asarray(rng.integers(0, M, size=(B, W)).astype(np.int32))
small = jnp.asarray(rng.integers(0, M, size=(B, M)).astype(np.int32))

bench("take_along_axis [B,M] from [B,W]",
      jax.jit(lambda v, i: jnp.take_along_axis(v, i, axis=1)), [vals, idx_m])
bench("scatter set [B,W] -> [B,M+W]",
      jax.jit(lambda v, i: jnp.zeros((B, M + W + 1), jnp.int32).at[
          jax.lax.broadcasted_iota(jnp.int32, (B, W), 0), i].set(v)),
      [vals, jnp.asarray(rng.integers(0, M + W, (B, W)).astype(np.int32))])
bench("scatter max [B,W] -> [B,M+1]",
      jax.jit(lambda v, i: jnp.full((B, M + 1), -1, jnp.int32).at[
          jax.lax.broadcasted_iota(jnp.int32, (B, W), 0), i].max(v)),
      [idx_w, idx_w])
bench("cummax [B,M]", jax.jit(lambda v: jax.lax.cummax(v, axis=1)), [small])
bench("cummax [B,W]", jax.jit(lambda v: jax.lax.cummax(v, axis=1)), [vals])
bench("cumsum [B,W]",
      jax.jit(lambda v: jnp.cumsum(v, axis=1, dtype=jnp.int32)), [vals])
bench("sort2 [B,M]",
      jax.jit(lambda a, b: jax.lax.sort((a, b), dimension=1, num_keys=2)),
      [small, small])
bench("sort2 [B,W]",
      jax.jit(lambda a, b: jax.lax.sort((a, b), dimension=1, num_keys=2)),
      [vals, vals])
bench("sortkv [B,W]",
      jax.jit(lambda a, b: jax.lax.sort_key_val(a, b, dimension=1)),
      [vals, vals])
