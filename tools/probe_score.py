"""Micro-benchmark the score_chunk constituents on representative shapes.

Fetch-timed (block_until_ready does not sync on axon), slope method to
amortize sync latency: time K chained calls, report per-call.
"""
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

from rattle_tpu.ops.join_device import merge_join_counts, merge_join_expand
from rattle_tpu.ops.pallas_kernels import lis_filter_pallas

rng = np.random.default_rng(0)


def fetch1(x):
    return np.asarray(jnp.ravel(x)[:1])


def bench(label, fn, args, k=8):
    # warm compile
    r = fn(*args)
    fetch1(jax.tree_util.tree_leaves(r)[0])
    t0 = time.time()
    outs = []
    for _ in range(k):
        outs.append(fn(*args))
    for r in outs:
        pass
    fetch1(jax.tree_util.tree_leaves(outs[-1])[0])
    dt = (time.time() - t0) / k
    print(f"{label}: {dt*1e3:.1f} ms/call", flush=True)
    return dt


# representative class-1 shapes: W=2048 tables, B=2048 pairs, M=128
for (B, W, M) in [(2048, 2048, 128), (512, 4608, 128), (2048, 1024, 128),
                  (1024, 2048, 512), (512, 2048, 2048)]:
    nk = rng.integers(W // 2, W, size=B).astype(np.int32)
    hs_a = np.sort(rng.integers(0, 1 << 20, size=(B, W)), axis=1).astype(np.uint32)
    hs_b = np.sort(rng.integers(0, 1 << 20, size=(B, W)), axis=1).astype(np.uint32)
    ps = rng.integers(0, W, size=(B, W)).astype(np.int32)
    d = [jnp.asarray(x) for x in (hs_a, ps, nk, hs_b, ps, nk)]
    Wp = 1
    while Wp < W:
        Wp *= 2
    if Wp != W:
        pad = ((0, 0), (0, Wp - W))
        d[0] = jnp.pad(d[0], pad)
        d[1] = jnp.pad(d[1], pad)
        d[3] = jnp.pad(d[3], pad)
        d[4] = jnp.pad(d[4], pad)

    cnt_fn = jax.jit(merge_join_counts)
    bench(f"counts   B={B} W={W}", cnt_fn, d, k=4)

    exp_fn = jax.jit(lambda *a: merge_join_expand(*a, M), static_argnums=())
    bench(f"expand   B={B} W={W} M={M}", exp_fn, d, k=4)

    # LIS alone on synthetic match lists
    p2 = np.sort(rng.integers(0, 4000, size=(B, M)), axis=1).astype(np.int32)
    p1 = np.sort(rng.integers(0, 4000, size=(B, M)), axis=1).astype(np.int32)
    valid = np.ones((B, M), bool)
    lis_fn = jax.jit(lambda a, b, v: lis_filter_pallas(a, b, v, 10, 10))
    bench(f"LISpall  B={B} M={M}", lis_fn,
          [jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(valid)], k=4)
    print("---", flush=True)
