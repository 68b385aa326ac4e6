"""Measure warm throughput of the engine's hot primitives on the attached TPU."""
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


def bench(label, fn, *args, n=5):
    r = fn(*args)
    jax.block_until_ready(r)          # compile
    t0 = time.time()
    c = time.time() - t0
    times = []
    for _ in range(n):
        t0 = time.time()
        r = fn(*args)
        jax.block_until_ready(r)
        times.append(time.time() - t0)
    best = min(times)
    print(f"{label}: best {best*1e3:.1f}ms (med {sorted(times)[len(times)//2]*1e3:.1f})",
          flush=True)
    return best


def main():
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)

    # 1. lax.sort single array
    for b, w in ((4096, 2048), (4096, 4096), (8448, 4608)):
        x = jax.random.randint(key, (b, w), 0, 1 << 20, dtype=jnp.int32).astype(jnp.uint32)
        p = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32), (b, w))
        f = jax.jit(lambda x: jax.lax.sort(x, dimension=1))
        t = bench(f"lax.sort key [{b},{w}]", f, x)
        print(f"   -> {b*w/t/1e9:.2f} Gelem/s", flush=True)
        f2 = jax.jit(lambda x, p: jax.lax.sort_key_val(x, p, dimension=1))
        t = bench(f"lax.sort_key_val [{b},{w}]", f2, x, p)
        print(f"   -> {b*w/t/1e9:.2f} Gelem/s", flush=True)

    # 2. bitonic merge of two sorted halves
    from rattle_tpu.ops.join_device import _bitonic_merge_2
    for b, w in ((4096, 2048), (4096, 4096)):
        half = jnp.sort(jax.random.randint(key, (b, w // 2), 0, 1 << 20, jnp.int32), axis=1)
        keyarr = jnp.concatenate([half, half[:, ::-1]], axis=1).astype(jnp.uint32)
        val = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32), (b, w))
        f = jax.jit(_bitonic_merge_2)
        t = bench(f"bitonic_merge_2 [{b},{w}]", f, keyarr, val)
        print(f"   -> {b*w/t/1e9:.2f} Gelem/s", flush=True)

    # 3. merge_join_counts (full count chunk)
    from rattle_tpu.ops.join_device import merge_join_counts, merge_join_expand
    for b, w in ((4096, 1024), (2048, 2048)):
        hs = jnp.sort(jax.random.randint(key, (b, w), 0, 1 << 18, jnp.int32), axis=1).astype(jnp.uint32)
        ps = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32), (b, w))
        nk = jnp.full((b,), w - 7, jnp.int32)
        f = jax.jit(lambda hs, ps, nk: merge_join_counts(hs, ps, nk, hs, ps, nk))
        t = bench(f"merge_join_counts [{b},{w}]", f, hs, ps, nk)
        print(f"   -> {b/t:.0f} pairs/s", flush=True)

    # 4. merge_join_expand at M=512
    for b, w, m in ((2048, 1024, 512), (4096, 1024, 128)):
        hs = jnp.sort(jax.random.randint(key, (b, w), 0, 1 << 18, jnp.int32), axis=1).astype(jnp.uint32)
        ps = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32), (b, w))
        nk = jnp.full((b,), w - 7, jnp.int32)
        f = jax.jit(lambda hs, ps, nk: merge_join_expand(hs, ps, nk, hs, ps, nk, m))
        t = bench(f"merge_join_expand [{b},{w}] M={m}", f, hs, ps, nk)
        print(f"   -> {b/t:.0f} pairs/s", flush=True)

    # 5. fused LIS pallas
    from rattle_tpu.ops.pallas_kernels import lis_filter_pallas
    for b, m in ((4096, 128), (2048, 512)):
        p2 = jax.random.randint(key, (b, m), 0, 4000, jnp.int32)
        p1 = jnp.sort(p2, axis=1)
        p2 = jnp.sort(p2, axis=1)
        vv = jnp.ones((b, m), bool)
        f = jax.jit(lambda a, c, v: lis_filter_pallas(a, c, v, 10, 10))
        t = bench(f"lis_filter_pallas [{b},{m}]", f, p1, p2, vv)
        print(f"   -> {b/t:.0f} pairs/s", flush=True)

    # 6. gate matmul plain XLA [4096,4096]x[4096,4096] over 4096 bit-planes
    bva = (jax.random.randint(key, (4096, 4096), 0, 2, jnp.int32)).astype(jnp.int8)
    f = jax.jit(lambda a: jax.lax.dot_general(
        a.astype(jnp.bfloat16), a.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32).astype(jnp.int32).sum())
    t = bench("gate matmul 4096x4096x4096", f, bva)
    print(f"   -> {2*4096**3/t/1e12:.2f} TFLOP/s", flush=True)

    # 7. device tables (sketch) warm
    from rattle_tpu.ops.sketch_device import _device_tables
    codes = jax.random.randint(key, (8448, 4618), 0, 4, jnp.int32).astype(jnp.uint8)
    nk = jnp.full((8448,), 4498, jnp.int32)
    lens = jnp.full((8448,), 4506, jnp.int32)
    f = jax.jit(lambda c, nk, lens: _device_tables(c, nk, lens, 10, 4608))
    t = bench("_device_tables [8448,4618]", f, codes, nk, lens)

    # 8. scan-of-chunks vs python-loop dispatch overhead
    x = jnp.zeros((64, 4096), jnp.float32)
    g = jax.jit(lambda x: x * 2 + 1)
    jax.block_until_ready(g(x))
    t0 = time.time()
    for _ in range(50):
        x = g(x)
    jax.block_until_ready(x)
    print(f"50 sequential tiny dispatches: {time.time()-t0:.3f}s", flush=True)


if __name__ == "__main__":
    main()
