"""Isolate the slow primitives: cumulatives, scatter, gather along lanes."""
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
    jax.block_until_ready(r)
    times = []
    for _ in range(n):
        t0 = time.time()
        r = fn(*args)
        jax.block_until_ready(r)
        times.append(time.time() - t0)
    print(f"{label}: best {min(times)*1e3:.2f}ms", flush=True)
    return min(times)


def manual_cumsum(x):
    """log-shift cumsum along axis 1 via pad+slice adds."""
    b, w = x.shape
    s = 1
    while s < w:
        shifted = jnp.pad(x, ((0, 0), (s, 0)))[:, :w]
        x = x + shifted
        s *= 2
    return x


def manual_cummax(x):
    b, w = x.shape
    s = 1
    while s < w:
        shifted = jnp.pad(x, ((0, 0), (s, 0)), constant_values=-(2**31))[:, :w]
        x = jnp.maximum(x, shifted)
        s *= 2
    return x


def main():
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    b, w = 4096, 2048
    x = jax.random.randint(key, (b, w), 0, 1 << 20, jnp.int32)
    xb = (x & 1)

    bench("cumsum axis1 [4096,2048]", jax.jit(lambda x: jnp.cumsum(x, axis=1)), xb)
    bench("cummax axis1 [4096,2048]", jax.jit(lambda x: jax.lax.cummax(x, axis=1)), x)
    bench("cummin rev axis1", jax.jit(lambda x: jax.lax.cummin(x, axis=1, reverse=True)), x)
    bench("manual log-shift cumsum", jax.jit(manual_cumsum), xb)
    bench("manual log-shift cummax", jax.jit(manual_cummax), x)
    bench("cumsum axis0 [2048,4096]", jax.jit(lambda x: jnp.cumsum(x, axis=0)), xb.T)

    # scatter .at[rows, tgt].max along lanes
    tgt = jax.random.randint(key, (b, w), 0, 513, jnp.int32)
    rows_w = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32)[None, :], (b, w))
    def scat(tgt, rows_w):
        bm = jnp.full((b, 513), -1, jnp.int32)
        return bm.at[jax.lax.broadcasted_iota(jnp.int32, (b, w), 0), tgt].max(rows_w)
    bench("scatter-max [4096,2048]->[4096,513]", jax.jit(scat), tgt, rows_w)

    # gather take_along_axis along lanes
    idx = jax.random.randint(key, (b, 512), 0, w, jnp.int32)
    bench("take_along_axis [4096,2048] at [4096,512]",
          jax.jit(lambda x, i: jnp.take_along_axis(x, i, axis=1)), x, idx)

    # gather along sublanes (transposed layout)
    xt = x.T  # [2048, 4096]
    idxt = idx.T  # [512, 4096]
    bench("take_along_axis axis0 [2048,4096] at [512,4096]",
          jax.jit(lambda x, i: jnp.take_along_axis(x, i, axis=0)), xt, idxt)

    # row gather jnp.take(axis=0) — used everywhere for id lookup
    big = jax.random.randint(key, (8448, 1024), 0, 100, jnp.int32)
    rid = jax.random.randint(key, (4096,), 0, 8448, jnp.int32)
    bench("row take [8448,1024] at [4096]",
          jax.jit(lambda t, i: jnp.take(t, i, axis=0)), big, rid)

    # one-hot matmul gather: [B,512] <- value[B,W] via onehot over W
    def onehot_gather(x, i):
        oh = (i[:, :, None] == jnp.arange(w, dtype=jnp.int32)[None, None, :])
        return jnp.einsum('bmw,bw->bm', oh.astype(jnp.bfloat16),
                          x.astype(jnp.bfloat16))
    bench("onehot-matmul gather [4096, 512 of 2048]", jax.jit(onehot_gather), x % 127, idx)

    # sort sanity: is sort really that fast? force data dependence
    def sortsum(x):
        return jax.lax.sort(x, dimension=1)[:, ::7].sum()
    bench("sort + strided sum [4096,2048]", jax.jit(sortsum), x)
    t0 = time.time()
    r = jax.jit(sortsum)(x)
    v = float(r)
    print(f"  sort value fetch: {time.time()-t0:.3f}s val={v}", flush=True)


if __name__ == "__main__":
    main()
