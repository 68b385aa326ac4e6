"""Probe the attached device link: h2d/d2h latency+bandwidth, dispatch cost.

Run: python tools/probe_device.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import numpy as np


def t(label, fn, n=3):
    times = []
    for _ in range(n):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    print(f"{label}: {['%.3f' % x for x in times]}", flush=True)
    return times


def main():
    t0 = time.time()
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    devs = jax.devices()
    print(f"import+devices: {time.time()-t0:.3f}s  {devs}", flush=True)

    # tiny h2d + d2h roundtrip latency
    small = np.zeros(8, np.int32)
    t("h2d tiny (8 int32) + block", lambda: jax.device_put(small).block_until_ready(), 5)
    d_small = jax.device_put(small)
    t("d2h tiny", lambda: np.asarray(d_small), 5)

    # dispatch latency of trivial jitted fn
    f = jax.jit(lambda x: x + 1)
    f(d_small).block_until_ready()  # compile
    t("dispatch tiny jit (warm)", lambda: f(d_small).block_until_ready(), 5)

    # h2d bandwidth at several sizes
    for mb in (1, 8, 64):
        arr = np.zeros(mb * 1024 * 1024, np.uint8)
        times = t(f"h2d {mb}MB", lambda: jax.device_put(arr).block_until_ready(), 3)
        print(f"  -> {mb / min(times):.1f} MB/s best", flush=True)

    # d2h bandwidth
    for mb in (1, 8, 64):
        d = jax.device_put(np.zeros(mb * 1024 * 1024, np.uint8))
        d.block_until_ready()
        times = t(f"d2h {mb}MB", lambda: np.asarray(d), 3)
        print(f"  -> {mb / min(times):.1f} MB/s best", flush=True)

    # rank-0 vs rank-1 fetch (bulk.py comment claims rank-0 stalls)
    d0 = jax.device_put(np.int32(7))
    d0.block_until_ready()
    t("d2h rank-0 scalar", lambda: np.asarray(d0), 3)
    d1 = jax.device_put(np.zeros((1,), np.int32))
    d1.block_until_ready()
    t("d2h rank-1 [1]", lambda: np.asarray(d1), 3)

    # compile cost of a fresh small fn
    g = jax.jit(lambda x: (x * 2 + 3).sum())
    x = jax.device_put(np.zeros((128, 128), np.float32))
    x.block_until_ready()
    t0 = time.time()
    g(x).block_until_ready()
    print(f"compile small fn: {time.time()-t0:.3f}s", flush=True)

    # big matmul throughput (MXU sanity)
    a = jax.device_put(np.zeros((4096, 4096), np.float32).astype(np.float32))
    mm = jax.jit(lambda a: (a.astype(jnp.bfloat16) @ a.astype(jnp.bfloat16).T).astype(jnp.float32).sum())
    mm(a).block_until_ready()
    times = t("4096^3 matmul+sum", lambda: mm(a).block_until_ready(), 3)
    print(f"  -> {2*4096**3/min(times)/1e12:.2f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
