"""Characterize the first-d2h stall on the axon relay.

Variants (select with argv[1]):
  immediate  - d2h a tiny buffer as the very first device op
  after_h2d  - h2d some data first, then d2h
  jit_result - d2h the result of a jitted computation
  async_warm - start the first d2h, measure; then check later d2h
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

mode = sys.argv[1] if len(sys.argv) > 1 else "immediate"
t_start = time.time()
import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
print(f"[{time.time()-t_start:.2f}] devices: {jax.devices()}", flush=True)


def stamp(label):
    print(f"[{time.time()-t_start:.2f}] {label}", flush=True)


if mode == "immediate":
    d = jax.device_put(np.zeros(8, np.int32))
    d.block_until_ready()
    stamp("h2d tiny done")
    _ = np.asarray(d)
    stamp("first d2h done")
    d2 = jax.device_put(np.ones(8, np.int32))
    _ = np.asarray(d2)
    stamp("second d2h done")
elif mode == "after_h2d":
    big = jax.device_put(np.zeros(32 * 1024 * 1024, np.uint8))
    big.block_until_ready()
    stamp("h2d 32MB done")
    f = jax.jit(lambda x: x[:128].astype(jnp.int32).sum())
    r = f(big)
    r.block_until_ready()
    stamp("jit exec done")
    _ = np.asarray(r)
    stamp("first d2h done")
elif mode == "jit_result":
    f = jax.jit(lambda x: x + 1)
    d = f(jnp.zeros(8, jnp.int32))
    d.block_until_ready()
    stamp("jit done")
    _ = np.asarray(d)
    stamp("first d2h done")
    _ = np.asarray(f(d))
    stamp("second d2h done")
