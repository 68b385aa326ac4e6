"""Stall semantics: is the ~64s cold cost per-operation or one wall-clock
window?  Dispatch everything up front, then sync once."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

T0 = time.time()


def mark(label):
    print(f"[{time.time() - T0:8.2f}s] {label}", flush=True)


import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.devices()
mark("client up")

# dispatch a pile of transfers of assorted sizes, NO sync between
tiny = jnp.asarray(np.arange(16, dtype=np.int32))
small = jnp.asarray(np.zeros((256, 1024), np.uint8))      # 256KB
med = jnp.asarray(np.zeros((2048, 4096), np.uint8))       # 8MB
big = jnp.asarray(np.zeros((8448, 4618), np.uint8))       # 39MB
mark("4 h2d dispatched")

np.asarray(tiny[:2])
mark("sync tiny")
np.asarray(jnp.ravel(small)[:2])
mark("sync small")
np.asarray(jnp.ravel(med)[:2])
mark("sync med")
np.asarray(jnp.ravel(big)[:2])
mark("sync big")

# a fresh big transfer after warmup
t = time.time()
big2 = jnp.asarray(np.zeros((8448, 4618), np.uint8))
np.asarray(jnp.ravel(big2)[:2])
mark(f"post-warm 39MB h2d+sync ({time.time() - t:.2f}s)")

# compute on it
t = time.time()
s = jnp.sum(big2, axis=1, dtype=jnp.int32)
np.asarray(s[:2])
mark(f"sum+sync ({time.time() - t:.2f}s)")
