"""Can one warmup roundtrip absorb the whole cold tax?

probe_cold: tiny-roundtrip 64s, then big h2d STILL paid 64s (dispatched
90ms after the fetch returned).  probe_cold2: 4 pre-dispatched h2ds paid
~68s EACH.  Here: warmup roundtrip, wait DELAY seconds, then the big h2d.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
DELAY = float(os.environ.get("DELAY", "2.0"))

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

tiny = jnp.asarray(np.arange(16, dtype=np.int32))
np.asarray(tiny[:2])
mark("warmup roundtrip done")

time.sleep(DELAY)
mark(f"slept {DELAY}s")

t = time.time()
big = jnp.asarray(np.zeros((8448, 4618), np.uint8))
np.asarray(jnp.ravel(big)[:2])
mark(f"39MB h2d+sync ({time.time() - t:.2f}s)")

t = time.time()
big2 = jnp.asarray(np.zeros((4096, 4096), np.uint8))
np.asarray(jnp.ravel(big2)[:2])
mark(f"16MB h2d+sync ({time.time() - t:.2f}s)")
