"""Decompose the cold-process cost of the first device interactions.

The warm probe shows sketch build = 125-260s in a FRESH process vs 1.1-1.7s
for the identical call seconds later, with the XLA disk cache HIT both
times.  So the cost is not compilation; this isolates client init, first
h2d (small and large), executable load, first execution, and first fetch.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

T0 = time.time()


def mark(label):
    print(f"[{time.time() - T0:8.2f}s] {label}", flush=True)


mark("start")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
mark("imports done")
dev = jax.devices()
mark(f"jax.devices(): {dev}")

# 1. tiny h2d + fetch roundtrip
x = jnp.asarray(np.arange(16, dtype=np.int32))
mark("tiny h2d dispatched")
np.asarray(x[:2])
mark("tiny fetch done (first device roundtrip)")

# 2. large h2d, same shape class as the sketch code matrix
big = np.zeros((8448, 4618), dtype=np.uint8)
big[:, :4] = 7
t = time.time()
d_big = jnp.asarray(big)
mark(f"39MB h2d dispatched ({time.time() - t:.2f}s)")
np.asarray(jnp.ravel(d_big)[:2])
mark("39MB h2d synced")

# 3. compile (cache-hit expected) of _device_tables
from rattle_tpu.ops.sketch_device import _device_tables  # noqa: E402

codes = np.zeros((8448, 4618), dtype=np.uint8)
nk = np.full(8448, 4000, np.int32)
lens = np.full(8448, 4010, np.int32)
d_codes = jnp.asarray(codes)
d_nk = jnp.asarray(nk)
d_lens = jnp.asarray(lens)
np.asarray(jnp.ravel(d_codes)[:2])
mark("codes h2d synced")

t = time.time()
lowered = _device_tables.lower(d_codes, d_nk, d_lens, k=10, kmax=4608)
mark(f"lower done ({time.time() - t:.2f}s)")
t = time.time()
compiled = lowered.compile()
mark(f"compile done ({time.time() - t:.2f}s)")

t = time.time()
out = compiled(d_codes, d_nk, d_lens)
mark(f"exec 1 dispatched ({time.time() - t:.2f}s)")
np.asarray(jnp.ravel(out[4])[:2])
mark("exec 1 synced")

t = time.time()
out = compiled(d_codes, d_nk, d_lens)
np.asarray(jnp.ravel(out[4])[:2])
mark(f"exec 2 synced ({time.time() - t:.2f}s)")
