"""Nail down axon relay sync semantics: does block_until_ready wait?
Measure real op throughput via slope method: time(fetch after K ops) vs K."""
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
key = jax.random.PRNGKey(0)


def fetch1(x):
    return np.asarray(jnp.ravel(x)[:1])


def slope(label, fn, x0, ks=(1, 4, 16)):
    # warm compile + one fetch
    r = fn(x0)
    fetch1(r)
    res = []
    for k in ks:
        x = x0
        t0 = time.time()
        for _ in range(k):
            x = fn(x)
        fetch1(x)
        res.append(time.time() - t0)
    # per-op slope from first to last
    per = (res[-1] - res[0]) / (ks[-1] - ks[0])
    print(f"{label}: times {['%.3f' % t for t in res]} -> {per*1e3:.2f} ms/op",
          flush=True)
    return per


# 1. big matmul chain: known flops per op = 2*2048^3 = 17.2 GFLOP
a = jax.device_put(np.random.rand(2048, 2048).astype(np.float32))
mm = jax.jit(lambda a: (a.astype(jnp.bfloat16) @ a.astype(jnp.bfloat16)).astype(jnp.float32) * 1e-3)
per = slope("matmul 2048^3 chain", mm, a)
print(f"  -> {2*2048**3/per/1e12:.1f} TFLOP/s real", flush=True)

# 2. does block_until_ready wait? compare fetch-timed vs bur-timed for 16 matmuls
x = a
t0 = time.time()
for _ in range(16):
    x = mm(x)
x.block_until_ready()
t_bur = time.time() - t0
t0 = time.time()
fetch1(x)
t_fetch_after = time.time() - t0
print(f"16 matmuls: block_until_ready={t_bur:.3f}s, fetch after={t_fetch_after:.3f}s",
      flush=True)

# 3. real sort throughput via slope
s = jax.device_put(np.random.randint(0, 1 << 20, (4096, 2048)).astype(np.int32))
srt = jax.jit(lambda x: jax.lax.sort(x ^ 1, dimension=1))
per = slope("sort [4096,2048] chain", srt, s)
print(f"  -> {4096*2048/per/1e9:.2f} Gelem/s real", flush=True)

# 4. real cumsum
cs = jax.jit(lambda x: jnp.cumsum(x & 1, axis=1) + x[:, :1])
per = slope("cumsum [4096,2048] chain", cs, s)

# 5. real merge_join_counts
from rattle_tpu.ops.join_device import merge_join_counts
hs = jnp.sort(jax.random.randint(key, (4096, 1024), 0, 1 << 18, jnp.int32), axis=1).astype(jnp.uint32)
ps = jnp.broadcast_to(jnp.arange(1024, dtype=jnp.int32), (4096, 1024))
nk0 = jnp.full((4096,), 1017, jnp.int32)
mjc = jax.jit(lambda nk: merge_join_counts(hs, ps, nk, hs, ps, nk) + nk)
per = slope("merge_join_counts [4096,1024] chain", mjc, nk0)
print(f"  -> {4096/per:.0f} pairs/s real", flush=True)

# 6. real merge_join_expand M=512
from rattle_tpu.ops.join_device import merge_join_expand
hs2 = jnp.sort(jax.random.randint(key, (2048, 1024), 0, 1 << 18, jnp.int32), axis=1).astype(jnp.uint32)
ps2 = jnp.broadcast_to(jnp.arange(1024, dtype=jnp.int32), (2048, 1024))
nk2 = jnp.full((2048,), 1017, jnp.int32)
def mje(nk):
    p1, p2, tot = merge_join_expand(hs2, ps2, nk, hs2, ps2, nk, 512)
    return (tot & 1023) + 7
per = slope("merge_join_expand [2048,1024] M=512 chain", jax.jit(mje), nk2)
print(f"  -> {2048/per:.0f} pairs/s real", flush=True)

# 7. real lis pallas
from rattle_tpu.ops.pallas_kernels import lis_filter_pallas
p2v = jnp.sort(jax.random.randint(key, (4096, 128), 0, 4000, jnp.int32), axis=1)
vv = jnp.ones((4096, 128), bool)
def lis(x):
    b, _h, n, _v = lis_filter_pallas(x, x, vv, 10, 10)
    return x + (n[:, None] & 1)
per = slope("lis_pallas [4096,128] chain", jax.jit(lis), p2v)
print(f"  -> {4096/per:.0f} pairs/s real", flush=True)

# 8. fetch-only latency distribution (tiny fetches after no work)
lat = []
d = jax.device_put(np.zeros(8, np.int32))
fetch1(d)
for i in range(20):
    t0 = time.time()
    fetch1(jax.device_put(np.full(8, i, np.int32)))
    lat.append(time.time() - t0)
print(f"tiny h2d+fetch roundtrips: min {min(lat)*1e3:.1f}ms med {sorted(lat)[10]*1e3:.1f}ms max {max(lat)*1e3:.1f}ms",
      flush=True)
