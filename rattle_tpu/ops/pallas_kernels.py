"""Pallas TPU kernels for the clustering hot path.

The 6-mer bitvector gate (cluster.cpp:13-19) is popcount(AND(bv_i, bv_j))
over 4096-bit vectors for every (pool, seed) pair.  Expressed over unpacked
0/1 bit planes that is exactly an integer matmul:

    common[p, s] = sum_h bits_pool[p, h] * bits_seed[s, h]

which belongs on the MXU.  The kernel unpacks the packed ``[*, 128] uint32``
words to ``[*, 4096]`` bit planes in VMEM (32x less HBM traffic than storing
unpacked tables) and contracts them on the systolic array in bf16 with f32
accumulation — exact, since every partial sum is an integer <= 4096 < 2^24.

Grid: one program per pool tile; the seed block (<= 128 rows) is replicated
to every program.  Tile sizes are compile-time static.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BV_WORDS = 128          # 4096-bit vectors, packed
BV_BITS = BV_WORDS * 32
POOL_TILE = 512         # pool rows per program


def _unpack_bits_bf16(words: jax.Array) -> jax.Array:
    """[T, 128] uint32 -> [T, 4096] bf16 bit plane.

    Bit ``h`` of the vector lives at word ``h >> 5``, bit ``h & 31``
    (ops/sketch.py _pack_bv).  The unpacked layout here is PERMUTED —
    plane index ``b * 128 + w`` holds bit ``w * 32 + b`` — which is harmless
    because the matmul contracts over the plane axis and both operands use
    the same permutation.
    """
    t = words.shape[0]
    shifts = jax.lax.broadcasted_iota(jnp.uint32, (t, 32, BV_WORDS), 1)
    bits = (words[:, None, :] >> shifts) & jnp.uint32(1)       # [T, 32, 128]
    # Mosaic has no uint32->bf16 cast; hop through int32 (values are 0/1)
    return bits.reshape(t, BV_BITS).astype(jnp.int32).astype(jnp.bfloat16)


def _gate_kernel(pool_ref, seed_ref, out_ref):
    pool_bits = _unpack_bits_bf16(pool_ref[:])                 # [TP, 4096]
    seed_bits = _unpack_bits_bf16(seed_ref[:])                 # [S, 4096]
    common = jax.lax.dot_general(
        pool_bits, seed_bits,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[:] = common.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def bv_common_matmul(bvp_pool: jax.Array, bvp_seed: jax.Array,
                     interpret: bool = False) -> jax.Array:
    """popcount(AND) counts for every (pool, seed) pair on the MXU.

    bvp_pool [P, 128] uint32, bvp_seed [S, 128] uint32 -> [P, S] int32.
    P must be a multiple of POOL_TILE and S a multiple of 8 (pad with zero
    rows; zero vectors share no bits, so padding is inert).
    """
    p = bvp_pool.shape[0]
    s = bvp_seed.shape[0]
    grid = (p // POOL_TILE,)
    return pl.pallas_call(
        _gate_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((POOL_TILE, BV_WORDS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, BV_WORDS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((POOL_TILE, s), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, s), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * p * s * BV_BITS,
            bytes_accessed=(p + s) * BV_WORDS * 4 + p * s * 4,
            transcendentals=0),
        interpret=interpret,
    )(bvp_pool, bvp_seed)


def supported() -> bool:
    """True when the default backend can run compiled Pallas TPU kernels."""
    try:
        return jax.devices()[0].platform in ("tpu", "axon") or \
            jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False
