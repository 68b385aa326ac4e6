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


# --------------------------------------------------------------------------
# Fused patience-LIS + anchor-filter + variance kernel
# --------------------------------------------------------------------------
#
# The decision score (similarity.cpp:4-97) is three sequential M-step scans.
# As XLA scans each step round-trips an ~8 MB carry through HBM; here the
# whole state lives in VMEM and one kernel launch covers all three phases.
# Layout is [M, TB] ("match-major"): per-step work is a handful of wide
# compare/select/reduce ops over sublanes, which the VPU executes at rate.
#
# Float note: the variance reduction order differs from the XLA twin, so the
# f32 result can differ in the last ulps; decisions remain exact because
# borderline-variance pairs are re-scored on the host in f64 (cluster/bulk).

NEG_I32 = -(2**31)
BIG_I32 = 2**31 - 1
LIS_TB = 512


def _pow2_floor(x: int) -> int:
    p = 1
    while p * 2 <= x:
        p *= 2
    return p


def _lis_kernel_body(m: int, tb: int, kmer_size: int, hc_max_dist: int):
    def kernel(bound_ref, p1_ref, p2_ref, valid_ref, bases_ref, hc_ref,
               ndist_ref, var_ref, tails, m_idx, p_pred, a1b, a2b, distb):
        # dynamic step bound: every pair in this launch has at most
        # ``bound`` valid matches (the count-first router sorts pairs by
        # count, so chunks are count-homogeneous); all three phases walk
        # indices < the pair's match count, so truncating the loops at the
        # batch max is exact and saves (m - bound)/m of the scan cost
        bound = jnp.clip(bound_ref[0], 0, m)
        rows1 = jax.lax.broadcasted_iota(jnp.int32, (m + 1, tb), 0)
        rowsm = jax.lax.broadcasted_iota(jnp.int32, (m, tb), 0)
        tails[:] = jnp.where(rows1 == 0, NEG_I32, BIG_I32).astype(jnp.int32)
        m_idx[:] = jnp.zeros((m + 1, tb), jnp.int32)
        p_pred[:] = jnp.zeros((m, tb), jnp.int32)
        a1b[:] = jnp.zeros((m, tb), jnp.int32)
        a2b[:] = jnp.zeros((m, tb), jnp.int32)
        distb[:] = jnp.zeros((m, tb), jnp.int32)

        # phase 1: patience LIS build (similarity.cpp:10-31)
        def build(i, l):
            v = p2_ref[pl.ds(i, 1), :]                        # [1, TB]
            ok = valid_ref[pl.ds(i, 1), :] != 0
            t = tails[:]
            lvl = (t < v).astype(jnp.int32).sum(axis=0)[None, :]
            pred = jnp.where(rows1 == (lvl - 1), m_idx[:], 0) \
                .sum(axis=0)[None, :]
            p_pred[pl.ds(i, 1), :] = jnp.where(ok, pred, 0)
            upd = ok & (rows1 == lvl)
            m_idx[:] = jnp.where(upd, i, m_idx[:])
            tails[:] = jnp.where(upd, v, t)
            return jnp.where(ok, jnp.maximum(l, lvl), l)

        l = jax.lax.fori_loop(0, bound, build,
                              jnp.zeros((1, tb), jnp.int32))

        # phase 2: backward reconstruction, emitting anchor values in
        # forward order (similarity.cpp:37-44)
        k0 = jnp.where(rows1 == l, m_idx[:], 0).sum(axis=0)[None, :]

        def rec(i, k):
            active = i < l
            w = l - 1 - i
            sel_k = rowsm == k
            a1v = jnp.where(sel_k, p1_ref[:], 0).sum(axis=0)[None, :]
            a2v = jnp.where(sel_k, p2_ref[:], 0).sum(axis=0)[None, :]
            wmask = active & (rowsm == w)
            a1b[:] = jnp.where(wmask, a1v, a1b[:])
            a2b[:] = jnp.where(wmask, a2v, a2b[:])
            k_next = jnp.where(sel_k, p_pred[:], 0).sum(axis=0)[None, :]
            return jnp.where(active, k_next, k)

        jax.lax.fori_loop(0, bound, rec, k0)

        # phase 3: forward anchor filter (similarity.cpp:52-85)
        z = jnp.zeros((1, tb), jnp.int32)

        def filt(i, carry):
            lf, ls, prev_a2, bases, hc, kept = carry
            x1 = a1b[pl.ds(i, 1), :]
            x2 = a2b[pl.ds(i, 1), :]
            active = i < l
            first = kept == 0
            d1 = x1 - lf
            d2 = x2 - ls
            keep_cond = ((d1 < kmer_size) & (d2 < kmer_size)) | \
                ((d1 >= kmer_size) & (d2 >= kmer_size))
            keep = active & (first | keep_cond)
            ex = kmer_size - (x2 - prev_a2)
            add = kmer_size - jnp.maximum(ex, 0)
            dist = (x2 - ls) - (x1 - lf)
            inc = jnp.where(first, kmer_size, add)
            bases = bases + jnp.where(keep, inc, 0)
            hc_inc = jnp.where(first, kmer_size,
                               jnp.where(dist < hc_max_dist, add, 0))
            hc = hc + jnp.where(keep, hc_inc, 0)
            rec_m = keep & jnp.logical_not(first)
            distb[:] = jnp.where(rec_m & (rowsm == kept - 1), dist, distb[:])
            kept = kept + keep.astype(jnp.int32)
            lf = jnp.where(keep, x1, lf)
            ls = jnp.where(keep, x2, ls)
            prev_a2 = jnp.where(active, x2, prev_a2)
            return lf, ls, prev_a2, bases, hc, kept

        _, _, _, bases, hc, kept = jax.lax.fori_loop(
            0, bound, filt, (z, z, z, z, z, z))

        # variance over the recorded gap differences (utils.cpp:36-55, f32)
        n = jnp.maximum(kept - 1, 0)
        mask = rowsm < n
        df = jnp.where(mask, distb[:], 0).astype(jnp.float32)
        nf = jnp.maximum(n, 1).astype(jnp.float32)
        mean = df.sum(axis=0)[None, :] / nf
        d = jnp.where(mask, df - mean, 0.0)
        ss = (d * d).sum(axis=0)[None, :]
        comp = d.sum(axis=0)[None, :]
        denom = jnp.maximum(n - 1, 1).astype(jnp.float32)
        var = (ss - comp * comp / nf) / denom
        var = jnp.where(n == 0, 0.0, var)
        var = jnp.where(n == 1, jnp.inf, var)

        bases_ref[:] = bases
        hc_ref[:] = hc
        ndist_ref[:] = n
        var_ref[:] = var

    return kernel


@functools.partial(jax.jit, static_argnames=("kmer_size", "hc_max_dist",
                                             "interpret"))
def lis_filter_pallas(p1, p2, valid, kmer_size: int, hc_max_dist: int = 10,
                      interpret: bool = False, bound=None):
    """Fused LIS + filter + variance for [B, M] match lists.

    B must be a multiple of the lane tile.  Returns (bases, hc, n_dist, var)
    [B].  The lane tile shrinks with M so the six [M, TB] scratch arrays
    stay within VMEM (~8 MB budget): TB=512 up to M=512, 128 at M=2048.

    ``bound``: optional [] or [1] int32 — max valid match count over the
    batch; the three M-step scans truncate there (exact, see kernel note).
    """
    b, m = p1.shape
    vmem_tb = max(8, (8 << 20) // (24 * (m + 1)))
    tb = min(LIS_TB, b, _pow2_floor(vmem_tb))
    while b % tb:
        tb //= 2
    if bound is None:
        bound_arr = jnp.full((1,), m, jnp.int32)
    else:
        bound_arr = jnp.reshape(bound, (1,)).astype(jnp.int32)
    p1t = p1.T
    p2t = p2.T
    vt = valid.astype(jnp.int32).T
    grid = (b // tb,)
    # PrefetchScalarGridSpec passes the scalar ref to every index_map
    in_spec = pl.BlockSpec((m, tb), lambda j, _bnd: (0, j),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, tb), lambda j, _bnd: (0, j),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _lis_kernel_body(m, tb, kmer_size, hc_max_dist),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[in_spec, in_spec, in_spec],
            out_specs=(out_spec, out_spec, out_spec, out_spec),
            scratch_shapes=[
                pltpu.VMEM((m + 1, tb), jnp.int32),
                pltpu.VMEM((m + 1, tb), jnp.int32),
                pltpu.VMEM((m, tb), jnp.int32),
                pltpu.VMEM((m, tb), jnp.int32),
                pltpu.VMEM((m, tb), jnp.int32),
                pltpu.VMEM((m, tb), jnp.int32),
            ]),
        out_shape=(jax.ShapeDtypeStruct((1, b), jnp.int32),
                   jax.ShapeDtypeStruct((1, b), jnp.int32),
                   jax.ShapeDtypeStruct((1, b), jnp.int32),
                   jax.ShapeDtypeStruct((1, b), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=9 * b * m * (m + 1), bytes_accessed=b * m * 12,
            transcendentals=0),
        interpret=interpret,
    )(bound_arr, p1t, p2t, vt)
    bases, hc, ndist, var = out
    return bases[0], hc[0], ndist[0], var[0]
