"""Select-based (gather/scatter-free) LIS scoring scans.

TPU VPUs execute broadcast compares and selects at full rate, but dynamic
per-lane gathers and scatters serialize.  The original kernels in
ops/similarity.py do a per-lane binary search (10+ gathers) plus 2-3 point
scatters per scan step — measured ~1.7 s per 4096x512 chunk on v5e.  These
twins replace every per-step gather/scatter with one wide compare/select over
the whole tails row:

  level     = sum(tails < v)                  (one [B, M+1] compare + reduce)
  update    = where(col == level, v, tails)   (one [B, M+1] select)

Semantics are bit-identical to similarity.py's scans (and therefore to
reference similarity.cpp:4-97); tests/test_lis_select.py asserts equality.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INT32_MAX = 2**31 - 1
INT32_MIN = -(2**31)


def lis_build_select(p2, valid):
    """Patience LIS (similarity.cpp:10-31); see similarity._lis_build.

    Returns (p_pred [B,M], m_idx [B,M+1], l [B])."""
    b, m = p2.shape
    cols1 = jax.lax.broadcasted_iota(jnp.int32, (b, m + 1), 1)
    colsm = jax.lax.broadcasted_iota(jnp.int32, (b, m), 1)

    def step(carry, xs):
        tails, m_idx, p_pred, l, i = carry
        v, ok = xs
        # level 0 is -INF so the count is always >= 1
        new_l = (tails < v[:, None]).sum(axis=1, dtype=jnp.int32)
        pred = (jnp.where(cols1 == (new_l - 1)[:, None], m_idx, 0)
                .sum(axis=1, dtype=jnp.int32))
        p_pred = jnp.where((colsm == i) & ok[:, None], pred[:, None], p_pred)
        upd = ok[:, None] & (cols1 == new_l[:, None])
        m_idx = jnp.where(upd, i, m_idx)
        tails = jnp.where(upd, v[:, None], tails)
        l = jnp.where(ok, jnp.maximum(l, new_l), l)
        return (tails, m_idx, p_pred, l, i + 1), None

    tails0 = jnp.full((b, m + 1), INT32_MAX, dtype=jnp.int32)
    tails0 = tails0.at[:, 0].set(INT32_MIN)
    m_idx0 = jnp.zeros((b, m + 1), dtype=jnp.int32)
    p_pred0 = jnp.zeros((b, m), dtype=jnp.int32)
    l0 = jnp.zeros((b,), dtype=jnp.int32)
    (tails, m_idx, p_pred, l, _), _ = jax.lax.scan(
        step, (tails0, m_idx0, p_pred0, l0, jnp.int32(0)), (p2.T, valid.T))
    return p_pred, m_idx, l


def lis_reconstruct_select(p_pred, m_idx, l):
    """Predecessor walk (similarity.cpp:37-44); see _lis_reconstruct."""
    b, m = p_pred.shape
    cols1 = jax.lax.broadcasted_iota(jnp.int32, (b, m + 1), 1)
    colsm = jax.lax.broadcasted_iota(jnp.int32, (b, m), 1)
    k0 = jnp.where(cols1 == l[:, None], m_idx, 0).sum(axis=1, dtype=jnp.int32)

    def step(carry, i):
        k, s_arr = carry
        active = i < l
        w = (l - 1 - i)[:, None]
        s_arr = jnp.where((colsm == w) & active[:, None], k[:, None], s_arr)
        k_next = (jnp.where(colsm == k[:, None], p_pred, 0)
                  .sum(axis=1, dtype=jnp.int32))
        k = jnp.where(active, k_next, k)
        return (k, s_arr), None

    s0 = jnp.zeros((b, m), dtype=jnp.int32)
    (_, s_arr), _ = jax.lax.scan(step, (k0, s0),
                                 jnp.arange(m, dtype=jnp.int32))
    return s_arr


def anchor_filter_select(a1, a2, l, kmer_size: int, hc_max_dist: int):
    """Forward filter pass (similarity.cpp:52-85); see _anchor_filter."""
    b, m = a1.shape
    colsm = jax.lax.broadcasted_iota(jnp.int32, (b, m), 1)

    def step(carry, xs):
        lf, ls, prev_a2, bases, hc, kept, dist_arr, i = carry
        x1, x2 = xs
        active = i < l
        first = kept == 0
        d1 = x1 - lf
        d2 = x2 - ls
        keep_cond = jnp.logical_and(d1 < kmer_size, d2 < kmer_size) | \
            jnp.logical_and(d1 >= kmer_size, d2 >= kmer_size)
        keep = jnp.logical_and(active, jnp.logical_or(first, keep_cond))
        ex = kmer_size - (x2 - prev_a2)
        add = kmer_size - jnp.maximum(ex, 0)
        dist = (x2 - ls) - (x1 - lf)
        inc = jnp.where(first, kmer_size, add)
        bases = bases + jnp.where(keep, inc, 0)
        hc_inc = jnp.where(first, kmer_size,
                           jnp.where(dist < hc_max_dist, add, 0))
        hc = hc + jnp.where(keep, hc_inc, 0)
        rec = jnp.logical_and(keep, jnp.logical_not(first))
        dist_arr = jnp.where((colsm == (kept - 1)[:, None]) & rec[:, None],
                             dist[:, None], dist_arr)
        kept = kept + keep.astype(jnp.int32)
        lf = jnp.where(keep, x1, lf)
        ls = jnp.where(keep, x2, ls)
        prev_a2 = jnp.where(active, x2, prev_a2)
        return (lf, ls, prev_a2, bases, hc, kept, dist_arr, i + 1), None

    z = jnp.zeros((b,), dtype=jnp.int32)
    dist0 = jnp.zeros((b, m), dtype=jnp.int32)
    (lf, ls, prev, bases, hc, kept, dist_arr, _), _ = jax.lax.scan(
        step, (z, z, z, z, z, z, dist0, jnp.int32(0)), (a1.T, a2.T))
    return bases, hc, kept, dist_arr


def gather_by_onehot(values, idx):
    """values [B, M] gathered at idx [B, M] -> [B, M], via compare+dot-free
    select-sum (exact for any int values; no dynamic gather).

    Cost O(M^2) per row — use only for small M or when gathers dominate."""
    b, m = values.shape
    # one [B, M, M] compare is too big; do it as a scan over output slots
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, m), 1)

    def step(_, j):
        tgt = jax.lax.dynamic_index_in_dim(idx, j, axis=1, keepdims=False)
        v = (jnp.where(cols == tgt[:, None], values, 0)
             .sum(axis=1, dtype=values.dtype))
        return None, v

    _, out = jax.lax.scan(step, None, jnp.arange(m, dtype=jnp.int32))
    return out.T
