"""Batched pair scoring on device: bitvector gate, sorted-k-mer join, and the
patience-LIS similarity score.

Everything here is shape-static and jit-friendly.  Semantics match the oracle
(and therefore the reference):

* bitvector gate ......... cluster.cpp:13-19 (popcount of AND, integer-exact
                           threshold tables from ops/gates.py)
* common-k-mer join ...... kmer.cpp:45-67 (emitted directly in (pos1, pos2)
                           order by scanning read A in position order)
* patience LIS + filter .. similarity.cpp:4-97 (three lax.scans: LIS build,
                           backward reconstruction, forward anchor filter)
* variance gate .......... utils.cpp:36-55 in f32 with a relative borderline
                           band; borderline pairs are re-checked on the host in
                           exact float64 by the caller

The LIS build is O(M^2) per pair but runs as M vectorized steps over [B, M]
lanes, which maps well onto the TPU VPU; M is bucketed by the actual match
count so the common case is small.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

INT32_MAX = 2**31 - 1
INT32_MIN = -(2**31)
VAR_BAND = 1e-4  # relative borderline band around t_v for host recheck


def _batched_searchsorted(sorted_arr, queries, side: str, n_valid):
    """Binary search of [B, Q] queries in [B, K] per-row-sorted arrays.

    ``n_valid`` [B] clamps results into the real (unpadded) prefix, making the
    result exact regardless of padding sentinel collisions.
    """
    b, k = sorted_arr.shape
    lo = jnp.zeros(queries.shape, dtype=jnp.int32)
    hi = jnp.broadcast_to(n_valid[:, None], queries.shape).astype(jnp.int32)
    steps = max(1, (k).bit_length())
    for _ in range(steps):
        mid = (lo + hi) >> 1
        vals = jnp.take_along_axis(sorted_arr, jnp.clip(mid, 0, k - 1), axis=1)
        if side == "left":
            go_right = vals < queries
        else:
            go_right = vals <= queries
        go_right = jnp.logical_and(go_right, lo < hi)
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(jnp.logical_and(lo < hi, jnp.logical_not(go_right)), mid, hi)
    return lo


def pair_match_counts(hbp_a, nk_a, hs_b, nk_b) -> jnp.ndarray:
    """Total common-k-mer matches per pair (before any cap): [B] int32."""
    lo = _batched_searchsorted(hs_b, hbp_a, "left", nk_b)
    hi = _batched_searchsorted(hs_b, hbp_a, "right", nk_b)
    k = hbp_a.shape[1]
    pos_iota = jax.lax.broadcasted_iota(jnp.int32, hbp_a.shape, 1)
    cnt = jnp.where(pos_iota < nk_a[:, None], hi - lo, 0)
    return cnt.sum(axis=1, dtype=jnp.int32)


def _expand_matches(hbp_a, nk_a, hs_b, ps_b, nk_b, m_cap: int):
    """Materialize up to ``m_cap`` (pos1, pos2) matches per pair, already in
    (pos1, pos2) order (kmer.cpp:65's sort is implicit: read A is scanned in
    position order and read B runs are position-ascending within equal hash).
    Returns (p1 [B,M], p2 [B,M], total [B])."""
    b, k = hbp_a.shape
    lo = _batched_searchsorted(hs_b, hbp_a, "left", nk_b)
    hi = _batched_searchsorted(hs_b, hbp_a, "right", nk_b)
    pos_iota = jax.lax.broadcasted_iota(jnp.int32, (b, k), 1)
    cnt = jnp.where(pos_iota < nk_a[:, None], hi - lo, 0)
    offsets = jnp.cumsum(cnt, axis=1, dtype=jnp.int32)          # inclusive
    total = offsets[:, -1]

    slot = jax.lax.broadcasted_iota(jnp.int32, (b, m_cap), 1)
    t = _batched_searchsorted(offsets, slot, "right", jnp.full((b,), k, jnp.int32))
    t = jnp.clip(t, 0, k - 1)
    prev = jnp.where(t > 0, jnp.take_along_axis(offsets, jnp.maximum(t - 1, 0), axis=1), 0)
    within = slot - prev
    idx_b = jnp.take_along_axis(lo, t, axis=1) + within
    p2 = jnp.take_along_axis(ps_b, jnp.clip(idx_b, 0, k - 1), axis=1)
    valid = slot < jnp.minimum(total, m_cap)[:, None]
    p1 = jnp.where(valid, t, 0)
    p2 = jnp.where(valid, p2, INT32_MAX)
    return p1, p2, total


def _row_searchsorted(sorted_rows, values, steps: int):
    """Per-lane binary search: first index with sorted_rows[b, idx] >= v[b].

    sorted_rows [B, W] ascending per row, values [B] -> [B] int32."""
    b, w = sorted_rows.shape
    lo = jnp.zeros((b,), jnp.int32)
    hi = jnp.full((b,), w, jnp.int32)
    for _ in range(steps):
        mid = (lo + hi) >> 1
        vals = jnp.take_along_axis(sorted_rows, jnp.clip(mid, 0, w - 1)[:, None],
                                   axis=1)[:, 0]
        go_right = jnp.logical_and(vals < values, lo < hi)
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(jnp.logical_and(lo < hi, jnp.logical_not(go_right)), mid, hi)
    return lo


def _lis_build(p2, valid):
    """Patience LIS over the match list (similarity.cpp:10-31).

    O(M log M) per pair: each scan step does a per-lane binary search over the
    tails array plus point scatters (invalid lanes scatter out of bounds and
    are dropped).  Returns (p_pred [B,M], m_idx [B,M+1], l [B])."""
    b, m = p2.shape
    bidx = jnp.arange(b)
    steps = (m + 1).bit_length()

    def step(carry, xs):
        tails, m_idx, p_pred, l, i = carry
        v, ok = xs
        # count of tails < v; level 0 is -INF so the count is always >= 1
        new_l = _row_searchsorted(tails, v, steps)
        pred = jnp.take_along_axis(m_idx, jnp.maximum(new_l - 1, 0)[:, None],
                                   axis=1)[:, 0]
        p_pred = jax.lax.dynamic_update_slice(
            p_pred, jnp.where(ok, pred, 0)[:, None], (0, i))
        w_idx = jnp.where(ok, new_l, m + 1)  # out of bounds -> dropped
        m_idx = m_idx.at[bidx, w_idx].set(i, mode="drop")
        tails = tails.at[bidx, w_idx].set(v, mode="drop")
        l = jnp.where(ok, jnp.maximum(l, new_l), l)
        return (tails, m_idx, p_pred, l, i + 1), None

    tails0 = jnp.full((b, m + 1), INT32_MAX, dtype=jnp.int32)
    tails0 = tails0.at[:, 0].set(INT32_MIN)
    m_idx0 = jnp.zeros((b, m + 1), dtype=jnp.int32)
    p_pred0 = jnp.zeros((b, m), dtype=jnp.int32)
    l0 = jnp.zeros((b,), dtype=jnp.int32)
    (tails, m_idx, p_pred, l, _), _ = jax.lax.scan(
        step, (tails0, m_idx0, p_pred0, l0, jnp.int32(0)),
        (p2.T, valid.T))
    return p_pred, m_idx, l


def _lis_reconstruct(p_pred, m_idx, l):
    """Walk predecessors to lay the LIS match indices into [B, M] slots
    (similarity.cpp:37-44)."""
    b, m = p_pred.shape
    bidx = jnp.arange(b)
    k0 = jnp.take_along_axis(m_idx, l[:, None], axis=1)[:, 0]

    def step(carry, i):
        k, s_arr = carry
        active = i < l
        w_idx = jnp.where(active, l - 1 - i, m + 1)
        s_arr = s_arr.at[bidx, w_idx].set(k, mode="drop")
        k_next = jnp.take_along_axis(p_pred, jnp.clip(k, 0, m - 1)[:, None], axis=1)[:, 0]
        k = jnp.where(active, k_next, k)
        return (k, s_arr), None

    s0 = jnp.zeros((b, m), dtype=jnp.int32)
    (_, s_arr), _ = jax.lax.scan(step, (k0, s0), jnp.arange(m, dtype=jnp.int32))
    return s_arr


def _anchor_filter(a1, a2, l, kmer_size: int, hc_max_dist: int):
    """Forward filter pass (similarity.cpp:52-85): same-side-of-k rule,
    overlap-clipped base counting (``ex`` uses the previous RAW LIS element),
    distance recording for the variance gate."""
    b, m = a1.shape
    bidx = jnp.arange(b)

    def step(carry, xs):
        lf, ls, prev_a2, bases, hc, kept, dist_arr, i = carry
        x1, x2 = xs
        active = i < l
        first = kept == 0
        d1 = x1 - lf
        d2 = x2 - ls
        keep_cond = jnp.logical_and(d1 < kmer_size, d2 < kmer_size) | jnp.logical_and(
            d1 >= kmer_size, d2 >= kmer_size)
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
        w_idx = jnp.where(rec, kept - 1, m + 1)
        dist_arr = dist_arr.at[bidx, w_idx].set(dist, mode="drop")
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


def _variance(dist_arr, n_dist):
    """Compensated two-pass sample variance in f32 (utils.cpp:36-55).

    n==0 -> 0.0 (passes), n==1 -> +inf (the reference's 0/0 NaN fails
    ``< t_v`` just like +inf does)."""
    b, m = dist_arr.shape
    mask = jax.lax.broadcasted_iota(jnp.int32, (b, m), 1) < n_dist[:, None]
    df = jnp.where(mask, dist_arr, 0).astype(jnp.float32)
    nf = jnp.maximum(n_dist, 1).astype(jnp.float32)
    mean = df.sum(axis=1) / nf
    d = jnp.where(mask, df - mean[:, None], 0.0)
    ss = (d * d).sum(axis=1)
    comp = d.sum(axis=1)
    denom = jnp.maximum(n_dist - 1, 1).astype(jnp.float32)
    v = (ss - comp * comp / nf) / denom
    v = jnp.where(n_dist == 0, 0.0, v)
    v = jnp.where(n_dist == 1, jnp.inf, v)
    return v


@functools.partial(jax.jit, static_argnames=("m_cap", "kmer_size", "hc_max_dist"))
def score_pairs(hbp_a, nk_a, hs_b, ps_b, nk_b, m_cap: int, kmer_size: int,
                hc_max_dist: int = 10) -> Tuple[jnp.ndarray, ...]:
    """Full join + LIS scoring of B pairs.

    Returns (bases, hc_bases, var, n_dist, total_matches), each [B].
    Pairs with total_matches > m_cap must be re-scored elsewhere (the LIS here
    would only see the first m_cap matches).
    """
    p1, p2, total = _expand_matches(hbp_a, nk_a, hs_b, ps_b, nk_b, m_cap)
    valid = jax.lax.broadcasted_iota(jnp.int32, p1.shape, 1) < jnp.minimum(total, m_cap)[:, None]
    p_pred, m_idx, l = _lis_build(p2, valid)
    s_arr = _lis_reconstruct(p_pred, m_idx, l)
    a1 = jnp.take_along_axis(p1, s_arr, axis=1)
    a2 = jnp.take_along_axis(p2, s_arr, axis=1)
    bases, hc, kept, dist_arr = _anchor_filter(a1, a2, l, kmer_size, hc_max_dist)
    n_dist = jnp.maximum(kept - 1, 0)
    v = _variance(dist_arr, n_dist)
    return bases, hc, v, n_dist, total


@jax.jit
def bv_gate(bvp_pool, bvc_pool, bvp_seeds, bvc_seeds, min_table):
    """Bitvector pre-gate: [P, S] pass mask + popcount of AND.

    ``min_table`` [4097] int32 encodes the threshold exactly (ops/gates.py);
    an all-zero table means threshold 0 (always pass, cluster.cpp:19's
    bypass)."""
    p = bvp_pool.shape[0]
    s = bvp_seeds.shape[0]

    def chunk(seed_block):
        bv_s, _ = seed_block
        anded = jnp.bitwise_and(bvp_pool[:, None, :], bv_s[None, :, :])
        return jax.lax.population_count(anded).sum(axis=2, dtype=jnp.int32)

    # chunk over seeds to bound the [P, chunk, 128] intermediate
    chunk_size = max(1, min(s, 8))
    n_chunks = (s + chunk_size - 1) // chunk_size
    pad = n_chunks * chunk_size - s
    bv_sp = jnp.pad(bvp_seeds, ((0, pad), (0, 0)))
    common = jax.lax.map(
        chunk, (bv_sp.reshape(n_chunks, chunk_size, -1),
                jnp.zeros((n_chunks,), jnp.int32)))
    common = jnp.moveaxis(common, 0, 1).reshape(p, n_chunks * chunk_size)[:, :s]
    mmax = jnp.maximum(bvc_pool[:, None], bvc_seeds[None, :])
    passed = common >= min_table[mmax]
    return passed, common
