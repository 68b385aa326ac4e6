"""Fully-fused seed-batch decision kernel.

One device call computes everything the greedy driver needs for a seed batch:

  bitvector gate over [pool x seeds]
    -> pair compaction (fixed budget)
    -> match counts (chunked binary-search join)
    -> tiered join+LIS scoring (small tiers first; O(M log M) scans)
    -> win / needs-host flags scattered back and BIT-PACKED

Motivation: the TPU is reached through a high-latency tunnel, so per-call
dispatch and device->host bytes dominate; this kernel turns the ~15 calls of
the unfused path into one call returning 2 x [P, S/32] uint32 masks.

Pairs are classified by k-mer table width: a "small" instance gathers from
narrow K tables (most nanopore reads), a "large" instance from the full-width
tables; the driver calls both per batch (they compile once each).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from .similarity import (_anchor_filter, _batched_searchsorted, _expand_matches,
                         _lis_build, _lis_reconstruct, _variance)

INT32_MAX = 2**31 - 1

# (m_cap, tier_budget, tier_chunk)
DEFAULT_TIERS: Tuple[Tuple[int, int, int], ...] = (
    (32, 65536, 16384),
    (128, 16384, 8192),
    (512, 8192, 2048),
    (2048, 2048, 512),
)
DEFAULT_BUDGET = 262144
COUNT_CHUNK = 16384


class FusedResult(NamedTuple):
    win_packed: jax.Array    # [P, S//32] uint32
    host_packed: jax.Array   # [P, S//32] uint32 (needs exact host rescore)
    n_gated: jax.Array       # [] int32 (in this size class)


def _pack_bits(flags, p: int, s: int):
    """[P*S] bool -> [P, S//32] uint32."""
    words = s // 32
    bits = flags.reshape(p, words, 32).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return (bits << shifts[None, None, :]).sum(axis=2, dtype=jnp.uint32)


@functools.partial(
    jax.jit,
    static_argnames=("tiers", "budget", "count_chunk", "kmer_size",
                     "hc_max_dist", "small_side"))
def fused_decide(pool_ids, n_pool, seed_ids, n_seeds,
                 hbp_a_tab, hs_b_tab, ps_b_tab, nk_tab, lens_tab,
                 bvp_a_tab, bvp_b_tab, bvc_tab,
                 bv_tab, sc_tab, t_v, var_band, nk_limit,
                 *, tiers: Sequence[Tuple[int, int, int]] = DEFAULT_TIERS,
                 budget: int = DEFAULT_BUDGET, count_chunk: int = COUNT_CHUNK,
                 kmer_size: int = 10, hc_max_dist: int = 10,
                 small_side: bool = True) -> FusedResult:
    """Decisions for pairs whose size class matches ``small_side``
    (max(nk_a, nk_b) <= nk_limit when True, > nk_limit when False).

    a-side (seed) tables must be the forward strand; b-side tables select the
    strand under test.  ``bvc_tab`` is always the FORWARD set-bit count (the
    reference normalizes both strands by forward counts, cluster.cpp:16)."""
    p = pool_ids.shape[0]
    s = seed_ids.shape[0]
    k = hs_b_tab.shape[1]

    # ---- gate ----
    bvp_pool = jnp.take(bvp_b_tab, pool_ids, axis=0)
    bvc_pool = jnp.take(bvc_tab, pool_ids, axis=0)
    bvp_seed = jnp.take(bvp_a_tab, seed_ids, axis=0)
    bvc_seed = jnp.take(bvc_tab, seed_ids, axis=0)
    nk_pool = jnp.take(nk_tab, pool_ids, axis=0)
    nk_seed = jnp.take(nk_tab, seed_ids, axis=0)

    def gate_chunk(bv_s):
        anded = jnp.bitwise_and(bvp_pool[:, None, :], bv_s[None, :, :])
        return jax.lax.population_count(anded).sum(axis=2, dtype=jnp.int32)

    sc = max(1, min(s, 8))
    common = jax.lax.map(gate_chunk, bvp_seed.reshape(s // sc, sc, -1))
    common = jnp.moveaxis(common, 0, 1).reshape(p, s)
    mmax = jnp.maximum(bvc_pool[:, None], bvc_seed[None, :])
    gate = common >= bv_tab[mmax]
    pair_nk = jnp.maximum(nk_pool[:, None], nk_seed[None, :])
    in_class = (pair_nk <= nk_limit) if small_side else (pair_nk > nk_limit)
    gate = gate & in_class
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (p, s), 0)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (p, s), 1)
    gate = gate & (iota_p < n_pool) & (iota_s < n_seeds)

    flat = gate.reshape(-1)
    n_gated = flat.sum(dtype=jnp.int32)
    pair_idx = jnp.nonzero(flat, size=budget, fill_value=-1)[0].astype(jnp.int32)
    valid = pair_idx >= 0
    pi = jnp.clip(pair_idx, 0) // s
    si = jnp.clip(pair_idx, 0) % s
    a_ids = jnp.take(seed_ids, si)
    b_ids = jnp.take(pool_ids, pi)

    # ---- match counts (chunked) ----
    def count_chunk_fn(args):
        a_c, b_c = args
        hbp_a = jnp.take(hbp_a_tab, a_c, axis=0)
        nk_a = jnp.take(nk_tab, a_c, axis=0)
        hs_b = jnp.take(hs_b_tab, b_c, axis=0)
        nk_b = jnp.take(nk_tab, b_c, axis=0)
        lo = _batched_searchsorted(hs_b, hbp_a, "left", nk_b)
        hi = _batched_searchsorted(hs_b, hbp_a, "right", nk_b)
        pos_iota = jax.lax.broadcasted_iota(jnp.int32, hbp_a.shape, 1)
        cnt = jnp.where(pos_iota < nk_a[:, None], hi - lo, 0)
        return cnt.sum(axis=1, dtype=jnp.int32)

    nch = budget // count_chunk
    counts = jax.lax.map(
        count_chunk_fn,
        (a_ids.reshape(nch, count_chunk), b_ids.reshape(nch, count_chunk)))
    counts = counts.reshape(-1)
    counts = jnp.where(valid, counts, -1)

    # ---- tiered scoring ----
    res_win = jnp.zeros(budget, jnp.bool_)
    res_host = jnp.zeros(budget, jnp.bool_)
    prev_cap = 0
    for m_cap, t_budget, t_chunk in tiers:
        tier_mask = (counts > prev_cap) & (counts <= m_cap)
        prev_cap = m_cap
        sel = jnp.nonzero(tier_mask, size=t_budget, fill_value=-1)[0] \
            .astype(jnp.int32)
        sel_valid = sel >= 0
        tier_n = tier_mask.sum(dtype=jnp.int32)
        overflow_t = tier_n > t_budget

        def tier_chunk_fn(sel_c, m_cap=m_cap):
            scv = jnp.clip(sel_c, 0)
            a_c = jnp.take(a_ids, scv)
            b_c = jnp.take(b_ids, scv)
            hbp_a = jnp.take(hbp_a_tab, a_c, axis=0)
            nk_a = jnp.take(nk_tab, a_c, axis=0)
            hs_b = jnp.take(hs_b_tab, b_c, axis=0)
            ps_b = jnp.take(ps_b_tab, b_c, axis=0)
            nk_b = jnp.take(nk_tab, b_c, axis=0)
            p1, p2, total = _expand_matches(hbp_a, nk_a, hs_b, ps_b, nk_b, m_cap)
            mvalid = jax.lax.broadcasted_iota(jnp.int32, p1.shape, 1) < \
                jnp.minimum(total, m_cap)[:, None]
            p_pred, m_idx, l = _lis_build(p2, mvalid)
            s_arr = _lis_reconstruct(p_pred, m_idx, l)
            a1 = jnp.take_along_axis(p1, s_arr, axis=1)
            a2 = jnp.take_along_axis(p2, s_arr, axis=1)
            bases, _hc, kept, dist_arr = _anchor_filter(
                a1, a2, l, kmer_size, hc_max_dist)
            n_dist = jnp.maximum(kept - 1, 0)
            var = _variance(dist_arr, n_dist)
            return bases, var

        nt = t_budget // t_chunk
        bases_t, var_t = jax.lax.map(tier_chunk_fn, sel.reshape(nt, t_chunk))
        bases_t = bases_t.reshape(-1)
        var_t = var_t.reshape(-1)

        a_sel = jnp.take(a_ids, jnp.clip(sel, 0))
        b_sel = jnp.take(b_ids, jnp.clip(sel, 0))
        mn = jnp.minimum(jnp.take(lens_tab, a_sel), jnp.take(lens_tab, b_sel))
        score_ok = bases_t >= sc_tab[mn]
        borderline = jnp.abs(var_t - t_v) <= var_band
        win_t = score_ok & (var_t < t_v) & ~borderline & sel_valid
        host_t = score_ok & borderline & sel_valid

        w_idx = jnp.where(sel_valid, sel, budget + 1)
        res_win = res_win.at[w_idx].set(win_t, mode="drop")
        res_host = res_host.at[w_idx].set(host_t, mode="drop")
        res_host = res_host | (tier_mask & overflow_t)

    max_cap = tiers[-1][0]
    res_host = res_host | (valid & (counts > max_cap))

    # ---- scatter back + pack ----
    t_idx = jnp.where(valid, pair_idx, p * s)
    win_flat = jnp.zeros(p * s, jnp.bool_).at[t_idx].set(
        res_win & valid, mode="drop")
    host_flat = jnp.zeros(p * s, jnp.bool_).at[t_idx].set(
        res_host & valid, mode="drop")
    # compaction-budget overflow: every gated pair must go to the host
    host_flat = host_flat | (flat & (n_gated > budget))
    return FusedResult(_pack_bits(win_flat, p, s), _pack_bits(host_flat, p, s),
                       n_gated)


@functools.partial(
    jax.jit,
    static_argnames=("m_cap", "budget", "chunk", "kmer_size", "hc_max_dist",
                     "small_side"))
def fused_decide_single(pool_ids, n_pool, seed_ids, n_seeds,
                        hbp_a_tab, hs_b_tab, ps_b_tab, nk_tab, lens_tab,
                        bvp_a_tab, bvp_b_tab, bvc_tab,
                        bv_tab, sc_tab, t_v, var_band, nk_limit,
                        *, m_cap: int = 512, budget: int = DEFAULT_BUDGET,
                        chunk: int = 8192, kmer_size: int = 10,
                        hc_max_dist: int = 10,
                        small_side: bool = True) -> FusedResult:
    """Single-tier variant of ``fused_decide``: every gated pair is scored at
    one match cap; pairs whose match list exceeds it are flagged for the
    (fast, exact) native host scorer.  Much smaller HLO graph — compiles far
    faster through remote-compile tunnels."""
    p = pool_ids.shape[0]
    s = seed_ids.shape[0]

    bvp_pool = jnp.take(bvp_b_tab, pool_ids, axis=0)
    bvc_pool = jnp.take(bvc_tab, pool_ids, axis=0)
    bvp_seed = jnp.take(bvp_a_tab, seed_ids, axis=0)
    bvc_seed = jnp.take(bvc_tab, seed_ids, axis=0)
    nk_pool = jnp.take(nk_tab, pool_ids, axis=0)
    nk_seed = jnp.take(nk_tab, seed_ids, axis=0)

    def gate_chunk(bv_s):
        anded = jnp.bitwise_and(bvp_pool[:, None, :], bv_s[None, :, :])
        return jax.lax.population_count(anded).sum(axis=2, dtype=jnp.int32)

    sc = max(1, min(s, 8))
    common = jax.lax.map(gate_chunk, bvp_seed.reshape(s // sc, sc, -1))
    common = jnp.moveaxis(common, 0, 1).reshape(p, s)
    mmax = jnp.maximum(bvc_pool[:, None], bvc_seed[None, :])
    gate = common >= bv_tab[mmax]
    pair_nk = jnp.maximum(nk_pool[:, None], nk_seed[None, :])
    in_class = (pair_nk <= nk_limit) if small_side else (pair_nk > nk_limit)
    gate = gate & in_class
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (p, s), 0)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (p, s), 1)
    gate = gate & (iota_p < n_pool) & (iota_s < n_seeds)

    flat = gate.reshape(-1)
    n_gated = flat.sum(dtype=jnp.int32)
    pair_idx = jnp.nonzero(flat, size=budget, fill_value=-1)[0].astype(jnp.int32)
    valid = pair_idx >= 0
    pi = jnp.clip(pair_idx, 0) // s
    si = jnp.clip(pair_idx, 0) % s
    a_ids = jnp.take(seed_ids, si)
    b_ids = jnp.take(pool_ids, pi)

    def score_chunk(args):
        a_c, b_c = args
        hbp_a = jnp.take(hbp_a_tab, a_c, axis=0)
        nk_a = jnp.take(nk_tab, a_c, axis=0)
        hs_b = jnp.take(hs_b_tab, b_c, axis=0)
        ps_b = jnp.take(ps_b_tab, b_c, axis=0)
        nk_b = jnp.take(nk_tab, b_c, axis=0)
        p1, p2, total = _expand_matches(hbp_a, nk_a, hs_b, ps_b, nk_b, m_cap)
        mvalid = jax.lax.broadcasted_iota(jnp.int32, p1.shape, 1) < \
            jnp.minimum(total, m_cap)[:, None]
        p_pred, m_idx, l = _lis_build(p2, mvalid)
        s_arr = _lis_reconstruct(p_pred, m_idx, l)
        a1 = jnp.take_along_axis(p1, s_arr, axis=1)
        a2 = jnp.take_along_axis(p2, s_arr, axis=1)
        bases, _hc, kept, dist_arr = _anchor_filter(a1, a2, l, kmer_size,
                                                    hc_max_dist)
        n_dist = jnp.maximum(kept - 1, 0)
        var = _variance(dist_arr, n_dist)
        return bases, var, total

    nch = budget // chunk
    bases, var, total = jax.lax.map(
        score_chunk, (a_ids.reshape(nch, chunk), b_ids.reshape(nch, chunk)))
    bases = bases.reshape(-1)
    var = var.reshape(-1)
    total = total.reshape(-1)

    mn = jnp.minimum(jnp.take(lens_tab, a_ids), jnp.take(lens_tab, b_ids))
    score_ok = bases >= sc_tab[mn]
    borderline = jnp.abs(var - t_v) <= var_band
    fits = total <= m_cap
    win = score_ok & (var < t_v) & ~borderline & fits & valid
    host = ((~fits) | (score_ok & borderline)) & valid

    t_idx = jnp.where(valid, pair_idx, p * s)
    win_flat = jnp.zeros(p * s, jnp.bool_).at[t_idx].set(win, mode="drop")
    host_flat = jnp.zeros(p * s, jnp.bool_).at[t_idx].set(host, mode="drop")
    host_flat = host_flat | (flat & (n_gated > budget))
    return FusedResult(_pack_bits(win_flat, p, s), _pack_bits(host_flat, p, s),
                       n_gated)


def unpack_bits(packed, s: int):
    """[P, S//32] uint32 -> [P, S] numpy bool (host side)."""
    import numpy as np
    arr = np.asarray(packed)
    p = arr.shape[0]
    out = np.zeros((p, s), dtype=bool)
    for w in range(arr.shape[1]):
        for bit in range(32):
            out[:, w * 32 + bit] = (arr[:, w] >> bit) & 1
    return out
