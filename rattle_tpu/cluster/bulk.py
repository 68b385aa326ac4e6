"""Frontier TPU clustering engine: exact greedy parity at batch granularity.

The reference's greedy loop (cluster.cpp:124-166) scores each seed against
every still-unclustered later read.  Scoring ALL gated pairs up front (the
round-1 design) overcomputes ~10x: most gated pairs are between two reads of
the same cluster, and the reference only ever scores the one that absorbs.

This engine replays the exact same decisions in O(N/K) device waves:

  1. BLOCK: take the first K unclustered reads (in greedy order).  Every
     pair inside the block is decided (gate + join + LIS), and an on-device
     replay of the sequential absorption (greedy_owner) determines which
     block reads are true seeds.  A block read can only be absorbed by an
     EARLIER block read, so seed status is exact.
  2. SWEEP: the true seeds are scored against every unclustered read after
     the block in one batched pass; each such read joins the EARLIEST
     winning seed (the reference's first-claim rule).
  3. Absorbed reads leave the pool; repeat until empty.

Decisions per pair are identical to cluster.cpp:12-65: MXU bitvector gate
(cluster.cpp:13-19 as a bf16 matmul), sort-merge common-k-mer join
(kmer.cpp:45-67), patience LIS + anchor filter (similarity.cpp:4-97), and
the variance gate (utils.cpp:26-55).  Per-pair work is routed count-first
with a FUSED first pass: one join both measures each pair's match count and,
when the matches fit the first M tier (the majority), completes the LIS
decision in the same kernel — the expensive full-width row gathers feeding
the join happen once, not twice.  Remaining pairs route by exact count:
cheap reject (bases <= k * matches), then the smallest M tier that fits —
no speculative re-scoring up a ladder.

The merge rounds (cluster.cpp:171-256) use the same machinery over cluster
representatives with the B->b->0 threshold schedule; a device-resident score
cache (outcomes are threshold-independent) spares re-gated pairs.

Exactness escapes (host rescored in f64 like the reference): match-count
overflow beyond the last M tier, variance within VAR_BAND_REL of t_v.
"""

from __future__ import annotations

import functools
import os
import sys
import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import ClusterParams, bv_threshold_schedule
from ..io.hpsio import Cluster, CSeq
from ..ops import gates
from ..ops.encode import encode_seq
from ..ops.sketch_device import (DeviceSketch, build_device_sketch,
                                 build_device_sketch_sharded)
from ..ops.join_device import merge_join_expand, sorted_join_expand
from ..ops.lis_select import (anchor_filter_select, lis_build_select,
                              lis_reconstruct_select)
from ..ops.similarity import _variance
from . import oracle

INT32_MAX = 2**31 - 1

# K classes by pair max-nk: k-mer table slice widths (0 = full kmax,
# padded to a power of two so the join runs as a bitonic MERGE — the
# tables are pre-sorted, a log2(W)-stage merge beats a log^2 full sort)
K_CLASSES: Tuple[int, ...] = (1024, 2048, 4096, 0)
# M tiers: match-list capacities; pairs route to the smallest tier that
# fits their exact match count (count-first), > last tier -> exact f64
# native host scorer (rare: 100% of toyset gated pairs fit 2048)
M_LADDER: Tuple[int, ...] = (128, 512, 2048)
# static chunk shapes: COUNT_CHUNKS[cls], SCORE_CHUNKS[cls][tier]
COUNT_CHUNKS: Tuple[int, ...] = (4096, 2048, 1024, 512)
SCORE_CHUNKS: Tuple[Tuple[int, ...], ...] = ((4096, 2048, 512),
                                             (2048, 1024, 256),
                                             (1024, 512, 128),
                                             (512, 256, 64))
PAIR_BUDGET = 1 << 18
VAR_BAND_REL = 0.02
# chunk-count allocation buckets for the batched count/score dispatches:
# two fixed sizes keep compile variants at <=2 per (class, tier) route while
# the fori_loop's dynamic trip count skips the unused tail
NC_BUCKETS = (64, 512)
# sweep-phase column tiling: bounds the gate product at [k_block, SWEEP_TILE]
# regardless of N (the absorb decision is per-column, so tiles are exact)
SWEEP_TILE = 1 << 16
# above this n_pad the [n_pad^2] cross-round score cache is disabled (it
# would be 10 GB/strand at 100k reads); merge rounds then re-score rep pairs,
# which is bounded by the (much smaller) representative count
CACHE_MAX_N = 1 << 14

_PROFILE = int(os.environ.get("RATTLE_PROFILE", "0") or "0")


def _prof(label: str, t_start, sync_on=None, level: int = 1):
    """Section timing (RATTLE_PROFILE=1; =2 adds intra-wave sections);
    syncs via a 1-element fetch (a rank-0 fetch stalls minutes on the axon
    relay; rank-1 does not)."""
    if _PROFILE < level:
        return
    if sync_on is not None:
        np.asarray(jnp.ravel(sync_on)[:1])
    print(f"      [prof] {label}: {time.time() - t_start:.3f}s",
          file=sys.stderr, flush=True)


def _fetch(x) -> np.ndarray:
    """Device fetch that never transfers rank-0 (see _prof note).

    Multi-controller: outputs sharded over a multi-process mesh are not
    fully addressable; allgather them so every host sees the same global
    value and replays the greedy sweep identically (DESIGN.md)."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def _fetch_scalar(x) -> int:
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        return int(_fetch(x).ravel()[0])
    return int(np.asarray(jnp.ravel(x)[:1])[0])


def _pow2_at_least(n: int, lo: int) -> int:
    p = lo
    while p < n:
        p *= 2
    return p


# --------------------------------------------------------------------------
# jitted kernels
# --------------------------------------------------------------------------


# pad past the budget so blind chunk slices near the tail stay in-bounds
CH_PAD = 4096


@functools.partial(jax.jit,
                   static_argnames=("budget", "n_pad", "n_classes"),
                   donate_argnums=(14,))
def gate_class_block(plane_rows, bvc_rows, order_rows, group_rows, n_rows,
                     plane_cols, bvc_cols, order_cols, group_cols, n_cols,
                     tab, cache_flat, row_ids, col_ids, w, strand_val, nk,
                     bounds, budget: int, n_pad: int, n_classes: int):
    """Bitvector gate (cluster.cpp:13-19) + row-sorted pair compaction +
    ON-DEVICE class routing.

    Returns (w', rc_flat [budget + CH_PAD] int32, total, class_counts
    [n_classes]): rc_flat holds row * C + col for every FRESH gated pair,
    stably sorted by K-class (pair max-nk vs ``bounds``), -1 padded.
    Cached WINS are folded into ``w`` on device and cached pairs never
    enter rc_flat — the host learns only (total, class_counts) and that
    only via the end-of-wave summary fetch; every downstream dispatch is
    blind.  The row-sort compaction replaces a global nonzero-sort over
    [A*C] (measured ~1.1 s at 8448^2) with A row sorts.

    ``group_rows/cols``: pairs from different groups never gate — this is
    how --iso batches every gene cluster's sub-clustering into one pass
    (main.cpp:280-323 runs them as separate cluster_reads calls).
    """
    a = plane_rows.shape[0]
    c = plane_cols.shape[0]
    common = jax.lax.dot_general(
        plane_rows.astype(jnp.bfloat16), plane_cols.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)
    mmax = jnp.maximum(bvc_rows[:, None], bvc_cols[None, :])
    ri = jax.lax.broadcasted_iota(jnp.int32, (a, c), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (a, c), 1)
    passed = (common >= tab[mmax]) \
        & (order_rows[:, None] < order_cols[None, :]) \
        & (group_rows[:, None] == group_cols[None, :]) \
        & (ri < n_rows) & (ci < n_cols)

    keys = jnp.where(passed, ci, INT32_MAX)
    keys = jax.lax.sort(keys, dimension=1)
    rowcnt = passed.sum(axis=1, dtype=jnp.int32)
    starts = jnp.cumsum(rowcnt) - rowcnt                       # exclusive
    total = rowcnt.sum(dtype=jnp.int32)

    # slot -> row: scatter each nonempty row's index at its start slot,
    # then forward-propagate (starts are strictly increasing across
    # nonempty rows, so cummax recovers the owning row everywhere)
    mark = jnp.full((budget + 1,), -1, jnp.int32)
    mark = mark.at[jnp.where(rowcnt > 0, jnp.minimum(starts, budget),
                             budget)].max(jnp.arange(a, dtype=jnp.int32))
    row = jax.lax.cummax(mark[:budget])
    slots = jnp.arange(budget, dtype=jnp.int32)
    valid = slots < jnp.minimum(total, budget)
    rowc = jnp.clip(row, 0, a - 1)
    within = slots - jnp.take(starts, rowc)
    col = keys[rowc, jnp.clip(within, 0, c - 1)]
    colc = jnp.clip(col, 0, c - 1)

    ra = jnp.take(row_ids, rowc)
    rb = jnp.take(col_ids, colc)
    # explicit clip: with the cache disabled (n_pad == 1, 1-slot array) the
    # flat index is out of bounds and the default gather mode returns
    # garbage, not zeros
    cval = jnp.take(cache_flat,
                    jnp.minimum(ra * n_pad + rb,
                                cache_flat.shape[0] - 1)).astype(jnp.int32)
    cval = jnp.where(valid, cval, 0)
    w = w.at[jnp.where(valid & (cval == 2), rowc, a + 1), colc].max(
        strand_val, mode="drop")

    fresh = valid & (cval == 0)
    pair_nk = jnp.maximum(jnp.take(nk, ra), jnp.take(nk, rb))
    if bounds.shape[0]:
        cls = (pair_nk[:, None] > bounds[None, :]).sum(
            axis=1, dtype=jnp.int32)
    else:
        cls = jnp.zeros((budget,), jnp.int32)
    key = jnp.where(fresh, cls, n_classes)
    order = jnp.argsort(key, stable=True).astype(jnp.int32)
    rc = rowc * c + colc
    rc_sorted = jnp.where(jnp.take(key, order) < n_classes,
                          jnp.take(rc, order), -1)
    rc_flat = jnp.pad(rc_sorted, (0, CH_PAD), constant_values=-1)
    class_counts = (key[None, :]
                    == jnp.arange(n_classes, dtype=jnp.int32)[:, None]).sum(
        axis=1, dtype=jnp.int32)
    return w, rc_flat, total, class_counts




def _score_body(rows, cols, row_ids, col_ids, hs_a, ps_a, nk, hs_b, ps_b,
                lens, sc_tab, t_v, var_band, strand_val, w, cache_flat,
                m_cap: int, kmer_size: int, hc_max_dist: int, n_pad: int,
                use_pallas: bool = False):
    """Join + LIS decision for one fixed-shape chunk of (row, col) pairs
    (similarity.cpp:4-97 + cluster.cpp:24-37).  Wins scatter into ``w``;
    outcomes scatter into the cross-round score cache; returns
    (w', cache', border [CH] bool) where border = f64-borderline variance
    (host rescored, cluster.cpp exactness contract)."""
    act = rows >= 0
    a_ids = jnp.take(row_ids, jnp.clip(rows, 0))
    b_ids = jnp.take(col_ids, jnp.clip(cols, 0))
    hsa = jnp.take(hs_a, a_ids, axis=0)
    psa = jnp.take(ps_a, a_ids, axis=0)
    nk_a = jnp.take(nk, a_ids)
    hsb = jnp.take(hs_b, b_ids, axis=0)
    psb = jnp.take(ps_b, b_ids, axis=0)
    nk_b = jnp.take(nk, b_ids)
    if kmer_size <= 15:
        p1, p2, total = merge_join_expand(hsa, psa, nk_a, hsb, psb, nk_b,
                                          m_cap)
    else:
        p1, p2, total = sorted_join_expand(hsa, psa, nk_a, hsb, psb, nk_b,
                                           m_cap, packed=False)
    mvalid = jax.lax.broadcasted_iota(jnp.int32, p1.shape, 1) < \
        jnp.minimum(total, m_cap)[:, None]
    if use_pallas:
        from ..ops.pallas_kernels import lis_filter_pallas
        # dynamic scan bound: the LIS kernel's three M-step loops truncate
        # at this chunk's max match count (tier_partition count-sorts the
        # routes, so chunks are count-homogeneous and the bound is tight)
        bound = jnp.max(jnp.where(act, jnp.minimum(total, m_cap), 0))
        bases, _hc, n_dist, var = lis_filter_pallas(
            p1, p2, mvalid, kmer_size, hc_max_dist, bound=bound)
    else:
        p_pred, m_idx, l = lis_build_select(p2, mvalid)
        s_arr = lis_reconstruct_select(p_pred, m_idx, l)
        a1 = jnp.take_along_axis(p1, s_arr, axis=1)
        a2 = jnp.take_along_axis(p2, s_arr, axis=1)
        bases, _hc, kept, dist_arr = anchor_filter_select(
            a1, a2, l, kmer_size, hc_max_dist)
        n_dist = jnp.maximum(kept - 1, 0)
        var = _variance(dist_arr, n_dist)
    mn = jnp.minimum(jnp.take(lens, a_ids), jnp.take(lens, b_ids))
    score_ok = bases >= sc_tab[mn]
    borderline = jnp.abs(var - t_v) <= var_band
    fits = total <= m_cap  # count-first routing guarantees this; belt+braces
    win = score_ok & (var < t_v) & ~borderline & fits & act
    border = (score_ok & borderline & fits) & act

    decided = act & fits & ~border
    w = w.at[jnp.where(win, rows, w.shape[0] + 1),
             jnp.clip(cols, 0)].max(strand_val, mode="drop")
    flat = jnp.where(decided, a_ids * n_pad + b_ids, n_pad * n_pad + 1)
    cache_flat = cache_flat.at[flat].max(
        jnp.where(win, jnp.uint8(2), jnp.uint8(1)), mode="drop")
    return w, cache_flat, border, jnp.where(act, total, 0)


@functools.partial(jax.jit,
                   static_argnames=("cls_i", "ch", "nc_max", "m_cap",
                                    "kmer_size", "hc_max_dist", "n_pad",
                                    "use_pallas"),
                   donate_argnums=(15, 16, 17, 18))
def fused0_route(rc_flat, class_counts, c_pad, row_ids, col_ids, hs_a, ps_a,
                 nk, hs_b, ps_b, lens, sc_tab, t_v, var_band, strand_val,
                 w, cache_flat, borders_flat, counts_flat,
                 cls_i: int, ch: int, nc_max: int, m_cap: int,
                 kmer_size: int, hc_max_dist: int, n_pad: int,
                 use_pallas: bool = False):
    """Blind fused COUNT + tier-0 DECISION pass for one K-class.

    One join per pair does double duty: its exact match count routes the
    pair (scattered into ``counts_flat``), and when the matches fit the
    first M tier the full LIS decision happens right here — for the
    (majority) tier-0 pairs this halves the dominant cost of the score
    path, the full-table-width row gathers feeding the join, by never
    joining twice.  The dispatch is BLIND: the class's offset and count
    come from the device-resident ``class_counts``, so the host issues it
    without ever fetching the pair list (the round-5 one-fetch-per-wave
    design; d2h latency dominated the warm clustering time)."""
    class_off = class_counts[:cls_i].sum() if cls_i else jnp.int32(0)
    class_cnt = class_counts[cls_i]
    nc_real = jnp.minimum((class_cnt + ch - 1) // ch, nc_max)
    iota_ch = jnp.arange(ch, dtype=jnp.int32)

    def body(ci, carry):
        w_, cache_, borders_, counts_ = carry
        start = class_off + ci * ch
        rc = jax.lax.dynamic_slice(rc_flat, (start,), (ch,))
        ok = (iota_ch + ci * ch) < class_cnt
        rc = jnp.where(ok, rc, -1)
        rows = jnp.where(rc >= 0, rc // c_pad, -1)
        cols = jnp.where(rc >= 0, rc % c_pad, 0)
        w_, cache_, border, cnt = _score_body(
            rows, cols, row_ids, col_ids, hs_a, ps_a, nk, hs_b, ps_b, lens,
            sc_tab, t_v, var_band, strand_val, w_, cache_,
            m_cap, kmer_size, hc_max_dist, n_pad, use_pallas)
        borders_ = jax.lax.dynamic_update_slice(borders_, border, (start,))
        counts_ = jax.lax.dynamic_update_slice(counts_, cnt, (start,))
        return w_, cache_, borders_, counts_

    return jax.lax.fori_loop(0, nc_real, body,
                             (w, cache_flat, borders_flat, counts_flat))


@functools.partial(jax.jit,
                   static_argnames=("budget", "n_classes", "m_caps",
                                    "kmer_size"))
def tier_partition(rc_flat, counts_flat, c_pad, row_ids, col_ids, nk, lens,
                   sc_tab, bounds, budget: int, n_classes: int,
                   m_caps: Tuple[int, ...], kmer_size: int):
    """Device-side M-tier routing of the undecided remainder.

    Per fresh pair: tier key 0 = no further work (decided in tier 0, or
    cheap reject — bases <= k * matches can never reach the score
    threshold), 1..T-1 = smallest fitting M tier, T = overflow (exact host
    scorer).  Pairs stably sort by (class, tier) into ``score_rc`` and the
    [n_classes, T+1] count matrix routes the blind score dispatches."""
    t = len(m_caps)
    rc = rc_flat[:budget]
    cnt = counts_flat[:budget]
    act = rc >= 0
    rows = jnp.where(act, rc // c_pad, 0)
    cols = jnp.where(act, rc % c_pad, 0)
    ra = jnp.take(row_ids, rows)
    rb = jnp.take(col_ids, cols)
    pair_nk = jnp.maximum(jnp.take(nk, ra), jnp.take(nk, rb))
    if bounds.shape[0]:
        cls = (pair_nk[:, None] > bounds[None, :]).sum(
            axis=1, dtype=jnp.int32)
    else:
        cls = jnp.zeros((budget,), jnp.int32)
    mn = jnp.minimum(jnp.take(lens, ra), jnp.take(lens, rb))
    min_num = jnp.take(sc_tab, mn)
    reject = kmer_size * cnt < min_num
    tier = jnp.zeros((budget,), jnp.int32)
    for m in m_caps:
        tier = tier + (cnt > m).astype(jnp.int32)
    tierkey = jnp.where((tier == 0) | reject, 0, tier)
    key = jnp.where(act, cls * (t + 1) + tierkey, INT32_MAX)
    # secondary count sort: within a (class, tier) route pairs ascend by
    # match count, so the blind score chunks are count-homogeneous and the
    # LIS kernel's dynamic bound (see _score_body) stays tight per chunk.
    # Folded into ONE argsort key (a multi-operand lax.sort aborted XLA's
    # CPU SPMD partitioner on a mesh): key <= n_classes*(t+1) is tiny, so
    # key * 2048 + min(cnt, 2047) fits comfortably in int32; the 2047 clip
    # only coarsens ordering above the largest M tier, where the bound is
    # irrelevant (overflow pairs go to the host scorer)
    comp = jnp.where(act, key * 2048 + jnp.minimum(cnt, 2047), INT32_MAX)
    order = jnp.argsort(comp, stable=True).astype(jnp.int32)
    key_s = jnp.where(jnp.take(comp, order) == INT32_MAX, INT32_MAX,
                      jnp.take(comp, order) // 2048)
    keep = (key_s % (t + 1) != 0) & (key_s != INT32_MAX)
    score_rc = jnp.where(keep, jnp.take(rc, order), -1)
    score_rc = jnp.pad(score_rc, (0, CH_PAD), constant_values=-1)
    kk = jnp.arange(n_classes * (t + 1), dtype=jnp.int32)
    counts_mtx = (key[None, :] == kk[:, None]).sum(
        axis=1, dtype=jnp.int32).reshape(n_classes, t + 1)
    return score_rc, counts_mtx


@functools.partial(jax.jit,
                   static_argnames=("cls_i", "tier_i", "ch", "nc_max",
                                    "m_cap", "kmer_size", "hc_max_dist",
                                    "n_pad", "use_pallas"),
                   donate_argnums=(15, 16, 17))
def score_route(score_rc, counts_mtx, c_pad, row_ids, col_ids, hs_a, ps_a,
                nk, hs_b, ps_b, lens, sc_tab, t_v, var_band, strand_val,
                w, cache_flat, borders_flat,
                cls_i: int, tier_i: int, ch: int, nc_max: int, m_cap: int,
                kmer_size: int, hc_max_dist: int, n_pad: int,
                use_pallas: bool = False):
    """Blind score pass for one (class, tier) route over the
    tier-partitioned pair buffer.  Offset and count are device-resident;
    a zero-count route costs one empty fori_loop.

    Tier-0 slots hold no pairs (tier_partition drops them), so the flat
    index of (cls_i, tier_i) is taken over the full count matrix."""
    flat = counts_mtx.reshape(-1)
    idx = cls_i * counts_mtx.shape[1] + tier_i
    off = flat[:idx].sum() if idx else jnp.int32(0)
    cnt = flat[idx]
    nc_real = jnp.minimum((cnt + ch - 1) // ch, nc_max)
    iota_ch = jnp.arange(ch, dtype=jnp.int32)

    def body(ci, carry):
        w_, cache_, borders_ = carry
        start = off + ci * ch
        rc = jax.lax.dynamic_slice(score_rc, (start,), (ch,))
        ok = (iota_ch + ci * ch) < cnt
        rc = jnp.where(ok, rc, -1)
        rows = jnp.where(rc >= 0, rc // c_pad, -1)
        cols = jnp.where(rc >= 0, rc % c_pad, 0)
        w_, cache_, border, _cnt2 = _score_body(
            rows, cols, row_ids, col_ids, hs_a, ps_a, nk, hs_b, ps_b, lens,
            sc_tab, t_v, var_band, strand_val, w_, cache_,
            m_cap, kmer_size, hc_max_dist, n_pad, use_pallas)
        borders_ = jax.lax.dynamic_update_slice(borders_, border, (start,))
        return w_, cache_, borders_

    return jax.lax.fori_loop(0, nc_real, body,
                             (w, cache_flat, borders_flat))


@jax.jit
def wave_summary(totals, class_counts, counts_mtxs, border_anys, replay):
    """ONE int32 vector carrying everything the host needs from a wave:
    per-strand gate totals (budget check), class counts, tier count
    matrices, border/overflow any-flags, and the replay result.  A single
    d2h fetch replaces the five per-wave fetches whose latency dominated
    warm clustering (round-4 verdict)."""
    parts = [jnp.ravel(x).astype(jnp.int32)
             for x in (totals, class_counts, counts_mtxs, border_anys,
                       replay)]
    return jnp.concatenate(parts)


@jax.jit
def patch_wins(w, rows, cols, vals):
    """Host-rescore patches: w[rows, cols] max= vals (drop row -1 pads)."""
    return w.at[jnp.where(rows >= 0, rows, w.shape[0] + 1),
                jnp.clip(cols, 0)].max(vals, mode="drop")


@jax.jit
def greedy_owner(w, n_valid):
    """Exact replay of the reference's greedy absorption (cluster.cpp:124-166)
    inside one block.  ``w`` [K, K]: 0 no, 1 reverse win, 2 forward win
    (row = earlier position).  Returns packed [K] int32 = (owner << 1) | rev.
    """
    n = w.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)

    def body(i, st):
        owner, rev = st
        is_seed = owner[i] == i
        row = jax.lax.dynamic_index_in_dim(w, i, axis=0, keepdims=False)
        newly = is_seed & (row > 0) & (owner == iota) & (iota > i) & \
            (iota < n_valid)
        owner = jnp.where(newly, i, owner)
        rev = jnp.where(newly, row == 1, rev)
        return owner, rev

    owner, rev = jax.lax.fori_loop(
        0, n_valid, body, (iota, jnp.zeros((n,), jnp.bool_)))
    return (owner << 1) | rev.astype(jnp.int32)


@jax.jit
def absorb_rest(w):
    """Sweep-phase absorption: each column joins the EARLIEST winning seed
    row (first-claim, cluster.cpp:141-150).  w [S, C] int8.
    Returns packed [C] int32 = (seed_row << 1) | rev, or -1."""
    s, c = w.shape
    has = w > 0
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (s, c), 0)
    first = jnp.min(jnp.where(has, row_iota, s), axis=0)
    won = first < s
    val = jnp.take_along_axis(w, jnp.clip(first, 0, s - 1)[None, :],
                              axis=0)[0]
    return jnp.where(won, (first << 1) | (val == 1).astype(jnp.int32), -1)


# --------------------------------------------------------------------------
# engine
# --------------------------------------------------------------------------


class BulkClusterEngine:
    """Drop-in ``engine`` for pipeline.run_cluster; exact reference parity."""

    def __init__(self, seqs: Sequence[str], params: ClusterParams,
                 sketch: Optional[DeviceSketch] = None, mesh=None,
                 groups: Optional[np.ndarray] = None, shard=None):
        """``shard=(global_lens, start)``: per-host input sharding — ``seqs``
        is only THIS process's contiguous slice of the globally
        length-sorted reads, beginning at global row ``start``; every host
        knows all read lengths (streaming metadata scan) but no host holds
        another host's sequence content (fetched on demand by the rare
        host-rescore path via a deterministic collective)."""
        if params.use_hc:
            # unreachable from the reference CLI (no main.cpp flag sets
            # use_hc); score_chunk gates on `bases` so mixing metrics with
            # the host's hc path would silently diverge
            raise NotImplementedError("use_hc not supported by the bulk "
                                      "engine; use the oracle engine")
        self.p = params
        self.mesh = mesh
        n_pad_to = 256
        if mesh is not None:
            # the reads axis is sharded over the mesh: pad to a multiple
            import math
            nd = int(np.prod(mesh.devices.shape))
            n_pad_to = 256 * nd // math.gcd(256, nd)
        if shard is not None:
            global_lens, start = shard
            if mesh is None:
                raise ValueError("shard= requires mesh=")
            self.seqs = None
            self._local_seqs = {start + i: s for i, s in enumerate(seqs)}
            self.n = len(global_lens)
            self.read_lens = [int(x) for x in global_lens]
            n_pad = -(-self.n // n_pad_to) * n_pad_to
            self.sk = build_device_sketch_sharded(
                list(seqs), np.asarray(global_lens), start,
                params.kmer_size, not params.is_rna, mesh, n_pad)
        else:
            self.seqs = list(seqs)
            self._local_seqs = None
            self.n = len(seqs)
            self.read_lens = [len(s) for s in seqs]
            self.sk = sketch if sketch is not None else build_device_sketch(
                self.seqs, params.kmer_size, not params.is_rna,
                n_pad_to=n_pad_to)
            if mesh is not None:
                self._shard_sketch(mesh)
        sk = self.sk
        self.n_pad = sk.hbp.shape[0]
        self.k_block = min(4096, self.n_pad)
        self.sweep_cpad = min(SWEEP_TILE, self.n_pad)
        # per-K-class table slices (narrower merges for shorter reads);
        # widths are powers of two for the bitonic merge join
        full_w = _pow2_at_least(sk.kmax, 128)
        widths = sorted({min(w, full_w) for w in K_CLASSES if w} | {full_w})
        self.class_bounds = [w for w in widths[:-1]]
        self.n_classes = len(widths)
        self._cls_tabs = []
        for wid in widths:
            if wid <= sk.kmax:
                tabs = {"hs": sk.hs[:, :wid], "ps": sk.ps[:, :wid]}
                if not params.is_rna:
                    tabs["rev_hs"] = sk.rev_hs[:, :wid]
                    tabs["rev_ps"] = sk.rev_ps[:, :wid]
            else:
                # pad the full-width class to the pow2 (pads are beyond
                # every read's nk, so their values are never consumed)
                pad = ((0, 0), (0, wid - sk.kmax))
                tabs = {"hs": jnp.pad(sk.hs, pad), "ps": jnp.pad(sk.ps, pad)}
                if not params.is_rna:
                    tabs["rev_hs"] = jnp.pad(sk.rev_hs, pad)
                    tabs["rev_ps"] = jnp.pad(sk.rev_ps, pad)
            self._cls_tabs.append(tabs)
        self._bounds_dev = jnp.asarray(
            np.asarray(self.class_bounds, np.int32))
        # M ladder clamped to the input scale: tiers above ~kmax would run
        # giant scans for pairs the host scorer decides exactly in O(M log M)
        top_m = _pow2_at_least(min(M_LADDER[-1], sk.kmax), M_LADDER[0])
        self.m_ladder = tuple(m for m in M_LADDER if m <= top_m) or (top_m,)
        # chunk shapes capped for small inputs (CPU tests pad to n_pad=256)
        cap = max(256, 2 * self.n_pad)
        self.count_chunks = tuple(min(c, cap) for c in COUNT_CHUNKS)
        self.score_chunks = tuple(tuple(min(c, cap) for c in row)
                                  for row in SCORE_CHUNKS)
        score_min_host = gates.min_numerator_table(max(self.read_lens),
                                                   params.t_s)
        self.score_min_host = np.asarray(score_min_host)
        self.score_min = jnp.asarray(score_min_host)
        self._bv_tables: Dict[float, jnp.ndarray] = {}
        self._oracle_kmers: Dict[int, oracle.ReadKmers] = {}
        self._host_cache: Dict[Tuple[int, int, bool], bool] = {}
        self.n_oracle_fallbacks = 0
        self.var_band = np.float32(VAR_BAND_REL * max(self.p.t_v, 1.0))
        # cross-round score cache (outcomes are threshold-independent,
        # directional: a = seed side); 0 unscored / 1 score-no / 2 score-yes.
        # Disabled above CACHE_MAX_N (and on a mesh): the flat [n_pad^2]
        # layout does not scale; merge rounds then re-score rep pairs, which
        # is bounded by the representative count.  cache_n = 1 makes every
        # gather hit slot 0 (always "unscored") and every scatter drop.
        self.cache_n = self.n_pad \
            if (mesh is None and self.n_pad <= CACHE_MAX_N) else 1
        self._cache = {False: jnp.zeros((self.cache_n * self.cache_n,),
                                        jnp.uint8)}
        if not params.is_rna:
            self._cache[True] = jnp.zeros((self.cache_n * self.cache_n,),
                                          jnp.uint8)
        self.nk_host = sk.nk_host
        self.lens_host = sk.lens_host
        self.progress = False  # --verbose progress bar (utils.cpp:57-75)
        self.checkpoint = None  # utils.checkpoint.ClusterCheckpoint or None
        # group constraint (--iso batching): reads in different groups are
        # never compared; default one global group
        self.groups = np.zeros(self.n, np.int32) if groups is None \
            else np.asarray(groups, np.int32)
        # coarse wall-clock per phase, filled by cluster(); each
        # _greedy_pass ends host-synced so no extra fetches are needed
        self.phase_times: Dict[str, float] = {}
        from ..ops.pallas_kernels import supported as _pallas_ok
        self._pallas = _pallas_ok()

    # ---------- helpers ----------

    def _shard_sketch(self, mesh) -> None:
        """Lay the sketch tables out sharded over the mesh's first axis
        (reads axis).  The jitted kernels are unchanged — XLA's SPMD
        partitioner splits the gate matmul and the join/LIS gathers across
        devices from the input shardings (SURVEY §5 distributed backend:
        data-parallel read sharding, collectives inserted by the compiler).
        """
        from jax.sharding import NamedSharding, PartitionSpec as P
        axis = mesh.axis_names[0]
        row = NamedSharding(mesh, P(axis))
        sk = self.sk
        for name in ("hbp", "hs", "ps", "plane", "nk", "lens", "bvc",
                     "rev_hs", "rev_ps", "rev_plane"):
            arr = getattr(sk, name)
            if arr is not None:
                setattr(sk, name, jax.device_put(arr, row))

    def _bv_table(self, threshold: float) -> jnp.ndarray:
        tab = self._bv_tables.get(threshold)
        if tab is None:
            tab = jnp.asarray(gates.min_numerator_table(4096, threshold))
            self._bv_tables[threshold] = tab
        return tab

    def _class_tables(self, cls_i: int, rev: bool):
        t = self._cls_tabs[cls_i]
        return (t["hs"], t["ps"],
                t["rev_hs"] if rev else t["hs"],
                t["rev_ps"] if rev else t["ps"])

    def _seq(self, i: int) -> str:
        """Read i's sequence; in sharded mode it must be local or already
        fetched by _ensure_seqs."""
        if self.seqs is not None:
            return self.seqs[i]
        return self._local_seqs[i]

    def _ensure_seqs(self, ids) -> None:
        """Sharded mode: make the given global read ids' sequences available
        on every host via ONE deterministic collective (every host computes
        the identical borderline/overflow pair set, so the collective's
        shape agrees without coordination).  Owners contribute their rows;
        a max-combine assembles the full set.  Borderline pairs are rare,
        so the exchanged bytes are negligible."""
        if self.seqs is not None:
            return
        import jax as _jax
        if _jax.process_count() == 1:
            return
        # NO local early-out: another host may be missing an id this host
        # owns, and the collective's shape must agree everywhere — so the
        # exchange always covers the full id set
        ids = sorted(set(int(i) for i in ids))
        if not ids:
            return
        from jax.experimental import multihost_utils as mhu
        lmax = max(self.read_lens[i] for i in ids)
        buf = np.zeros((len(ids), lmax), np.uint8)
        for r, i in enumerate(ids):
            s = self._local_seqs.get(i)
            if s is not None:
                raw = np.frombuffer(s.encode("ascii"), np.uint8)
                buf[r, : len(raw)] = raw
        got = np.asarray(mhu.process_allgather(buf))  # [pc, n_ids, lmax]
        tot = got.max(axis=0)
        for r, i in enumerate(ids):
            if i not in self._local_seqs:
                ln = self.read_lens[i]
                self._local_seqs[i] = tot[r, :ln].tobytes().decode("ascii")

    def _okm(self, i: int) -> oracle.ReadKmers:
        km = self._oracle_kmers.get(i)
        if km is None:
            km = oracle.extract_kmers(
                encode_seq(self._seq(i)), self.p.kmer_size,
                not self.p.is_rna)
            self._oracle_kmers[i] = km
        return km

    def _host_decide(self, a: int, b: int, rev: bool) -> bool:
        """Exact f64 single-pair decision (score + variance, no gate)."""
        key = (a, b, rev)
        hit = self._host_cache.get(key)
        if hit is not None:
            return hit
        self.n_oracle_fallbacks += 1
        ka, kb = self._okm(a), self._okm(b)
        if rev:
            m1, m2 = oracle.common_kmers(ka.hashes, ka.positions,
                                         kb.rev_hashes, kb.rev_positions)
        else:
            m1, m2 = oracle.common_kmers(ka.hashes, ka.positions,
                                         kb.hashes, kb.positions)
        sim = oracle.calc_similarity(m1, m2, self.p.kmer_size,
                                     self.p.hc_max_dist)
        mn = float(min(self.read_lens[a], self.read_lens[b]))
        metric = sim.hc_bases if self.p.use_hc else sim.bases
        from ..utils.varmath import var as exact_var
        ok = bool(metric / mn >= self.p.t_s
                  and exact_var(sim.distances) < self.p.t_v)
        self._host_cache[key] = ok
        return ok

    def _host_rescore_batch(self, batch):
        """Exact f64 decisions for (rev, a, b, row, col) jobs, batched
        through the native scorer (falls back to the Python oracle).
        Yields (rev, a, b, row, col, win)."""
        todo = []
        for rev, a, b, r_, c_ in batch:
            hit = self._host_cache.get((a, b, rev))
            if hit is None:
                todo.append((rev, a, b))
            else:
                yield rev, a, b, r_, c_, hit
        done: Dict[Tuple[int, int, bool], bool] = {}
        if todo:
            from .. import native
            from ..ops.sketch import build_sketch_tables
            self._ensure_seqs([i for _rev, a, b in todo for i in (a, b)])
            if native.available():
                uniq = sorted({i for _rev, a, b in todo for i in (a, b)})
                remap = {g: i for i, g in enumerate(uniq)}
                sub = build_sketch_tables([self._seq(i) for i in uniq],
                                          self.p.kmer_size,
                                          not self.p.is_rna)
                a_ids = np.array([remap[a] for _rev, a, _b in todo], np.int32)
                b_ids = np.array([remap[b] for _rev, _a, b in todo], np.int32)
                revs = np.array([rev for rev, _a, _b in todo], bool)
                out = native.score_pairs_native(sub, a_ids, b_ids, revs,
                                                self.p.kmer_size,
                                                self.p.hc_max_dist)
                if out is not None:
                    lens = np.asarray(self.read_lens, dtype=np.int64)
                    mn = np.minimum(
                        lens[[a for _r, a, _b in todo]],
                        lens[[b for _r, _a, b in todo]]).astype(np.float64)
                    metric = out["hc"] if self.p.use_hc else out["bases"]
                    with np.errstate(invalid="ignore"):
                        ok = (metric.astype(np.float64) / mn >= self.p.t_s) \
                            & (out["var"] < self.p.t_v)
                    self.n_oracle_fallbacks += len(todo)
                    for (rev, a, b), o in zip(todo, ok):
                        done[(a, b, rev)] = bool(o)
                        self._host_cache[(a, b, rev)] = bool(o)
        for rev, a, b, r_, c_ in batch:
            key = (a, b, rev)
            if key in done:
                yield rev, a, b, r_, c_, done[key]
            elif key not in self._host_cache:
                yield rev, a, b, r_, c_, self._host_decide(a, b, rev)

    # ---------- one batched decision wave ----------

    def _wave(self, row_ids: np.ndarray, col_ids: np.ndarray,
              threshold: float, ordered: bool, budget: Optional[int] = None):
        """One decision wave with ONE device->host fetch (round-5 design:
        warm clustering was dominated by per-wave d2h latency, ~5 fetches
        a wave).  Pipeline per strand, all dispatched without any fetch:

          gate_class_block: gate + compaction + class sort (device)
          fused0_route x class: count + tier-0 decisions (blind)
          tier_partition: cheap-reject + M-tier routing (device)
          score_route x (class, tier): remaining decisions (blind)

        then the replay (greedy_owner for an ordered block, absorb_rest
        for a sweep) and a wave_summary carrying totals/route counts/
        rare-path flags/replay in one int32 vector.  Rare paths (budget
        overflow, borderline variance, match-count overflow) re-enter with
        extra fetches; decisions are idempotent so a budget re-run is
        exact.

        ``ordered``: rows/cols are the same greedy-ordered list (block
        phase) — only pairs with row position < col position are tested.
        Otherwise every (row, col) pair is tested (sweep phase; rows are
        seeds, all of which precede all cols in greedy order).

        Returns the packed replay vector (np.int32)."""
        sk = self.sk
        a = len(row_ids)
        c = len(col_ids)
        k = self.k_block
        # pow2 row/col buckets: merge rounds shrink the rep list every round,
        # so padding everything to k_block wasted 4-16x gate FLOPs there
        a_pad = min(k, _pow2_at_least(a, 512))
        if ordered:
            c_pad = a_pad  # square block: greedy_owner replays row x row
        else:
            c_pad = min(self.sweep_cpad, _pow2_at_least(c, 512))
        tab = self._bv_table(threshold)

        d_row_ids = jnp.asarray(np.pad(row_ids.astype(np.int32),
                                       (0, a_pad - a)))
        d_col_ids = jnp.asarray(np.pad(col_ids.astype(np.int32),
                                       (0, c_pad - c)))
        group_rows = jnp.asarray(np.pad(self.groups[row_ids],
                                        (0, a_pad - a), constant_values=-1))
        group_cols = jnp.asarray(np.pad(self.groups[col_ids],
                                        (0, c_pad - c), constant_values=-2))
        plane_rows = jnp.take(sk.plane, d_row_ids, axis=0)
        bvc_rows = jnp.take(sk.bvc, d_row_ids)
        bvc_cols = jnp.take(sk.bvc, d_col_ids)
        if ordered:
            order_rows = jnp.arange(a_pad, dtype=jnp.int32)
            order_cols = jnp.arange(c_pad, dtype=jnp.int32)
        else:
            order_rows = jnp.zeros((a_pad,), jnp.int32)
            order_cols = jnp.ones((c_pad,), jnp.int32)

        if budget is None:
            budget = min(PAIR_BUDGET, _pow2_at_least(a_pad * c_pad, 1024))
        n_cls = self.n_classes
        t_lad = len(self.m_ladder)
        c_pad_dev = jnp.int32(c_pad)
        tv = jnp.float32(self.p.t_v)
        vband = jnp.float32(self.var_band)
        m0 = self.m_ladder[0]

        w = jnp.zeros((a_pad, c_pad), jnp.int8)
        strands = [False] if self.p.is_rna else [False, True]
        sdata = []
        t0 = time.time()
        tsec = time.time()
        for rev in strands:
            if rev:
                plane_cols = jnp.take(sk.rev_plane, d_col_ids, axis=0)
            else:
                plane_cols = jnp.take(sk.plane, d_col_ids, axis=0)
            val = jnp.int8(1 if rev else 2)
            cache = self._cache[rev]
            w, rc_flat, total, class_counts = gate_class_block(
                plane_rows, bvc_rows, order_rows, group_rows, jnp.int32(a),
                plane_cols, bvc_cols, order_cols, group_cols, jnp.int32(c),
                tab, cache, d_row_ids, d_col_ids, w, val, sk.nk,
                self._bounds_dev, budget=budget, n_pad=self.cache_n,
                n_classes=n_cls)
            _prof("  gate", tsec, sync_on=rc_flat, level=2)
            tsec = time.time()
            borders_f = jnp.zeros((budget + CH_PAD,), jnp.bool_)
            counts_f = jnp.zeros((budget + CH_PAD,), jnp.int32)
            for cls_i in range(n_cls):
                ch = self.count_chunks[cls_i]
                hs_a, ps_a, hs_b, ps_b = self._class_tables(cls_i, rev)
                w, cache, borders_f, counts_f = fused0_route(
                    rc_flat, class_counts, c_pad_dev, d_row_ids, d_col_ids,
                    hs_a, ps_a, sk.nk, hs_b, ps_b, sk.lens, self.score_min,
                    tv, vband, val, w, cache, borders_f, counts_f,
                    cls_i=cls_i, ch=ch, nc_max=budget // ch + 1, m_cap=m0,
                    kmer_size=self.p.kmer_size,
                    hc_max_dist=self.p.hc_max_dist, n_pad=self.cache_n,
                    use_pallas=self._pallas)
                _prof(f"  fused0 cls={cls_i}", tsec, sync_on=counts_f,
                      level=2)
                tsec = time.time()
            score_rc, counts_mtx = tier_partition(
                rc_flat, counts_f, c_pad_dev, d_row_ids, d_col_ids, sk.nk,
                sk.lens, self.score_min, self._bounds_dev, budget=budget,
                n_classes=n_cls, m_caps=self.m_ladder,
                kmer_size=self.p.kmer_size)
            _prof("  tier_partition", tsec, sync_on=score_rc, level=2)
            tsec = time.time()
            borders_s = jnp.zeros((budget + CH_PAD,), jnp.bool_)
            for cls_i in range(n_cls):
                for tier_i in range(1, t_lad):
                    ch = self.score_chunks[cls_i][tier_i]
                    m_cap = self.m_ladder[tier_i]
                    hs_a, ps_a, hs_b, ps_b = self._class_tables(cls_i, rev)
                    w, cache, borders_s = score_route(
                        score_rc, counts_mtx, c_pad_dev, d_row_ids,
                        d_col_ids, hs_a, ps_a, sk.nk, hs_b, ps_b, sk.lens,
                        self.score_min, tv, vband, val, w, cache,
                        borders_s, cls_i=cls_i, tier_i=tier_i, ch=ch,
                        nc_max=budget // ch + 1, m_cap=m_cap,
                        kmer_size=self.p.kmer_size,
                        hc_max_dist=self.p.hc_max_dist, n_pad=self.cache_n,
                        use_pallas=self._pallas and m_cap <= 2048)
                    _prof(f"  score cls={cls_i} tier={tier_i}", tsec,
                          sync_on=borders_s, level=2)
                    tsec = time.time()
            self._cache[rev] = cache
            flags = jnp.stack([borders_f[:budget].any(),
                               borders_s[:budget].any(),
                               counts_mtx[:, t_lad].sum() > 0])
            sdata.append(dict(rev=rev, rc=rc_flat, score_rc=score_rc,
                              borders_f=borders_f, borders_s=borders_s,
                              total=total, class_counts=class_counts,
                              counts_mtx=counts_mtx, flags=flags))

        replay = greedy_owner(w, jnp.int32(a)) if ordered else absorb_rest(w)
        summary = wave_summary(
            jnp.stack([d["total"] for d in sdata]),
            jnp.stack([d["class_counts"] for d in sdata]),
            jnp.stack([d["counts_mtx"] for d in sdata]),
            jnp.stack([d["flags"] for d in sdata]), replay)
        got = _fetch(summary)
        ns = len(strands)
        totals = got[:ns]
        off = ns + ns * n_cls  # class counts ride along for profiling only
        cmtx_all = got[off:off + ns * n_cls * (t_lad + 1)].reshape(
            ns, n_cls, t_lad + 1)
        off += ns * n_cls * (t_lad + 1)
        flags_all = got[off:off + ns * 3].reshape(ns, 3)
        off += ns * 3
        packed = got[off:]
        _prof(f"wave a={a} c={c} thr={threshold} tot={totals.tolist()}",
              t0)
        _prof(f"  cls_counts={got[ns:ns + ns * n_cls].tolist()} "
              f"cmtx={cmtx_all.tolist()}", t0, level=2)

        if int(totals.max()) > budget:
            # gate overflow: redo the wave at the next budget (rare;
            # decisions are idempotent, so recommitting is exact)
            return self._wave(row_ids, col_ids, threshold, ordered,
                              budget=_pow2_at_least(int(totals.max()),
                                                    budget * 2))
        if flags_all.any():
            t0 = time.time()
            for d, fl, cm in zip(sdata, flags_all, cmtx_all):
                d["flags_host"] = fl
                d["cmtx_host"] = cm
            w, changed = self._rare_paths(w, sdata, row_ids, col_ids,
                                          c_pad, budget)
            if changed:
                replay = greedy_owner(w, jnp.int32(a)) if ordered \
                    else absorb_rest(w)
                packed = _fetch(replay)
            _prof("rare paths", t0)
        return packed

    def _rare_paths(self, w, sdata, row_ids, col_ids, c_pad, budget):
        """Borderline-variance and match-count-overflow pairs: exact f64
        host rescore (cluster.cpp exactness contract), patched into w."""
        host_jobs: List[Tuple[bool, int, int, int, int]] = []
        t_lad = len(self.m_ladder)
        for d in sdata:
            rev = d["rev"]
            fl = d["flags_host"]

            def add(rc_val):
                r_, c_ = divmod(int(rc_val), c_pad)
                host_jobs.append((rev, int(row_ids[r_]), int(col_ids[c_]),
                                  r_, c_))

            if fl[0]:
                bf = _fetch(d["borders_f"])[:budget]
                rc = _fetch(d["rc"])[:budget]
                for i in np.nonzero(bf)[0]:
                    if rc[i] >= 0:
                        add(rc[i])
            if fl[1] or fl[2]:
                src = _fetch(d["score_rc"])[:budget]
                if fl[1]:
                    bs = _fetch(d["borders_s"])[:budget]
                    for i in np.nonzero(bs)[0]:
                        if src[i] >= 0:
                            add(src[i])
                if fl[2]:
                    flat = d["cmtx_host"].reshape(-1)
                    for cls_i in range(self.n_classes):
                        idx = cls_i * (t_lad + 1) + t_lad
                        o = int(flat[:idx].sum())
                        for i in range(o, o + int(flat[idx])):
                            if src[i] >= 0:
                                add(src[i])
        if not host_jobs:
            return w, False
        t0 = time.time()
        patches = []
        for rev, aa, bb, r_, c_, ok in self._host_rescore_batch(host_jobs):
            if ok:
                patches.append((r_, c_, 1 if rev else 2))
        _prof(f"host rescore n={len(host_jobs)}", t0)
        if not patches:
            return w, False
        arr = np.asarray(patches, np.int32)
        w = patch_wins(w, jnp.asarray(arr[:, 0]), jnp.asarray(arr[:, 1]),
                       jnp.asarray(arr[:, 2]).astype(jnp.int8))
        return w, True

    # ---------- frontier greedy ----------

    def _greedy_pass(self, ids: np.ndarray, threshold: float):
        """Frontier-exact greedy absorption over ``ids`` (greedy order).
        Returns [(seed_pos, [(member_pos, rev), ...])] in seed order."""
        m = len(ids)
        owner = np.arange(m)
        revf = np.zeros(m, bool)
        pool = np.arange(m)
        k = self.k_block
        while len(pool):
            if self.progress:
                from ..utils.metrics import print_progress
                print_progress(m - len(pool), m)
            blk = pool[:k]
            nb = len(blk)
            packed = self._wave(ids[blk], ids[blk], threshold,
                                ordered=True)[:nb]
            o = packed >> 1
            owner[blk] = blk[o]
            revf[blk] = (packed & 1).astype(bool)
            seeds = blk[o == np.arange(nb)]
            rest = pool[k:]
            if len(rest) == 0:
                break
            # all true seeds of this block sweep the remaining pool in
            # bounded column tiles (the first-claim absorb decision is
            # per-column, so tiling is exact)
            survivors = []
            for t0_col in range(0, len(rest), self.sweep_cpad):
                tile = rest[t0_col:t0_col + self.sweep_cpad]
                pk = self._wave(ids[seeds], ids[tile], threshold,
                                ordered=False)[:len(tile)]
                won = pk >= 0
                owner[tile[won]] = seeds[(pk[won] >> 1)]
                revf[tile[won]] = (pk[won] & 1).astype(bool)
                survivors.append(tile[~won])
            pool = np.concatenate(survivors) if survivors else rest[:0]
        if self.progress:
            from ..utils.metrics import print_progress
            print_progress(m, m)
        groups: Dict[int, List[Tuple[int, bool]]] = {}
        for pos in range(m):
            groups.setdefault(int(owner[pos]), []).append(
                (pos, bool(revf[pos])))
        return [(seed, groups[seed]) for seed in sorted(groups)]

    # ---------- public API ----------

    def cluster(self) -> List[Cluster]:
        p = self.p
        ck = self.checkpoint
        schedule = list(bv_threshold_schedule(p))
        phases_done = 0
        clusters: List[Cluster] = []
        if ck is not None:
            resume = ck.load()
            if resume is not None:
                phases_done, clusters = resume

        if phases_done == 0:
            order = np.arange(self.n)
            t0 = time.time()
            groups = self._greedy_pass(order, p.bv_threshold)
            self.phase_times["greedy"] = time.time() - t0
            for _seed, members in groups:
                cseqs = [CSeq(m_, r_) for m_, r_ in members]
                main = oracle.get_main_seq(cseqs, self.read_lens,
                                           p.repr_percentile)
                clusters.append(Cluster(main, cseqs))
            phases_done = 1
            if ck is not None:
                ck.record(phases_done, clusters)

        t0 = time.time()
        for round_i, threshold in enumerate(schedule):
            if round_i + 1 < phases_done:
                continue  # merge round already checkpointed
            reps = np.array([c.main_seq.seq_id for c in clusters])
            merge_groups = self._greedy_pass(reps, threshold)
            tmp: List[Cluster] = []
            for _seed_cid, members in merge_groups:
                merged = Cluster(CSeq(-1, False), [])
                for cid, rev in members:
                    for s in clusters[cid].seqs:
                        merged.seqs.append(
                            CSeq(s.seq_id, (not s.rev) if rev else s.rev,
                                 s.gene_id))
                merged.main_seq = oracle.get_main_seq(
                    merged.seqs, self.read_lens, p.repr_percentile)
                tmp.append(merged)
            clusters = tmp
            phases_done = round_i + 2
            if ck is not None:
                ck.record(phases_done, clusters)
        self.phase_times["merge"] = time.time() - t0
        return clusters


def shard_plan(mesh, n: int):
    """(start, end, n_pad): this process's contiguous slice of the globally
    length-sorted read list, under the same padding rule the engine's
    sharded sketch build uses (rows divide evenly across processes and
    devices)."""
    import math
    import jax
    nd = int(np.prod(mesh.devices.shape))
    n_pad_to = 256 * nd // math.gcd(256, nd)
    n_pad = -(-n // n_pad_to) * n_pad_to
    rows = n_pad // jax.process_count()
    start = jax.process_index() * rows
    return start, min(start + rows, n), n_pad


ORACLE_CUTOVER = 48


def cluster_reads_bulk(seqs: Sequence[str], params: ClusterParams,
                       progress: bool = False, mesh=None,
                       groups: Optional[np.ndarray] = None,
                       checkpoint_dir: Optional[str] = None) -> List[Cluster]:
    """Engine entry point for pipeline.run_cluster.

    ``groups``: optional per-read group ids.  Reads in different groups are
    never compared and sub-clusterings of all groups run in ONE batched
    device pass — this is how --iso clusters every gene cluster's members
    at once instead of one engine call per gene cluster (main.cpp:280-323).
    Output order matches the reference's per-group emission because group
    member positions are contiguous and clusters emit in seed order."""
    if len(seqs) < ORACLE_CUTOVER:
        if groups is None:
            return oracle.cluster_reads(seqs, params, progress=progress)
        out: List[Cluster] = []
        g_arr = np.asarray(groups)
        for g in np.unique(g_arr):
            idx = np.nonzero(g_arr == g)[0]
            for c in oracle.cluster_reads([seqs[i] for i in idx], params):
                main = CSeq(int(idx[c.main_seq.seq_id]), c.main_seq.rev)
                mem = [CSeq(int(idx[s.seq_id]), s.rev) for s in c.seqs]
                out.append(Cluster(main, mem))
        return out
    engine = BulkClusterEngine(seqs, params, mesh=mesh, groups=groups)
    engine.progress = progress
    if checkpoint_dir is not None:
        # phase-granular resume (utils/checkpoint.py ClusterCheckpoint);
        # the key guards against reusing a manifest after the inputs or
        # params changed: full length vector + a 64-read content sample
        import dataclasses
        import hashlib
        h = hashlib.sha256(
            np.asarray([len(s) for s in seqs], np.int64).tobytes())
        for i in range(0, len(seqs), max(1, len(seqs) // 64)):
            h.update(seqs[i].encode())
        if groups is not None:
            h.update(np.asarray(groups, np.int64).tobytes())
        from ..utils.checkpoint import ClusterCheckpoint, params_key
        key = params_key(params=dataclasses.asdict(params), n=len(seqs),
                         digest=h.hexdigest())
        engine.checkpoint = ClusterCheckpoint(checkpoint_dir, key)
    out = engine.cluster()
    if engine.checkpoint is not None:
        # the returned clusters become the stage artifact immediately; the
        # manifest's job (surviving a crash mid-stage) is done
        engine.checkpoint.finalize()
    return out
