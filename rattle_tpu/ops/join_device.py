"""Sort-merge common-k-mer join on device (kmer.cpp:45-67).

TPUs have no gather hardware: the binary-search join in ops/similarity.py
costs ~1 s per 4096-pair chunk because every search step is a lane-serial
gather.  This join uses only TPU-fast primitives — `lax.sort`, cumulative
ops, broadcast compare+reduce ("selsum") — and two small [B, M] gathers:

  1. concat the two PRE-SORTED hash tables, tag by side, sort by (hash, side)
  2. segmented cumsums give, for every b-side element, the count and rank
     range of a-side elements sharing its hash (duplicates included)
  3. match slots expand via selsum rank arithmetic; (pos1, pos2) pairs are
     recovered with selsum-gathers and re-sorted by (pos1, pos2)

Contract identical to similarity._expand_matches: matches compacted to the
front in (pos1, pos2) order (the reference's emission order), p2 padded with
INT32_MAX, and the TRUE total match count returned (overflow detection).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INT32_MAX = 2**31 - 1
PAD_HASH = jnp.uint32(0xFFFFFFFF)


def sorted_join_expand(hs_a, ps_a, nk_a, hs_b, ps_b, nk_b, m_cap: int,
                       packed: bool = True):
    """(p1 [B,M], p2 [B,M], total [B]) for B pairs of sorted k-mer tables.

    hs_* [B, W*] hash-sorted tables, ps_* co-sorted positions, nk_* [B] valid
    counts.  W_a and W_b may differ (K-class mixing).  ``packed`` uses a
    fused single 32-bit sort key — valid only for hashes < 2^31 (k <= 15).
    """
    b, wa = hs_a.shape
    wb = hs_b.shape[1]
    w = wa + wb

    cols_a = jax.lax.broadcasted_iota(jnp.int32, (b, wa), 1)
    cols_b = jax.lax.broadcasted_iota(jnp.int32, (b, wb), 1)
    va = cols_a < nk_a[:, None]
    vb = cols_b < nk_b[:, None]
    # pads: hash PAD + pos -1 (a real k=16 hash CAN equal PAD — the pos>=0
    # test keeps it, unlike count-clamping approaches)
    ha = jnp.where(va, hs_a, PAD_HASH)
    hb = jnp.where(vb, hs_b, PAD_HASH)
    pos_cat = jnp.concatenate([jnp.where(va, ps_a, -1),
                               jnp.where(vb, ps_b, -1)], axis=1)
    if packed:
        # pack (hash, side) into one 32-bit key (requires hash < 2^31, i.e.
        # k <= 15; PAD clamps to the top and still sorts last).  Within-run
        # order is irrelevant — the final (p1, p2) sort normalizes emission
        # order — so one sort operand less.
        key = jnp.concatenate([
            jnp.minimum(ha, jnp.uint32(0x7FFFFFFE)) << 1,
            (jnp.minimum(hb, jnp.uint32(0x7FFFFFFE)) << 1) | jnp.uint32(1),
        ], axis=1)
        key, pos = jax.lax.sort_key_val(key, pos_cat, dimension=1)
        h = key >> 1
        side = (key & 1).astype(jnp.int32)
    else:
        h = jnp.concatenate([ha, hb], axis=1)
        side = jnp.concatenate([jnp.zeros((b, wa), jnp.int32),
                                jnp.ones((b, wb), jnp.int32)], axis=1)
        h, side, pos = jax.lax.sort((h, side, pos_cat), dimension=1,
                                    num_keys=2)
    valid = pos >= 0

    is_a = (side == 0) & valid
    is_b = (side == 1) & valid
    boundary = jnp.concatenate(
        [jnp.ones((b, 1), bool), h[:, 1:] != h[:, :-1]], axis=1)
    boundary_next = jnp.concatenate(
        [h[:, 1:] != h[:, :-1], jnp.ones((b, 1), bool)], axis=1)
    a_incl = jnp.cumsum(is_a, axis=1, dtype=jnp.int32)
    a_excl = a_incl - is_a
    # value of a_excl at the current hash-run's start / a_incl at its end
    # (cummax works because the cumsums are non-decreasing)
    a_start = jax.lax.cummax(jnp.where(boundary, a_excl, -1), axis=1)
    # nearest FUTURE boundary: a_incl is non-decreasing, so reverse cumMIN
    a_end = jax.lax.cummin(jnp.where(boundary_next, a_incl, INT32_MAX),
                           axis=1, reverse=True)

    cnt_b = jnp.where(is_b, a_end - a_start, 0)
    offs = jnp.cumsum(cnt_b, axis=1, dtype=jnp.int32)        # inclusive
    total = offs[:, -1]

    # slot expansion: slot s belongs to the b-element t with
    # offs[t-1] <= s < offs[t].  Every [B, M, W] tensor below exists only
    # inside a broadcast-compare-reduce chain (XLA fuses them; nothing this
    # size is materialized), trading recompute for the gathers TPUs lack.
    slots = jnp.arange(m_cap, dtype=jnp.int32)
    offs_b = offs[:, None, :]
    slots_b = slots[None, :, None]
    offs_before = jnp.max(jnp.where(offs_b <= slots_b, offs_b, 0), axis=2)
    within = slots[None, :] - offs_before                    # [B, M]
    # is_t: first j with offs[j] > s (cnt_b > 0 there, so it is a b element)
    gt = offs_b > slots_b
    prev_le = jnp.concatenate(
        [jnp.zeros((b, 1), jnp.int32), offs[:, :-1]], axis=1)[:, None, :] \
        <= slots_b
    is_t = gt & prev_le & (cnt_b[:, None, :] > 0)
    p2 = jnp.sum(jnp.where(is_t, pos[:, None, :], 0), axis=2)
    rank = jnp.sum(jnp.where(is_t, a_start[:, None, :], 0), axis=2) + within
    # a element with a_excl == rank (unique among is_a)
    a_hit = is_a[:, None, :] & (a_excl[:, None, :] == rank[:, :, None])
    p1 = jnp.sum(jnp.where(a_hit, pos[:, None, :], 0), axis=2)

    valid_slot = slots[None, :] < jnp.minimum(total, m_cap)[:, None]
    p1s = jnp.where(valid_slot, p1, INT32_MAX)
    p2s = jnp.where(valid_slot, p2, INT32_MAX)
    p1s, p2s = jax.lax.sort((p1s, p2s), dimension=1, num_keys=2)
    p1s = jnp.where(p1s == INT32_MAX, 0, p1s)
    return p1s, p2s, total


def _bitonic_merge_2(key, val):
    """Sort a bitonic [B, W] key row (W power of two) with co-moved val.

    One bitonic MERGE network — log2(W) compare-exchange stages — instead of
    a full sort's log^2 passes; valid because the input is ascending in the
    first half and descending in the second (two pre-sorted operands)."""
    b, w = key.shape
    assert w & (w - 1) == 0, "bitonic merge needs power-of-two width"
    s = w // 2
    while s >= 1:
        k2 = key.reshape(b, w // (2 * s), 2, s)
        v2 = val.reshape(b, w // (2 * s), 2, s)
        klo, khi = k2[:, :, 0, :], k2[:, :, 1, :]
        vlo, vhi = v2[:, :, 0, :], v2[:, :, 1, :]
        swap = klo > khi
        key = jnp.stack([jnp.where(swap, khi, klo),
                         jnp.where(swap, klo, khi)], axis=2).reshape(b, w)
        val = jnp.stack([jnp.where(swap, vhi, vlo),
                         jnp.where(swap, vlo, vhi)], axis=2).reshape(b, w)
        s //= 2
    return key, val


def _merge_tables(hs_a, ps_a, nk_a, hs_b, ps_b, nk_b):
    """Merge two hash-sorted k-mer tables of EQUAL power-of-two width into
    one hash-sorted stream tagged by side.  Requires hashes < 2^31 (k <= 15)
    for the packed (hash << 1 | side) key.  Returns (h, side, pos, valid)."""
    b, wa = hs_a.shape
    wb = hs_b.shape[1]
    cols_a = jax.lax.broadcasted_iota(jnp.int32, (b, wa), 1)
    cols_b = jax.lax.broadcasted_iota(jnp.int32, (b, wb), 1)
    va = cols_a < nk_a[:, None]
    vb = cols_b < nk_b[:, None]
    ka = jnp.minimum(jnp.where(va, hs_a, PAD_HASH),
                     jnp.uint32(0x7FFFFFFE)) << 1
    kb = (jnp.minimum(jnp.where(vb, hs_b, PAD_HASH),
                      jnp.uint32(0x7FFFFFFE)) << 1) | jnp.uint32(1)
    key = jnp.concatenate([ka, kb[:, ::-1]], axis=1)
    pos = jnp.concatenate([jnp.where(va, ps_a, -1),
                           jnp.where(vb, ps_b, -1)[:, ::-1]], axis=1)
    key, pos = _bitonic_merge_2(key, pos)
    return key >> 1, (key & 1).astype(jnp.int32), pos, pos >= 0


def _segment_counts(h, side, valid):
    """Per-b-element a-run sizes over the merged stream (shared by count
    and expand paths)."""
    b = h.shape[0]
    is_a = (side == 0) & valid
    is_b = (side == 1) & valid
    boundary = jnp.concatenate(
        [jnp.ones((b, 1), bool), h[:, 1:] != h[:, :-1]], axis=1)
    boundary_next = jnp.concatenate(
        [h[:, 1:] != h[:, :-1], jnp.ones((b, 1), bool)], axis=1)
    a_incl = jnp.cumsum(is_a, axis=1, dtype=jnp.int32)
    a_excl = a_incl - is_a
    a_start = jax.lax.cummax(jnp.where(boundary, a_excl, -1), axis=1)
    a_end = jax.lax.cummin(jnp.where(boundary_next, a_incl, INT32_MAX),
                           axis=1, reverse=True)
    cnt_b = jnp.where(is_b, a_end - a_start, 0)
    return is_a, a_excl, a_start, cnt_b


def merge_join_counts(hs_a, ps_a, nk_a, hs_b, ps_b, nk_b):
    """join_counts via the bitonic merge (k <= 15, equal pow2 widths)."""
    h, side, pos, valid = _merge_tables(hs_a, ps_a, nk_a, hs_b, ps_b, nk_b)
    _ia, _ae, _as, cnt_b = _segment_counts(h, side, valid)
    return jnp.sum(cnt_b, axis=1, dtype=jnp.int32)


def merge_join_expand(hs_a, ps_a, nk_a, hs_b, ps_b, nk_b, m_cap: int):
    """sorted_join_expand via the bitonic merge + binary-searched slot
    expansion.  Scatter-free: TPU scatters with [B, W]-sized sources
    serialize (~50 ms per call measured on v5e) while [B, M] gathers
    vectorize (<1 ms), so the slot -> b-element mapping is a searchsorted
    over the match-count cumsum and p1 comes straight from the hash-sorted
    a-table (``ps_a[:, r]`` IS the r-th valid a element in hash order;
    within-run permutations cannot change the emitted match set because a
    hash run's cross product is order-free and the final (p1, p2) sort
    normalizes emission order).

    Contract identical to sorted_join_expand for pairs that FIT m_cap:
    matches compacted to the front in (pos1, pos2) order, p2 padded with
    INT32_MAX -> zeroed p1, TRUE total returned.  On overflow (total >
    m_cap) the kept subset is a valid but tie-order-dependent selection
    (the bitonic network reorders equal-hash runs) — callers must treat
    overflow as undecided, which the count-first routing in cluster/bulk
    guarantees (overflow pairs go to the exact host scorer)."""
    b, wa = hs_a.shape
    h, side, pos, valid = _merge_tables(hs_a, ps_a, nk_a, hs_b, ps_b, nk_b)
    _is_a, _a_excl, a_start, cnt_b = _segment_counts(h, side, valid)

    offs = jnp.cumsum(cnt_b, axis=1, dtype=jnp.int32)         # inclusive
    starts = offs - cnt_b
    total = offs[:, -1]

    # 1. compact contributing b elements (cnt > 0) to the front, ordered by
    #    start slot (strictly increasing), carrying (pos_b, a_start)
    key_c = jnp.where(cnt_b > 0, jnp.minimum(starts, m_cap), INT32_MAX)
    key_c, pos_c, ast_c = jax.lax.sort((key_c, pos, a_start), dimension=1,
                                       num_keys=1)
    key_r = jax.lax.slice(key_c, (0, 0), (b, m_cap))          # start slots
    pos_r = jax.lax.slice(pos_c, (0, 0), (b, m_cap))
    ast_r = jax.lax.slice(ast_c, (0, 0), (b, m_cap))

    # 2. distribute records onto slots: interleave record markers (their
    #    start slot as key) with the slot iota, sort, forward-fill the
    #    latest record index/start with cummax (both are non-decreasing
    #    along the sorted stream), then pull the slot entries back out
    iota_m = jnp.broadcast_to(jnp.arange(m_cap, dtype=jnp.int32)[None, :],
                              (b, m_cap))
    keys2 = jnp.concatenate([key_r, iota_m], axis=1)
    tags2 = jnp.concatenate([jnp.zeros((b, m_cap), jnp.int32),
                             jnp.ones((b, m_cap), jnp.int32)], axis=1)
    pay2 = jnp.concatenate([iota_m, jnp.full((b, m_cap), -1, jnp.int32)],
                           axis=1)
    keys2, tags2, pay2 = jax.lax.sort((keys2, tags2, pay2), dimension=1,
                                      num_keys=2)
    fill_r = jax.lax.cummax(jnp.where(tags2 == 0, pay2, -1), axis=1)
    fill_st = jax.lax.cummax(jnp.where(tags2 == 0, keys2, -1), axis=1)
    key_out = jnp.where(tags2 == 1, keys2, INT32_MAX)
    _k, r_of, st_of = jax.lax.sort((key_out, fill_r, fill_st), dimension=1,
                                   num_keys=1)
    r_of = jax.lax.slice(r_of, (0, 0), (b, m_cap))            # record index
    st_of = jax.lax.slice(st_of, (0, 0), (b, m_cap))          # record start

    # 3. per-slot values via two tiny [B, M] gathers + one a-table gather
    rc = jnp.clip(r_of, 0, m_cap - 1)
    p2 = jnp.take_along_axis(pos_r, rc, axis=1)
    a_start_s = jnp.take_along_axis(ast_r, rc, axis=1)
    within = iota_m - st_of
    rank = a_start_s + within
    p1 = jnp.take_along_axis(ps_a, jnp.clip(rank, 0, wa - 1), axis=1)

    valid_slot = (iota_m < jnp.minimum(total, m_cap)[:, None]) & (r_of >= 0)
    p1s = jnp.where(valid_slot, p1, INT32_MAX)
    p2s = jnp.where(valid_slot, p2, INT32_MAX)
    p1s, p2s = jax.lax.sort((p1s, p2s), dimension=1, num_keys=2)
    p1s = jnp.where(p1s == INT32_MAX, 0, p1s)
    return p1s, p2s, total


def join_counts(hs_a, nk_a, hs_b, nk_b):
    """Total match count per pair, without expansion (cheap pass)."""
    b, wa = hs_a.shape
    wb = hs_b.shape[1]
    cols_a = jax.lax.broadcasted_iota(jnp.int32, (b, wa), 1)
    cols_b = jax.lax.broadcasted_iota(jnp.int32, (b, wb), 1)
    va = cols_a < nk_a[:, None]
    vb = cols_b < nk_b[:, None]
    h = jnp.concatenate([jnp.where(va, hs_a, PAD_HASH),
                         jnp.where(vb, hs_b, PAD_HASH)], axis=1)
    side = jnp.concatenate([jnp.where(va, 0, 2),
                            jnp.where(vb, 1, 2)], axis=1)
    h, side = jax.lax.sort((h, side), dimension=1, num_keys=2)
    is_a = side == 0
    is_b = side == 1
    boundary = jnp.concatenate(
        [jnp.ones((b, 1), bool), h[:, 1:] != h[:, :-1]], axis=1)
    boundary_next = jnp.concatenate(
        [h[:, 1:] != h[:, :-1], jnp.ones((b, 1), bool)], axis=1)
    a_incl = jnp.cumsum(is_a, axis=1, dtype=jnp.int32)
    a_excl = a_incl - is_a
    a_start = jax.lax.cummax(jnp.where(boundary, a_excl, -1), axis=1)
    a_end = jax.lax.cummin(jnp.where(boundary_next, a_incl, INT32_MAX),
                           axis=1, reverse=True)
    return jnp.sum(jnp.where(is_b, a_end - a_start, 0), axis=1,
                   dtype=jnp.int32)
