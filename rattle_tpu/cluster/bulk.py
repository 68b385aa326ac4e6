"""Bulk TPU clustering engine: all-pairs decisions + on-device greedy replay.

The reference's greedy loop (cluster.cpp:124-166) serializes seed-vs-candidate
scans; its pair decision is a pure function of the two reads, so the whole
outcome is determined by the pairwise win matrix.  This engine computes that
matrix in bulk, entirely on device:

  1. GATE: 6-mer bit planes contracted on the MXU — one [N, N] bf16 matmul
     equals popcount(AND) for every pair (cluster.cpp:13-19) — then the
     integer-exact threshold table and an id-order mask, compacted to a pair
     list with ``jnp.nonzero`` (device).
  2. SCORE: fixed-shape chunks gather each pair's k-mer tables and run the
     sorted-join + patience-LIS + variance gates (ops/similarity.py).  Pairs
     whose match list overflows the cap or whose f32 variance lands in a
     borderline band are flagged for exact host rescoring.
  3. REPLAY: win flags scatter into an [N, N] decision matrix and a
     ``fori_loop`` replays the reference's sequential absorption exactly
     (first winning seed claims the read; lowest index wins).  Only the
     [N] owner/strand vectors ever cross the (slow) device->host link.

The same kernels drive the representative-vs-representative merge rounds
(cluster.cpp:171-256) at the cluster level, including the final threshold-0
round (gate bypass).

Exactness escapes (host rescored in f64 like the reference): match-count
overflow beyond the last M_LADDER cap, variance within VAR_BAND_REL of t_v.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import ClusterParams, bv_threshold_schedule
from ..io.hpsio import Cluster, CSeq
from ..ops import gates
from ..ops.encode import encode_seq
from ..ops.sketch_device import DeviceSketch, build_device_sketch
from ..ops.lis_select import (anchor_filter_select, lis_build_select,
                              lis_reconstruct_select)
from ..ops.join_device import sorted_join_expand
from ..ops.similarity import _variance
from . import oracle

# K classes by pair max-nk: table slice widths (0 = full kmax).  Narrower
# classes sort less per pair; gate-passing pairs almost always have > 64
# matches, so the M ladder starts at 512 (measured: 98% of gated toyset
# pairs overflow a 64-match tier).
K_CLASSES: Tuple[int, ...] = (1152, 2304, 0)
M_LADDER: Tuple[int, ...] = (512, 4096)
# chunk sizes: LADDER_CHUNKS[class_idx][tier_idx]
LADDER_CHUNKS: Tuple[Tuple[int, int], ...] = ((4096, 256),
                                              (2048, 128),
                                              (512, 32))
GATE_BUDGET = 1 << 19
HOST_BUDGET = 1 << 13
VAR_BAND_REL = 0.02

_PROFILE = bool(__import__("os").environ.get("RATTLE_PROFILE"))


def _prof(label: str, t_start, sync_on=None):
    """Section timing (RATTLE_PROFILE=1): syncs via a scalar fetch (the only
    reliable barrier on the axon runtime) and prints the elapsed time."""
    if not _PROFILE:
        return
    import sys as _sys
    import time as _time
    if sync_on is not None:
        float(np.asarray(sync_on.reshape(-1)[0].astype(jnp.float32)))
    print(f"      [prof] {label}: {_time.time() - t_start:.3f}s",
          file=_sys.stderr, flush=True)


def _pow2_at_least(n: int, lo: int) -> int:
    p = lo
    while p < n:
        p *= 2
    return p


# --------------------------------------------------------------------------
# jitted kernels
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("budget",))
def gate_compact(plane_rows, plane_cols, bvc_rows, bvc_cols, order_rows,
                 order_cols, n_rows, n_cols, tab, cached_state, budget: int):
    """Gate matmul + threshold + (order_row < order_col) mask + compaction.

    ``cached_state`` [r, c] uint8 (0 = unscored): pairs with a cached score
    outcome are excluded from compaction (their decision is merged from the
    cache).  Returns (pr, pc, n_gated) pair slot indices.
    """
    r = plane_rows.shape[0]
    c = plane_cols.shape[0]
    common = jax.lax.dot_general(
        plane_rows.astype(jnp.bfloat16), plane_cols.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)
    mmax = jnp.maximum(bvc_rows[:, None], bvc_cols[None, :])
    passed = common >= tab[mmax]
    passed &= order_rows[:, None] < order_cols[None, :]
    ri = jax.lax.broadcasted_iota(jnp.int32, (r, c), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (r, c), 1)
    passed &= (ri < n_rows) & (ci < n_cols)
    gated_mask = passed
    passed = passed & (cached_state == 0)
    flat = passed.reshape(-1)
    n_gated = flat.sum(dtype=jnp.int32)
    idx = jnp.nonzero(flat, size=budget, fill_value=-1)[0].astype(jnp.int32)
    valid = idx >= 0
    pr = jnp.where(valid, jnp.clip(idx, 0) // c, -1)
    pc = jnp.where(valid, jnp.clip(idx, 0) % c, -1)
    return pr, pc, n_gated, gated_mask


@functools.partial(jax.jit, static_argnames=("bounds",))
def classify_pairs(pr, pc, read_ids, nk, bounds: Tuple[int, ...]):
    """Bucket the compacted pair list by pair max-nk into len(bounds)+1
    K classes (bounds ascending; last class unbounded).

    Returns a tuple of (idx [budget], count) per class; idx compacted to
    the front (fill -1)."""
    budget = pr.shape[0]
    valid = pr >= 0
    a_ids = jnp.take(read_ids, jnp.clip(pr, 0))
    b_ids = jnp.take(read_ids, jnp.clip(pc, 0))
    pair_nk = jnp.maximum(jnp.take(nk, a_ids), jnp.take(nk, b_ids))
    out = []
    lo = 0
    for i, hi in enumerate(list(bounds) + [None]):
        in_cls = valid & (pair_nk > lo)
        if hi is not None:
            in_cls &= pair_nk <= hi
            lo = hi
        idx = jnp.nonzero(in_cls, size=budget, fill_value=-1)[0] \
            .astype(jnp.int32)
        out.append((idx, in_cls.sum(dtype=jnp.int32)))
    return tuple(out)


@functools.partial(jax.jit,
                   static_argnames=("m_cap", "kmer_size", "hc_max_dist",
                                    "use_pallas"))
def score_chunk(a_ids, b_ids, act, hs_a, ps_a, nk, hs_b, ps_b, lens, sc_tab,
                t_v, var_band, m_cap: int, kmer_size: int, hc_max_dist: int,
                use_pallas: bool = False):
    """Join+LIS decision for one fixed-shape chunk of pairs.

    Both sides gather their SORTED k-mer tables (a = seed read, forward;
    b = candidate, strand-selected); the sort-merge join needs no
    position-order table.  Returns (win, needs_host) [B] bool."""
    hsa = jnp.take(hs_a, a_ids, axis=0)
    psa = jnp.take(ps_a, a_ids, axis=0)
    nk_a = jnp.take(nk, a_ids, axis=0)
    hs = jnp.take(hs_b, b_ids, axis=0)
    ps = jnp.take(ps_b, b_ids, axis=0)
    nk_b = jnp.take(nk, b_ids, axis=0)
    p1, p2, total = sorted_join_expand(hsa, psa, nk_a, hs, ps, nk_b, m_cap,
                                       packed=kmer_size <= 15)
    mvalid = jax.lax.broadcasted_iota(jnp.int32, p1.shape, 1) < \
        jnp.minimum(total, m_cap)[:, None]
    if use_pallas:
        from ..ops.pallas_kernels import lis_filter_pallas
        bases, _hc, n_dist, var = lis_filter_pallas(
            p1, p2, mvalid, kmer_size, hc_max_dist)
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
    fits = total <= m_cap
    win = score_ok & (var < t_v) & ~borderline & fits & act
    needs_host = ((~fits) | (score_ok & borderline)) & act
    return win, needs_host


@jax.jit
def scatter_decisions(w, pr, pc, win, value):
    """W[pr, pc] = max(W, value) where win (pads scatter out of bounds)."""
    n = w.shape[0]
    rr = jnp.where(win & (pr >= 0), pr, n + 1)
    return w.at[rr, jnp.clip(pc, 0)].max(value, mode="drop")


@jax.jit
def merge_cached_wins(w, gated_mask, cached_state, value):
    """Fold cached score-yes outcomes of gated pairs into the decision
    matrix (cached score-no pairs simply stay 0)."""
    hit = gated_mask & (cached_state == 2)
    return jnp.maximum(w, jnp.where(hit, value, jnp.int8(0)))


@jax.jit
def gather_cache(cache, d_read_of):
    """cache[read_of x read_of] submatrix."""
    return jnp.take(jnp.take(cache, d_read_of, axis=0), d_read_of, axis=1)


@jax.jit
def cache_scatter(cache, ra, rb, decided, win):
    """Record decided outcomes: cache[ra, rb] = 2 (win) / 1 (no)."""
    val = jnp.where(win, jnp.uint8(2), jnp.uint8(1))
    rr = jnp.where(decided & (ra >= 0), ra, cache.shape[0] + 1)
    return cache.at[rr, jnp.clip(rb, 0)].max(val, mode="drop")


@functools.partial(jax.jit, static_argnames=("budget",))
def compact_flagged(pr, pc, flag, budget: int):
    """Pair slots where flag is set, compacted to [budget] (fill -1)."""
    sel = jnp.nonzero(flag & (pr >= 0), size=budget, fill_value=-1)[0]
    v = sel >= 0
    return (jnp.where(v, jnp.take(pr, jnp.clip(sel, 0)), -1),
            jnp.where(v, jnp.take(pc, jnp.clip(sel, 0)), -1),
            (flag & (pr >= 0)).sum(dtype=jnp.int32))


@jax.jit
def greedy_owner(w, n_valid):
    """Exact replay of the reference's greedy absorption (cluster.cpp:124-166).

    ``w`` [N, N]: 0 = no, 1 = reverse win, 2 = forward win (row = earlier id).
    Returns (owner [N] int32, rev [N] bool): owner[j] = seed that absorbed j
    (or j itself), rev[j] = strand flag of the winning decision.
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

    owner0 = iota
    rev0 = jnp.zeros((n,), jnp.bool_)
    owner, rev = jax.lax.fori_loop(0, n_valid, body, (owner0, rev0))
    return owner, rev


# --------------------------------------------------------------------------
# engine
# --------------------------------------------------------------------------


class BulkClusterEngine:
    """Drop-in ``engine`` for pipeline.run_cluster; exact reference parity."""

    def __init__(self, seqs: Sequence[str], params: ClusterParams,
                 sketch: Optional[DeviceSketch] = None):
        if params.use_hc:
            # unreachable from the reference CLI (no main.cpp flag sets
            # use_hc); score_chunk gates on `bases` so mixing metrics with
            # the host's hc path would silently diverge
            raise NotImplementedError("use_hc not supported by the bulk "
                                      "engine; use the oracle engine")
        self.seqs = list(seqs)
        self.p = params
        self.n = len(seqs)
        self.read_lens = [len(s) for s in seqs]
        self.sk = sketch if sketch is not None else build_device_sketch(
            self.seqs, params.kmer_size, not params.is_rna)
        sk = self.sk
        self.n_pad = sk.hbp.shape[0]
        # per-K-class table slices (narrower sorts for shorter reads)
        self.class_bounds = []
        self._cls_tabs = []
        for w in K_CLASSES:
            wid = sk.kmax if w == 0 else min(w, sk.kmax)
            tabs = {"hs": sk.hs[:, :wid], "ps": sk.ps[:, :wid]}
            if not params.is_rna:
                tabs["rev_hs"] = sk.rev_hs[:, :wid]
                tabs["rev_ps"] = sk.rev_ps[:, :wid]
            self._cls_tabs.append(tabs)
            if w != 0 and wid < sk.kmax:
                self.class_bounds.append(wid)
        # drop duplicate classes when kmax is small
        self.n_classes = len(self.class_bounds) + 1
        self._cls_tabs = self._cls_tabs[: self.n_classes]
        self.score_min = jnp.asarray(
            gates.min_numerator_table(max(self.read_lens), params.t_s))
        self._bv_tables: Dict[float, jnp.ndarray] = {}
        self._oracle_kmers: Dict[int, oracle.ReadKmers] = {}
        self._host_cache: Dict[Tuple[int, int, bool], bool] = {}
        self.n_oracle_fallbacks = 0
        self.var_band = np.float32(VAR_BAND_REL * max(self.p.t_v, 1.0))
        # cross-round score cache: outcomes are threshold-independent and
        # directional (a = seed side); 0 unscored / 1 score-no / 2 score-yes
        self._cache = {False: jnp.zeros((self.n_pad, self.n_pad), jnp.uint8)}
        if not params.is_rna:
            self._cache[True] = jnp.zeros((self.n_pad, self.n_pad), jnp.uint8)
        self._cache_live = False
        from ..ops.pallas_kernels import supported as _pallas_ok
        self._pallas = _pallas_ok()

    # ---------- helpers ----------

    def _bv_table(self, threshold: float) -> jnp.ndarray:
        tab = self._bv_tables.get(threshold)
        if tab is None:
            tab = jnp.asarray(gates.min_numerator_table(4096, threshold))
            self._bv_tables[threshold] = tab
        return tab

    def _okm(self, i: int) -> oracle.ReadKmers:
        km = self._oracle_kmers.get(i)
        if km is None:
            km = oracle.extract_kmers(
                encode_seq(self.seqs[i]), self.p.kmer_size, not self.p.is_rna)
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
        through the native scorer on a subset sketch (falls back to the
        scalar Python oracle without the library).

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
            if native.available():
                uniq = sorted({i for _rev, a, b in todo for i in (a, b)})
                remap = {g: i for i, g in enumerate(uniq)}
                sub = build_sketch_tables([self.seqs[i] for i in uniq],
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

    # ---------- bulk decision matrix ----------

    def _score_list(self, rows, cols, n_pairs: int, d_read_of, rev: bool,
                    cls_i: int, m_cap: int, chunk: int):
        """Score direct (row, col) position pairs (fill -1) at ``m_cap``;
        returns (win, needs_host) [len] bool aligned with rows/cols."""
        budget = rows.shape[0]
        hs_a, ps_a, hs_b, ps_b = self._class_tables(cls_i, rev)
        win = jnp.zeros((budget,), jnp.bool_)
        host = jnp.zeros((budget,), jnp.bool_)
        scored = jnp.zeros((budget,), jnp.bool_)
        chunk = min(chunk, _pow2_at_least(max(n_pairs, 1), 64))
        n_chunks = -(-max(n_pairs, 1) // chunk)
        for c0 in range(n_chunks):
            r_c = jax.lax.dynamic_slice(rows, (c0 * chunk,), (chunk,))
            c_c = jax.lax.dynamic_slice(cols, (c0 * chunk,), (chunk,))
            act = r_c >= 0
            a_ids = jnp.take(d_read_of, jnp.clip(r_c, 0))
            b_ids = jnp.take(d_read_of, jnp.clip(c_c, 0))
            w_c, h_c = score_chunk(
                a_ids, b_ids, act, hs_a, ps_a, self.sk.nk, hs_b, ps_b,
                self.sk.lens, self.score_min, jnp.float32(self.p.t_v),
                jnp.float32(self.var_band), m_cap, self.p.kmer_size,
                self.p.hc_max_dist,
                use_pallas=self._pallas and m_cap <= 512 and chunk % 128 == 0)
            slot = c0 * chunk + jnp.arange(chunk)
            w_idx = jnp.where(act, slot, budget + 1)
            win = win.at[w_idx].set(w_c, mode="drop")
            host = host.at[w_idx].set(h_c, mode="drop")
            scored = scored.at[w_idx].set(True, mode="drop")
        return win, host, scored

    def _class_tables(self, cls_i: int, rev: bool):
        t = self._cls_tabs[cls_i]
        return (t["hs"], t["ps"],
                t["rev_hs"] if rev else t["hs"],
                t["rev_ps"] if rev else t["ps"])

    def _score_class(self, pr, pc, cls_idx, n_cls: int, d_read_of,
                     rev: bool, cls_i: int, m_cap: int, chunk: int):
        """Score one K-class of the compacted pairs; returns device
        (win [budget] bool, needs_host [budget] bool) aligned with pr/pc."""
        budget = pr.shape[0]
        hs_a, ps_a, hs_b, ps_b = self._class_tables(cls_i, rev)
        win = jnp.zeros((budget,), jnp.bool_)
        host = jnp.zeros((budget,), jnp.bool_)
        scored = jnp.zeros((budget,), jnp.bool_)
        chunk = min(chunk, _pow2_at_least(max(n_cls, 1), 256))
        n_chunks = -(-max(n_cls, 1) // chunk)
        for c0 in range(n_chunks):
            sel = jax.lax.dynamic_slice(cls_idx, (c0 * chunk,), (chunk,))
            act = sel >= 0
            selc = jnp.clip(sel, 0)
            a_ids = jnp.take(d_read_of, jnp.take(jnp.clip(pr, 0), selc))
            b_ids = jnp.take(d_read_of, jnp.take(jnp.clip(pc, 0), selc))
            w_c, h_c = score_chunk(
                a_ids, b_ids, act, hs_a, ps_a, self.sk.nk, hs_b, ps_b,
                self.sk.lens, self.score_min, jnp.float32(self.p.t_v),
                jnp.float32(self.var_band), m_cap, self.p.kmer_size,
                self.p.hc_max_dist,
                use_pallas=self._pallas and m_cap <= 512 and chunk % 128 == 0)
            w_idx = jnp.where(act, selc, budget + 1)  # inactive lanes drop
            win = win.at[w_idx].set(w_c, mode="drop")
            host = host.at[w_idx].set(h_c, mode="drop")
            scored = scored.at[w_idx].set(True, mode="drop")
        return win, host, scored

    def _decide_matrix(self, read_of: np.ndarray, order_pad: int,
                       threshold: float) -> jnp.ndarray:
        """Full decision matrix W [order_pad, order_pad] int8 for entries in
        greedy order (read_of maps order position -> read id)."""
        m = len(read_of)
        tab = self._bv_table(threshold)
        d_read_of = jnp.asarray(
            np.pad(read_of.astype(np.int32), (0, order_pad - m)))
        d_order = jnp.arange(order_pad, dtype=jnp.int32)
        sk = self.sk

        # the no-gather shortcut is valid ONLY when read_of is literally the
        # identity map — merge rounds pass rep ids and may still collide with
        # n_pad on order_pad (e.g. 48-256 reads pad to the same 256)
        identity = (order_pad == self.n_pad and m == self.n
                    and bool(np.array_equal(read_of, np.arange(m))))
        plane_rows = sk.plane if identity \
            else jnp.take(sk.plane, d_read_of, axis=0)
        bvc_rows = sk.bvc if identity else jnp.take(sk.bvc, d_read_of)

        w = jnp.zeros((order_pad, order_pad), jnp.int8)
        strands = [False] if self.p.is_rna else [False, True]
        host_jobs = []
        for rev in strands:
            if rev:
                plane_cols = sk.rev_plane if identity \
                    else jnp.take(sk.rev_plane, d_read_of, axis=0)
            else:
                plane_cols = plane_rows
            import time as _time
            _t = _time.time()
            cache = self._cache[rev]
            if self._cache_live:
                cached_sub = gather_cache(cache, d_read_of)
            else:
                cached_sub = jnp.zeros((order_pad, order_pad), jnp.uint8)
            budget = min(GATE_BUDGET,
                         _pow2_at_least(order_pad * order_pad, 1024))
            while True:
                pr, pc, n_gated, gated_mask = gate_compact(
                    plane_rows, plane_cols, bvc_rows, bvc_rows, d_order,
                    d_order, jnp.int32(m), jnp.int32(m), tab, cached_sub,
                    budget)
                ng = int(n_gated)
                if ng <= budget:
                    break
                budget = _pow2_at_least(ng, budget * 2)
            val0 = jnp.int8(1 if rev else 2)
            if self._cache_live:
                w = merge_cached_wins(w, gated_mask, cached_sub, val0)
            _prof(f"gate m={m} ng={ng}", _t, pr)
            _t = _time.time()
            classes = classify_pairs(pr, pc, d_read_of, sk.nk,
                                     tuple(self.class_bounds))
            val = jnp.int8(1 if rev else 2)
            _prof("classify", _t)
            for cls_i in range(self.n_classes):
                _t = _time.time()
                cls_idx, n_cls = classes[cls_i]
                n_cls = int(n_cls)
                if n_cls == 0:
                    continue
                win, host, scored = self._score_class(
                    pr, pc, cls_idx, n_cls, d_read_of, rev, cls_i,
                    M_LADDER[0], LADDER_CHUNKS[cls_i][0])
                w = scatter_decisions(w, pr, pc, win, val)
                ra = jnp.take(d_read_of, jnp.clip(pr, 0))
                rb = jnp.take(d_read_of, jnp.clip(pc, 0))
                cache = cache_scatter(cache, jnp.where(pr >= 0, ra, -1), rb,
                                      scored & ~host, win)

                # escalate overflow/borderline pairs up the M ladder
                cur_rows, cur_cols, flagged = pr, pc, host
                exhausted = True
                for t_i, m_cap in enumerate(M_LADDER[1:], start=1):
                    hb = HOST_BUDGET
                    while True:
                        tr, tc, n_t = compact_flagged(cur_rows, cur_cols,
                                                      flagged, hb)
                        n_ti = int(n_t)
                        if n_ti <= hb:
                            break
                        hb = _pow2_at_least(n_ti, hb * 2)
                    if n_ti == 0:
                        exhausted = False
                        break
                    win_t, host_t, scored_t = self._score_list(
                        tr, tc, n_ti, d_read_of, rev, cls_i, m_cap,
                        LADDER_CHUNKS[cls_i][t_i])
                    w = scatter_decisions(w, tr, tc, win_t, val)
                    ra_t = jnp.take(d_read_of, jnp.clip(tr, 0))
                    rb_t = jnp.take(d_read_of, jnp.clip(tc, 0))
                    cache = cache_scatter(cache,
                                          jnp.where(tr >= 0, ra_t, -1), rb_t,
                                          scored_t & ~host_t, win_t)
                    cur_rows, cur_cols, flagged = tr, tc, host_t
                if exhausted:
                    host_jobs.append((rev, cur_rows, cur_cols, flagged))
                _prof(f"class{cls_i} n={n_cls}", _t, w)
            self._cache[rev] = cache

        # exact host rescoring of the still-flagged pairs (f64, batched
        # through the native scorer like the reference's math)
        patches: List[Tuple[int, int, int]] = []
        batch: List[Tuple[bool, int, int, int, int]] = []
        for rev, pr, pc, host in host_jobs:
            hb = HOST_BUDGET
            while True:
                hr, hc_, n_h = compact_flagged(pr, pc, host, hb)
                n_hi = int(n_h)
                if n_hi <= hb:
                    break
                hb = _pow2_at_least(n_hi, hb * 2)
            if n_hi == 0:
                continue
            hr = np.asarray(hr)[:n_hi]
            hc_ = np.asarray(hc_)[:n_hi]
            for r_, c_ in zip(hr, hc_):
                batch.append((rev, int(read_of[r_]), int(read_of[c_]),
                              int(r_), int(c_)))
        _t = __import__("time").time()
        _prof("cacheflush", _t, self._cache[strands[-1]])
        _t = __import__("time").time()
        cache_upd: Dict[bool, List[Tuple[int, int, bool]]] = {}
        for rev, a, b, r_, c_, ok in self._host_rescore_batch(batch):
            cache_upd.setdefault(rev, []).append((a, b, ok))
            if ok:
                patches.append((r_, c_, 1 if rev else 2))
        for rev, upd in cache_upd.items():
            arr = np.array([(a, b) for a, b, _ok in upd], dtype=np.int32)
            oks = np.array([ok for _a, _b, ok in upd], dtype=bool)
            self._cache[rev] = cache_scatter(
                self._cache[rev], jnp.asarray(arr[:, 0]),
                jnp.asarray(arr[:, 1]), jnp.ones(len(arr), bool),
                jnp.asarray(oks))
        if patches:
            arr = np.array(patches, dtype=np.int32)
            w = scatter_decisions(w, jnp.asarray(arr[:, 0]),
                                  jnp.asarray(arr[:, 1]),
                                  jnp.ones((len(arr),), jnp.bool_),
                                  jnp.asarray(arr[:, 2], jnp.int8))
        _prof("hostpatch", _t, w)
        self._cache_live = True
        return w

    def _greedy_groups(self, read_of: np.ndarray, threshold: float):
        """Decision matrix + on-device replay; returns the group list
        [(seed_pos, [(member_pos, rev), ...])] in seed order."""
        m = len(read_of)
        order_pad = _pow2_at_least(m, 256) if m != self.n_pad else self.n_pad
        if m == self.n:
            order_pad = self.n_pad
        w = self._decide_matrix(read_of, order_pad, threshold)
        owner, rev = greedy_owner(w, jnp.int32(m))
        owner = np.asarray(owner)[:m]
        rev = np.asarray(rev)[:m]
        groups: Dict[int, List[Tuple[int, bool]]] = {}
        for pos in range(m):
            o = int(owner[pos])
            groups.setdefault(o, []).append((pos, bool(rev[pos])))
        return [(seed, groups[seed]) for seed in sorted(groups)]

    # ---------- public API ----------

    def cluster(self) -> List[Cluster]:
        p = self.p
        order = np.arange(self.n)

        groups = self._greedy_groups(order, p.bv_threshold)
        clusters: List[Cluster] = []
        for _seed, members in groups:
            cseqs = [CSeq(m_, r_) for m_, r_ in members]
            main = oracle.get_main_seq(cseqs, self.read_lens,
                                       p.repr_percentile)
            clusters.append(Cluster(main, cseqs))

        for threshold in bv_threshold_schedule(p):
            reps = np.array([c.main_seq.seq_id for c in clusters])
            merge_groups = self._greedy_groups(reps, threshold)
            tmp: List[Cluster] = []
            for seed_cid, members in merge_groups:
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
        return clusters


ORACLE_CUTOVER = 48


def cluster_reads_bulk(seqs: Sequence[str],
                       params: ClusterParams) -> List[Cluster]:
    """Engine entry point for pipeline.run_cluster."""
    if len(seqs) < ORACLE_CUTOVER:
        return oracle.cluster_reads(seqs, params)
    return BulkClusterEngine(seqs, params).cluster()
