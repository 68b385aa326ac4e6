"""TPU-batched greedy clustering driver.

Restructures the reference's inherently sequential greedy loop
(cluster.cpp:124-166) into device-sized batches while preserving EXACT
semantics.  The key observation: the pair decision ``cluster_together(i, j)``
is a pure function of the two reads (no clustering state), so the greedy
outcome is fully determined by the pairwise decision values.  We therefore:

1. pick the next S unclustered seeds speculatively (some may be absorbed by
   an earlier seed in the same batch — their columns are simply discarded),
2. compute all seed x pool decisions in batched device calls
   (bitvector gate -> match-count bucketing -> join+LIS scoring),
3. replay the reference's sequential absorption on the host with bitmaps.

The same machinery drives the representative-vs-representative merge rounds
(cluster.cpp:171-256).  Exactness escapes: pairs whose match list overflows
the largest device bucket, or whose f32 variance lands inside a borderline
band around t_v, are re-scored exactly on the host with the NumPy oracle.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import ClusterParams, bv_threshold_schedule
from ..io.hpsio import Cluster, CSeq
from ..ops import gates
from ..ops.encode import encode_seq
from ..ops.fused import fused_decide_single, unpack_bits
from .. import native
from ..ops.similarity import bv_gate, pair_match_counts, score_pairs
from ..ops.sketch import SketchTables, build_sketch_tables
from . import oracle

# match-count bucket -> pair-batch chunk size (pairs padded to the chunk)
M_BUCKETS: Tuple[Tuple[int, int], ...] = ((256, 1024), (2048, 128))
SEED_BATCH = 64
VAR_BAND_REL = 0.02
MC_CHUNK = 8192        # pairs per match-count device call
K_SMALL = 1152         # small k-mer-table bucket (most nanopore reads fit)

# fused-kernel configs: (tiers, gate budget, count chunk); scaled down when
# the pool itself is smaller than the production budgets
# single-tier fused configs: (m_cap, budget, chunk).  Chunks stay <= 8192
# rows (larger gathered [rows, K] chunks faulted the TPU runtime); pairs with
# more than m_cap matches are rescored by the exact native host scorer.
_FUSED_SMALL = (512, 131072, 4096)
_FUSED_LARGE = (512, 32768, 4096)


def _scaled_fused_config(base, pool_pad: int, seed_batch: int):
    m_cap, budget, chunk = base
    cap = _pad_pow2(pool_pad * seed_batch, 64)
    budget = min(budget, cap)
    chunk = min(chunk, budget)
    return m_cap, budget, chunk


def _pad_pow2(n: int, lo: int = 64) -> int:
    p = lo
    while p < n:
        p *= 2
    return p


class TpuClusterEngine:
    """Clusters one read set; drop-in ``engine`` for pipeline.run_cluster."""

    def __init__(self, seqs: Sequence[str], params: ClusterParams):
        self.seqs = list(seqs)
        self.p = params
        self.n = len(seqs)
        self.read_lens = [len(s) for s in seqs]
        self.tables: SketchTables = build_sketch_tables(
            self.seqs, params.kmer_size, not params.is_rna)
        t = self.tables
        self.d_hbp = jnp.asarray(t.hbp)
        self.d_hs = jnp.asarray(t.hs)
        self.d_ps = jnp.asarray(t.ps)
        self.d_nk = jnp.asarray(t.nk)
        self.d_lens = jnp.asarray(t.lens)
        self.d_bvp = jnp.asarray(t.bvp)
        self.d_bvc = jnp.asarray(t.bvc)
        if not params.is_rna:
            self.d_rev_hs = jnp.asarray(t.rev_hs)
            self.d_rev_ps = jnp.asarray(t.rev_ps)
            self.d_rev_bvp = jnp.asarray(t.rev_bvp)
        self.score_min = gates.min_numerator_table(
            max(self.read_lens), params.t_s)
        self._bv_tables: Dict[float, jnp.ndarray] = {}
        self._oracle_kmers: Dict[int, oracle.ReadKmers] = {}
        self.n_oracle_fallbacks = 0
        # small-K table slices: most reads are short, so most pair batches
        # can gather from a narrow table (4x less HBM traffic)
        self.ksmall = min(K_SMALL, t.kmax)
        if t.kmax > self.ksmall:
            self.d_hbp_s = self.d_hbp[:, : self.ksmall]
            self.d_hs_s = self.d_hs[:, : self.ksmall]
            self.d_ps_s = self.d_ps[:, : self.ksmall]
            if not params.is_rna:
                self.d_rev_hs_s = self.d_rev_hs[:, : self.ksmall]
                self.d_rev_ps_s = self.d_rev_ps[:, : self.ksmall]
        else:
            self.d_hbp_s, self.d_hs_s, self.d_ps_s = self.d_hbp, self.d_hs, self.d_ps
            if not params.is_rna:
                self.d_rev_hs_s, self.d_rev_ps_s = self.d_rev_hs, self.d_rev_ps
        self.nk_host = t.nk
        self.pool_pad = _pad_pow2(self.n, 256)

    # ---------- exact host fallback ----------

    def _okm(self, i: int) -> oracle.ReadKmers:
        km = self._oracle_kmers.get(i)
        if km is None:
            km = oracle.extract_kmers(
                encode_seq(self.seqs[i]), self.p.kmer_size, not self.p.is_rna)
            self._oracle_kmers[i] = km
        return km

    def _oracle_decide(self, i: int, j: int, threshold: float) -> Tuple[bool, bool]:
        class _KmProxy:
            def __init__(self, outer):
                self.outer = outer

            def __getitem__(self, idx):
                return self.outer._okm(idx)

        self.n_oracle_fallbacks += 1
        res = oracle.cluster_together(
            self.read_lens, _KmProxy(self), i, j, self.p, threshold)
        if res is None:
            return False, False
        return True, res.rev

    # ---------- device phases ----------

    def _bv_table(self, threshold: float) -> jnp.ndarray:
        tab = self._bv_tables.get(threshold)
        if tab is None:
            tab = jnp.asarray(gates.min_numerator_table(4096, threshold))
            self._bv_tables[threshold] = tab
        return tab

    def _gate(self, pool: np.ndarray, seeds: np.ndarray, threshold: float):
        """Returns (fwd_pass [P,S], rev_pass [P,S] or None) as host bools.

        Orientation: seed is read ``i`` of cluster_together, pool entries are
        ``j`` — the forward gate ANDs fwd(i) with fwd(j), the reverse gate
        ANDs fwd(i) with rev(j) (cluster.cpp:13-14)."""
        tab = self._bv_table(threshold)
        np_, ns = len(pool), len(seeds)
        # single padded pool shape for the whole run: one bv_gate compile
        ppad = self.pool_pad
        spad = SEED_BATCH
        pool_p = np.zeros(ppad, np.int32)
        pool_p[:np_] = pool
        seeds_p = np.zeros(spad, np.int32)
        seeds_p[:ns] = seeds
        d_pool = jnp.asarray(pool_p)
        d_seeds = jnp.asarray(seeds_p)
        bvp_pool = jnp.take(self.d_bvp, d_pool, axis=0)
        bvc_pool = jnp.take(self.d_bvc, d_pool, axis=0)
        bvp_seeds = jnp.take(self.d_bvp, d_seeds, axis=0)
        bvc_seeds = jnp.take(self.d_bvc, d_seeds, axis=0)
        fwd, _ = bv_gate(bvp_pool, bvc_pool, bvp_seeds, bvc_seeds, tab)
        fwd = np.asarray(fwd)[:np_, :ns]
        rev = None
        if not self.p.is_rna:
            rev_bvp_pool = jnp.take(self.d_rev_bvp, d_pool, axis=0)
            r, _ = bv_gate(rev_bvp_pool, bvc_pool, bvp_seeds, bvc_seeds, tab)
            rev = np.asarray(r)[:np_, :ns]
        return fwd, rev

    def _tables_for(self, small: bool):
        if small:
            return (self.d_hbp_s, self.d_hs_s, self.d_ps_s,
                    getattr(self, "d_rev_hs_s", None),
                    getattr(self, "d_rev_ps_s", None))
        return (self.d_hbp, self.d_hs, self.d_ps,
                getattr(self, "d_rev_hs", None), getattr(self, "d_rev_ps", None))

    def _score_batch(self, a_ids: np.ndarray, b_ids: np.ndarray,
                     b_rev: np.ndarray) -> Dict[str, np.ndarray]:
        """Join+LIS scores for pairs (a=seed read, b=candidate read).

        Returns bases/hc/var/n_dist/overflow arrays aligned with the input.
        Pairs are split into a small-K and a full-K size class so the common
        case gathers narrow tables."""
        nb = len(a_ids)
        out = {
            "bases": np.zeros(nb, np.int32),
            "hc": np.zeros(nb, np.int32),
            "var": np.zeros(nb, np.float32),
            "n_dist": np.zeros(nb, np.int32),
            "overflow": np.zeros(nb, bool),
        }
        if nb == 0:
            return out
        small_mask = np.maximum(self.nk_host[a_ids], self.nk_host[b_ids]) <= self.ksmall
        for small in (True, False):
            cls = np.nonzero(small_mask == small)[0]
            if len(cls):
                self._score_class(a_ids[cls], b_ids[cls], b_rev[cls], cls,
                                  small, out)
        return out

    def _score_class(self, a_ids, b_ids, b_rev, out_idx, small: bool, out):
        d_hbp, d_hs, d_ps, d_rev_hs, d_rev_ps = self._tables_for(small)
        nb = len(a_ids)

        def gather_b(ids, rev_mask):
            ids = jnp.asarray(ids)
            if self.p.is_rna or not rev_mask.any():
                return jnp.take(d_hs, ids, axis=0), jnp.take(d_ps, ids, axis=0)
            rm = jnp.asarray(rev_mask)[:, None]
            hs = jnp.where(rm, jnp.take(d_rev_hs, ids, axis=0),
                           jnp.take(d_hs, ids, axis=0))
            ps = jnp.where(rm, jnp.take(d_rev_ps, ids, axis=0),
                           jnp.take(d_ps, ids, axis=0))
            return hs, ps

        # pass 1: match counts for bucketing (chunked)
        counts = np.zeros(nb, np.int32)
        for start in range(0, nb, MC_CHUNK):
            n_here = min(MC_CHUNK, nb - start)
            bpad = MC_CHUNK  # single shape per K-class
            a_pad = np.zeros(bpad, np.int32)
            b_pad = np.zeros(bpad, np.int32)
            r_pad = np.zeros(bpad, bool)
            sl = slice(start, start + n_here)
            a_pad[:n_here], b_pad[:n_here], r_pad[:n_here] = \
                a_ids[sl], b_ids[sl], b_rev[sl]
            hbp_a = jnp.take(d_hbp, jnp.asarray(a_pad), axis=0)
            nk_a = jnp.take(self.d_nk, jnp.asarray(a_pad), axis=0)
            hs_b, _ = gather_b(b_pad, r_pad)
            nk_b = jnp.take(self.d_nk, jnp.asarray(b_pad), axis=0)
            counts[sl] = np.asarray(
                pair_match_counts(hbp_a, nk_a, hs_b, nk_b))[:n_here]

        # pass 2: bucketed scoring; zero-match pairs stay at bases == 0
        max_m = M_BUCKETS[-1][0]
        out["overflow"][out_idx] = counts > max_m
        lower = 0
        for m_cap, chunk in M_BUCKETS:
            sel = np.nonzero((counts > lower) & (counts <= m_cap))[0]
            lower = m_cap
            for start in range(0, len(sel), chunk):
                idx = sel[start:start + chunk]
                a_c = np.zeros(chunk, np.int32)
                b_c = np.zeros(chunk, np.int32)
                r_c = np.zeros(chunk, bool)
                a_c[: len(idx)] = a_ids[idx]
                b_c[: len(idx)] = b_ids[idx]
                r_c[: len(idx)] = b_rev[idx]
                hbp_a = jnp.take(d_hbp, jnp.asarray(a_c), axis=0)
                nk_a = jnp.take(self.d_nk, jnp.asarray(a_c), axis=0)
                hs_b, ps_b = gather_b(b_c, r_c)
                nk_b = jnp.take(self.d_nk, jnp.asarray(b_c), axis=0)
                bases, hc, var, n_dist, _tot = score_pairs(
                    hbp_a, nk_a, hs_b, ps_b, nk_b, m_cap, self.p.kmer_size,
                    self.p.hc_max_dist)
                gi = out_idx[idx]
                out["bases"][gi] = np.asarray(bases)[: len(idx)]
                out["hc"][gi] = np.asarray(hc)[: len(idx)]
                out["var"][gi] = np.asarray(var)[: len(idx)]
                out["n_dist"][gi] = np.asarray(n_dist)[: len(idx)]

    # ---------- decision assembly (fused path) ----------

    def _fused_strand(self, pool_p: np.ndarray, n_pool: int,
                      seeds_p: np.ndarray, n_seeds: int, threshold: float,
                      rev: bool):
        """One strand's fused decisions over the padded pool x seed grid.

        Returns (win [P,S] bool, host [P,S] bool, overflowed bool)."""
        bv_tab = self._bv_table(threshold)
        if not hasattr(self, "_sc_tab_dev"):
            self._sc_tab_dev = jnp.asarray(self.score_min)
        var_band = np.float32(VAR_BAND_REL * max(self.p.t_v, 1.0))
        ppad, spad = len(pool_p), len(seeds_p)
        win = np.zeros((ppad, spad), bool)
        host = np.zeros((ppad, spad), bool)
        overflowed = False
        d_pool = jnp.asarray(pool_p)
        d_seeds = jnp.asarray(seeds_p)
        classes = [(True, _scaled_fused_config(_FUSED_SMALL, ppad, spad))]
        if self.tables.kmax > self.ksmall:
            classes.append(
                (False, _scaled_fused_config(_FUSED_LARGE, ppad, spad)))
        for small, (m_cap, budget, chunk) in classes:
            if small:
                hbp_a = self.d_hbp_s
                hs_b = self.d_rev_hs_s if rev else self.d_hs_s
                ps_b = self.d_rev_ps_s if rev else self.d_ps_s
            else:
                hbp_a = self.d_hbp
                hs_b = self.d_rev_hs if rev else self.d_hs
                ps_b = self.d_rev_ps if rev else self.d_ps
            bvp_b = self.d_rev_bvp if rev else self.d_bvp
            res = fused_decide_single(
                d_pool, jnp.int32(n_pool), d_seeds, jnp.int32(n_seeds),
                hbp_a, hs_b, ps_b, self.d_nk, self.d_lens,
                self.d_bvp, bvp_b, self.d_bvc,
                bv_tab, self._sc_tab_dev, jnp.float32(self.p.t_v),
                jnp.float32(var_band), jnp.int32(self.ksmall),
                m_cap=m_cap, budget=budget, chunk=chunk,
                kmer_size=self.p.kmer_size, hc_max_dist=self.p.hc_max_dist,
                small_side=small)
            if int(res.n_gated) > budget:
                overflowed = True
            win |= unpack_bits(res.win_packed, spad)
            host |= unpack_bits(res.host_packed, spad)
        return win, host, overflowed

    def _decide_pairs(self, seeds: np.ndarray, pool: np.ndarray,
                      threshold: float,
                      seed_reads: Optional[np.ndarray] = None,
                      pool_reads: Optional[np.ndarray] = None):
        """Decision matrix [P, S]: 0 = no, 1 = forward match, 2 = reverse.

        ``seeds``/``pool`` are the greedy-order ids (read ids in the seeding
        phase, cluster ids in merge rounds); ``*_reads`` map them to the read
        ids actually scored (cluster representatives in merge rounds)."""
        if seed_reads is None:
            seed_reads = seeds
        if pool_reads is None:
            pool_reads = pool
        if self.p.use_hc:
            raise NotImplementedError("use_hc is not reachable from the CLI")
        np_, ns = len(pool), len(seeds)

        pool_p = np.zeros(self.pool_pad, np.int32)
        pool_p[:np_] = pool_reads
        seeds_p = np.zeros(SEED_BATCH, np.int32)
        seeds_p[:ns] = seed_reads

        win_f, host_f, ovf = self._fused_strand(pool_p, np_, seeds_p, ns,
                                                threshold, rev=False)
        if not self.p.is_rna:
            win_r, host_r, ovr = self._fused_strand(pool_p, np_, seeds_p, ns,
                                                    threshold, rev=True)
            ovf = ovf or ovr
        if ovf:
            # compaction-budget overflow: split the seed batch and retry
            if ns == 1:
                raise RuntimeError("fused budget overflow with a single seed")
            half = ns // 2
            d1 = self._decide_pairs(seeds[:half], pool, threshold,
                                    seed_reads[:half], pool_reads)
            d2 = self._decide_pairs(seeds[half:], pool, threshold,
                                    seed_reads[half:], pool_reads)
            return np.hstack([d1, d2])

        win_f = win_f[:np_, :ns]
        host_f = host_f[:np_, :ns]
        self._host_rescore(win_f, host_f, seed_reads, pool_reads, rev=False)
        decision = np.where(win_f, np.int8(1), np.int8(0))

        if not self.p.is_rna:
            win_r = win_r[:np_, :ns]
            host_r = host_r[:np_, :ns]
            host_r &= decision == 0
            self._host_rescore(win_r, host_r, seed_reads, pool_reads, rev=True)
            decision = np.where((decision == 0) & win_r, np.int8(2), decision)
        return decision

    def _host_rescore(self, win, host, seed_reads, pool_reads, rev: bool):
        """Exact f64 rescoring of host-flagged pairs, batched through the
        native scorer (falls back to the Python oracle without it)."""
        pi, si = np.nonzero(host)
        if len(pi) == 0:
            return
        a_ids = np.asarray(seed_reads)[si]
        b_ids = np.asarray(pool_reads)[pi]
        out = None
        if native.available():
            out = native.score_pairs_native(
                self.tables, a_ids, b_ids, np.full(len(pi), rev, bool),
                self.p.kmer_size, self.p.hc_max_dist)
        if out is None:
            for k in range(len(pi)):
                ok, _ = self._oracle_exact_one(int(a_ids[k]), int(b_ids[k]),
                                               0.0, rev=rev)
                win[pi[k], si[k]] = ok
            return
        self.n_oracle_fallbacks += len(pi)
        lens = np.asarray(self.read_lens, dtype=np.int64)
        mn = np.minimum(lens[a_ids], lens[b_ids]).astype(np.float64)
        metric = out["hc"] if self.p.use_hc else out["bases"]
        norm_ok = metric.astype(np.float64) / mn >= self.p.t_s
        with np.errstate(invalid="ignore"):
            var_ok = out["var"] < self.p.t_v
        win[pi, si] = norm_ok & var_ok

    def _oracle_exact_one(self, a: int, b: int, threshold: float, rev: bool):
        """Exact scalar re-evaluation of one strand of one pair."""
        ka, kb = self._okm(a), self._okm(b)
        if rev:
            m1, m2 = oracle.common_kmers(ka.hashes, ka.positions,
                                         kb.rev_hashes, kb.rev_positions)
        else:
            m1, m2 = oracle.common_kmers(ka.hashes, ka.positions,
                                         kb.hashes, kb.positions)
        self.n_oracle_fallbacks += 1
        sim = oracle.calc_similarity(m1, m2, self.p.kmer_size, self.p.hc_max_dist)
        mn = float(min(self.read_lens[a], self.read_lens[b]))
        metric = sim.hc_bases if self.p.use_hc else sim.bases
        from ..utils.varmath import var as exact_var
        ok = (metric / mn >= self.p.t_s) and (exact_var(sim.distances) < self.p.t_v)
        return ok, rev

    # ---------- greedy phases ----------

    def _greedy(self, order: np.ndarray, threshold: float,
                seed_reads_of: Optional[np.ndarray] = None):
        """Generic greedy sweep over ``order`` (ascending ids).  Returns the
        list of (seed_id, [(member_id, rev), ...]) in seed order."""
        n = len(order)
        already = np.zeros(n, bool)
        groups: List[Tuple[int, List[Tuple[int, bool]]]] = []
        reads_of = seed_reads_of if seed_reads_of is not None else order

        pos = 0
        while pos < n:
            seed_positions = []
            q = pos
            while q < n and len(seed_positions) < SEED_BATCH:
                if not already[q]:
                    seed_positions.append(q)
                q += 1
            if not seed_positions:
                break
            seed_positions = np.array(seed_positions)
            pool_positions = np.nonzero(~already)[0]
            pool_positions = pool_positions[pool_positions > seed_positions[0]]
            if len(pool_positions) == 0:
                for sp in seed_positions:
                    if not already[sp]:
                        already[sp] = True
                        groups.append((int(order[sp]), [(int(order[sp]), False)]))
                pos = q
                continue

            decision = self._decide_pairs(
                order[seed_positions], order[pool_positions], threshold,
                seed_reads=reads_of[seed_positions],
                pool_reads=reads_of[pool_positions])

            for col, sp in enumerate(seed_positions):
                if already[sp]:
                    continue  # absorbed by an earlier seed in this batch
                already[sp] = True
                members = [(int(order[sp]), False)]
                dcol = decision[:, col]
                for row, pp in enumerate(pool_positions):
                    if already[pp] or pp <= sp:
                        continue
                    if dcol[row]:
                        already[pp] = True
                        members.append((int(order[pp]), dcol[row] == 2))
                groups.append((int(order[sp]), members))
            pos = q
            while pos < n and already[pos]:
                pos += 1
        return groups

    def cluster(self) -> List[Cluster]:
        p = self.p
        order = np.arange(self.n)

        # --- greedy seeding (cluster.cpp:124-166) ---
        groups = self._greedy(order, p.bv_threshold)
        clusters: List[Cluster] = []
        for _seed, members in groups:
            cseqs = [CSeq(m, r) for m, r in members]
            main = oracle.get_main_seq(cseqs, self.read_lens, p.repr_percentile)
            clusters.append(Cluster(main, cseqs))

        # --- merge rounds (cluster.cpp:171-256) ---
        for threshold in bv_threshold_schedule(p):
            nc = len(clusters)
            cluster_ids = np.arange(nc)
            reps = np.array([c.main_seq.seq_id for c in clusters])
            merge_groups = self._greedy(cluster_ids, threshold,
                                        seed_reads_of=reps)
            tmp: List[Cluster] = []
            for _seed_cid, members in merge_groups:
                original_rev = members[0][1]  # always False
                merged = Cluster(CSeq(-1, False), [])
                for cid, rev in members:
                    flip = rev != original_rev
                    for s in clusters[cid].seqs:
                        merged.seqs.append(
                            CSeq(s.seq_id, (not s.rev) if flip else s.rev, s.gene_id))
                merged.main_seq = oracle.get_main_seq(
                    merged.seqs, self.read_lens, p.repr_percentile)
                tmp.append(merged)
            clusters = tmp
        return clusters


ORACLE_CUTOVER = 48  # below this many reads the NumPy oracle is faster


def cluster_reads_tpu(seqs: Sequence[str], params: ClusterParams) -> List[Cluster]:
    """Engine entry point for pipeline.run_cluster."""
    if len(seqs) < ORACLE_CUTOVER:
        return oracle.cluster_reads(seqs, params)
    return TpuClusterEngine(seqs, params).cluster()
