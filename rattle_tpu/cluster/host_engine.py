"""Exact host clustering engine: NumPy bitvector gate + native C++ scoring.

A CPU twin of the TPU driver with identical results: the greedy replay is
inherited from TpuClusterEngine; only the decision matrix computation is
overridden.  All gate comparisons run in float64 (bit-identical to the
reference's doubles — no threshold tables or borderline bands needed), and
pair scores come from the native C++ scorer (tests prove it bit-equal to the
oracle, including the NaN variance quirk).

Used as the engine fallback when no accelerator is attached, and by
benchmarks as the honest CPU baseline.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from ..config import ClusterParams
from ..io.hpsio import Cluster
from ..ops.sketch import build_sketch_tables
from .. import native
from . import oracle
from .driver import TpuClusterEngine


class HostClusterEngine(TpuClusterEngine):
    """Same greedy replay; decisions on the host CPU."""

    def __init__(self, seqs: Sequence[str], params: ClusterParams):
        # deliberately skip the TPU parent __init__: no device arrays
        self.seqs = list(seqs)
        self.p = params
        self.n = len(seqs)
        self.read_lens = [len(s) for s in seqs]
        self.tables = build_sketch_tables(self.seqs, params.kmer_size,
                                          not params.is_rna)
        self.nk_host = self.tables.nk
        self._oracle_kmers = {}
        self.n_oracle_fallbacks = 0
        if not native.available():
            raise RuntimeError("native library unavailable")

        # bit-expanded f32 bitvectors: the gate popcount becomes one sgemm
        t = self.tables
        self._bits = np.unpackbits(
            t.bvp.view(np.uint8), axis=1, bitorder="little").astype(np.float32)
        if not params.is_rna:
            self._rev_bits = np.unpackbits(
                t.rev_bvp.view(np.uint8), axis=1, bitorder="little"
            ).astype(np.float32)
        self._lens_arr = np.asarray(self.read_lens, dtype=np.int64)

    def _decide_pairs(self, seeds: np.ndarray, pool: np.ndarray,
                      threshold: float,
                      seed_reads: Optional[np.ndarray] = None,
                      pool_reads: Optional[np.ndarray] = None):
        if seed_reads is None:
            seed_reads = seeds
        if pool_reads is None:
            pool_reads = pool
        t = self.tables
        p_ids = np.asarray(pool_reads, dtype=np.int64)
        s_ids = np.asarray(seed_reads, dtype=np.int64)

        common = self._bits[p_ids] @ self._bits[s_ids].T          # [P, S]
        mmax = np.maximum(t.bvc[p_ids][:, None],
                          t.bvc[s_ids][None, :]).astype(np.float64)
        fwd_gate = (threshold == 0) | (common.astype(np.float64) / mmax >= threshold)
        decision = np.zeros((len(pool), len(seeds)), np.int8)

        def strand(gate, rev: bool, exclude=None):
            pi, si = np.nonzero(gate if exclude is None else (gate & exclude))
            if len(pi) == 0:
                return
            out = native.score_pairs_native(
                t, s_ids[si], p_ids[pi], np.full(len(pi), rev, bool),
                self.p.kmer_size, self.p.hc_max_dist)
            mn = np.minimum(self._lens_arr[s_ids[si]],
                            self._lens_arr[p_ids[pi]]).astype(np.float64)
            metric = out["hc"] if self.p.use_hc else out["bases"]
            norm_ok = metric.astype(np.float64) / mn >= self.p.t_s
            with np.errstate(invalid="ignore"):
                var_ok = out["var"] < self.p.t_v  # NaN compares False
            win = norm_ok & var_ok
            decision[pi[win], si[win]] = 2 if rev else 1

        strand(fwd_gate, rev=False)
        if not self.p.is_rna:
            rev_common = self._rev_bits[p_ids] @ self._bits[s_ids].T
            rev_gate = rev_common.astype(np.float64) / mmax >= threshold
            strand(rev_gate, rev=True, exclude=decision == 0)
        return decision


def cluster_reads_host(seqs: Sequence[str], params: ClusterParams) -> List[Cluster]:
    if len(seqs) < 8 or not native.available():
        return oracle.cluster_reads(seqs, params)
    return HostClusterEngine(seqs, params).cluster()
