"""Multi-device clustering driver.

Runs the exact greedy/merge semantics of the single-chip driver, but computes
each seed-batch decision matrix with the shard_map'd step from
parallel/mesh.py: sketch tables live sharded across the mesh's data axis,
seed rows are replicated, every device gates+scores its pool shard fully
on-device, and the host replays the sequential greedy sweep on the gathered
decision matrix.  Exactness matches the oracle: pairs flagged by the device
(match-list overflow, compaction-budget overflow, or borderline variance) are
re-scored on the host in float64.

Scaling knobs: seeds per step S and per-shard pair budget are chosen so the
final threshold-0.0 merge round (where every pair passes the bitvector gate,
cluster.cpp:249-255) cannot overflow the compaction budget.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ClusterParams, bv_threshold_schedule
from ..io.hpsio import Cluster, CSeq
from ..ops import gates
from ..ops.sketch import build_sketch_tables
from ..parallel.mesh import build_sharded_decide, make_mesh
from . import oracle
from .driver import VAR_BAND_REL, TpuClusterEngine

DIST_SEEDS = 8
DIST_M_CAP = 2048


class DistributedClusterEngine(TpuClusterEngine):
    """Same greedy replay as TpuClusterEngine; decisions from a device mesh.

    Inherits the oracle fallbacks and the host sweep; overrides the decision
    matrix computation."""

    def __init__(self, seqs: Sequence[str], params: ClusterParams,
                 mesh: Optional[Mesh] = None):
        if params.use_hc:
            raise NotImplementedError("use_hc is never reachable from the CLI")
        self.mesh = mesh or make_mesh()
        self.n_devices = self.mesh.devices.size
        super().__init__(seqs, params)

        # pad reads axis to a multiple of the mesh size and shard the tables
        n = self.n
        self.n_pad = (n + self.n_devices - 1) // self.n_devices * self.n_devices
        axis = self.mesh.axis_names[0]
        shard = NamedSharding(self.mesh, P(axis))
        self.repl = NamedSharding(self.mesh, P())

        def pad_shard(arr: np.ndarray):
            pad = [(0, self.n_pad - n)] + [(0, 0)] * (arr.ndim - 1)
            return jax.device_put(jnp.asarray(np.pad(np.asarray(arr), pad)), shard)

        t = self.tables
        self.s_hbp = pad_shard(t.hbp)
        self.s_hs = pad_shard(t.hs)
        self.s_ps = pad_shard(t.ps)
        self.s_nk = pad_shard(t.nk)
        self.s_lens = pad_shard(t.lens)
        self.s_bvp = pad_shard(t.bvp)
        self.s_bvc = pad_shard(t.bvc)
        if not params.is_rna:
            self.s_rev_hs = pad_shard(t.rev_hs)
            self.s_rev_ps = pad_shard(t.rev_ps)
            self.s_rev_bvp = pad_shard(t.rev_bvp)

        budget = (self.n_pad // self.n_devices) * DIST_SEEDS
        self._decide_fn = build_sharded_decide(
            self.mesh, m_cap=DIST_M_CAP, budget=budget,
            kmer_size=params.kmer_size, hc_max_dist=params.hc_max_dist,
            var_band=VAR_BAND_REL * max(params.t_v, 1.0))
        self._seed_cache = {}

    def _seed_rows(self, seed_reads: np.ndarray):
        t = self.tables
        s = np.zeros(DIST_SEEDS, np.int32)
        s[: len(seed_reads)] = seed_reads
        dev = lambda a: jax.device_put(jnp.asarray(a), self.repl)  # noqa: E731
        return [dev(x[s]) for x in (t.hbp, t.hs, t.ps, t.nk, t.lens, t.bvp, t.bvc)]

    def _full_decision(self, seed_reads: np.ndarray, threshold: float,
                       rev: bool) -> tuple:
        """[n_pad, S] (win, needs_host) over the full read axis."""
        if rev:
            pool = (self.s_hbp, self.s_rev_hs, self.s_rev_ps, self.s_nk,
                    self.s_lens, self.s_rev_bvp, self.s_bvc)
        else:
            pool = (self.s_hbp, self.s_hs, self.s_ps, self.s_nk, self.s_lens,
                    self.s_bvp, self.s_bvc)
        seeds = self._seed_rows(seed_reads)
        bv_tab = jax.device_put(jnp.asarray(
            gates.min_numerator_table(4096, threshold)), self.repl)
        sc_tab = jax.device_put(jnp.asarray(self.score_min), self.repl)
        decision, _bases, _var, needs_host = self._decide_fn(
            *pool, *seeds, bv_tab, sc_tab, jnp.float32(self.p.t_v))
        return np.asarray(decision), np.asarray(needs_host)

    def _decide_pairs(self, seeds: np.ndarray, pool: np.ndarray,
                      threshold: float,
                      seed_reads: Optional[np.ndarray] = None,
                      pool_reads: Optional[np.ndarray] = None):
        if seed_reads is None:
            seed_reads = seeds
        if pool_reads is None:
            pool_reads = pool
        ns = len(seeds)
        decision = np.zeros((len(pool), ns), np.int8)
        for s0 in range(0, ns, DIST_SEEDS):
            chunk = seed_reads[s0:s0 + DIST_SEEDS]
            win_f, host_f = self._full_decision(chunk, threshold, rev=False)
            win = win_f[pool_reads][:, : len(chunk)].astype(np.int8)
            host = host_f[pool_reads][:, : len(chunk)]
            if not self.p.is_rna:
                win_r, host_r = self._full_decision(chunk, threshold, rev=True)
                wr = win_r[pool_reads][:, : len(chunk)]
                hr = host_r[pool_reads][:, : len(chunk)]
                win = np.where(win > 0, 1, np.where(wr > 0, 2, 0)).astype(np.int8)
                host = host | hr
            for pi, si in zip(*np.nonzero(host)):
                a = int(chunk[si])
                b = int(pool_reads[pi])
                ok, is_rev = self._oracle_decide(a, b, threshold)
                win[pi, si] = 0 if not ok else (2 if is_rev else 1)
            decision[:, s0:s0 + len(chunk)] = win
        return decision


def cluster_reads_distributed(seqs: Sequence[str], params: ClusterParams,
                              mesh: Optional[Mesh] = None) -> List[Cluster]:
    if len(seqs) < 8:
        return oracle.cluster_reads(seqs, params)
    return DistributedClusterEngine(seqs, params, mesh).cluster()
