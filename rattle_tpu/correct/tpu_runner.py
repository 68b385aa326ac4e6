"""Batched pack runner: drives many POA graphs through the device kernel in
lockstep (the TPU production path for the correct stage).

Lane b holds pack b's growing graph; at step t every lane aligns its t-th
read in ONE device call (ops/poa_device.poa_align_batch), then the host
threads the alignments into the graphs and re-ranks them.  Packs whose graph
outgrows the lane capacity fall back to the NumPy oracle aligner for their
remaining reads — results are identical by construction (the kernel matches
the oracle exactly; tests/test_poa_device.py).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

import jax.numpy as jnp

from ..config import CorrectParams
from ..io.fastx import Read, sort_read_set
from ..ops import poa
from ..ops.poa_device import alignment_to_host, poa_align_batch
from .consensus import correct_read_pack, fix_msa_ends, generate_consensus_vector

PMAX = 8          # predecessor cap per node; overflow -> oracle fallback
LANES = 8         # minimum packs in flight per device call
MAX_LANES = 128
# device-memory budget for the H/E/F DP arrays (bytes); lanes per group are
# sized to fill it — small packs (the common case) run 64-128 wide.
# Real program HBM runs ~1.5x this figure (the packed traceback is a 4th
# array the same size as H/E/F, plus ~10% tile padding and loop
# double-buffer temps), so keep a wide margin below the 15.75 G v5e HBM.
HBM_BUDGET = int(1.0 * 2**30)
RANK_CAP = 32767  # packed traceback stores rank+1 in 16 bits


def _round_pow2(x: int, lo: int) -> int:
    p = lo
    while p < x:
        p *= 2
    return p


def _lanes_for(n_cap: int, l_cap: int) -> int:
    """Memory-budgeted lane count (pow2 for compile reuse)."""
    from ..ops.poa_device import SMALL_L
    cell = 2 if l_cap <= SMALL_L else 4
    per_lane = 3 * (n_cap + 1) * (l_cap + 1) * cell \
        + n_cap * PMAX * 4 + (n_cap + l_cap) * 4
    lanes = max(1, HBM_BUDGET // max(per_lane, 1))
    p = 1
    while p * 2 <= lanes:
        p *= 2
    return max(LANES, min(MAX_LANES, p))


class _LaneState:
    """One pack's graph; native C++ graph when available, Python otherwise."""

    def __init__(self, seqs: List[str], n_cap: int, l_cap: int):
        from .. import native
        self.native = native.available()
        self.graph = native.NativePoaGraph() if self.native else poa.POAGraph()
        self.seqs = seqs
        self.next_read = 0
        self.n_cap = n_cap
        self.l_cap = l_cap
        self.fallback = False
        self.rank_nodes: List[int] = []
        # lazily sized: the host-fallback path passes huge caps and never
        # needs these device staging arrays
        self.pred_arr: np.ndarray = None  # type: ignore
        self.letter_arr: np.ndarray = None  # type: ignore

    def n_nodes(self) -> int:
        return self.graph.n_nodes()

    def add_alignment(self, aln, seq: str) -> None:
        if self.native:
            self.graph.add_alignment(aln, seq)
        else:
            poa.add_alignment(self.graph, aln, seq)
        self.next_read += 1

    def align_fallback(self, seq: str, params: poa.POAParams):
        if self.native:
            if self.graph.n_nodes() == 0:
                return []
            return self.graph.align_local(seq, params)
        return poa.align_local(self.graph, seq, params)

    def msa(self) -> List[str]:
        return self.graph.msa()

    def refresh_rank(self) -> bool:
        """Rebuild rank-space arrays; returns False if capacity exceeded."""
        g = self.graph
        if g.n_nodes() > self.n_cap:
            return False
        if self.native:
            out = g.rank_arrays(self.n_cap, PMAX)
            if out is None:
                return False
            self.letter_arr, self.pred_arr, self.rank_nodes = out
            return True
        if self.pred_arr is None:
            self.pred_arr = np.full((self.n_cap, PMAX), -1, dtype=np.int32)
            self.letter_arr = np.zeros(self.n_cap, dtype=np.uint8)
        _, order = g.topo_groups()
        self.rank_nodes = [nid for members in order for nid in members]
        rank_of = {nid: r for r, nid in enumerate(self.rank_nodes)}
        self.pred_arr.fill(-1)
        self.letter_arr.fill(0)
        for r, nid in enumerate(self.rank_nodes):
            self.letter_arr[r] = ord(g.letters[nid])
            ins = g.in_edges[nid]
            if not ins:
                self.pred_arr[r, 0] = 0
            else:
                if len(ins) > PMAX:
                    return False
                for k, a in enumerate(ins):
                    self.pred_arr[r, k] = rank_of[a] + 1
        return True


# device-vs-host share of the last batched_msa calls (bench reporting):
# packs/alignments/bases counted where they actually ran; fb_* split the
# fallbacks by cause (pack_engine.PackEngine.stats)
LAST_STATS = {"device_packs": 0, "fallback_packs": 0,
              "device_bases": 0, "host_bases": 0,
              "fb_length": 0, "fb_reads": 0, "fb_node_cap": 0,
              "fb_pred_cap": 0, "fb_group_cap": 0}


_PACK_ENGINE = None


def _host_msa(seqs: List[str], params: poa.POAParams) -> List[str]:
    st = _LaneState(seqs, n_cap=1 << 30, l_cap=1 << 30)
    for s in seqs:
        st.add_alignment(st.align_fallback(s, params), s)
    return st.msa()


def batched_msa(all_seqs: List[List[str]], params: poa.POAParams,
                lanes: int = 0) -> List[List[str]]:
    """MSA for many packs on the device pack engine (correct/pack_engine.py:
    the whole per-pack read loop runs on device, one dispatch per read
    step).  Set RATTLE_POA_BACKEND=native to run the native C++ aligner on
    the host instead (identical semantics), or RATTLE_POA_BACKEND=lockstep
    for the round-3 per-step-upload runner (kept for comparison)."""
    import os
    backend = os.environ.get("RATTLE_POA_BACKEND")
    if backend == "native":
        return [_host_msa(seqs, params) for seqs in all_seqs]
    if backend != "lockstep":
        from .pack_engine import PackEngine
        global _PACK_ENGINE
        if _PACK_ENGINE is None:
            _PACK_ENGINE = PackEngine()
        eng = _PACK_ENGINE
        results = eng.msa_many(
            all_seqs, match=params.match, mismatch=params.mismatch,
            go=params.gap_open, ge=params.gap_extend,
            host_fn=lambda seqs: _host_msa(seqs, params))
        for i, r in enumerate(results):
            if r is None:  # only if host_fn was somehow skipped
                results[i] = _host_msa(all_seqs[i], params)
        LAST_STATS.update({k: eng.stats[k] for k in LAST_STATS
                           if k in eng.stats})
        return results
    results: List[List[str]] = [None] * len(all_seqs)  # type: ignore

    # order packs by size so lanes in a group have similar shapes
    order = sorted(range(len(all_seqs)),
                   key=lambda i: max((len(s) for s in all_seqs[i]), default=0))
    queue = list(order)

    while queue:
        lmax0 = max((len(s) for s in all_seqs[queue[0]]), default=1)
        l_cap = _round_pow2(lmax0 + 1, 128)
        n_lanes = lanes or _lanes_for(
            _round_pow2(min(4 * lmax0 + 64, 3 * l_cap), 256), l_cap)
        # the group's LARGEST pack sets the array shapes, but n_lanes above
        # was sized from its smallest (queue is sorted ascending) — shrink
        # until the real caps fit the budget, or a 128-lane group straddling
        # a size boundary compiles to several times the intended memory
        while True:
            group = queue[:n_lanes]
            lmax = max(max((len(s) for s in all_seqs[i]), default=1)
                       for i in group)
            l_cap = _round_pow2(lmax + 1, 128)
            n_cap = _round_pow2(min(4 * lmax + 64, 3 * l_cap), 256)
            if lanes or n_lanes <= LANES \
                    or _lanes_for(n_cap, l_cap) >= n_lanes:
                break
            n_lanes //= 2
        queue = queue[n_lanes:]
        states = [_LaneState(all_seqs[i], n_cap, l_cap) for i in group]
        if n_cap > RANK_CAP:
            # packed traceback can't address these ranks; host-align the
            # whole group (reads this long overflowed lane caps before too)
            for st in states:
                st.fallback = True
            n_cap = 0
        max_reads = max(len(s.seqs) for s in states)

        for t in range(max_reads):
            if n_cap == 0:
                break
            active = []
            for li, st in enumerate(states):
                if st.fallback or st.next_read >= len(st.seqs):
                    continue
                if not st.refresh_rank():
                    st.fallback = True
                    continue
                active.append(li)
            if not active:
                continue

            b = len(group)
            letters = np.zeros((b, n_cap), dtype=np.uint8)
            preds = np.full((b, n_cap, PMAX), -1, dtype=np.int16)
            n_nodes = np.zeros(b, dtype=np.int32)
            seq_arr = np.zeros((b, l_cap), dtype=np.uint8)
            seq_len = np.zeros(b, dtype=np.int32)
            for li in active:
                st = states[li]
                letters[li] = st.letter_arr
                preds[li] = st.pred_arr
                n_nodes[li] = st.n_nodes()
                s = st.seqs[st.next_read]
                raw = np.frombuffer(s.encode("ascii"), dtype=np.uint8)
                seq_arr[li, : len(raw)] = raw
                seq_len[li] = len(raw)

            res = poa_align_batch(
                jnp.asarray(letters), jnp.asarray(preds), jnp.asarray(n_nodes),
                jnp.asarray(seq_arr), jnp.asarray(seq_len),
                match=params.match, mismatch=params.mismatch,
                go=params.gap_open, ge=params.gap_extend)
            res = type(res)(*[np.asarray(x) for x in res])

            for li in active:
                st = states[li]
                s = st.seqs[st.next_read]
                aln = alignment_to_host(res, li, st.rank_nodes, len(s))
                st.add_alignment(aln, s)

        for li, st in zip(group, states):
            if st.fallback:
                LAST_STATS["fallback_packs"] += 1
                n_dev = st.next_read
                while st.next_read < len(st.seqs):
                    s = st.seqs[st.next_read]
                    st.add_alignment(st.align_fallback(s, params), s)
                LAST_STATS["host_bases"] += sum(
                    len(s) for s in st.seqs[n_dev:])
                LAST_STATS["device_bases"] += sum(
                    len(s) for s in st.seqs[:n_dev])
            else:
                LAST_STATS["device_packs"] += 1
                LAST_STATS["device_bases"] += sum(len(s) for s in st.seqs)
            results[li] = st.msa()
    return results


def _batch_msa(all_seqs: List[List[str]], p: CorrectParams):
    """Device-batched MSAs for the driver's final-consensus pass."""
    params = poa.POAParams(p.poa_match, p.poa_mismatch, p.poa_gap_open,
                           p.poa_gap_extend)
    return batched_msa(all_seqs, params)


def tpu_pack_runner(packs, p: CorrectParams, msa_fn):
    """pack_runner hook for correct_reads: two-round correction with
    device-batched MSAs across packs."""
    params = poa.POAParams(p.poa_match, p.poa_mismatch, p.poa_gap_open,
                           p.poa_gap_extend)

    msas = batched_msa([[r.seq for r in pk.reads] for pk in packs], params)
    round2_inputs: List[Tuple[List[Read], List[Read]]] = []
    for pk, msa in zip(packs, msas):
        fix_msa_ends(pk.reads, msa)
        corrected, uncorrected, _cv = correct_read_pack(
            pk.reads, msa, p.min_occ, p.gap_occ, p.err_ratio)
        second = [Read(r.header, r.seq, r.ann, r.quality) for r in corrected]
        sort_read_set(second)
        round2_inputs.append((corrected, uncorrected, second))

    msas2 = batched_msa([[r.seq for r in second]
                         for _, _, second in round2_inputs], params)
    outcomes = []
    for (corrected, uncorrected, second), msa2 in zip(round2_inputs, msas2):
        fix_msa_ends(second, msa2)
        cv = generate_consensus_vector(second, msa2)
        outcomes.append((corrected, uncorrected, cv.consensus_string()))
    return outcomes


tpu_pack_runner.batch_msa = _batch_msa
