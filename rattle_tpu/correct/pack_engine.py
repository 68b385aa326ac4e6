"""Device-resident POA pack engine: the whole per-pack read loop runs on
device, one dispatch per read step, with NO graph state crossing the
host-device boundary until the final MSA download.

Round-3's runner (correct/tpu_runner.py) re-uploaded every pack's full
predecessor table every read step and re-ranked on the host — ~0.24 s of
transfer + dispatch per step, ~1,500 s extrapolated for the toyset.  Here
the graph lives on device in node-id space and every step is:

    rank-space meta build (gathers)  ->  pallas DP+traceback kernel
      ->  vectorized alignment threading (scatters; all conflict-free)
      ->  incremental re-rank (key assignment + one stable argsort)

The threading vectorizes because one read's path touches each group at
most once (ranks strictly increase along the path and groups are
rank-consecutive), so letter lookups, group joins, edge inserts and member
appends are independent scatters.  The incremental group order is the
``RATTLE_POA_TOPO=incr`` semantics of ops/poa.py: every run of brand-new
groups sorts immediately before the next placed group on the path (key =
next_placed_pos * SK + run_index), runs with no later placed target go at
the end.

Lanes that overflow capacity (nodes > N, predecessors > PMAX=16, group
> 8 members, reads longer than W-1) fall back to the host native aligner
for the whole pack — identical semantics by construction (round-4 data:
41 of 45 toyset fallbacks were PMAX=8 overflows, hence 16).

Reference behavior: correct.cpp:377-478 (spoa keeps graphs in-core; this
is the TPU equivalent).
"""

from __future__ import annotations

import functools
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.poa_pallas import META_W, PMAX, poa_align_pallas

GA = 8                     # aligned-group member cap (distinct letters)
BIG = np.int32(2**30)
# key stride for the incremental re-rank.  run_idx is clipped to HALF-1 =
# SK-2, so for the W=4096 config the last two nodes of a maximal-length run
# share a key; the stable argsort then orders them by node id, which equals
# path order for nodes created left-to-right in one read — so the collision
# resolves to the correct order by construction (ADVICE r4).
SK = 4096
HALF = SK - 1
# (max read len + 1, graph node cap, lane cap) per column-width config;
# the kernel streams DP rows through HBM so n_cap is an HBM budget, not a
# VMEM one
CONFIGS = ((1024, 4096, 64), (2048, 8192, 16), (4096, 16384, 8))


def _cfg_for(lmax: int, n_reads: int, total: int):
    """(w, n_cap, r_cap, tot_cap) buckets; None if the pack cannot run
    on device (read too long, or more reads than the largest r_cap)."""
    if n_reads > 256:
        return None  # r_cap tops out at 256; larger packs host-align
    for w, n_cap, _lanes in CONFIGS:
        if lmax <= w - 2:
            break
    else:
        return None
    r_cap = 32 if n_reads <= 32 else 256
    # two tot buckets per (w, r_cap): every distinct shape costs a ~30 s
    # remote compile in this environment, so the bucket space stays tiny
    small = r_cap * w // 8
    tot_cap = small if total + r_cap <= small else r_cap * w
    return (w, n_cap, r_cap, tot_cap)


def _pow2_at_least(x: int, lo: int) -> int:
    p = lo
    while p < x:
        p *= 2
    return p


def _take(arr, idx):
    """take_along_axis over axis 1 with arbitrary trailing idx dims."""
    b = arr.shape[0]
    flat = jnp.take_along_axis(
        arr, idx.reshape(b, -1).astype(jnp.int32), axis=1)
    return flat.reshape(idx.shape)


@functools.partial(jax.jit, static_argnames=("n_cap", "r_cap", "tot_cap"))
def _init_state(seqs, lens, n_reads, n_cap, r_cap, tot_cap):
    b = seqs.shape[0]
    n = n_cap
    offsets = jnp.concatenate(
        [jnp.zeros((b, 1), jnp.int32),
         jnp.cumsum(lens, axis=1, dtype=jnp.int32)[:, :-1]], axis=1)
    return dict(
        seqs=seqs, lens=lens, n_reads=n_reads, offsets=offsets,
        letters=jnp.zeros((b, n), jnp.int32),
        npred=jnp.zeros((b, n), jnp.int32),
        preds=jnp.full((b, n, PMAX), -1, jnp.int32),
        n_nodes=jnp.zeros((b,), jnp.int32),
        grp_leader=jnp.zeros((b, n), jnp.int32),
        member_idx=jnp.zeros((b, n), jnp.int32),
        grp_size=jnp.zeros((b, n), jnp.int32),
        members=jnp.full((b, n, GA), -1, jnp.int32),
        grp_pos=jnp.zeros((b, n), jnp.int32),
        n_groups=jnp.zeros((b,), jnp.int32),
        node_rank=jnp.zeros((b, n), jnp.int32),
        perm=jnp.zeros((b, n), jnp.int32),
        path=jnp.zeros((b, tot_cap), jnp.int32),
        # 0 = ok; else cause bitmask: 1 node-cap, 2 pred-cap, 4 group-cap
        fallback=jnp.zeros((b,), jnp.int32),
    )


@functools.partial(jax.jit, donate_argnums=(0,),
                   static_argnames=("w_eff", "match", "mismatch", "go",
                                    "ge"))
def _step(st, t, w_eff=None, match=5, mismatch=-4, go=-8, ge=-6):
    seqs, lens = st["seqs"], st["lens"]
    letters, npred, preds = st["letters"], st["npred"], st["preds"]
    n_nodes = st["n_nodes"]
    grp_leader, member_idx = st["grp_leader"], st["member_idx"]
    grp_size, members, grp_pos = st["grp_size"], st["members"], st["grp_pos"]
    n_groups, node_rank, perm = st["n_groups"], st["node_rank"], st["perm"]
    path, fallback = st["path"], st["fallback"]

    b, n = letters.shape
    # effective column count for THIS step: the DP row cost is ~linear in
    # w, and pack reads arrive length-descending (the global length sort
    # orders cluster members), so later steps run at narrower widths —
    # measured 2x step-cost reduction on the toyset pack population
    w = seqs.shape[2] if w_eff is None else w_eff
    bidx = jnp.arange(b, dtype=jnp.int32)[:, None]
    iota_n = jnp.arange(n, dtype=jnp.int32)[None, :]
    iota_w = jnp.arange(w, dtype=jnp.int32)[None, :]

    active = (t < st["n_reads"]) & (fallback == 0)
    seq = jax.lax.dynamic_index_in_dim(seqs, t, axis=1, keepdims=False)
    seq = seq[:, :w].astype(jnp.int32)                # [B, W] char at p
    slen = jax.lax.dynamic_index_in_dim(lens, t, axis=1, keepdims=False)

    # ---- rank-space meta for the kernel: ONE stable multi-payload sort
    # (node_rank is the permutation key) carries letters/npred/pred lanes
    # into rank order; pred lanes stay NODE ids (+1, 0 = virtual start) and
    # the kernel translates node->rank through a VMEM rank table.  The old
    # build's [B, N*PMAX] arbitrary gathers ran at ~0.7 us/index on this
    # TPU (44 ms/step at PMAX=16); the sort is ~2 ms. ----
    perm_c = jnp.clip(perm, 0, n - 1)
    ops = jax.lax.sort(
        [node_rank, letters, npred]
        + [preds[:, :, k] for k in range(PMAX)],
        dimension=1, num_keys=1, is_stable=True)
    meta = jnp.stack(
        [o + 1 for o in ops[3:]]
        + [ops[1], jnp.maximum(ops[2], 1)]
        + [jnp.zeros((b, n), jnp.int32)] * (META_W - PMAX - 2),
        axis=2).astype(jnp.int16)
    seq_sh = jnp.pad(seq[:, :w - 1], ((0, 0), (1, 0)))
    seq_sh = seq_sh.reshape(b, w // 128, 128)

    packed, tlen, best = poa_align_pallas(
        meta, n_nodes, seq_sh, slen, active.astype(jnp.int32), node_rank,
        match=match, mismatch=mismatch, go=go, ge=ge)
    aligned = (best > 0) & (n_nodes > 0)

    # ---- decode: per-base matched rank -> node ----
    tmax = packed.shape[1]
    iota_t = jnp.arange(tmax, dtype=jnp.int32)[None, :]
    pos = (packed & 0xFFFF) - 1
    rk = (packed >> 16) - 1
    val = (iota_t < tlen[:, None]) & (pos >= 0) & aligned[:, None]
    m_rank = jnp.full((b, w), -1, jnp.int32).at[
        bidx, jnp.where(val, pos, w)].set(rk, mode="drop")
    m_node = jnp.where(m_rank >= 0, _take(perm_c, jnp.clip(m_rank, 0, n - 1)),
                       -1)

    basevalid = iota_w < slen[:, None]
    m_letter = _take(letters, jnp.clip(m_node, 0, n - 1))
    direct = (m_node >= 0) & (m_letter == seq)
    leader = _take(grp_leader, jnp.clip(m_node, 0, n - 1))
    gsz = _take(grp_size, jnp.clip(leader, 0, n - 1))
    mem = jnp.take_along_axis(members, jnp.clip(leader, 0, n - 1)[:, :, None],
                              axis=1)
    mem_letters = _take(letters, jnp.clip(mem, 0, n - 1))
    iota_g = jnp.arange(GA, dtype=jnp.int32)[None, None, :]
    mem_ok = (iota_g < gsz[:, :, None]) & (mem_letters == seq[:, :, None]) \
        & (mem >= 0)
    has_mem = mem_ok.any(axis=2) & (m_node >= 0) & ~direct
    join_node = jnp.take_along_axis(
        mem, jnp.argmax(mem_ok, axis=2)[:, :, None], axis=2)[:, :, 0]
    matched = jnp.where(direct, m_node, jnp.where(has_mem, join_node, -1))
    isnew = basevalid & (matched < 0)
    new_cnt = jnp.cumsum(isnew, axis=1, dtype=jnp.int32)
    new_id = n_nodes[:, None] + new_cnt - 1
    target = jnp.where(isnew, new_id, matched)
    target = jnp.where(basevalid, target, -1)
    purenew = isnew & (m_node < 0)
    joiner = isnew & (m_node >= 0)

    n_new = new_cnt[:, -1]
    overflow_nodes = n_nodes + n_new > n

    ok = active & ~overflow_nodes
    wmask = basevalid & ok[:, None]

    # ---- apply threading (conflict-free scatters; OOB index N drops) ----
    t_or_n = jnp.where(wmask & isnew, target, n)
    letters = letters.at[bidx, t_or_n].set(seq, mode="drop")
    lead_new = jnp.where(purenew, target, leader)
    grp_leader = grp_leader.at[bidx, t_or_n].set(lead_new, mode="drop")
    member_idx = member_idx.at[bidx, t_or_n].set(
        jnp.where(purenew, 0, gsz), mode="drop")
    p_or_n = jnp.where(wmask & purenew, target, n)
    grp_size = grp_size.at[bidx, p_or_n].set(1, mode="drop")
    members = members.at[bidx, p_or_n, 0].set(target, mode="drop")
    j_or_n = jnp.where(wmask & joiner, leader, n)
    grp_overflow = (wmask & joiner & (gsz >= GA)).any(axis=1)
    members = members.at[bidx, j_or_n, jnp.clip(gsz, 0, GA - 1)].set(
        jnp.where(gsz < GA, target, -1), mode="drop")
    grp_size = grp_size.at[bidx, j_or_n].add(1, mode="drop")

    prevt = jnp.pad(target[:, :-1], ((0, 0), (1, 0)), constant_values=-1)
    em = wmask & (iota_w >= 1) & (prevt >= 0) & (prevt != target)
    tgt_c = jnp.clip(target, 0, n - 1)
    tpred = jnp.take_along_axis(preds, tgt_c[:, :, None], axis=1)
    npr_t = _take(npred, tgt_c)
    iota_p = jnp.arange(PMAX, dtype=jnp.int32)[None, None, :]
    exists = ((tpred == prevt[:, :, None])
              & (iota_p < npr_t[:, :, None])).any(axis=2)
    add = em & ~exists
    pred_overflow = (add & (npr_t >= PMAX)).any(axis=1)
    a_or_n = jnp.where(add, target, n)
    preds = preds.at[bidx, a_or_n, jnp.clip(npr_t, 0, PMAX - 1)].set(
        jnp.where(npr_t < PMAX, prevt, -1), mode="drop")
    npred = npred.at[bidx, a_or_n].add(1, mode="drop")

    off_t = jax.lax.dynamic_index_in_dim(st["offsets"], t, axis=1,
                                         keepdims=False)
    tot = path.shape[1]
    pidx = jnp.where(wmask, off_t[:, None] + iota_w, tot)
    path = path.at[bidx, pidx].set(target, mode="drop")

    # ---- incremental re-rank ----
    lead_all = jnp.where(purenew, target, leader)
    lead_all = jnp.where(isnew, lead_all,
                         _take(grp_leader, jnp.clip(matched, 0, n - 1)))
    placed = wmask & ~purenew
    gpos_t = _take(grp_pos, jnp.clip(lead_all, 0, n - 1))
    gmark = jnp.where(placed, gpos_t, BIG)
    gnext = jnp.flip(jax.lax.cummin(jnp.flip(gmark, axis=1), axis=1), axis=1)
    gnextf = jnp.where(gnext >= BIG, n_groups[:, None], gnext)
    lastp = jax.lax.cummax(jnp.where(placed, iota_w, -1), axis=1)
    run_idx = iota_w - lastp - 1
    key_new = gnextf * SK + jnp.clip(run_idx, 0, HALF - 1)

    n_nodes_old = n_nodes
    is_leader = (grp_leader == iota_n)
    keys = jnp.where(is_leader & (iota_n < n_nodes_old[:, None]),
                     grp_pos * SK + HALF, BIG)
    keys = keys.at[bidx, p_or_n].set(key_new, mode="drop")

    _, order, gsz_s = jax.lax.sort(
        [keys, jnp.broadcast_to(iota_n, (b, n)), grp_size],
        dimension=1, num_keys=1, is_stable=True)
    n_groups_new = jnp.where(ok, n_groups + (purenew & wmask).sum(axis=1),
                             n_groups)
    n_nodes_new = jnp.where(ok, n_nodes + jnp.where(ok, n_new, 0), n_nodes)
    live_pos = iota_n < n_groups_new[:, None]
    grp_pos = grp_pos.at[bidx, jnp.where(live_pos, order, n)].set(
        iota_n + jnp.zeros_like(order), mode="drop")
    sz_sorted = jnp.where(live_pos, gsz_s, 0)
    starts = jnp.cumsum(sz_sorted, axis=1, dtype=jnp.int32) - sz_sorted
    posn = _take(grp_pos, jnp.clip(grp_leader, 0, n - 1))
    rank_new = _take(starts, jnp.clip(posn, 0, n - 1)) + member_idx
    valid_node = iota_n < n_nodes_new[:, None]
    node_rank = jnp.where(valid_node, rank_new, n)
    perm = perm.at[bidx, jnp.where(valid_node, node_rank, n)].set(
        iota_n + jnp.zeros_like(node_rank), mode="drop")
    fallback = fallback | jnp.where(
        active,
        overflow_nodes.astype(jnp.int32)
        + (pred_overflow.astype(jnp.int32) << 1)
        + (grp_overflow.astype(jnp.int32) << 2), 0)

    st.update(letters=letters, npred=npred, preds=preds,
              n_nodes=n_nodes_new, grp_leader=grp_leader,
              member_idx=member_idx, grp_size=grp_size, members=members,
              grp_pos=grp_pos, n_groups=n_groups_new, node_rank=node_rank,
              perm=perm, path=path, fallback=fallback)
    return st


@jax.jit
def _finalize(st):
    path, grp_leader, grp_pos = st["path"], st["grp_leader"], st["grp_pos"]
    b, n = grp_leader.shape
    lead = _take(grp_leader, jnp.clip(path, 0, n - 1))
    cols = _take(grp_pos, jnp.clip(lead, 0, n - 1))
    return (cols.astype(jnp.int16), st["n_groups"], st["n_nodes"],
            st["fallback"])


class PackEngine:
    """Groups packs into lane batches and runs them through the device."""

    def __init__(self, max_lanes: int = 256):
        self.max_lanes = max_lanes
        # fb_* split fallback_packs by cause (VERDICT r4: device share must
        # be accounted truthfully, per cause)
        self.stats = {"device_packs": 0, "fallback_packs": 0,
                      "device_bases": 0, "host_bases": 0, "steps": 0,
                      "fb_length": 0, "fb_reads": 0, "fb_node_cap": 0,
                      "fb_pred_cap": 0, "fb_group_cap": 0}

    def msa_many(self, all_seqs: List[List[str]], match: int = 5,
                 mismatch: int = -4, go: int = -8, ge: int = -6,
                 host_fn=None) -> List[Optional[list]]:
        """Returns per pack: list of gap-padded MSA rows, or None when the
        pack must be handled by the host fallback.

        With ``host_fn(seqs) -> rows``, fallback packs run on a worker
        thread OVERLAPPED with the device groups (the native aligner
        releases the GIL; the device thread mostly waits on the TPU), and
        every entry comes back filled."""
        results: List[Optional[list]] = [None] * len(all_seqs)
        pool = futures = None
        if host_fn is not None:
            import os
            from concurrent.futures import ThreadPoolExecutor
            # the native aligner releases the GIL, so fallback packs run on
            # a real pool overlapped with the device groups
            pool = ThreadPoolExecutor(
                max_workers=min(32, os.cpu_count() or 1))
            futures = {}

        def to_host(i, total, cause):
            self.stats["fallback_packs"] += 1
            self.stats["host_bases"] += total
            self.stats["fb_" + cause] += 1
            if pool is not None:
                futures[i] = pool.submit(host_fn, all_seqs[i])

        jobs = []
        for i, seqs in enumerate(all_seqs):
            if not seqs:
                results[i] = []
                continue
            lmax = max(len(s) for s in seqs)
            total = sum(len(s) for s in seqs)
            cfg = _cfg_for(lmax, len(seqs), total)
            if cfg is None:
                to_host(i, total,
                        "reads" if len(seqs) > 256 else "length")
                continue
            # group by READ COUNT within a config: the lockstep group runs
            # max(n_reads) steps, so mixing a 30-read pack into a 200-read
            # group wastes 170 idle steps on its lane
            jobs.append((cfg, len(seqs), i))

        jobs.sort()
        groups = []
        cur = []
        for cfg, _nr, i in jobs:
            if cur and (cfg != cur[0][0] or len(cur) >= self._lanes(cfg)):
                groups.append(cur)
                cur = []
            cur.append((cfg, _nr, i))
        if cur:
            groups.append(cur)

        for group in groups:
            self._run_group(group, all_seqs, results,
                            (match, mismatch, go, ge), to_host)
        if pool is not None:
            import time
            t0 = time.time()
            for i, fut in futures.items():
                results[i] = fut.result()
            pool.shutdown()
            self.stats.setdefault("host_wait_s", 0.0)
            self.stats["host_wait_s"] = round(
                self.stats["host_wait_s"] + time.time() - t0, 2)
        return results

    def _lanes(self, cfg) -> int:
        w = cfg[0]
        for cw, _n, lanes in CONFIGS:
            if cw == w:
                return min(self.max_lanes, lanes)
        return 8

    def _run_group(self, group, all_seqs, results, params, to_host=None):
        import os as _os
        import sys as _sys
        import time as _time

        def mark(key, t0):
            self.stats[key] = round(self.stats.get(key, 0.0)
                                    + _time.time() - t0, 2)
            return _time.time()
        (w, n_cap, r_cap, tot_cap), _, _ = group[0]
        ids = [i for _, _, i in group]
        # lane count: pow2 just covering the group.  The kernel grid runs
        # its programs SEQUENTIALLY on the one core, so padding a 10-pack
        # group to the config's 64-lane cap paid ~6x the kernel time for
        # nothing (round-5 measurement); pow2 buckets keep the compile
        # variants bounded at log2(cap) per config
        b = min(self._lanes((w, n_cap, r_cap, tot_cap)),
                _pow2_at_least(len(ids), 8))
        debug_t0 = None
        if _os.environ.get("RATTLE_POA_DEBUG"):
            import time as _time
            debug_t0 = _time.time()
            mx = max(len(all_seqs[i]) for i in ids)
            print(f"[pack_engine] group w={w} n={n_cap} r={r_cap} "
                  f"tot={tot_cap} packs={len(ids)} max_reads={mx}",
                  file=_sys.stderr, flush=True)
        tmark = _time.time()
        seqs_arr = np.zeros((b, r_cap, w), np.int8)
        lens = np.zeros((b, r_cap), np.int32)
        n_reads = np.zeros((b,), np.int32)
        for li, i in enumerate(ids):
            for t, s in enumerate(all_seqs[i]):
                raw = np.frombuffer(s.encode("ascii"), np.uint8)
                seqs_arr[li, t, :len(raw)] = raw
                lens[li, t] = len(raw)
            n_reads[li] = len(all_seqs[i])

        tmark = mark("t_fill_s", tmark)
        st = _init_state(jnp.asarray(seqs_arr), jnp.asarray(lens),
                         jnp.asarray(n_reads), n_cap=n_cap, r_cap=r_cap,
                         tot_cap=tot_cap)
        max_reads = int(n_reads.max())
        match, mismatch, go, ge = params
        debug = bool(_os.environ.get("RATTLE_POA_DEBUG"))
        # per-step effective width: the max over lanes of lens[:, t] is
        # non-increasing in t (each lane's reads are length-descending), so
        # w_t only shrinks — at most len(CONFIGS) compile variants per group
        for t in range(max_reads):
            mx = int(lens[:, t].max())
            wt = 1024
            while mx > wt - 2:
                wt *= 2
            st = _step(st, jnp.int32(t), w_eff=min(wt, w), match=match,
                       mismatch=mismatch, go=go, ge=ge)
            if t % 32 == 31:
                # bound async dispatch depth: each step's dead DP backing
                # stores are ~1.5 GB of transient HBM
                _ = int(np.asarray(st["n_nodes"])[0])
            if debug and t % 16 == 0:
                # sync so a crash points at the guilty step
                _ = int(np.asarray(st["n_nodes"])[0])
                print(f"[pack_engine]   step {t}/{max_reads}",
                      file=_sys.stderr, flush=True)
        self.stats["steps"] += max_reads
        tmark = mark("t_steps_s", tmark)
        cols_d, n_groups_d, n_nodes_d, fb_d = _finalize(st)
        # fetch only the used path prefix: d2h runs ~20 MB/s through the
        # relay and the padded [b, tot_cap] int16 block is up to 32 MB;
        # pow2 buckets keep the slice shapes (hence transfers) bounded
        used = int(lens.sum(axis=1).max())
        tot_fetch = min(tot_cap, _pow2_at_least(max(used, 1), 1024))
        cols = np.asarray(jax.lax.slice(cols_d, (0, 0), (cols_d.shape[0],
                                                         tot_fetch)))
        n_groups, n_nodes, fb = (np.asarray(x) for x in
                                 (n_groups_d, n_nodes_d, fb_d))
        tmark = mark("t_fetch_s", tmark)
        if debug_t0 is not None:
            import time as _time
            print(f"[pack_engine]   group done in {_time.time()-debug_t0:.1f}s",
                  file=_sys.stderr, flush=True)

        for li, i in enumerate(ids):
            if fb[li]:
                cause = ("node_cap" if fb[li] & 1
                         else "pred_cap" if fb[li] & 2 else "group_cap")
                if to_host is not None:
                    to_host(i, int(lens[li].sum()), cause)
                else:
                    self.stats["fallback_packs"] += 1
                    self.stats["host_bases"] += int(lens[li].sum())
                    self.stats["fb_" + cause] += 1
                continue
            self.stats["device_packs"] += 1
            self.stats["device_bases"] += int(lens[li].sum())
            ncols = int(n_groups[li])
            rows = []
            off = 0
            for t in range(int(n_reads[li])):
                ln = int(lens[li, t])
                row = np.full(ncols, ord("-"), np.uint8)
                row[cols[li, off:off + ln]] = \
                    seqs_arr[li, t, :ln].astype(np.uint8)
                rows.append(row.tobytes().decode("ascii"))
                off += ln
            results[i] = rows
        mark("t_decode_s", tmark)
