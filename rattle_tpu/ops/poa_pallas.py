"""Pallas POA kernel: graph-vs-read affine local DP + traceback on TPU,
with HBM-streamed DP state so read length and graph size are bounded by
HBM, not VMEM.

Replaces the XLA scan/while version (ops/poa_device.py): the scan paid
~75us per graph rank in dispatch/fusion overhead; here the whole DP +
traceback runs inside one program at VPU rate.  Semantics are identical to
the host oracle ``ops/poa.align_local`` (same recurrences, first-maximum
tie-break, diagonal > F > E traceback with predecessors in insertion
order, extend-before-open gap tie-breaks); see that module for the spec
and reference citations (correct.cpp:395-405).

Memory architecture (mosaic constraints + measured costs drove it):

* A DP row of W columns is an (RS, 128) tile, RS = W/128 sublanes; dynamic
  sublane slices must be provably 8-aligned, which ``row * RS`` is.
  Dynamic lane indexing is unsupported, so in-row extraction goes through
  masked reductions.
* H/F/D rows live in VMEM ring buffers of RING=512 rows and stream to
  per-lane HBM arrays in half-ring DMA flushes.  Predecessor rows are
  read from the ring when within RING rows (99.9% of edges have rank
  distance <= 176 on the toyset), from a 2-row HBM fetch otherwise, and
  from constants for the virtual start row.  Chain ranks (single
  predecessor = previous rank, the common case) come straight from
  registers.
* The traceback reads D and the rank metadata through 64-row windows
  DMA'd from HBM on demand (the walk is mostly rank-monotonic).
* Per-rank scalars ride in ``meta`` [B, N, META_W] int16 (lanes
  0..PMAX-1 pred rank+1 with 0 = virtual start, lane PMAX letter, lane
  PMAX+1 npred>=1), windowed from HBM 64 ranks at a time.
* The row recurrence is a ~25-op dependency chain (the E prefix-max alone
  is log2(W) serial rounds); each program runs LANES_PER_PROGRAM packs
  with independent instruction streams to fill the latency-bound pipeline.
* Outputs are SMEM (scalar stores to VMEM are unsupported): only DIAGONAL
  traceback moves are emitted ((rank+1) << 16 | (pos+1), reversed order) —
  gap entries never influence threading, and this keeps the slow SMEM
  output DMA at W*4 bytes.
* dir word: bits 0-4 H-source (0 stop, 1..PMAX diagonal via pred k-1,
  PMAX+1 F, PMAX+2 E), bits 5-8 F pred index, bit 9 F-extend, bit 10
  E-extend.

The pack engine (correct/pack_engine.py) builds the rank-space inputs from
node-space graph state on device each read step.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(2**30)
CLAMP16 = -16384
PMAX = 16
META_W = 32            # meta lanes: 16 preds + letter + npred
RING = 256             # H/F/D ring rows resident in VMEM
DHALF = RING // 2
MWIN = 64              # meta / traceback D window rows
W = 1024               # default column count (pack engine config A)


def lanes_per_program(w: int) -> int:
    """Independent lanes interleaved per program: the row recurrence is a
    latency-bound serial chain, so more instruction streams fill the
    pipeline — bounded by VMEM (3 DP rings + windows per lane)."""
    rs = w // 128
    ring_bytes = 3 * RING * rs * 128 * 2
    per_lane = ring_bytes + (MWIN * rs * 128 * 2) + 64 * 1024
    lp = max(1, (15 * 2**20) // per_lane)
    return min(8, 1 << (lp.bit_length() - 1))


def _make_kernel(match, mismatch, go, ge, n, w, np_lanes):
    rs = w // 128

    def kernel(*refs):
        meta_hbm, nn_ref, seq_ref, slen_ref, act_ref, rank_ref = refs[:6]
        packed_ref, tlen_ref, best_ref = refs[6:9]
        hbmH, hbmF, hbmD = refs[9:12]           # [B, rows, 128] backing
        scr = refs[12:]
        M = list(range(np_lanes))
        lane0 = pl.program_id(0) * np_lanes
        ringH = scr[0:np_lanes]
        ringF = scr[np_lanes:2 * np_lanes]
        ringD = scr[2 * np_lanes:3 * np_lanes]
        mwin = scr[3 * np_lanes:4 * np_lanes]
        dwin = scr[4 * np_lanes:5 * np_lanes]
        farb = scr[5 * np_lanes:6 * np_lanes]   # (2*RS, 128) H+F far rows
        flags = scr[6 * np_lanes]   # SMEM (np_lanes, 4): inflight x2, xstart x2
        fsem = scr[6 * np_lanes + 1]            # DMA((np_lanes, 3, 2))
        msem = scr[6 * np_lanes + 2]            # DMA((np_lanes,))
        dsem = scr[6 * np_lanes + 3]            # DMA((np_lanes,))
        farsem = scr[6 * np_lanes + 4]          # DMA((np_lanes, 2))

        sub8 = jax.lax.broadcasted_iota(jnp.int32, (rs, 128), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (rs, 128), 1)
        cs = sub8 * 128 + lane
        s8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        l8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

        def pr_of(m, v):
            """meta pred lane value (0 = virtual start, else node+1) ->
            row (0 = virtual start, else rank+1) via the VMEM rank table.
            An 8-sublane block slice + one-vreg masked reduce (~8 ops);
            the rank-space translation used to be a [B, N*PMAX] arbitrary
            gather on the host side of the step (44 ms measured)."""
            node = jnp.clip(v - 1, 0, n)
            off = pl.multiple_of((node // 1024) * 8, 8)
            blk = rank_ref[m, pl.ds(off, 8), :].astype(jnp.int32)
            rk = jnp.sum(jnp.where((s8 == (node // 128) % 8)
                                   & (l8 == node % 128), blk, 0))
            return jnp.where(v == 0, 0, rk + 1)
        cs_ge1 = cs >= 1
        lane_lt = {s: lane < s for s in (1, 2, 4, 8, 16, 32, 64)}
        cs_ge = {}
        s = 1
        while s < w:
            cs_ge[s] = cs >= s
            s *= 2

        def shift_flat(x, s, fill):
            if s % 128 == 0:
                out = pltpu.roll(x, shift=s // 128, axis=0)
            else:
                y = pltpu.roll(x, shift=s, axis=1)
                z = pltpu.roll(y, shift=1, axis=0)
                out = jnp.where(lane_lt[s], z, y)
            return jnp.where(cs_ge[s], out, fill)

        def prefix_max(a):
            run = a
            s = 1
            while s < w:
                run = jnp.maximum(run, shift_flat(run, s, NEG))
                s *= 2
            return run

        act = [act_ref[m, 0, 0] > 0 for m in M]
        nn = [jnp.where(act[m], nn_ref[m, 0, 0], 0) for m in M]
        slen = [slen_ref[m, 0, 0] for m in M]
        for m in M:
            tlen_ref[m, 0, 0] = 0
            best_ref[m, 0, 0] = 0
            flags[m, 0] = 0
            flags[m, 1] = 0
            flags[m, 2] = 0
            flags[m, 3] = 0

        zero = jnp.zeros((rs, 128), jnp.int32)
        h0 = zero
        f0 = zero + CLAMP16

        def ring_off(x):
            return pl.multiple_of((x % RING) * rs, rs)

        def _flush_dmas(m, slot, xstart):
            roff = ring_off(xstart)
            return [pltpu.make_async_copy(
                ring.at[pl.ds(roff, DHALF * rs), :],
                hb.at[lane0 + m,
                      pl.ds(pl.multiple_of(xstart * rs, rs), DHALF * rs), :],
                fsem.at[m, a, slot])
                for a, (ring, hb) in enumerate(
                    ((ringH[m], hbmH), (ringF[m], hbmF), (ringD[m], hbmD)))]

        def flush_wait(m, slot):
            @pl.when(flags[m, slot] > 0)
            def _():
                for dma in _flush_dmas(m, slot, flags[m, 2 + slot]):
                    dma.wait()
                flags[m, slot] = 0

        def flush_start(m, slot, xstart):
            # rows [xstart, xstart + DHALF) ring -> HBM
            for dma in _flush_dmas(m, slot, xstart):
                dma.start()
            flags[m, slot] = 1
            flags[m, 2 + slot] = xstart

        # ---- DP ----
        n_max = nn[0]
        for m in M[1:]:
            n_max = jnp.maximum(n_max, nn[m])

        def meta_fetch(m, base):
            # meta ships as [B, N/MWIN, MWIN, 16]: the window index lives
            # on an untiled dimension, so any dynamic value is legal
            dma = pltpu.make_async_copy(
                meta_hbm.at[lane0 + m, base // MWIN], mwin[m], msem.at[m])
            dma.start()
            dma.wait()

        def dp_rank(r, carry):
            hprev, fprev, bv, brv = [list(x) for x in carry]
            # members run in lockstep to the pair's max rank; a member whose
            # graph is shorter must NOT touch its ring/HBM past its own nn,
            # or the ring wraps over its live rows and the tail flush ships
            # garbage over them (it corrupted tracebacks before this gate)
            live = [r < nn[m] for m in M]

            @pl.when(r % MWIN == 0)
            def _():
                for m in M:
                    meta_fetch(m, r)

            # ring half management for row x = r + 1
            x = r + 1

            @pl.when(x % DHALF == 0)
            def _():
                for m in M:
                    @pl.when(live[m])
                    def _(m=m):
                        flush_wait(m, (x // DHALF) % 2)

            rloc = r % MWIN
            boff = pl.multiple_of((rloc // 8) * 8, 8)
            srow = rloc % 8
            sel, letter, np_r, pr0 = [], [], [], []
            for m in M:
                mr = jnp.where(
                    s8 == srow,
                    mwin[m][pl.ds(boff, 8), :].astype(jnp.int32), 0)
                sel.append(mr)
                letter.append(jnp.sum(jnp.where(l8 == PMAX, mr, 0)))
                np_r.append(jnp.sum(jnp.where(l8 == PMAX + 1, mr, 0)))
                pr0.append(pr_of(m, jnp.sum(jnp.where(l8 == 0, mr, 0))))
            chain = [(np_r[m] == 1) & (pr0[m] == r) for m in M]

            def pred_rows(m, pr):
                """(hp, fp) for predecessor row pr (0 = virtual start)."""
                near = ((x - pr) < RING) | (pr == 0)

                def from_ring():
                    off = ring_off(jnp.where(near, jnp.clip(pr, 0, n), 0))
                    return (ringH[m][pl.ds(off, rs), :].astype(jnp.int32),
                            ringF[m][pl.ds(off, rs), :].astype(jnp.int32))

                def from_hbm():
                    for slot in (0, 1):
                        flush_wait(m, slot)
                    prc = jnp.clip(pr, 0, n)
                    dmas = [pltpu.make_async_copy(
                        hb.at[lane0 + m,
                              pl.ds(pl.multiple_of(prc * rs, rs), rs), :],
                        farb[m].at[pl.ds(a * rs, rs), :],
                        farsem.at[m, a]) for a, hb in ((0, hbmH), (1, hbmF))]
                    for dma in dmas:
                        dma.start()
                    for dma in dmas:
                        dma.wait()
                    return (farb[m][pl.ds(0, rs), :].astype(jnp.int32),
                            farb[m][pl.ds(rs, rs), :].astype(jnp.int32))

                hp, fp = jax.lax.cond(near, from_ring, from_hbm)
                hp = jnp.where(pr == 0, h0, hp)
                fp = jnp.where(pr == 0, f0, fp)
                return hp, fp

            hp, fp = [], []
            for m in M:
                hl, fl = pred_rows(m, jnp.where(chain[m], 0, pr0[m]))
                hp.append(jnp.where(chain[m], hprev[m], hl))
                fp.append(jnp.where(chain[m], fprev[m], fl))
            acc = [(hp[m], zero,
                    jnp.maximum(hp[m] + go, fp[m] + ge), zero,
                    ((fp[m] + ge) >= (hp[m] + go)).astype(jnp.int32))
                   for m in M]

            multi = np_r[0] > 1
            for m in M[1:]:
                multi = multi | (np_r[m] > 1)

            def multi_branch(_):
                out = []
                for m in M:
                    def pred_body(k, a, m=m):
                        a_h, arg_h, b_f, arg_f, ext_f = a
                        pr = pr_of(m, jnp.sum(jnp.where(l8 == k, sel[m], 0)))
                        hl, fl = pred_rows(m, pr)
                        fk = jnp.maximum(hl + go, fl + ge)
                        ek = ((fl + ge) >= (hl + go)).astype(jnp.int32)
                        hgt = hl > a_h
                        fgt = fk > b_f
                        return (jnp.where(hgt, hl, a_h),
                                jnp.where(hgt, k, arg_h),
                                jnp.where(fgt, fk, b_f),
                                jnp.where(fgt, k, arg_f),
                                jnp.where(fgt, ek, ext_f))
                    out.append(jax.lax.cond(
                        np_r[m] > 1,
                        lambda m=m, pb=pred_body: jax.lax.fori_loop(
                            0, np_r[m], pb,
                            (zero + NEG, zero, zero + NEG, zero, zero)),
                        lambda m=m: acc[m]))
                return tuple(out)

            acc = jax.lax.cond(multi, multi_branch,
                               lambda _: tuple(acc), None)

            for m in M:
                a_h, arg_h, b_f, arg_f, ext_f = acc[m]
                seq_v = seq_ref[m].astype(jnp.int32)
                sub = jnp.where(seq_v == letter[m], match, mismatch)
                sub = jnp.where((cs >= 1) & (cs <= slen[m]), sub, NEG)
                diag = shift_flat(a_h, 1, NEG) + sub
                arg_diag = shift_flat(arg_h, 1, 0)
                f = jnp.where(cs_ge1, b_f, NEG)
                a = jnp.maximum(jnp.maximum(diag, f), 0)
                # E[j] = ge*j + max_{j'<j}(A[j'] + go - ge*(j'+1))
                run = prefix_max(a + go - ge * (cs + 1))
                e = ge * cs + shift_flat(run, 1, NEG)
                e = jnp.where(cs_ge1, e, NEG)
                h = jnp.maximum(a, e)

                dir_h = jnp.where(e == h, PMAX + 2, 0)
                dir_h = jnp.where(f == h, PMAX + 1, dir_h)
                dir_h = jnp.where(diag == h, 1 + arg_diag, dir_h)
                dir_h = jnp.where(h == 0, 0, dir_h)
                e_ext = ((e == shift_flat(e, 1, NEG) + ge)
                         & cs_ge1).astype(jnp.int32)
                d = (dir_h | (arg_f << 5) | (ext_f << 9) | (e_ext << 10))

                @pl.when(live[m])
                def _(m=m, h=h, f=f, d=d):
                    off = ring_off(x)
                    ringH[m][pl.ds(off, rs), :] = \
                        jnp.maximum(h, CLAMP16).astype(jnp.int16)
                    ringF[m][pl.ds(off, rs), :] = \
                        jnp.maximum(f, CLAMP16).astype(jnp.int16)
                    ringD[m][pl.ds(off, rs), :] = d.astype(jnp.int16)

                upd = (h > bv[m]) & live[m]
                bv[m] = jnp.where(upd, h, bv[m])
                brv[m] = jnp.where(upd, x, brv[m])
                hprev[m] = jnp.where(live[m], h, hprev[m])
                fprev[m] = jnp.where(live[m], f, fprev[m])

            @pl.when(x % DHALF == DHALF - 1)
            def _():
                for m in M:
                    @pl.when(live[m])
                    def _(m=m):
                        flush_start(m, (x // DHALF) % 2, x - DHALF + 1)

            return tuple(tuple(x_) for x_ in (hprev, fprev, bv, brv))

        # row 0 (virtual start) into the ring
        for m in M:
            ringH[m][pl.ds(0, rs), :] = h0.astype(jnp.int16)
            ringF[m][pl.ds(0, rs), :] = f0.astype(jnp.int16)
            ringD[m][pl.ds(0, rs), :] = jnp.zeros((rs, 128), jnp.int16)

        init = (tuple(h0 for _ in M), tuple(f0 for _ in M),
                tuple(zero for _ in M), tuple(zero for _ in M))
        _, _, bv, brv = jax.lax.fori_loop(0, n_max, dp_rank, init)

        # flush the partial tail half so the traceback can read D from HBM
        for m in M:
            tail = ((nn[m] + DHALF) // DHALF) * DHALF - DHALF
            flush_wait(m, (tail // DHALF) % 2)
            flush_start(m, (tail // DHALF) % 2, tail)
            for slot in (0, 1):
                flush_wait(m, slot)

        # first max in (row, column) row-major order, per member
        big = jnp.int32(2**30)
        best, best_r, best_j = [], [], []
        for m in M:
            b_ = jnp.max(bv[m])
            cand = bv[m] == b_
            r0 = jnp.min(jnp.where(cand, brv[m], big))
            j0 = jnp.min(jnp.where(cand & (brv[m] == r0), cs, big))
            best.append(b_)
            best_r.append(r0)
            best_j.append(j0)
            best_ref[m, 0, 0] = b_

        # ---- traceback (states: 0 = H, 1 = E, 2 = F, 3 = done) ----
        def d_at(m, xrow, j, dbase):
            # clamp: done lanes carry stale dbase; the value is discarded
            # but the load must stay in bounds
            off = pl.multiple_of(
                jnp.clip(xrow - dbase, 0, MWIN - 1) * rs, rs)
            drow = dwin[m][pl.ds(off, rs), :].astype(jnp.int32)
            return jnp.sum(jnp.where(cs == j, drow, 0)) & 0xFFFF

        def meta_at(m, r, k, mbase):
            loc = r - mbase
            boff = pl.multiple_of(jnp.clip((loc // 8) * 8, 0, MWIN - 8), 8)
            mr = jnp.where(s8 == loc % 8,
                           mwin[m][pl.ds(boff, 8), :].astype(jnp.int32), 0)
            return jnp.sum(jnp.where(l8 == k, mr, 0))

        def tb_cond(st):
            done = st[0][0] == 3
            for m in M[1:]:
                done = done & (st[m][0] == 3)
            return ~done

        def tb_body(st):
            out = []
            for m in M:
                state, r, j, t, dbase, mbase = st[m]
                # refresh windows when the walk leaves them (the HBM D
                # array is padded past n+1, so no upper clip needed)
                ndbase = (r // MWIN) * MWIN
                rm1 = jnp.maximum(r - 1, 0)
                nmbase = jnp.clip((rm1 // MWIN) * MWIN, 0, n - MWIN)
                go_on = state < 3

                @pl.when(go_on & (ndbase != dbase))
                def _(m=m, ndbase=ndbase):
                    dma = pltpu.make_async_copy(
                        hbmD.at[lane0 + m,
                                pl.ds(pl.multiple_of(ndbase * rs, rs),
                                      MWIN * rs), :],
                        dwin[m], dsem.at[m])
                    dma.start()
                    dma.wait()

                @pl.when(go_on & (nmbase != mbase))
                def _(m=m, nmbase=nmbase):
                    meta_fetch(m, nmbase)

                dbase = jnp.where(go_on, ndbase, dbase)
                mbase = jnp.where(go_on, nmbase, mbase)
                d = d_at(m, r, j, dbase)

                def in_h(m=m, d=d, r=r, j=j, rm1=rm1, mbase=mbase):
                    dh = d & 31
                    stop = (r == 0) | (dh == 0)
                    is_diag = (dh >= 1) & (dh <= PMAX) & ~stop
                    pr = pr_of(m, meta_at(m, rm1,
                                          jnp.clip(dh - 1, 0, PMAX - 1),
                                          mbase))
                    emit = jnp.where(is_diag, (r << 16) | j, 0)
                    ns = jnp.where(stop, 3,
                                   jnp.where(is_diag, 0,
                                             jnp.where(dh == PMAX + 2,
                                                       1, 2)))
                    nr = jnp.where(is_diag, pr, r)
                    nj = jnp.where(is_diag, j - 1, j)
                    return ns, nr, nj, emit

                def in_e(d=d, r=r, j=j):
                    ext = (d >> 10) & 1
                    return jnp.where(ext == 1, 1, 0), r, j - 1, jnp.int32(0)

                def in_f(m=m, d=d, r=r, j=j, rm1=rm1, mbase=mbase):
                    ext = (d >> 9) & 1
                    pr = pr_of(m, meta_at(m, rm1, (d >> 5) & 15, mbase))
                    return jnp.where(ext == 1, 2, 0), pr, j, jnp.int32(0)

                ns, nr, nj, emit = jax.lax.switch(
                    jnp.clip(state, 0, 2), [in_h, in_e, in_f])
                nr = jnp.clip(nr, 0, n)
                nj = jnp.clip(nj, 0, w - 1)
                stale = (state == 3) | (t >= w)
                emit = jnp.where(stale, 0, emit)
                do = (emit != 0).astype(jnp.int32)

                @pl.when(emit != 0)
                def _(m=m, t=t, emit=emit):
                    packed_ref[m, 0, t] = emit

                out.append((jnp.where(stale, state, ns),
                            jnp.where(stale, r, nr),
                            jnp.where(stale, j, nj), t + do, dbase, mbase))
            return tuple(out)

        init_tb = tuple(
            (jnp.where(best[m] > 0, 0, 3), best_r[m], best_j[m],
             jnp.int32(0), jnp.int32(-MWIN), jnp.int32(-MWIN)) for m in M)
        final = jax.lax.while_loop(tb_cond, tb_body, init_tb)
        for m in M:
            tlen_ref[m, 0, 0] = final[m][3]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("match", "mismatch", "go", "ge", "interpret"))
def poa_align_pallas(meta, n_nodes, seq_sh, seq_len, active, rank_tab,
                     match: int = 5, mismatch: int = -4, go: int = -8,
                     ge: int = -6, interpret: Optional[bool] = None):
    """meta [B, N, META_W] int16 (lanes 0..PMAX-1 pred NODE+1 with 0 =
    virtual start, lane PMAX letter, lane PMAX+1 npred >= 1); n_nodes [B];
    seq_sh [B, RS, 128] i32 (flat column j = char j-1, column 0 unused;
    W = RS*128); seq_len [B]; active [B]; rank_tab [B, N] int16 node->rank
    (the kernel translates pred nodes to ranks through a VMEM-resident
    table — shipping ranks directly required a pathological [B, N*PMAX]
    arbitrary gather on the step's XLA side).  Returns (packed [B, W] of
    diagonal moves (rank+1)<<16 | (pos+1) in reverse order, count, best
    score)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, mw = meta.shape
    rs = seq_sh.shape[1]
    w = rs * 128
    assert mw == META_W and n % MWIN == 0 and n >= MWIN
    lp = lanes_per_program(w)
    while b % lp:
        lp //= 2

    grid = (b // lp,)
    hrows = ((n + 1 + DHALF) // DHALF + 1) * DHALF  # flush-tail overrun pad
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),
        pl.BlockSpec((lp, 1, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((lp, rs, 128), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((lp, 1, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((lp, 1, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((lp, n // 128, 128), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((lp, 1, w), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((lp, 1, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((lp, 1, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, 1, w), jnp.int32),
        jax.ShapeDtypeStruct((b, 1, 1), jnp.int32),
        jax.ShapeDtypeStruct((b, 1, 1), jnp.int32),
    ]
    # shared HBM backing stores for H/F/D rows (written via ring flushes)
    for _ in range(3):
        out_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
        out_shape.append(
            jax.ShapeDtypeStruct((b, hrows * rs, 128), jnp.int16))

    scratch = (
        [pltpu.VMEM((RING * rs, 128), jnp.int16) for _ in range(3 * lp)]
        + [pltpu.VMEM((MWIN, 128), jnp.int16) for _ in range(lp)]
        + [pltpu.VMEM((MWIN * rs, 128), jnp.int16) for _ in range(lp)]
        + [pltpu.VMEM((2 * rs, 128), jnp.int16) for _ in range(lp)]
        + [pltpu.SMEM((lp, 4), jnp.int32),
           pltpu.SemaphoreType.DMA((lp, 3, 2)),
           pltpu.SemaphoreType.DMA((lp,)),
           pltpu.SemaphoreType.DMA((lp,)),
           pltpu.SemaphoreType.DMA((lp, 2))])

    outs = pl.pallas_call(
        _make_kernel(match, mismatch, go, ge, n, w, lp),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(jnp.pad(meta, ((0, 0), (0, 0), (0, 128 - mw)))
      .reshape(b, n // MWIN, MWIN, 128),
      n_nodes.reshape(b, 1, 1), seq_sh, seq_len.reshape(b, 1, 1),
      active.reshape(b, 1, 1),
      rank_tab.astype(jnp.int16).reshape(b, n // 128, 128))
    packed, tlen, best = outs[0], outs[1], outs[2]
    return packed[:, 0], tlen[:, 0, 0], best[:, 0, 0]
