"""Pallas POA kernel: graph-vs-read affine local DP + traceback on TPU.

Replaces the XLA scan/while version (ops/poa_device.py): the scan paid
~75us per graph rank in dispatch/fusion overhead; here the whole DP +
traceback runs inside one program at VPU rate.  Semantics are identical to
the host oracle ``ops/poa.align_local`` (same recurrences, first-maximum
tie-break, diagonal > F > E traceback with predecessors in insertion
order, extend-before-open gap tie-breaks); see that module for the spec
and reference citations (correct.cpp:395-405).

Hardware shaping (mosaic constraints + measured costs drove every choice):

* A DP row of W=1024 columns is an (8, 128) tile; H/F/D are
  [(N+1)*8, 128] int16 VMEM scratch with row r at sublane 8r — dynamic
  sublane slices must be provably 8-aligned (``8*r`` is, via
  pl.multiple_of).  Dynamic indexing of the 128-lane dimension is not
  supported, so in-row element extraction goes through masked reductions.
* The row recurrence is a ~25-op dependency chain (the E prefix-max alone
  is 10 serial rounds); single-lane execution is latency-bound at ~10
  cycles/op.  Each program therefore processes LANES_PER_PROGRAM packs
  with fully independent instruction streams the compiler can interleave.
* Per-rank scalars ride in ``meta`` [B, N, 16] int16 (lanes 0..7 pred
  rank+1 with 0 = virtual start, lane 8 letter, lane 9 npred>=1), read one
  8-rank-aligned (8, 16) block at a time with static sublane extracts.
  (SMEM blocks were 10x slower: ~0.3 ms scalar-core DMA per grid step.)
* Chain ranks (single predecessor = previous rank, the common case in POA
  graphs) take their predecessor row from registers instead of VMEM; the
  multi-predecessor loop runs under one rare lax.cond per rank.
* Column shifts compose a lane roll with a sublane roll to carry across
  the 128-lane boundary; shift masks are hoisted out of the rank loop.
* The packed output is SMEM (scalar stores to VMEM are unsupported).
* dir word: bits 0-3 H-source (0 stop, 1..8 diagonal via pred k-1, 9 F,
  10 E), bits 4-6 F pred index, bit 7 F-extend, bit 8 E-extend.

The pack engine (correct/pack_engine.py) builds the rank-space inputs from
node-space graph state on device each read step.  Output: packed path
[B, T] i32 ((rank+1) << 16 | (pos+1), reversed), entry count, best score.
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
PMAX = 8
ROW_SUB = 8            # sublanes per DP row
W = ROW_SUB * 128      # columns per DP row (max read length + 1)
META_W = 16            # meta lanes: 8 preds + letter + npred
# packs per program: ILP against the latency-bound row recurrence, capped
# by VMEM (3 scratch arrays of (N+1)*8*128 int16 per lane ~ 6.3 MB at
# N=1024).  Overridable for experiments via RATTLE_POA_LANES.
import os as _os
_LANES_ENV = int(_os.environ.get("RATTLE_POA_LANES", "0"))


def lanes_per_program(n: int) -> int:
    if _LANES_ENV:
        return _LANES_ENV
    vmem_per_lane = 3 * (n + 1) * ROW_SUB * 128 * 2
    lp = max(1, (13 * 2**20) // vmem_per_lane)
    return 1 << (lp.bit_length() - 1)


def _make_kernel(match, mismatch, go, ge, tmax, n, np_lanes):
    nrow_sub = (n + 1) * ROW_SUB

    def kernel(*refs):
        meta_ref, nn_ref, seq_ref, slen_ref, act_ref = refs[:5]
        packed_ref, tlen_ref, best_ref = refs[5:8]
        HFD = refs[8:]
        H = HFD[0::3]
        F = HFD[1::3]
        D = HFD[2::3]

        sub8 = jax.lax.broadcasted_iota(jnp.int32, (ROW_SUB, 128), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (ROW_SUB, 128), 1)
        cs = sub8 * 128 + lane
        msub = jax.lax.broadcasted_iota(jnp.int32, (ROW_SUB, META_W), 0)
        mlane = jax.lax.broadcasted_iota(jnp.int32, (ROW_SUB, META_W), 1)
        cs_ge1 = cs >= 1
        lane_lt = {s: lane < s for s in (1, 2, 4, 8, 16, 32, 64)}
        cs_ge = {}
        s = 1
        while s < W:
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
            while s < W:
                run = jnp.maximum(run, shift_flat(run, s, NEG))
                s *= 2
            return run

        M = list(range(np_lanes))
        act = [act_ref[m, 0, 0] > 0 for m in M]
        nn = [jnp.where(act[m], nn_ref[m, 0, 0], 0) for m in M]
        slen = [slen_ref[m, 0, 0] for m in M]
        for m in M:
            tlen_ref[m, 0, 0] = 0
            best_ref[m, 0, 0] = 0
            H[m][0:ROW_SUB, :] = jnp.zeros((ROW_SUB, 128), jnp.int16)
            F[m][0:ROW_SUB, :] = jnp.full((ROW_SUB, 128), CLAMP16, jnp.int16)

        seq_sh = [seq_ref[m] for m in M]
        jvalid = [(cs >= 1) & (cs <= slen[m]) for m in M]
        n_max = nn[0]
        for m in M[1:]:
            n_max = jnp.maximum(n_max, nn[m])

        zero = jnp.zeros((ROW_SUB, 128), jnp.int32)

        def meta_row(m, r):
            """(ROW_SUB, META_W) with rank r's row selected (others 0)."""
            q = pl.multiple_of((r // ROW_SUB) * ROW_SUB, ROW_SUB)
            blk = meta_ref[m, pl.ds(q, ROW_SUB), :].astype(jnp.int32)
            return jnp.where(msub == r % ROW_SUB, blk, 0)

        def dp_rank(r, carry):
            hprev, fprev, bv, brv = [list(x) for x in carry]
            live = [r < nn[m] for m in M]
            sel = [meta_row(m, r) for m in M]
            letter = [jnp.sum(jnp.where(mlane == 8, sel[m], 0)) for m in M]
            np_r = [jnp.sum(jnp.where(mlane == 9, sel[m], 0)) for m in M]
            pr0 = [jnp.sum(jnp.where(mlane == 0, sel[m], 0)) for m in M]
            chain = [(np_r[m] == 1) & (pr0[m] == r) for m in M]

            # single-pred path, chain rows straight from registers
            hp, fp = [], []
            for m in M:
                off = pl.multiple_of(
                    jnp.where(chain[m], 0, pr0[m]) * ROW_SUB, ROW_SUB)
                hl = H[m][pl.ds(off, ROW_SUB), :].astype(jnp.int32)
                fl = F[m][pl.ds(off, ROW_SUB), :].astype(jnp.int32)
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
                    def pred_body(k, a):
                        a_h, arg_h, b_f, arg_f, ext_f = a
                        pr = jnp.sum(jnp.where(mlane == k, sel[m], 0))
                        off = pl.multiple_of(pr * ROW_SUB, ROW_SUB)
                        hl = H[m][pl.ds(off, ROW_SUB), :].astype(jnp.int32)
                        fl = F[m][pl.ds(off, ROW_SUB), :].astype(jnp.int32)
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
                sub = jnp.where(seq_sh[m] == letter[m], match, mismatch)
                sub = jnp.where(jvalid[m], sub, NEG)
                diag = shift_flat(a_h, 1, NEG) + sub
                arg_diag = shift_flat(arg_h, 1, 0)
                f = jnp.where(cs_ge1, b_f, NEG)
                a = jnp.maximum(jnp.maximum(diag, f), 0)
                # E[j] = ge*j + max_{j'<j}(A[j'] + go - ge*(j'+1))
                run = prefix_max(a + go - ge * (cs + 1))
                e = ge * cs + shift_flat(run, 1, NEG)
                e = jnp.where(cs_ge1, e, NEG)
                h = jnp.maximum(a, e)

                dir_h = jnp.where(e == h, 10, 0)
                dir_h = jnp.where(f == h, 9, dir_h)
                dir_h = jnp.where(diag == h, 1 + arg_diag, dir_h)
                dir_h = jnp.where(h == 0, 0, dir_h)
                e_ext = ((e == shift_flat(e, 1, NEG) + ge)
                         & cs_ge1).astype(jnp.int32)
                d = (dir_h | (arg_f << 4) | (ext_f << 7) | (e_ext << 8))

                off = pl.multiple_of((r + 1) * ROW_SUB, ROW_SUB)
                H[m][pl.ds(off, ROW_SUB), :] = \
                    jnp.maximum(h, CLAMP16).astype(jnp.int16)
                F[m][pl.ds(off, ROW_SUB), :] = \
                    jnp.maximum(f, CLAMP16).astype(jnp.int16)
                D[m][pl.ds(off, ROW_SUB), :] = d.astype(jnp.int16)

                # per-column running max + first row reaching it; the
                # scalar winner is extracted once after the loop
                upd = (h > bv[m]) & live[m]
                bv[m] = jnp.where(upd, h, bv[m])
                brv[m] = jnp.where(upd, r + 1, brv[m])
                hprev[m] = jnp.where(live[m], h, hprev[m])
                fprev[m] = jnp.where(live[m], f, fprev[m])
            return tuple(tuple(x) for x in (hprev, fprev, bv, brv))

        init = (tuple(zero for _ in M),
                tuple(zero + CLAMP16 for _ in M),
                tuple(zero for _ in M), tuple(zero for _ in M))
        _, _, bv, brv = jax.lax.fori_loop(0, n_max, dp_rank, init)

        # first max in (row, column) row-major order, per member
        big = jnp.int32(2**30)
        best, best_r, best_j = [], [], []
        for m in M:
            b = jnp.max(bv[m])
            cand = bv[m] == b
            r0 = jnp.min(jnp.where(cand, brv[m], big))
            j0 = jnp.min(jnp.where(cand & (brv[m] == r0), cs, big))
            best.append(b)
            best_r.append(r0)
            best_j.append(j0)
            best_ref[m, 0, 0] = b

        # ---- traceback (states: 0 = H, 1 = E, 2 = F, 3 = done) ----
        def meta_get(m, r, k):
            q = pl.multiple_of((r // ROW_SUB) * ROW_SUB, ROW_SUB)
            blk = meta_ref[m, pl.ds(q, ROW_SUB), :].astype(jnp.int32)
            return jnp.sum(jnp.where(
                (msub == r % ROW_SUB) & (mlane == k), blk, 0))

        def tb_cond(st):
            done = st[0][0] == 3
            for m in M[1:]:
                done = done & (st[m][0] == 3)
            return ~done

        def tb_body(st):
            out = []
            for m in M:
                state, r, j, t = st[m]
                off = pl.multiple_of(r * ROW_SUB, ROW_SUB)
                drow = D[m][pl.ds(off, ROW_SUB), :].astype(jnp.int32)
                d = jnp.sum(jnp.where(cs == j, drow, 0)) & 0xFFFF
                rm1 = jnp.maximum(r - 1, 0)

                def in_h(m=m, d=d, r=r, j=j, rm1=rm1):
                    dh = d & 15
                    stop = (r == 0) | (dh == 0)
                    is_diag = (dh >= 1) & (dh <= PMAX) & ~stop
                    pr = meta_get(m, rm1, jnp.clip(dh - 1, 0, PMAX - 1))
                    emit = jnp.where(is_diag, (r << 16) | j, 0)
                    ns = jnp.where(stop, 3,
                                   jnp.where(is_diag, 0,
                                             jnp.where(dh == 10, 1, 2)))
                    nr = jnp.where(is_diag, pr, r)
                    nj = jnp.where(is_diag, j - 1, j)
                    return ns, nr, nj, emit

                def in_e(m=m, d=d, r=r, j=j):
                    ext = (d >> 8) & 1
                    return jnp.where(ext == 1, 1, 0), r, j - 1, j

                def in_f(m=m, d=d, r=r, j=j, rm1=rm1):
                    ext = (d >> 7) & 1
                    pr = meta_get(m, rm1, (d >> 4) & 7)
                    return jnp.where(ext == 1, 2, 0), pr, j, r << 16

                ns, nr, nj, emit = jax.lax.switch(
                    jnp.clip(state, 0, 2), [in_h, in_e, in_f])
                stale = (state == 3) | (t >= tmax)
                emit = jnp.where(stale, 0, emit)
                do = (emit != 0).astype(jnp.int32)

                @pl.when(emit != 0)
                def _(m=m, t=t, emit=emit):
                    packed_ref[m, 0, t] = emit

                out.append((jnp.where(stale, state, ns),
                            jnp.where(stale, r, nr),
                            jnp.where(stale, j, nj), t + do))
            return tuple(out)

        init = tuple(
            (jnp.where(best[m] > 0, 0, 3), best_r[m], best_j[m],
             jnp.int32(0)) for m in M)
        final = jax.lax.while_loop(tb_cond, tb_body, init)
        for m in M:
            tlen_ref[m, 0, 0] = final[m][3]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("match", "mismatch", "go", "ge", "interpret"))
def poa_align_pallas(meta, n_nodes, seq_sh, seq_len, active,
                     match: int = 5, mismatch: int = -4, go: int = -8,
                     ge: int = -6, interpret: Optional[bool] = None):
    """meta [B, N, 16] int16 (lanes 0..7 pred rank+1 with 0 = virtual
    start, lane 8 letter, lane 9 npred >= 1); n_nodes [B]; seq_sh
    [B, 8, 128] i32 (flat column j = char j-1, column 0 unused);
    seq_len [B]; active [B].  B must be a multiple of LANES_PER_PROGRAM."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, mw = meta.shape
    assert mw == META_W and n % ROW_SUB == 0
    assert seq_sh.shape[1:] == (ROW_SUB, 128)
    lp = lanes_per_program(n)
    while b % lp:
        lp //= 2
    tmax = ((n + W + 127) // 128) * 128

    grid = (b // lp,)
    in_specs = [
        pl.BlockSpec((lp, n, META_W), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((lp, 1, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((lp, ROW_SUB, 128), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((lp, 1, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((lp, 1, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
    ]
    out_specs = [
        # scalar stores land in SMEM (mosaic cannot scalar-store to VMEM)
        pl.BlockSpec((lp, 1, tmax), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((lp, 1, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((lp, 1, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
    ]

    packed, tlen, best = pl.pallas_call(
        _make_kernel(match, mismatch, go, ge, tmax, n, lp),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, tmax), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM(((n + 1) * ROW_SUB, 128), jnp.int16)
                        for _ in range(3 * lp)],
        interpret=interpret,
    )(meta, n_nodes.reshape(b, 1, 1), seq_sh,
      seq_len.reshape(b, 1, 1), active.reshape(b, 1, 1))
    return packed[:, 0], tlen[:, 0, 0], best[:, 0, 0]
