"""Batched POA graph-vs-read alignment on device.

Many packs advance in lockstep: lane b holds pack b's current graph (in
topological-rank space) and its next read; one kernel call computes the full
affine-gap local DP and the traceback for all lanes.  Graph threading and
topological re-ranking happen on the host between steps (ops/poa.py).

Exact same semantics and tie-breaks as the oracle ``align_local``:

* recurrences: F from predecessor rows (gap in seq), E via the prefix-max
  trick within a row (gap in graph; requires ge >= go), H = max(0, diag, E, F)
* best cell: first maximum in (rank, seq-pos) row-major order
* traceback preferences: diagonal (preds in insertion order) > F > E,
  and inside F: per-pred H-open check before F-extend check

Memory/bandwidth layout (matters through the 3 MB/s relay this TPU sits
behind):

* H/E/F store as int16 when ``l_cap <= SMALL_L`` (arithmetic stays int32;
  stored values clamp at CLAMP16, which no optimal-path value can reach:
  a gap run on an optimal SW path is repaid by matches, bounding path
  values at -(8 + 6 * ceil(5 * l_cap / 6)) > CLAMP16 for l_cap <= 3200) —
  halves the dominant [B, N+1, L+1] x3 footprint, doubling usable lanes
* predecessor tables upload as int16 (rank fits: n_cap <= 32767)
* the traceback returns ONE packed int32 array ((rank+1) << 16 | (pos+1),
  reversed order) instead of two — halves the per-step d2h volume
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

NEG = -(2**30)
CLAMP16 = -16384
SMALL_L = 3200  # max l_cap for which int16 cell storage is provably exact


class BatchedAlignment(NamedTuple):
    packed: jax.Array   # [B, T] int32: (rank+1) << 16 | (seq_pos+1), reversed
    length: jax.Array   # [B] int32: entries used
    aligned: jax.Array  # [B] bool: best score > 0


@functools.partial(jax.jit, static_argnames=("match", "mismatch", "go", "ge"))
def poa_align_batch(letters, preds, n_nodes, seq, seq_len,
                    match: int = 5, mismatch: int = -4, go: int = -8,
                    ge: int = -6) -> BatchedAlignment:
    """letters [B,N] uint8 raw chars; preds [B,N,PMAX] int (pred RANK+1,
    0 = virtual start, -1 = padding; int16 or int32); n_nodes [B];
    seq [B,L] uint8 (0 pad); seq_len [B]."""
    b, n = letters.shape
    preds = preds.astype(jnp.int32)
    l = seq.shape[1]
    jcols = jnp.arange(l + 1, dtype=jnp.int32)

    small = l <= SMALL_L
    cell = jnp.int16 if small else jnp.int32
    neg_store = jnp.asarray(CLAMP16 if small else NEG, cell)

    def store(x):
        return jnp.maximum(x, jnp.int32(CLAMP16)).astype(cell) if small \
            else x

    H0 = jnp.zeros((b, n + 1, l + 1), cell)
    E0 = jnp.full((b, n + 1, l + 1), neg_store, cell)
    F0 = jnp.full((b, n + 1, l + 1), neg_store, cell)

    seq_valid = jcols[None, 1:] <= seq_len[:, None]   # [B, L]

    def dp_step(carry, r):
        H, E, F = carry
        letter = jax.lax.dynamic_index_in_dim(letters, r, axis=1, keepdims=False)
        pred = jax.lax.dynamic_index_in_dim(preds, r, axis=1, keepdims=False)
        pred_idx = jnp.clip(pred, 0, n)
        pred_ok = pred >= 0
        Hp = jnp.take_along_axis(H, pred_idx[:, :, None], axis=1).astype(jnp.int32)
        Fp = jnp.take_along_axis(F, pred_idx[:, :, None], axis=1).astype(jnp.int32)
        Hp = jnp.where(pred_ok[:, :, None], Hp, NEG)
        Fp = jnp.where(pred_ok[:, :, None], Fp, NEG)

        sub = jnp.where(seq == letter[:, None], match, mismatch)
        sub = jnp.where(seq_valid, sub, NEG)
        diag = Hp[:, :, :-1].max(axis=1) + sub                     # [B, L]
        f = jnp.maximum(Hp + go, Fp + ge).max(axis=1)              # [B, L+1]
        f = f.at[:, 0].set(NEG)
        a = jnp.maximum(0, f)
        a = a.at[:, 1:].max(diag)
        shifted = a + go - ge * (jcols + 1)[None, :]
        run = jax.lax.cummax(shifted, axis=1)
        e = jnp.full((b, l + 1), NEG, jnp.int32)
        e = e.at[:, 1:].set(ge * jcols[None, 1:] + run[:, :-1])
        h = jnp.maximum(a, e)
        live = (r < n_nodes)[:, None]
        h = jnp.where(live, h, NEG)
        e = jnp.where(live, e, NEG)
        f = jnp.where(live, f, NEG)
        H = jax.lax.dynamic_update_slice(H, store(h)[:, None, :], (0, r + 1, 0))
        E = jax.lax.dynamic_update_slice(E, store(e)[:, None, :], (0, r + 1, 0))
        F = jax.lax.dynamic_update_slice(F, store(f)[:, None, :], (0, r + 1, 0))
        return (H, E, F), None

    (H, E, F), _ = jax.lax.scan(dp_step, (H0, E0, F0),
                                jnp.arange(n, dtype=jnp.int32))

    flat = H.reshape(b, -1)
    best = flat.argmax(axis=1).astype(jnp.int32)   # first max, row-major
    best_r = best // (l + 1)
    best_j = best % (l + 1)
    best_score = jnp.take_along_axis(flat, best[:, None], axis=1)[:, 0]
    aligned = best_score > 0

    tmax = n + l
    out0 = jnp.zeros((b, tmax), jnp.int32)
    bidx = jnp.arange(b)

    # states: 0 = H, 1 = E, 2 = F; done lanes have state 3
    def tb_cond(st):
        return jnp.any(st[0] < 3) & (st[4] < tmax)

    def tb_body(st):
        state, r, j, out, step, out_len = st
        Hrj = H[bidx, r, j].astype(jnp.int32)
        Erj = E[bidx, r, j].astype(jnp.int32)
        Frj = F[bidx, r, j].astype(jnp.int32)
        pred = preds[bidx, jnp.clip(r - 1, 0, n - 1)]          # [B, P]
        pred_ok = pred >= 0
        pred_idx = jnp.clip(pred, 0, n)
        Hp_j = H[bidx[:, None], pred_idx, j[:, None]].astype(jnp.int32)
        Hp_jm1 = H[bidx[:, None], pred_idx,
                   jnp.maximum(j - 1, 0)[:, None]].astype(jnp.int32)
        Fp_j = F[bidx[:, None], pred_idx, j[:, None]].astype(jnp.int32)
        letter = letters[bidx, jnp.clip(r - 1, 0, n - 1)]
        ch = seq[bidx, jnp.clip(j - 1, 0, l - 1)]
        sub = jnp.where(ch == letter, match, mismatch)

        in_h = state == 0
        stop = in_h & ((r == 0) | (Hrj == 0))

        diag_eq = pred_ok & (Hp_jm1 + sub[:, None] == Hrj[:, None]) & (j > 0)[:, None]
        any_diag = diag_eq.any(axis=1) & in_h & ~stop
        first_diag = jnp.argmax(diag_eq, axis=1)
        diag_pred = pred_idx[bidx, first_diag]

        take_f = in_h & ~stop & ~any_diag & (Hrj == Frj)
        take_e = in_h & ~stop & ~any_diag & ~take_f & (Hrj == Erj)

        in_e = state == 1
        # extend-first (matches the host aligner): exit E only when the gap
        # cannot be explained as an extension
        e_can_ext = Erj == E[bidx, r, jnp.maximum(j - 1, 0)] \
            .astype(jnp.int32) + ge
        e_to_h = in_e & ~e_can_ext & (
            Erj == H[bidx, r, jnp.maximum(j - 1, 0)].astype(jnp.int32) + go)

        in_f = state == 2
        f_open = pred_ok & (Hp_j + go == Frj[:, None])
        f_ext = pred_ok & (Fp_j + ge == Frj[:, None])
        f_any = f_open | f_ext
        first_f = jnp.argmax(f_any, axis=1)
        f_pred = pred_idx[bidx, first_f]
        # at the chosen predecessor prefer extend over open (host parity)
        f_is_open = f_open[bidx, first_f] & ~f_ext[bidx, first_f]

        # emissions, packed: rank+1 in the high 16 bits (0 = gap in seq),
        # seq_pos+1 in the low 16 (0 = gap in graph)
        emit_node = jnp.where(any_diag | in_f, r, 0)       # rank+1 == r
        emit_pos = jnp.where(any_diag | in_e, j, 0)        # pos+1 == j
        do_emit = (any_diag | take_e | take_f | in_e | in_f) & (state < 3)
        # entering E/F from H emits on the NEXT iteration, not now
        do_emit = do_emit & ~(take_e | take_f)
        slot = jnp.clip(out_len, 0, tmax - 1)
        out = out.at[bidx, slot].set(
            jnp.where(do_emit, (emit_node << 16) | emit_pos, out[bidx, slot]))
        out_len = out_len + do_emit.astype(jnp.int32)

        # transitions
        new_state = state
        new_r = r
        new_j = j
        new_state = jnp.where(stop, 3, new_state)
        new_r = jnp.where(any_diag, diag_pred, new_r)
        new_j = jnp.where(any_diag, j - 1, new_j)
        new_state = jnp.where(take_e, 1, new_state)
        new_state = jnp.where(take_f, 2, new_state)
        new_state = jnp.where(in_e & e_to_h, 0, new_state)
        new_j = jnp.where(in_e, j - 1, new_j)
        new_r = jnp.where(in_f, f_pred, new_r)
        new_state = jnp.where(in_f & f_is_open, 0, new_state)
        return (new_state, new_r, new_j, out, step + 1, out_len)

    init_state = jnp.where(aligned, 0, 3).astype(jnp.int32)
    state = (init_state, best_r, best_j, out0, jnp.int32(0),
             jnp.zeros(b, jnp.int32))
    state = jax.lax.while_loop(tb_cond, tb_body, state)
    _, _, _, out, _, out_len = state
    return BatchedAlignment(out, out_len, aligned)


def alignment_to_host(res: BatchedAlignment, lane: int, rank_nodes,
                      seq_len: int):
    """Convert lane ``lane`` of a device result into the oracle's Alignment
    format: list of (node_id, seq_pos) in forward order with unaligned
    prefix/suffix entries (ops/poa.py align_local's contract)."""
    if len(rank_nodes) == 0:
        return []  # empty graph: align_local's n == 0 case
    ln = int(res.length[lane])
    if not bool(res.aligned[lane]):
        return [(-1, j) for j in range(seq_len)]
    pk = np.asarray(res.packed[lane, :ln])[::-1]
    nodes = (pk >> 16) - 1
    pos = (pk & 0xFFFF) - 1
    aln = [(int(rank_nodes[rn]) if rn >= 0 else -1, int(sp))
           for rn, sp in zip(nodes, pos)]
    first_j = next((sp for _, sp in aln if sp != -1), 0)
    last_j = next((sp for _, sp in reversed(aln) if sp != -1), -1)
    prefix = [(-1, x) for x in range(first_j)]
    suffix = [(-1, x) for x in range(last_j + 1, seq_len)]
    return prefix + aln + suffix
