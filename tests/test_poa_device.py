"""Device POA kernel vs the oracle aligner — must match exactly."""

import numpy as np
import jax.numpy as jnp

from rattle_tpu.ops import poa
from rattle_tpu.ops.poa_device import alignment_to_host, poa_align_batch
from rattle_tpu.correct.tpu_runner import batched_msa, PMAX


def _device_align(graph: poa.POAGraph, seq: str, params: poa.POAParams,
                  n_cap=256, l_cap=128):
    _, order = graph.topo_groups()
    rank_nodes = [nid for members in order for nid in members]
    rank_of = {nid: r for r, nid in enumerate(rank_nodes)}
    letters = np.zeros((1, n_cap), np.uint8)
    preds = np.full((1, n_cap, PMAX), -1, np.int32)
    for r, nid in enumerate(rank_nodes):
        letters[0, r] = ord(graph.letters[nid])
        ins = graph.in_edges[nid]
        if not ins:
            preds[0, r, 0] = 0
        for k, a in enumerate(ins):
            preds[0, r, k] = rank_of[a] + 1
    seq_arr = np.zeros((1, l_cap), np.uint8)
    raw = np.frombuffer(seq.encode(), np.uint8)
    seq_arr[0, : len(raw)] = raw
    res = poa_align_batch(
        jnp.asarray(letters), jnp.asarray(preds),
        jnp.asarray(np.array([graph.n_nodes()], np.int32)),
        jnp.asarray(seq_arr), jnp.asarray(np.array([len(seq)], np.int32)),
        match=params.match, mismatch=params.mismatch,
        go=params.gap_open, ge=params.gap_extend)
    res = type(res)(*[np.asarray(x) for x in res])
    return alignment_to_host(res, 0, rank_nodes, len(seq))


def test_device_matches_oracle_incremental(rng):
    from .conftest import make_read, mutate
    params = poa.POAParams()
    ref = make_read(rng, 90)
    reads = [mutate(rng, ref, err=0.12) for _ in range(8)]
    g_oracle = poa.POAGraph()
    g_device = poa.POAGraph()
    for s in reads:
        aln_o = poa.align_local(g_oracle, s, params)
        aln_d = _device_align(g_device, s, params)
        assert aln_d == aln_o
        poa.add_alignment(g_oracle, aln_o, s)
        poa.add_alignment(g_device, aln_d, s)
    assert g_oracle.msa() == g_device.msa()


def test_device_unrelated_read(rng):
    from .conftest import make_read
    params = poa.POAParams()
    g = poa.POAGraph()
    a = make_read(rng, 60)
    poa.add_alignment(g, poa.align_local(g, a, params), a)
    b = make_read(rng, 60)
    assert _device_align(g, b, params) == poa.align_local(g, b, params)


def test_batched_msa_matches_oracle(rng):
    from .conftest import make_read, mutate
    params = poa.POAParams()
    packs = []
    for _ in range(5):
        ref = make_read(rng, int(rng.integers(60, 100)))
        packs.append([mutate(rng, ref, err=0.1)
                      for _ in range(int(rng.integers(3, 7)))])
    got = batched_msa(packs, params, lanes=3)
    for pack, msa in zip(packs, got):
        assert msa == poa.poa_msa(pack, params)
