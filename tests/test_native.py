"""Native C++ runtime vs the Python twins — identical semantics required."""

import numpy as np
import pytest

from rattle_tpu import native
from rattle_tpu.ops import poa
from rattle_tpu.ops.sketch import build_sketch_tables

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def test_sketch_native_matches_python(rng):
    from .conftest import make_read
    seqs = [make_read(rng, int(rng.integers(40, 120))) for _ in range(20)]
    kmax = 128
    py = build_sketch_tables(seqs, 10, True, kmax=kmax, use_native=False)
    nat = native.build_sketch_native(seqs, 10, True, kmax)
    for name in ("hbp", "hs", "ps", "nk", "lens", "bvp", "bvc", "rev_hs",
                 "rev_ps", "rev_bvp"):
        a, b = getattr(py, name), getattr(nat, name)
        assert np.array_equal(a, b), name


def test_native_poa_matches_python(rng):
    from .conftest import make_read, mutate
    params = poa.POAParams()
    ref = make_read(rng, 80)
    reads = [mutate(rng, ref, err=0.12) for _ in range(7)]
    g_py = poa.POAGraph()
    g_nat = native.NativePoaGraph()
    for s in reads:
        a_py = poa.align_local(g_py, s, params)
        a_nat = g_nat.align_local(s, params) if g_nat.n_nodes() else []
        assert a_nat == a_py
        poa.add_alignment(g_py, a_py, s)
        g_nat.add_alignment(a_nat, s)
    assert g_nat.msa() == g_py.msa()
    assert g_nat.n_nodes() == g_py.n_nodes()


def test_native_rank_arrays_match(rng):
    from .conftest import make_read, mutate
    params = poa.POAParams()
    ref = make_read(rng, 60)
    g_py = poa.POAGraph()
    g_nat = native.NativePoaGraph()
    for s in [ref, mutate(rng, ref), mutate(rng, ref)]:
        a = poa.align_local(g_py, s, params)
        poa.add_alignment(g_py, a, s)
        g_nat.add_alignment(a, s)
    _, order = g_py.topo_groups()
    py_rank = [nid for members in order for nid in members]
    out = g_nat.rank_arrays(256, 8)
    assert out is not None
    letters, preds, rank_nodes = out
    assert rank_nodes.tolist() == py_rank
    for r, nid in enumerate(py_rank):
        assert letters[r] == ord(g_py.letters[nid])
        ins = g_py.in_edges[nid]
        rank_of = {m: i for i, m in enumerate(py_rank)}
        expect = [rank_of[a] + 1 for a in ins] if ins else [0]
        got = [p for p in preds[r] if p != -1]
        assert got == expect


def test_native_pair_scorer_matches_oracle(rng):
    from .conftest import make_read, mutate
    from rattle_tpu.cluster import oracle
    from rattle_tpu.ops.encode import encode_seq
    from rattle_tpu.utils.varmath import var as exact_var
    seqs = []
    base = None
    for i in range(12):
        if i % 2 == 0:
            base = make_read(rng, int(rng.integers(80, 160)))
            seqs.append(base)
        else:
            seqs.append(mutate(rng, base, err=0.15))
    t = build_sketch_tables(seqs, 10, True)
    a_ids = np.arange(0, 12, 2)
    b_ids = np.arange(1, 12, 2)
    for rev in (False, True):
        out = native.score_pairs_native(t, a_ids, b_ids,
                                        np.full(6, rev, bool), 10, 10)
        for i, (a, b) in enumerate(zip(a_ids, b_ids)):
            ka = oracle.extract_kmers(encode_seq(seqs[a]), 10, True)
            kb = oracle.extract_kmers(encode_seq(seqs[b]), 10, True)
            if rev:
                m1, m2 = oracle.common_kmers(ka.hashes, ka.positions,
                                             kb.rev_hashes, kb.rev_positions)
            else:
                m1, m2 = oracle.common_kmers(ka.hashes, ka.positions,
                                             kb.hashes, kb.positions)
            sim = oracle.calc_similarity(m1, m2, 10)
            assert out["bases"][i] == sim.bases
            assert out["hc"][i] == sim.hc_bases
            assert out["n_dist"][i] == len(sim.distances)
            ev = exact_var(sim.distances)
            dv = out["var"][i]
            if np.isnan(ev):
                assert np.isnan(dv)
            else:
                assert dv == ev
