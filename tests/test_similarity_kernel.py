"""Device kernels vs the NumPy oracle on random sequences."""

import numpy as np
import jax.numpy as jnp

from rattle_tpu.cluster import oracle
from rattle_tpu.ops import gates
from rattle_tpu.ops.encode import encode_seq
from rattle_tpu.ops.similarity import bv_gate, pair_match_counts, score_pairs
from rattle_tpu.ops.sketch import build_sketch_tables
from rattle_tpu.utils.varmath import var as exact_var


def _random_related_seqs(rng, n, lo=80, hi=200):
    """Half random pairs, half mutated copies (so matches actually occur)."""
    from .conftest import make_read, mutate
    seqs = []
    base = make_read(rng, int(rng.integers(lo, hi)))
    for i in range(n):
        if i % 2 == 0:
            base = make_read(rng, int(rng.integers(lo, hi)))
            seqs.append(base)
        else:
            seqs.append(mutate(rng, base, err=0.15))
    return seqs


def test_score_pairs_matches_oracle(rng):
    k = 10
    seqs = _random_related_seqs(rng, 16)
    t = build_sketch_tables(seqs, k, False)
    a_ids = np.arange(0, 16, 2)
    b_ids = np.arange(1, 16, 2)
    hbp_a = jnp.asarray(t.hbp[a_ids])
    nk_a = jnp.asarray(t.nk[a_ids])
    hs_b = jnp.asarray(t.hs[b_ids])
    ps_b = jnp.asarray(t.ps[b_ids])
    nk_b = jnp.asarray(t.nk[b_ids])
    bases, hc, v, n_dist, total = score_pairs(hbp_a, nk_a, hs_b, ps_b, nk_b,
                                              256, k, 10)
    for idx, (a, b) in enumerate(zip(a_ids, b_ids)):
        ka = oracle.extract_kmers(encode_seq(seqs[a]), k, False)
        kb = oracle.extract_kmers(encode_seq(seqs[b]), k, False)
        m1, m2 = oracle.common_kmers(ka.hashes, ka.positions, kb.hashes, kb.positions)
        sim = oracle.calc_similarity(m1, m2, k)
        assert int(total[idx]) == len(m1)
        if len(m1) <= 256:
            assert int(bases[idx]) == sim.bases, (a, b)
            assert int(hc[idx]) == sim.hc_bases
            assert int(n_dist[idx]) == len(sim.distances)
            ev = exact_var(sim.distances)
            dv = float(v[idx])
            if np.isnan(ev) or np.isinf(ev):
                assert np.isinf(dv) or np.isnan(dv)
            elif ev > 0:
                assert abs(dv - ev) / max(ev, 1.0) < 1e-3
            else:
                assert dv == 0.0


def test_match_counts_match_oracle(rng):
    k = 10
    seqs = _random_related_seqs(rng, 8)
    t = build_sketch_tables(seqs, k, False)
    hbp_a = jnp.asarray(t.hbp[:4])
    nk_a = jnp.asarray(t.nk[:4])
    hs_b = jnp.asarray(t.hs[4:])
    nk_b = jnp.asarray(t.nk[4:])
    counts = np.asarray(pair_match_counts(hbp_a, nk_a, hs_b, nk_b))
    for i in range(4):
        ka = oracle.extract_kmers(encode_seq(seqs[i]), k, False)
        kb = oracle.extract_kmers(encode_seq(seqs[4 + i]), k, False)
        m1, _ = oracle.common_kmers(ka.hashes, ka.positions, kb.hashes, kb.positions)
        assert counts[i] == len(m1)


def test_bv_gate_matches_oracle(rng):
    seqs = _random_related_seqs(rng, 12)
    t = build_sketch_tables(seqs, 10, False)
    thr = 0.35
    tab = jnp.asarray(gates.min_numerator_table(4096, thr))
    passed, common = bv_gate(jnp.asarray(t.bvp), jnp.asarray(t.bvc),
                             jnp.asarray(t.bvp[:4]), jnp.asarray(t.bvc[:4]), tab)
    passed = np.asarray(passed)
    common = np.asarray(common)
    for i in range(12):
        ki = oracle.extract_kmers(encode_seq(seqs[i]), 10, False)
        for s in range(4):
            ks = oracle.extract_kmers(encode_seq(seqs[s]), 10, False)
            bc = int(np.count_nonzero(ki.bv & ks.bv))
            mmax = float(max(ki.bv_count, ks.bv_count))
            assert common[i, s] == bc
            assert bool(passed[i, s]) == (bc / mmax >= thr)


def test_gate_tables_exact():
    for thr in (0.2, 0.3, 0.35, 0.4, 0.5, 0.25000000000000006):
        tab = gates.min_numerator_table(500, thr)
        for m in range(1, 501):
            c = int(tab[m])
            assert np.float64(c) / np.float64(m) >= thr
            if c > 0:
                assert np.float64(c - 1) / np.float64(m) < thr
    assert np.all(gates.min_numerator_table(100, 0.0) == 0)
