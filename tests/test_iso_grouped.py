"""--iso batching: one group-masked engine pass == per-gene-cluster runs."""

import numpy as np

from rattle_tpu.cluster import oracle
from rattle_tpu.cluster.bulk import BulkClusterEngine, cluster_reads_bulk
from rattle_tpu.config import ClusterParams


def sig(clusters):
    return [(c.main_seq.seq_id, c.main_seq.rev,
             [(s.seq_id, s.rev) for s in c.seqs]) for c in clusters]


def _grouped_inputs(synthetic_families, n_groups=3):
    seqs = sorted((s for s, _ in synthetic_families), key=len, reverse=True)
    # contiguous groups, each internally length-sorted (as stages.run_cluster
    # builds them from gene clusters)
    bounds = np.linspace(0, len(seqs), n_groups + 1).astype(int)
    groups = np.zeros(len(seqs), np.int32)
    for g in range(n_groups):
        groups[bounds[g]:bounds[g + 1]] = g
    return seqs, groups, bounds


def _expected(seqs, groups, bounds, params):
    out = []
    for g in range(len(bounds) - 1):
        lo, hi = bounds[g], bounds[g + 1]
        for c in oracle.cluster_reads(seqs[lo:hi], params):
            out.append((c.main_seq.seq_id + lo, c.main_seq.rev,
                        [(s.seq_id + lo, s.rev) for s in c.seqs]))
    return out


def test_grouped_engine_matches_per_group_oracle(synthetic_families):
    seqs, groups, bounds = _grouped_inputs(synthetic_families)
    params = ClusterParams(kmer_size=11, t_s=0.3, t_v=25.0, is_rna=True)
    expected = _expected(seqs, groups, bounds, params)
    engine = BulkClusterEngine(seqs, params, groups=groups)
    assert sig(engine.cluster()) == expected


def test_grouped_entry_small_fallback(synthetic_families):
    seqs, groups, bounds = _grouped_inputs(synthetic_families[:10], 2)
    params = ClusterParams(kmer_size=11, t_s=0.3, t_v=25.0, is_rna=True)
    expected = _expected(seqs, groups, bounds, params)
    got = cluster_reads_bulk(seqs, params, groups=groups)
    assert sig(got) == expected
