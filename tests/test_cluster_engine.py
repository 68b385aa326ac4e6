"""TPU cluster engine vs the exact oracle on synthetic read sets."""

from rattle_tpu.cluster import oracle
from rattle_tpu.cluster.driver import TpuClusterEngine
from rattle_tpu.config import ClusterParams


def sig(clusters):
    return [(c.main_seq.seq_id, c.main_seq.rev,
             [(s.seq_id, s.rev) for s in c.seqs]) for c in clusters]


def _run_both(seqs, params):
    expected = oracle.cluster_reads(seqs, params)
    engine = TpuClusterEngine(seqs, params)
    got = engine.cluster()
    return expected, got, engine


def test_engine_matches_oracle_rna(synthetic_families):
    seqs = sorted((s for s, _ in synthetic_families), key=len, reverse=True)
    params = ClusterParams(is_rna=True)
    expected, got, eng = _run_both(seqs, params)
    assert sig(got) == sig(expected)


def test_engine_matches_oracle_cdna(rng, synthetic_families):
    from .conftest import make_read, mutate
    from rattle_tpu.ops.encode import reverse_complement_str
    # include reverse-complemented family members to exercise the rev path
    seqs = []
    for i, (s, _) in enumerate(synthetic_families):
        seqs.append(reverse_complement_str(s) if i % 3 == 0 else s)
    seqs.sort(key=len, reverse=True)
    params = ClusterParams(is_rna=False)
    expected, got, eng = _run_both(seqs, params)
    assert sig(got) == sig(expected)


def test_engine_matches_oracle_iso_params(synthetic_families):
    seqs = sorted((s for s, _ in synthetic_families), key=len, reverse=True)[:40]
    params = ClusterParams(kmer_size=11, t_s=0.3, t_v=25.0, is_rna=True)
    expected, got, _ = _run_both(seqs, params)
    assert sig(got) == sig(expected)


def test_clusters_are_sensible(synthetic_families):
    """Family members should mostly land in the same cluster."""
    order = sorted(range(len(synthetic_families)),
                   key=lambda i: -len(synthetic_families[i][0]))
    seqs = [synthetic_families[i][0] for i in order]
    fams = [synthetic_families[i][1] for i in order]
    params = ClusterParams(is_rna=True)
    clusters = oracle.cluster_reads(seqs, params)
    # homogeneity proxy: each cluster dominated by one family
    impure = 0
    for c in clusters:
        seen = [fams[s.seq_id] for s in c.seqs]
        impure += len(seen) - seen.count(max(set(seen), key=seen.count))
    assert impure <= len(seqs) * 0.05
