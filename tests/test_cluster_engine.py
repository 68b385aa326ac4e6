"""Bulk TPU cluster engine vs the exact oracle on synthetic read sets."""

from rattle_tpu.cluster import oracle
from rattle_tpu.cluster.bulk import BulkClusterEngine
from rattle_tpu.config import ClusterParams


def sig(clusters):
    return [(c.main_seq.seq_id, c.main_seq.rev,
             [(s.seq_id, s.rev) for s in c.seqs]) for c in clusters]


def _run_both(seqs, params):
    expected = oracle.cluster_reads(seqs, params)
    engine = BulkClusterEngine(seqs, params)
    got = engine.cluster()
    return expected, got, engine


def test_engine_matches_oracle_rna(synthetic_families):
    seqs = sorted((s for s, _ in synthetic_families), key=len, reverse=True)
    params = ClusterParams(is_rna=True)
    expected, got, eng = _run_both(seqs, params)
    assert sig(got) == sig(expected)


def test_engine_matches_oracle_cdna(rng, synthetic_families):
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
    clusters = BulkClusterEngine(seqs, params).cluster()
    # most clusters should be family-pure
    pure = 0
    for c in clusters:
        members = {fams[s.seq_id] for s in c.seqs}
        pure += len(members) == 1
    assert pure >= len(clusters) * 0.8


def test_host_engine_matches_oracle(synthetic_families):
    """The honest CPU-baseline engine replays the same decisions."""
    import pytest
    from rattle_tpu import native
    from rattle_tpu.cluster.host_engine import HostClusterEngine
    if not native.available():
        pytest.skip("native library unavailable")
    seqs = sorted((s for s, _ in synthetic_families), key=len, reverse=True)
    params = ClusterParams(is_rna=True)
    expected = oracle.cluster_reads(seqs, params)
    got = HostClusterEngine(seqs, params).cluster()
    assert sig(got) == sig(expected)
