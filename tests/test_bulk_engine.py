"""Bulk TPU engine vs the exact NumPy oracle on synthetic read sets."""

import numpy as np
import pytest

from rattle_tpu.config import ClusterParams
from rattle_tpu.cluster import oracle
from rattle_tpu.cluster.bulk import BulkClusterEngine


def _sig(clusters):
    return [(c.main_seq.seq_id, c.main_seq.rev,
             [(s.seq_id, s.rev) for s in c.seqs]) for c in clusters]


def _sorted_reads(reads):
    seqs = [r for r, _f in reads]
    seqs.sort(key=lambda s: -len(s))
    return [s for s in seqs if len(s) > 20]


@pytest.mark.parametrize("is_rna", [True, False])
def test_bulk_matches_oracle(synthetic_families, is_rna):
    seqs = _sorted_reads(synthetic_families)
    params = ClusterParams(is_rna=is_rna)
    golden = oracle.cluster_reads(seqs, params)
    got = BulkClusterEngine(seqs, params).cluster()
    assert _sig(got) == _sig(golden)


def test_bulk_matches_oracle_iso_params(synthetic_families):
    seqs = _sorted_reads(synthetic_families)
    params = ClusterParams(kmer_size=11, t_s=0.3, t_v=25.0, is_rna=True)
    golden = oracle.cluster_reads(seqs, params)
    got = BulkClusterEngine(seqs, params).cluster()
    assert _sig(got) == _sig(golden)


def test_bulk_merge_round_nonidentity_gather(rng):
    """Regression: merge rounds pass non-identity read_of (cluster rep ids);
    when _pow2_at_least(m, 256) == n_pad (any 48-256-read input) the engine
    must STILL gather plane/bvc rows by read id — the identity shortcut used
    to key on order_pad == n_pad and compared the wrong reads' bitvectors."""
    from tests.conftest import make_read, mutate
    refs = [make_read(rng, int(rng.integers(200, 300))) for _ in range(8)]
    seqs = []
    for ref in refs:
        for _ in range(6):
            seqs.append(mutate(rng, ref, 0.12))
    seqs = seqs[:50]
    seqs.sort(key=lambda s: -len(s))
    params = ClusterParams(is_rna=True)
    golden = oracle.cluster_reads(seqs, params)
    got = BulkClusterEngine(seqs, params).cluster()
    assert _sig(got) == _sig(golden)


def test_bulk_with_revcomp_members(rng):
    """cDNA mode with explicitly reverse-complemented reads."""
    from rattle_tpu.ops.encode import reverse_complement_str
    from tests.conftest import make_read, mutate
    refs = [make_read(rng, int(rng.integers(220, 320))) for _ in range(4)]
    seqs = []
    for ref in refs:
        for _ in range(8):
            s = mutate(rng, ref, 0.06)
            if rng.random() < 0.5:
                s = reverse_complement_str(s)
            seqs.append(s)
    seqs.sort(key=lambda s: -len(s))
    params = ClusterParams(is_rna=False)
    golden = oracle.cluster_reads(seqs, params)
    got = BulkClusterEngine(seqs, params).cluster()
    assert _sig(got) == _sig(golden)


def test_bulk_rare_path_all_borderline(synthetic_families):
    """Force EVERY score-passing pair through the borderline-variance rare
    path (host f64 rescore + patch + replay re-fetch): with a huge variance
    band no pair decides on device, so the wave's border machinery carries
    the whole clustering.  Must still equal the oracle exactly."""
    seqs = _sorted_reads(synthetic_families)
    params = ClusterParams(is_rna=True)
    golden = oracle.cluster_reads(seqs, params)
    eng = BulkClusterEngine(seqs, params)
    eng.var_band = np.float32(1e12)
    got = eng.cluster()
    assert eng.n_oracle_fallbacks > 0  # the rare path actually ran
    assert _sig(got) == _sig(golden)


def test_bulk_rare_path_overflow_tier(synthetic_families):
    """Force the match-count overflow tier (exact host scorer): a 1-entry
    M ladder makes every pair with more matches than tier 0 overflow."""
    seqs = _sorted_reads(synthetic_families)
    params = ClusterParams(is_rna=True)
    golden = oracle.cluster_reads(seqs, params)
    eng = BulkClusterEngine(seqs, params)
    eng.m_ladder = (eng.m_ladder[0],)
    got = eng.cluster()
    assert _sig(got) == _sig(golden)
