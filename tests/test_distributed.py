"""Distributed (8-device CPU mesh) engine vs the exact oracle."""

import jax
import pytest

from rattle_tpu.cluster import oracle
from rattle_tpu.cluster.distributed import DistributedClusterEngine
from rattle_tpu.config import ClusterParams
from rattle_tpu.parallel.mesh import make_mesh


def sig(clusters):
    return [(c.main_seq.seq_id, c.main_seq.rev,
             [(s.seq_id, s.rev) for s in c.seqs]) for c in clusters]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_distributed_matches_oracle_rna(synthetic_families):
    seqs = sorted((s for s, _ in synthetic_families), key=len, reverse=True)[:56]
    params = ClusterParams(is_rna=True)
    expected = oracle.cluster_reads(seqs, params)
    engine = DistributedClusterEngine(seqs, params, make_mesh(8))
    got = engine.cluster()
    assert sig(got) == sig(expected)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_distributed_matches_oracle_cdna(synthetic_families):
    from rattle_tpu.ops.encode import reverse_complement_str
    seqs = [reverse_complement_str(s) if i % 4 == 0 else s
            for i, (s, _) in enumerate(synthetic_families)][:48]
    seqs.sort(key=len, reverse=True)
    params = ClusterParams(is_rna=False)
    expected = oracle.cluster_reads(seqs, params)
    engine = DistributedClusterEngine(seqs, params, make_mesh(8))
    got = engine.cluster()
    assert sig(got) == sig(expected)
