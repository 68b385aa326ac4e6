"""Mesh-sharded bulk engine (8 virtual CPU devices) vs oracle and vs the
single-device engine (shard-count invariance, SURVEY §4 item 3)."""

import jax
import numpy as np
import pytest

from rattle_tpu.cluster import oracle
from rattle_tpu.cluster.bulk import BulkClusterEngine
from rattle_tpu.config import ClusterParams


def make_mesh(n_devices=None, axis="data"):
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return jax.sharding.Mesh(np.array(devs), (axis,))


def sig(clusters):
    return [(c.main_seq.seq_id, c.main_seq.rev,
             [(s.seq_id, s.rev) for s in c.seqs]) for c in clusters]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_engine_matches_oracle_rna(synthetic_families):
    seqs = sorted((s for s, _ in synthetic_families), key=len, reverse=True)[:56]
    params = ClusterParams(is_rna=True)
    expected = oracle.cluster_reads(seqs, params)
    got = BulkClusterEngine(seqs, params, mesh=make_mesh(8)).cluster()
    assert sig(got) == sig(expected)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_engine_matches_oracle_cdna(synthetic_families):
    from rattle_tpu.ops.encode import reverse_complement_str
    seqs = [reverse_complement_str(s) if i % 4 == 0 else s
            for i, (s, _) in enumerate(synthetic_families)][:48]
    seqs.sort(key=len, reverse=True)
    params = ClusterParams(is_rna=False)
    expected = oracle.cluster_reads(seqs, params)
    got = BulkClusterEngine(seqs, params, mesh=make_mesh(8)).cluster()
    assert sig(got) == sig(expected)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_shard_count_invariance(synthetic_families):
    """1, 2 and 8-device meshes must produce identical clusters."""
    seqs = sorted((s for s, _ in synthetic_families), key=len, reverse=True)[:48]
    params = ClusterParams(is_rna=True)
    outs = [sig(BulkClusterEngine(seqs, params, mesh=make_mesh(nd)).cluster())
            for nd in (1, 2, 8)]
    assert outs[0] == outs[1] == outs[2]
