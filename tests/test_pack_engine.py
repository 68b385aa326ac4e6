"""Device pack engine vs the python oracle: full-pack MSA equality.

The engine implements the incr topological order (ops/poa.py default);
the oracle with the same order must produce byte-identical MSA rows.
Runs the pallas kernel in interpret mode on CPU (tests/conftest.py pins
JAX_PLATFORMS=cpu)."""

import random

import pytest

from rattle_tpu.correct.pack_engine import PackEngine
from rattle_tpu.ops import poa


def _random_pack(rng, n_reads, base_len, mut):
    base = "".join(rng.choice("ACGT") for _ in range(base_len))
    seqs = []
    for _ in range(n_reads):
        s = list(base)
        for _ in range(rng.randint(0, mut)):
            op = rng.random()
            i = rng.randrange(len(s))
            if op < 0.4:
                s[i] = rng.choice("ACGT")
            elif op < 0.7:
                s.insert(i, rng.choice("ACGT"))
            elif len(s) > 2:
                del s[i]
        seqs.append("".join(s))
    return seqs


def _oracle_msa(seqs):
    g = poa.POAGraph()
    p = poa.POAParams()
    for s in seqs:
        poa.add_alignment(g, poa.align_local(g, s, p), s)
    return g.msa()


@pytest.mark.parametrize("seed", [0, 1])
def test_engine_matches_oracle(seed):
    rng = random.Random(seed)
    packs = [_random_pack(rng, rng.randint(2, 6), rng.randint(10, 70), 10)
             for _ in range(6)]
    eng = PackEngine(max_lanes=8)
    got = eng.msa_many(packs)
    for pack, rows in zip(packs, got):
        assert rows is not None
        assert rows == _oracle_msa(pack)
    assert eng.stats["fallback_packs"] == 0


def test_engine_identical_reads():
    packs = [["ACGTACGTAA"] * 3, ["TTTTCCCCGGGG", "TTTTCCCCGGGG"]]
    eng = PackEngine(max_lanes=8)
    got = eng.msa_many(packs)
    for pack, rows in zip(packs, got):
        assert rows == _oracle_msa(pack)


def test_engine_mixed_sizes_and_unrelated():
    rng = random.Random(7)
    packs = [
        _random_pack(rng, 3, 25, 6),
        ["A" * 40, "A" * 38 + "GG", "CC" + "A" * 37],
        ["ACGT" * 10, "TTTT" * 9, "GACA" * 8],
        _random_pack(rng, 5, 60, 12),
    ]
    eng = PackEngine(max_lanes=4)
    got = eng.msa_many(packs)
    for pack, rows in zip(packs, got):
        assert rows == _oracle_msa(pack)
