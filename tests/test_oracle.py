"""Oracle unit tests: LIS similarity vs brute force, variance edge cases,
common-kmer join semantics."""

import numpy as np
import pytest

from rattle_tpu.cluster.oracle import (calc_similarity, common_kmers,
                                       extract_kmers)
from rattle_tpu.ops.encode import encode_seq
from rattle_tpu.utils.varmath import var


def brute_lis_length(vals):
    """Longest strictly increasing subsequence length, O(n^2)."""
    n = len(vals)
    if n == 0:
        return 0
    dp = [1] * n
    for i in range(n):
        for j in range(i):
            if vals[j] < vals[i]:
                dp[i] = max(dp[i], dp[j] + 1)
    return max(dp)


def test_lis_length_matches_brute_force(rng):
    for _ in range(50):
        n = int(rng.integers(0, 40))
        m1 = np.sort(rng.integers(0, 50, size=n)).astype(np.int32)
        m2 = rng.integers(0, 50, size=n).astype(np.int32)
        order = np.lexsort((m2, m1))
        m1, m2 = m1[order], m2[order]
        res = calc_similarity(m1, m2, 5)
        # the raw LIS (before filtering) has brute-force length; the filter
        # only ever removes anchors, so llis <= brute and bases <= 5*llis
        assert res.llis <= brute_lis_length(m2.tolist())
        assert res.bases <= 5 * max(res.llis, 1)


def test_similarity_identical_reads():
    codes = encode_seq("ACGTACGGTACCGTAGGACT" * 5)
    rk = extract_kmers(codes, 10, False)
    m1, m2 = common_kmers(rk.hashes, rk.positions, rk.hashes, rk.positions)
    res = calc_similarity(m1, m2, 10)
    # self-similarity covers every position the kmer table covers
    assert res.bases == len(codes) - 10 + 9  # L-k kmers covering L-1 bases
    assert all(d == 0 for d in res.distances)


def test_var_edge_cases():
    # utils.cpp:36-55 quirks that gate cluster decisions (cluster.cpp:34)
    assert var([]) == 0.0
    assert np.isnan(var([5]))  # 0/0
    assert var([1, 3]) == 2.0
    assert var([2, 2, 2]) == 0.0


def test_common_kmers_cross_product():
    # duplicate hashes produce the full cross product (kmer.cpp:51-62)
    h1 = np.array([7, 7, 9], dtype=np.uint32)
    p1 = np.array([0, 5, 2], dtype=np.int32)
    h2 = np.array([7, 7], dtype=np.uint32)
    p2 = np.array([1, 3], dtype=np.int32)
    m1, m2 = common_kmers(h1, p1, h2, p2)
    assert list(zip(m1.tolist(), m2.tolist())) == [(0, 1), (0, 3), (5, 1), (5, 3)]


def test_extract_kmers_excludes_final_position():
    # kmer.cpp:9: the vector is sized L-k, excluding the last valid k-mer
    codes = encode_seq("ACGTACGTAC")  # L=10
    rk = extract_kmers(codes, 3, False)
    assert len(rk.hashes) == 7  # not 8
    assert rk.bv_count > 0


def test_extract_kmers_rejects_short():
    with pytest.raises(ValueError):
        extract_kmers(encode_seq("ACGT"), 10, False)
