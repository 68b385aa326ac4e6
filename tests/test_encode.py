import numpy as np

from rattle_tpu.ops.encode import (decode_seq, encode_seq, kmer_hashes,
                                   pack_2bit, reverse_complement_str,
                                   revcomp_codes)


def test_base_codes():
    # kmer.hpp:25-31: A=0 C=1 T=2 U=2 G=3
    assert encode_seq("ACTUG").tolist() == [0, 1, 2, 2, 3]


def test_revcomp_str():
    # utils.hpp:8-14: result[i] = complement(seq[len-1-i]); U -> A
    assert reverse_complement_str("ACGTU") == "AACGT"
    assert reverse_complement_str("AACG") == "CGTT"
    assert reverse_complement_str("U") == "A"


def test_revcomp_codes_matches_string():
    s = "ACGTTGCA"
    assert decode_seq(revcomp_codes(encode_seq(s))) == reverse_complement_str(s)


def test_kmer_hash_values():
    # hash_kmer (kmer.hpp:33-40): big-endian 2-bit shift
    h = kmer_hashes(encode_seq("ACG"), 3)
    assert h.tolist() == [(0 << 4) | (1 << 2) | 3]
    h = kmer_hashes(encode_seq("GGGG"), 2)
    assert h.tolist() == [15, 15, 15]


def test_kmer_hash_window_count():
    h = kmer_hashes(encode_seq("ACGTACGT"), 3)
    assert len(h) == 6  # all L-k+1 positions; callers slice to L-k


def test_pack_2bit_roundtrip():
    codes = encode_seq("ACGTACGTACGTACGTACG")
    packed = pack_2bit(codes, 2)
    unpacked = []
    for w in packed:
        for t in range(16):
            unpacked.append((int(w) >> (2 * t)) & 3)
    assert unpacked[: len(codes)] == codes.tolist()
