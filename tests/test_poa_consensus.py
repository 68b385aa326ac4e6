"""POA engine and correction-rule tests."""

import numpy as np

from rattle_tpu.config import CorrectParams
from rattle_tpu.correct.consensus import (NT_ORDER, correct_read_pack,
                                          fix_msa_ends,
                                          generate_consensus_vector)
from rattle_tpu.io.fastx import Read
from rattle_tpu.ops.poa import POAGraph, POAParams, add_alignment, align_local, poa_msa


def test_msa_rows_spell_sequences():
    seqs = ["ACGTACGTAC", "ACGTCGTAC", "ACGTACGTGC"]
    msa = poa_msa(seqs)
    assert len(msa) == 3
    for row, s in zip(msa, seqs):
        assert row.replace("-", "") == s
        assert len(row) == len(msa[0])


def test_poa_consensus_recovers_reference(rng):
    from .conftest import make_read, mutate
    ref = make_read(rng, 300)
    reads = [mutate(rng, ref, err=0.08) for _ in range(12)]
    msa = poa_msa(reads)
    cols = np.array([list(r) for r in msa])
    cons = []
    for j in range(cols.shape[1]):
        vals, cnts = np.unique(cols[:, j], return_counts=True)
        c = vals[np.argmax(cnts)]
        if c != "-":
            cons.append(str(c))
    cons = "".join(cons)
    k = 20
    kset = set(ref[i:i + k] for i in range(len(ref) - k + 1))
    hits = sum(1 for i in range(len(cons) - k + 1) if cons[i:i + k] in kset)
    assert hits / max(len(cons) - k + 1, 1) > 0.75


def test_align_empty_graph():
    g = POAGraph()
    aln = align_local(g, "ACGT", POAParams())
    assert aln == []
    add_alignment(g, aln, "ACGT")
    assert g.n_nodes() == 4
    assert g.msa() == ["ACGT"]


def test_consensus_vector_majority_and_window():
    # column 2: reads 0,1 say G, read 2 says T -> G; leading/trailing gaps of
    # short reads must not count toward '-' (correct.cpp:134-150)
    reads = [Read("@a", "AGGA", "+", "IIII"),
             Read("@b", "AGGA", "+", "IIII"),
             Read("@c", "GTA", "+", "III")]
    aln = ["AGG-A", "AGG-A", "-GT-A"]
    cv = generate_consensus_vector(reads, aln)
    assert cv.consensus.tobytes().decode() == "AGG-A"
    # col 0: read c's leading gap is outside its window
    gap_row = NT_ORDER.index("-")
    assert cv.occ[gap_row, 0] == 0
    # col 3 is an internal gap for all three reads
    assert cv.occ[gap_row, 3] == 3


def test_correct_read_pack_fixes_errors():
    p = CorrectParams()
    reads = [Read(f"@r{i}", "ACGTACGT", "+", "K" * 8) for i in range(4)]
    reads.append(Read("@bad", "ACCTACGT", "+", "K!KKKKKK"[:8]))
    aln = ["ACGTACGT"] * 4 + ["ACCTACGT"]
    corrected, uncorrected, cv = correct_read_pack(
        reads, aln, p.min_occ, p.gap_occ, p.err_ratio)
    assert len(corrected) == 5 and not uncorrected
    # the low-quality C at pos 2 of @bad gets substituted by consensus G
    assert corrected[-1].seq == "ACGTACGT"


def test_fix_msa_ends_trims_small_leading_block():
    # a 3nt block then 25 gaps then solid sequence: block removed
    seq = "ACG" + "TTTTACGTACGTACGT"
    row = "ACG" + "-" * 25 + "TTTTACGTACGTACGT"
    reads = [Read("@x", seq, "+", "K" * len(seq))]
    aln = [row]
    fix_msa_ends(reads, aln)
    assert reads[0].seq == "TTTTACGTACGTACGT"
    assert aln[0] == "-" * 28 + "TTTTACGTACGTACGT"
    assert len(reads[0].quality) == len(reads[0].seq)


def test_fix_msa_ends_keeps_good_rows():
    seq = "ACGTACGTACGTACGT"
    reads = [Read("@x", seq, "+", "K" * len(seq))]
    aln = [seq]
    fix_msa_ends(reads, aln)
    assert reads[0].seq == seq and aln[0] == seq
