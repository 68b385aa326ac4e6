"""fastx reader semantics and hps codec tests."""

import os

import pytest

from rattle_tpu.io import fastx, hpsio


def _write(tmp_path, name, text):
    p = os.path.join(tmp_path, name)
    with open(p, "w") as fh:
        fh.write(text)
    return p


def test_fastq_cluster_filters_and_index(tmp_path):
    text = (
        "@r0\nACGT\n+\nIIII\n"            # too short
        "@r1\n" + "A" * 200 + "\n+\n" + "I" * 200 + "\n"
        "@r2\n" + "AN" * 100 + "\n+\n" + "I" * 200 + "\n"   # N-drop
        "@r3\n" + "C" * 180 + "\n+\n" + "I" * 180 + "\n"
    )
    p = _write(str(tmp_path), "x.fastq", text)
    reads = fastx.read_fastq_cluster(p, "", 0, False, 150, 100000)
    assert [r.header for r in reads] == ["@r1", "@r3"]
    # ann carries the original record index; dropped records still consume one
    assert [r.ann for r in reads] == ["1", "3"]
    # the running index is smuggled through the final read's quality
    assert reads[-1].quality == "4"
    assert reads[0].quality == ""


def test_fastq_cluster_raw_skips_length(tmp_path):
    text = "@r0\nACGT\n+\nIIII\n@r1\nACGTACGT\n+\nIIIIIIII\n"
    p = _write(str(tmp_path), "x.fq", text)
    reads = fastx.read_fastq_cluster(p, ",lab", 5, True, 150, 100000)
    assert [r.header for r in reads] == ["@r0,lab", "@r1,lab"]
    assert reads[-1].quality == "7"


def test_crlf_handling(tmp_path):
    text = "@r0\r\nACGTACGT\r\n+\r\nIIIIIIII\r\n"
    p = _write(str(tmp_path), "x.fq", text)
    reads = fastx.read_fastq_full(p)
    assert reads[0].seq == "ACGTACGT"
    assert reads[0].quality == "IIIIIIII"


def test_fasta_full_uppercase_and_quality(tmp_path):
    p = _write(str(tmp_path), "x.fa", ">a\nacgt\nACGT\n>b\nGGTT\n")
    reads = fastx.read_fasta_full(p)
    assert reads[0].seq == "ACGTACGT"
    assert reads[0].quality == "~" * 8
    assert reads[1].header == ">b"


def test_multi_input_running_index(tmp_path):
    p1 = _write(str(tmp_path), "a.fq",
                "@a0\n" + "A" * 160 + "\n+\n" + "I" * 160 + "\n")
    p2 = _write(str(tmp_path), "b.fq",
                "@b0\n" + "C" * 160 + "\n+\n" + "I" * 160 + "\n")
    reads = fastx.read_multiple_inputs_cluster([p1, p2], ["x", "y"], False, 150, 100000)
    assert [r.header for r in reads] == ["@a0,x", "@b0,y"]
    assert [r.ann for r in reads] == ["0", "1"]


def test_sort_read_set_stable():
    reads = [fastx.Read(f"@{i}", s, "+", "") for i, s in
             enumerate(["AAA", "CCCC", "GGG", "TTTTT"])]
    fastx.sort_read_set(reads)
    assert [r.header for r in reads] == ["@3", "@1", "@0", "@2"]


def test_gz_route(tmp_path):
    import gzip
    p = os.path.join(str(tmp_path), "x.fq.gz")
    with gzip.open(p, "wt") as fh:
        fh.write("@a\n" + "A" * 160 + "\n+\n" + "I" * 160 + "\n")
    reads = fastx.read_multiple_inputs([p], [])
    assert len(reads) == 1 and reads[0].seq == "A" * 160


def test_hps_roundtrip(tmp_path):
    cs = [hpsio.Cluster(hpsio.CSeq(5, False, -1),
                        [hpsio.CSeq(5, False, -1), hpsio.CSeq(900, True, 3)]),
          hpsio.Cluster(hpsio.CSeq(0, True, 0), [hpsio.CSeq(0, True, 0)])]
    p = os.path.join(str(tmp_path), "c.out")
    hpsio.write_clusters(cs, p)
    back = hpsio.read_clusters(p)
    assert back == cs


def test_hps_reads_golden():
    golden = "/root/reference/toyset/rna/output/clusters.out"
    if not os.path.exists(golden):
        pytest.skip("reference toyset not mounted")
    cs = hpsio.read_clusters(golden)
    assert len(cs) == 546
    assert sum(len(c.seqs) for c in cs) == 8306


def test_scan_matches_reader(tmp_path):
    """The streaming metadata scan agrees with the full cluster reader on
    lengths, original indices, and survival (shard-input pass 1)."""
    fq = tmp_path / "a.fastq"
    recs = [("@r0", "ACGTACGTAA" * 20), ("@r1", "ACGTN" + "ACGT" * 40),
            ("@r2", "ACG"), ("@r3", "ACGTACGTAC" * 40),
            ("@r4", "ACGT" * 50)]
    fq.write_text("".join(f"{h}\n{s}\n+\n{'~' * len(s)}\n" for h, s in recs))
    fa = tmp_path / "b.fasta"
    fa.write_text(">x0\n" + "acgtacgtaa" * 30 + "\n>x1\n" + "acgtn" * 40
                  + "\n>x2\n" + "ACGT" * 45 + "\n")
    files = [str(fq), str(fa)]
    full = fastx.read_multiple_inputs_cluster(files, [], False, 150, 1000)
    lens, anns = fastx.scan_multiple_inputs_cluster(files, [], False, 150,
                                                    1000)
    assert list(lens) == [len(r.seq) for r in full]
    assert list(anns) == [int(r.ann) for r in full]
    # pass 2 returns exactly the requested survivors with identical content
    sel = fastx.read_cluster_selection(files, [], False, 150, 1000,
                                       [0, len(full) - 1])
    assert sel[0].seq == full[0].seq and sel[0].header == full[0].header
    assert sel[len(full) - 1].seq == full[-1].seq
    assert set(sel) == {0, len(full) - 1}
