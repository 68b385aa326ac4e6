"""Reconstruct the toyset input fastq (stripped from this mount) from the
golden per-cluster fastqs.

The reference repo ships ``toyset/rna/output/clusters/cluster_<cid>.fq`` (one
file per gene cluster, written by the ``extract_clusters`` mode, reference
main.cpp:554-611) plus ``clusters.out`` and ``cluster_summary.tsv``.  Members
appear in the same order in all three, and clusters.out carries the ORIGINAL
file index of every read (translated at main.cpp:266-274), so the original
``sample.fastq`` is recoverable exactly:

  header   <- cluster_summary.tsv row (strip the ",<cid>" suffix)
  seq      <- cluster_<cid>.fq (reverse-complemented back if rev flag set;
              extract_clusters wrote revcomp for rev members, main.cpp:579-583)
  +line    <- cluster_<cid>.fq line 3 (extract_clusters wrote read.ann which
              held the original '+' line, main.cpp:586)
  quality  <- cluster_<cid>.fq line 4 (written unreversed even for rev members)
  position <- clusters.out member seq_id

Verified: ids 0..8305 dense (no reads were dropped by the build that produced
the goldens).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rattle_tpu.io.hpsio import read_clusters  # noqa: E402
from rattle_tpu.ops.encode import reverse_complement_str  # noqa: E402

REF_OUT = "/root/reference/toyset/rna/output"
DEFAULT_TARGET = os.path.join(os.path.dirname(__file__), "..", "testdata", "sample.fastq")


def reconstruct(ref_out: str = REF_OUT, target: str = DEFAULT_TARGET) -> str:
    target = os.path.abspath(target)
    if os.path.exists(target):
        return target

    clusters = read_clusters(os.path.join(ref_out, "clusters.out"))
    with open(os.path.join(ref_out, "cluster_summary.tsv")) as fh:
        summary = fh.read().splitlines()

    n_reads = sum(len(c.seqs) for c in clusters)
    assert len(summary) == n_reads, (len(summary), n_reads)

    records = [None] * n_reads
    row = 0
    for cid, cluster in enumerate(clusters):
        path = os.path.join(ref_out, "clusters", f"cluster_{cid}.fq")
        with open(path) as fh:
            lines = fh.read().splitlines()
        assert len(lines) == 4 * len(cluster.seqs), path
        for k, cs in enumerate(cluster.seqs):
            header = summary[row].rsplit(",", 1)[0]
            row += 1
            seq = lines[4 * k + 1]
            plus = lines[4 * k + 2]
            qual = lines[4 * k + 3]
            if cs.rev:
                seq = reverse_complement_str(seq)
            assert records[cs.seq_id] is None, cs.seq_id
            records[cs.seq_id] = (header, seq, plus, qual)

    os.makedirs(os.path.dirname(target), exist_ok=True)
    tmp = target + ".tmp"
    with open(tmp, "w") as fh:
        for rec in records:
            assert rec is not None
            fh.write("\n".join(rec) + "\n")
    os.replace(tmp, target)
    return target


if __name__ == "__main__":
    out = reconstruct(target=sys.argv[1] if len(sys.argv) > 1 else DEFAULT_TARGET)
    print(out)
