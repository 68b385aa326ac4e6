"""Consensus-quality validation on a subset of golden clusters.

Runs the correct stage on N selected clusters (medium sizes by default) with
the native host aligner and reports 20-mer containment of the golden
consensus in ours, per cluster.  Full-toyset validation is a longer run of
the same machinery (tools/validate_correct.py)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("RATTLE_POA_BACKEND", "native")

from rattle_tpu.config import CorrectParams  # noqa: E402
from rattle_tpu.correct.driver import correct_reads  # noqa: E402
from rattle_tpu.correct.tpu_runner import tpu_pack_runner  # noqa: E402
from rattle_tpu.io import fastx, hpsio  # noqa: E402
from tools.validate_correct import kmer_containment  # noqa: E402

REF_OUT = "/root/reference/toyset/rna/output"


def main():
    max_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    n_clusters = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    reads = fastx.read_multiple_inputs(["testdata/sample.fastq"], [])
    clusters = hpsio.read_clusters(os.path.join(REF_OUT, "clusters.out"))
    golden = fastx.read_fastq_plain(os.path.join(REF_OUT, "consensi.fq"))
    golden_of = {int(g.header.split()[0].rsplit("_", 1)[1]): g for g in golden}

    chosen = [cid for cid, c in enumerate(clusters)
              if 6 <= len(c.seqs) <= max_reads and cid in golden_of
              and max(len(reads[s.seq_id].seq) for s in c.seqs) <= 1600
              ][:n_clusters]
    print(f"validating {len(chosen)} clusters "
          f"(sizes {[len(clusters[c].seqs) for c in chosen]})", flush=True)

    sub = [clusters[cid] for cid in chosen]
    t0 = time.time()
    res = correct_reads(sub, reads, CorrectParams(), pack_runner=tpu_pack_runner)
    print(f"correct: {time.time() - t0:.1f}s  consensi={len(res.consensi)}",
          flush=True)

    scores = []
    for k, cid in enumerate(chosen):
        ours = res.consensi[k]
        gold = golden_of[cid]
        s = kmer_containment(gold.seq, ours.seq)
        scores.append((s, cid, len(gold.seq), len(ours.seq)))
    scores.sort()
    import statistics
    vals = [s for s, *_ in scores]
    print(f"golden-in-ours 20-mer containment: mean={statistics.mean(vals):.4f} "
          f"median={statistics.median(vals):.4f} min={vals[0]:.4f}")
    print("worst:", [(round(s, 3), c, lg, lo) for s, c, lg, lo in scores[:5]])


if __name__ == "__main__":
    main()
