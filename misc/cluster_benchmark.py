"""Clustering-accuracy benchmark (reference misc/cluster_benchmark.py:1-47).

Runs isoform-level clustering + cluster_summary on a labeled read set and
scores homogeneity/completeness against the transcript labels embedded in the
read headers (minimap2-assigned upstream, README.md:488-497), at both the
transcript and the gene level (gene labels from a reference fasta whose
headers carry ``gene:<id>`` fields).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def homogeneity_completeness(labels_true, labels_pred):
    try:
        from sklearn import metrics
        return (metrics.homogeneity_score(labels_true, labels_pred),
                metrics.completeness_score(labels_true, labels_pred))
    except ImportError:
        # entropy-based fallback, same definition as sklearn's
        import collections
        import math

        def entropy(labels):
            n = len(labels)
            counts = collections.Counter(labels)
            return -sum(c / n * math.log(c / n) for c in counts.values())

        def cond_entropy(a, b):
            n = len(a)
            joint = collections.Counter(zip(a, b))
            bc = collections.Counter(b)
            return -sum(c / n * math.log(c / bc[k[1]])
                        for k, c in joint.items())

        hc = entropy(labels_true)
        hk = entropy(labels_pred)
        h = 1.0 if hc == 0 else 1.0 - cond_entropy(labels_true, labels_pred) / hc
        c = 1.0 if hk == 0 else 1.0 - cond_entropy(labels_pred, labels_true) / hk
        return h, c


def main():
    ap = argparse.ArgumentParser(description="RATTLE clustering benchmark")
    ap.add_argument("input", help="input reads file (headers carry transcript labels)")
    ap.add_argument("output", help="output folder")
    ap.add_argument("threads", type=int, nargs="?", default=1)
    ap.add_argument("--rna", action="store_true")
    ap.add_argument("--ref", default="./toyset/cluster_benchmark/input/ref.fa",
                    help="reference fasta with gene:<id> header fields")
    ap.add_argument("--oracle", action="store_true")
    args = ap.parse_args()

    from rattle_tpu.pipeline import cli

    cluster_args = ["cluster", "-i", args.input, "-o", args.output, "--iso", "--raw"]
    if args.rna:
        cluster_args.append("--rna")
    if args.oracle:
        cluster_args.append("--oracle")
    cli.main(cluster_args)
    print("isoform-level clustering completed")

    from rattle_tpu.io import fastx, hpsio
    from rattle_tpu.pipeline.stages import cluster_summary_rows
    reads = fastx.read_multiple_inputs([args.input], [])
    clusters = hpsio.read_clusters(os.path.join(args.output, "clusters.out"))
    rows = cluster_summary_rows(reads, clusters)
    with open(os.path.join(args.output, "summary.tsv"), "w") as fh:
        fh.write("\n".join(rows) + "\n")
    print("cluster summary completed")

    # gene map from the reference fasta (label -> gene field)
    tsp = {}
    if os.path.exists(args.ref):
        with open(args.ref) as fh:
            for line in fh:
                if line.startswith(">"):
                    parts = line.split()
                    tsp[parts[0][1:]] = parts[3][5:] if len(parts) > 3 else ""

    lt_t, lp_t, lp_g, lt_g = [], [], [], []
    for row in rows:
        fields = row.split(",")
        lt_t.append(fields[1])
        lp_g.append(fields[2])
        lp_t.append(fields[3])
        lt_g.append(tsp.get(fields[1], fields[1]))
    h, c = homogeneity_completeness(lt_t, lp_t)
    print(f"homogeneity score with transcriptome is: {h * 100:.2f}%")
    print(f"completeness score with transcriptome is: {c * 100:.2f}%")
    h, c = homogeneity_completeness(lt_g, lp_g)
    print(f"homogeneity score with gene is: {h * 100:.2f}%")
    print(f"completeness score with gene is: {c * 100:.2f}%")


if __name__ == "__main__":
    main()
