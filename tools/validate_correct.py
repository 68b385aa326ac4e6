"""Run the correct stage on the full toyset with the oracle POA engine and
measure consensus agreement against the golden consensi.fq.

The goldens come from an older reference build (different header grammar), so
this is a sequence-level similarity check, not byte parity: for each golden
consensus, find our consensus for the same cluster id and report 20-mer
containment both ways.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rattle_tpu.config import CorrectParams  # noqa: E402
from rattle_tpu.correct.driver import correct_reads  # noqa: E402
from rattle_tpu.io import fastx, hpsio  # noqa: E402

REF_OUT = "/root/reference/toyset/rna/output"


def kmer_containment(a: str, b: str, k: int = 20) -> float:
    if len(a) < k or len(b) < k:
        return 0.0
    kb = set(b[i:i + k] for i in range(len(b) - k + 1))
    hits = sum(1 for i in range(len(a) - k + 1) if a[i:i + k] in kb)
    return hits / (len(a) - k + 1)


def alignment_identity(a: str, b: str, band: int = 128) -> float:
    """Global alignment identity 1 - edits/max(len) via a banded
    Levenshtein (numpy anti-diagonal band; exact when the optimal path
    stays within ``band`` of the diagonal, a lower bound otherwise).
    Complements containment: containment ignores insertions in ours,
    identity charges every edit."""
    import numpy as np
    if not a or not b:
        return 0.0
    if len(a) > len(b):
        a, b = b, a
    band = max(band, len(b) - len(a) + 1)
    n, m = len(a), len(b)
    av = np.frombuffer(a.encode(), np.uint8)
    bv = np.frombuffer(b.encode(), np.uint8)
    inf = np.int32(1 << 20)
    # rows over a; per row keep the band [i - band, i + band] of columns
    width = 2 * band + 1
    prev = np.arange(-band, band + 1, dtype=np.int32)  # row 0: D[0][j] = j
    prev = np.where(prev < 0, inf, prev)
    for i in range(1, n + 1):
        js = np.arange(i - band, i + band + 1)
        valid = (js >= 0) & (js <= m)
        okd = (js >= 1) & (js <= m)
        jv = np.clip(js - 1, 0, m - 1)
        cost = np.where(bv[jv] == av[i - 1], 0, 1)
        diag = prev + np.where(okd, cost, inf)
        up = np.concatenate([prev[1:], [inf]]) + 1       # D[i-1][j]
        cur = np.minimum(diag, up)
        # left within the row: min-plus prefix relaxation
        # D[i][j] = min_{j'<=j} D_partial[i][j'] + (j - j')
        idx = np.arange(width, dtype=np.int32)
        cur = np.minimum(cur, np.minimum.accumulate(cur - idx) + idx)
        cur = np.where(valid, cur, inf)
        prev = cur
    j_final = m - n + band
    dist = int(prev[j_final]) if 0 <= j_final < width else 1 << 20
    return max(0.0, 1.0 - dist / max(n, m))


def main():
    sample = sys.argv[1] if len(sys.argv) > 1 else "testdata/sample.fastq"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ours_consensi.fq"
    reads = fastx.read_multiple_inputs([sample], [])
    clusters = hpsio.read_clusters(os.path.join(REF_OUT, "clusters.out"))
    pack_runner = None
    if "--tpu" in sys.argv or os.environ.get("RATTLE_POA_BACKEND"):
        from rattle_tpu.correct.tpu_runner import tpu_pack_runner as pack_runner
    t0 = time.time()
    res = correct_reads(clusters, reads, CorrectParams(), pack_runner=pack_runner)
    dt = time.time() - t0
    print(f"correct stage: {dt:.1f}s  corrected={len(res.corrected)} "
          f"uncorrected={len(res.uncorrected)} consensi={len(res.consensi)}",
          flush=True)
    fastx.write_fastq(res.consensi, out_path)

    golden = fastx.read_fastq_plain(os.path.join(REF_OUT, "consensi.fq"))
    gid_of = {}
    for g in golden:
        cid = int(g.header.split()[0].rsplit("_", 1)[1])
        gid_of[cid] = g
    ours_of = {}
    for r in res.consensi:
        cid = int(r.header.split()[0].rsplit("_", 1)[1])
        ours_of[cid] = r

    both = sorted(set(gid_of) & set(ours_of))
    print(f"golden consensi: {len(golden)}  ours: {len(res.consensi)}  "
          f"shared cluster ids: {len(both)}", flush=True)
    scores = []
    idents = []
    for cid in both:
        s = kmer_containment(gid_of[cid].seq, ours_of[cid].seq)
        scores.append((s, cid))
        idents.append((alignment_identity(gid_of[cid].seq, ours_of[cid].seq),
                       cid))
    scores.sort()
    idents.sort()
    import statistics
    vals = [s for s, _ in scores]
    print(f"golden-in-ours 20-mer containment: mean={statistics.mean(vals):.4f} "
          f"median={statistics.median(vals):.4f} min={vals[0]:.4f}")
    ivals = [s for s, _ in idents]
    print(f"alignment identity vs golden: mean={statistics.mean(ivals):.4f} "
          f"median={statistics.median(ivals):.4f} min={ivals[0]:.4f}")
    print("worst 10:", [(round(s, 3), c) for s, c in scores[:10]])
    print("worst 10 by identity:", [(round(s, 3), c) for s, c in idents[:10]])
    lens = [(len(gid_of[c].seq), len(ours_of[c].seq)) for c in both]
    dl = [abs(a - b) / max(a, b) for a, b in lens]
    print(f"length rel-diff: mean={statistics.mean(dl):.4f} max={max(dl):.4f}")


if __name__ == "__main__":
    main()
