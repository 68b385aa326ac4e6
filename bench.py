"""Benchmark: gene-level clustering throughput on the reconstructed toyset.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference clusters the 8,306-read toyset in 4.24 s at 24 CPU
threads (README.md:396-404) ~= 1,959 reads/s.  This benchmark runs the same
workload (cluster --rna --raw, k=10 defaults) through the TPU engine on the
attached chip and verifies exact assignment parity against the golden
clusters.out before reporting.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_READS_PER_S = 8306 / 4.24


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                       ".jax_cache"))
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from tools.reconstruct_toyset import reconstruct
    from rattle_tpu.config import ClusterParams, InputParams
    from rattle_tpu.pipeline.stages import load_cluster_inputs, run_cluster
    from rattle_tpu.cluster.bulk import BulkClusterEngine
    from rattle_tpu.io.hpsio import read_clusters

    sample = reconstruct()
    log("devices:", jax.devices())

    reads = load_cluster_inputs(sample, "", InputParams(raw=True))
    params = ClusterParams(is_rna=True)
    seqs = [r.seq for r in reads]

    backend = os.environ.get("RATTLE_BENCH_BACKEND", "tpu")
    t0 = time.time()
    try:
        if backend == "host":
            raise RuntimeError("host backend requested")
        engine = BulkClusterEngine(seqs, params)
        clusters = engine.cluster()
    except Exception as exc:  # accelerator unavailable: honest host fallback
        log(f"TPU path failed ({type(exc).__name__}: {exc}); host fallback")
        from rattle_tpu.cluster.host_engine import HostClusterEngine
        backend = "host"
        t0 = time.time()
        engine = HostClusterEngine(seqs, params)
        clusters = engine.cluster()
    dt = time.time() - t0
    log(f"cluster 8306 reads [{backend}]: {dt:.2f}s  clusters={len(clusters)} "
        f"fallbacks={engine.n_oracle_fallbacks}")

    # parity check vs golden
    final = run_cluster(reads, params, engine=lambda s, p: clusters)
    golden = read_clusters("/root/reference/toyset/rna/output/clusters.out")
    sig = lambda cs: [(c.main_seq.seq_id, [(s.seq_id, s.rev) for s in c.seqs])
                      for c in cs]  # noqa: E731
    parity = sig(final) == sig(golden)
    log(f"parity vs golden clusters.out: {parity}")

    reads_per_s = len(reads) / dt
    metric = f"toyset_cluster_reads_per_s_{backend}"
    if not parity:
        metric += "_PARITY_FAIL"
    print(json.dumps({
        "metric": metric,
        "value": round(reads_per_s, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_s / BASELINE_READS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
