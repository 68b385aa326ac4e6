"""Benchmark: toyset clustering + correction throughput on the attached TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Baselines (reference README.md:396-404, 24 CPU threads):
  cluster  4.24 s  (~1,959 reads/s on the 8,306-read toyset)
  correct 10.947 s

Methodology.  The TPU here sits behind a relay whose FIRST interactions from
a fresh process stall in quantized ~64-68 s units (measured in
tools/probe_cold*.py; the quantum lives inside the relay binary and is not
tunable).  That is a session property, not a property of this framework: any
long-running deployment pays it once.  So the bench (a) absorbs it in an
explicit warmup roundtrip, (b) runs the workload twice — cold (first-compile
+ first-touch) and warm — and (c) headlines the warm number, reporting
everything else (warmup, cold, per-stage breakdown) alongside.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASE_CLUSTER_S = 4.24        # README.md:400, 24 threads
BASE_CORRECT_S = 10.947      # README.md:403, 24 threads
N_READS = 8306
BASELINE_READS_PER_S = N_READS / BASE_CLUSTER_S


def log(*a):
    print(*a, file=sys.stderr, flush=True)


class _Timeout(Exception):
    pass


def _alarm(_sig, _frm):
    raise _Timeout()


def run_cluster_once(seqs, params):
    """One full engine build + cluster; returns (clusters, timings dict)."""
    from rattle_tpu.cluster.bulk import BulkClusterEngine
    t = {}
    t0 = time.time()
    engine = BulkClusterEngine(seqs, params)
    t["sketch"] = time.time() - t0
    t1 = time.time()
    clusters = engine.cluster()
    t.update(engine.phase_times)
    t["cluster"] = time.time() - t1
    t["total"] = time.time() - t0
    t["fallbacks"] = engine.n_oracle_fallbacks
    return clusters, t


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(here, ".jax_cache"))
    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from tools.reconstruct_toyset import reconstruct
    from rattle_tpu.config import ClusterParams, CorrectParams, InputParams
    from rattle_tpu.pipeline.stages import load_cluster_inputs, run_cluster
    from rattle_tpu.io.hpsio import read_clusters

    sample = reconstruct()
    log("devices:", jax.devices())

    # ---- session warmup: absorb the relay's first-interaction stall ----
    t0 = time.time()
    np.asarray(jnp.arange(16) + 1)[:1]
    warmup_s = time.time() - t0
    log(f"warmup roundtrip: {warmup_s:.1f}s")

    reads = load_cluster_inputs(sample, "", InputParams(raw=True))
    params = ClusterParams(is_rna=True)
    seqs = [r.seq for r in reads]

    backend = os.environ.get("RATTLE_BENCH_BACKEND", "tpu")
    extras = {"warmup_s": round(warmup_s, 1)}
    try:
        if backend == "host":
            raise RuntimeError("host backend requested")
        clusters, cold = run_cluster_once(seqs, params)
        log(f"cold:  {cold['total']:.2f}s  (sketch {cold['sketch']:.2f} "
            f"greedy {cold.get('greedy', 0):.2f} merge {cold.get('merge', 0):.2f}) "
            f"clusters={len(clusters)} fallbacks={cold['fallbacks']}")
        clusters, warm = run_cluster_once(seqs, params)
        log(f"warm:  {warm['total']:.2f}s  (sketch {warm['sketch']:.2f} "
            f"greedy {warm.get('greedy', 0):.2f} merge {warm.get('merge', 0):.2f}) "
            f"clusters={len(clusters)} fallbacks={warm['fallbacks']}")
        dt = warm["total"]
        extras["cold_s"] = round(cold["total"], 2)
        extras["stages"] = {k: round(v, 2) for k, v in warm.items()
                            if k != "fallbacks"}
    except Exception as exc:  # accelerator unavailable: honest host fallback
        log(f"TPU path failed ({type(exc).__name__}: {exc}); host fallback")
        from rattle_tpu.cluster.host_engine import HostClusterEngine
        backend = "host"
        t0 = time.time()
        engine = HostClusterEngine(seqs, params)
        clusters = engine.cluster()
        dt = time.time() - t0
    log(f"cluster {len(reads)} reads [{backend}]: {dt:.2f}s warm "
        f"clusters={len(clusters)}")

    # ---- parity check vs golden ----
    final = run_cluster(reads, params, engine=lambda s, p: clusters)
    golden = read_clusters("/root/reference/toyset/rna/output/clusters.out")
    sig = lambda cs: [(c.main_seq.seq_id, [(s.seq_id, s.rev) for s in c.seqs])
                      for c in cs]  # noqa: E731
    parity = sig(final) == sig(golden)
    log(f"parity vs golden clusters.out: {parity}")
    extras["parity"] = parity

    # ---- correct-stage benchmark (reference: 10.9s @ 24 threads) ----
    if os.environ.get("RATTLE_BENCH_CORRECT", "1") != "0" and backend != "host":
        from rattle_tpu.io import fastx
        from rattle_tpu.correct.driver import correct_reads
        from rattle_tpu.correct.tpu_runner import tpu_pack_runner
        creads = fastx.read_multiple_inputs([sample], [])
        n_bases = sum(len(r.seq) for r in creads)
        old = signal.signal(signal.SIGALRM, _alarm)
        signal.alarm(int(os.environ.get("RATTLE_BENCH_CORRECT_BUDGET", "900")))
        try:
            t0 = time.time()
            res = correct_reads(final, creads, CorrectParams(),
                                pack_runner=tpu_pack_runner)
            correct_s = time.time() - t0
            from rattle_tpu.correct.tpu_runner import LAST_STATS
            log(f"correct [{backend}]: {correct_s:.2f}s  "
                f"corrected={len(res.corrected)} "
                f"uncorrected={len(res.uncorrected)} "
                f"consensi={len(res.consensi)}  "
                f"({n_bases / correct_s / 1e6:.2f} Mbases/s)  "
                f"poa stats={LAST_STATS}")
            extras["correct_s"] = round(correct_s, 2)
            extras["correct_vs_baseline"] = round(BASE_CORRECT_S / correct_s, 3)
            extras["poa_mbases_per_s"] = round(n_bases / correct_s / 1e6, 3)
            tot = LAST_STATS["device_bases"] + LAST_STATS["host_bases"]
            extras["poa_device_share"] = round(
                LAST_STATS["device_bases"] / tot, 3) if tot else None
            extras["poa_fallback_packs"] = LAST_STATS["fallback_packs"]
            extras["uncorrected"] = len(res.uncorrected)  # golden: 739
            # consensus quality floor vs the golden consensi
            try:
                from tools.validate_correct import kmer_containment
                gold = fastx.read_fastq_plain(
                    "/root/reference/toyset/rna/output/consensi.fq")
                gold_of = {int(g.header.split()[0].rsplit("_", 1)[1]): g
                           for g in gold}
                scores = []
                for r in res.consensi:
                    cid = int(r.header.split()[0].rsplit("_", 1)[1])
                    if cid in gold_of:
                        scores.append(
                            kmer_containment(gold_of[cid].seq, r.seq))
                scores.sort()
                extras["containment_mean"] = round(
                    sum(scores) / len(scores), 4)
                extras["containment_min"] = round(scores[0], 4)
                log(f"containment vs golden: mean="
                    f"{extras['containment_mean']} min="
                    f"{extras['containment_min']} n={len(scores)}")
            except Exception as exc:  # noqa: BLE001 - report-only path
                log(f"containment check failed: {exc}")
        except _Timeout:
            # a correct stage that cannot finish inside 82x its baseline is
            # a FAILURE, not a footnote: flag it in the metric name
            log("correct-stage bench exceeded budget: CORRECT_TIMEOUT")
            extras["correct_s"] = None
            extras["correct_timeout"] = True
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, old)

    reads_per_s = len(reads) / dt
    metric = f"toyset_cluster_reads_per_s_warm_{backend}"
    if not parity:
        metric += "_PARITY_FAIL"
    if extras.get("correct_timeout"):
        metric += "_CORRECT_TIMEOUT"
    print(json.dumps({
        "metric": metric,
        "value": round(reads_per_s, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_s / BASELINE_READS_PER_S, 3),
        **extras,
    }))


if __name__ == "__main__":
    main()
