"""Benchmark: toyset clustering + correction throughput on the attached TPU.

Prints JSON record lines: {"metric", "value", "unit", "vs_baseline", ...}.
The record is emitted INCREMENTALLY — after every completed stage the full
record-so-far is printed as one JSON line (each line is a superset of the
previous one), so a timeout at any point still leaves the latest complete
record on stdout.  The driver may parse the first or last JSON line; both
are honest snapshots.

Baselines (reference README.md:396-404, 24 CPU threads):
  cluster  4.24 s  (~1,959 reads/s on the 8,306-read toyset)
  correct 10.947 s

Methodology.  The TPU here sits behind a relay whose FIRST interactions from
a fresh process stall in quantized ~64-68 s units (measured in round-3/4
probes; the quantum lives inside the relay binary and is not tunable), and
on bad days the stall degrades ~10x (round 4: a 711 s first roundtrip).
That is a session property, not a property of this framework: any
long-running deployment pays it once.  The bench therefore (a) absorbs it in
an explicit warmup roundtrip, (b) runs the workload twice — cold
(first-compile + first-touch) and warm — and (c) headlines the warm number,
reporting everything else (warmup, cold, per-stage breakdown) alongside.

Robustness contract (round-5, after round 4's record was erased by rc=124):
  * a WATCHDOG THREAD emits the record and hard-exits shortly before the
    driver's external timeout (signals cannot interrupt a C++-blocked
    device call; a thread can still print while the main thread blocks);
  * SIGTERM/SIGINT also flush the record before dying;
  * every stage runs under its own deadline-aware signal.alarm budget and a
    blown budget flags the record instead of erasing it.

Env knobs: RATTLE_BENCH_DEADLINE_S (default 1680 — the driver kills at
~1800), RATTLE_BENCH_CORRECT_BUDGET, RATTLE_BENCH_BACKEND=host,
RATTLE_BENCH_CORRECT=0, RATTLE_GOLDEN_DIR (default
/root/reference/toyset/rna/output).
"""

from __future__ import annotations

import json
import os
import signal
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

T0 = time.time()
BASE_CLUSTER_S = 4.24        # README.md:400, 24 threads
BASE_CORRECT_S = 10.947      # README.md:403, 24 threads
N_READS = 8306
BASELINE_READS_PER_S = N_READS / BASE_CLUSTER_S
DEADLINE_S = float(os.environ.get("RATTLE_BENCH_DEADLINE_S", "1680"))
GOLDEN_DIR = os.environ.get("RATTLE_GOLDEN_DIR",
                            "/root/reference/toyset/rna/output")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def remaining() -> float:
    return DEADLINE_S - (time.time() - T0)


class Record:
    """The incrementally-emitted bench record."""

    def __init__(self):
        self.extras = {}
        self.cluster_s = None       # headline warm (or cold-only) seconds
        self.cluster_kind = "none"  # none | cold | warm
        self.backend = "tpu"
        self.parity = None
        self._lock = threading.Lock()
        self._emitted = False

    def line(self) -> str:
        metric = f"toyset_cluster_reads_per_s_{self.cluster_kind}_" \
                 f"{self.backend}"
        value = round(N_READS / self.cluster_s, 1) if self.cluster_s else 0.0
        if self.parity is False:
            metric += "_PARITY_FAIL"
        if self.extras.get("correct_timeout"):
            metric += "_CORRECT_TIMEOUT"
        if self.extras.get("terminated"):
            metric += "_TERMINATED"
        return json.dumps({
            "metric": metric,
            "value": value,
            "unit": "reads/s",
            "vs_baseline": round(value / BASELINE_READS_PER_S, 3),
            **({"parity": self.parity} if self.parity is not None else {}),
            **self.extras,
        })

    def emit(self):
        with self._lock:
            if self.cluster_kind == "none" and not self.extras:
                return  # nothing measured yet: no record to defend
            print(self.line(), flush=True)
            self._emitted = True


REC = Record()


def _flush_and_die(signame):
    REC.extras["terminated"] = signame
    REC.emit()
    log(f"bench: flushed record on {signame}")
    os._exit(1)


def _watchdog():
    while True:
        left = remaining()
        if left <= 25:
            _flush_and_die("watchdog_deadline")
        time.sleep(min(left - 25, 10) if left > 35 else 2)


class _Timeout(Exception):
    pass


def _alarm(_sig, _frm):
    raise _Timeout()


class stage_budget:
    """signal.alarm budget clipped to the global deadline (main thread).

    Best-effort: an alarm cannot interrupt a C++-blocked device call — the
    watchdog thread is the real backstop — but it does stop runaway Python
    loops and lets later stages still run."""

    def __init__(self, seconds: float, reserve: float = 40.0):
        self.seconds = max(1, int(min(seconds, remaining() - reserve)))

    def __enter__(self):
        self._old = signal.signal(signal.SIGALRM, _alarm)
        signal.alarm(self.seconds)
        return self

    def __exit__(self, *exc):
        signal.alarm(0)
        signal.signal(signal.SIGALRM, self._old)
        return False


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


def bench_correct(final, sample):
    from rattle_tpu.config import CorrectParams
    from rattle_tpu.io import fastx
    from rattle_tpu.correct.driver import correct_reads
    from rattle_tpu.correct.tpu_runner import tpu_pack_runner, LAST_STATS
    creads = fastx.read_multiple_inputs([sample], [])
    n_bases = sum(len(r.seq) for r in creads)
    budget = float(os.environ.get("RATTLE_BENCH_CORRECT_BUDGET", "900"))
    with stage_budget(budget):
        t0 = time.time()
        res = correct_reads(final, creads, CorrectParams(),
                            pack_runner=tpu_pack_runner)
        correct_s = time.time() - t0
    log(f"correct: {correct_s:.2f}s  corrected={len(res.corrected)} "
        f"uncorrected={len(res.uncorrected)} consensi={len(res.consensi)}  "
        f"({n_bases / correct_s / 1e6:.2f} Mbases/s)  poa stats={LAST_STATS}")
    REC.extras["correct_s"] = round(correct_s, 2)
    REC.extras["correct_vs_baseline"] = round(BASE_CORRECT_S / correct_s, 3)
    REC.extras["poa_mbases_per_s"] = round(n_bases / correct_s / 1e6, 3)
    tot = LAST_STATS["device_bases"] + LAST_STATS["host_bases"]
    REC.extras["poa_device_share"] = round(
        LAST_STATS["device_bases"] / tot, 3) if tot else None
    REC.extras["poa_fallback_packs"] = LAST_STATS["fallback_packs"]
    for k, v in LAST_STATS.items():
        if k.startswith("fb_"):
            REC.extras[k] = v
    REC.extras["uncorrected"] = len(res.uncorrected)  # golden: 739
    REC.emit()

    # consensus quality floor vs the golden consensi (report-only)
    golden_fq = os.path.join(GOLDEN_DIR, "consensi.fq")
    if not os.path.exists(golden_fq):
        log(f"NOTE: golden consensi not found at {golden_fq} "
            f"(set RATTLE_GOLDEN_DIR); skipping containment floor")
        return
    try:
        from tools.validate_correct import kmer_containment
        gold = fastx.read_fastq_plain(golden_fq)
        gold_of = {int(g.header.split()[0].rsplit("_", 1)[1]): g
                   for g in gold}
        scores = []
        for r in res.consensi:
            cid = int(r.header.split()[0].rsplit("_", 1)[1])
            if cid in gold_of:
                scores.append(kmer_containment(gold_of[cid].seq, r.seq))
        scores.sort()
        REC.extras["containment_mean"] = round(sum(scores) / len(scores), 4)
        REC.extras["containment_min"] = round(scores[0], 4)
        log(f"containment vs golden: mean={REC.extras['containment_mean']} "
            f"min={REC.extras['containment_min']} n={len(scores)}")
        REC.emit()
    except Exception as exc:  # noqa: BLE001 - report-only path
        log(f"containment check failed: {exc}")


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(here, ".jax_cache"))
    signal.signal(signal.SIGTERM, lambda *_: _flush_and_die("SIGTERM"))
    signal.signal(signal.SIGINT, lambda *_: _flush_and_die("SIGINT"))
    threading.Thread(target=_watchdog, daemon=True).start()

    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from tools.reconstruct_toyset import reconstruct
    from rattle_tpu.config import ClusterParams, InputParams
    from rattle_tpu.pipeline.stages import load_cluster_inputs, run_cluster
    from rattle_tpu.io.hpsio import read_clusters

    sample = reconstruct()
    log("devices:", jax.devices())

    # ---- session warmup: absorb the relay's first-interaction stall ----
    t0 = time.time()
    np.asarray(jnp.arange(16) + 1)[:1]
    warmup_s = time.time() - t0
    log(f"warmup roundtrip: {warmup_s:.1f}s  (deadline in {remaining():.0f}s)")
    REC.extras["warmup_s"] = round(warmup_s, 1)

    reads = load_cluster_inputs(sample, "", InputParams(raw=True))
    params = ClusterParams(is_rna=True)
    seqs = [r.seq for r in reads]

    backend = os.environ.get("RATTLE_BENCH_BACKEND", "tpu")
    clusters = None
    try:
        if backend == "host":
            raise RuntimeError("host backend requested")
        with stage_budget(float(os.environ.get(
                "RATTLE_BENCH_CLUSTER_BUDGET", "1100"))):
            clusters, cold = run_cluster_once(seqs, params)
        log(f"cold:  {cold['total']:.2f}s  (sketch {cold['sketch']:.2f} "
            f"greedy {cold.get('greedy', 0):.2f} "
            f"merge {cold.get('merge', 0):.2f}) "
            f"clusters={len(clusters)} fallbacks={cold['fallbacks']}")
        REC.cluster_s = cold["total"]
        REC.cluster_kind = "cold"
        REC.extras["cold_s"] = round(cold["total"], 2)
        REC.emit()
        with stage_budget(400):
            clusters, warm = run_cluster_once(seqs, params)
        log(f"warm:  {warm['total']:.2f}s  (sketch {warm['sketch']:.2f} "
            f"greedy {warm.get('greedy', 0):.2f} "
            f"merge {warm.get('merge', 0):.2f}) "
            f"clusters={len(clusters)} fallbacks={warm['fallbacks']}")
        REC.cluster_s = warm["total"]
        REC.cluster_kind = "warm"
        REC.extras["stages"] = {k: round(v, 2) for k, v in warm.items()
                                if k != "fallbacks"}
        REC.emit()
    except (_Timeout, Exception) as exc:  # noqa: BLE001
        if clusters is None:
            log(f"TPU path failed ({type(exc).__name__}: {exc}); "
                f"host fallback")
            from rattle_tpu.cluster.host_engine import HostClusterEngine
            REC.backend = backend = "host"
            t0 = time.time()
            with stage_budget(600):
                engine = HostClusterEngine(seqs, params)
                clusters = engine.cluster()
            REC.cluster_s = time.time() - t0
            REC.cluster_kind = "warm"
        else:
            log(f"warm pass lost to {type(exc).__name__}; keeping cold")
    log(f"cluster {len(reads)} reads [{backend}]: "
        f"{REC.cluster_s:.2f}s {REC.cluster_kind} clusters={len(clusters)}")

    # ---- parity check vs golden ----
    final = run_cluster(reads, params, engine=lambda s, p: clusters)
    golden_clusters = os.path.join(GOLDEN_DIR, "clusters.out")
    if os.path.exists(golden_clusters):
        golden = read_clusters(golden_clusters)
        sig = lambda cs: [(c.main_seq.seq_id,
                           [(s.seq_id, s.rev) for s in c.seqs])
                          for c in cs]  # noqa: E731
        REC.parity = sig(final) == sig(golden)
        log(f"parity vs golden clusters.out: {REC.parity}")
    else:
        log(f"NOTE: golden clusters.out not found at {golden_clusters} "
            f"(set RATTLE_GOLDEN_DIR); parity unchecked")
    REC.emit()

    # ---- correct-stage benchmark (reference: 10.9s @ 24 threads) ----
    if os.environ.get("RATTLE_BENCH_CORRECT", "1") != "0" \
            and backend != "host" and remaining() > 120:
        try:
            bench_correct(final, sample)
        except _Timeout:
            # a correct stage that cannot finish inside its budget is a
            # FAILURE, not a footnote: flag it in the metric name — but
            # still report the per-cause device/host stats of the groups
            # that DID complete (on a degraded relay day the budget goes
            # to per-variant first-dispatch stalls, docs/RELAY.md)
            log("correct-stage bench exceeded budget: CORRECT_TIMEOUT")
            REC.extras["correct_s"] = None
            REC.extras["correct_timeout"] = True
            try:
                from rattle_tpu.correct.tpu_runner import LAST_STATS as LS
                from rattle_tpu.correct.pack_engine import PackEngine  # noqa: F401
                from rattle_tpu.correct import tpu_runner as _tr
                eng = _tr._PACK_ENGINE
                if eng is not None:
                    for k, v in eng.stats.items():
                        REC.extras[f"partial_{k}"] = v
            except Exception:  # noqa: BLE001 - reporting only
                pass
        except Exception as exc:  # noqa: BLE001
            log(f"correct-stage bench failed: {type(exc).__name__}: {exc}")
            REC.extras["correct_error"] = f"{type(exc).__name__}: {exc}"

    REC.emit()


if __name__ == "__main__":
    main()
