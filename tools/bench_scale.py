"""Large-scale synthetic clustering benchmark (the 1M-read north-star path).

Generates N synthetic nanopore-like reads (gene families with substitution
noise), clusters them through the production BulkClusterEngine, and reports
wall-clock + family purity.  Above CACHE_MAX_N the engine runs cache-free
with tiled sweeps, so device memory stays bounded by
[k_block x SWEEP_TILE] products + the sketch tables — not O(N^2).

Usage: python tools/bench_scale.py [n_reads] [n_families] [--mesh N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def synth_reads(n_reads: int, n_families: int, lo: int = 500, hi: int = 1500,
                err: float = 0.05, seed: int = 0):
    """Vectorized family generator: per family a random template; reads are
    length-trimmed, substitution-noised copies."""
    rng = np.random.default_rng(seed)
    fam_len = rng.integers(hi - 200, hi + 1, n_families)
    templates = [BASES[rng.integers(0, 4, l)] for l in fam_len]
    fam_of = rng.integers(0, n_families, n_reads)
    lens = rng.integers(lo, hi + 1, n_reads)
    reads = []
    for i in range(n_reads):
        t = templates[fam_of[i]]
        l = min(int(lens[i]), len(t))
        start = rng.integers(0, len(t) - l + 1)
        r = t[start:start + l].copy()
        nmut = rng.binomial(l, err)
        pos = rng.integers(0, l, nmut)
        r[pos] = BASES[rng.integers(0, 4, nmut)]
        reads.append(r.tobytes().decode("ascii"))
    order = np.argsort([-len(r) for r in reads], kind="stable")
    return [reads[i] for i in order], fam_of[order]


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_reads = int(args[0]) if args else 100_000
    n_fam = int(args[1]) if len(args) > 1 else n_reads // 15
    if "--cpu" in sys.argv:
        # the session sitecustomize forces jax_platforms programmatically;
        # env vars alone are not enough (see tests/conftest.py)
        import jax
        jax.config.update("jax_platforms", "cpu")
    mesh = None
    if "--mesh" in sys.argv:
        import jax
        nd = int(sys.argv[sys.argv.index("--mesh") + 1])
        mesh = jax.sharding.Mesh(np.array(jax.devices()[:nd]), ("data",))

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(__file__), "..",
                                       ".jax_cache"))
    from rattle_tpu.cluster.bulk import BulkClusterEngine
    from rattle_tpu.config import ClusterParams

    t0 = time.time()
    seqs, fam_of = synth_reads(n_reads, n_fam)
    print(f"generated {n_reads} reads / {n_fam} families "
          f"in {time.time() - t0:.1f}s", flush=True)

    import jax
    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    np.asarray((jax.numpy.arange(16) + 1))[:1]
    print(f"warmup {time.time() - t0:.1f}s", flush=True)

    params = ClusterParams(is_rna=True)
    t0 = time.time()
    engine = BulkClusterEngine(seqs, params, mesh=mesh)
    t_sketch = time.time() - t0
    print(f"sketch build {t_sketch:.1f}s  n_pad={engine.n_pad} "
          f"cache={'on' if engine.cache_n > 1 else 'off'}", flush=True)
    t0 = time.time()
    clusters = engine.cluster()
    t_cluster = time.time() - t0

    # purity: fraction of clusters whose members share one family
    pure = sum(1 for c in clusters
               if len({int(fam_of[s.seq_id]) for s in c.seqs}) == 1)
    print(f"cluster {n_reads} reads: {t_cluster:.1f}s "
          f"({n_reads / t_cluster:.0f} reads/s)  clusters={len(clusters)} "
          f"pure={pure}/{len(clusters)} "
          f"fallbacks={engine.n_oracle_fallbacks}", flush=True)
    phases = {k: round(v, 1) for k, v in engine.phase_times.items()}
    print(f"phases: {phases}", flush=True)
    mem = {}
    try:
        ms = jax.devices()[0].memory_stats() or {}
        mem = {k: v for k, v in ms.items()
               if "bytes" in k and ("peak" in k or "use" in k or "limit" in k)}
        print(f"device memory: {mem}", flush=True)
    except Exception as exc:  # platform may not expose stats
        print(f"device memory stats unavailable: {exc}", flush=True)
    import json
    print(json.dumps({
        "n_reads": n_reads, "n_families": n_fam,
        "sketch_s": round(t_sketch, 1), "cluster_s": round(t_cluster, 1),
        "reads_per_s": round(n_reads / t_cluster, 1),
        "clusters": len(clusters), "pure": pure,
        "fallbacks": engine.n_oracle_fallbacks, "phases": phases,
        "cache": "on" if engine.cache_n > 1 else "off", **mem}), flush=True)


if __name__ == "__main__":
    main()
