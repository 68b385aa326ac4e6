"""Full-toyset --iso parity: bulk engine vs the host CPU twin.

The round-4 verdict asked for iso evidence at toyset scale (the in-suite
iso tests stop at small synthetic fixtures).  This drives the FULL 8,306
read toyset through ``run_cluster(iso=True)`` twice:

* bulk engine (the production path: one grouped batched device pass for
  the transcript stage, main.cpp:280-323 semantics), and
* HostClusterEngine (the CPU twin, per-gene-cluster transcript passes —
  the reference's own loop structure), which is tested equal to the
  NumPy oracle at small scale (the oracle itself is O(N^2) Python and
  cannot run 8,306 reads in reasonable time).

Asserts the two clusters.out byte-identical and prints wall-clocks.

Run: JAX_PLATFORMS=cpu python tools/iso_toyset_check.py  (or on the TPU
without the env var for the production wall-clock).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.reconstruct_toyset import reconstruct  # noqa: E402
from rattle_tpu.config import ClusterParams, InputParams  # noqa: E402
from rattle_tpu.io import hpsio  # noqa: E402
from rattle_tpu.pipeline import stages  # noqa: E402


def main():
    sample = reconstruct()
    reads = stages.load_cluster_inputs(sample, "", InputParams(raw=True))
    gp = ClusterParams(is_rna=True)
    ip = ClusterParams(kmer_size=11, t_s=0.3, t_v=25.0, is_rna=True)
    out = {}
    for name in ("bulk", "host"):
        if name == "bulk":
            from rattle_tpu.cluster.bulk import cluster_reads_bulk as engine
        else:
            def engine(seqs, params):
                from rattle_tpu.cluster.host_engine import HostClusterEngine
                return HostClusterEngine(seqs, params).cluster()
        t0 = time.time()
        clusters = stages.run_cluster(reads, gp, iso=True, iso_params=ip,
                                      engine=engine)
        dt = time.time() - t0
        path = f"/tmp/iso_{name}.clusters.out"
        hpsio.write_clusters(clusters, path)
        out[name] = path
        print(f"{name}: {dt:.1f}s  {len(clusters)} transcript clusters",
              flush=True)
    a = open(out["bulk"], "rb").read()
    b = open(out["host"], "rb").read()
    assert a == b, "iso clusters.out DIVERGED between bulk and host engines"
    print(f"ISO_PARITY_OK ({len(a)} bytes identical)")


if __name__ == "__main__":
    main()
