"""Correct-stage probe: host-engine clustering (fast, parity-exact) feeds
the TPU pack runner, so the POA engine's compile variants and warm
throughput can be measured without paying the TPU cluster passes.

Usage: python tools/probe_correct.py [reps]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
print(f"devices: {jax.devices()}", flush=True)

from tools.reconstruct_toyset import reconstruct  # noqa: E402
from rattle_tpu.config import ClusterParams, CorrectParams, InputParams  # noqa: E402
from rattle_tpu.io import fastx  # noqa: E402
from rattle_tpu.pipeline.stages import load_cluster_inputs, run_cluster  # noqa: E402
from rattle_tpu.cluster.host_engine import HostClusterEngine  # noqa: E402
from rattle_tpu.correct.driver import correct_reads  # noqa: E402
from rattle_tpu.correct.tpu_runner import tpu_pack_runner, LAST_STATS  # noqa: E402

sample = reconstruct()
reads = load_cluster_inputs(sample, "", InputParams(raw=True))
params = ClusterParams(is_rna=True)

t0 = time.time()
engine = HostClusterEngine([r.seq for r in reads], params)
clusters = engine.cluster()
final = run_cluster(reads, params, engine=lambda s, p: clusters)
print(f"host cluster: {time.time() - t0:.1f}s  ({len(final)} clusters)",
      flush=True)

creads = fastx.read_multiple_inputs([sample], [])
n_bases = sum(len(r.seq) for r in creads)
reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
for rep in range(reps):
    t0 = time.time()
    res = correct_reads(final, creads, CorrectParams(),
                        pack_runner=tpu_pack_runner)
    dt = time.time() - t0
    tot = LAST_STATS["device_bases"] + LAST_STATS["host_bases"]
    print(f"[rep {rep}] correct: {dt:.1f}s  "
          f"({n_bases / dt / 1e6:.3f} Mbases/s)  "
          f"consensi={len(res.consensi)} uncorrected={len(res.uncorrected)} "
          f"device_share={LAST_STATS['device_bases'] / tot:.3f} "
          f"stats={LAST_STATS}", flush=True)
