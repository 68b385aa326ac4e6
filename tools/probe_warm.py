"""True warm floor: run the bulk engine twice in ONE process on the toyset.

Separates sketch-build from clustering, cold from warm, with fetch-based
sync (block_until_ready does not sync on the axon relay).
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
print(f"devices: {jax.devices()}", flush=True)

from tools.reconstruct_toyset import reconstruct
from rattle_tpu.config import ClusterParams, InputParams
from rattle_tpu.pipeline.stages import load_cluster_inputs
from rattle_tpu.cluster.bulk import BulkClusterEngine
from rattle_tpu.ops.sketch_device import build_device_sketch

sample = reconstruct()
reads = load_cluster_inputs(sample, "", InputParams(raw=True))
params = ClusterParams(is_rna=True)
seqs = [r.seq for r in reads]
print(f"n={len(seqs)} max_len={max(len(s) for s in seqs)}", flush=True)

for rep in range(2):
    t0 = time.time()
    sk = build_device_sketch(seqs, params.kmer_size, not params.is_rna)
    # force completion with a tiny fetch
    np.asarray(jnp.ravel(sk.bvc)[:8])
    t_sk = time.time() - t0
    print(f"[rep {rep}] sketch build: {t_sk:.2f}s (kmax={sk.kmax}, "
          f"n_pad={sk.hbp.shape[0]})", flush=True)

    t0 = time.time()
    eng = BulkClusterEngine(seqs, params, sketch=sk)
    t_init = time.time() - t0
    print(f"[rep {rep}] engine init: {t_init:.2f}s", flush=True)

    t0 = time.time()
    clusters = eng.cluster()
    t_cl = time.time() - t0
    print(f"[rep {rep}] cluster: {t_cl:.2f}s  clusters={len(clusters)} "
          f"fallbacks={eng.n_oracle_fallbacks}", flush=True)
    print(f"[rep {rep}] TOTAL: {t_sk + t_init + t_cl:.2f}s", flush=True)
