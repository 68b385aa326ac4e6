"""Multi-host launch wiring (SURVEY.md §5 "distributed communication backend").

The reference is single-process (std::thread + mutex, cluster.cpp:95-158);
the TPU-native scale story is multi-controller JAX:

* each host process calls :func:`init_distributed` (env-driven
  ``jax.distributed.initialize``),
* with ``--shard-input`` each host parses only the METADATA of all inputs
  (a streaming length scan, io/fastx.scan_multiple_inputs_cluster) plus the
  full content of its contiguous slice of the length-sorted read set
  (global-index contract of main.cpp:27,47 preserved — indices are assigned
  during the scan, before sharding, so every host agrees on them); sketch
  shards build natively per host (ops/sketch_device.build_device_sketch_
  sharded) and the rare host-rescore pairs fetch missing sequence content
  via a deterministic collective (cluster/bulk.BulkClusterEngine._ensure_
  seqs).  Without the flag every host parses the same full input,
* decisions run sharded over the GLOBAL device mesh
  (cluster/bulk.py's mesh mode: tables sharded along the reads axis),
* the decision matrix is allgathered and every host replays the greedy sweep
  identically (it is a pure function of the gathered data), so the outputs
  are byte-identical on every host with no further coordination.

Single-process multi-chip degenerates to the same code path with
``process_count() == 1``.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize multi-controller JAX from args or environment.

    Environment contract (set by the job launcher):
      RATTLE_COORDINATOR   host:port of process 0
      RATTLE_NUM_PROCESSES total process count
      RATTLE_PROCESS_ID    this process's rank

    Returns True when distributed mode is active.  No-env, no-args means
    single-process mode (returns False) — the common case on one host.
    """
    coordinator_address = coordinator_address or os.environ.get("RATTLE_COORDINATOR")
    if coordinator_address is None:
        return False
    num_processes = int(num_processes or os.environ["RATTLE_NUM_PROCESSES"])
    process_id = int(process_id if process_id is not None
                     else os.environ["RATTLE_PROCESS_ID"])
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def process_shard_bounds(n_items: int, process_id: Optional[int] = None,
                         process_count: Optional[int] = None) -> Tuple[int, int]:
    """[start, end) of this process's contiguous slice of ``n_items``.

    Slices are balanced to within one item; every process computes every
    bound deterministically (no communication)."""
    pc = process_count if process_count is not None else jax.process_count()
    pid = process_id if process_id is not None else jax.process_index()
    base, extra = divmod(n_items, pc)
    start = pid * base + min(pid, extra)
    end = start + base + (1 if pid < extra else 0)
    return start, end


def global_data_mesh(axis: str = "data"):
    """1-D mesh over every device of every process."""
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()), (axis,))


def make_global_sharded(mesh, local_rows: np.ndarray, axis: str = "data"):
    """Assemble a globally-sharded array from per-process row slices.

    ``local_rows`` is this process's contiguous slice (row-sharded along the
    mesh axis).  In single-process mode this is a plain device_put."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return jax.device_put(local_rows, sharding)
    global_shape = (_global_rows(local_rows.shape[0]), *local_rows.shape[1:])
    return jax.make_array_from_process_local_data(sharding, local_rows,
                                                  global_shape)


def _global_rows(local_n: int) -> int:
    import jax.experimental.multihost_utils as mhu
    total = mhu.process_allgather(np.array([local_n]))
    return int(np.sum(total))


def allgather_to_hosts(x) -> np.ndarray:
    """Materialize a (possibly sharded) global array on every host."""
    if jax.process_count() == 1:
        return np.asarray(x)
    import jax.experimental.multihost_utils as mhu
    return np.asarray(mhu.process_allgather(x, tiled=True))


def pad_rows(arr: np.ndarray, rows: int, fill=0) -> np.ndarray:
    out = np.full((rows, *arr.shape[1:]), fill, dtype=arr.dtype)
    out[: arr.shape[0]] = arr
    return out
