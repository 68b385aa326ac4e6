"""Multi-host execution through parallel/launch.py (SURVEY §5: distributed
backend; §4: shard-count invariance).

Spawns TWO real processes that jax.distributed.initialize over localhost
(CPU backend, 2 virtual devices each -> a 4-device global mesh), assemble a
globally-sharded array from per-process slices, allgather it back, and run a
sharded computation.  Asserts:

* every process computes identical shard bounds with no communication,
* the allgathered array equals the full input on BOTH hosts,
* a jit over the global mesh produces the same result as single-process.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys
import numpy as np
sys.path.insert(0, os.environ["RATTLE_REPO"])
import jax
from rattle_tpu.parallel import launch

assert launch.init_distributed()
pid = jax.process_index()
assert jax.process_count() == 2
assert len(jax.devices()) == 4  # 2 local x 2 processes

n = 37
start, end = launch.process_shard_bounds(n)
# shard bounds must partition [0, n) across the two processes
bounds = [launch.process_shard_bounds(n, process_id=p, process_count=2)
          for p in (0, 1)]
assert bounds[0][0] == 0 and bounds[1][1] == n
assert bounds[0][1] == bounds[1][0]
assert (start, end) == bounds[pid]

mesh = launch.global_data_mesh()
rows = 8  # global row count must divide the mesh for row sharding
full = (np.arange(rows * 5) % 251).astype(np.int32).reshape(rows, 5)
lo, hi = launch.process_shard_bounds(rows)
sharded = launch.make_global_sharded(mesh, full[lo:hi])
back = launch.allgather_to_hosts(sharded)
assert np.array_equal(back, full), (pid, back)

# a sharded computation must match the single-process result on every host
import jax.numpy as jnp
out = jax.jit(lambda x: (x * 2 + 1).sum(axis=1))(sharded)
got = launch.allgather_to_hosts(out)
assert np.array_equal(got, (full.astype(np.int64) * 2 + 1).sum(axis=1)), pid
print(f"WORKER_OK {pid}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(300)
def test_two_process_launch(tmp_path):
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        # the axon sitecustomize registers the TPU plugin at interpreter
        # start, which initializes PJRT before the worker can call
        # jax.distributed.initialize; workers are CPU-only anyway
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.update({
            "RATTLE_REPO": repo,
            "RATTLE_COORDINATOR": f"127.0.0.1:{port}",
            "RATTLE_NUM_PROCESSES": "2",
            "RATTLE_PROCESS_ID": str(pid),
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"WORKER_OK {pid}" in out
