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


ENGINE_WORKER = r"""
import os, sys, random
import numpy as np
sys.path.insert(0, os.environ["RATTLE_REPO"])
import jax
from rattle_tpu.parallel import launch

assert launch.init_distributed()
pid = jax.process_index()
assert jax.process_count() == 2

# deterministic synthetic reads (identical on both hosts; the reference's
# global-index contract assigns ids before any sharding, main.cpp:27,47)
random.seed(42)
def mutate(base, n):
    s = list(base)
    for _ in range(n):
        op = random.random(); i = random.randrange(len(s))
        if op < 0.4: s[i] = random.choice("ACGT")
        elif op < 0.7: s.insert(i, random.choice("ACGT"))
        elif len(s) > 2: del s[i]
    return "".join(s)
fams = ["".join(random.choice("ACGT") for _ in range(random.randint(150, 240)))
        for _ in range(8)]
seqs = [mutate(fams[i % 8], random.randint(0, 12)) for i in range(96)]
seqs.sort(key=len, reverse=True)

from rattle_tpu.cluster.bulk import BulkClusterEngine
from rattle_tpu.config import ClusterParams
params = ClusterParams(is_rna=True)

# the PRODUCTION engine over the global 4-device, 2-process mesh
mesh = launch.global_data_mesh()
clusters_mesh = BulkClusterEngine(seqs, params, mesh=mesh).cluster()

# reference: same engine without a mesh (plain local arrays)
clusters_local = BulkClusterEngine(seqs, params).cluster()

sig = lambda cs: [(c.main_seq.seq_id,
                   [(s.seq_id, s.rev) for s in c.seqs]) for c in cs]
assert sig(clusters_mesh) == sig(clusters_local), (
    pid, len(clusters_mesh), len(clusters_local))
print(f"ENGINE_OK {pid} {len(clusters_mesh)}", flush=True)
"""


@pytest.mark.timeout(600)
def test_two_process_bulk_engine(tmp_path):
    """The full BulkClusterEngine over a 2-process global mesh produces the
    same clusters as the single-process engine, on BOTH hosts (SURVEY §4:
    shard-count invariance; §5 distributed backend)."""
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(2):
        env = dict(os.environ)
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
            [sys.executable, "-c", ENGINE_WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    n_clusters = set()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("ENGINE_OK")]
        assert line and line[0].split()[1] == str(pid)
        n_clusters.add(line[0].split()[2])
    assert len(n_clusters) == 1  # identical cluster count on both hosts


SHARD_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["RATTLE_REPO"])
from rattle_tpu.pipeline.cli import main
rc = main(["cluster", "-i", os.environ["RATTLE_IN"],
           "-o", os.environ["RATTLE_OUT"], "--rna", "--raw",
           "--shard-input"])
assert rc == 0
import jax
print(f"SHARD_OK {jax.process_index()}", flush=True)
"""


@pytest.mark.timeout(1200)
def test_two_process_shard_input_toyset_slice(tmp_path):
    """Per-host input sharding (SURVEY §8): 1,000 toyset reads split across
    2 processes — each parses only metadata plus its contiguous slice —
    produce a clusters.out byte-identical to the single-process engine's,
    written by process 0 only."""
    import subprocess as sp
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from tools.reconstruct_toyset import reconstruct
    full = reconstruct()
    with open(full) as fh:
        lines = fh.read().splitlines()
    slice_fq = tmp_path / "slice.fq"
    slice_fq.write_text("\n".join(lines[-4000:]) + "\n")  # 1,000 shortest

    def base_env():
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.update({"RATTLE_REPO": repo, "JAX_PLATFORMS": "cpu",
                    "RATTLE_IN": str(slice_fq)})
        return env

    # single-process reference run (same engine, no sharding)
    ref_out = tmp_path / "ref"
    ref_out.mkdir()
    env = base_env()
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    p = sp.run([sys.executable, "-m", "rattle_tpu.pipeline.cli", "cluster",
                "-i", str(slice_fq), "-o", str(ref_out), "--rna", "--raw"],
               env=env, capture_output=True, text=True, timeout=900)
    assert p.returncode == 0, p.stderr[-4000:]

    port = _free_port()
    procs = []
    outdirs = []
    for pid in range(2):
        outdir = tmp_path / f"out{pid}"
        outdir.mkdir()
        outdirs.append(outdir)
        env = base_env()
        env.update({
            "RATTLE_COORDINATOR": f"127.0.0.1:{port}",
            "RATTLE_NUM_PROCESSES": "2",
            "RATTLE_PROCESS_ID": str(pid),
            "RATTLE_OUT": str(outdir),
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        })
        procs.append(sp.Popen([sys.executable, "-c", SHARD_WORKER], env=env,
                              stdout=sp.PIPE, stderr=sp.STDOUT, text=True))
    outs = []
    for p_ in procs:
        try:
            out, _ = p_.communicate(timeout=1000)
        except sp.TimeoutExpired:
            p_.kill()
            out, _ = p_.communicate()
        outs.append(out)
    for pid, (p_, out) in enumerate(zip(procs, outs)):
        assert p_.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"
        assert f"SHARD_OK {pid}" in out
    # only process 0 writes; its output is byte-identical to the reference
    assert not (outdirs[1] / "clusters.out").exists()
    got = (outdirs[0] / "clusters.out").read_bytes()
    want = (ref_out / "clusters.out").read_bytes()
    assert got == want
