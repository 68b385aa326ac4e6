"""Pack-granular checkpoint/resume (utils/checkpoint.py + correct driver)."""

import numpy as np

from rattle_tpu.config import ClusterParams, CorrectParams
from rattle_tpu.correct.driver import correct_reads
from rattle_tpu.cluster.oracle import cluster_reads
from rattle_tpu.io.fastx import Read, sort_read_set
from rattle_tpu.utils.checkpoint import (CorrectCheckpoint, PackResult,
                                         params_key)


def _mk_reads(rng, n_fams=3, per_fam=8):
    from tests.conftest import make_read, mutate
    reads = []
    for fam in range(n_fams):
        ref = make_read(rng, int(rng.integers(200, 300)))
        for i in range(per_fam):
            seq = mutate(rng, ref, 0.08)
            reads.append(Read(f"@r{fam}_{i}", seq, str(len(reads)),
                              "I" * len(seq)))
    sort_read_set(reads)
    return reads


def test_checkpoint_roundtrip(tmp_path):
    d = str(tmp_path / "ck")
    key = params_key(a=1, b="x")
    ck = CorrectCheckpoint(d, key)
    ck.record(PackResult(0, [Read("@a", "ACGT", "+", "IIII")], [], "ACGT"))
    ck.record(PackResult(2, [], [Read("@b", "GGTT", "+", "KKKK")], "GG"))
    ck.flush()

    ck2 = CorrectCheckpoint(d, key)
    done = ck2.load()
    assert set(done) == {0, 2}
    assert done[0].corrected[0].seq == "ACGT"
    assert done[2].uncorrected[0].header == "@b"

    # wrong params -> discarded
    ck3 = CorrectCheckpoint(d, params_key(a=2))
    assert ck3.load() == {}

    ck2.finalize()
    assert CorrectCheckpoint(d, key).load() == {}


def test_checkpoint_torn_tail_write(tmp_path):
    d = str(tmp_path / "ck")
    key = params_key(x=1)
    ck = CorrectCheckpoint(d, key)
    ck.record(PackResult(0, [], [], "AAAA"))
    ck.flush()
    with open(ck.records_path, "a") as fh:
        fh.write('{"pack_id": 1, "corrected": [')  # torn write
    done = CorrectCheckpoint(d, key).load()
    assert set(done) == {0}


def test_correct_resume_is_byte_identical(tmp_path):
    rng = np.random.default_rng(7)
    reads = _mk_reads(rng)
    clusters = cluster_reads([r.seq for r in reads], ClusterParams(is_rna=True))
    p = CorrectParams(min_reads=2, split=4)

    def run(reads_in, ckdir=None, crash_after=None):
        rs = [Read(r.header, r.seq, r.ann, r.quality) for r in reads_in]
        calls = {"n": 0}
        if crash_after is not None:
            from rattle_tpu.correct import driver as drv
            orig = drv.process_pack

            def bomb(pk, pp, msa_fn):
                if calls["n"] >= crash_after:
                    raise KeyboardInterrupt
                calls["n"] += 1
                return orig(pk, pp, msa_fn)

            drv.process_pack = bomb
            try:
                return correct_reads(clusters, rs, p, checkpoint_dir=ckdir)
            finally:
                drv.process_pack = orig
        return correct_reads(clusters, rs, p, checkpoint_dir=ckdir)

    golden = run(reads)

    ckdir = str(tmp_path / "resume")
    try:
        run(reads, ckdir=ckdir, crash_after=1)  # crash mid-stage
        raise AssertionError("expected simulated crash")
    except KeyboardInterrupt:
        pass
    resumed = run(reads, ckdir=ckdir)

    fmt = lambda rs: [(r.header, r.seq, r.quality) for r in rs]  # noqa: E731
    assert fmt(resumed.corrected) == fmt(golden.corrected)
    assert fmt(resumed.uncorrected) == fmt(golden.uncorrected)
    assert fmt(resumed.consensi) == fmt(golden.consensi)
    resumed.checkpoint.finalize()


def test_process_shard_bounds():
    from rattle_tpu.parallel.launch import process_shard_bounds
    n = 103
    covered = []
    for pid in range(8):
        s, e = process_shard_bounds(n, pid, 8)
        covered.extend(range(s, e))
        assert e - s in (12, 13)
    assert covered == list(range(n))


# ---------------- cluster-stage checkpoint (ClusterCheckpoint) ----------------


def _cluster_seqs(rng, n_fams=5, per_fam=14):
    from tests.conftest import make_read, mutate
    seqs = []
    for fam in range(n_fams):
        ref = make_read(rng, int(rng.integers(220, 340)))
        for _ in range(per_fam):
            seqs.append(mutate(rng, ref, 0.08))
    seqs.sort(key=len, reverse=True)
    return seqs


def test_cluster_checkpoint_resume_identical(tmp_path):
    """A run killed after the greedy phase resumes from the manifest, replays
    only the merge rounds, and produces the identical cluster set."""
    from rattle_tpu.cluster.bulk import BulkClusterEngine, cluster_reads_bulk
    from rattle_tpu.config import bv_threshold_schedule

    rng = np.random.default_rng(7)
    seqs = _cluster_seqs(rng)
    params = ClusterParams(is_rna=False)
    d = str(tmp_path / "ck")

    full = cluster_reads_bulk(seqs, params, checkpoint_dir=d)
    import os
    assert not os.path.exists(d)  # finalize removed the manifest

    # crash simulation: stop right after the greedy-phase record
    class _Crash(RuntimeError):
        pass

    from rattle_tpu.utils import checkpoint as ckmod
    orig_record = ckmod.ClusterCheckpoint.record

    def crashing_record(self, phases_done, clusters):
        orig_record(self, phases_done, clusters)
        if phases_done == 1:
            raise _Crash()

    ckmod.ClusterCheckpoint.record = crashing_record
    try:
        try:
            cluster_reads_bulk(seqs, params, checkpoint_dir=d)
            raise AssertionError("crash did not fire")
        except _Crash:
            pass
    finally:
        ckmod.ClusterCheckpoint.record = orig_record
    assert os.path.exists(d)  # manifest survived the crash

    # resumed run must skip the greedy pass (merge rounds only) and agree
    calls = []
    orig_pass = BulkClusterEngine._greedy_pass

    def counting_pass(self, ids, threshold):
        calls.append(threshold)
        return orig_pass(self, ids, threshold)

    BulkClusterEngine._greedy_pass = counting_pass
    try:
        resumed = cluster_reads_bulk(seqs, params, checkpoint_dir=d)
    finally:
        BulkClusterEngine._greedy_pass = orig_pass
    assert calls == bv_threshold_schedule(params)  # no greedy-phase pass
    sig = lambda cs: [(c.main_seq.seq_id, c.main_seq.rev,
                       [(s.seq_id, s.rev) for s in c.seqs]) for c in cs]
    assert sig(resumed) == sig(full)
    assert not os.path.exists(d)


def test_cluster_checkpoint_stale_params_discarded(tmp_path):
    from rattle_tpu.utils.checkpoint import ClusterCheckpoint
    from rattle_tpu.io.hpsio import Cluster, CSeq

    d = str(tmp_path / "ck")
    ck = ClusterCheckpoint(d, "key-a")
    ck.record(1, [Cluster(CSeq(0, False), [CSeq(0, False), CSeq(1, True)])])
    got = ClusterCheckpoint(d, "key-a").load()
    assert got is not None and got[0] == 1
    assert got[1][0].seqs[1].seq_id == 1 and got[1][0].seqs[1].rev
    assert ClusterCheckpoint(d, "key-b").load() is None
