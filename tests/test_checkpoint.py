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
