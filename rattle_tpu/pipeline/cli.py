"""``rattle-tpu`` command line — same five modes, flags, and defaults as the
reference binary (main.cpp:126-767)."""

from __future__ import annotations

import argparse
import os
import sys

from ..config import ClusterParams, CorrectParams, InputParams
from ..io import fastx, hpsio
from ..pipeline import stages


def _add_common_input(p):
    p.add_argument("-i", "--input", required=True,
                   help="input fasta/fastq file (required)")
    p.add_argument("-l", "--label", default="",
                   help="labels for the files in order of entry")


def _engine(args):
    if getattr(args, "oracle", False):
        from ..cluster.oracle import cluster_reads
        return cluster_reads
    import functools
    from ..cluster.bulk import cluster_reads_bulk
    ckdir = getattr(args, "checkpoint_dir", None)
    if ckdir is not None and getattr(args, "mode", None) == "cluster":
        cluster_reads_bulk = functools.partial(
            cluster_reads_bulk, checkpoint_dir=ckdir)
    n_mesh = getattr(args, "mesh_devices", 0)
    if n_mesh == 0:  # auto: span every attached device
        try:
            import jax
            n_mesh = len(jax.devices())
        except Exception:
            n_mesh = 1
    if n_mesh > 1:
        import functools
        import jax
        import numpy as np
        mesh = jax.sharding.Mesh(np.array(jax.devices()[:n_mesh]), ("data",))
        return functools.partial(cluster_reads_bulk, mesh=mesh)
    return cluster_reads_bulk


def _accelerator_present() -> bool:
    try:
        import jax
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _pack_runner(backend: str):
    """Resolve the correct/polish POA executor.

    auto: device-batched runner when a TPU is attached (the reference's #1
    hot loop, correct.cpp:377-478, belongs on the accelerator), host POA
    otherwise.  ``host`` forces the oracle path, ``tpu`` forces the device
    path (errors without a device)."""
    if backend == "host":
        return None
    if backend == "tpu" or (backend == "auto" and _accelerator_present()):
        from ..correct.tpu_runner import tpu_pack_runner
        return tpu_pack_runner
    return None


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    # multi-host launch contract (SURVEY §5 distributed backend): when
    # RATTLE_COORDINATOR/RATTLE_NUM_PROCESSES/RATTLE_PROCESS_ID are set by
    # the job launcher, join the multi-controller mesh before any jax use;
    # --mesh-devices' auto mode then spans the GLOBAL device set, sharding
    # the read tables across all hosts' chips.  Every host parses the same
    # inputs (global-index contract of main.cpp:27,47) and computes
    # identical outputs; only process 0 writes them.
    from ..parallel.launch import init_distributed
    distributed = init_distributed()
    top = argparse.ArgumentParser(prog="rattle-tpu")
    sub = top.add_subparsers(dest="mode", required=True)

    pc = sub.add_parser("cluster")
    _add_common_input(pc)
    pc.add_argument("-o", "--output", default=".")
    pc.add_argument("-t", "--threads", type=int, default=1)
    pc.add_argument("-k", "--kmer-size", type=int, default=10)
    pc.add_argument("-s", "--score-threshold", type=float, default=0.2)
    pc.add_argument("-v", "--max-variance", type=float, default=1000000)
    pc.add_argument("--iso", action="store_true")
    pc.add_argument("--iso-kmer-size", type=int, default=11)
    pc.add_argument("--iso-score-threshold", type=float, default=0.3)
    pc.add_argument("--iso-max-variance", type=float, default=25)
    pc.add_argument("-B", "--bv-start-threshold", type=float, default=0.4)
    pc.add_argument("-b", "--bv-end-threshold", type=float, default=0.2)
    pc.add_argument("-f", "--bv-falloff", type=float, default=0.05)
    pc.add_argument("-r", "--min-reads-cluster", type=int, default=0)
    pc.add_argument("-p", "--repr-percentile", type=float, default=0.15)
    pc.add_argument("--rna", action="store_true")
    pc.add_argument("--verbose", action="store_true")
    pc.add_argument("--raw", action="store_true")
    pc.add_argument("--lower-length", type=int, default=150)
    pc.add_argument("--upper-length", type=int, default=100000)
    pc.add_argument("--oracle", action="store_true",
                    help="use the NumPy oracle engine instead of the TPU path")
    pc.add_argument("--mesh-devices", type=int, default=0,
                    help="shard the engine over N devices (0 = all attached "
                    "devices, 1 = single-device)")
    pc.add_argument("--checkpoint-dir", default=None,
                    help="phase-granular resume manifest dir (greedy pass + "
                    "each merge round; bulk engine only — new capability, "
                    "the reference restarts the whole stage on a crash)")
    pc.add_argument("--shard-input", action="store_true",
                    help="multi-host: each process parses only metadata of "
                    "all inputs plus the content of its contiguous slice of "
                    "the length-sorted reads (requires the RATTLE_* "
                    "distributed env; incompatible with --iso/--oracle/"
                    "--checkpoint-dir)")

    pco = sub.add_parser("correct")
    _add_common_input(pco)
    pco.add_argument("-c", "--clusters", required=True)
    pco.add_argument("-o", "--output", default=".")
    pco.add_argument("-g", "--gap-occ", type=float, default=0.3)
    pco.add_argument("-m", "--min-occ", type=float, default=0.3)
    pco.add_argument("-s", "--split", type=int, default=200)
    pco.add_argument("-r", "--min-reads", type=int, default=5)
    pco.add_argument("-t", "--threads", type=int, default=1)
    pco.add_argument("--verbose", action="store_true")
    pco.add_argument("--poa-backend", choices=("auto", "tpu", "host"),
                     default="auto",
                     help="POA executor: auto = device-batched when a TPU "
                     "is attached, host = NumPy/native oracle")
    pco.add_argument("--checkpoint-dir", default=None,
                     help="pack-granular resume manifest dir (new capability; "
                     "the reference restarts the whole stage on a crash)")

    ps = sub.add_parser("cluster_summary")
    _add_common_input(ps)
    ps.add_argument("-c", "--clusters", required=True)

    pe = sub.add_parser("extract_clusters")
    _add_common_input(pe)
    pe.add_argument("-c", "--clusters", required=True)
    pe.add_argument("-o", "--output-folder", dest="output", default=".")
    pe.add_argument("-m", "--min-reads", type=int, default=0)
    pe.add_argument("--fastq", action="store_true")

    pp = sub.add_parser("polish")
    pp.add_argument("-i", "--input", required=True)
    pp.add_argument("-o", "--output-folder", dest="output", default=".")
    pp.add_argument("-l", "--label", default="")
    pp.add_argument("-t", "--threads", type=int, default=1)
    pp.add_argument("--rna", action="store_true")
    pp.add_argument("--verbose", action="store_true")
    pp.add_argument("--summary", action="store_true")
    pp.add_argument("--poa-backend", choices=("auto", "tpu", "host"),
                    default="auto")
    pp.add_argument("--oracle", action="store_true",
                    help="use the NumPy oracle cluster engine")

    args = top.parse_args(argv)
    mode = args.mode
    labels = [l for l in args.label.split(",") if l] if hasattr(args, "label") else []
    # every process computes identical outputs (same inputs, deterministic
    # replay); only process 0 writes them, in EVERY mode — concurrent
    # identical-path writes on a shared filesystem can interleave (ADVICE r4)
    is_writer = (not distributed
                 or __import__("jax").process_index() == 0)

    if mode == "cluster":
        if args.kmer_size > 16 or args.iso_kmer_size > 16:
            print("\nError: maximum kmer size = 16", file=sys.stderr)
            return 1
        print(f"RNA mode: {str(args.rna).lower()}", file=sys.stderr)
        inp = InputParams(raw=args.raw, lower_len=args.lower_length,
                          upper_len=args.upper_length)
        if getattr(args, "shard_input", False):
            if args.iso or args.oracle or args.checkpoint_dir:
                print("--shard-input is incompatible with --iso/--oracle/"
                      "--checkpoint-dir", file=sys.stderr)
                return 1
            from ..parallel.launch import global_data_mesh
            gp = ClusterParams(kmer_size=args.kmer_size,
                               t_s=args.score_threshold,
                               t_v=args.max_variance,
                               bv_threshold=args.bv_start_threshold,
                               bv_min_threshold=args.bv_end_threshold,
                               bv_falloff=args.bv_falloff,
                               min_reads_cluster=args.min_reads_cluster,
                               repr_percentile=args.repr_percentile,
                               is_rna=args.rna)
            clusters = stages.run_cluster_sharded(
                args.input, args.label, inp, gp, global_data_mesh(),
                verbose=args.verbose)
            print("gene clustering done", file=sys.stderr)
            print(f"{len(clusters)} gene clusters found", file=sys.stderr)
            if is_writer:
                hpsio.write_clusters(
                    clusters, os.path.join(args.output, "clusters.out"))
            return 0
        reads = stages.load_cluster_inputs(args.input, args.label, inp)
        print(f"Reads: {len(reads)}")
        gp = ClusterParams(kmer_size=args.kmer_size, t_s=args.score_threshold,
                           t_v=args.max_variance, bv_threshold=args.bv_start_threshold,
                           bv_min_threshold=args.bv_end_threshold,
                           bv_falloff=args.bv_falloff,
                           min_reads_cluster=args.min_reads_cluster,
                           repr_percentile=args.repr_percentile, is_rna=args.rna)
        ip = ClusterParams(kmer_size=args.iso_kmer_size,
                           t_s=args.iso_score_threshold, t_v=args.iso_max_variance,
                           bv_threshold=args.bv_start_threshold,
                           bv_min_threshold=args.bv_end_threshold,
                           bv_falloff=args.bv_falloff,
                           min_reads_cluster=args.min_reads_cluster,
                           repr_percentile=args.repr_percentile, is_rna=args.rna)
        clusters = stages.run_cluster(reads, gp, iso=args.iso, iso_params=ip,
                                      engine=_engine(args), verbose=args.verbose)
        kind = "isoform" if args.iso else "gene"
        print(f"{kind} clustering done", file=sys.stderr)
        print(f"{len(clusters)} {kind} clusters found", file=sys.stderr)
        if is_writer:
            hpsio.write_clusters(clusters,
                                 os.path.join(args.output, "clusters.out"))
        return 0

    if mode == "correct":
        from ..correct.driver import correct_reads
        files = [f for f in args.input.split(",") if f]
        reads = fastx.read_multiple_inputs(files, labels)
        clusters = hpsio.read_clusters(args.clusters)
        cp = CorrectParams(min_occ=args.min_occ, gap_occ=args.gap_occ,
                           split=args.split, min_reads=args.min_reads)
        res = correct_reads(clusters, reads, cp, labels=labels,
                            pack_runner=_pack_runner(args.poa_backend),
                            checkpoint_dir=args.checkpoint_dir,
                            verbose=args.verbose)
        if is_writer:
            fastx.write_fastq(res.corrected,
                              os.path.join(args.output, "corrected.fq"))
            fastx.write_fastq(res.uncorrected,
                              os.path.join(args.output, "uncorrected.fq"))
            fastx.write_fastq(res.consensi,
                              os.path.join(args.output, "consensi.fq"))
        if res.checkpoint is not None:
            res.checkpoint.finalize()  # stage artifacts are now the checkpoint
        print("Done", file=sys.stderr)
        return 0

    if mode == "cluster_summary":
        files = [f for f in args.input.split(",") if f]
        reads = fastx.read_multiple_inputs(files, labels)
        clusters = hpsio.read_clusters(args.clusters)
        try:
            for row in stages.cluster_summary_rows(reads, clusters):
                print(row)
        except BrokenPipeError:  # e.g. piped into head; exit quietly
            devnull = os.open(os.devnull, os.O_WRONLY)
            os.dup2(devnull, sys.stdout.fileno())
        return 0

    if mode == "extract_clusters":
        files = [f for f in args.input.split(",") if f]
        reads = fastx.read_multiple_inputs(files, labels)
        clusters = hpsio.read_clusters(args.clusters)
        if is_writer:
            stages.extract_clusters(reads, clusters, args.output,
                                    min_reads=args.min_reads, fastq=args.fastq)
        return 0

    if mode == "polish":
        from ..correct.polish import polish as run_polish
        reads = fastx.read_fastq_plain(args.input)
        consensi, summary_rows = run_polish(
            reads, args.rna, labels, cluster_engine=_engine(args),
            pack_runner=_pack_runner(args.poa_backend))
        if args.summary and is_writer:
            fastx.write_polish_summary(
                summary_rows, os.path.join(args.output, "polish_summary.tsv"))
        if is_writer:
            fastx.write_fastq(consensi,
                              os.path.join(args.output, "transcriptome.fq"))
        print("Done", file=sys.stderr)
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
