"""Build the reference `rattle` binary (if its submodules are available) and
compare its cluster output against ours on a given input.

The reference checkout at /root/reference lacks its two submodules (hps,
spoa — .gitmodules names them but they are not vendored), so `cluster`
modes build only if you supply checkouts via --hps/--spoa.  Without them
this script reports exactly what is missing instead of pretending.

Usage:
  python tools/ref_compare.py --input reads.fq [--mode rna|cdna|iso]
      [--ref /root/reference] [--hps PATH] [--spoa PATH]

What it does when a binary can be built:
  1. cmake/make spoa, then g++ the reference with -I hps -I spoa.
  2. run `rattle cluster` and `rattle-tpu cluster` with matching flags.
  3. compare clusters.out signatures via rattle_tpu.io.hpsio.
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_reference(ref: str, hps: str, spoa: str, out_dir: str) -> str:
    """Returns path to the built binary; raises with a clear message."""
    for name, path in (("hps", hps), ("spoa", spoa)):
        if not path or not os.path.isdir(path):
            raise SystemExit(
                f"reference submodule '{name}' not available: the checkout "
                f"at {ref} does not vendor it (see .gitmodules) and no "
                f"--{name} path was supplied. Cannot build the reference "
                "binary in this environment.")
    build = os.path.join(out_dir, "spoa_build")
    os.makedirs(build, exist_ok=True)
    subprocess.check_call(["cmake", "-S", spoa, "-B", build,
                           "-DCMAKE_BUILD_TYPE=Release"])
    subprocess.check_call(["make", "-C", build, "-j2"])
    srcs = [os.path.join(ref, f) for f in
            ("main.cpp", "cluster.cpp", "correct.cpp", "fasta.cpp",
             "kmer.cpp", "similarity.cpp", "utils.cpp")]
    binary = os.path.join(out_dir, "rattle")
    subprocess.check_call(
        ["g++", "-O3", "-std=c++14", "-pthread", "-o", binary, *srcs,
         f"-I{ref}", f"-I{hps}/src", f"-I{spoa}/include",
         f"-L{build}/lib", "-lspoa", "-lz"])
    return binary


def signatures(path: str):
    from rattle_tpu.io import hpsio
    return [(c.main_seq.seq_id, [(s.seq_id, s.rev) for s in c.seqs])
            for c in hpsio.read_clusters(path)]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--mode", default="rna", choices=("rna", "cdna", "iso"))
    ap.add_argument("--ref", default="/root/reference")
    ap.add_argument("--hps", default="")
    ap.add_argument("--spoa", default="")
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="refcmp_")
    binary = build_reference(args.ref, args.hps, args.spoa, tmp)

    ref_out = os.path.join(tmp, "ref")
    our_out = os.path.join(tmp, "ours")
    os.makedirs(ref_out)
    os.makedirs(our_out)
    flags = ["--raw"]
    if args.mode == "rna":
        flags.append("--rna")
    if args.mode == "iso":
        flags.append("--iso")
    subprocess.check_call([binary, "cluster", "-i", args.input,
                           "-o", ref_out, *flags])
    subprocess.check_call([sys.executable, "-m", "rattle_tpu.pipeline.cli",
                           "cluster", "-i", args.input, "-o", our_out,
                           *flags])
    a = signatures(os.path.join(ref_out, "clusters.out"))
    b = signatures(os.path.join(our_out, "clusters.out"))
    print(f"reference clusters: {len(a)}  ours: {len(b)}  equal: {a == b}")
    shutil.rmtree(tmp, ignore_errors=True)
    return 0 if a == b else 1


if __name__ == "__main__":
    raise SystemExit(main())
