"""Splice-site accuracy check (reference misc/ss_check.py).

Compares exons/introns/chains implied by a PAF alignment (minimap2 with
``--cs`` or cigar ``cg:Z:`` tags, N ops = introns) against a reference GTF,
reporting recall (reference features found) and known/novel fractions, per
feature level: intron, exon, intron_chain, exon_chain.

Coordinate conventions mirror the reference tool: GTF exon coords become
0-based inclusive [start-1, end-1]; introns span [prev_end+1, start-1];
PAF exons accumulate M/D ops, N ops close an exon and open an intron.
"""

from __future__ import annotations

import argparse
import re
import sys
from collections import Counter
from dataclasses import dataclass, field
from typing import Dict


@dataclass
class FeatureStats:
    known: Dict[str, str] = field(default_factory=dict)     # key -> tid
    observed: Counter = field(default_factory=Counter)      # key -> read count

    def summarize(self, level: str, beautiful: bool, title: str) -> str:
        found = {k for k in self.observed if k in self.known}
        count_known = sum(c for k, c in self.observed.items() if k in self.known)
        count_novel = sum(c for k, c in self.observed.items() if k not in self.known)
        total = count_known + count_novel
        n_ref = max(len(self.known), 1)
        n_tot = max(total, 1)
        if beautiful:
            return "\n".join([
                "#" * 40,
                f"# {title.center(36)} #",
                "#" * 40,
                f"In reference: {len(self.known)}",
                f"Unique in reads: {len(self.observed)}",
                f"Reference found: {len(found)}/{len(self.known)} "
                f"({len(found) * 100.0 / n_ref:.2f}%)",
                f"Total in reads: {total}",
                f"--> Known: {count_known} ({count_known * 100.0 / n_tot:.2f}%)",
                f"--> Novel: {count_novel} ({count_novel * 100.0 / n_tot:.2f}%)",
            ])
        return (f"{level},{len(self.known)},{len(self.observed)},{len(found)},"
                f"{len(found) / n_ref:.2f},{total},{count_known},{count_novel},"
                f"{count_known / n_tot:.2f},{count_novel / n_tot:.2f}")


def parse_gtf(path: str):
    """Returns (exons, introns, exon_chains, intron_chains, single_exons)."""
    tx: Dict[str, Dict[str, list]] = {}
    with open(path) as fh:
        for line in fh:
            if line.startswith("#"):
                continue
            info = line.split()
            if len(info) < 12 or info[2] != "exon":
                continue
            tid = info[11].replace('"', "").replace(";", "")
            chrom = info[0]
            start, end = int(info[3]) - 1, int(info[4]) - 1
            tx.setdefault(chrom, {}).setdefault(tid, []).append((start, end))

    exons = FeatureStats()
    introns = FeatureStats()
    exon_chains = FeatureStats()
    intron_chains = FeatureStats()
    single_exons = 0
    for chrom, tids in tx.items():
        for tid, ex in tids.items():
            ex.sort(key=lambda p: p[0])
            e_chain = chrom
            i_chain = chrom
            last_end = None
            for start, end in ex:
                exons.known[f"{chrom},{start}-{end}"] = tid
                e_chain += f",{start}-{end}"
                if last_end is not None:
                    introns.known[f"{chrom},{last_end}-{start - 1}"] = tid
                    i_chain += f",{last_end}-{start - 1}"
                last_end = end + 1
            exon_chains.known[e_chain] = tid
            if i_chain != chrom:
                intron_chains.known[i_chain] = tid
            else:
                single_exons += 1
    return exons, introns, exon_chains, intron_chains, single_exons


_CIGAR_RE = re.compile(r"([0-9]+)([A-Z=])", re.I)


def parse_paf_line(line: str):
    """Yields (exon_keys, exon_chain, intron_keys, intron_chain) for a read."""
    info = line.split()
    chrom = info[5]
    start = int(info[7])
    end = start - 1
    cg = None
    for f in info[12:]:
        if f.startswith("cg:Z:"):
            cg = f[5:]
            break
    if cg is None:
        return None
    exon_keys = []
    intron_keys = []
    e_chain_parts = []
    i_chain_parts = []
    for num, op in _CIGAR_RE.findall(cg):
        n = int(num)
        if op in ("M", "D", "="):
            end += n
        elif op == "N":
            exon_keys.append(f"{chrom},{start}-{end}")
            e_chain_parts.append((start, end))
            i_start, i_end = end + 1, end + n
            intron_keys.append(f"{chrom},{i_start}-{i_end}")
            i_chain_parts.append((i_start, i_end))
            start = end + n + 1
            end = start - 1
        elif op != "I":
            print(f"[ERR] Unsupported CIGAR op {n}{op}", file=sys.stderr)
    if end - start > 1:
        exon_keys.append(f"{chrom},{start}-{end}")
        e_chain_parts.append((start, end))
    e_chain = chrom + "".join(f",{a}-{b}" for a, b in e_chain_parts) \
        if e_chain_parts else ""
    i_chain = chrom + "".join(f",{a}-{b}" for a, b in i_chain_parts) \
        if i_chain_parts else ""
    return exon_keys, e_chain, intron_keys, i_chain


def main():
    ap = argparse.ArgumentParser(
        description="Known/novel splice sites from PAF alignment vs ref GTF")
    ap.add_argument("ref_gtf")
    ap.add_argument("aln_paf")
    ap.add_argument("--beautiful", action="store_true")
    args = ap.parse_args()

    exons, introns, exon_chains, intron_chains, single = parse_gtf(args.ref_gtf)
    print(f"[INFO] Single-exon transcripts: {single}", file=sys.stderr)

    with open(args.aln_paf) as fh:
        for line in fh:
            parsed = parse_paf_line(line)
            if parsed is None:
                continue
            e_keys, e_chain, i_keys, i_chain = parsed
            for k in set(e_keys):
                exons.observed[k] += 1
            for k in set(i_keys):
                introns.observed[k] += 1
            if e_chain:
                exon_chains.observed[e_chain] += 1
            if i_chain:
                intron_chains.observed[i_chain] += 1

    if not args.beautiful:
        print("level,known_in_ref,unique_in_reads,ref_found,p_ref_found,"
              "total_in_reads,known_in_total_reads,novel_in_total_reads,"
              "p_known_in_total_reads,p_novel_in_total_reads")
    print(introns.summarize("intron", args.beautiful, "INTRON LEVEL"))
    print(exons.summarize("exon", args.beautiful, "EXON LEVEL"))
    print(intron_chains.summarize("intron_chain", args.beautiful,
                                  "TRANSCRIPT LEVEL (INTRON CHAIN)"))
    print(exon_chains.summarize("exon_chain", args.beautiful,
                                "TRANSCRIPT LEVEL (EXON CHAIN)"))


if __name__ == "__main__":
    main()
