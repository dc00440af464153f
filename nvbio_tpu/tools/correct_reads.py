"""Read error-correction CLI (nvLighter equivalent).

Ref parity: nvLighter/nvLighter.cu main — two passes over the FASTQ
(k-mer counting, then greedy correction), corrected FASTQ out.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(prog="correct_reads", description=__doc__)
    p.add_argument("fastq", help="input FASTQ(.gz)")
    p.add_argument("output", help="corrected FASTQ(.gz)")
    p.add_argument("-k", type=int, default=15, help="k-mer size (<= 15)")
    p.add_argument("--log2-slots", type=int, default=24,
                   help="count-min sketch size (2^n slots)")
    p.add_argument("--min-count", type=int, default=3)
    p.add_argument("--rounds", type=int, default=1,
                   help="correction sweeps (>1 fixes multi-error "
                        "k-windows, ref: Lighter's greedy loop)")
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--max-read-len", type=int, default=320)
    from . import add_cpu_flag, maybe_cpu
    add_cpu_flag(p)
    args = p.parse_args(argv)
    maybe_cpu(args)

    from ..io.fastq import FastqBatchReader, write_fastq
    from ..strings import pack_reads
    from ..models.corrector import Corrector

    # pass 1: count k-mers
    batches = []
    for names, seqs, quals in FastqBatchReader(args.fastq, args.batch):
        reads, lens, qmat, _ = pack_reads(seqs, quals,
                                          max_len=args.max_read_len)
        batches.append((names, reads, lens, qmat))
    corr = Corrector.build(
        (b[1] for b in batches), (b[2] for b in batches),
        k=args.k, log2_slots=args.log2_slots,
    )
    # pass 2: correct and write
    out = []
    total = fixed = 0
    for names, reads, lens, qmat in batches:
        creads, ncorr = corr.correct(reads, lens,
                                     min_count=args.min_count,
                                     rounds=args.rounds)
        total += len(names)
        fixed += int(ncorr.sum())
        for i, nm in enumerate(names):
            out.append((nm, creads[i, : lens[i]].astype(np.uint8),
                        qmat[i, : lens[i]]))
    write_fastq(args.output, out)
    print(f"[correct_reads] {total} reads, {fixed} corrections",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
