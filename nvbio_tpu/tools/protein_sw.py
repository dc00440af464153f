"""Protein Smith-Waterman CLI (examples/proteinsw equivalent).

Scores every query protein against every target protein with local
affine-gap SW over BLOSUM62, printing a TSV of best scores.

Ref parity: examples/proteinsw/proteinsw.cu — substitution-matrix
local alignment demo on the batched DP engine.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser(prog="protein_sw", description=__doc__)
    p.add_argument("queries", help="query protein FASTA")
    p.add_argument("targets", help="target protein FASTA")
    p.add_argument("-o", "--out", default="-", help="output TSV (- = stdout)")
    p.add_argument("--gap-open", type=int, default=10)
    p.add_argument("--gap-extend", type=int, default=1)
    from . import add_cpu_flag, maybe_cpu
    add_cpu_flag(p)
    args = p.parse_args(argv)
    maybe_cpu(args)

    import numpy as np
    import jax.numpy as jnp
    from ..alignment import AlignmentType
    from ..alignment.blosum import MatrixScheme
    from ..alignment.extra import full_score_batch
    from ..basic.alphabet import encode_protein, PROTEIN_X
    from ..io.fasta import read_fasta_text

    scheme = MatrixScheme(gap_open=args.gap_open,
                          gap_extend=args.gap_extend)
    qrecs = [(n, encode_protein(s)) for n, s in read_fasta_text(args.queries)]
    trecs = [(n, encode_protein(s)) for n, s in read_fasta_text(args.targets)]
    if not qrecs or not trecs:
        print("no sequences", file=sys.stderr)
        return 1

    LQ = max(len(s) for _, s in qrecs)
    LT = max(len(s) for _, s in trecs)
    Q, T = len(qrecs), len(trecs)
    pats = np.full((Q, LQ), PROTEIN_X, np.int32)
    plens = np.zeros(Q, np.int32)
    for i, (_, s) in enumerate(qrecs):
        pats[i, : len(s)] = s
        plens[i] = len(s)
    texts = np.full((T, LT), PROTEIN_X, np.int32)
    tlens = np.zeros(T, np.int32)
    for i, (_, s) in enumerate(trecs):
        texts[i, : len(s)] = s
        tlens[i] = len(s)

    # all-pairs batch
    pp = np.repeat(pats, T, axis=0)
    pl = np.repeat(plens, T)
    tt = np.tile(texts, (Q, 1))
    tl = np.tile(tlens, Q)
    res = full_score_batch(
        jnp.asarray(pp), jnp.asarray(pl), jnp.asarray(tt), jnp.asarray(tl),
        scheme=scheme, atype=AlignmentType.LOCAL,
    )
    scores = np.asarray(res["score"]).reshape(Q, T)

    out = sys.stdout if args.out == "-" else open(args.out, "w")
    print("query\ttarget\tscore", file=out)
    for i, (qn, _) in enumerate(qrecs):
        for j, (tn, _) in enumerate(trecs):
            print(f"{qn}\t{tn}\t{scores[i, j]}", file=out)
    if out is not sys.stdout:
        out.close()
    print(f"[protein_sw] {Q}x{T} alignments", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
