"""DP throughput microbenchmark (sw-benchmark equivalent).

Ref parity: sw-benchmark/sw-benchmark.cpp — GCUPS across aligners
(edit distance / SW / Gotoh) x alignment types x engines (Pallas TPU
kernel vs XLA twin), random near-match batches.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(prog="sw_benchmark", description=__doc__)
    p.add_argument("--batch", type=int, default=0,
                   help="alignments per run (default: backend-dependent)")
    p.add_argument("--read-len", type=int, default=100)
    p.add_argument("--band", type=int, default=15)
    p.add_argument("--iters", type=int, default=3)
    from . import add_cpu_flag, maybe_cpu
    add_cpu_flag(p)
    args = p.parse_args(argv)
    maybe_cpu(args)

    from ..utils.jax_cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    from ..alignment import GotohScheme, AlignmentType, EDIT_DISTANCE_SCHEME
    from ..alignment.types import BOWTIE2_LOCAL_SCHEME
    from ..alignment.batched import banded_score_batch
    from ..ops.banded_dp import banded_score_pallas

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    NB = args.batch or (1 << 19 if on_tpu else 1 << 12)
    LP, W = args.read_len, args.band
    LT = LP + 2 * W
    rng = np.random.default_rng(0)
    pats = rng.integers(0, 4, (NB, LP)).astype(np.int8)
    texts = rng.integers(0, 4, (NB, LT)).astype(np.int8)
    texts[:, W : W + LP] = pats
    plens = np.full(NB, LP, np.int32)
    tlens = np.full(NB, LT, np.int32)
    arr = tuple(map(jnp.asarray, (pats, plens, texts, tlens)))

    cases = [
        ("edit_distance", EDIT_DISTANCE_SCHEME, AlignmentType.SEMI_GLOBAL),
        ("gotoh_semi_global", GotohScheme(), AlignmentType.SEMI_GLOBAL),
        ("gotoh_local", BOWTIE2_LOCAL_SCHEME, AlignmentType.LOCAL),
        ("gotoh_global", GotohScheme(), AlignmentType.GLOBAL),
    ]
    engines = [("pallas" if on_tpu else "xla",
                banded_score_pallas if on_tpu else banded_score_batch)]
    rows = []
    for cname, scheme, atype in cases:
        for ename, fn in engines:
            f = jax.jit(lambda *a, s=scheme, t=atype, e=fn:
                        e(*a, scheme=s, atype=t, band_w=W)["score"])
            np.asarray(f(*arr))  # compile
            t0 = time.time()
            for _ in range(args.iters):
                np.asarray(f(*arr))
            dt = (time.time() - t0) / args.iters
            gcups = NB * LP * (2 * W + 1) / dt / 1e9
            rows.append({"aligner": cname, "engine": ename,
                         "gcups": round(gcups, 2),
                         "ms": round(dt * 1e3, 2)})
            print(f"{cname:20s} {ename:8s} {gcups:8.2f} GCUPS "
                  f"({dt*1e3:.1f} ms)", file=sys.stderr)

    # Myers bit-vector edit distance (full-matrix equivalent work)
    from ..alignment.myers import myers_edit_distance_batch

    fm_ = jax.jit(lambda p, pl, t, tl: myers_edit_distance_batch(
        p, pl, t, tl, atype=AlignmentType.SEMI_GLOBAL)[0])
    np.asarray(fm_(arr[0], arr[1], arr[2], arr[3]))
    t0 = time.time()
    for _ in range(args.iters):
        np.asarray(fm_(arr[0], arr[1], arr[2], arr[3]))
    dt = (time.time() - t0) / args.iters
    gcups = NB * LP * LT / dt / 1e9  # full-matrix cells
    rows.append({"aligner": "myers_edit_distance", "engine": "bitvector",
                 "gcups": round(gcups, 2), "ms": round(dt * 1e3, 2)})
    print(f"{'myers_edit_distance':20s} {'bitvec':8s} {gcups:8.2f} GCUPS "
          f"({dt*1e3:.1f} ms, full-matrix cells)", file=sys.stderr)

    if on_tpu:  # W_PAD scales with LP; the wrapper guards VMEM
        # Pallas Myers kernel (words-on-sublanes bit-parallel scan)
        from ..ops.myers_pallas import myers_pallas

        fp_ = jax.jit(lambda p, pl, t, tl: myers_pallas(
            p, pl, t, tl, atype=AlignmentType.SEMI_GLOBAL)[0])
        np.asarray(fp_(*arr))
        t0 = time.time()
        for _ in range(args.iters):
            np.asarray(fp_(*arr))
        dt = (time.time() - t0) / args.iters
        gcups = NB * LP * LT / dt / 1e9
        rows.append({"aligner": "myers_edit_distance",
                     "engine": "pallas_bitvector",
                     "gcups": round(gcups, 2), "ms": round(dt * 1e3, 2)})
        print(f"{'myers_edit_distance':20s} {'pallas':8s} {gcups:8.2f} "
              f"GCUPS ({dt*1e3:.1f} ms, full-matrix cells)",
              file=sys.stderr)

    if args.read_len > 512:
        # long-read row-blocked kernel is the dispatch target past 512
        print("(gotoh rows above used ops/long_dp.py — patterns beyond"
              " the resident-kernel VMEM reach)", file=sys.stderr)
    print(json.dumps(rows))
    return 0


if __name__ == "__main__":
    sys.exit(main())
