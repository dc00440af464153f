"""Minimal FM-index mapper — the teaching version of the flagship.

Ref parity: examples/fmmap/fmmap.cu — the reference's stripped-down
seed-and-extend walkthrough.  ~40 lines of library calls: build an
index, search seeds, locate hits, extend with the banded kernel.

    python examples/fmmap.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from nvbio_tpu.fmindex import build_fm_index, backward_search, locate
from nvbio_tpu.alignment import (GotohScheme, AlignmentType,
                                 banded_score_batch)
from nvbio_tpu.utils.simulate import random_genome


def main():
    # 1. reference + index
    genome = random_genome(100_000, seed=1)
    fm, ssa = build_fm_index(genome, sa_sample=16)

    # 2. forward-strand fragments with a couple of substitutions
    # (the full mappers handle both strands; this demo stays forward)
    rng = np.random.default_rng(2)
    starts = rng.integers(0, 100_000 - 80, 16)
    reads = np.stack([genome[s : s + 80] for s in starts]).astype(np.int32)
    for r in range(16):
        p = rng.integers(25, 79)
        reads[r, p] = (reads[r, p] + 1) % 4
    true_pos = starts
    seeds = reads[:, :20]

    # 3. FM backward search -> SA ranges; take the first hit of each
    lo, hi = backward_search(fm, jnp.asarray(seeds))
    has_hit = np.asarray(hi - lo) > 0
    pos = np.asarray(locate(fm, ssa, lo, k_sample=16))

    # 4. banded extension of the full read at each hit diagonal
    W = 10
    gwin = np.full((16, 80 + 2 * W), 7, np.int8)
    gpad = np.concatenate([genome, np.full(80 + 2 * W, 7, np.uint8)])
    for r in range(16):
        gwin[r] = gpad[pos[r] : pos[r] + 80 + 2 * W]
    res = banded_score_batch(
        jnp.asarray(reads), jnp.full(16, 80, jnp.int32),
        jnp.asarray(gwin.astype(np.int32)), jnp.full(16, 100, jnp.int32),
        scheme=GotohScheme(), atype=AlignmentType.SEMI_GLOBAL, band_w=W,
    )
    for r in range(16):
        status = "hit" if has_hit[r] else "no-seed"
        print(f"read {r:2d}: {status:8s} pos={pos[r]:7d} "
              f"true={true_pos[r]:7d} score={int(res['score'][r])}")


if __name__ == "__main__":
    main()
