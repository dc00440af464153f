"""1-mismatch backtracking search vs brute-force occurrence counts."""

import numpy as np
import jax.numpy as jnp

from nvbio_tpu.fmindex import build_fm_index
from nvbio_tpu.fmindex.backtrack import hamming_backtrack_1


def _count_occ(text, pat):
    w = np.lib.stride_tricks.sliding_window_view(text, len(pat))
    return int((w == pat).all(axis=1).sum())


def test_backtrack_all_variants_exact_counts():
    rng = np.random.default_rng(0)
    n = 20000
    text = rng.integers(0, 4, n).astype(np.uint8)
    fm, _ = build_fm_index(text, sa_sample=16)

    L, Nq = 12, 20
    starts = rng.integers(0, n - L, Nq)
    seeds = np.stack([text[s : s + L] for s in starts]).astype(np.int32)
    seeds[0, 5] = (seeds[0, 5] + 1) % 4  # a seed that itself mismatches
    seeds[1] = rng.integers(0, 4, L)  # a random (likely absent) seed
    slens = np.full(Nq, L, np.int32)
    slens[2] = 8  # truncated seed

    res = hamming_backtrack_1(fm, jnp.asarray(seeds), jnp.asarray(slens))
    lo, hi = np.asarray(res["lo"]), np.asarray(res["hi"])
    val = np.asarray(res["valid"])
    elo, ehi = np.asarray(res["exact_lo"]), np.asarray(res["exact_hi"])
    for i in range(Nq):
        sl = slens[i]
        assert ehi[i] - elo[i] == _count_occ(text, seeds[i, :sl])
        for p in range(L):
            for b in range(4):
                if p < sl and b != seeds[i, p]:
                    v = seeds[i, :sl].copy()
                    v[p] = b
                    got = hi[i, p, b] - lo[i, p, b] if val[i, p, b] else 0
                    assert got == _count_occ(text, v), (i, p, b)
                else:
                    assert not val[i, p, b]


def test_backtrack_seed_with_n_masked():
    rng = np.random.default_rng(1)
    text = rng.integers(0, 4, 5000).astype(np.uint8)
    # plant a 1-substitution copy of text[200:208] at 400
    text[400:408] = text[200:208]
    text[404] = (text[404] + 1) % 4
    fm, _ = build_fm_index(text, sa_sample=16)
    seeds = np.stack([text[100:108], text[200:208]]).astype(np.int32)
    seeds[0, 3] = 4  # N inside the first seed
    res = hamming_backtrack_1(fm, jnp.asarray(seeds),
                              jnp.asarray(np.array([8, 8], np.int32)))
    val = np.asarray(res["valid"])
    assert not val[0].any()  # fully masked
    assert val[1].any()
