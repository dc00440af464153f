"""FM-index vs brute force — exact equality (SURVEY.md §5.1:
fmindex_test pattern: build small index, match/locate vs brute force)."""

import numpy as np
import jax.numpy as jnp

from nvbio_tpu.fmindex import (
    build_fm_index,
    backward_search,
    rank,
    bwt_symbol,
    locate,
)
from nvbio_tpu.sufsort import suffix_array, bwt_from_sa


def _brute_sa(text):
    n = len(text)
    suf = sorted(range(n), key=lambda i: tuple(text[i:]))
    return np.array(suf, dtype=np.int64)


def test_suffix_array_small():
    rng = np.random.default_rng(0)
    for n in [1, 2, 5, 13, 100, 257]:
        t = rng.integers(0, 4, n).astype(np.uint8)
        np.testing.assert_array_equal(suffix_array(t), _brute_sa(t))


def test_suffix_array_repetitive():
    t = np.tile(np.array([0, 1, 0, 1, 0], dtype=np.uint8), 40)
    np.testing.assert_array_equal(suffix_array(t), _brute_sa(t))


def test_rank_matches_cumsum():
    rng = np.random.default_rng(1)
    text = rng.integers(0, 4, 5000).astype(np.uint8)
    fm, ssa = build_fm_index(text)
    sa = suffix_array(text)
    bwt, primary = bwt_from_sa(text, sa)
    # true occ over BWT *excluding* the sentinel slot
    true_bwt = bwt.astype(np.int64).copy()
    true_bwt[primary] = -1
    qs = rng.integers(0, len(bwt) + 1, 300).astype(np.int32)
    cs = rng.integers(0, 4, 300).astype(np.int32)
    expect = np.array([(true_bwt[:q] == c).sum() for q, c in zip(qs, cs)])
    got = np.asarray(rank(fm, jnp.asarray(cs), jnp.asarray(qs)))
    np.testing.assert_array_equal(got, expect)
    # bwt_symbol readback
    idx = rng.integers(0, len(bwt), 100).astype(np.int32)
    np.testing.assert_array_equal(
        np.asarray(bwt_symbol(fm, jnp.asarray(idx))), bwt[idx]
    )


def test_backward_search_and_locate():
    rng = np.random.default_rng(2)
    n = 20000
    text = rng.integers(0, 4, n).astype(np.uint8)
    fm, ssa = build_fm_index(text, sa_sample=16)

    L = 12
    n_seeds = 200
    # half sampled from the text (guaranteed hits), half random
    starts = rng.integers(0, n - L, n_seeds // 2)
    seeds = np.concatenate(
        [
            np.stack([text[s : s + L] for s in starts]),
            rng.integers(0, 4, (n_seeds // 2, L)),
        ]
    ).astype(np.int32)
    # one seed with an N: must return an empty range
    seeds[0, 3] = 4

    lo, hi = backward_search(fm, jnp.asarray(seeds))
    lo, hi = np.asarray(lo), np.asarray(hi)

    tb = text.tobytes()
    for s in range(n_seeds):
        pat = seeds[s].astype(np.uint8)
        if (pat > 3).any():
            assert hi[s] - lo[s] == 0
            continue
        # brute-force occurrence count
        pb = pat.tobytes()
        cnt = 0
        positions = []
        start = 0
        while True:
            p = tb.find(pb, start)
            if p < 0:
                break
            positions.append(p)
            cnt += 1
            start = p + 1
        assert hi[s] - lo[s] == cnt, f"seed {s}: {hi[s]-lo[s]} != {cnt}"
        if cnt:
            # locate every hit; as a set they must equal brute force
            idx = jnp.arange(lo[s], hi[s], dtype=jnp.int32)
            pos = np.asarray(locate(fm, ssa, idx, k_sample=16))
            assert sorted(pos.tolist()) == positions, f"seed {s}"


def test_locate_all_rows():
    rng = np.random.default_rng(3)
    n = 3000
    text = rng.integers(0, 4, n).astype(np.uint8)
    fm, ssa = build_fm_index(text, sa_sample=8)
    sa = suffix_array(text)
    sa_full = np.concatenate([[n], sa])
    idx = jnp.arange(n + 1, dtype=jnp.int32)
    pos = np.asarray(locate(fm, ssa, idx, k_sample=8))
    np.testing.assert_array_equal(pos, sa_full)
