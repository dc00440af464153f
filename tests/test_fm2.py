"""2-step FM-index (fmindex/fm2.py) vs the single-step index — exact
equality on randomized texts (SURVEY.md §5.1 oracle-test pattern)."""

import numpy as np
import jax.numpy as jnp

from nvbio_tpu.fmindex import (
    build_fm_index,
    build_fm2,
    backward_search,
    backward_search2,
    locate,
    locate2,
    rank2,
)
from nvbio_tpu.fmindex.build import build_kmer_lut
from nvbio_tpu.sufsort import suffix_array, bwt_from_sa


def _pairs_brute(text):
    """pair2 per SA row by definition: (T[SA[i]-1], T[SA[i]-2])."""
    n = len(text)
    sa_full = np.empty(n + 1, np.int64)
    sa_full[0] = n
    sa_full[1:] = suffix_array(text)
    valid = sa_full >= 2
    p = np.where(
        valid,
        text[(sa_full - 1) % (n or 1)].astype(np.int64)
        + 4 * text[(sa_full - 2) % (n or 1)].astype(np.int64),
        -1,
    )
    return p  # -1 = sentinel-adjacent (excluded from rank2)


def test_rank2_matches_brute():
    rng = np.random.default_rng(7)
    for n in [3, 50, 500, 3001]:
        text = rng.integers(0, 4, n).astype(np.uint8)
        fm, _ = build_fm_index(text, sa_sample=4, bi_sample=True)
        fm2 = build_fm2(fm)
        pairs = _pairs_brute(text)
        m = n + 1
        qs = rng.integers(0, m + 1, 64)
        ps = rng.integers(0, 16, 64)
        want = np.array(
            [(pairs[:i] == p).sum() for p, i in zip(ps, qs)], np.int32
        )
        got = np.asarray(
            rank2(fm2, jnp.asarray(ps, jnp.int32), jnp.asarray(qs, jnp.int32))
        )
        np.testing.assert_array_equal(got, want)


def test_backward_search2_matches_single_step():
    rng = np.random.default_rng(8)
    for n, L in [(200, 7), (1000, 22), (1000, 21), (4000, 16)]:
        text = rng.integers(0, 4, n).astype(np.uint8)
        fm, _ = build_fm_index(text, sa_sample=4)
        fm2 = build_fm2(fm)
        seeds = rng.integers(0, 4, (64, L)).astype(np.int32)
        # plant exact substrings so non-empty ranges are exercised
        for r in range(0, 64, 2):
            s = rng.integers(0, n - L)
            seeds[r] = text[s : s + L]
        # a few N-containing seeds
        seeds[1, L // 2] = 4
        js = jnp.asarray(seeds)
        lo1, hi1 = backward_search(fm, js)
        lo2, hi2 = backward_search2(fm, fm2, js)
        np.testing.assert_array_equal(np.asarray(lo2), np.asarray(lo1))
        np.testing.assert_array_equal(np.asarray(hi2), np.asarray(hi1))


def test_backward_search2_with_lut():
    rng = np.random.default_rng(9)
    n, L, k = 3000, 22, 11
    text = rng.integers(0, 4, n).astype(np.uint8)
    sa = suffix_array(text)
    fm, _ = build_fm_index(text, sa_sample=4, sa=sa)
    fm2 = build_fm2(fm)
    lut = tuple(jnp.asarray(x) for x in build_kmer_lut(text, sa, k=k))
    seeds = rng.integers(0, 4, (48, L)).astype(np.int32)
    for r in range(0, 48, 2):
        s = rng.integers(0, n - L)
        seeds[r] = text[s : s + L]
    js = jnp.asarray(seeds)
    lo1, hi1 = backward_search(fm, js, lut=lut, lut_k=k)
    lo2, hi2 = backward_search2(fm, fm2, js, lut=lut, lut_k=k)
    np.testing.assert_array_equal(np.asarray(lo2), np.asarray(lo1))
    np.testing.assert_array_equal(np.asarray(hi2), np.asarray(hi1))


def test_locate2_matches_locate():
    rng = np.random.default_rng(10)
    for n, k in [(500, 4), (2000, 4), (2000, 8), (777, 2)]:
        text = rng.integers(0, 4, n).astype(np.uint8)
        fm, ssa = build_fm_index(text, sa_sample=k, bi_sample=True)
        fm2 = build_fm2(fm)
        idx = jnp.asarray(rng.integers(0, n + 1, 256), jnp.int32)
        want = np.asarray(locate(fm, ssa, idx, k_sample=k))
        got = np.asarray(locate2(fm, fm2, ssa, idx, k_sample=k))
        np.testing.assert_array_equal(got, want)


def test_locate2_exact_positions():
    """locate2 against ground-truth SA (not just the other locate)."""
    rng = np.random.default_rng(11)
    n, k = 1500, 4
    text = rng.integers(0, 4, n).astype(np.uint8)
    sa = suffix_array(text)
    fm, ssa = build_fm_index(text, sa_sample=k, sa=sa, bi_sample=True)
    fm2 = build_fm2(fm)
    sa_full = np.empty(n + 1, np.int64)
    sa_full[0] = n
    sa_full[1:] = sa
    idx = rng.integers(0, n + 1, 300)
    got = np.asarray(
        locate2(fm, fm2, ssa, jnp.asarray(idx, jnp.int32), k_sample=k)
    )
    np.testing.assert_array_equal(got, sa_full[idx])


def test_bi_marked_ssa_backward_compatible():
    """Single-step locate() still exact on a bi-marked SSA."""
    rng = np.random.default_rng(12)
    n, k = 1200, 4
    text = rng.integers(0, 4, n).astype(np.uint8)
    sa = suffix_array(text)
    fm, ssa = build_fm_index(text, sa_sample=k, sa=sa, bi_sample=True)
    sa_full = np.empty(n + 1, np.int64)
    sa_full[0] = n
    sa_full[1:] = sa
    idx = rng.integers(0, n + 1, 200)
    got = np.asarray(locate(fm, ssa, jnp.asarray(idx, jnp.int32), k_sample=k))
    np.testing.assert_array_equal(got, sa_full[idx])


def test_locate2_mono_matches_locate():
    """Mono-marked SSA double-step walk (locate2_mono) == single-step
    locate for every sampling rate, including the SA<2 edge rows the
    parallel check must catch (see fm2.locate2_mono docstring)."""
    from nvbio_tpu.fmindex import locate2_mono

    rng = np.random.default_rng(13)
    for n, k in [(500, 4), (2000, 4), (2000, 8), (777, 2), (900, 1),
                 (1100, 3), (1300, 5)]:
        text = rng.integers(0, 4, n).astype(np.uint8)
        fm, ssa = build_fm_index(text, sa_sample=k)  # MONO marks
        assert not getattr(ssa, "bi", 0)
        fm2 = build_fm2(fm)
        idx = jnp.asarray(rng.integers(0, n + 1, 512), jnp.int32)
        want = np.asarray(locate(fm, ssa, idx, k_sample=k))
        got = np.asarray(locate2_mono(fm, fm2, ssa, idx, k_sample=k))
        np.testing.assert_array_equal(got, want, err_msg=f"n={n} k={k}")


def test_locate2_mono_exact_positions_all_rows():
    """Every SA row (exhaustive) against ground truth — covers all
    walk parities and the sentinel-adjacent rows."""
    from nvbio_tpu.fmindex import locate2_mono

    rng = np.random.default_rng(14)
    n, k = 1500, 4
    text = rng.integers(0, 4, n).astype(np.uint8)
    sa = suffix_array(text)
    fm, ssa = build_fm_index(text, sa_sample=k, sa=sa)
    fm2 = build_fm2(fm)
    sa_full = np.empty(n + 1, np.int64)
    sa_full[0] = n
    sa_full[1:] = sa
    idx = np.arange(n + 1)
    got = np.asarray(locate2_mono(
        fm, fm2, ssa, jnp.asarray(idx, jnp.int32), k_sample=k))
    np.testing.assert_array_equal(got, sa_full)


def test_build_fm2_device_matches_host():
    """On-device chunked derivation == host build_fm2, bit for bit,
    across sizes that exercise the chunk tail overlap (n_blocks not a
    multiple of the chunk), tiny inputs, and the sentinel rows."""
    from nvbio_tpu.fmindex import build_fm2_device

    rng = np.random.default_rng(15)
    for n, cb in [(100, 4), (2048, 4), (5000, 8), (70_001, 64)]:
        text = rng.integers(0, 4, n).astype(np.uint8)
        fm, _ = build_fm_index(text, sa_sample=4)
        want = build_fm2(fm)
        got = build_fm2_device(fm, chunk_blocks=cb)
        for f in ("pair_words", "occ_abs", "occ_sub", "C2"):
            np.testing.assert_array_equal(
                np.asarray(getattr(got, f)),
                np.asarray(getattr(want, f)), err_msg=f"{f} n={n}")
        assert int(got.row_a) == int(want.row_a)
        assert int(got.row_b) == int(want.row_b)
