"""Suffix-sort paths: native SA-IS, device prefix-doubling, set-BWT.

Strategy mirrors the reference's sufsort tests (SURVEY.md §5.1):
randomized inputs + scalar/NumPy oracle, exact equality.
"""

import numpy as np
import pytest

from nvbio_tpu.native import sais_native, sais_bwt_native
from nvbio_tpu.sufsort import (
    suffix_array,
    suffix_array_pd,
    suffix_array_device,
    bwt_from_sa,
    set_bwt_device,
    set_bwt_oracle,
)


def _brute_sa(t):
    t = list(t)
    return np.asarray(sorted(range(len(t)), key=lambda i: t[i:]),
                      dtype=np.int64)


def test_sais_matches_prefix_doubling_randomized():
    if sais_native(np.zeros(1, np.uint8)) is None:
        pytest.skip("no C++ toolchain")
    rng = np.random.default_rng(0)
    for _ in range(60):
        n = int(rng.integers(1, 4000))
        k = int(rng.integers(2, 6))
        t = rng.integers(0, k, n).astype(np.uint8)
        np.testing.assert_array_equal(sais_native(t), suffix_array_pd(t))


def test_sais_repetitive_stress():
    if sais_native(np.zeros(1, np.uint8)) is None:
        pytest.skip("no C++ toolchain")
    cases = [
        np.zeros(5000, np.uint8),
        np.tile([0, 1], 4000).astype(np.uint8),
        np.tile([0, 0, 1], 3000).astype(np.uint8),
        np.tile([3, 2, 1, 0], 2500).astype(np.uint8),
        np.tile([1, 0, 0, 0, 2], 2000).astype(np.uint8),
    ]
    for t in cases:
        np.testing.assert_array_equal(sais_native(t), suffix_array_pd(t))


def test_sais_bwt_native_matches_python():
    if sais_native(np.zeros(1, np.uint8)) is None:
        pytest.skip("no C++ toolchain")
    rng = np.random.default_rng(1)
    t = rng.integers(0, 4, 20000).astype(np.uint8)
    sa = sais_native(t)
    b1, p1 = sais_bwt_native(t, sa)
    b2, p2 = bwt_from_sa(t, sa)
    np.testing.assert_array_equal(b1, b2)
    assert p1 == p2


def test_suffix_array_dispatch_matches_brute():
    rng = np.random.default_rng(2)
    for _ in range(20):
        n = int(rng.integers(1, 300))
        t = rng.integers(0, 4, n).astype(np.uint8)
        np.testing.assert_array_equal(suffix_array(t), _brute_sa(t))


def test_suffix_array_device_matches_host():
    rng = np.random.default_rng(3)
    for _ in range(8):
        n = int(rng.integers(2, 6000))
        t = rng.integers(0, 4, n).astype(np.uint8)
        np.testing.assert_array_equal(suffix_array_device(t),
                                      suffix_array_pd(t))


def test_set_bwt_device_matches_oracle():
    rng = np.random.default_rng(4)
    for _ in range(6):
        R = int(rng.integers(1, 50))
        L = int(rng.integers(4, 40))
        lens = rng.integers(1, L + 1, R).astype(np.int32)
        reads = rng.integers(0, 4, (R, L)).astype(np.uint8)
        np.testing.assert_array_equal(set_bwt_device(reads, lens),
                                      set_bwt_oracle(reads, lens))


def test_set_bwt_duplicate_reads_tiebreak():
    # identical reads: sentinel order must follow read id (stable)
    reads = np.tile(np.array([[0, 1, 2, 3]], np.uint8), (5, 1))
    lens = np.full(5, 4, np.int32)
    np.testing.assert_array_equal(set_bwt_device(reads, lens),
                                  set_bwt_oracle(reads, lens))


def test_large_build_chunked_occ():
    # 2 Mbp end-to-end FM build exercising the slab-chunked occ path
    from nvbio_tpu.fmindex import build_fm_index
    from nvbio_tpu.fmindex.index import backward_search
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    n = 2_000_000
    t = rng.integers(0, 4, n).astype(np.uint8)
    fm, ssa = build_fm_index(t, sa_sample=32)
    # spot-check: search 50 planted 24-mers, ranges must be non-empty
    starts = rng.integers(0, n - 24, 50)
    seeds = np.stack([t[s : s + 24] for s in starts]).astype(np.int32)
    lo, hi = backward_search(fm, jnp.asarray(seeds))
    assert bool((np.asarray(hi) > np.asarray(lo)).all())


def test_suffix_array_device_mbp_and_repetitive():
    """Prefix doubling at Mbp scale (many doubling rounds) and on
    adversarially repetitive text (tandem repeats + homopolymer runs
    keep ranks tied for ~log(period*copies) rounds) vs host SA-IS."""
    from nvbio_tpu.sufsort import suffix_array

    rng = np.random.default_rng(44)
    t = rng.integers(0, 4, 2_000_000).astype(np.uint8)
    np.testing.assert_array_equal(suffix_array_device(t),
                                  suffix_array(t))
    unit = rng.integers(0, 4, 7).astype(np.uint8)
    t2 = np.concatenate([
        np.tile(unit, 40_000),          # 280 kb tandem array
        np.zeros(50_000, np.uint8),     # homopolymer run
        rng.integers(0, 4, 100_000).astype(np.uint8),
        np.tile(unit[::-1], 10_000),
    ])
    np.testing.assert_array_equal(suffix_array_device(t2),
                                  suffix_array(t2))


def test_suffix_array_bucketed_adversarial():
    """Shard-scale bucketed device sort (sufsort/bucketed.py) vs host
    SA-IS: forced multi-chunk splits, homopolymers, tandems at several
    periods, binary alphabet, and short texts (PD fallback)."""
    from nvbio_tpu.sufsort import suffix_array_bucketed

    rng = np.random.default_rng(11)
    unit7 = rng.integers(0, 4, 7).astype(np.uint8)
    unit100 = rng.integers(0, 4, 100).astype(np.uint8)
    cases = [
        rng.integers(0, 4, 5000).astype(np.uint8),
        np.zeros(6000, np.uint8),
        np.tile(unit7, 1200),
        np.tile(unit100, 90),
        np.concatenate([np.zeros(5000, np.uint8),
                        rng.integers(0, 4, 5000).astype(np.uint8),
                        np.zeros(5000, np.uint8)]),
        rng.integers(0, 2, 9000).astype(np.uint8),
        rng.integers(0, 4, 100).astype(np.uint8),  # < 4096: PD path
    ]
    for i, t in enumerate(cases):
        np.testing.assert_array_equal(
            suffix_array_bucketed(t, chunk_cap=4096), suffix_array(t),
            err_msg=f"case {i}")


def test_suffix_array_bucketed_repeat_structured():
    """The hg campaign's repeat classes (ALUs, segdups, tandems) at
    CI scale drive every phase: oversized buckets, the 64-symbol
    refinement ceiling, and multiple doubling rounds."""
    from nvbio_tpu.sufsort import suffix_array_bucketed
    from nvbio_tpu.utils.simulate import repeat_structured_genome

    t = repeat_structured_genome(1_000_000, seed=7)[0]
    np.testing.assert_array_equal(
        suffix_array_bucketed(t, chunk_cap=1 << 18), suffix_array(t))
