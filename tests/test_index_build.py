"""Index-construction paths: device occ tables, histogram LUT,
parallel shard builds (ref: nvBWT/nvSSA, SURVEY.md §3.4/§4.4).
"""

import numpy as np
import pytest

from nvbio_tpu.utils.simulate import random_genome


def test_occ_device_equals_host_chunked(monkeypatch):
    """The accelerator occ build (packed-BWT popcounts + device
    cumsum) is bit-identical to the host slab loop ACROSS chunk
    boundaries: OCC_CHUNK_BLOCKS is patched down to 0.5 Mbp so a
    5 Mbp genome crosses ~10 boundaries and the running carry is
    really exercised (the old 100 Mbp version never crossed one —
    the default chunk is 134 Mbp — and burned 94 s of CI for the
    single-chunk path only)."""
    from nvbio_tpu.basic.packed import pack_2bit
    from nvbio_tpu.sufsort import suffix_array, bwt_from_sa
    from nvbio_tpu.fmindex import build as fb
    from nvbio_tpu.fmindex.build import (_occ_tables_host,
                                         occ_tables_device, BLOCK, WORDS)

    monkeypatch.setattr(fb, "OCC_CHUNK_BLOCKS", 1 << 12)
    g = random_genome(5_000_000, seed=71)
    sa = suffix_array(g)
    bwt, _primary = bwt_from_sa(g, sa)
    m = len(g) + 1
    n_blocks = (m + BLOCK - 1) // BLOCK + 1
    bwt_pad = np.zeros(n_blocks * BLOCK, np.uint8)
    bwt_pad[:m] = bwt
    words = pack_2bit(bwt_pad).reshape(n_blocks, WORDS)
    occ_abs_h, occ_sub_h = _occ_tables_host(bwt_pad, n_blocks)
    occ_abs_d, occ_sub_d = occ_tables_device(words)
    np.testing.assert_array_equal(occ_abs_h, occ_abs_d)
    np.testing.assert_array_equal(occ_sub_h, occ_sub_d)


def test_lut_histogram_matches_sa_searchsorted():
    """The histogram LUT equals the old SA-gather + searchsorted
    construction (and therefore the true backward-search ranges)."""
    from nvbio_tpu.sufsort import suffix_array
    from nvbio_tpu.fmindex.build import build_kmer_lut

    g = random_genome(200_000, seed=72)
    n = len(g)
    k = 8
    sa = np.asarray(suffix_array(g))
    # reference construction (pre-round-3 implementation)
    padded = np.concatenate([g & 3, np.zeros(k, np.uint8)])
    keys = np.zeros(n, np.int64)
    for j in range(k):
        keys = (keys << 2) | padded[j:j + n]
    sorted_keys = keys[sa] * 2 + (sa <= n - k)
    probes = np.arange(1 << (2 * k), dtype=np.int64) * 2 + 1
    lo_ref = np.searchsorted(sorted_keys, probes, side="left") + 1
    hi_ref = np.searchsorted(sorted_keys, probes, side="right") + 1

    lo, hi = build_kmer_lut(g, k=k)
    np.testing.assert_array_equal(lo, lo_ref.astype(np.int32))
    np.testing.assert_array_equal(hi, hi_ref.astype(np.int32))


def test_fused_native_bwt_occ_matches_numpy_stages():
    """The C++ fused BWT+pack+occ pass (fm_bwt_occ) is bit-identical
    to the separate NumPy stages for both SA dtypes, including the
    sentinel row and block-boundary edges."""
    from nvbio_tpu import native as nat
    from nvbio_tpu.basic.packed import pack_2bit
    from nvbio_tpu.fmindex import build as B
    from nvbio_tpu.sufsort import bwt_from_sa, suffix_array

    if nat.sais_lib() is None:
        pytest.skip("no native toolchain")
    for n in [1, 128, 129, 300_001]:
        g = random_genome(n, seed=200 + n)
        sa = np.asarray(suffix_array(g))
        for dt in (np.int32, np.int64):
            got = nat.fm_bwt_occ_native(g, sa.astype(dt))
            assert got is not None
            bwt, primary = bwt_from_sa(g, sa)
            m = n + 1
            n_blocks = (m + B.BLOCK - 1) // B.BLOCK + 1
            pad = np.zeros(n_blocks * B.BLOCK, np.uint8)
            pad[:m] = bwt
            words = pack_2bit(pad).reshape(n_blocks, B.WORDS)
            occ_abs, occ_sub = B._occ_tables_host(pad, n_blocks)
            np.testing.assert_array_equal(got[0], words)
            np.testing.assert_array_equal(got[1], occ_abs)
            np.testing.assert_array_equal(got[2], occ_sub)
            assert got[3] == primary


def test_native_ssa_build_matches_numpy():
    """The C++ one-pass SSA builder (marks + rank prefix + values)
    equals the NumPy mask/packbits/cumsum path for pow2 and non-pow2
    sampling, mono and bi marks, both SA dtypes."""
    from nvbio_tpu import native as nat
    from nvbio_tpu.fmindex import build as B
    from nvbio_tpu.sufsort import suffix_array

    if nat.sais_lib() is None:
        pytest.skip("no native toolchain")
    g = random_genome(100_003, seed=31)
    sa = np.asarray(suffix_array(g))
    for k in (4, 6):
        for bi in (False, True):
            for dt in (np.int32, np.int64):
                got = B.build_fm_arrays(g, sa_sample=k,
                                        sa=sa.astype(dt), bi_sample=bi)
                f1, f2 = nat.fm_bwt_occ_native, nat.ssa_build_native
                nat.fm_bwt_occ_native = lambda *a: None
                nat.ssa_build_native = lambda *a: None
                try:
                    want = B.build_fm_arrays(g, sa_sample=k, sa=sa,
                                             bi_sample=bi)
                finally:
                    nat.fm_bwt_occ_native = f1
                    nat.ssa_build_native = f2
                for a, b in zip(got[1], want[1]):
                    np.testing.assert_array_equal(np.asarray(a),
                                                  np.asarray(b))


def test_lut_native_histogram_matches_numpy_fallback():
    """The C++ kmer_hist fast path (both its direct and
    radix-partitioned branches) equals the blocked-NumPy fallback,
    including the short-suffix (is_full bit) and n<k edges."""
    from nvbio_tpu import native as nat
    from nvbio_tpu.fmindex import build as B

    if nat.sais_lib() is None:
        pytest.skip("no native toolchain")
    # k=6 -> direct-increment branch; k=11 -> partitioned branch
    # (chunk size 2^20, so 2^21+777 exercises chunk carry + remainder)
    for n, k in [(3, 7), (50_000, 6), ((1 << 21) + 777, 11)]:
        g = random_genome(n, seed=100 + k)
        lo_n, hi_n = B.build_kmer_lut(g, k=k)
        orig = nat.kmer_hist_native
        nat.kmer_hist_native = lambda *a: None
        try:
            lo_p, hi_p = B.build_kmer_lut(g, k=k)
        finally:
            nat.kmer_hist_native = orig
        np.testing.assert_array_equal(lo_n, lo_p)
        np.testing.assert_array_equal(hi_n, hi_p)


def test_parallel_shard_build_matches_sequential():
    """n_procs=2 worker-process shard builds produce arrays
    bit-identical to the sequential builder."""
    from nvbio_tpu.fmindex.sharded import build_sharded_index

    g = random_genome(400_000, seed=73)
    kw = dict(shard_bp=150_000, overlap=2048, sa_sample=8, lut_k=8)
    seq = build_sharded_index(g, **kw)
    par = build_sharded_index(g, n_procs=2, **kw)
    assert len(seq.shards) == len(par.shards) == 3
    for (f1, s1, l1, st1, ln1), (f2, s2, l2, st2, ln2) in zip(
            seq.shards, par.shards):
        assert (st1, ln1) == (st2, ln2)
        for a, b in zip(f1, f2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(s1.mark_words),
                                      np.asarray(s2.mark_words))
        np.testing.assert_array_equal(np.asarray(s1.vals),
                                      np.asarray(s2.vals))
        assert (s1.k, s1.bi) == (s2.k, s2.bi)
        np.testing.assert_array_equal(np.asarray(l1[0]), np.asarray(l2[0]))
        np.testing.assert_array_equal(np.asarray(l1[1]), np.asarray(l2[1]))
