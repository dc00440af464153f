"""FM-index construction (host NumPy → device arrays).

Builds the blocked occurrence layout and sampled SA from a 2-bit text
(ambiguous bases must be substituted beforehand, as the reference's
nvBWT does — ref: nvBWT/nvBWT.cpp; io/fmindex/fmindex.cpp builds the
device occ tables the same way at load time).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..basic.packed import pack_2bit
from ..sufsort import suffix_array, bwt_from_sa
from .index import FMIndex, SSA

BLOCK = 128  # symbols per occ block
WORDS = BLOCK // 16


def build_fm_index(
    text: np.ndarray,
    sa_sample: int = 32,
    sa: np.ndarray | None = None,
    bi_sample: bool = False,
):
    """Build (FMIndex, SSA) for `text` (uint8 symbols 0..3).

    `sa` may be passed to reuse a precomputed suffix array.
    `bi_sample` marks SA values % sa_sample in {0, 1} (2x the samples)
    so fm2.locate2 can walk in LF² double-steps — parity-safe, and any
    single-step locate() still works (it stops at the first mark).
    Returns device-ready structures (jnp arrays).
    """
    text = np.asarray(text, dtype=np.uint8)
    n = len(text)
    if sa is None:
        sa = suffix_array(text)
    bwt, primary = bwt_from_sa(text, sa)
    m = n + 1  # BWT length including sentinel slot

    n_blocks = (m + BLOCK - 1) // BLOCK + 1  # +1: queries at i = n+1
    bwt_pad = np.zeros(n_blocks * BLOCK, dtype=np.uint8)
    bwt_pad[:m] = bwt

    # cumulative counts at 16-symbol word granularity, built in slabs so
    # hg-scale references stay within a few bytes/symbol of host RAM
    # (the dummy 'A' at `primary` is counted here and subtracted at
    # query time)
    n_words16 = n_blocks * WORDS
    word_counts = np.empty((n_words16, 4), dtype=np.int16)
    w16 = bwt_pad.reshape(n_words16, 16)
    SLAB = 1 << 22
    for s in range(0, n_words16, SLAB):
        sl = w16[s : s + SLAB]
        for c in range(4):
            word_counts[s : s + SLAB, c] = (sl == c).sum(axis=1)
    word_cum = np.zeros((n_words16, 4), dtype=np.int64)  # exclusive
    np.cumsum(word_counts[:-1], axis=0, out=word_cum[1:])
    block_cum = word_cum[::WORDS]
    occ_abs = block_cum.astype(np.int32)
    word_starts = word_cum.reshape(n_blocks, WORDS, 4)
    # in-block word deltas are <= 112 (7 words x 16 symbols): int8
    # is lossless — the BASELINE 'int8 occurrence layout' (4x less
    # HBM per rank gather at hg scale)
    occ_sub = (word_starts - block_cum[:, None, :]).astype(np.int8)

    bwt_words = pack_2bit(bwt_pad).reshape(n_blocks, WORDS)

    counts = np.bincount(text, minlength=4)
    C = np.zeros(5, dtype=np.int32)
    C[0] = 1  # sentinel
    C[1:] = 1 + np.cumsum(counts)[:4]
    # C[4] = n + 1 == total rows
    assert C[4] == m

    # sampled SA over rows of T+'$' (row 0 is the sentinel suffix)
    sa_full = np.empty(m, dtype=np.int32)
    sa_full[0] = n
    sa_full[1:] = sa
    thresh = 2 if bi_sample else 1
    if sa_sample & (sa_sample - 1) == 0:
        marked = (sa_full & (sa_sample - 1)) < thresh
    else:
        marked = (sa_full % sa_sample) < thresh
    vals = sa_full[marked]
    n_words = (n_blocks * BLOCK) // 32
    bits = np.zeros(n_words * 32, dtype=bool)
    bits[:m] = marked
    # LSB-first packing: bit r of word w = bits[32*w + r]
    words = np.packbits(bits.reshape(n_words, 32), axis=1, bitorder="little")
    mark_words = words.view("<u4").reshape(n_words)
    popc = bits.reshape(n_words, 32).sum(axis=1)
    mark_abs = np.zeros(n_words, dtype=np.int32)
    np.cumsum(popc[:-1], out=mark_abs[1:])

    fm = FMIndex(
        bwt_words=jnp.asarray(bwt_words),
        occ_abs=jnp.asarray(occ_abs),
        occ_sub=jnp.asarray(occ_sub),
        C=jnp.asarray(C),
        primary=jnp.asarray(primary, jnp.int32),
        n=jnp.asarray(n, jnp.int32),
    )
    ssa = SSA(
        mark_words=jnp.asarray(mark_words),
        mark_abs=jnp.asarray(mark_abs),
        vals=jnp.asarray(vals),
        k=int(sa_sample),
        bi=int(bool(bi_sample)),
    )
    return fm, ssa


def build_kmer_lut(text: np.ndarray, sa: np.ndarray, k: int = 11):
    """k-mer -> SA-range lookup table (lut_lo, lut_hi), each (4^k,)
    int32: the starting range for backward search after resolving the
    last k pattern symbols in one gather (SURVEY.md §7.3(2)).

    Short suffixes (len < k) sort before any full k-mer with the same
    prefix under the sentinel-smallest convention, which the build
    encodes with a key LSB: key = packed_prefix * 2 + is_full.
    """
    if k > 15:
        raise ValueError("k-mer LUT keys are int32: k <= 15")
    text = np.asarray(text, dtype=np.uint8)
    n = len(text)
    sa = np.asarray(sa)
    # rolling k-symbol keys over text padded with 'A' (short suffixes
    # get a padded key; the is_full bit orders them first)
    padded = np.concatenate([text & 3, np.zeros(k, np.uint8)])
    # in-place int32 rolling build: k <= 15 keys fit 30 bits, and
    # out=-form shift/or avoids 2 temporaries per round (measured 4x
    # on hg-scale: int64 temporaries were the build's hottest loop)
    keys = np.zeros(n + 1, dtype=np.int32)
    tmp = np.empty(n + 1, dtype=np.int32)
    for j in range(k):
        np.left_shift(keys, 2, out=keys)
        np.copyto(tmp, padded[j : j + n + 1], casting="unsafe")
        np.bitwise_or(keys, tmp, out=keys)
    keys = keys[:n]
    # sorted_keys[r] = 2 * key[sa[r]] + is_full, via chunked int32
    # gathers (int64 multiply-add cost another 2 passes)
    sorted_keys = np.empty(n, dtype=np.int64)
    CH = 1 << 24
    for s0 in range(0, n, CH):
        sl = sa[s0 : s0 + CH].astype(np.int64)
        sk = keys[sl].astype(np.int64) * 2
        sk += sl <= n - k
        sorted_keys[s0 : s0 + CH] = sk
    probes = np.arange(1 << (2 * k), dtype=np.int64) * 2 + 1
    lo = np.searchsorted(sorted_keys, probes, side="left") + 1
    hi = np.searchsorted(sorted_keys, probes, side="right") + 1
    return lo.astype(np.int32), hi.astype(np.int32)
