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
):
    """Build (FMIndex, SSA) for `text` (uint8 symbols 0..3).

    `sa` may be passed to reuse a precomputed suffix array.
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

    # one-hot cumulative counts (the dummy 'A' at `primary` is counted
    # here and subtracted at query time)
    onehot = bwt_pad[:, None] == np.arange(4)[None, :]  # (m_pad, 4)
    csum = np.zeros((n_blocks * BLOCK + 1, 4), dtype=np.int64)
    np.cumsum(onehot, axis=0, out=csum[1:])
    occ_abs = csum[0 : n_blocks * BLOCK : BLOCK].astype(np.int32)
    word_starts = csum[0 : n_blocks * BLOCK : 16].reshape(n_blocks, WORDS, 4)
    occ_sub = (word_starts - occ_abs[:, None, :]).astype(np.int32)

    bwt_words = pack_2bit(bwt_pad).reshape(n_blocks, WORDS)

    counts = np.bincount(text, minlength=4)
    C = np.zeros(5, dtype=np.int32)
    C[0] = 1  # sentinel
    C[1:] = 1 + np.cumsum(counts)[:4]
    # C[4] = n + 1 == total rows
    assert C[4] == m

    # sampled SA over rows of T+'$' (row 0 is the sentinel suffix)
    sa_full = np.empty(m, dtype=np.int64)
    sa_full[0] = n
    sa_full[1:] = sa
    marked = (sa_full % sa_sample) == 0
    vals = sa_full[marked].astype(np.int32)
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
    )
    return fm, ssa
