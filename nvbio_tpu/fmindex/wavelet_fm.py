"""Generic-alphabet FM-index over a wavelet-tree rank dictionary.

Ref parity: nvbio/fmindex/fmindex.h instantiated with the wavelet-tree
rank dictionary (strings/wavelet_tree.h) — the reference's protein
FM-index configuration.  The DNA path keeps its specialized 2-bit
popcount layout (fmindex/index.py); this module covers alphabets up to
32 symbols (protein = 22).

Same sentinel convention as the DNA index: the BWT row of the sentinel
holds a dummy symbol 0, ``rank`` subtracts it, C[c] counts the sentinel
once.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..strings.wavelet import WaveletTree, build_wavelet_tree, wt_rank
from ..sufsort import suffix_array, bwt_from_sa


class WaveletFMIndex(NamedTuple):
    wt: WaveletTree
    C: jnp.ndarray  # (sigma + 1,) int32
    primary: jnp.ndarray  # () int32
    n: jnp.ndarray  # () int32
    sigma: int


def build_wavelet_fm_index(text: np.ndarray, sigma: int) -> WaveletFMIndex:
    """Build for `text` (uint8 symbols in [0, sigma))."""
    text = np.asarray(text, dtype=np.uint8)
    if text.size and int(text.max()) >= sigma:
        raise ValueError("symbol out of range for sigma")
    n = len(text)
    sa = suffix_array(text)
    bwt, primary = bwt_from_sa(text, sa)
    wt = build_wavelet_tree(bwt.astype(np.int32), sigma)
    counts = np.bincount(text, minlength=sigma)
    C = np.zeros(sigma + 1, dtype=np.int32)
    C[0] = 1  # sentinel
    C[1:] = 1 + np.cumsum(counts)
    return WaveletFMIndex(
        wt=wt,
        C=jnp.asarray(C),
        primary=jnp.asarray(primary, jnp.int32),
        n=jnp.asarray(n, jnp.int32),
        sigma=sigma,
    )


def wfm_rank(fm: WaveletFMIndex, c, i):
    """occ(c, i) excluding the sentinel's dummy-0 slot."""
    cnt = wt_rank(fm.wt, c, i)
    return cnt - ((c == 0) & (i > fm.primary)).astype(jnp.int32)


def wfm_backward_search(fm: WaveletFMIndex, seeds, slens=None):
    """Batched exact backward search, generic alphabet.

    seeds: (N, L) int32 symbols in [0, sigma); slens: effective
    lengths.  Returns (lo, hi) SA ranges.
    """
    seeds = jnp.asarray(seeds, jnp.int32)
    N, L = seeds.shape
    if slens is None:
        slens = jnp.full((N,), L, jnp.int32)
    lo0 = jnp.zeros((N,), jnp.int32)
    hi0 = jnp.full((N,), fm.n + 1, jnp.int32)

    def step(carry, pos):
        lo, hi = carry
        c = seeds[:, pos]
        active = pos < slens
        bad = (c < 0) | (c >= fm.sigma)
        c_ = jnp.clip(c, 0, fm.sigma - 1)
        nlo = fm.C[c_] + wfm_rank(fm, c_, lo)
        nhi = fm.C[c_] + wfm_rank(fm, c_, hi)
        nlo = jnp.where(bad, 0, nlo)
        nhi = jnp.where(bad, 0, nhi)
        lo = jnp.where(active, nlo, lo)
        hi = jnp.where(active, nhi, hi)
        return (lo, hi), None

    (lo, hi), _ = jax.lax.scan(
        step, (lo0, hi0), jnp.arange(L - 1, -1, -1, dtype=jnp.int32)
    )
    return lo, hi
