"""Wavelet tree: rank dictionary for alphabets beyond 2-bit DNA.

Ref parity: nvbio/strings/wavelet_tree.h (``WaveletTree``, ``rank()``)
— the reference uses it for protein FM-indexes where the 2-bit
popcount rank dictionary doesn't apply.

Layout: ``levels`` bit-planes (ceil(log2(sigma))), each a bitvector of
length n stored as u32 words plus a blocked popcount prefix (rank1 in
O(1)).  At level l the sequence is stably partitioned by bit l-1's
outcome, classic wavelet-tree construction; per-level node boundaries
are implicit in ``node_start``/``node_ones`` tables (<= 2^l nodes).

Queries are batched JAX: ``rank(wt, c, i)`` descends the levels with
vectorized gathers — O(levels) per query, each level one word gather +
popcount, which keeps protein backward search within a small constant
of the DNA path.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class WaveletTree(NamedTuple):
    # per level: bit-plane bitvector + blocked rank
    words: jnp.ndarray  # (levels, n_words) uint32, LSB-first bits
    block_rank: jnp.ndarray  # (levels, n_words) int32 exclusive 1-count
    node_start: jnp.ndarray  # (levels, n_nodes) int32 node offsets
    node_ones: jnp.ndarray  # (levels, n_nodes) int32 ones inside node
    n: jnp.ndarray  # () int32 sequence length
    levels: int
    sigma: int


def build_wavelet_tree(seq: np.ndarray, sigma: int) -> WaveletTree:
    """Host construction from int symbols in [0, sigma)."""
    seq = np.asarray(seq, dtype=np.int32)
    n = len(seq)
    levels = max(1, int(np.ceil(np.log2(max(sigma, 2)))))
    n_nodes = 1 << (levels - 1)
    n_words = max(1, (n + 31) // 32)

    words = np.zeros((levels, n_words), dtype=np.uint32)
    block_rank = np.zeros((levels, n_words), dtype=np.int32)
    node_start = np.zeros((levels, n_nodes), dtype=np.int32)
    node_ones = np.zeros((levels, n_nodes), dtype=np.int32)

    cur = seq
    # starts of the nodes at the current level (there are 2^l of them)
    starts = [0]
    for l in range(levels):
        bit = (cur >> (levels - 1 - l)) & 1
        # record bit-plane
        bits = np.zeros(n_words * 32, dtype=bool)
        bits[:n] = bit.astype(bool)
        packed = np.packbits(bits.reshape(n_words, 32), axis=1,
                             bitorder="little")
        words[l] = packed.view("<u4")[:, 0]
        popc = bits.reshape(n_words, 32).sum(axis=1)
        block_rank[l, 1:] = np.cumsum(popc[:-1])
        # node tables for this level
        for k, s in enumerate(starts):
            e = starts[k + 1] if k + 1 < len(starts) else n
            node_start[l, k] = s
            node_ones[l, k] = int(bit[s:e].sum())
        # stable partition inside each node for the next level
        if l + 1 < levels:
            nxt = np.empty_like(cur)
            nbit = np.empty_like(bit)
            new_starts = []
            for k, s in enumerate(starts):
                e = starts[k + 1] if k + 1 < len(starts) else n
                seg = cur[s:e]
                b = bit[s:e]
                z = seg[b == 0]
                o = seg[b == 1]
                nxt[s : s + len(z)] = z
                nxt[s + len(z) : e] = o
                new_starts.extend([s, s + len(z)])
            cur = nxt
            starts = new_starts

    return WaveletTree(
        words=jnp.asarray(words),
        block_rank=jnp.asarray(block_rank),
        node_start=jnp.asarray(node_start),
        node_ones=jnp.asarray(node_ones),
        n=jnp.asarray(n, jnp.int32),
        levels=levels,
        sigma=sigma,
    )


def _rank1_level(words_l, block_l, i):
    """# of set bits among the first i bits of level bitvector."""
    w = i >> 5
    r = (i & 31).astype(jnp.uint32)
    word = words_l[w]
    mask = jnp.where(r == 0, jnp.uint32(0), (~jnp.uint32(0)) >> (32 - r))
    return block_l[w] + jax.lax.population_count(word & mask).astype(
        jnp.int32)


def wt_rank(wt: WaveletTree, c, i):
    """rank(c, i): occurrences of symbol c in seq[0:i).  c, i: int32
    arrays (broadcastable); vectorized over elements."""
    c = jnp.asarray(c, jnp.int32)
    i = jnp.asarray(i, jnp.int32)
    node = jnp.zeros_like(c)
    pos = i
    for l in range(wt.levels):
        bit = (c >> (wt.levels - 1 - l)) & 1
        s = wt.node_start[l, node]
        ones_before = _rank1_level(wt.words[l], wt.block_rank[l],
                                   s + pos) - _rank1_level(
            wt.words[l], wt.block_rank[l], s)
        pos = jnp.where(bit == 1, ones_before, pos - ones_before)
        if l + 1 < wt.levels:
            # child node index at the next level
            node = 2 * node + bit
    return pos


def wt_access(wt: WaveletTree, i):
    """seq[i] reconstructed from the bit-planes (batched)."""
    i = jnp.asarray(i, jnp.int32)
    node = jnp.zeros_like(i)
    pos = i
    sym = jnp.zeros_like(i)
    for l in range(wt.levels):
        s = wt.node_start[l, node]
        gi = s + pos
        bit = ((wt.words[l][gi >> 5] >> (gi & 31).astype(jnp.uint32)) & 1
               ).astype(jnp.int32)
        ones_before = _rank1_level(wt.words[l], wt.block_rank[l],
                                   gi) - _rank1_level(
            wt.words[l], wt.block_rank[l], s)
        sym = (sym << 1) | bit
        pos = jnp.where(bit == 1, ones_before, pos - ones_before)
        if l + 1 < wt.levels:
            node = 2 * node + bit
    return sym
