"""FM-index device structures and query ops (JAX).

Structures are NamedTuples of arrays (pytrees), replicable or shardable
with `jax.sharding`; all queries are batched and jit-safe.

Sentinel convention (BWA-style): the index is over T + '$' (sentinel
lexicographically smallest).  The BWT slot at row ``primary`` holds a
dummy 'A'; ``rank`` subtracts it, and ``C[c]`` includes +1 for the
sentinel.  SA row indices span [0, n+1).

Ref parity: fmindex/fmindex.h (``fm_index::rank``, ``match``,
``locate``), rank_dictionary.h (blocked counts + in-word 2-bit
popcount), ssa.h (sampled SA with mark bits + rank addressing).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..basic.packed import popc_2bit_prefix


class FMIndex(NamedTuple):
    bwt_words: jnp.ndarray  # (n_blocks, 8) uint32 — 128 symbols/block
    occ_abs: jnp.ndarray  # (n_blocks, 4) int32 — counts before block
    occ_sub: jnp.ndarray  # (n_blocks, 8, 4) int8 — within-block, before word
    C: jnp.ndarray  # (5,) int32 — C[c] = 1 + #{symbols < c}; C[4] = n+1
    primary: jnp.ndarray  # () int32 — BWT row of the sentinel
    n: jnp.ndarray  # () int32 — text length (without sentinel)


class SSA(NamedTuple):
    """Sampled suffix array: rows i with SA[i] % K == 0 are marked."""

    mark_words: jnp.ndarray  # (n_words,) uint32 bitvector over SA rows
    mark_abs: jnp.ndarray  # (n_words,) int32 exclusive popcount prefix
    vals: jnp.ndarray  # (n_marks,) int32 sampled SA values (by rank)
    k: int = 0  # build-time sampling rate (0 = unknown, legacy data);
    # locate() needs k_sample >= k or positions silently corrupt
    bi: int = 0  # 1 = rows with SA % k in {0, 1} are marked (enables
    # the fm2.locate2 double-step walk); 0 = SA % k == 0 only


def rank(fm: FMIndex, c, i):
    """occ(c, i): occurrences of symbol c in BWT[0:i), excluding the
    sentinel slot.  c, i: broadcastable int32 arrays; c in [0, 4)."""
    b = i >> 7
    w = (i >> 4) & 7
    r = i & 15
    words = fm.bwt_words[b, w]
    cnt = (
        fm.occ_abs[b, c]
        + fm.occ_sub[b, w, c].astype(jnp.int32)
        + popc_2bit_prefix(words, c.astype(jnp.uint32), r.astype(jnp.uint32)).astype(jnp.int32)
    )
    return cnt - ((c == 0) & (i > fm.primary)).astype(jnp.int32)


def bwt_symbol(fm: FMIndex, i):
    """BWT symbol at row(s) i (the sentinel slot reads as 'A')."""
    word = fm.bwt_words[i >> 7, (i >> 4) & 7]
    return ((word >> (2 * (i & 15)).astype(jnp.uint32)) & 3).astype(jnp.int32)


def lf(fm: FMIndex, i):
    """LF mapping: row of the predecessor text position."""
    c = bwt_symbol(fm, i)
    return fm.C[c] + rank(fm, c, i)


def backward_search(fm: FMIndex, seeds, slens=None, lut=None,
                    lut_k: int = 0):
    """Batched exact backward search.

    seeds: (N, L) int32 symbols, left-aligned; slens: (N,) effective
    lengths (None = all L).  Returns (lo, hi): SA ranges [lo, hi) of
    each seed; empty range (hi == lo) if the seed contains N or has no
    match.  (ref: fmindex.h ``match``; filter.h ``FMIndexFilter::rank``)

    `lut`: optional (lut_lo, lut_hi) k-mer range table (fixed-length
    seeds only): the LAST lut_k symbols resolve with a single gather,
    cutting the dependent rank4 chain from L to L - lut_k steps — the
    "k-step LF" latency fix from SURVEY.md §7.3(2).
    """
    N, L = seeds.shape
    use_lut = lut is not None and slens is None and 0 < lut_k <= L
    if slens is None:
        slens = jnp.full((N,), L, jnp.int32)
    if use_lut:
        tail = seeds[:, L - lut_k :].astype(jnp.int32)
        bad0 = (tail >= 4).any(axis=1)
        key = jnp.zeros((N,), jnp.int32)
        for j in range(lut_k):
            key = (key << 2) | (tail[:, j] & 3)
        lo0 = jnp.where(bad0, 0, lut[0][key])
        hi0 = jnp.where(bad0, 0, lut[1][key])
        scan_hi = L - lut_k
    else:
        lo0 = jnp.zeros((N,), jnp.int32)
        hi0 = jnp.full((N,), fm.n + 1, jnp.int32)
        scan_hi = L

    def step(carry, pos):
        lo, hi = carry
        c = seeds[:, pos].astype(jnp.int32)
        active = pos < slens
        bad = c >= 4
        c4 = jnp.minimum(c, 3)
        nlo = fm.C[c4] + rank(fm, c4, lo)
        nhi = fm.C[c4] + rank(fm, c4, hi)
        nlo = jnp.where(bad, 0, nlo)
        nhi = jnp.where(bad, 0, nhi)
        lo = jnp.where(active, nlo, lo)
        hi = jnp.where(active, nhi, hi)
        return (lo, hi), None

    (lo, hi), _ = jax.lax.scan(
        step, (lo0, hi0),
        jnp.arange(scan_hi - 1, -1, -1, dtype=jnp.int32),
    )
    return lo, hi


def _rank1(ssa: SSA, i):
    """# of marked SA rows < i."""
    w = i >> 5
    r = (i & 31).astype(jnp.uint32)
    word = ssa.mark_words[w]
    mask = jnp.where(r == 0, jnp.uint32(0), (~jnp.uint32(0)) >> (32 - r))
    return ssa.mark_abs[w] + jax.lax.population_count(word & mask).astype(
        jnp.int32
    )


def _is_marked(ssa: SSA, i):
    return ((ssa.mark_words[i >> 5] >> (i & 31).astype(jnp.uint32)) & 1) == 1


def locate(fm: FMIndex, ssa: SSA, idx, k_sample: int):
    """Translate SA row indices to text positions by LF-walking to the
    nearest sampled row (<= k_sample - 1 steps; ref: ssa.h +
    nvBowtie locate_inl.h).  idx: (N,) int32."""

    def step(carry, _):
        i, steps, done = carry
        done = done | _is_marked(ssa, i)
        # fused LF: one BWT-word gather serves both the symbol read and
        # the in-word popcount (the separate bwt_symbol+rank calls
        # would gather the same word twice — this loop is the mapper's
        # gather-bound hot spot, SURVEY.md §4.1)
        b = i >> 7
        w = (i >> 4) & 7
        r = i & 15
        word = fm.bwt_words[b, w]
        c = ((word >> (2 * (i & 15)).astype(jnp.uint32)) & 3).astype(
            jnp.int32)
        cnt = (
            fm.occ_abs[b, c]
            + fm.occ_sub[b, w, c].astype(jnp.int32)
            + popc_2bit_prefix(
                word, c.astype(jnp.uint32), r.astype(jnp.uint32)
            ).astype(jnp.int32)
        )
        cnt = cnt - ((c == 0) & (i > fm.primary)).astype(jnp.int32)
        nxt = fm.C[c] + cnt
        i = jnp.where(done, i, nxt)
        steps = steps + jnp.where(done, 0, 1)
        return (i, steps, done), None

    steps0 = jnp.zeros_like(idx)
    done0 = jnp.zeros(idx.shape, bool)
    (i, steps, done), _ = jax.lax.scan(
        step, (idx, steps0, done0), None, length=k_sample
    )
    return ssa.vals[_rank1(ssa, i)] + steps
