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
    # optional FUSED block rows (fuse_occ): (n_blocks, 20) int32 =
    # [bwt words 0..7 | occ_abs 0..3 | occ_sub word-planes 0..7], so
    # one rank/LF touches ONE gathered row instead of three scattered
    # elements — the LF chain is the mapper's dominant term (round-5
    # substage split: 247 of 597 ms/shard).  Column picks within the
    # row are 20-lane masked reductions (VPU), not gathers.
    fused: jnp.ndarray | None = None


def fuse_occ(fm: FMIndex) -> FMIndex:
    """Attach the fused (n_blocks, 20) int32 block-row table (see
    FMIndex.fused).  Derived on device at mapper init; +40 B per
    128-symbol block of HBM (~0.6 B/bp) buys 3x fewer HBM gathers per
    rank in backward search and the SSA locate walk."""
    words_i = jax.lax.bitcast_convert_type(fm.bwt_words, jnp.int32)
    sub_i = jax.lax.bitcast_convert_type(fm.occ_sub, jnp.int32)
    fused = jnp.concatenate([words_i, fm.occ_abs, sub_i], axis=1)
    return fm._replace(fused=fused)


def _fused_row(fm: FMIndex, i):
    """One gathered block row for SA row(s) i: returns (row (..., 20)
    int32, w, r) with w the 16-symbol word index and r the in-word
    offset."""
    b = i >> 7
    w = (i >> 4) & 7
    r = i & 15
    return fm.fused[b], w, r


def _row_pick(row, col):
    """row[..., col] via a masked 20-lane reduction (no gather)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, row.shape, row.ndim - 1)
    return jnp.sum(jnp.where(lane == col[..., None], row, 0), axis=-1)


def _rank_fused(fm: FMIndex, c, i):
    """rank() over the fused row: one HBM gather per (c, i)."""
    row, w, r = _fused_row(fm, i)
    word = jax.lax.bitcast_convert_type(
        _row_pick(row, w).astype(jnp.int32), jnp.uint32)
    abs_c = _row_pick(row, 8 + c)
    sub_w = _row_pick(row, 12 + w)
    sub_c = (sub_w >> (8 * c)) & 0xFF  # occ_sub bytes are 0..112
    cnt = abs_c + sub_c + popc_2bit_prefix(
        word, c.astype(jnp.uint32), r.astype(jnp.uint32)
    ).astype(jnp.int32)
    return cnt - ((c == 0) & (i > fm.primary)).astype(jnp.int32)


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
    if fm.fused is not None:
        return _rank_fused(fm, c, i)
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
        if fm.fused is not None:
            # fully-fused LF: the block ROW gather also carries the
            # occ counts (FMIndex.fused) — 1 HBM gather per step
            row, w, r = _fused_row(fm, i)
            word = jax.lax.bitcast_convert_type(
                _row_pick(row, w).astype(jnp.int32), jnp.uint32)
            c = ((word >> (2 * (i & 15)).astype(jnp.uint32)) & 3
                 ).astype(jnp.int32)
            cnt = (
                _row_pick(row, 8 + c)
                + ((_row_pick(row, 12 + w) >> (8 * c)) & 0xFF)
                + popc_2bit_prefix(
                    word, c.astype(jnp.uint32), r.astype(jnp.uint32)
                ).astype(jnp.int32)
            )
        else:
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
