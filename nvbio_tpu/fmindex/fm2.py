"""2-step FM-index (pair-BWT): halved dependent-gather chains.

The mapper's two hot loops — backward search and the SSA locate walk —
are chains of LF gathers; on TPU their cost is the *number of gathered
indices* (XLA lowers gathers to ~per-index work), so the win is
consuming two pattern symbols / two text steps per gather round with
the SAME per-round gather count as the 1-step index.  This is the k=2
case of the n-step FM-index construction (Chacón et al. 2013): a
derived pair-BWT

    pair2[i] = BWT[i] | (BWT[LF(i)] << 2)        (a nibble in [0, 16))

with the same blocked occurrence layout as fmindex.index (absolute
int32 per 128-pair block + int8 per-8-pair-word deltas + packed pair
words), so one rank2 touches exactly three gathered elements — like
rank() — but:

    backward search consumes TWO pattern symbols per round:
        range' = C2[c2 | (c1 << 2)] + rank2(c2 | (c1 << 2), range)
    the locate walk takes TWO text steps per round:
        LF²(i) = C2[pair2[i]] + rank2(pair2[i], i)

where C2[p] = C[p >> 2] + rank(p >> 2, C[p & 3]) is a 16-entry table.

Combined with a *bi-marked* SSA (rows with SA[i] % K in {0, 1} sampled,
see build.build_fm_index(bi_sample=True)), the locate walk needs at
most floor((K-1)/2) double-steps — one for the default K=4 — instead
of up to K-1 single steps.

Everything here is DERIVED from the standard FMIndex at load time
(build_fm2, host NumPy, chunked): no index-format change, ~3 bytes/bp
of extra device memory, opt-out via MapperParams.use_fm2 for
memory-tight hg-scale multi-shard runs.

Ref parity: the reference reaches the same goal with texture-cached
rank4() gathers (rank_dictionary.h); on TPU the win is shortening the
dependent chain, which no cache can do.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .index import FMIndex, SSA, rank, _is_marked, _rank1

BLOCK2 = 128  # pairs per occ block (16 words x 8 nibbles)
_M1 = jnp.uint32(0x11111111)
_M7 = jnp.uint32(0x77777777)


class FM2(NamedTuple):
    """Derived pair-BWT structures (device pytree)."""

    pair_words: jnp.ndarray  # (n_blocks, 16) uint32 — 8 nibble pairs/word
    occ_abs: jnp.ndarray  # (n_blocks, 16) int32 — pair counts before block
    occ_sub: jnp.ndarray  # (n_blocks, 16, 16) int8 — within-block deltas
    C2: jnp.ndarray  # (16,) int32 — C2[c2 | (c1 << 2)]
    row_a: jnp.ndarray  # () int32 — row of SA=0 (primary): pair invalid
    row_b: jnp.ndarray  # () int32 — row of SA=1: second symbol is '$'


def _popc_nibble_prefix(word, p, rn):
    """# of nibbles equal to p among the first rn nibbles of word
    (SWAR zero-nibble detect; one bit set per matching nibble)."""
    y = word ^ (p.astype(jnp.uint32) * _M1)
    z = ~((((y & _M7) + _M7) | y) | _M7)
    mask = (jnp.uint32(1) << (4 * rn).astype(jnp.uint32)) - jnp.uint32(1)
    return jax.lax.population_count(z & mask).astype(jnp.int32)


def rank2(fm2: FM2, p, i):
    """#{j < i : pair2[j] == p}.  p, i broadcastable int32 arrays; the
    two sentinel-adjacent rows (pairs stored as 0) are excluded.
    Exactly three gathered elements per query — the TPU cost model's
    unit — same as the 1-step rank()."""
    b = i >> 7
    w = (i >> 3) & 15
    rn = i & 7
    word = fm2.pair_words[b, w]
    cnt = (
        fm2.occ_abs[b, p]
        + fm2.occ_sub[b, w, p].astype(jnp.int32)
        + _popc_nibble_prefix(word, p, rn)
    )
    corr = ((p == 0) & (i > fm2.row_a)).astype(jnp.int32) + (
        (p == 0) & (i > fm2.row_b)
    ).astype(jnp.int32)
    return cnt - corr


def backward_search2(fm: FMIndex, fm2: FM2, seeds, lut=None, lut_k: int = 0):
    """Batched exact backward search taking 2 symbols per rank round.

    Fixed-length seeds only (the uniform-seed path).  Bit-identical
    ranges to index.backward_search; the dependent chain is
    ceil((L - lut_k) / 2) rounds instead of L - lut_k.
    """
    N, L = seeds.shape
    use_lut = lut is not None and 0 < lut_k <= L
    if use_lut:
        tail = seeds[:, L - lut_k :].astype(jnp.int32)
        bad0 = (tail >= 4).any(axis=1)
        key = jnp.zeros((N,), jnp.int32)
        for j in range(lut_k):
            key = (key << 2) | (tail[:, j] & 3)
        lo = jnp.where(bad0, 0, lut[0][key])
        hi = jnp.where(bad0, 0, lut[1][key])
        rem = L - lut_k
    else:
        lo = jnp.zeros((N,), jnp.int32)
        hi = jnp.full((N,), fm.n + 1, jnp.int32)
        rem = L

    if rem % 2:  # leading single step at the rightmost remaining symbol
        c = seeds[:, rem - 1].astype(jnp.int32)
        bad = c >= 4
        c4 = jnp.minimum(c, 3)
        nlo = fm.C[c4] + rank(fm, c4, lo)
        nhi = fm.C[c4] + rank(fm, c4, hi)
        lo = jnp.where(bad, 0, nlo)
        hi = jnp.where(bad, 0, nhi)
        rem -= 1

    def pair_step(carry, pos):
        lo, hi = carry
        c1 = seeds[:, pos - 1].astype(jnp.int32)  # newest (prepended last)
        c2 = seeds[:, pos].astype(jnp.int32)
        bad = (c1 >= 4) | (c2 >= 4)
        p = jnp.minimum(c2, 3) | (jnp.minimum(c1, 3) << 2)
        nlo = fm2.C2[p] + rank2(fm2, p, lo)
        nhi = fm2.C2[p] + rank2(fm2, p, hi)
        lo = jnp.where(bad, 0, nlo)
        hi = jnp.where(bad, 0, nhi)
        return (lo, hi), None

    if rem:
        (lo, hi), _ = jax.lax.scan(
            pair_step, (lo, hi),
            jnp.arange(rem - 1, 0, -2, dtype=jnp.int32),
        )
    return lo, hi


def locate2(fm: FMIndex, fm2: FM2, ssa: SSA, idx, k_sample: int):
    """SSA locate via LF² double-steps.  REQUIRES a bi-marked SSA
    (build_fm_index(bi_sample=True)): every SA value % K in {0, 1} is
    sampled, so any row reaches a mark in <= floor((K-1)/2) double
    steps — parity never strands the walk, and rows with SA < 2 are
    marked so the walk cannot cross the sentinel."""
    n_steps = max((k_sample - 1) // 2, 0)

    def step(carry, _):
        i, steps, done = carry
        done = done | _is_marked(ssa, i)
        b = i >> 7
        w = (i >> 3) & 15
        rn = i & 7
        # the pair read and the in-word rank share ONE gathered word
        word = fm2.pair_words[b, w]
        p = ((word >> (4 * rn).astype(jnp.uint32)) & 15).astype(jnp.int32)
        cnt = (
            fm2.occ_abs[b, p]
            + fm2.occ_sub[b, w, p].astype(jnp.int32)
            + _popc_nibble_prefix(word, p, rn)
        )
        corr = ((p == 0) & (i > fm2.row_a)).astype(jnp.int32) + (
            (p == 0) & (i > fm2.row_b)
        ).astype(jnp.int32)
        nxt = fm2.C2[p] + cnt - corr
        i = jnp.where(done, i, nxt)
        steps = steps + jnp.where(done, 0, 2)
        return (i, steps, done), None

    steps0 = jnp.zeros_like(idx)
    done0 = jnp.zeros(idx.shape, bool)
    (i, steps, done), _ = jax.lax.scan(
        step, (idx, steps0, done0), None, length=n_steps
    )
    return ssa.vals[_rank1(ssa, i)] + steps


def build_fm2(fm: FMIndex, slab_bytes: int = 1 << 27) -> FM2:
    """Derive FM2 from an FMIndex on the host (chunked NumPy: ~seconds
    per 100 Mbp; nothing is stored on disk — the pair-BWT is a pure
    function of the index)."""
    bwt_words = np.asarray(fm.bwt_words)  # (n_blocks, 8) uint32
    C = np.asarray(fm.C).astype(np.int64)
    primary = int(np.asarray(fm.primary))
    n = int(np.asarray(fm.n))
    m = n + 1
    n_blocks = bwt_words.shape[0]
    total = n_blocks * 128

    # 1) unpack 2-bit BWT symbols (slabbed)
    sym = np.empty(total, np.uint8)
    w = bwt_words.reshape(-1)
    shifts = (2 * np.arange(16)).astype(np.uint32)
    SLAB_W = max(slab_bytes // 64, 1024)
    for s in range(0, w.shape[0], SLAB_W):
        sl = w[s : s + SLAB_W]
        sym[16 * s : 16 * s + 16 * sl.shape[0]] = (
            (sl[:, None] >> shifts[None, :]) & 3
        ).astype(np.uint8).reshape(-1)

    # 2) LF for all rows (counting sort, slabbed; dummy-'A' correction)
    LF = np.empty(m, np.int64)
    nxt = C[:4].copy()  # next LF slot per symbol (sentinel occupies row 0)
    SLAB = max(slab_bytes // 16, 4096)
    for s in range(0, m, SLAB):
        sl = sym[s : min(s + SLAB, m)].astype(np.int64)
        oh = sl[:, None] == np.arange(4)[None, :]
        excl = np.cumsum(oh, axis=0) - oh
        LF[s : s + sl.shape[0]] = nxt[sl] + excl[np.arange(sl.shape[0]), sl]
        nxt += oh.sum(axis=0)
    # stored dummy 'A' at `primary` occupies an LF slot: rows with
    # symbol A after it are off by one; LF[primary] itself is invalid
    a_rows = np.flatnonzero(sym[:m] == 0)
    late = a_rows[a_rows > primary]
    LF[late] -= 1
    LF[primary] = 0
    row_b_arr = np.flatnonzero(LF[:m] == primary)
    row_b = int(row_b_arr[0]) if row_b_arr.size else primary

    # 3) pair nibbles; sentinel-adjacent rows stored as 0 and excluded
    # by rank2's correction terms
    pair = np.zeros(total, np.uint8)
    pair[:m] = sym[:m] | (sym[LF] << 2)
    pair[primary] = 0
    pair[row_b] = 0

    # 4) pack nibbles LSB-first into (n_blocks, 16) uint32 words
    nib = pair.reshape(-1, 8).astype(np.uint32)
    pair_words = np.zeros(nib.shape[0], np.uint32)
    for j in range(8):
        pair_words |= nib[:, j] << np.uint32(4 * j)
    pair_words = pair_words.reshape(n_blocks, 16)

    # 5) blocked occurrence tables over the 16-pair alphabet, STORED
    # counts (the two stored-0 sentinel rows included — rank2's
    # correction terms subtract them uniformly): absolute exclusive
    # int32 per block + exclusive int8 per-word deltas (<= 120)
    occ_abs = np.zeros((n_blocks, 16), np.int64)
    occ_sub = np.empty((n_blocks, 16, 16), np.int8)
    blocks = pair.reshape(n_blocks, 16, 8)
    SLAB_B = max(slab_bytes // (128 * 16), 256)
    for s in range(0, n_blocks, SLAB_B):
        sl = blocks[s : s + SLAB_B]  # (S, 16, 8)
        wc = (sl[:, :, :, None] == np.arange(16)[None, None, None, :]).sum(
            axis=2
        )  # (S, 16 words, 16 pairs)
        wcum = np.cumsum(wc, axis=1)
        occ_sub[s : s + sl.shape[0]] = (wcum - wc).astype(np.int8)
        occ_abs[s : s + sl.shape[0]] = wcum[:, -1]
    occ_abs = np.cumsum(occ_abs, axis=0) - occ_abs

    # 6) C2[p] = C[c1] + rank(c1, C[c2]) via the (tested) device rank
    p_all = np.arange(16)
    c1 = jnp.asarray(p_all >> 2, jnp.int32)
    pos = jnp.asarray(C[p_all & 3], jnp.int32)
    C2 = np.asarray(C[p_all >> 2] + np.asarray(rank(fm, c1, pos)))

    return FM2(
        pair_words=jnp.asarray(pair_words),
        occ_abs=jnp.asarray(occ_abs.astype(np.int32)),
        occ_sub=jnp.asarray(occ_sub),
        C2=jnp.asarray(C2.astype(np.int32)),
        row_a=jnp.asarray(primary, jnp.int32),
        row_b=jnp.asarray(row_b, jnp.int32),
    )
