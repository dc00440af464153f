"""Batched banded DP vs the scalar oracle — exact equality.

Mirrors the reference's alignment_test (SURVEY.md §5.1): randomized
(pattern, text) pairs, CPU oracle, exact score AND exact CIGAR match.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nvbio_tpu.alignment import (
    AlignmentType,
    GotohScheme,
    EDIT_DISTANCE_SCHEME,
    align_oracle,
    banded_score_batch,
    banded_directions_batch,
    traceback_banded,
)
from nvbio_tpu.alignment.types import BOWTIE2_LOCAL_SCHEME

BAND_W = 8
LP, LT = 24, 30
NB = 24


def _random_batch(seed):
    rng = np.random.default_rng(seed)
    plens = rng.integers(6, LP + 1, NB).astype(np.int32)
    tlens = rng.integers(8, LT + 1, NB).astype(np.int32)
    pats = rng.integers(0, 4, (NB, LP)).astype(np.int8)
    quals = rng.integers(0, 42, (NB, LP)).astype(np.int32)
    # make texts related to patterns so alignments are meaningful:
    # copy the pattern in with a few mutations
    texts = rng.integers(0, 4, (NB, LT)).astype(np.int8)
    for b in range(NB):
        n = min(plens[b], tlens[b])
        texts[b, :n] = pats[b, :n]
        nmut = rng.integers(0, 4)
        for _ in range(nmut):
            p = rng.integers(0, tlens[b])
            texts[b, p] = rng.integers(0, 4)
    # sprinkle a few Ns into patterns
    for b in range(0, NB, 5):
        pats[b, rng.integers(0, plens[b])] = 4
    return pats, plens, quals, texts, tlens


def _score_from_cigar(pat, text, quals, scheme, cigar, p_start, t_start):
    """Recompute the alignment score directly from the path."""
    s = 0
    i, j = p_start, t_start
    for op, length in cigar:
        if op == "M":
            for _ in range(length):
                s += scheme.substitution(int(pat[i]), int(text[j]),
                                         int(quals[i]))
                i += 1
                j += 1
        else:
            from nvbio_tpu.alignment.types import gap_penalties
            eo, ee, fo, fe = gap_penalties(scheme)
            if op == "I":  # F: reference gap
                s -= fo + length * fe
                i += length
            else:  # D: read gap
                s -= eo + length * ee
                j += length
    return s


#: asymmetric gaps: read gaps (D) cheap, reference gaps (I) expensive
ASYM_SCHEME = GotohScheme(gap_open=3, gap_extend=1,
                          ref_gap_open=8, ref_gap_extend=4)
#: the mirror: reference gaps cheap
ASYM_SCHEME2 = GotohScheme(gap_open=8, gap_extend=4,
                           ref_gap_open=2, ref_gap_extend=2)

CASES = [
    (GotohScheme(), AlignmentType.SEMI_GLOBAL),
    (GotohScheme(), AlignmentType.GLOBAL),
    (BOWTIE2_LOCAL_SCHEME, AlignmentType.LOCAL),
    (EDIT_DISTANCE_SCHEME, AlignmentType.SEMI_GLOBAL),
    (ASYM_SCHEME, AlignmentType.SEMI_GLOBAL),
    (ASYM_SCHEME, AlignmentType.GLOBAL),
    (ASYM_SCHEME2, AlignmentType.SEMI_GLOBAL),
    (ASYM_SCHEME2, AlignmentType.LOCAL),
]


@pytest.mark.parametrize("scheme,atype", CASES)
def test_batched_matches_oracle(scheme, atype):
    pats, plens, quals, texts, tlens = _random_batch(hash((scheme.match,
                                                           atype.value)) % 97)
    if atype == AlignmentType.GLOBAL:
        # global requires |tlen - plen| <= band
        tlens = np.clip(tlens, plens - BAND_W // 2, plens + BAND_W // 2)
        tlens = np.minimum(tlens, LT).astype(np.int32)

    res, dirs = banded_directions_batch(
        jnp.asarray(pats), jnp.asarray(plens), jnp.asarray(texts),
        jnp.asarray(tlens), jnp.asarray(quals),
        scheme=scheme, atype=atype, band_w=BAND_W,
    )
    score = np.asarray(res["score"])
    p_end = np.asarray(res["p_end"])
    t_end = np.asarray(res["t_end"])
    dirs = np.asarray(dirs)

    for b in range(NB):
        pat = pats[b, : plens[b]]
        text = texts[b, : tlens[b]]
        q = quals[b, : plens[b]]
        ref = align_oracle(pat, text, scheme, atype, band=BAND_W, quals=q)
        assert score[b] == ref.score, f"case {b}: {score[b]} != {ref.score}"
        if ref.score <= -(1 << 29):
            continue  # no valid path in band: sink position is undefined
        assert p_end[b] == ref.p_end, f"case {b} p_end"
        assert t_end[b] == ref.t_end, f"case {b} t_end"

        cigar, p_start, t_start = traceback_banded(
            dirs[b], p_end[b], t_end[b], BAND_W, atype
        )
        assert cigar == ref.cigar, (
            f"case {b}: {cigar} != {ref.cigar} (score {ref.score})"
        )
        assert (p_start, t_start) == (ref.p_start, ref.t_start)
        # path must reproduce the score exactly
        if score[b] > -(1 << 29):
            got = _score_from_cigar(pats[b], texts[b], quals[b], scheme,
                                    cigar, p_start, t_start)
            assert got == score[b], f"case {b}: path score {got} != {score[b]}"


def test_perfect_match_semi_global():
    pat = np.array([0, 1, 2, 3, 0, 1, 2, 3], dtype=np.int8)
    text = np.concatenate([[3, 3], pat, [2, 2]]).astype(np.int8)
    res = banded_score_batch(
        jnp.asarray(pat[None, :]), jnp.asarray([8], dtype=np.int32),
        jnp.asarray(text[None, :]), jnp.asarray([12], dtype=np.int32),
        scheme=GotohScheme(), atype=AlignmentType.SEMI_GLOBAL, band_w=4,
    )
    assert int(res["score"][0]) == 0  # end-to-end: matches score 0
    assert int(res["p_end"][0]) == 8


def test_local_soft_clip():
    # pattern: 4 junk + 8 matching + 4 junk; local should clip the junk
    rng = np.random.default_rng(0)
    core = rng.integers(0, 4, 12).astype(np.int8)
    pat = np.concatenate([[3, 3, 3, 3], core]).astype(np.int8)
    text = np.concatenate([[0, 0], core, [1, 1]]).astype(np.int8)
    # avoid accidental matches of the junk prefix
    text[:2] = (core[0] + 1) % 4
    res, dirs = banded_directions_batch(
        jnp.asarray(pat[None, :]), jnp.asarray([16], dtype=np.int32),
        jnp.asarray(text[None, :]), jnp.asarray([16], dtype=np.int32),
        scheme=BOWTIE2_LOCAL_SCHEME, atype=AlignmentType.LOCAL, band_w=6,
    )
    assert int(res["score"][0]) == 24  # 12 matches * 2
    cigar, p_start, t_start = traceback_banded(
        np.asarray(dirs[0]), int(res["p_end"][0]), int(res["t_end"][0]),
        6, AlignmentType.LOCAL,
    )
    assert cigar == [("M", 12)]
    assert p_start == 4
