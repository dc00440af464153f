"""Two-pass wide-band CIGAR (alignment/wide.py).

The wide-band score tier (wavefront kernel) previously stopped at
score-only; these tests pin the full contract of the two-pass
traceback: pass-2's score equals the wide-band optimum (the derived
band is a certificate, not a heuristic) and the emitted CIGAR runs
re-score to exactly that optimum with consistent endpoints — for
bands far beyond the directions kernels' VMEM reach (band_w >= 900).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nvbio_tpu.alignment import AlignmentType, GotohScheme
from nvbio_tpu.alignment.batched import banded_score_batch
from nvbio_tpu.alignment.types import gap_penalties
from nvbio_tpu.alignment.wide import wide_band_cigar_batch, derive_tb_band


def _mutate(rng, seq, n_sub, n_indel, max_gap=40):
    """Plant substitutions and long indels (ONT-style) into a copy."""
    s = list(seq)
    for _ in range(n_indel):
        p = int(rng.integers(1, max(len(s) - 1, 2)))
        glen = int(rng.integers(1, max_gap + 1))
        if rng.random() < 0.5:
            s[p:p] = list(rng.integers(0, 4, glen))  # insertion
        else:
            del s[p : p + glen]
    for _ in range(n_sub):
        p = int(rng.integers(0, len(s)))
        s[p] = int(rng.integers(0, 4))
    return np.array(s, np.int8)


def _wide_batch(rng, nb, lp, band_w, n_sub, n_indel):
    """Reads planted at RANDOM offsets within a wide text window, so
    the alignment diagonal is unknown a priori — the wide-band use
    case (the offset is what the band must absorb)."""
    lt = lp + 2 * band_w
    pats = np.full((nb, lp), 7, np.int8)
    texts = rng.integers(0, 4, (nb, lt)).astype(np.int8)
    plens = np.full(nb, lp, np.int32)
    tlens = np.full(nb, lt, np.int32)
    for b in range(nb):
        p = rng.integers(0, 4, lp).astype(np.int8)
        pats[b] = p
        t = _mutate(rng, p, n_sub, n_indel)
        # keep the planted diagonal within the band's reach
        # (pattern row 0 maps to text cols [0, 2*band_w] but diagonal
        # j - i must stay within [-band_w, band_w])
        off = int(rng.integers(0, band_w - 100))
        texts[b, off : off + len(t)] = t[: lt - off]
    quals = rng.integers(15, 41, (nb, lp)).astype(np.int32)
    return pats, plens, quals, texts, tlens


def _rescore_runs(out, r, pats, texts, quals, scheme):
    """Re-score the emitted CIGAR runs (end->start order) by direct
    evaluation; returns (score, pattern span, text span)."""
    eo, ee, fo, fe = gap_penalties(scheme)
    runs = [(int(o), int(l))
            for o, l in zip(out["run_ops"][r], out["run_lens"][r])
            if l > 0][::-1]
    i, j = int(out["p_start"][r]), int(out["t_start"][r])
    score = 0
    for op, ln in runs:
        if op == 1:  # M
            for _ in range(ln):
                a, b = int(pats[r, i]), int(texts[r, j])
                score += scheme.substitution(a, b, int(quals[r, i]))
                i += 1
                j += 1
        elif op == 2:  # D (text gap run)
            score -= eo + ln * ee
            j += ln
        elif op == 3:  # I (pattern gap run)
            score -= fo + ln * fe
            i += ln
    return score, i, j


@pytest.mark.parametrize("band_w", [900, 2000])
def test_wide_cigar_matches_twin_score(band_w):
    """XLA-twin path (use_pallas=False): pass-2 score == wide-band
    twin optimum; CIGAR re-scores to it; endpoints consistent."""
    rng = np.random.default_rng(99)
    lp = 700
    pats, plens, quals, texts, tlens = _wide_batch(
        rng, 6, lp, band_w, n_sub=40, n_indel=8)
    scheme = GotohScheme()
    kw = dict(scheme=scheme, atype=AlignmentType.SEMI_GLOBAL,
              band_w=band_w)
    jp = jnp.asarray
    ref = banded_score_batch(jp(pats), jp(plens), jp(texts), jp(tlens),
                             jp(quals), **kw)
    out = wide_band_cigar_batch(pats, plens, texts, tlens, quals,
                                use_pallas=False, **kw)
    assert out["tb_ok"].all()
    np.testing.assert_array_equal(out["score"],
                                  np.asarray(ref["score"]).astype(np.int64))
    for r in range(len(pats)):
        s, i_end, j_end = _rescore_runs(out, r, pats, texts, quals,
                                        scheme)
        assert s == int(out["score"][r])
        assert i_end == int(out["p_end"][r])
        assert j_end == int(out["t_end"][r])
        assert i_end == lp  # SEMI_GLOBAL consumes the whole pattern


def test_wide_cigar_pallas_interpret():
    """Pallas path end-to-end in interpret mode (wavefront score pass
    + row-blocked directions pass + run-jump walk) == twin path."""
    rng = np.random.default_rng(7)
    lp, band_w = 600, 900  # lp must stay past LONG_THRESHOLD=512 so
    # the row-blocked tier (not the narrow banded kernel) is chosen;
    # 2 lanes instead of 3 trims the interpreter bill
    pats, plens, quals, texts, tlens = _wide_batch(
        rng, 2, lp, band_w, n_sub=25, n_indel=5)
    scheme = GotohScheme()
    kw = dict(scheme=scheme, atype=AlignmentType.SEMI_GLOBAL,
              band_w=band_w)
    a = wide_band_cigar_batch(pats, plens, texts, tlens, quals,
                              use_pallas=False, **kw)
    b = wide_band_cigar_batch(pats, plens, texts, tlens, quals,
                              use_pallas=True, interpret=True, **kw)
    np.testing.assert_array_equal(a["score"], b["score"])
    np.testing.assert_array_equal(a["tb_ok"], b["tb_ok"])
    for r in range(len(pats)):
        s, i_end, j_end = _rescore_runs(b, r, pats, texts, quals,
                                        scheme)
        assert s == int(b["score"][r])
        assert i_end == int(b["p_end"][r])
        assert j_end == int(b["t_end"][r])


def test_derive_band_certificate():
    """The derived band really bounds the optimal path's diagonal
    span: re-running the twin at the derived band re-centered on the
    end diagonal reproduces the wide optimum (the certificate claim),
    while a much smaller band generally cannot."""
    rng = np.random.default_rng(3)
    lp, band_w = 500, 1200
    pats, plens, quals, texts, tlens = _wide_batch(
        rng, 4, lp, band_w, n_sub=30, n_indel=6)
    scheme = GotohScheme()
    kw = dict(scheme=scheme, atype=AlignmentType.SEMI_GLOBAL,
              band_w=band_w)
    jp = jnp.asarray
    ref = banded_score_batch(jp(pats), jp(plens), jp(texts), jp(tlens),
                             jp(quals), **kw)
    need, _off = derive_tb_band(plens, np.asarray(ref["score"]),
                                np.asarray(ref["p_end"]),
                                np.asarray(ref["t_end"]), scheme,
                                band_w)
    # indel budget certificate holds and is far below the wide band
    assert (need < band_w).all()
    out = wide_band_cigar_batch(pats, plens, texts, tlens, quals,
                                use_pallas=False, **kw)
    assert (out["tb_band"] >= need).all()
    np.testing.assert_array_equal(
        out["score"], np.asarray(ref["score"]).astype(np.int64))


def test_wide_cigar_garbage_lane_takes_wavefront_tb():
    """A lane whose certificate blows past max_tb_band no longer
    reports tb_ok=False (pre-round-3 contract): pass 3 walks the
    wavefront kernel's own flags, so it gets a CIGAR that re-scores
    exactly too."""
    rng = np.random.default_rng(11)
    lp, band_w = 400, 900
    pats, plens, quals, texts, tlens = _wide_batch(
        rng, 2, lp, band_w, n_sub=10, n_indel=3)
    # lane 1: pure random text (no planted read) -> terrible score
    texts[1] = rng.integers(0, 4, texts.shape[1])
    scheme = GotohScheme()
    out = wide_band_cigar_batch(
        pats, plens, texts, tlens, quals, use_pallas=False,
        scheme=scheme, atype=AlignmentType.SEMI_GLOBAL, band_w=band_w,
        max_tb_band=255)
    assert out["tb_ok"].all()
    for r in range(2):
        s, i_end, j_end = _rescore_runs(out, r, pats, texts, quals,
                                        scheme)
        assert s == int(out["score"][r])
        assert i_end == int(out["p_end"][r])
        assert j_end == int(out["t_end"][r])


def test_wide_cigar_forced_gap_past_certificate_ladder():
    """A REAL 850 bp deletion (score gap ~2560 at default penalties):
    the indel-budget certificate exceeds the banded ladder's 767, so
    the CIGAR must come from the wavefront-flag walk — verified by
    exact re-scoring and by the 850-D run itself (VERDICT r2 missing
    #4 'Done' criterion)."""
    rng = np.random.default_rng(21)
    # cheap text-gap EXTENSION but costly opens, expensive mismatches
    # and pattern gaps: the planted single 850-D path is the optimum
    # (chance-match stitching pays an open per run, mismatching b
    # against junk ~-400, skipping b via an I-run ~-1630) while the
    # min-extend-1 certificate g ~ 870 blows past the 767 ladder
    scheme = GotohScheme(match=2, mismatch_min=6, mismatch_max=6,
                         gap_open=50, gap_extend=1,
                         ref_gap_open=30, ref_gap_extend=10)
    lp, band_w, gap = 400, 1000, 850
    a = rng.integers(0, 4, 200).astype(np.int8)
    b = rng.integers(0, 4, 200).astype(np.int8)
    pats = np.concatenate([a, b])[None, :]
    lt = lp + 2 * band_w
    text = np.concatenate([a, rng.integers(0, 4, gap).astype(np.int8),
                           b, rng.integers(0, 4, lt).astype(np.int8)])
    texts = text[None, :lt]
    plens = np.full(1, lp, np.int32)
    tlens = np.full(1, lt, np.int32)
    quals = np.full((1, lp), 35, np.int32)
    kw = dict(scheme=scheme, atype=AlignmentType.SEMI_GLOBAL,
              band_w=band_w)
    from nvbio_tpu.alignment.wide import derive_tb_band, TB_BANDS

    out = wide_band_cigar_batch(pats, plens, texts, tlens, quals,
                                use_pallas=False, **kw)
    need, _ = derive_tb_band(plens, out["score"], out["p_end"],
                             out["t_end"], scheme, band_w)
    assert need[0] > TB_BANDS[-1], "test must exceed the ladder"
    assert out["tb_ok"][0]
    # the optimal path is the planted one: 200M 850D 200M
    eo, ee, _fo, _fe = gap_penalties(scheme)
    assert int(out["score"][0]) == lp * scheme.match - (eo + gap * ee)
    s, i_end, j_end = _rescore_runs(out, 0, pats, texts, quals, scheme)
    assert s == int(out["score"][0])
    assert i_end == lp and j_end == int(out["t_end"][0])
    runs = [(int(o), int(l))
            for o, l in zip(out["run_ops"][0], out["run_lens"][0])
            if l > 0][::-1]
    assert (2, gap) in runs  # the 850-D run survives intact


def test_zero_extend_scheme_uses_original_band():
    """gap_extend == 0 voids the indel-budget certificate (run length
    is score-free); the fallback certificate is the original window
    itself, so the CIGAR must still re-score to the reported optimum.
    Planted: a long free deletion far from the end diagonal."""
    scheme = GotohScheme(gap_open=5, gap_extend=0,
                         ref_gap_open=5, ref_gap_extend=0)
    rng = np.random.default_rng(5)
    lp, band_w = 120, 255
    a = rng.integers(0, 4, 60).astype(np.int8)
    b = rng.integers(0, 4, 60).astype(np.int8)
    pats = np.concatenate([a, b])[None, :].astype(np.int8)
    junk = rng.integers(0, 4, 150).astype(np.int8)
    text = np.concatenate([a, junk, b,
                           rng.integers(0, 4, band_w).astype(np.int8)])
    texts = text[None, : lp + 2 * band_w].astype(np.int8)
    plens = np.full(1, lp, np.int32)
    tlens = np.full(1, texts.shape[1], np.int32)
    quals = np.full((1, lp), 35, np.int32)
    kw = dict(scheme=scheme, atype=AlignmentType.SEMI_GLOBAL,
              band_w=band_w)
    jp = jnp.asarray
    ref = banded_score_batch(jp(pats), jp(plens), jp(texts), jp(tlens),
                             jp(quals), **kw)
    out = wide_band_cigar_batch(pats, plens, texts, tlens, quals,
                                use_pallas=False, **kw)
    assert out["tb_ok"][0]
    assert int(out["score"][0]) == int(ref["score"][0]) == -5
    s, i_end, j_end = _rescore_runs(out, 0, pats, texts, quals, scheme)
    assert s == int(out["score"][0])
    assert i_end == lp and j_end == int(out["t_end"][0])
