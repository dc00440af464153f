"""Pallas banded-DP kernel vs the XLA twin — exact equality (interpret
mode on CPU; the same kernel compiles for TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from nvbio_tpu.alignment import AlignmentType, GotohScheme
from nvbio_tpu.alignment.batched import banded_score_batch
from nvbio_tpu.alignment.types import BOWTIE2_LOCAL_SCHEME
from nvbio_tpu.ops.banded_dp import banded_score_pallas

BAND_W = 7
LP, LT = 20, 28
NB = 130  # deliberately not a multiple of 128


def _random_batch(seed):
    rng = np.random.default_rng(seed)
    plens = rng.integers(5, LP + 1, NB).astype(np.int32)
    tlens = rng.integers(10, LT + 1, NB).astype(np.int32)
    pats = rng.integers(0, 4, (NB, LP)).astype(np.int8)
    quals = rng.integers(0, 42, (NB, LP)).astype(np.int32)
    texts = rng.integers(0, 4, (NB, LT)).astype(np.int8)
    for b in range(NB):
        n = min(plens[b], tlens[b])
        texts[b, :n] = pats[b, :n]
        for _ in range(rng.integers(0, 4)):
            texts[b, rng.integers(0, tlens[b])] = rng.integers(0, 4)
    # N symbols (4) in both operands: the sentinel body must score
    # them -n_penalty, distinct from the PAD/sentinel symbol (7)
    pats[rng.random((NB, LP)) < 0.02] = 4
    texts[rng.random((NB, LT)) < 0.02] = 4
    return pats, plens, quals, texts, tlens


@pytest.mark.parametrize(
    "scheme,atype",
    [
        (GotohScheme(), AlignmentType.SEMI_GLOBAL),
        (BOWTIE2_LOCAL_SCHEME, AlignmentType.LOCAL),
        (GotohScheme(), AlignmentType.GLOBAL),
        # asymmetric --rdg/--rfg penalties (read gaps != ref gaps)
        (GotohScheme(gap_open=3, gap_extend=1,
                     ref_gap_open=8, ref_gap_extend=4),
         AlignmentType.SEMI_GLOBAL),
    ],
)
def test_pallas_matches_xla(scheme, atype):
    pats, plens, quals, texts, tlens = _random_batch(atype.value + 11)
    if atype == AlignmentType.GLOBAL:
        tlens = np.clip(tlens, plens - BAND_W // 2, plens + BAND_W // 2)
        tlens = np.minimum(tlens, LT).astype(np.int32)
    args = (
        jnp.asarray(pats), jnp.asarray(plens),
        jnp.asarray(texts), jnp.asarray(tlens), jnp.asarray(quals),
    )
    ref = banded_score_batch(
        *args, scheme=scheme, atype=atype, band_w=BAND_W
    )
    got = banded_score_pallas(
        *args, scheme=scheme, atype=atype, band_w=BAND_W, interpret=True
    )
    score_ref = np.asarray(ref["score"])
    np.testing.assert_array_equal(np.asarray(got["score"]), score_ref)
    ok = score_ref > -(1 << 29)  # sink position defined only when a path exists
    np.testing.assert_array_equal(
        np.asarray(got["p_end"])[ok], np.asarray(ref["p_end"])[ok]
    )
    np.testing.assert_array_equal(
        np.asarray(got["t_end"])[ok], np.asarray(ref["t_end"])[ok]
    )


def test_pallas_wide_band_matches_xla():
    """Wide bands (PE insert-window rescue shape: band spans the whole
    window) stay on the Pallas kernel via non-pow2 BAND_PAD + lane-tile
    shrink; exact equality vs the XLA twin."""
    scheme, atype = GotohScheme(), AlignmentType.SEMI_GLOBAL
    band_w = 150  # BAND=301 > the old 127 cap
    lp, lt = 24, 24 + 2 * 150
    nb = 96
    rng = np.random.default_rng(5)
    plens = rng.integers(8, lp + 1, nb).astype(np.int32)
    tlens = rng.integers(lp, lt + 1, nb).astype(np.int32)
    pats = rng.integers(0, 4, (nb, lp)).astype(np.int8)
    quals = rng.integers(0, 42, (nb, lp)).astype(np.int32)
    texts = rng.integers(0, 4, (nb, lt)).astype(np.int8)
    for b in range(nb):  # plant the pattern somewhere in the window
        off = rng.integers(0, tlens[b] - plens[b] + 1)
        texts[b, off:off + plens[b]] = pats[b, :plens[b]]
    args = (
        jnp.asarray(pats), jnp.asarray(plens),
        jnp.asarray(texts), jnp.asarray(tlens), jnp.asarray(quals),
    )
    ref = banded_score_batch(*args, scheme=scheme, atype=atype,
                             band_w=band_w)
    got = banded_score_pallas(*args, scheme=scheme, atype=atype,
                              band_w=band_w, interpret=True)
    np.testing.assert_array_equal(np.asarray(got["score"]),
                                  np.asarray(ref["score"]))
    ok = np.asarray(ref["score"]) > -(1 << 29)
    np.testing.assert_array_equal(np.asarray(got["t_end"])[ok],
                                  np.asarray(ref["t_end"])[ok])


def test_pallas_packed_text_matches_symbol_path():
    """The packed-genome window path (2-bit words + in-kernel unpack,
    used by the mapper's extension stage) must be bit-identical to the
    symbol-window path, including genome-end windows."""
    from nvbio_tpu.ops.banded_dp import (banded_score_pallas_packed,
                                         pack_genome_words)
    rng = np.random.default_rng(3)
    n, NB, lp, w = 30_000, 200, 100, 15
    lt = lp + 2 * w
    genome = rng.integers(0, 4, n).astype(np.int8)
    packed = pack_genome_words(genome)
    ws = rng.integers(0, n - 10, NB).astype(np.int32)  # incl. near-end
    gpad = np.concatenate([genome, np.full(lt, 7, np.int8)])
    texts = np.stack([gpad[s:s + lt] for s in ws])
    pats = np.zeros((NB, lp), np.int8)
    for b in range(NB):
        seg = genome[ws[b]:ws[b] + lp]
        pats[b, :len(seg)] = seg
        for _ in range(3):
            pats[b, rng.integers(0, lp)] = rng.integers(0, 4)
    plens = np.full(NB, lp, np.int32)
    tlens = np.clip(n - ws, 0, lt).astype(np.int32)
    quals = rng.integers(0, 42, (NB, lp)).astype(np.int32)
    kw = dict(scheme=GotohScheme(), atype=AlignmentType.SEMI_GLOBAL,
              band_w=w, interpret=True)
    a = banded_score_pallas(
        jnp.asarray(pats), jnp.asarray(plens), jnp.asarray(texts),
        jnp.asarray(tlens), jnp.asarray(quals), **kw)
    b = banded_score_pallas_packed(
        jnp.asarray(pats), jnp.asarray(plens), packed, jnp.asarray(ws),
        jnp.asarray(tlens), jnp.asarray(quals), **kw)
    for k in ("score", "p_end", "t_end"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def _np_walk(dirs_flat, stride, p_end, t_end, w, max_steps=600):
    """Reference traceback walk (mirrors traceback_walk_windows.step)."""
    i, k, st = int(p_end), int(t_end) - int(p_end) + w, 0
    ops = []
    for _ in range(max_steps):
        if st == 0 and i == 0:
            break
        flag = int(dirs_flat[(i - 1) * stride + k])
        f = flag & 3
        if st == 0:
            if f == 3:
                break
            if f == 0:
                ops.append("M"); i -= 1
            elif f == 1:
                st = 1
            else:
                st = 2
        elif st == 1:
            ops.append("I"); k -= 1
            if (flag >> 2) & 1:
                st = 0
        else:
            ops.append("D"); i -= 1; k += 1
            if (flag >> 3) & 1:
                st = 0
    return "".join(ops), i, k


def test_pallas_directions_match_xla_walk():
    """The one-pass Pallas directions kernel must produce the same
    traceback walks (op streams + start cells) as the XLA twin."""
    from nvbio_tpu.ops.banded_dp import banded_directions_pallas
    from nvbio_tpu.alignment.batched import banded_directions_batch
    scheme, atype = GotohScheme(), AlignmentType.SEMI_GLOBAL
    w = 7
    lp, lt, nb = 24, 38, 96
    rng = np.random.default_rng(21)
    plens = rng.integers(8, lp + 1, nb).astype(np.int32)
    tlens = rng.integers(16, lt + 1, nb).astype(np.int32)
    pats = rng.integers(0, 4, (nb, lp)).astype(np.int8)
    quals = rng.integers(0, 42, (nb, lp)).astype(np.int32)
    texts = rng.integers(0, 4, (nb, lt)).astype(np.int8)
    for b in range(nb):  # plant with 0-2 indels + mismatches
        p = list(pats[b][:plens[b]])
        for _ in range(rng.integers(0, 3)):
            if rng.random() < 0.5 and len(p) > 4:
                del p[rng.integers(0, len(p))]
            else:
                p.insert(rng.integers(0, len(p)), rng.integers(0, 4))
        texts[b, :min(len(p), tlens[b])] = p[:tlens[b]]
        for _ in range(rng.integers(0, 3)):
            texts[b, rng.integers(0, tlens[b])] = rng.integers(0, 4)
    args = (jnp.asarray(pats), jnp.asarray(plens), jnp.asarray(texts),
            jnp.asarray(tlens), jnp.asarray(quals))
    kw = dict(scheme=scheme, atype=atype, band_w=w)
    res_x, dirs_x = banded_directions_batch(*args, **kw)
    res_p, dirs_p, stride_p = banded_directions_pallas(
        *args, interpret=True, **kw)
    np.testing.assert_array_equal(np.asarray(res_p["score"]),
                                  np.asarray(res_x["score"]))
    BAND = 2 * w + 1
    dx = np.asarray(dirs_x).reshape(nb, -1)
    dp = np.asarray(dirs_p)
    smin = -0.6 - 0.6 * plens
    n_checked = 0
    for b in range(nb):
        if int(np.asarray(res_x["score"])[b]) < smin[b]:
            continue
        wx = _np_walk(dx[b], BAND, np.asarray(res_x["p_end"])[b],
                      np.asarray(res_x["t_end"])[b], w)
        wp = _np_walk(dp[b], stride_p, np.asarray(res_p["p_end"])[b],
                      np.asarray(res_p["t_end"])[b], w)
        assert wx == wp, f"lane {b}: {wx} != {wp}"
        n_checked += 1
    assert n_checked >= nb // 2


def test_pallas_int16_opt_in_matches_xla():
    """The int16 compute-dtype variant (opt-in; for TPU generations
    with int16 vector compares) must match the XLA twin on reachable
    scores."""
    scheme, atype = GotohScheme(), AlignmentType.SEMI_GLOBAL
    pats, plens, quals, texts, tlens = _random_batch(99)
    args = (
        jnp.asarray(pats), jnp.asarray(plens),
        jnp.asarray(texts), jnp.asarray(tlens), jnp.asarray(quals),
    )
    ref = banded_score_batch(
        *args, scheme=scheme, atype=atype, band_w=BAND_W
    )
    got = banded_score_pallas(
        *args, scheme=scheme, atype=atype, band_w=BAND_W,
        interpret=True, compute_dtype="int16",
    )
    score_ref = np.asarray(ref["score"])
    score_got = np.asarray(got["score"])
    ok = score_ref > -(1 << 29)
    np.testing.assert_array_equal(score_got[ok], score_ref[ok])
    assert (score_got[~ok] <= -(1 << 29)).all()
