"""Wide-band wavefront kernel (ops/wavefront_dp.py) vs the XLA twin.

Covers the reference's warp-per-alignment wavefront capability for
bands beyond the row-wise kernels' reach (SURVEY.md §3.5 warp
scheduler, §5.8(b)): one alignment per grid program, anti-diagonal
across the vector window.  Oracle is alignment.banded_score_batch
(itself oracle-exact-tested in test_alignment.py); parity here is
bit-exact on score, p_end, t_end for all alignment types, including
N symbols, quality-scaled mismatches, and zero/short lengths.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nvbio_tpu.alignment import AlignmentType, GotohScheme
from nvbio_tpu.alignment.batched import banded_score_batch
from nvbio_tpu.ops.wavefront_dp import wavefront_score_pallas

FIELDS = ("score", "p_end", "t_end")


def _assert_parity(pats, plens, texts, tlens, quals, **kw):
    jp = jnp.asarray
    ref = banded_score_batch(jp(pats), jp(plens), jp(texts), jp(tlens),
                             None if quals is None else jp(quals), **kw)
    got = wavefront_score_pallas(jp(pats), jp(plens), jp(texts),
                                 jp(tlens),
                                 None if quals is None else jp(quals),
                                 interpret=True, **kw)
    for f in FIELDS:
        np.testing.assert_array_equal(
            np.asarray(ref[f]), np.asarray(got[f]),
            err_msg=f"{kw['atype']} field={f}")


@pytest.mark.parametrize("atype", list(AlignmentType))
def test_wavefront_random_small(atype):
    """Randomized parity incl. N symbols, ragged lengths, zero lens."""
    rng = np.random.default_rng(1234)
    for trial in range(4):
        nb = 3
        lp = int(rng.integers(5, 90))
        lt = int(rng.integers(5, 120))
        bw = int(rng.integers(3, 40))
        pats = rng.integers(0, 5, (nb, lp)).astype(np.int32)
        texts = rng.integers(0, 5, (nb, lt)).astype(np.int32)
        plens = rng.integers(0, lp + 1, nb).astype(np.int32)
        tlens = rng.integers(0, lt + 1, nb).astype(np.int32)
        quals = rng.integers(0, 41, (nb, lp)).astype(np.int32)
        _assert_parity(pats, plens, texts, tlens, quals,
                       scheme=GotohScheme(), atype=atype, band_w=bw)


@pytest.mark.parametrize("atype", list(AlignmentType))
def test_wavefront_wide_band_rebase(atype):
    """Wide band (multiple window rebases) on mutated-copy texts —
    the regime the kernel exists for."""
    rng = np.random.default_rng(7)
    nb, lp, bw = 2, 1200, 520
    lt = lp + 180
    pats = rng.integers(0, 4, (nb, lp)).astype(np.int32)
    texts = rng.integers(0, 4, (nb, lt)).astype(np.int32)
    texts[:, 90:90 + lp] = pats
    for b in range(nb):
        mut = rng.integers(0, lt, 90)
        texts[b, mut] = rng.integers(0, 4, 90)
    plens = np.array([lp, lp - 37], np.int32)
    tlens = np.array([lt, lt - 11], np.int32)
    _assert_parity(pats, plens, texts, tlens, None,
                   scheme=GotohScheme(), atype=atype, band_w=bw)


def test_long_kernel_wide_band_dispatch():
    """banded_score_long_pallas routes bands beyond its VMEM reach to
    the wavefront kernel (score parity, no ValueError)."""
    from nvbio_tpu.ops.long_dp import banded_score_long_pallas, _band_fits

    bw = 1100
    assert not _band_fits(bw, 256, with_dirs=False)
    assert _band_fits(500, 256, with_dirs=False)
    rng = np.random.default_rng(3)
    nb, lp = 2, 600
    lt = lp + 120
    pats = rng.integers(0, 4, (nb, lp)).astype(np.int32)
    texts = rng.integers(0, 4, (nb, lt)).astype(np.int32)
    texts[:, 60:60 + lp] = pats
    plens = np.full(nb, lp, np.int32)
    tlens = np.full(nb, lt, np.int32)
    jp = jnp.asarray
    kw = dict(scheme=GotohScheme(), atype=AlignmentType.SEMI_GLOBAL,
              band_w=bw)
    ref = banded_score_batch(jp(pats), jp(plens), jp(texts), jp(tlens),
                             None, **kw)
    got = banded_score_long_pallas(jp(pats), jp(plens), jp(texts),
                                   jp(tlens), None, interpret=True, **kw)
    for f in FIELDS:
        np.testing.assert_array_equal(np.asarray(ref[f]),
                                      np.asarray(got[f]), err_msg=f)


def test_wavefront_nondefault_scheme():
    """Scoring-scheme plumbing: local alignment under a non-default
    scheme (CLI --mp/--rdg/--rfg analog)."""
    rng = np.random.default_rng(11)
    nb, lp, lt, bw = 3, 200, 260, 48
    pats = rng.integers(0, 4, (nb, lp)).astype(np.int32)
    texts = rng.integers(0, 4, (nb, lt)).astype(np.int32)
    texts[:, 20:20 + lp] = pats
    plens = np.full(nb, lp, np.int32)
    tlens = np.full(nb, lt, np.int32)
    quals = rng.integers(0, 41, (nb, lp)).astype(np.int32)
    scheme = GotohScheme(match=2, mismatch_min=3, mismatch_max=9,
                         n_penalty=2, gap_open=7, gap_extend=2)
    for atype in (AlignmentType.LOCAL, AlignmentType.SEMI_GLOBAL):
        _assert_parity(pats, plens, texts, tlens, quals,
                       scheme=scheme, atype=atype, band_w=bw)


def test_device_walk_matches_host_walk():
    """The on-device pass-3 walk (walk_wavefront_dirs_device) must
    emit BIT-IDENTICAL op streams / start coordinates to the host
    walk it replaces — only the transfer size changes (~KB op buffer
    vs the whole flags tensor; VERDICT r4 missing #5)."""
    from nvbio_tpu.ops.wavefront_dp import wavefront_dirs_pallas
    from nvbio_tpu.alignment.wavefront_walk import (
        walk_wavefront_dirs, walk_wavefront_dirs_device, compress_ops)
    from nvbio_tpu.alignment import GotohScheme, AlignmentType

    rng = np.random.default_rng(88)
    W, LP = 96, 256
    nb = 3
    lt = LP + 2 * W
    pats = rng.integers(0, 4, (nb, LP)).astype(np.int8)
    texts = rng.integers(0, 4, (nb, lt)).astype(np.int8)
    # lane 0: big deletion; lane 1: big insertion; lane 2: subs only
    texts[0, W:W + 120] = pats[0, :120]
    texts[0, W + 120 + 60:W + LP + 60] = pats[0, 120:]
    ins = pats[1].copy()
    ins = np.concatenate([ins[:100], rng.integers(0, 4, 40), ins[100:]])
    texts[1, W:W + len(ins[:LP + 40])] = ins[:min(len(ins), lt - W)]
    t2 = pats[2].copy()
    t2[::17] = (t2[::17] + 1) % 4
    texts[2, W:W + LP] = t2
    jp = jnp.asarray
    plens = np.full(nb, LP, np.int32)
    tlens = np.full(nb, lt, np.int32)
    res, dirs, plan = wavefront_dirs_pallas(
        jp(pats), jp(plens), jp(texts), jp(tlens),
        scheme=GotohScheme(), atype=AlignmentType.SEMI_GLOBAL,
        band_w=W, interpret=True)
    pe = np.asarray(res["p_end"]); te = np.asarray(res["t_end"])
    ops_d, n_d, ps_d, ts_d = walk_wavefront_dirs_device(
        dirs, res["p_end"], res["t_end"], plan=plan, band_w=W)
    ops_h_all = np.asarray(ops_d)
    dirs_h = np.asarray(dirs)
    for b in range(nb):
        ro, rl, ps, ts = walk_wavefront_dirs(
            dirs_h[b], plan, W, int(pe[b]), int(te[b]))
        ro2, rl2 = compress_ops(ops_h_all[b, :int(np.asarray(n_d)[b])])
        np.testing.assert_array_equal(ro, ro2, err_msg=f"lane {b}")
        np.testing.assert_array_equal(rl, rl2, err_msg=f"lane {b}")
        assert int(np.asarray(ps_d)[b]) == ps
        assert int(np.asarray(ts_d)[b]) == ts
        assert len(ro) > 0
    # the planted indels really appear in the streams
    assert 2 in np.asarray(ops_d)[0]  # D run in lane 0
    assert 3 in np.asarray(ops_d)[1]  # I run in lane 1
