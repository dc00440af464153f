"""Long-read DP engine (ops/long_dp.py) + mapper long-read path.

Covers the reference's long-alignment capability (SURVEY.md §3.5 warp
scheduler, §5.8(a-c)): oracle-exact score+CIGAR at kb scale, the
row-blocked Pallas kernel bit-identical to the XLA twin, and the
seed-and-extend mapper accepting reads far beyond 512 bp.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nvbio_tpu.alignment import (
    AlignmentType,
    GotohScheme,
    align_oracle,
    banded_score_batch,
    banded_directions_batch,
)
from nvbio_tpu.models.mapper import _runjump_walk


def _long_batch(nb, lp, band_w, seed, n_mut=20, n_indel=4):
    rng = np.random.default_rng(seed)
    plens = rng.integers(lp - lp // 10, lp + 1, nb).astype(np.int32)
    pats = rng.integers(0, 4, (nb, lp)).astype(np.int8)
    quals = rng.integers(0, 42, (nb, lp)).astype(np.int32)
    lt = lp + 2 * band_w
    texts = rng.integers(0, 4, (nb, lt)).astype(np.int8)
    for b in range(nb):
        t = pats[b, : plens[b]].copy()
        for _ in range(n_mut):
            t[rng.integers(0, len(t))] = rng.integers(0, 4)
        for _ in range(n_indel):
            p = rng.integers(1, len(t) - 2)
            if rng.random() < 0.5:
                t = np.concatenate([t[:p], t[p + 1:]])
            else:
                t = np.concatenate([t[:p], [rng.integers(0, 4)], t[p:]])
        texts[b, : min(len(t), lt)] = t[:lt]
    tlens = np.full(nb, lt, np.int32)
    return pats, plens, quals, texts, tlens


def _walk_runs(rops, rlens, r):
    return [(int(o), int(l))
            for o, l in zip(np.asarray(rops[r]), np.asarray(rlens[r]))
            if l > 0]


@pytest.mark.parametrize("lp,band_w", [(640, 31), (1300, 15)])
def test_long_kernel_matches_twin_and_walk(lp, band_w):
    """Row-blocked Pallas kernel (interpret) == XLA twin: scores AND
    the full traceback walk."""
    from nvbio_tpu.ops.long_dp import banded_directions_long_pallas

    pats, plens, quals, texts, tlens = _long_batch(6, lp, band_w, lp)
    kw = dict(scheme=GotohScheme(), atype=AlignmentType.SEMI_GLOBAL,
              band_w=band_w)
    jp = jnp.asarray
    ra, da = banded_directions_batch(jp(pats), jp(plens), jp(texts),
                                     jp(tlens), jp(quals), **kw)
    rb, db, BP = banded_directions_long_pallas(
        jp(pats), jp(plens), jp(texts), jp(tlens), jp(quals),
        interpret=True, tile=128, row_block=128, **kw)
    np.testing.assert_array_equal(np.asarray(ra["score"]),
                                  np.asarray(rb["score"]))
    np.testing.assert_array_equal(np.asarray(ra["p_end"]),
                                  np.asarray(rb["p_end"]))
    np.testing.assert_array_equal(np.asarray(ra["t_end"]),
                                  np.asarray(rb["t_end"]))
    BAND = 2 * band_w + 1
    ia = ra["p_end"].astype(jnp.int32)
    ka = ra["t_end"].astype(jnp.int32) - ia + band_w
    wa = _runjump_walk(jp(np.asarray(da).reshape(6, -1)), BAND, ia, ka)
    ib = rb["p_end"].astype(jnp.int32)
    kb = rb["t_end"].astype(jnp.int32) - ib + band_w
    wb = _runjump_walk(jp(db), BP, ib, kb)
    for r in range(6):
        assert _walk_runs(wa[2], wa[3], r) == _walk_runs(wb[2], wb[3], r)
        assert int(wa[0][r]) == int(wb[0][r])


def test_long_walk_matches_oracle_cigar():
    """Twin + run-jump walk reproduce the scalar oracle's score AND
    CIGAR at kb scale (banded)."""
    lp, band_w = 1200, 15
    pats, plens, quals, texts, tlens = _long_batch(
        4, lp, band_w, 99, n_mut=30, n_indel=6)
    scheme = GotohScheme()
    kw = dict(scheme=scheme, atype=AlignmentType.SEMI_GLOBAL,
              band_w=band_w)
    jp = jnp.asarray
    res, dirs = banded_directions_batch(jp(pats), jp(plens), jp(texts),
                                        jp(tlens), jp(quals), **kw)
    BAND = 2 * band_w + 1
    i0 = res["p_end"].astype(jnp.int32)
    k0 = res["t_end"].astype(jnp.int32) - i0 + band_w
    w = _runjump_walk(jp(np.asarray(dirs).reshape(4, -1)), BAND, i0, k0)
    for r in range(4):
        o = align_oracle(pats[r, : plens[r]], texts[r, : tlens[r]],
                         scheme, AlignmentType.SEMI_GLOBAL, band=band_w,
                         quals=quals[r])
        assert int(res["score"][r]) == o.score
        # walk runs are end->start; oracle CIGAR is start->end
        runs = _walk_runs(w[2], w[3], r)[::-1]
        ops = [("M", "M", "D", "I")[op] for op, _l in runs]
        lens_ = [l for _op, l in runs]
        assert list(zip(ops, lens_)) == o.cigar
        assert int(w[0][r]) == o.p_start


@pytest.mark.parametrize("lp", [10_000])
def test_very_long_score_matches_twin(lp):
    """10 kb patterns through the row-blocked kernel (score-only,
    interpret mode, small batch)."""
    from nvbio_tpu.ops.long_dp import banded_score_long_pallas

    band_w = 15
    pats, plens, quals, texts, tlens = _long_batch(
        2, lp, band_w, 7, n_mut=100, n_indel=8)
    kw = dict(scheme=GotohScheme(), atype=AlignmentType.SEMI_GLOBAL,
              band_w=band_w)
    jp = jnp.asarray
    a = banded_score_batch(jp(pats), jp(plens), jp(texts), jp(tlens),
                           jp(quals), **kw)
    b = banded_score_long_pallas(jp(pats), jp(plens), jp(texts),
                                 jp(tlens), jp(quals), interpret=True,
                                 tile=128, row_block=512, **kw)
    np.testing.assert_array_equal(np.asarray(a["score"]),
                                  np.asarray(b["score"]))
    np.testing.assert_array_equal(np.asarray(a["t_end"]),
                                  np.asarray(b["t_end"]))


def test_mapper_long_reads_end_to_end():
    """Seed-and-extend mapper on 2 kb reads (> the old 512 bp cap):
    correct loci and CIGARs spanning indels."""
    from nvbio_tpu.fmindex import build_fm_index
    from nvbio_tpu.models import Mapper, MapperParams
    from nvbio_tpu.strings import pack_reads
    from nvbio_tpu.utils.simulate import random_genome

    rng = np.random.default_rng(17)
    genome = random_genome(300_000, seed=18)
    R, L = 8, 2000
    params = MapperParams(batch_size=R, sa_sample=8, max_candidates=8,
                          band_w=31, max_read_len=2048)
    fm, ssa = build_fm_index(genome, sa_sample=8, bi_sample=True)
    seqs, quals, true_pos = [], [], []
    for i in range(R):
        p = int(rng.integers(0, len(genome) - L - 50))
        true_pos.append(p)
        t = genome[p : p + L].copy()
        for _ in range(20):  # 1% mismatches
            t[rng.integers(0, L)] = rng.integers(0, 4)
        for _ in range(3):  # a few short indels
            q = int(rng.integers(100, L - 100))
            if rng.random() < 0.5:
                t = np.concatenate([t[:q], t[q + 2:]])
            else:
                t = np.concatenate(
                    [t[:q], rng.integers(0, 4, 2).astype(t.dtype), t[q:]])
        seqs.append(t[:L].astype(np.uint8))
        quals.append(np.full(len(seqs[-1]), 35, np.uint8))
    reads, lens, qmat, _ = pack_reads(seqs, quals, max_len=2048)
    m = Mapper(fm, ssa, genome, params=params)
    res = m.map_reads(reads, lens, qmat)
    n_ok = 0
    for i, r in enumerate(res):
        if r.aligned and abs(r.pos - true_pos[i]) <= 40:
            n_ok += 1
            assert sum(l for l, op in _parse_cigar(r.cigar)
                       if op in "MI") == int(lens[i])
    assert n_ok >= R - 1


def _parse_cigar(c):
    import re
    return [(int(l), op) for l, op in re.findall(r"(\d+)([MIDNSHP=X])", c)]


def test_wide_band_dirs_autoshrink_row_block():
    """Wide bands (beyond the default row_block's VMEM reach) auto-
    shrink the row block and still produce walk-identical flags —
    CIGAR reach extends to band_w ~800 (ONT-class)."""
    from nvbio_tpu.ops.long_dp import (banded_directions_long_pallas,
                                       _band_fits)

    band_w = 300
    assert not _band_fits(band_w, 256, with_dirs=True)
    assert _band_fits(band_w, 64, with_dirs=True)
    lp = 800
    pats, plens, quals, texts, tlens = _long_batch(
        2, lp, band_w, 17, n_mut=40, n_indel=10)
    kw = dict(scheme=GotohScheme(), atype=AlignmentType.SEMI_GLOBAL,
              band_w=band_w)
    jp = jnp.asarray
    ra, da = banded_directions_batch(jp(pats), jp(plens), jp(texts),
                                     jp(tlens), jp(quals), **kw)
    rb, db, BP = banded_directions_long_pallas(
        jp(pats), jp(plens), jp(texts), jp(tlens), jp(quals),
        interpret=True, tile=128, **kw)
    for f in ("score", "p_end", "t_end"):
        np.testing.assert_array_equal(np.asarray(ra[f]),
                                      np.asarray(rb[f]), err_msg=f)
    BAND = 2 * band_w + 1
    ia = ra["p_end"].astype(jnp.int32)
    ka = ra["t_end"].astype(jnp.int32) - ia + band_w
    wa = _runjump_walk(jp(np.asarray(da).reshape(2, -1)), BAND, ia, ka)
    ib = rb["p_end"].astype(jnp.int32)
    kb = rb["t_end"].astype(jnp.int32) - ib + band_w
    wb = _runjump_walk(jp(db), BP, ib, kb)
    for r in range(2):
        assert _walk_runs(wa[2], wa[3], r) == _walk_runs(wb[2], wb[3], r)
        assert int(wa[0][r]) == int(wb[0][r])
