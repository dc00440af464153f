"""Truth-table tests for the Bowtie2 PE policy surface (VERDICT r4
missing #4): --fr/--rf/--ff orientations, --dovetail/--no-contain/
--no-overlap geometry, --no-mixed/--no-discordant reporting.

Each case plants a pair with EXACT known geometry in a unique random
genome and asserts the proper/discordant/aligned outcome flips with
the corresponding flag — including through the mate-rescue path,
which must enforce the same concordance predicate (paired.py
_pair_cases) as the candidate matrix.
"""

import numpy as np
import pytest

from nvbio_tpu.fmindex import build_fm_index
from nvbio_tpu.models import MapperParams
from nvbio_tpu.models.paired import PairedMapper

L = 100


@pytest.fixture(scope="module")
def idx():
    rng = np.random.default_rng(505)
    g = rng.integers(0, 4, 60_000, dtype=np.uint8).astype(np.uint8)
    fm, ssa = build_fm_index(g, sa_sample=8, bi_sample=True)
    return fm, ssa, g


def rc(x):
    return np.where(x < 4, 3 - x, x)[::-1].astype(np.uint8)


def map_one(idx, m1, m2, **over):
    fm, ssa, g = idx
    params = MapperParams(batch_size=8, sa_sample=8, **over)
    mp = PairedMapper(fm, ssa, g, params=params)
    W = max(len(m1), len(m2))  # common pad width (pack_reads does
    # this in the CLI; mates of unequal length share one pad width)

    def padw(m):
        out = np.full(W, 7, np.uint8)
        out[:len(m)] = m
        return out[None, :]

    l1 = np.full(1, len(m1), np.int32)
    l2 = np.full(1, len(m2), np.int32)
    q1 = np.zeros((1, W), np.uint8); q1[0, :len(m1)] = 35
    q2 = np.zeros((1, W), np.uint8); q2[0, :len(m2)] = 35
    r1, r2, info = mp.map_pairs(padw(m1), l1, q1, padw(m2), l2, q2)
    return r1[0], r2[0], info[0]


def frag(g, s, insert, l2=L):
    """(upstream read fwd-oriented, downstream read fwd-oriented)."""
    return g[s:s + L].copy(), g[s + insert - l2:s + insert].copy()


# ---------------- orientations ----------------

def test_fr_pair_proper_by_default(idx):
    up, dn = frag(idx[2], 21_000, 300)
    r1, r2, pi = map_one(idx, up, rc(dn))
    assert pi["proper"] and r1.aligned and r2.aligned
    assert r1.strand == 0 and r2.strand == 1


def test_rf_pair_needs_rf_flag(idx):
    up, dn = frag(idx[2], 22_000, 300)
    m1, m2 = rc(up), dn  # upstream mate reverse, downstream forward
    r1, r2, pi = map_one(idx, m1, m2)
    assert not pi["proper"]  # fr default rejects RF geometry
    r1, r2, pi = map_one(idx, m1, m2, pe_orient="rf")
    assert pi["proper"]
    assert r1.strand == 1 and r2.strand == 0
    # and an FR pair is NOT proper under --rf
    up, dn = frag(idx[2], 21_000, 300)
    _, _, pi = map_one(idx, up, rc(dn), pe_orient="rf")
    assert not pi["proper"]


def test_ff_pair_needs_ff_flag(idx):
    up, dn = frag(idx[2], 23_000, 300)
    r1, r2, pi = map_one(idx, up, dn)  # both forward, mate1 upstream
    assert not pi["proper"]
    r1, r2, pi = map_one(idx, up, dn, pe_orient="ff")
    assert pi["proper"]
    assert r1.strand == 0 and r2.strand == 0
    # fragment from the minus strand: both mates map REVERSE and mate 1
    # is at the RIGHT end (mate 2 upstream) — also concordant under
    # --ff; both-reverse with mate 1 upstream is NOT
    r1, r2, pi = map_one(idx, rc(dn), rc(up), pe_orient="ff")
    assert pi["proper"]
    assert r1.strand == 1 and r2.strand == 1
    _, _, pi = map_one(idx, rc(up), rc(dn), pe_orient="ff")
    assert not pi["proper"]


def test_ff_rescue_orientation(idx):
    """FF rescue: mutate mate 2 so seeding misses it; the rescue
    window search (same-strand, downstream of the mate-1 anchor) must
    still place it."""
    up, dn = frag(idx[2], 24_000, 300)
    dn = dn.copy()
    dn[::7] = (dn[::7] + 1) % 4  # ~14 mismatches: seeds all broken
    r1, r2, pi = map_one(idx, up, dn, pe_orient="ff",
                         score_min_a=-120.0)
    assert pi["proper"] and r2.aligned and r2.strand == 0
    assert abs(r2.pos - (24_000 + 300 - L)) <= 3


# ---------------- geometry policy ----------------

def test_dovetail_flag(idx):
    g = idx[2]
    s = 25_000
    m1 = g[s:s + L].copy()
    m2 = rc(g[s - 40:s + 60])  # downstream mate STARTS before mate 1
    _, _, pi = map_one(idx, m1, m2)
    assert not pi["proper"]  # dovetailing not concordant by default
    _, _, pi = map_one(idx, m1, m2, pe_dovetail=True)
    assert pi["proper"]


def test_no_contain_flag(idx):
    g = idx[2]
    s = 26_000
    m1 = g[s:s + L].copy()
    m2 = rc(g[s + 20:s + 80])  # 60 bp mate fully inside mate 1's span
    _, _, pi = map_one(idx, m1, m2)
    assert pi["proper"]  # containment concordant by default
    _, _, pi = map_one(idx, m1, m2, pe_no_contain=True)
    assert not pi["proper"]


def test_no_overlap_flag(idx):
    g = idx[2]
    s = 27_000
    m1 = g[s:s + L].copy()
    m2 = rc(g[s + 50:s + 150])  # overlaps mate 1 by 50 bp
    _, _, pi = map_one(idx, m1, m2)
    assert pi["proper"]  # overlap concordant by default
    _, _, pi = map_one(idx, m1, m2, pe_no_overlap=True)
    assert not pi["proper"]


# ---------------- reporting policy ----------------

def test_no_mixed_suppresses_se_fallback(idx):
    g = idx[2]
    m1 = g[28_000:28_000 + L].copy()
    m2 = np.random.default_rng(9).integers(  # garbage: cannot align
        0, 4, L).astype(np.uint8)
    r1, r2, pi = map_one(idx, m1, m2)
    assert r1.aligned and not r2.aligned and not pi["proper"]
    r1, r2, pi = map_one(idx, m1, m2, no_mixed=True)
    assert not r1.aligned and not r2.aligned


def test_no_discordant_flag(idx):
    g = idx[2]
    # both mates unique, insert 5000 >> maxins and far beyond the
    # rescue window: a discordant pair
    m1 = g[30_000:30_000 + L].copy()
    m2 = rc(g[35_000 - L + 1:35_000 + 1])
    r1, r2, pi = map_one(idx, m1, m2)
    assert not pi["proper"] and pi["discordant"]
    assert r1.aligned and r2.aligned
    r1, r2, pi = map_one(idx, m1, m2, no_discordant=True)
    assert not pi["discordant"]
    assert r1.aligned and r2.aligned  # demoted to mixed SE reports
    r1, r2, pi = map_one(idx, m1, m2, no_discordant=True,
                         no_mixed=True)
    assert not r1.aligned and not r2.aligned


def test_discordant_requires_uniqueness(idx):
    """A non-proper pair whose mate has a second alignment at/above
    score-min is mixed, not discordant (Bowtie2's uniqueness rule)."""
    g = idx[2]
    # duplicate mate-2's locus so it maps to two places equally
    src = g[31_000:31_000 + L]
    g2 = g.copy()
    g2[45_000:45_000 + L] = src
    fm, ssa = build_fm_index(g2, sa_sample=8, bi_sample=True)
    m1 = g2[33_000:33_000 + L].copy()  # unique, 2000 bp away
    m2 = rc(src)
    params = MapperParams(batch_size=8, sa_sample=8)
    mp = PairedMapper(fm, ssa, g2, params=params)
    l = np.full(1, L, np.int32)
    q = np.full((1, L), 35, np.uint8)
    r1, r2, info = mp.map_pairs(m1[None, :], l, q, m2[None, :], l, q)
    assert r1[0].aligned and r2[0].aligned
    assert not info[0]["proper"]
    assert not info[0]["discordant"]  # mate 2 is not unique
