"""BWA-layout index interop (SURVEY.md Appendix A): export to
.pac/.bwt/.sa/.ann/.amb, re-import, verify bit-identical structures
against an independent oracle."""

import numpy as np
import pytest

from nvbio_tpu.io.fasta import write_fasta
from nvbio_tpu.utils.simulate import random_genome


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    from nvbio_tpu.tools.build_index import main as build

    d = tmp_path_factory.mktemp("bwa")
    c1 = random_genome(20_000, seed=31)
    c2 = random_genome(9_000, seed=32)
    c1[4000:4007] = 4  # N run
    c2[100:103] = 4
    write_fasta(d / "g.fa", [("chrA", c1), ("chrB", c2)])
    assert build([str(d / "g.fa"), str(d / "g.npz"),
                  "--sa-sample", "8"]) == 0
    return d


def test_bwt_sa_files_match_oracle(built):
    """.bwt/.sa contents equal a direct suffix-array construction."""
    from nvbio_tpu.tools.bwa_export import export
    from nvbio_tpu.io.bwa_files import read_bwt, read_sa
    from nvbio_tpu.io.index_file import load_index, read_pac
    from nvbio_tpu.sufsort import suffix_array

    d = built
    export(str(d / "g.npz"), str(d / "bw"), sa_intv=16)
    _, _, genome, _ = load_index(d / "g.npz")
    syms = np.asarray(genome).astype(np.uint8)
    n = len(syms)

    np.testing.assert_array_equal(read_pac(d / "bw.pac"), syms)

    # oracle: full SA (sentinel smallest), BWT, primary
    sa = suffix_array(syms)
    sa_full = np.concatenate([[n], sa])
    idx = (sa_full - 1) % (n + 1)
    bwt_full = syms[np.minimum(idx, n - 1)]  # primary row garbage,
    primary = int(np.flatnonzero(sa_full == 0)[0])  # removed below
    oracle_bwt = np.concatenate(
        [bwt_full[:primary], bwt_full[primary + 1:]])

    got_bwt, got_primary, L2 = read_bwt(d / "bw.bwt")
    assert got_primary == primary
    np.testing.assert_array_equal(got_bwt, oracle_bwt)
    np.testing.assert_array_equal(
        L2, np.cumsum(np.bincount(oracle_bwt, minlength=4)[:4]))

    sad = read_sa(d / "bw.sa")
    assert sad["sa_intv"] == 16 and sad["seq_len"] == n
    assert sad["primary"] == primary
    n_sa = (n + 16) // 16
    rows = np.arange(1, n_sa) * 16
    np.testing.assert_array_equal(sad["sa"], sa_full[rows])


def test_ann_amb_roundtrip(built):
    from nvbio_tpu.io.bwa_files import read_ann, read_amb

    d = built
    ann = read_ann(d / "bw.ann")
    assert ann["names"] == ["chrA", "chrB"]
    assert ann["lens"] == [20_000, 9_000]
    assert ann["offsets"] == [0, 20_000]
    assert ann["n_ambs"] == [1, 1]
    amb = read_amb(d / "bw.amb")
    assert amb["holes"] == [(4000, 7, "N"), (20_100, 3, "N")]


def test_import_roundtrip_bit_identical(built):
    """npz -> bwa files -> npz: FM-index arrays and genome identical
    (the .bwt cross-check runs on the way in)."""
    from nvbio_tpu.tools.bwa_import import import_index
    from nvbio_tpu.io.index_file import load_index

    d = built
    rep = import_index(str(d / "bw"), str(d / "g2.npz"), sa_sample=8,
                       bi_sample=True)
    assert rep["bwt_checked"]
    fm1, ssa1, g1, m1 = load_index(d / "g.npz")
    fm2, ssa2, g2, m2 = load_index(d / "g2.npz")
    np.testing.assert_array_equal(g1, g2)
    for a, b in [(fm1.bwt_words, fm2.bwt_words),
                 (fm1.occ_abs, fm2.occ_abs), (fm1.C, fm2.C),
                 (fm1.primary, fm2.primary),
                 (ssa1.mark_words, ssa2.mark_words),
                 (ssa1.vals, ssa2.vals)]:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert m2["contig_names"] == m1["contig_names"]
    assert m2["contig_lens"] == m1["contig_lens"]
    assert m2["amb"] == m1["amb"]


def test_corrupt_bwt_rejected(built, tmp_path):
    """A .bwt that disagrees with .pac fails the import cross-check."""
    import shutil
    from nvbio_tpu.tools.bwa_import import import_index

    d = built
    for ext in (".pac", ".bwt", ".sa", ".ann", ".amb"):
        shutil.copy(str(d / ("bw" + ext)), str(tmp_path / ("x" + ext)))
    raw = bytearray(open(tmp_path / "x.bwt", "rb").read())
    raw[48] ^= 0xFF  # flip bases inside the packed BWT
    open(tmp_path / "x.bwt", "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="differs|primary"):
        import_index(str(tmp_path / "x"), str(tmp_path / "x.npz"))


def test_reverse_export(built):
    from nvbio_tpu.tools.bwa_export import export
    from nvbio_tpu.io.bwa_files import read_bwt
    from nvbio_tpu.io.index_file import load_index, read_pac
    from nvbio_tpu.sufsort import suffix_array

    d = built
    export(str(d / "g.npz"), str(d / "rv"), sa_intv=16, reverse=True)
    _, _, genome, _ = load_index(d / "g.npz")
    syms = np.asarray(genome).astype(np.uint8)[::-1]
    np.testing.assert_array_equal(read_pac(d / "rv.rpac"), syms)
    n = len(syms)
    sa = suffix_array(syms.copy())
    sa_full = np.concatenate([[n], sa])
    bwt_full = syms[np.minimum((sa_full - 1) % (n + 1), n - 1)]
    primary = int(np.flatnonzero(sa_full == 0)[0])
    oracle = np.concatenate([bwt_full[:primary], bwt_full[primary + 1:]])
    got, gp, _ = read_bwt(d / "rv.rbwt")
    assert gp == primary
    np.testing.assert_array_equal(got, oracle)
