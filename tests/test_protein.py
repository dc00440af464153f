"""Protein support: BLOSUM62 matrix SW, wavelet tree, protein FM-index."""

import numpy as np
import pytest
import jax.numpy as jnp

from nvbio_tpu.alignment import AlignmentType, align_oracle
from nvbio_tpu.alignment.blosum import BLOSUM62, MatrixScheme
from nvbio_tpu.alignment.extra import full_score_batch
from nvbio_tpu.basic.alphabet import (
    encode_protein,
    decode_protein,
    PROTEIN_SYMBOLS,
)
from nvbio_tpu.strings.wavelet import build_wavelet_tree, wt_rank, wt_access
from nvbio_tpu.fmindex.wavelet_fm import (
    build_wavelet_fm_index,
    wfm_backward_search,
)


def test_blosum62_symmetric_and_diagonal_positive():
    m = BLOSUM62.matrix_np
    assert m.shape == (PROTEIN_SYMBOLS, PROTEIN_SYMBOLS)
    np.testing.assert_array_equal(m, m.T)
    assert (np.diag(m)[:20] > 0).all()


def test_protein_roundtrip():
    s = "MKVLAARNDWYX*"
    assert decode_protein(encode_protein(s)) == s


def test_matrix_sw_matches_oracle():
    rng = np.random.default_rng(0)
    N, LP, LT = 12, 30, 50
    pats = rng.integers(0, 20, (N, LP)).astype(np.int32)
    texts = rng.integers(0, 20, (N, LT)).astype(np.int32)
    for i in range(0, N, 2):  # plant homologous regions
        s = rng.integers(0, LT - LP)
        texts[i, s : s + LP] = pats[i]
    plens = np.full(N, LP, np.int32)
    tlens = np.full(N, LT, np.int32)
    res = full_score_batch(
        jnp.asarray(pats), jnp.asarray(plens), jnp.asarray(texts),
        jnp.asarray(tlens), scheme=BLOSUM62, atype=AlignmentType.LOCAL,
    )
    got = np.asarray(res["score"])
    for i in range(N):
        want = align_oracle(pats[i], texts[i], scheme=BLOSUM62,
                            atype=AlignmentType.LOCAL)
        assert got[i] == want.score


@pytest.mark.parametrize("sigma", [3, 8, 22, 31])
def test_wavelet_rank_matches_bincount(sigma):
    rng = np.random.default_rng(sigma)
    n = 1000
    seq = rng.integers(0, sigma, n).astype(np.int32)
    wt = build_wavelet_tree(seq, sigma)
    cs = rng.integers(0, sigma, 64).astype(np.int32)
    iis = rng.integers(0, n + 1, 64).astype(np.int32)
    got = np.asarray(wt_rank(wt, jnp.asarray(cs), jnp.asarray(iis)))
    for k in range(64):
        want = int((seq[: iis[k]] == cs[k]).sum())
        assert got[k] == want, (sigma, cs[k], iis[k])


def test_wavelet_access():
    rng = np.random.default_rng(7)
    seq = rng.integers(0, 22, 500).astype(np.int32)
    wt = build_wavelet_tree(seq, 22)
    idx = rng.integers(0, 500, 100).astype(np.int32)
    got = np.asarray(wt_access(wt, jnp.asarray(idx)))
    np.testing.assert_array_equal(got, seq[idx])


def test_protein_fm_index_backward_search():
    rng = np.random.default_rng(3)
    n = 5000
    text = rng.integers(0, 20, n).astype(np.uint8)
    fm = build_wavelet_fm_index(text, sigma=22)
    # planted peptides must be found with the right occurrence count
    L = 8
    starts = rng.integers(0, n - L, 32)
    seeds = np.stack([text[s : s + L] for s in starts]).astype(np.int32)
    lo, hi = wfm_backward_search(fm, jnp.asarray(seeds))
    lo, hi = np.asarray(lo), np.asarray(hi)
    for k in range(32):
        pat = text[starts[k] : starts[k] + L]
        cnt = sum(
            1 for p in range(n - L + 1) if (text[p : p + L] == pat).all()
        )
        assert hi[k] - lo[k] == cnt
    # absent peptide -> empty range ('*' never occurs in the text)
    absent = np.full((1, L), 21, np.int32)
    lo, hi = wfm_backward_search(fm, jnp.asarray(absent))
    assert int(hi[0] - lo[0]) == 0


def test_protein_sw_cli(tmp_path):
    from nvbio_tpu.tools.protein_sw import main

    q = tmp_path / "q.fa"
    t = tmp_path / "t.fa"
    q.write_text(">q1\nMKVLAARND\n")
    t.write_text(">t1\nGGMKVLAARNDGG\n>t2\nWWWWWWWWW\n")
    out = tmp_path / "o.tsv"
    assert main([str(q), str(t), "-o", str(out)]) == 0
    lines = out.read_text().strip().splitlines()
    assert lines[0] == "query\ttarget\tscore"
    scores = {l.split("\t")[1]: int(l.split("\t")[2]) for l in lines[1:]}
    # exact 9-mer match: sum of BLOSUM62 diagonal for MKVLAARND
    m = BLOSUM62.matrix_np
    pep = encode_protein("MKVLAARND")
    assert scores["t1"] == int(m[pep, pep].sum())
    assert scores["t2"] < scores["t1"]
