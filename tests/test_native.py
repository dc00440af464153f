"""Native C++ fast paths vs the Python implementations."""

import gzip

import numpy as np
import pytest

from nvbio_tpu.native import lib, fastq_parse_native, bgzf_compress_native
from nvbio_tpu.io.fastq import write_fastq, read_fastq_packed, read_fastq
from nvbio_tpu.strings import pack_reads
from nvbio_tpu.utils.simulate import random_genome

pytestmark = pytest.mark.skipif(lib() is None,
                                reason="no native toolchain")


def _make_fastq(tmp_path, n=50, L=73):
    rng = np.random.default_rng(0)
    recs = []
    for i in range(n):
        s = rng.integers(0, 4, L).astype(np.uint8)
        if i % 7 == 0:
            s[3] = 4  # an N
        q = rng.integers(0, 41, L).astype(np.uint8)
        recs.append((f"read_{i}/1", s, q))
    p = tmp_path / "r.fq"
    write_fastq(p, recs)
    return p, recs


def test_native_fastq_matches_python(tmp_path):
    p, recs = _make_fastq(tmp_path)
    names, reads, lens, quals = read_fastq_packed(p, max_len=100)
    pn, ps, pq = read_fastq(p)
    preads, plens, pquals, _ = pack_reads(ps, pq, max_len=100)
    assert names == pn
    np.testing.assert_array_equal(reads, preads)
    np.testing.assert_array_equal(lens, plens)
    np.testing.assert_array_equal(quals, pquals)


def test_native_fastq_truncation(tmp_path):
    p, recs = _make_fastq(tmp_path, n=10, L=73)
    names, reads, lens, quals = read_fastq_packed(p, max_len=50)
    assert (lens == 50).all()
    np.testing.assert_array_equal(reads[0], recs[0][1][:50])


def test_native_bgzf_gzip_compatible():
    data = random_genome(300_000, seed=3).tobytes()
    out = bgzf_compress_native(data)
    assert out is not None
    assert gzip.decompress(out) == data
    # multiple blocks were emitted (0xFF00 payload cap)
    assert out.count(b"\x1f\x8b\x08\x04") >= len(data) // 0xFF00
