"""BAM/BGZF writer roundtrip (decoded with gzip + our reader)."""

import gzip

from nvbio_tpu.io.bam import BamWriter, read_bam, bgzf_block
from nvbio_tpu.io.sam import SamRecord


def test_bgzf_is_gzip_compatible():
    blk = bgzf_block(b"hello bgzf world" * 100)
    assert gzip.decompress(blk) == b"hello bgzf world" * 100


def test_bam_roundtrip(tmp_path):
    path = tmp_path / "t.bam"
    recs = [
        SamRecord("r1", 0, "chr1", 101, 42, "50M", "ACGT" * 12 + "AC",
                  "I" * 50, tags=[("AS", "i", -3), ("MD", "Z", "50")]),
        SamRecord("r2", 16, "chr2", 5, 11, "10M2D38M2S", "ACGT" * 12 + "AC",
                  "F" * 50, rnext="=", pnext=200, tlen=-150,
                  tags=[("AS", "i", -17), ("NM", "i", 4)]),
        SamRecord("u1", 4, "*", 0, 0, "*", "ACGTACGT", "IIIIIIII"),
    ]
    w = BamWriter(path, ["chr1", "chr2"], [10000, 20000])
    for r in recs:
        w.write(r)
    w.close()

    text, names, got = read_bam(path)
    assert names == ["chr1", "chr2"]
    assert "@SQ\tSN:chr1\tLN:10000" in text
    assert len(got) == 3
    g1, g2, g3 = got
    assert g1["qname"] == "r1" and g1["pos"] == 100 and g1["cigar"] == "50M"
    assert g1["mapq"] == 42 and g1["tags"]["AS"] == -3
    assert g1["tags"]["MD"] == "50"
    assert g1["seq"] == "ACGT" * 12 + "AC"
    assert g2["flag"] == 16 and g2["cigar"] == "10M2D38M2S"
    assert g2["tlen"] == -150 and g2["next_pos"] == 199
    assert g3["flag"] == 4 and g3["ref_id"] == -1
