"""Sharded FM-index mapping vs a single whole-genome index.

Primary alignments (position/strand/CIGAR/score) must match exactly;
boundary-crossing reads are the interesting case (the ownership rule +
overlap must find them exactly once).
"""

import numpy as np
import pytest

from nvbio_tpu.fmindex import build_fm_index
from nvbio_tpu.fmindex.sharded import (
    build_sharded_index,
    save_sharded_index,
    load_sharded_index,
)
from nvbio_tpu.models import MapperParams
from nvbio_tpu.models.mapper import Mapper
from nvbio_tpu.models.sharded_mapper import ShardedMapper
from nvbio_tpu.strings import pack_reads
from nvbio_tpu.utils.simulate import random_genome


@pytest.fixture(scope="module")
def setup():
    genome = random_genome(150_000, seed=101)
    params = MapperParams(batch_size=64, sa_sample=16, max_candidates=8,
                          lut_k=8)
    rng = np.random.default_rng(102)
    # reads everywhere + deliberately straddling both shard boundaries
    starts = list(rng.integers(0, 150_000 - 100, 48))
    starts += [59_950, 59_990, 119_950, 119_990]  # cross 60k/120k cuts
    seqs = []
    for s in starts:
        frag = genome[s : s + 100].copy()
        p = int(rng.integers(10, 90))
        frag[p] = (frag[p] + 1) % 4
        seqs.append(frag)
    reads, lens, quals, _ = pack_reads(
        seqs, [np.full(100, 35, np.uint8)] * len(seqs)
    )
    return genome, params, reads, lens, quals.astype(np.int32), starts


def test_sharded_matches_single_index(setup):
    genome, params, reads, lens, quals, starts = setup
    fm, ssa = build_fm_index(genome, sa_sample=16)
    single = Mapper(fm, ssa, genome, params=params, use_pallas=False)
    r_single = single.map_reads(reads, lens, quals)

    sidx = build_sharded_index(genome, shard_bp=60_000, overlap=2048,
                               sa_sample=16, lut_k=8)
    assert len(sidx.shards) == 3
    sharded = ShardedMapper(sidx, genome, params=params, use_pallas=False)
    r_sharded = sharded.map_reads(reads, lens, quals)

    for i, (a, b) in enumerate(zip(r_single, r_sharded)):
        assert a.aligned == b.aligned, i
        if a.aligned:
            assert (a.pos, a.strand, a.cigar, a.score, a.md, a.nm) == \
                   (b.pos, b.strand, b.cigar, b.score, b.md, b.nm), i
    # the boundary reads must be found at their true positions
    for i in range(len(starts) - 4, len(starts)):
        assert r_sharded[i].aligned
        assert r_sharded[i].pos == starts[i]


def test_sharded_save_load_roundtrip(setup, tmp_path):
    genome, params, reads, lens, quals, starts = setup
    sidx = build_sharded_index(genome, shard_bp=60_000, overlap=2048,
                               sa_sample=16, lut_k=8)
    prefix = str(tmp_path / "sharded")
    save_sharded_index(prefix, sidx, genome, ["chr1"], [len(genome)])
    sidx2, genome2, man = load_sharded_index(prefix)
    np.testing.assert_array_equal(genome2, genome.astype(np.int8))
    assert man["lut_k"] == 8
    m = ShardedMapper(sidx2, genome2.astype(np.uint8), params=params,
                      use_pallas=False)
    res = m.map_reads(reads, lens, quals)
    n_ok = sum(1 for i, r in enumerate(res)
               if r.aligned and r.pos == starts[i])
    assert n_ok >= len(starts) - 2
