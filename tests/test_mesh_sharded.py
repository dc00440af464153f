"""Shard-per-chip mesh mapping vs the sequential sharded mapper.

Runs on the 8-virtual-device CPU mesh (conftest.py) — the CI stand-in
for a real multi-chip slice, exercising the actual shard_map +
all_gather/psum collective layout of models/mesh_sharded.py.
"""

import numpy as np
import pytest

from nvbio_tpu.fmindex.sharded import build_sharded_index
from nvbio_tpu.models.params import MapperParams
from nvbio_tpu.utils.simulate import random_genome, simulate_reads


@pytest.fixture(scope="module")
def setup():
    genome = random_genome(180_000, seed=31)
    sim = simulate_reads(genome, 96, 100, seed=32)
    lens = np.full(96, 100, np.int32)
    quals = np.full((96, 100), 35, np.uint8)
    return genome, sim["seqs"].astype(np.uint8), lens, quals, sim


def _map_both(genome, seqs, lens, quals, n_shards, params):
    from nvbio_tpu.models.sharded_mapper import ShardedMapper
    from nvbio_tpu.models.mesh_sharded import MeshShardedMapper

    sidx = build_sharded_index(
        genome, shard_bp=(len(genome) + n_shards - 1) // n_shards,
        overlap=2048, sa_sample=16, lut_k=8)
    assert len(sidx.shards) == n_shards
    seq = ShardedMapper(sidx, genome, params=params, use_pallas=False)
    mesh = MeshShardedMapper(sidx, genome, params=params,
                             use_pallas=False)
    rs = seq.map_reads(seqs, lens, quals)
    rm = mesh.map_reads(seqs, lens, quals)
    return rs, rm, seq, mesh


@pytest.mark.parametrize("n_shards", [3, 4])
def test_mesh_matches_sequential(setup, n_shards):
    """Every field of every read's result is bit-identical between the
    shard-per-device mesh schedule and the sequential one."""
    genome, seqs, lens, quals, sim = setup
    params = MapperParams(batch_size=96, sa_sample=16, max_candidates=8,
                          lut_k=8)
    rs, rm, seq, mesh = _map_both(genome, seqs, lens, quals, n_shards,
                                  params)
    n_aligned = 0
    for i, (a, b) in enumerate(zip(rs, rm)):
        assert a.aligned == b.aligned, i
        if a.aligned:
            n_aligned += 1
            assert (a.pos, a.strand, a.cigar, a.score, a.mapq, a.md,
                    a.nm, a.second) == \
                   (b.pos, b.strand, b.cigar, b.score, b.mapq, b.md,
                    b.nm, b.second), i
    assert n_aligned >= 90
    # both schedules saw the same locate-budget pressure
    assert mesh.locate_dropped == seq.locate_dropped


def test_mesh_batch_not_divisible_rejected(setup):
    from nvbio_tpu.models.mesh_sharded import MeshShardedMapper

    genome, *_ = setup
    sidx = build_sharded_index(genome, shard_bp=60_000, overlap=2048,
                               sa_sample=16, lut_k=8)
    with pytest.raises(ValueError, match="divide"):
        MeshShardedMapper(sidx, genome,
                          params=MapperParams(batch_size=100,
                                              sa_sample=16),
                          use_pallas=False)


def test_mesh_partial_batch(setup):
    """Reads not filling batch_size (host-side pad path) still match."""
    genome, seqs, lens, quals, _ = setup
    params = MapperParams(batch_size=64, sa_sample=16, max_candidates=8,
                          lut_k=8)
    rs, rm, _, _ = _map_both(genome, seqs[:40], lens[:40], quals[:40],
                             4, params)
    for i, (a, b) in enumerate(zip(rs, rm)):
        assert (a.aligned, a.pos if a.aligned else 0,
                a.cigar if a.aligned else "") == \
               (b.aligned, b.pos if b.aligned else 0,
                b.cigar if b.aligned else ""), i
