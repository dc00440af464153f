"""N-round effort escalation + per-bucket -i intervals + observability.

Ref: nvBowtie's best_approx rounds loop runs up to ``max_effort``
rounds with growing budgets (SURVEY.md §3.8), and Bowtie2's ``-i``
interval function is evaluated per read (params.cpp SimpleFunc); here
the ladder re-maps still-overflowing reads round by round and the
interval re-evaluates per 32-wide length bucket.
"""

import numpy as np

from nvbio_tpu.fmindex import build_fm_index
from nvbio_tpu.models import Mapper, MapperParams
from nvbio_tpu.strings import pack_reads


def _pack(seqs, max_len=128):
    quals = [np.full(len(s), 35, np.uint8) for s in seqs]
    return pack_reads([s.astype(np.uint8) for s in seqs], quals,
                      max_len=max_len)


def _repeat_genome(copies=100, elem_len=200, seed=77):
    rng = np.random.default_rng(seed)
    element = rng.integers(0, 4, elem_len).astype(np.uint8)
    parts = []
    for _ in range(copies):
        parts.append(element)
        parts.append(rng.integers(0, 4, 120).astype(np.uint8))
    parts.append(rng.integers(0, 4, 20_000).astype(np.uint8))
    return np.concatenate(parts), element


def test_three_round_ladder_recovers_what_two_cannot():
    """max_range=4: round 2 escalates to 32 (still < 100 copies, still
    overflows), round 3 to 256 (recovers).  max_effort=2 must fail,
    max_effort=3 must align — and the ladder's re-map count shows both
    rounds ran."""
    genome, element = _repeat_genome(copies=100)
    fm, ssa = build_fm_index(genome, sa_sample=8, bi_sample=True)
    reads = [element[40:140].copy() for _ in range(4)]
    packed, lens, quals, _ = _pack(reads)
    base = dict(batch_size=4, sa_sample=8, max_candidates=8,
                max_range=4)

    m2 = Mapper(fm, ssa, genome,
                params=MapperParams(max_effort=2, **base))
    r2 = m2.map_reads(packed, lens, quals)
    assert all(not r.aligned for r in r2), \
        "round-2 budgets (max_range 32) must still lose 100-copy reads"
    assert m2.overflowed == 4 and m2.escalated == 4

    m3 = Mapper(fm, ssa, genome,
                params=MapperParams(max_effort=3, **base))
    r3 = m3.map_reads(packed, lens, quals)
    for r in r3:
        assert r.aligned, "round 3 (max_range 256) must recover"
    # each read re-mapped in round 2 AND round 3
    assert m3.escalated == 8 and m3.overflowed == 4


def test_ladder_exits_early_when_overflow_clears():
    """Reads recovered by round 2 must not re-map in round 3."""
    genome, element = _repeat_genome(copies=100)
    fm, ssa = build_fm_index(genome, sa_sample=8, bi_sample=True)
    reads = [element[40:140].copy() for _ in range(4)]
    packed, lens, quals, _ = _pack(reads)
    # max_range=16: round 2 gives 128 >= 100 copies -> recovered there
    m = Mapper(fm, ssa, genome, params=MapperParams(
        max_effort=3, batch_size=4, sa_sample=8, max_candidates=8,
        max_range=16))
    res = m.map_reads(packed, lens, quals)
    assert all(r.aligned for r in res)
    assert m.escalated == 4, "round 3 must not re-run recovered reads"


def test_per_bucket_seed_interval():
    """-i L,0,0.25: a 64 bp chunk max-length seeds every 16 bp, a
    224 bp one every 56 bp — and mixed-length mapping stays
    correct."""
    rng = np.random.default_rng(78)
    genome = rng.integers(0, 4, 60_000).astype(np.uint8)
    fm, ssa = build_fm_index(genome, sa_sample=8, bi_sample=True)
    p = MapperParams(batch_size=8, sa_sample=8,
                     seed_interval=11, seed_interval_fn="L",
                     seed_interval_a=0.0, seed_interval_b=0.25)
    m = Mapper(fm, ssa, genome, params=p)
    assert m._chunk_params(64).seed_interval == 16
    assert m._chunk_params(224).seed_interval == 56
    # no fn -> the static fallback stays
    m0 = Mapper(fm, ssa, genome, params=MapperParams(
        batch_size=8, sa_sample=8))
    assert m0._chunk_params(64).seed_interval == 11

    # functional: short and long reads in separate batches bucket to
    # different widths and both map exactly
    for L in (50, 200):
        true_pos = [1000 + 777 * i for i in range(8)]
        reads = [genome[tp: tp + L].copy() for tp in true_pos]
        packed, lens, quals, _ = _pack(reads, max_len=224)
        res = m.map_reads(packed, lens, quals)
        for r, tp in zip(res, true_pos):
            assert r.aligned and r.pos == tp and r.cigar == f"{L}M"


def test_stats_surface_escalation():
    from nvbio_tpu.utils.stats import MappingStats

    s = MappingStats()
    s.overflowed = 3
    s.escalated = 5
    sm = s.summary()
    assert sm["overflowed"] == 3 and sm["escalated"] == 5
