"""Mapper configuration.

Replaces the reference's nvBowtie params (ref:
nvBowtie/bowtie2/cuda/params.h — ``Params``, ``parse_options``) with a
frozen dataclass usable as a jit static argument.  Field names keep
Bowtie2-compatible semantics where they exist (seed length, interval,
score-min function, --mp style mismatch range).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from ..alignment.types import GotohScheme, AlignmentType


def eval_simple_func(fn: str, a: float, b: float, x: float) -> float:
    """Bowtie2 SimpleFunc FN,A,B of x (ref: bowtie2 SimpleFunc /
    params.cpp): C -> a; L -> a + b*x; S -> a + b*sqrt(x);
    G -> a + b*ln(x)."""
    g = {"C": 1.0, "L": float(x), "S": math.sqrt(x),
         "G": math.log(max(x, 1))}[fn]
    return a if fn == "C" else a + b * g


@dataclass(frozen=True)
class MapperParams:
    # seeding (bowtie2 -L / -i equivalents; fixed interval for static shapes)
    seed_len: int = 22
    seed_interval: int = 11
    # optional -i interval FUNCTION of read length (bowtie2 SimpleFunc
    # FN in C/L/S/G): when set, the mapper re-evaluates the interval
    # per length bucket (Mapper._chunk_params) — mixed-length inputs
    # get the right seed density per bucket instead of the first
    # read's; seed_interval above is then only the fallback
    seed_interval_fn: str | None = None
    seed_interval_a: float = 0.0
    seed_interval_b: float = 0.0
    # > 0 switches candidate_stage to TRUE per-read -i: the interval
    # is evaluated from each read's own length on device and this is
    # the static seed-slot count (sized by Mapper._chunk_params for
    # the chunk's densest read).  Set internally for mixed-length
    # chunks when seed_interval_fn is given; uniform-length chunks
    # keep the cheaper static-offset path (identical seeds).
    seed_slots: int = 0
    # approximate seeding (bowtie2 -N: 0 or 1 mismatches in the seed,
    # ref: mapping_inl.h map_approx over fmindex/backtrack.h)
    seed_mismatches: int = 0
    max_hits_per_mm: int = 1  # SA rows expanded per 1-mm variant
    # hit selection
    max_hits_per_seed: int = 8  # SA rows expanded per seed
    max_range: int = 64  # seeds with more hits are skipped as repetitive
    max_candidates: int = 16  # distinct diagonals scored per read-strand
    max_locate: int = 32  # SSA walks per read-strand (rarity-first budget)
    lut_k: int = 11  # seed-tail k-mer LUT width (0 = no LUT)
    # extension
    band_w: int = 15
    scheme: GotohScheme = GotohScheme()
    local: bool = False
    # score-min as a Bowtie2 SimpleFunc of read length x:
    # C -> a; L -> a + b*x; S -> a + b*sqrt(x); G -> a + b*ln(x)
    # (bowtie2 end-to-end default --score-min L,-0.6,-0.6; local mode
    # default G,20,8)
    score_min_fn: str = "L"
    score_min_a: float = -0.6
    score_min_b: float = -0.6
    # MEM seeding (nvMem pipeline; BWA-MEM-style defaults)
    min_mem_len: int = 19
    max_smems: int = 8
    # index.  MUST be >= the K the index was built with (the CLI wires
    # it from the index metadata; direct-API users: a smaller value
    # silently corrupts locate positions).  Matches build_index's
    # --sa-sample default.
    sa_sample: int = 4
    # 2-step FM-index (fmindex/fm2.py): derived pair-BWT halves the
    # backward-search dependent-gather chain and (with a bi-marked SSA)
    # quarters the locate walk, for ~1 byte/bp extra device memory.
    # Set False for memory-tight multi-shard hg-scale runs.
    use_fm2: bool = True
    # cross-batch locate compaction budgets as fractions of the
    # (2R x max_locate) / 1-mismatch slot matrices (models/mapper.py
    # locate_compact): 1.0 locates every selected slot (pre-compaction
    # semantics); smaller is faster and drops the globally
    # least-prioritized hits first on hit-dense (repetitive) batches
    locate_frac: float = 0.25
    mm_locate_frac: float = 0.125
    # extension compaction budget as a fraction of the (2R x
    # max_candidates) slot matrix (models/mapper.py extend_candidates):
    # valid candidates are extended through a dense compacted batch of
    # this capacity (slot-rank-major, so every read's first
    # C*extend_frac diagonals always survive).  1.0 extends every
    # slot; drops surface as cand_overflow -> escalation.
    extend_frac: float = 0.25
    # paired-end (bowtie2 --minins/--maxins, FR orientation default)
    minins: int = 0
    maxins: int = 500
    enable_rescue: bool = True  # opposite-mate window search
    # mate orientation (bowtie2 --fr/--rf/--ff, ref: params.cpp):
    # "fr" upstream mate forward / downstream reverse (Illumina PE),
    # "rf" upstream reverse / downstream forward (mate-pair libs),
    # "ff" both mates same strand, mate 1 upstream on forward
    pe_orient: str = "fr"
    # concordant-pair geometry policy (bowtie2 --dovetail /
    # --no-contain / --no-overlap; ref: params.cpp + PE policy in
    # best_approx_inl.h): defaults match bowtie2 (overlap+containment
    # concordant, dovetailing not)
    pe_dovetail: bool = False
    pe_no_contain: bool = False
    pe_no_overlap: bool = False
    # reporting policy (bowtie2 --no-mixed / --no-discordant): mixed =
    # per-mate SE fallback when the pair is not proper; discordant =
    # both mates unique but violating the pair constraints
    no_mixed: bool = False
    no_discordant: bool = False
    # effort rounds (ref: nvBowtie select/score rounds loop,
    # ``max_effort``): reads whose round-1 budgets overflowed
    # (repetitive seeds skipped, locate slots dropped, candidate list
    # truncated) re-run once with escalated budgets (max_range x8,
    # locate fracs 1.0, 2x locate/candidate caps).  1 = single round.
    max_effort: int = 2
    # batching
    batch_size: int = 1024
    max_read_len: int = 512  # genome pad reserve for window gathers

    @property
    def atype(self) -> AlignmentType:
        return AlignmentType.LOCAL if self.local else AlignmentType.SEMI_GLOBAL
