"""Aligner taxonomy: scoring schemes and alignment types.

Replaces the reference's compile-time aligner tags (ref:
nvbio/alignment/alignment.h — ``SimpleGotohScheme``, ``GLOBAL``,
``LOCAL``, ``SEMI_GLOBAL``) with frozen dataclasses usable as jit static
arguments.

Conventions (frozen; oracle, XLA and Pallas paths all follow them):

- pattern = read (rows, index i), text = reference window (cols, j).
- All penalties are stored positive and subtracted.
- A gap of length L costs ``gap_open + L * gap_extend``.
- E = gap in pattern (consumes text; CIGAR 'D'), F = gap in text
  (consumes pattern; CIGAR 'I').
- Mismatch penalty is quality-aware, Bowtie2-style (ref:
  nvBowtie/bowtie2/cuda/scoring.h — ``SmithWatermanScoringScheme``):
  ``mm(q) = mm_min + floor((mm_max - mm_min) * min(q, 40) / 40)``.
- Tie-breaking in traceback: diagonal > E (deletion) > F (insertion);
  gap-open preferred over gap-extend on equal score.
- Best-cell tie-breaking: highest score, then smallest pattern end i,
  then smallest text end j.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass

NEG_INF = -(1 << 30)


class AlignmentType(enum.Enum):
    GLOBAL = 0
    SEMI_GLOBAL = 1  # pattern-global, text ends free
    LOCAL = 2


@dataclass(frozen=True)
class GotohScheme:
    """Affine-gap scoring scheme (quality-aware mismatches)."""

    match: int = 0
    mismatch_min: int = 2
    mismatch_max: int = 6
    n_penalty: int = 1
    gap_open: int = 5
    gap_extend: int = 3

    def mismatch(self, q: int) -> int:
        qc = min(int(q), 40)
        return self.mismatch_min + (
            (self.mismatch_max - self.mismatch_min) * qc
        ) // 40

    def substitution(self, a: int, b: int, q: int = 40) -> int:
        """Score of aligning pattern symbol a against text symbol b."""
        if a >= 4 or b >= 4:  # N on either side
            return -self.n_penalty
        return self.match if a == b else -self.mismatch(q)


#: unit-cost edit distance expressed in the Gotoh engine
EDIT_DISTANCE_SCHEME = GotohScheme(
    match=0, mismatch_min=1, mismatch_max=1, n_penalty=1, gap_open=0, gap_extend=1
)

#: Bowtie2 end-to-end defaults (--mp 6,2 --np 1 --rdg/--rfg 5,3)
BOWTIE2_END_TO_END_SCHEME = GotohScheme()

#: Bowtie2 local-mode defaults (--ma 2)
BOWTIE2_LOCAL_SCHEME = GotohScheme(match=2)
