"""Aligner taxonomy: scoring schemes and alignment types.

Replaces the reference's compile-time aligner tags (ref:
nvbio/alignment/alignment.h — ``SimpleGotohScheme``, ``GLOBAL``,
``LOCAL``, ``SEMI_GLOBAL``) with frozen dataclasses usable as jit static
arguments.

Conventions (frozen; oracle, XLA and Pallas paths all follow them):

- pattern = read (rows, index i), text = reference window (cols, j).
- All penalties are stored positive and subtracted.
- A gap of length L costs ``open + L * extend``.
- E = gap in pattern (consumes text; CIGAR 'D') — a *read gap* in
  Bowtie2 terms, costed by ``gap_open/gap_extend`` (``--rdg``).
  F = gap in text (consumes pattern; CIGAR 'I') — a *reference gap*,
  costed by ``ref_gap_open/ref_gap_extend`` (``--rfg``; defaults
  follow the read-gap penalties when negative).
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
    gap_open: int = 5  # read gaps (E / CIGAR 'D'; bowtie2 --rdg 5,3)
    gap_extend: int = 3
    ref_gap_open: int = -1  # reference gaps (F / CIGAR 'I'; --rfg);
    ref_gap_extend: int = -1  # negative = follow the read-gap values

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


def gap_penalties(scheme):
    """(e_open, e_extend, f_open, f_extend) for any scheme object.

    E (read gaps, 'D') always uses ``gap_open/gap_extend``; F
    (reference gaps, 'I') uses ``ref_gap_open/ref_gap_extend`` when
    set (>= 0), else the E values.  Works for schemes without the ref
    fields (e.g. ``MatrixScheme``)."""
    eo, ee = scheme.gap_open, scheme.gap_extend
    fo = getattr(scheme, "ref_gap_open", -1)
    fe = getattr(scheme, "ref_gap_extend", -1)
    return eo, ee, (eo if fo < 0 else fo), (ee if fe < 0 else fe)


#: unit-cost edit distance expressed in the Gotoh engine
EDIT_DISTANCE_SCHEME = GotohScheme(
    match=0, mismatch_min=1, mismatch_max=1, n_penalty=1, gap_open=0, gap_extend=1
)

#: Bowtie2 end-to-end defaults (--mp 6,2 --np 1 --rdg/--rfg 5,3)
BOWTIE2_END_TO_END_SCHEME = GotohScheme()

#: Bowtie2 local-mode defaults (--ma 2)
BOWTIE2_LOCAL_SCHEME = GotohScheme(match=2)
