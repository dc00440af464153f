"""Sequence I/O: FASTA/FASTQ readers, SAM output, index container.

Covers the reference's ``nvbio/io/`` layer (ref: io/sequence/* —
``open_sequence_file``, ``SequenceDataHost``; io/output/output_sam.cpp —
``SamOutput``; io/fmindex/fmindex.cpp — ``FMIndexData``).  Parsing is
pure Python/NumPy for now (gzip via stdlib); a C/C++ fast path for
FASTQ + BGZF is staged work (SURVEY.md §7.0, host-native layer).
"""

from .fasta import read_fasta, write_fasta  # noqa: F401
from .fastq import read_fastq, write_fastq, FastqBatchReader  # noqa: F401
from .sam import SamWriter, SamRecord  # noqa: F401
