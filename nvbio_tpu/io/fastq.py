"""FASTQ reader/writer (plain or gzip) with batch iteration.

Ref parity: nvbio/io/sequence/sequence_fastq.cpp + the batch semantics
of ``SequenceDataStream::next(max_reads, max_bps)`` used by nvBowtie's
InputThread (ref: nvBowtie/bowtie2/cuda/input_thread.cpp).
"""

from __future__ import annotations

import gzip

import numpy as np

from ..basic.alphabet import char_to_dna, dna_to_char


def _open(path, mode="rt"):
    path = str(path)
    if path.endswith(".gz"):
        return gzip.open(path, mode)
    return open(path, mode)


def read_fastq(path):
    """Parse an entire FASTQ file -> (names, seqs, quals) lists.

    seqs are uint8 symbol arrays (0..4), quals are uint8 Phred scores.
    """
    names, seqs, quals = [], [], []
    for n, s, q in iter_fastq(path):
        names.append(n)
        seqs.append(s)
        quals.append(q)
    return names, seqs, quals


def iter_fastq(path):
    with _open(path) as f:
        while True:
            hdr = f.readline()
            if not hdr:
                return
            seq = f.readline().strip()
            f.readline()  # '+'
            qual = f.readline().strip()
            name = hdr.strip()[1:].split()[0]
            s = char_to_dna(np.frombuffer(seq.encode(), dtype=np.uint8))
            q = np.frombuffer(qual.encode(), dtype=np.uint8) - 33
            yield name, s, q


class FastqBatchReader:
    """Iterate a FASTQ file in fixed-size read batches (the input side
    of the mapper pipeline; CPU thread overlap comes later)."""

    def __init__(self, path, batch_size: int):
        self._it = iter_fastq(path)
        self.batch_size = batch_size

    def __iter__(self):
        return self

    def __next__(self):
        names, seqs, quals = [], [], []
        for _ in range(self.batch_size):
            try:
                n, s, q = next(self._it)
            except StopIteration:
                break
            names.append(n)
            seqs.append(s)
            quals.append(q)
        if not names:
            raise StopIteration
        return names, seqs, quals


def read_fastq_packed(path, max_len: int):
    """Whole-file FASTQ -> padded batch matrices via the native C++
    parser (ref: sequence_fastq.cpp host-speed path), falling back to
    the Python parser.  Returns (names, reads (R, max_len) int8, lens,
    quals)."""
    raw = _open(path, "rb").read()
    from ..native import fastq_parse_native

    out = fastq_parse_native(raw, max_len)
    if out is not None:
        return out
    from ..strings import pack_reads

    names, seqs, quals = read_fastq(path)
    reads, lens, qmat, _ = pack_reads(seqs, quals, max_len=max_len)
    return names, reads, lens, qmat


def write_fastq(path, records):
    """records: iterable of (name, symbols, quals)."""
    with _open(path, "wt") as f:
        for name, sym, q in records:
            seq = dna_to_char(np.asarray(sym, dtype=np.uint8)).tobytes().decode()
            qs = (np.asarray(q, dtype=np.uint8) + 33).tobytes().decode()
            f.write(f"@{name}\n{seq}\n+\n{qs}\n")
