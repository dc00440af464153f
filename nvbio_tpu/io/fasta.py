"""FASTA reader/writer (plain or gzip).

Ref parity: nvbio/io/sequence/sequence_fasta.cpp (FASTA loader used by
nvBWT for the genome).
"""

from __future__ import annotations

import gzip

import numpy as np

from ..basic.alphabet import encode_dna, decode_dna


def _open(path, mode="rt"):
    path = str(path)
    if path.endswith(".gz"):
        return gzip.open(path, mode)
    return open(path, mode)


def read_fasta(path) -> list[tuple[str, np.ndarray]]:
    """Parse a FASTA file -> [(name, symbols uint8 0..4)]."""
    out = []
    name = None
    chunks: list[str] = []
    with _open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith(">"):
                if name is not None:
                    out.append((name, encode_dna("".join(chunks))))
                name = line[1:].split()[0]
                chunks = []
            else:
                chunks.append(line)
    if name is not None:
        out.append((name, encode_dna("".join(chunks))))
    return out


def read_fasta_text(path) -> list[tuple[str, str]]:
    """Parse a FASTA file -> [(name, raw sequence string)] — for
    non-DNA alphabets (protein FASTA, ref: proteinsw example input)."""
    out = []
    name = None
    chunks: list[str] = []
    with _open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith(">"):
                if name is not None:
                    out.append((name, "".join(chunks)))
                name = line[1:].split()[0]
                chunks = []
            else:
                chunks.append(line)
    if name is not None:
        out.append((name, "".join(chunks)))
    return out


def write_fasta(path, seqs, width: int = 70):
    """seqs: iterable of (name, symbol array)."""
    with _open(path, "wt") as f:
        for name, sym in seqs:
            f.write(f">{name}\n")
            s = decode_dna(sym)
            for i in range(0, len(s), width):
                f.write(s[i : i + width] + "\n")
