"""Synthetic genome + read simulation (wgsim-style).

The environment ships no genome data (and the reference mount is
empty), so tests and benchmarks use seeded synthetic references and
mutated reads with known ground-truth positions — this doubles as a
mapping-accuracy oracle, which the reference validates only indirectly
via nvbio-aln-diff comparisons (SURVEY.md §5.1).
"""

from __future__ import annotations

import numpy as np

from ..basic.alphabet import reverse_complement


def random_genome(n: int, seed: int = 0) -> np.ndarray:
    """Uniform random DNA of length n (uint8 symbols 0..3)."""
    return np.random.default_rng(seed).integers(0, 4, n).astype(np.uint8)


def simulate_reads(
    genome: np.ndarray,
    n_reads: int,
    read_len: int = 100,
    error_rate: float = 0.01,
    indel_rate: float = 0.001,
    seed: int = 1,
):
    """Sample reads with substitution/indel errors from both strands.

    Returns dict with seqs (R, L) int8, quals (R, L) uint8,
    true_pos (R,) genome start of the sampled fragment,
    true_strand (R,) 0=fwd 1=rc.
    """
    rng = np.random.default_rng(seed)
    n = len(genome)
    frag = read_len + 8  # slack so indel-carrying reads still fill L
    starts = rng.integers(0, n - frag, n_reads)
    strands = rng.integers(0, 2, n_reads)
    seqs = np.zeros((n_reads, read_len), dtype=np.int8)
    quals = rng.integers(25, 41, (n_reads, read_len)).astype(np.uint8)
    for r in range(n_reads):
        template = genome[starts[r] : starts[r] + frag].copy()
        # apply errors on the template coordinates
        out = []
        i = 0
        while i < len(template) and len(out) < read_len:
            u = rng.random()
            if u < indel_rate:  # deletion from read (skip template base)
                i += 1
                continue
            if u < 2 * indel_rate:  # insertion into read
                out.append(rng.integers(0, 4))
                continue
            b = int(template[i])
            if rng.random() < error_rate:
                b = (b + 1 + rng.integers(0, 3)) % 4
            out.append(b)
            i += 1
        while len(out) < read_len:  # pad from genome tail if needed
            out.append(int(rng.integers(0, 4)))
        read = np.array(out[:read_len], dtype=np.uint8)
        if strands[r]:
            read = reverse_complement(read)
        seqs[r] = read
    return {
        "seqs": seqs,
        "quals": quals,
        "true_pos": starts.astype(np.int64),
        "true_strand": strands.astype(np.int8),
    }
