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


def simulate_pairs(
    genome: np.ndarray,
    n_pairs: int,
    read_len: int = 100,
    insert_mean: int = 300,
    insert_sd: int = 30,
    error_rate: float = 0.01,
    seed: int = 2,
):
    """FR paired-end reads: mate1 = fragment 5' (forward), mate2 =
    fragment 3' (reverse-complement).  Returns per-mate seq/qual plus
    ground-truth fragment starts."""
    rng = np.random.default_rng(seed)
    n = len(genome)
    inserts = np.clip(
        rng.normal(insert_mean, insert_sd, n_pairs).astype(int),
        read_len, None,
    )
    starts = rng.integers(0, n - inserts.max() - 1, n_pairs)
    s1 = np.zeros((n_pairs, read_len), dtype=np.int8)
    s2 = np.zeros((n_pairs, read_len), dtype=np.int8)
    q1 = rng.integers(25, 41, (n_pairs, read_len)).astype(np.uint8)
    q2 = rng.integers(25, 41, (n_pairs, read_len)).astype(np.uint8)
    for r in range(n_pairs):
        frag = genome[starts[r] : starts[r] + inserts[r]]
        m1 = frag[:read_len].copy()
        m2 = reverse_complement(frag[-read_len:].copy())
        for m in (m1, m2):
            errs = rng.random(read_len) < error_rate
            m[errs] = (m[errs] + 1 + rng.integers(0, 3, errs.sum())) % 4
        s1[r], s2[r] = m1, m2
    return {
        "seqs1": s1, "quals1": q1, "seqs2": s2, "quals2": q2,
        "true_pos": starts.astype(np.int64),
        "insert": inserts.astype(np.int64),
    }
