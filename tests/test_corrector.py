"""Error corrector (nvLighter equivalent): fixes simulated errors."""

import numpy as np

from nvbio_tpu.models.corrector import Corrector
from nvbio_tpu.utils.simulate import random_genome


def test_corrector_fixes_substitutions():
    rng = np.random.default_rng(0)
    genome = random_genome(10_000, seed=31)
    R, L = 1500, 50
    starts = rng.integers(0, len(genome) - L, R)
    reads = np.stack([genome[s : s + L] for s in starts]).astype(np.int8)
    # plant exactly one substitution in half the reads
    err_reads = rng.choice(R, R // 2, replace=False)
    err_pos = rng.integers(5, L - 5, R // 2)
    truth = reads.copy()
    for i, r in enumerate(err_reads):
        p = err_pos[i]
        reads[r, p] = (reads[r, p] + 1 + rng.integers(0, 3)) % 4
    lens = np.full(R, L, np.int32)

    corr = Corrector.build([reads], [lens], k=15, log2_slots=18)
    fixed, ncorr = corr.correct(reads, lens, min_support=3)

    errs_before = int((reads != truth).sum())
    errs_after = int((fixed != truth).sum())
    assert errs_before == R // 2
    assert errs_after < 0.3 * errs_before, (
        f"{errs_after}/{errs_before} errors remain"
    )
    # clean reads must not be corrupted (allow a tiny false-positive rate)
    clean = np.setdiff1d(np.arange(R), err_reads)
    corrupted = int((fixed[clean] != truth[clean]).sum())
    assert corrupted <= 0.01 * len(clean) * L


def test_multi_round_fixes_second_error_in_window():
    """Two substitutions inside one k-window: round 1 fixes only the
    dominant one (no trusted covering k-mer yields gain for both at
    once); a second round recovers the read exactly."""
    rng = np.random.default_rng(77)
    g = rng.integers(0, 4, 40_000).astype(np.uint8)
    k = 15
    reads, lens = [], []
    for s in range(0, 20_000, 20):  # 5x coverage: k-mers reach trust
        reads.append(g[s : s + 100])
        lens.append(100)
    reads = np.stack(reads).astype(np.uint8)
    lens = np.asarray(lens, np.int32)
    corr = Corrector.build([reads], [lens], k=k)

    bad = reads[:8].copy()
    truth = reads[:8].copy()
    for i in range(8):
        p = 50
        bad[i, p] = (truth[i, p] + 1) % 4
        bad[i, p + 5] = (truth[i, p + 5] + 1) % 4  # same k-window
    one, n1 = corr.correct(bad, lens[:8], rounds=1)
    two, n2 = corr.correct(bad, lens[:8], rounds=3)
    assert (two == truth).all(), "multi-round must fully recover"
    assert (n2 >= n1).all()
    assert not (one == truth).all(), \
        "if one round already fixes both, the test premise is stale"
