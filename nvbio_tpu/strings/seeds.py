"""Uniform seed extraction over a padded read batch.

Ref parity: nvbio/strings/seeds.h (``enumerate_string_seeds`` with
``uniform_seeds_functor``) — every read contributes seeds at offsets
0, I, 2I, ... of length `seed_len`; seeds overhanging the read end are
masked invalid (the reference simply generates fewer coordinates; we
keep fixed shapes and mask, per the design stance in SURVEY.md §7.0).
"""

from __future__ import annotations

import jax.numpy as jnp


def num_uniform_seeds(max_len: int, seed_len: int, interval: int) -> int:
    """Static seed-slot count for a padded batch of max_len reads."""
    if max_len < seed_len:
        return 0
    return (max_len - seed_len) // interval + 1


def extract_uniform_seeds(reads, lens, seed_len: int, interval: int):
    """reads: (R, L) int8; lens: (R,).

    Returns (seeds, offsets, valid):
      seeds   (R, S, seed_len) — seed symbol slices,
      offsets (S,)             — static offsets s*interval,
      valid   (R, S)           — seed fully inside the read.
    """
    R, L = reads.shape
    S = num_uniform_seeds(L, seed_len, interval)
    offsets = jnp.arange(S, dtype=jnp.int32) * interval
    seeds = jnp.stack(
        [reads[:, s * interval : s * interval + seed_len] for s in range(S)],
        axis=1,
    )
    valid = offsets[None, :] + seed_len <= lens[:, None]
    return seeds, offsets, valid
