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


def eval_simple_func_device(fn: str, a: float, b: float, x):
    """Bowtie2 SimpleFunc FN,A,B of a traced length array `x`
    (device twin of models.params.eval_simple_func; `fn` static)."""
    xf = x.astype(jnp.float32)
    if fn == "C":
        return jnp.full_like(xf, a)
    g = {"L": lambda: xf,
         "S": lambda: jnp.sqrt(xf),
         "G": lambda: jnp.log(jnp.maximum(xf, 1.0))}[fn]()
    return a + b * g


def extract_seeds_per_read(reads, lens, seed_len: int, num_seeds: int,
                           fn: str, a: float, b: float):
    """Per-read ``-i`` seed extraction (ref: bowtie2 params.cpp
    SimpleFunc evaluated per READ; nvbio/strings/seeds.h generates the
    per-read coordinate list).  The interval is computed on device
    from each read's length; `num_seeds` is the static slot count
    (callers size it for the chunk's densest read; surplus slots mask
    invalid).

    Returns (seeds (R, num_seeds, seed_len), offsets (R, num_seeds)
    int32, valid (R, num_seeds)).
    """
    R, L = reads.shape
    iv = jnp.maximum(
        jnp.floor(eval_simple_func_device(fn, a, b, lens) + 0.5), 1.0
    ).astype(jnp.int32)
    s = jnp.arange(num_seeds, dtype=jnp.int32)
    offsets = s[None, :] * iv[:, None]  # (R, S)
    valid = offsets + seed_len <= lens[:, None]
    offsets = jnp.where(valid, offsets, 0)  # keep gathers in range
    idx = offsets[:, :, None] + jnp.arange(seed_len, dtype=jnp.int32)
    seeds = jnp.take_along_axis(reads[:, None, :], idx, axis=2)
    return seeds, offsets, valid
