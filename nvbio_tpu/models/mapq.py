"""MAPQ model.

Plays the role of the reference's Bowtie2 V2 mapping-quality model
(ref: nvBowtie/bowtie2/cuda/mapq.h — ``BowtieMapq2``).  The exact
Bowtie2 table is GPL-derived and was not readable this session
(reference mount empty), so this is our own documented, monotone
piecewise table with the same inputs and the same qualitative
behavior:

- higher best-vs-second-best gap  -> higher MAPQ
- best score close to the perfect -> higher MAPQ
- unique alignments               -> 22..42 by margin over score-min
- ties (gap 0)                    -> MAPQ <= 3

Inputs are normalized by ``diff = max(1, score_perfect - score_min)``
so the table is read-length independent.
"""

from __future__ import annotations

import jax.numpy as jnp


def mapq_v2(best, second, has_second, score_min, score_perfect):
    """Vectorized MAPQ in [0, 42].

    best/second: int32 alignment scores; has_second: bool;
    score_min/score_perfect: per-read int32.
    """
    diff = jnp.maximum(1, score_perfect - score_min).astype(jnp.float32)
    bo = (best - score_min).astype(jnp.float32) / diff  # in [0, 1]
    bd = jnp.where(has_second, (best - second).astype(jnp.float32) / diff, 0.0)

    # unique alignments: scale by how close to perfect
    uq = jnp.select(
        [bo >= 0.8, bo >= 0.6, bo >= 0.4, bo >= 0.2],
        [42, 40, 32, 26],
        22,
    )
    # contested alignments: margin over the runner-up dominates
    ct = jnp.select(
        [
            bd >= 1.0,
            bd >= 0.76,
            bd >= 0.5,
            bd >= 0.25,
            bd >= 0.1,
            bd > 0.0,
        ],
        [
            jnp.where(bo >= 0.67, 42, 39),
            jnp.where(bo >= 0.67, 40, 36),
            jnp.where(bo >= 0.67, 35, jnp.where(bo >= 0.33, 31, 25)),
            jnp.where(bo >= 0.67, 28, jnp.where(bo >= 0.33, 22, 16)),
            jnp.where(bo >= 0.67, 20, jnp.where(bo >= 0.33, 14, 8)),
            jnp.where(bo >= 0.67, 12, jnp.where(bo >= 0.33, 6, 2)),
        ],
        jnp.where(bo >= 0.67, 3, jnp.where(bo >= 0.33, 1, 0)),
    )
    return jnp.where(has_second, ct, uq).astype(jnp.int32)
