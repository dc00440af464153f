"""Maximal exact match (MEM/SMEM) search over the FM-index.

Ref parity: nvbio/fmindex/mem.h (``MEMFilter``, ``find_mems``) — the
seeding engine of the reference's BWA-MEM-style ``examples/mem`` mapper
("nvMem" in BASELINE.md).

Algorithm (fixed-shape, batched): for every end position e of every
read, one `lax.scan` over match length extends backward through the
FM-index and records the longest non-empty extension (left-maximal
match ending at e, capped at ``max_len``).  A match is an SMEM iff it
is not contained in the (necessarily longer) match ending at e+1 —
the adjacent-end containment check below — because containment by any
farther end implies containment at e+1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .index import FMIndex, rank


@functools.partial(jax.jit, static_argnames=("max_len",))
def find_mems(fm: FMIndex, reads, lens, max_len: int, min_len=19):
    """reads: (R, L) symbols; lens: (R,).

    Returns dict of (R, L) arrays indexed by end position e-1:
      ``len``  — longest match ending at e (backward/left-maximal),
      ``lo``/``hi`` — its SA range,
      ``smem`` — True where the match is an SMEM with len >= min_len.
    """
    R, L = reads.shape
    PADV = 7
    reads_pad = jnp.pad(reads.astype(jnp.int32), ((0, 0), (max_len, 0)),
                        constant_values=PADV)
    n1 = fm.n + 1
    lo0 = jnp.zeros((R, L), jnp.int32)
    hi0 = jnp.full((R, L), n1, jnp.int32)
    alive0 = jnp.ones((R, L), bool)
    best0 = (jnp.zeros((R, L), jnp.int32),) * 3  # len, lo, hi

    def step(carry, k):
        lo, hi, alive, (blen, blo, bhi) = carry
        # symbol at read index e-k = (j+1-k); padded offset max_len+j+1-k
        c = jax.lax.dynamic_slice_in_dim(
            reads_pad, max_len - k + 1, L, axis=1
        )
        bad = c >= 4
        c4 = jnp.minimum(c, 3)
        nlo = fm.C[c4] + rank(fm, c4, lo)
        nhi = fm.C[c4] + rank(fm, c4, hi)
        alive = alive & (~bad) & (nlo < nhi)
        lo = jnp.where(alive, nlo, lo)
        hi = jnp.where(alive, nhi, hi)
        blen = jnp.where(alive, k, blen)
        blo = jnp.where(alive, lo, blo)
        bhi = jnp.where(alive, hi, bhi)
        return (lo, hi, alive, (blen, blo, bhi)), None

    (lo, hi, alive, (blen, blo, bhi)), _ = jax.lax.scan(
        step, (lo0, hi0, alive0, best0),
        jnp.arange(1, max_len + 1, dtype=jnp.int32),
    )
    ends = jnp.arange(1, L + 1, dtype=jnp.int32)[None, :]
    in_read = ends <= lens[:, None]
    # SMEM: not contained in the match ending one position later
    next_len = jnp.concatenate(
        [blen[:, 1:], jnp.zeros((R, 1), jnp.int32)], axis=1
    )
    is_last = ends == lens[:, None]
    smem = in_read & (blen >= min_len) & (is_last | (next_len <= blen))
    return {"len": blen, "lo": blo, "hi": bhi, "smem": smem}
