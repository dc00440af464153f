"""Seed extraction demo (ref: examples/seeding/seeding.cu).

Shows the uniform-seed enumeration the mappers use: every read yields
seeds of `seed_len` at `seed_interval` spacing, as (read, offset)
coordinates over the padded batch.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from nvbio_tpu.strings.seeds import extract_uniform_seeds
from nvbio_tpu.basic.alphabet import decode_dna
from nvbio_tpu.utils.simulate import random_genome


def main():
    rng = np.random.default_rng(0)
    genome = random_genome(1000, seed=3)
    reads = np.stack([genome[s : s + 36] for s in rng.integers(0, 900, 4)])
    lens = jnp.full(4, 36, jnp.int32)
    seeds, offsets, valid = extract_uniform_seeds(
        jnp.asarray(reads.astype(np.int8)), lens,
        16, 10,
    )
    seeds = np.asarray(seeds)
    offsets = np.asarray(offsets)
    valid = np.asarray(valid)
    for r in range(4):
        print(f"read {r}: {decode_dna(reads[r].astype(np.uint8))}")
        for s in range(seeds.shape[1]):
            if valid[r, s]:
                print(f"  seed@{offsets[s]:2d}: "
                      f"{decode_dna(seeds[r, s].astype(np.uint8))}")


if __name__ == "__main__":
    main()
