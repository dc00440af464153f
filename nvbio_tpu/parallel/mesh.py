"""Mesh construction and sharding helpers for data-parallel mapping.

Replaces the reference's one-compute-thread-per-GPU scheme (ref:
nvBowtie/bowtie2/cuda/compute_thread.cpp, ``ComputeThreadSE``) with
`jax.sharding`: the read batch is sharded on the leading axis over the
``dp`` mesh axis; index structures are replicated.  Works identically
on a single host (chips) and multi-host slices (jax.distributed),
where each host feeds its own FASTQ shards (SURVEY.md §5.8).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("dp",))


def shard_reads(mesh: Mesh, *arrays):
    """Shard arrays on their leading (reads) axis over ``dp``."""
    sh = NamedSharding(mesh, P("dp"))
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (index structures, genome) on every device."""
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)
