"""Mapping against a sharded FM-index (beyond-int32 / beyond-HBM refs).

Design (fmindex/sharded.py): the genome is split into S shards, each
with its own int32 FM-index over [start, start + span + overlap).  Per
batch, the shared candidate stage runs against every shard with that
shard's genome slice (all positions stay shard-local int32 on device);
an **ownership rule** replaces cross-shard dedupe: a candidate belongs
to a shard iff its window start lies inside the shard's span, so
boundary-crossing alignments are found exactly once (in the left
shard, whose overlap >= one alignment window).  A cross-shard top-2
reduction picks best/second; traceback runs per shard and the winner's
op stream is selected on the host.  Positions globalize (start +
local) only on the host, in int64.

This is also the single-chip rehearsal of the ICI index-sharding
layout (SURVEY.md §5.8): on a mesh, each shard lives on its own chip
with the read batch broadcast, and the same reduction runs as a
`jax.lax.pmax`-style tree.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..alignment.types import NEG_INF
from .mapper import (Mapper, MapResult, candidate_stage,
                     traceback_walk_batch, _score_min, _score_perfect,
                     PAD)
from .mapq import mapq_v2
from .params import MapperParams


@functools.partial(jax.jit, static_argnames=("params", "use_pallas"))
def _shard_cands(fm, ssa, genome_s, reads, lens, quals, span, *,
                 params: MapperParams, use_pallas=False, lut=None):
    c = candidate_stage(fm, ssa, genome_s, reads, lens, quals,
                        params=params, use_pallas=use_pallas, lut=lut)
    # ownership: alignments starting in the overlap tail belong to the
    # next shard — mask them here so they are counted exactly once
    sc = jnp.where(c["win_start"] < span, c["score"], NEG_INF)
    return {**c, "score": sc}


@functools.partial(jax.jit, static_argnames=("params",))
def _sharded_top2(cands, lens, params: MapperParams):
    """cands: list of per-shard dicts with (R, 2C) arrays."""
    R = lens.shape[0]
    C = params.max_candidates
    sc = jnp.concatenate([c["score"] for c in cands], axis=1)
    ws = jnp.concatenate([c["win_start"] for c in cands], axis=1)
    te = jnp.concatenate([c["t_end"] for c in cands], axis=1)
    pe = jnp.concatenate([c["p_end"] for c in cands], axis=1)
    bi = jnp.argmax(sc, axis=1)
    best = jnp.take_along_axis(sc, bi[:, None], axis=1)[:, 0]
    second = jnp.max(sc.at[jnp.arange(R), bi].set(NEG_INF), axis=1)
    has_second = second > NEG_INF // 2
    smin = _score_min(lens, params)
    smax = _score_perfect(lens, params)
    aligned = (best >= smin) & (lens > 0)
    strand = ((bi // C) % 2).astype(jnp.int32)
    shard = (bi // (2 * C)).astype(jnp.int32)
    take = lambda a: jnp.take_along_axis(a, bi[:, None], axis=1)[:, 0]
    mapq = jnp.where(
        aligned,
        mapq_v2(best, second, has_second & (second >= smin), smin, smax),
        0,
    )
    return {
        "aligned": aligned,
        "score": best,
        "second": second,
        "has_second": has_second,
        "strand": strand,
        "shard": shard,
        "win_start": take(ws),  # shard-local
        "t_end": take(te),
        "p_end": take(pe),
        "mapq": mapq,
    }


class ShardedMapper(Mapper):
    """Host orchestration over a ShardedIndex; SAM emit shared with the
    flagship mapper (global positions appear only on the host)."""

    def __init__(self, sidx, genome_symbols: np.ndarray,
                 params: MapperParams = MapperParams(),
                 ref_name: str = "ref", use_pallas: bool | None = None,
                 contigs: dict | None = None):
        self.params = params
        self.ref_name = ref_name
        self.n = int(len(genome_symbols))
        if contigs is None:
            contigs = {"names": [ref_name], "starts": np.zeros(1, np.int64),
                       "lens": np.array([self.n], np.int64)}
        self.contigs = contigs
        lt_pad = params.max_read_len + 2 * params.band_w + 8
        gp = np.full(self.n + lt_pad, PAD, dtype=np.int8)
        gp[: self.n] = genome_symbols
        self._genome_np = gp  # GLOBAL host copy (int64 indexing is free)
        if use_pallas is None:
            use_pallas = jax.default_backend() not in ("cpu",)
        self.use_pallas = use_pallas
        self.lut = None
        # per-shard device state: genome slice (+pad) and index
        self.shard_state = []
        for (fm, ssa, lut, start, length) in sidx.shards:
            g_s = jnp.asarray(gp[start : start + length + lt_pad])
            self.shard_state.append(dict(
                fm=fm, ssa=ssa, lut=lut, start=start, length=length,
                g=g_s,
            ))
        # owned span of shard i = next shard's start - this start (or
        # n - start for the last)
        starts = [s["start"] for s in self.shard_state] + [self.n]
        for i, st in enumerate(self.shard_state):
            st["span"] = starts[i + 1] - starts[i]

    def _dispatch_chunk(self, seqs, lens, quals):
        R = seqs.shape[0]
        B = self.params.batch_size
        if R < B:
            pad = B - R
            seqs = np.concatenate([seqs, np.full((pad, seqs.shape[1]), PAD,
                                                 seqs.dtype)])
            lens = np.concatenate([lens, np.zeros(pad, lens.dtype)])
            quals = np.concatenate([quals, np.zeros((pad, quals.shape[1]),
                                                    quals.dtype)])
        jr = jnp.asarray(seqs)
        jl = jnp.asarray(lens.astype(np.int32))
        jq = jnp.asarray(quals.astype(np.uint8))
        cands = [
            _shard_cands(st["fm"], st["ssa"], st["g"], jr, jl, jq,
                         jnp.asarray(st["span"], jnp.int32),
                         params=self.params, use_pallas=self.use_pallas,
                         lut=st["lut"])
            for st in self.shard_state
        ]
        fwd = _sharded_top2(cands, jl, self.params)
        # traceback against every shard; the winner's stream is picked
        # host-side in _collect_chunk (S is small)
        walks = []
        for st in self.shard_state:
            n_local = jnp.asarray(st["length"], jnp.int32)
            res, walk = traceback_walk_batch(
                st["g"], n_local, jr, jl, jq,
                fwd["win_start"], fwd["strand"], params=self.params,
            )
            walks.append((res, walk))
        return (seqs, lens, quals, fwd, walks, R)

    def _collect_chunk(self, handle):
        seqs, lens, quals, fwd, walks, R = handle
        shard = np.asarray(fwd["shard"])
        # merge per-shard walks by winner
        opss = [np.asarray(w["ops"]) for _, w in walks]
        p_starts = [np.asarray(w["p_start"]) for _, w in walks]
        t_starts = [np.asarray(w["t_start"]) for _, w in walks]
        sel = lambda arrs: np.stack(arrs, 0)[
            shard, np.arange(shard.shape[0])]
        walk = {
            "ops": sel(opss),
            "p_start": sel(p_starts),
            "t_start": sel(t_starts),
        }
        # globalize win_start on host (int64)
        starts = np.asarray([st["start"] for st in self.shard_state],
                            np.int64)
        fwd2 = dict(fwd)
        fwd2["win_start"] = (starts[shard]
                             + np.asarray(fwd["win_start"]).astype(np.int64))
        return self._finish(seqs, lens, quals, fwd2, None, walk)[:R]

    def map_reads_all(self, *a, **k):
        raise NotImplementedError(
            "--all mode is not yet supported on sharded indexes")
