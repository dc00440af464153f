"""Shard-per-chip mapping: one FM-index shard per device over a mesh.

The TPU-native scale-out layout from SURVEY.md §5.8 ("index sharded
over ICI with shard_map"): each shard of a beyond-HBM/beyond-int32
reference lives in its own device's HBM, the read batch is replicated,
and per-shard candidate stages run CONCURRENTLY — where the sequential
single-device ShardedMapper pays S x the candidate work per batch, the
mesh pays it once per chip in parallel (converting the hg38 3-shard
3x sequential tax into 3-chip parallelism).

Collective plan (all riding ICI, one round each):
  1. per-device candidate stage on the local shard (ownership-masked)
  2. `all_gather` of the (R, 2C) candidate arrays over the ``shard``
     axis -> every device reduces the same (R, S*2C) top-2, via the
     SAME `_top2_concat` as the sequential path (bit-identical ties)
  3. winner-shard window texts by masked `psum` (each device
     contributes its gathered windows only for reads it won)
  4. traceback walk sharded over reads (each device walks R/S reads)
     and `all_gather`-ed back

Positions stay shard-local int32 on device and globalize on the host
in int64, exactly like the sequential path (ShardedMapper._collect_
chunk is reused unchanged).

No reference equivalent: nvbio is single-GPU (SURVEY.md §3.12); this
is the green-field distributed design the survey calls for.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..alignment.types import NEG_INF
from ..fmindex.index import FMIndex, SSA
from ..fmindex.fm2 import FM2
from ..ops.banded_dp import pack_genome_words, window_slices
from .mapper import candidate_stage, traceback_walk_windows, PAD
from .params import MapperParams
from .sharded_mapper import ShardedMapper, _top2_concat


def stack_sharded_index(sidx, genome_np: np.ndarray,
                        params: MapperParams, use_pallas: bool):
    """Stack per-shard device structures along a leading shard axis.

    Shards are padded to common shapes (zeros for index tables — query
    rows never reach the pad because row indices are bounded by each
    shard's own n; PAD symbols for genome slices).  Returns
    (stacked dict of (S, ...) arrays, ssa_k, has_lut, has_gwords).
    """
    lt_pad = params.max_read_len + 2 * params.band_w + 8
    n = len(genome_np)
    gp = np.full(n + lt_pad, PAD, dtype=np.int8)
    gp[:n] = genome_np

    fms = [s[0] for s in sidx.shards]
    ssas = [s[1] for s in sidx.shards]
    luts = [s[2] for s in sidx.shards]
    starts = [s[3] for s in sidx.shards]
    lengths = [s[4] for s in sidx.shards]
    S = len(fms)

    def pad_stack(arrs, fill=0):
        # HOST arrays: the caller places each shard's slice directly
        # on its own device (one upload, no staging copy on device 0)
        arrs = [np.asarray(a) for a in arrs]
        m = max(a.shape[0] for a in arrs)
        out = np.full((S, m) + arrs[0].shape[1:], fill, arrs[0].dtype)
        for i, a in enumerate(arrs):
            out[i, : a.shape[0]] = a
        return out

    stacked = {
        "bwt_words": pad_stack([f.bwt_words for f in fms]),
        "occ_abs": pad_stack([f.occ_abs for f in fms]),
        "occ_sub": pad_stack([f.occ_sub for f in fms]),
        "C": np.stack([np.asarray(f.C) for f in fms]),
        "primary": np.asarray([int(f.primary) for f in fms], np.int32),
        "n": np.asarray([int(f.n) for f in fms], np.int32),
        "mark_words": pad_stack([s.mark_words for s in ssas]),
        "mark_abs": pad_stack([s.mark_abs for s in ssas]),
        "vals": pad_stack([s.vals for s in ssas]),
        "g": pad_stack(
            [gp[st : st + ln + lt_pad] for st, ln in zip(starts, lengths)],
            fill=PAD),
        "own_lo": np.asarray(
            [0 if i == 0 else 1 for i in range(S)], np.int32),
        "own_hi": np.asarray(
            [(starts[i + 1] if i + 1 < S else n) - starts[i] + 1
             for i in range(S)], np.int32),
    }
    has_lut = all(l is not None for l in luts)
    if has_lut:
        stacked["lut_lo"] = np.stack([np.asarray(l[0]) for l in luts])
        stacked["lut_hi"] = np.stack([np.asarray(l[1]) for l in luts])
    has_gwords = bool(use_pallas)
    if has_gwords:
        stacked["gwords"] = pad_stack(
            [pack_genome_words(gp[st : st + ln])
             for st, ln in zip(starts, lengths)])
    ssa_k = int(getattr(ssas[0], "k", 0) or 0)
    return stacked, ssa_k, has_lut, has_gwords


@functools.partial(
    jax.jit,
    static_argnames=("params", "use_pallas", "mesh", "ssa_k", "has_lut",
                     "has_gwords", "has_fm2"),
)
def mesh_map_batch(stacked, reads, lens, quals, *, params: MapperParams,
                   use_pallas: bool, mesh: Mesh, ssa_k: int,
                   has_lut: bool, has_gwords: bool, has_fm2: bool = False):
    """SE forward + traceback walk with one index shard per device.

    Output contract == ShardedMapper._dispatch_chunk's (fwd with
    shard-local win_start + "shard", walk dict), so the sequential
    host collection path is reused unchanged.
    """
    S = mesh.devices.size
    R, L = reads.shape
    assert R % S == 0, f"batch size {R} must divide by mesh size {S}"
    Rb = R // S
    LT = L + 2 * params.band_w

    def body(stk, reads, lens, quals):
        s = jax.lax.axis_index("shard")
        fm = FMIndex(stk["bwt_words"][0], stk["occ_abs"][0],
                     stk["occ_sub"][0], stk["C"][0], stk["primary"][0],
                     stk["n"][0])
        ssa = SSA(stk["mark_words"][0], stk["mark_abs"][0],
                  stk["vals"][0], k=ssa_k)
        g = stk["g"][0]
        lut = ((stk["lut_lo"][0], stk["lut_hi"][0]) if has_lut else None)
        gw = stk["gwords"][0] if has_gwords else None
        # per-device 2-step index over the LOCAL shard (mono-marked
        # SSA -> locate2_mono walk), derived in place at init
        fm2 = (FM2(stk["p2_words"][0], stk["p2_abs"][0],
                   stk["p2_sub"][0], stk["C2"][0], stk["row_a"][0],
                   stk["row_b"][0]) if has_fm2 else None)
        c = candidate_stage(fm, ssa, g, reads, lens, quals,
                            params=params, use_pallas=use_pallas,
                            lut=lut, gwords=gw, fm2=fm2)
        ws = c["win_start"]
        sc = jnp.where((ws >= stk["own_lo"][0]) & (ws < stk["own_hi"][0]),
                       c["score"], NEG_INF)

        # shard-major concat == the sequential path's concatenate order
        gath = lambda a: jax.lax.all_gather(a, "shard")
        cat = lambda a: gath(a).transpose(1, 0, 2).reshape(R, -1)
        fwd = _top2_concat(cat(sc), cat(ws), cat(c["t_end"]),
                           cat(c["p_end"]), lens, params)
        fwd["locate_dropped"] = jax.lax.psum(
            c.get("locate_dropped", jnp.int32(0)), "shard")
        fwd["overflow"] = jax.lax.psum(
            c["overflow"].astype(jnp.int32), "shard") > 0

        # winner-shard window texts: each device gathers from its own
        # slice; only the winning shard's contribution survives the sum
        wsc = jnp.clip(fwd["win_start"], 0, fm.n - 1)
        t_s = window_slices(g, wsc, LT)  # one slice per lane
        tl_s = jnp.clip(fm.n - wsc, 0, LT)
        mine = fwd["shard"] == s
        texts = jax.lax.psum(
            jnp.where(mine[:, None], t_s.astype(jnp.int32), 0), "shard"
        ).astype(jnp.int8)
        tlens = jax.lax.psum(jnp.where(mine, tl_s, 0), "shard")

        # traceback walk sharded over reads (R/S per device)
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, s * Rb, Rb, axis=0)
        _res, walk = traceback_walk_windows(
            sl(texts), sl(tlens), sl(reads), sl(lens), sl(quals),
            sl(fwd["strand"]), params=params, use_pallas=use_pallas)
        unslice = lambda a: gath(a).reshape((R,) + a.shape[1:])
        walk = {k: unslice(v) for k, v in walk.items()}
        return fwd, walk

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("shard"), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )(stacked, reads, lens, quals)


class MeshShardedMapper(ShardedMapper):
    """ShardedMapper whose forward runs shard-per-device over a mesh.

    Bit-identical to the sequential ShardedMapper (same reduce, same
    walk); only the schedule changes.  SE mapping only — PE and --all
    currently fall back to the sequential classes.
    """

    def __init__(self, sidx, genome_symbols, params=MapperParams(),
                 ref_name="ref", use_pallas=None, contigs=None,
                 mesh: Mesh | None = None):
        super().__init__(sidx, genome_symbols, params=params,
                         ref_name=ref_name, use_pallas=use_pallas,
                         contigs=contigs, device_state=False)
        S = len(sidx.shards)
        if mesh is None:
            devs = jax.devices()
            if len(devs) < S:
                raise ValueError(
                    f"need >= {S} devices for {S} shards, have "
                    f"{len(devs)} (use the sequential ShardedMapper)")
            mesh = Mesh(np.array(devs[:S]), ("shard",))
        if mesh.devices.size != S:
            raise ValueError(
                f"mesh size {mesh.devices.size} != shard count {S}")
        if self.params.batch_size % S:
            raise ValueError(
                f"batch_size {self.params.batch_size} must divide by "
                f"the {S}-device mesh (traceback is read-sharded)")
        self.mesh = mesh
        stacked, self._ssa_k, self._has_lut, self._has_gwords = \
            stack_sharded_index(sidx, np.asarray(genome_symbols),
                                self.params, self.use_pallas)
        sh = NamedSharding(mesh, P("shard"))
        devs = list(mesh.devices.flat)
        # place each shard's slice DIRECTLY on its device (one upload),
        # then assemble the (S, ...) sharded arrays from the pieces
        per_shard = [dict() for _ in devs]
        self._stacked = {}
        for k, v in stacked.items():
            pieces = [jax.device_put(v[s : s + 1], devs[s])
                      for s in range(len(devs))]
            self._stacked[k] = jax.make_array_from_single_device_arrays(
                v.shape, sh, pieces)
            for s, pc in enumerate(pieces):
                per_shard[s][k] = pc
        # per-device pair-BWT: each chip derives fm2 from ITS resident
        # shard piece in place (build_fm2_device; nothing is uploaded)
        # — at hg scale one chip holds one shard + its ~3 B/row
        # pair-BWT, which the sequential single-chip path can only
        # stream
        self._has_fm2 = bool(self.params.use_fm2)
        if self._has_fm2:
            self._stacked.update(self._stack_fm2(per_shard, sh))

    def _stack_fm2(self, per_shard, sh):
        from ..fmindex import build_fm2_device

        S = len(per_shard)
        keys = ("p2_words", "p2_abs", "p2_sub", "C2", "row_a", "row_b")
        pieces = {k: [] for k in keys}
        for ps in per_shard:
            # FMIndex view of this device's resident piece (leading
            # shard axis stripped; block padding past the true n is
            # inert — rows are bounded by the shard's own n)
            fm = FMIndex(ps["bwt_words"][0], ps["occ_abs"][0],
                         ps["occ_sub"][0], ps["C"][0], ps["primary"][0],
                         ps["n"][0])
            f2 = build_fm2_device(fm)
            pieces["p2_words"].append(f2.pair_words[None])
            pieces["p2_abs"].append(f2.occ_abs[None])
            pieces["p2_sub"].append(f2.occ_sub[None])
            pieces["C2"].append(f2.C2[None])
            pieces["row_a"].append(f2.row_a.reshape(1))
            pieces["row_b"].append(f2.row_b.reshape(1))
        return {
            k: jax.make_array_from_single_device_arrays(
                (S,) + ps[0].shape[1:], sh, ps)
            for k, ps in pieces.items()
        }

    def _dispatch_chunk(self, seqs, lens, quals, params=None):
        R = seqs.shape[0]
        seqs, lens, quals = self._pad_chunk(seqs, lens, quals)
        fwd, walk = mesh_map_batch(
            self._stacked, jnp.asarray(seqs),
            jnp.asarray(lens.astype(np.int32)),
            jnp.asarray(quals.astype(np.uint8)),
            params=params or self.params, use_pallas=self.use_pallas,
            mesh=self.mesh, ssa_k=self._ssa_k, has_lut=self._has_lut,
            has_gwords=self._has_gwords, has_fm2=self._has_fm2)
        return (seqs, lens, quals, fwd, walk, R)

    def map_reads_all(self, *a, **k):
        raise NotImplementedError(
            "--all over the mesh layout: use the sequential "
            "ShardedMapper (same index files)")
