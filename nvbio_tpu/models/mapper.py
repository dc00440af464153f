"""Seed-and-extend short-read mapper (nvBowtie-equivalent flagship).

The reference pipeline (ref: nvBowtie/bowtie2/cuda/best_approx_inl.h —
``best_approx_sc``; call stack SURVEY.md §4.1):

    seed -> map (FM backward search) -> select -> locate -> score
    (banded Gotoh) -> reduce (top-2) -> traceback -> MAPQ -> SAM

re-designed for TPU as two jitted fixed-shape stages plus host
formatting:

1. ``map_batch`` — the forward step: both strands are seeded uniformly
   (mapping_inl.h equivalent), seed SA ranges come from one batched
   backward search, hit selection is capacity-capped expansion +
   per-strand diagonal dedupe via double-sort (replacing the
   reference's SeedHitDequeArray priority deques and persistent-thread
   work queues with compaction, per SURVEY.md §3.12), candidates are
   extended with the banded Gotoh kernel, and a top-2 reduction +
   MAPQ finishes on-device.
2. ``traceback_batch`` — winners-only banded DP re-run emitting
   direction flags (traceback_inl.h equivalent); the CIGAR/MD walk
   happens on host (winner batches are small).

The ``Mapper`` class wires index + genome + params and produces SAM.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..alignment import banded_score_batch, banded_directions_batch
from ..alignment.cigar import traceback_banded, cigar_to_string, make_md_string
from ..alignment.types import NEG_INF
from ..fmindex import FMIndex, SSA, backward_search, locate
from ..ops.banded_dp import banded_score_pallas
from ..strings.seeds import extract_uniform_seeds, num_uniform_seeds
from ..basic.alphabet import dna_to_char
from ..io.sam import SamRecord, FLAG_UNMAPPED, FLAG_REVERSE
from .params import MapperParams
from .mapq import mapq_v2

PAD = 7


def _revcomp_batch(reads, lens, quals):
    """Reverse-complement left-aligned padded reads (and reverse quals)."""
    R, L = reads.shape
    idx = lens[:, None] - 1 - jnp.arange(L, dtype=jnp.int32)[None, :]
    ok = idx >= 0
    g = jnp.take_along_axis(reads, jnp.maximum(idx, 0), axis=1)
    rc = jnp.where(ok, jnp.where(g < 4, 3 - g, g), PAD).astype(reads.dtype)
    q = jnp.take_along_axis(quals, jnp.maximum(idx, 0), axis=1)
    q = jnp.where(ok, q, 0).astype(quals.dtype)
    return rc, q


def _score_min(lens, params: MapperParams):
    v = params.score_min_a + params.score_min_b * lens.astype(jnp.float32)
    return jnp.ceil(v).astype(jnp.int32)


def _score_perfect(lens, params: MapperParams):
    return (lens * params.scheme.match).astype(jnp.int32)


def extend_candidates(
    fm: FMIndex,
    genome,
    all_reads,  # (2R, L) forward rows then reverse-complement rows
    all_quals,
    lens2,  # (2R,)
    cand,  # (2R, M) candidate genome start positions, >= SENT invalid
    *,
    params: MapperParams,
    use_pallas: bool = False,
):
    """Diagonal dedupe + banded Gotoh extension of located candidates.

    The shared back half of every seeding strategy (uniform-seed,
    SMEM, q-gram): dedupes candidate diagonals per read-strand via
    double-sort (replacing the reference's persistent-thread scoring
    queues, SURVEY.md §3.12), keeps the first ``max_candidates``, and
    scores them with the banded kernel (ref: score_inl.h
    ``score_best``).  Returns dict of (R, 2C) arrays.
    """
    R2, L = all_reads.shape
    R = R2 // 2
    C = params.max_candidates
    W = params.band_w
    LT = L + 2 * W
    n = fm.n
    SENT = n + 2 * L + 1
    cand = jnp.minimum(cand, SENT)

    # --- dedupe diagonals per read-strand, keep first C ---
    cand = jnp.sort(cand, axis=1)
    first = jnp.concatenate(
        [
            jnp.ones((R2, 1), bool),
            cand[:, 1:] != cand[:, :-1],
        ],
        axis=1,
    )
    cand = jnp.sort(jnp.where(first, cand, SENT), axis=1)[:, :C]  # (2R, C)
    cand_ok = cand < SENT

    # --- extension scoring (banded Gotoh) ---
    win_start = jnp.minimum(cand, jnp.maximum(n - 1, 0)).astype(jnp.int32)
    gidx = win_start[:, :, None] + jnp.arange(LT, dtype=jnp.int32)
    texts = genome[gidx.reshape(R2 * C, LT)]
    tlens = jnp.clip(n - win_start, 0, LT).reshape(-1)
    pats = jnp.repeat(all_reads, C, axis=0)
    pquals = jnp.repeat(all_quals, C, axis=0)
    plens = jnp.repeat(lens2, C)
    score_fn = banded_score_pallas if use_pallas else banded_score_batch
    res = score_fn(
        pats, plens, texts, tlens, pquals,
        scheme=params.scheme, atype=params.atype, band_w=W,
    )
    scores = jnp.where(
        cand_ok.reshape(-1) & (plens > 0), res["score"], NEG_INF
    ).reshape(R2, C)

    to_r2c = lambda a: a.reshape(2, R, C).transpose(1, 0, 2).reshape(R, 2 * C)
    return {
        "score": to_r2c(scores),
        "win_start": to_r2c(win_start),
        "t_end": to_r2c(res["t_end"].reshape(R2, C)),
        "p_end": to_r2c(res["p_end"].reshape(R2, C)),
    }


def both_strands(reads, lens, quals):
    """Stack forward + reverse-complement rows: (2R, L) arrays."""
    rc_reads, rc_quals = _revcomp_batch(reads, lens, quals)
    all_reads = jnp.concatenate([reads, rc_reads], axis=0)
    all_quals = jnp.concatenate([quals, rc_quals], axis=0)
    lens2 = jnp.concatenate([lens, lens])
    return all_reads, all_quals, lens2


def candidate_stage(
    fm: FMIndex,
    ssa: SSA,
    genome,  # (n + pad,) int8, padded with PAD beyond position n
    reads,  # (R, L) int8
    lens,  # (R,) int32
    quals,  # (R, L) uint8/int32
    *,
    params: MapperParams,
    use_pallas: bool = False,
):
    """Seed -> map -> select -> locate -> score: per-candidate arrays.

    Returns dict of (R, 2C)-shaped arrays (C candidates per strand;
    columns [0, C) = forward, [C, 2C) = reverse): score, win_start,
    t_end, p_end — the shared front half of the SE and PE pipelines
    (ref: best_approx_inl.h stages before reduce).
    """
    R, L = reads.shape
    S = num_uniform_seeds(L, params.seed_len, params.seed_interval)
    CAP = params.max_hits_per_seed
    n = fm.n

    all_reads, all_quals, lens2 = both_strands(reads, lens, quals)

    # --- seed & map (FM backward search) ---
    seeds, offsets, sval = extract_uniform_seeds(
        all_reads, lens2, params.seed_len, params.seed_interval
    )
    flat_seeds = seeds.reshape(2 * R * S, params.seed_len)
    lo, hi = backward_search(fm, flat_seeds)
    lo = lo.reshape(2 * R, S)
    hi = hi.reshape(2 * R, S)
    sizes = jnp.where(sval, hi - lo, 0)
    use = jnp.where(sizes > params.max_range, 0, jnp.minimum(sizes, CAP))

    # --- select + locate ---
    t = jnp.arange(CAP, dtype=jnp.int32)
    rows = lo[:, :, None] + t[None, None, :]  # (2R, S, CAP)
    hit_ok = t[None, None, :] < use[:, :, None]
    rows_safe = jnp.clip(rows, 0, n).reshape(-1)
    pos = locate(fm, ssa, rows_safe, k_sample=params.sa_sample)
    pos = pos.reshape(2 * R, S, CAP)
    SENT = n + 2 * L + 1
    cand = jnp.where(hit_ok, pos - offsets[None, :, None], SENT)
    cand = jnp.where(cand < 0, 0, cand)  # clamp starts hanging off the left
    cand = cand.reshape(2 * R, S * CAP)

    if params.seed_mismatches >= 1:
        # 1-mismatch seeding (bowtie2 -N 1; ref: mapping_inl.h
        # map_approx): every one-substitution variant's SA range,
        # expanded to a few hits each, joins the candidate pool.
        from ..fmindex.backtrack import hamming_backtrack_1

        Ls = params.seed_len
        CAPV = params.max_hits_per_mm
        bt = hamming_backtrack_1(fm, flat_seeds)
        vlo = bt["lo"].reshape(2 * R, S, Ls * 4)
        vsz = jnp.where(bt["valid"], bt["hi"] - bt["lo"], 0).reshape(
            2 * R, S, Ls * 4)
        use_v = jnp.where(vsz > params.max_range, 0,
                          jnp.minimum(vsz, CAPV))
        tv = jnp.arange(CAPV, dtype=jnp.int32)
        rows_v = vlo[..., None] + tv  # (2R, S, Ls*4, CAPV)
        ok_v = tv < use_v[..., None]
        pos_v = locate(
            fm, ssa, jnp.clip(rows_v, 0, n).reshape(-1),
            k_sample=params.sa_sample,
        ).reshape(rows_v.shape)
        cand_v = jnp.where(ok_v, pos_v - offsets[None, :, None, None],
                           SENT)
        cand_v = jnp.where(cand_v < 0, 0, cand_v)
        cand = jnp.concatenate(
            [cand, cand_v.reshape(2 * R, S * Ls * 4 * CAPV)], axis=1)

    return extend_candidates(
        fm, genome, all_reads, all_quals, lens2, cand,
        params=params, use_pallas=use_pallas,
    )


@functools.partial(jax.jit, static_argnames=("params", "use_pallas"))
def map_batch(
    fm: FMIndex,
    ssa: SSA,
    genome,
    reads,
    lens,
    quals,
    *,
    params: MapperParams,
    use_pallas: bool = False,
):
    """Forward mapping step: per-read best/second alignments + MAPQ.

    Returns dict of (R,)-shaped arrays: aligned, score, second,
    has_second, strand, win_start, t_end, p_end, mapq.
    """
    cands = candidate_stage(
        fm, ssa, genome, reads, lens, quals,
        params=params, use_pallas=use_pallas,
    )
    return top2_finish(cands, lens, params)


def top2_finish(cands, lens, params: MapperParams):
    """Top-2 reduce across strands & candidates + MAPQ (ref:
    reduce_inl.h ``score_reduce`` + mapq.h)."""
    R = lens.shape[0]
    C = params.max_candidates
    sc = cands["score"]
    t_end = cands["t_end"]
    p_end = cands["p_end"]
    ws = cands["win_start"]
    bi = jnp.argmax(sc, axis=1)
    best = jnp.take_along_axis(sc, bi[:, None], axis=1)[:, 0]
    sc_masked = sc.at[jnp.arange(R), bi].set(NEG_INF)
    second = jnp.max(sc_masked, axis=1)
    has_second = second > NEG_INF // 2

    smin = _score_min(lens, params)
    smax = _score_perfect(lens, params)
    aligned = (best >= smin) & (lens > 0)
    strand = (bi // C).astype(jnp.int32)
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
        "win_start": take(ws),
        "t_end": take(t_end),
        "p_end": take(p_end),
        "mapq": mapq,
    }


@functools.partial(jax.jit, static_argnames=("params",))
def traceback_batch(
    genome, n, reads, lens, quals, win_start, strand, *,
    params: MapperParams
):
    """Winners-only direction-flag DP for exact CIGARs.

    reads/quals here are the ORIGINAL reads; the strand winner decides
    whether the forward or reverse-complemented pattern is re-aligned.
    Returns (result dict, dirs) for the host CIGAR walk.
    """
    R, L = reads.shape
    W = params.band_w
    LT = L + 2 * W
    rc_reads, rc_quals = _revcomp_batch(reads, lens, quals)
    pats = jnp.where(strand[:, None] == 1, rc_reads, reads)
    pquals = jnp.where(strand[:, None] == 1, rc_quals, quals)
    gidx = win_start[:, None] + jnp.arange(LT, dtype=jnp.int32)
    texts = genome[gidx]
    tlens = jnp.clip(n - win_start, 0, LT)
    return banded_directions_batch(
        pats, lens, texts, tlens, pquals,
        scheme=params.scheme, atype=params.atype, band_w=W,
    )


@dataclass
class MapResult:
    """One read's final alignment (host-side)."""

    aligned: bool
    pos: int = 0  # 0-based concat-genome position of the alignment start
    strand: int = 0
    score: int = 0
    second: int | None = None
    mapq: int = 0
    cigar: str = "*"
    md: str = ""
    nm: int = 0
    ref_span: int = 0  # genome bases consumed (CIGAR M+D)


class Mapper:
    """Host orchestration: index + genome + params -> SAM records.

    Plays the role of nvBowtie's ComputeThread + OutputFile glue (ref:
    compute_thread.cpp, output_sam.cpp) for a single device.
    """

    def __init__(self, fm, ssa, genome_symbols: np.ndarray,
                 params: MapperParams = MapperParams(),
                 ref_name: str = "ref", use_pallas: bool | None = None,
                 contigs: dict | None = None):
        self.fm = fm
        self.ssa = ssa
        self.params = params
        self.ref_name = ref_name
        self.n = int(genome_symbols.shape[0])
        # contig table for multi-sequence references (nvBWT .ann equiv)
        if contigs is None:
            contigs = {"names": [ref_name], "starts": np.zeros(1, np.int64),
                       "lens": np.array([self.n], np.int64)}
        self.contigs = contigs
        lt_pad = params.max_read_len + 2 * params.band_w + 8
        gp = np.full(self.n + lt_pad, PAD, dtype=np.int8)
        gp[: self.n] = genome_symbols
        self.genome = jnp.asarray(gp)
        if use_pallas is None:
            use_pallas = jax.default_backend() not in ("cpu",)
        self.use_pallas = use_pallas

    def map_reads(self, seqs: np.ndarray, lens: np.ndarray,
                  quals: np.ndarray) -> list[MapResult]:
        """Map one padded batch; returns per-read MapResult."""
        R = seqs.shape[0]
        B = self.params.batch_size
        out: list[MapResult] = []
        for s0 in range(0, R, B):
            out.extend(self._map_chunk(
                seqs[s0 : s0 + B], lens[s0 : s0 + B], quals[s0 : s0 + B]
            ))
        return out

    def _map_chunk(self, seqs, lens, quals):
        R = seqs.shape[0]
        B = self.params.batch_size
        if R < B:  # pad to the jit batch shape
            pad = B - R
            seqs = np.concatenate([seqs, np.full((pad, seqs.shape[1]), PAD,
                                                 seqs.dtype)])
            lens = np.concatenate([lens, np.zeros(pad, lens.dtype)])
            quals = np.concatenate([quals, np.zeros((pad, quals.shape[1]),
                                                    quals.dtype)])
        jr = jnp.asarray(seqs)
        jl = jnp.asarray(lens.astype(np.int32))
        jq = jnp.asarray(quals.astype(np.int32))
        fwd = self._forward(jr, jl, jq)
        res, dirs = traceback_batch(
            self.genome, jnp.asarray(self.n, jnp.int32), jr, jl, jq,
            fwd["win_start"], fwd["strand"], params=self.params,
        )
        return self._finish(seqs, lens, quals, fwd, res, dirs)[:R]

    def _forward(self, jr, jl, jq):
        """The jitted forward mapping step; subclasses swap seeding."""
        return map_batch(
            self.fm, self.ssa, self.genome, jr, jl, jq,
            params=self.params, use_pallas=self.use_pallas,
        )

    def _finish(self, seqs, lens, quals, fwd, res, dirs):
        """Host CIGAR/MD walk for aligned reads."""
        aligned = np.asarray(fwd["aligned"])
        strand = np.asarray(fwd["strand"])
        win_start = np.asarray(fwd["win_start"])
        score = np.asarray(fwd["score"])
        second = np.asarray(fwd["second"])
        has_second = np.asarray(fwd["has_second"])
        mapq = np.asarray(fwd["mapq"])
        p_end = np.asarray(res["p_end"])
        t_end = np.asarray(res["t_end"])
        dirs = np.asarray(dirs)
        genome = np.asarray(self.genome)
        W = self.params.band_w
        results = []
        for r in range(seqs.shape[0]):
            if not aligned[r]:
                results.append(MapResult(aligned=False))
                continue
            cigar_ops, p_start, t_start = traceback_banded(
                dirs[r], int(p_end[r]), int(t_end[r]), W, self.params.atype
            )
            pat = seqs[r, : lens[r]].astype(np.uint8)
            if strand[r] == 1:
                pat = np.where(pat < 4, 3 - pat, pat)[::-1].astype(np.uint8)
            window = genome[win_start[r] : win_start[r] + lens[r] + 2 * W]
            md, nm = make_md_string(pat, window, p_start, t_start, cigar_ops)
            ref_span = sum(l for op, l in cigar_ops if op in "MD")
            results.append(
                MapResult(
                    aligned=True,
                    ref_span=ref_span,
                    pos=int(win_start[r] + t_start),
                    strand=int(strand[r]),
                    score=int(score[r]),
                    second=int(second[r]) if has_second[r] else None,
                    mapq=int(mapq[r]),
                    cigar=cigar_to_string(
                        cigar_ops, p_start, int(lens[r])
                    ),
                    md=md,
                    nm=nm,
                )
            )
        return results

    def locate_contig(self, mr: MapResult):
        """Concat position -> (contig name, local pos); None if the
        alignment crosses a contig boundary (reported unmapped)."""
        from ..io.genome import concat_to_contig

        return concat_to_contig(
            mr.pos, max(mr.ref_span, 1),
            self.contigs["starts"], self.contigs["lens"],
            self.contigs["names"],
        )

    def to_sam_records(self, names, seqs, lens, quals,
                       results: list[MapResult]):
        """Convert MapResults to SamRecords (SEQ is the forward-strand
        read for FLAG 16 records, per SAM convention)."""
        recs = []
        for i, mr in enumerate(results):
            pat = seqs[i, : lens[i]].astype(np.uint8)
            q = quals[i, : lens[i]].astype(np.uint8)
            if mr.aligned and mr.strand == 1:
                pat = np.where(pat < 4, 3 - pat, pat)[::-1].astype(np.uint8)
                q = q[::-1]
            seq_str = dna_to_char(pat).tobytes().decode()
            qual_str = (q + 33).tobytes().decode()
            loc = self.locate_contig(mr) if mr.aligned else None
            if not mr.aligned or loc is None:
                recs.append(SamRecord(names[i], FLAG_UNMAPPED, "*", 0, 0,
                                      "*", seq_str, qual_str))
                continue
            rname, lpos = loc
            tags = [("AS", "i", mr.score), ("NM", "i", mr.nm),
                    ("MD", "Z", mr.md)]
            if mr.second is not None:
                tags.insert(1, ("XS", "i", mr.second))
            recs.append(
                SamRecord(
                    names[i],
                    FLAG_REVERSE if mr.strand else 0,
                    rname,
                    lpos + 1,
                    mr.mapq,
                    mr.cigar,
                    seq_str,
                    qual_str,
                    tags=tags,
                )
            )
        return recs

    def map_reads_all(self, seqs, lens, quals, max_alns: int = 8):
        """All-mappings mode (ref: nvBowtie --all): per read, up to
        max_alns distinct alignments above score-min, score-descending,
        each traced back to a full MapResult."""
        R = seqs.shape[0]
        B = self.params.batch_size
        out: list[list[MapResult]] = []
        for s0 in range(0, R, B):
            out.extend(self._map_chunk_all(
                seqs[s0 : s0 + B], lens[s0 : s0 + B], quals[s0 : s0 + B],
                max_alns,
            ))
        return out

    def _map_chunk_all(self, seqs, lens, quals, k):
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
        jq = jnp.asarray(quals.astype(np.int32))
        fwd = map_all_batch(
            self.fm, self.ssa, self.genome, jr, jl, jq,
            params=self.params, use_pallas=self.use_pallas, k=k,
        )
        K = fwd["score"].shape[1]
        # traceback every slot: flatten (B, K) -> (B*K) pseudo-batch
        rep = lambda a: jnp.repeat(a, K, axis=0)
        res, dirs = traceback_batch(
            self.genome, jnp.asarray(self.n, jnp.int32),
            rep(jr), jnp.repeat(jl, K), rep(jq),
            fwd["win_start"].reshape(-1), fwd["strand"].reshape(-1),
            params=self.params,
        )
        flat_fwd = {
            "aligned": np.asarray(fwd["valid"]).reshape(-1),
            "strand": np.asarray(fwd["strand"]).reshape(-1),
            "win_start": np.asarray(fwd["win_start"]).reshape(-1),
            "score": np.asarray(fwd["score"]).reshape(-1),
            "second": np.zeros(B * K, np.int32),
            "has_second": np.zeros(B * K, bool),
            "mapq": np.zeros(B * K, np.int32),
        }
        results = self._finish(
            np.repeat(seqs, K, axis=0), np.repeat(lens, K),
            np.repeat(quals, K, axis=0), flat_fwd, res, dirs,
        )
        grouped = []
        for r in range(min(R, B)):
            alns = [results[r * K + j] for j in range(K)
                    if results[r * K + j].aligned]
            # drop duplicate positions produced by overlapping windows
            seen, uniq = set(), []
            for a in alns:
                if (a.pos, a.strand) not in seen:
                    seen.add((a.pos, a.strand))
                    uniq.append(a)
            grouped.append(uniq)
        return grouped

    def to_sam_records_all(self, names, seqs, lens, quals,
                           all_results: list[list[MapResult]]):
        """Primary record per read + FLAG 0x100 secondary records."""
        from ..io.sam import FLAG_SECONDARY

        recs = []
        for i, alns in enumerate(all_results):
            primary = self.to_sam_records(
                [names[i]], seqs[i : i + 1], lens[i : i + 1],
                quals[i : i + 1],
                [alns[0] if alns else MapResult(aligned=False)],
            )
            recs.extend(primary)
            for a in alns[1:]:
                (sec,) = self.to_sam_records(
                    [names[i]], seqs[i : i + 1], lens[i : i + 1],
                    quals[i : i + 1], [a],
                )
                sec.flag |= FLAG_SECONDARY
                recs.append(sec)
        return recs


@functools.partial(jax.jit, static_argnames=("params", "use_pallas", "k"))
def map_all_batch(
    fm: FMIndex,
    ssa: SSA,
    genome,
    reads,
    lens,
    quals,
    *,
    params: MapperParams,
    use_pallas: bool = False,
    k: int = 8,
):
    """All-mappings forward step (ref: nvBowtie --all, all_inl.h).

    Returns the top-k distinct candidate alignments per read (score-
    descending), each with score/strand/win_start/t_end/p_end and a
    validity mask (score >= score-min).  "All" is bounded by the
    candidate capacity 2*max_candidates, the fixed-shape analog of the
    reference's effort limits (SURVEY.md §7.3(3)).
    """
    C = params.max_candidates
    k = min(k, 2 * C)
    cands = candidate_stage(
        fm, ssa, genome, reads, lens, quals,
        params=params, use_pallas=use_pallas,
    )
    sc = cands["score"]
    order = jnp.argsort(-sc, axis=1)[:, :k]  # (R, k) score-descending
    take = lambda a: jnp.take_along_axis(a, order, axis=1)
    scores = take(sc)
    smin = _score_min(lens, params)
    return {
        "score": scores,
        "valid": (scores >= smin[:, None]) & (lens[:, None] > 0),
        "strand": (order // C).astype(jnp.int32),
        "win_start": take(cands["win_start"]),
        "t_end": take(cands["t_end"]),
        "p_end": take(cands["p_end"]),
    }
