"""Pallas TPU kernel: row-blocked banded Gotoh DP for LONG patterns.

The short-read kernel (ops/banded_dp.py) stages the whole pattern and
text column in VMEM, which caps the pattern at ~512 rows.  This
variant serves the reference's long-alignment capability (ref:
nvbio/alignment/batched.h warp-per-alignment scheduler + the
checkpointed traceback of SURVEY.md §3.5/§5.8(a-c)) with a TPU-native
schedule:

- **grid = (batch_tiles, row_blocks)**: TPU grids iterate the last
  axis fastest, so for each lane tile the row blocks run sequentially
  on one core while the (H, F, sink) band state persists in VMEM
  scratch — the classic sequential-grid carry pattern;
- each row block streams its (RB, tile) pattern slice and its
  overlapping text window block from HBM; the DP body is the proven
  sentinel-staged recurrence of ``_make_kernel32`` (same flags, same
  tie-breaks, exact-equality tested against the XLA twin / oracle);
- direction flags are emitted per block straight to HBM, so the full
  (Lp x BAND_PAD) matrix never sits in VMEM: 10 kb patterns emit
  ~1.3 MB/lane-row-block instead of needing a 40 MB resident tile;
- invalid-region sentinels decay by SENT_S per row; long patterns
  would wrap int32, so dead cells are re-clamped at DEAD every row
  (one extra VPU max per row; see the exactness note in banded_dp).

Traceback stays bounded-memory at the batch level: the run-jump walk
(models/mapper.py _runjump_walk) touches O(#CIGAR runs) gather rounds
and the dirs matrix lives in HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..alignment.types import AlignmentType, GotohScheme, NEG_INF, \
    gap_penalties
from .banded_dp import (PAD_SYMBOL, SENT_S, SCORE_FLOOR, _band_pad,
                        _hot_precompute, _shift_down, _shift_up_by)

DEAD = -(1 << 28)  # dead-cell clamp: far below SCORE_FLOOR, far above
# int32 wrap even after +/- SENT_S per-row excursions


def _make_long_kernel(RB: int, NRB: int, scheme: GotohScheme,
                      atype: AlignmentType, band_w: int, BAND: int,
                      BAND_PAD: int, TB: int, CH: int,
                      with_dirs: bool):
    eo, ee, fo, fe = gap_penalties(scheme)
    is_local = atype == AlignmentType.LOCAL
    cd = jnp.int32
    TEXT_B = RB + BAND_PAD + CH

    def kernel(pm_ref, mis_ref, text_ref, plen_ref, tlen_ref, out_ref,
               *rest):
        if with_dirs:
            dirs_ref = rest[0]
            scr = rest[1:]
        else:
            dirs_ref = None
            scr = rest
        H_s, F_s, snapH_s, snapR_s = scr
        rb = pl.program_id(1)
        NEG = jnp.asarray(NEG_INF, cd)
        DEADc = jnp.asarray(DEAD, cd)
        krange = jax.lax.broadcasted_iota(jnp.int32, (BAND_PAD, TB), 0)
        in_band = krange < BAND
        kk = krange * ee
        ksub = kk - (eo + ee)
        j0 = krange - band_w
        tlen = jnp.broadcast_to(tlen_ref[0:1, :], (BAND_PAD, TB))
        plen_row = plen_ref[0:1, :]
        MATCH = jnp.asarray(scheme.match, cd)
        NPEN = jnp.asarray(-scheme.n_penalty, cd)
        SENT = jnp.asarray(-SENT_S, cd)

        @pl.when(rb == 0)
        def _init():
            if atype == AlignmentType.GLOBAL:
                h0 = jnp.where(j0 == 0, 0,
                               jnp.where(j0 > 0, -(eo + ee * j0), NEG))
            else:
                h0 = jnp.where(j0 >= 0, 0, NEG)
            H_s[...] = jnp.where((j0 <= tlen) & in_band, h0, NEG
                                 ).astype(cd)
            F_s[...] = jnp.full((BAND_PAD, TB), NEG, cd)
            snapH_s[...] = (jnp.zeros((BAND_PAD, TB), cd) if is_local
                            else jnp.full((BAND_PAD, TB), NEG, cd))
            snapR_s[...] = jnp.zeros((BAND_PAD, TB), cd)

        def body(carry, i_local, pm, mis, tsl):
            H, F, snapH, snapR = carry
            pmb = jnp.broadcast_to(pm, tsl.shape)
            misb = jnp.broadcast_to(mis, tsl.shape)
            s = jnp.where(
                tsl == PAD_SYMBOL, SENT,
                jnp.where(tsl >= 4, NPEN,
                          jnp.where(tsl == pmb, MATCH, -misb)),
            )
            up_H = _shift_down(H, NEG)
            up_F = _shift_down(F, NEG)
            f_open = up_H - (fo + fe)
            F_new = jnp.maximum(f_open, up_F - fe)
            Hdiag = H + s
            Hhat = jnp.maximum(Hdiag, F_new)
            if is_local:
                Hhat = jnp.maximum(Hhat, 0)
            Ew0 = _shift_up_by(Hhat, 1, NEG) + ksub
            Ew = Ew0
            d = 1
            while d < BAND_PAD:
                Ew = jnp.maximum(Ew, _shift_up_by(Ew, d, NEG))
                d *= 2
            E_new = Ew - kk
            H_new = jnp.maximum(Hhat, E_new)
            if is_local:
                H_new = jnp.maximum(H_new, 0)
            H_new = jnp.where(in_band, H_new, NEG)
            # long-pattern guard: keep dead cells from int32-wrapping
            H_new = jnp.maximum(H_new, DEADc)
            F_new = jnp.maximum(F_new, DEADc)

            if dirs_ref is not None:
                flag = jnp.where(
                    H_new == Hdiag, 0,
                    jnp.where(H_new == E_new, 1, 2))
                if is_local:
                    flag = jnp.where(H_new <= 0, 3, flag)
                dirs_row = (flag
                            | ((Ew == Ew0).astype(jnp.int32) << 2)
                            | ((F_new == f_open).astype(jnp.int32) << 3))
                base = pl.multiple_of(i_local * BAND_PAD, BAND_PAD)
                dirs_ref[pl.ds(base, BAND_PAD), :] = dirs_row.astype(
                    jnp.uint8)

            row = rb * RB + i_local + 1
            if is_local:
                upd = (H_new > snapH) & (row <= plen_row)
                snapH = jnp.where(upd, H_new, snapH)
                snapR = jnp.where(upd, jnp.broadcast_to(row, snapR.shape),
                                  snapR)
            else:
                hit = row == plen_row
                snapH = jnp.where(hit, H_new, snapH)
            return H_new, F_new, snapH, snapR

        def chunk(c, carry):
            base = pl.multiple_of(c * CH, CH)
            tchunk = text_ref[pl.ds(base, BAND_PAD + CH), :]
            pchunk = pm_ref[pl.ds(base, CH), :]
            mchunk = mis_ref[pl.ds(base, CH), :]
            for r in range(CH):
                carry = body(
                    carry,
                    c * CH + r,
                    pchunk[r:r + 1, :],
                    mchunk[r:r + 1, :],
                    tchunk[r:r + BAND_PAD, :],
                )
            return carry

        carry0 = (H_s[...], F_s[...], snapH_s[...], snapR_s[...])
        H, F, snapH, snapR = jax.lax.fori_loop(0, RB // CH, chunk, carry0)
        H_s[...] = H
        F_s[...] = F
        snapH_s[...] = snapH
        snapR_s[...] = snapR

        # sink reduction every block (cheap); the final block's write
        # is the one that lands in the output
        kr32 = krange
        plen32 = plen_ref[0:1, :]
        tlen32 = tlen_ref[0:1, :]
        if atype == AlignmentType.GLOBAL:
            k_goal = tlen32 - plen32 + band_w
            best = jnp.max(
                jnp.where(kr32 == k_goal, snapH, NEG_INF),
                axis=0, keepdims=True)
            best_i = plen32
            best_k = k_goal
        elif atype == AlignmentType.SEMI_GLOBAL:
            k_max = tlen32 - plen32 + band_w
            best = jnp.max(
                jnp.where(kr32 <= k_max, snapH, NEG_INF),
                axis=0, keepdims=True)
            best_k = jnp.min(
                jnp.where(snapH == best, kr32, BAND_PAD),
                axis=0, keepdims=True)
            best_i = plen32
        else:
            best = jnp.max(snapH, axis=0, keepdims=True)
            key = snapR * jnp.int32(BAND_PAD) + kr32
            best_key = jnp.min(
                jnp.where(snapH == best, key, jnp.int32(1 << 30)),
                axis=0, keepdims=True)
            best_i = best_key // BAND_PAD
            best_k = best_key % BAND_PAD
        no_path = best < SCORE_FLOOR
        best = jnp.where(no_path, jnp.int32(NEG_INF), best)
        zero_len = plen32 <= 0
        best = jnp.where(zero_len,
                         jnp.int32(0) if is_local else jnp.int32(NEG_INF),
                         best)
        best_i = jnp.where(zero_len, 0, best_i)
        best_k = jnp.where(zero_len, band_w, best_k)
        t_end = jnp.maximum(best_i + best_k - band_w, 0)
        out_ref[0:1, :] = best
        out_ref[1:2, :] = best_i
        out_ref[2:3, :] = t_end
        out_ref[3:8, :] = jnp.zeros((5, TB), jnp.int32)

    return kernel


def _long_call(patterns, plens, texts, tlens, quals, *, scheme, atype,
               band_w, with_dirs, interpret, tile, row_block):
    NB, Lp = patterns.shape
    Lt = texts.shape[1]
    BAND = 2 * band_w + 1
    BAND_PAD = _band_pad(BAND)
    if with_dirs:
        # u8 stores need 32-aligned sublane offsets
        BAND_PAD = (max(32, BAND_PAD) + 31) // 32 * 32
    CH = 8
    RB = max(row_block // CH * CH, CH)
    Lp8 = (Lp + RB - 1) // RB * RB  # pattern padded to whole blocks
    NRB = Lp8 // RB
    # VMEM working set per block (int32 rows x tile):
    rows = (7 * BAND_PAD + 3 * RB + BAND_PAD + CH
            + (RB * BAND_PAD // 4 if with_dirs else 0))
    while tile > 128 and rows * tile * 4 > 8 * 1024 * 1024:
        tile //= 2
    if rows * tile * 4 > 8 * 1024 * 1024:
        raise ValueError(
            f"long-DP working set {rows * tile * 4 / 2**20:.1f} MiB > "
            f"8 MiB at tile={tile} (band_pad={BAND_PAD}, RB={RB}); "
            "shrink --band or row_block")
    nb_pad = (NB + tile - 1) // tile * tile
    if quals is None:
        quals = jnp.full((NB, Lp), 40, jnp.int32)

    def prep(x, fill, cols=None):
        x = x.astype(jnp.int32)
        pad_cols = (0, 0) if cols is None else (0, cols - x.shape[1])
        return jnp.pad(x, ((0, nb_pad - NB), pad_cols),
                       constant_values=fill)

    pats_t = prep(patterns, PAD_SYMBOL, Lp8).T
    quals_t = prep(quals, 0, Lp8).T
    LT_PAD = Lp8 + BAND_PAD + CH
    texts_p = jnp.pad(
        prep(texts, PAD_SYMBOL),
        ((0, 0), (band_w, max(0, LT_PAD - band_w - Lt))),
        constant_values=PAD_SYMBOL,
    )[:, :LT_PAD]
    texts_t = texts_p.T
    plens_t = prep(plens[:, None], 0).T
    tlens_t = prep(tlens[:, None], 0).T
    m = jnp.arange(LT_PAD, dtype=jnp.int32)[:, None] - band_w
    texts_t = jnp.where(m >= tlens_t, PAD_SYMBOL, texts_t)

    pm_t, mis_t = _hot_precompute(pats_t, quals_t, scheme, Lp8, BAND,
                                  long_ok=True)

    # stage overlapping text blocks: block rb needs rows
    # [rb*RB, rb*RB + RB + BAND_PAD + CH)
    TEXT_B = RB + BAND_PAD + CH
    tb = jnp.concatenate(
        [jax.lax.dynamic_slice_in_dim(texts_t, rb * RB, TEXT_B, axis=0)
         for rb in range(NRB)], axis=0)  # (NRB*TEXT_B, nb_pad)

    kernel = _make_long_kernel(RB, NRB, scheme, atype, band_w, BAND,
                               BAND_PAD, tile, CH, with_dirs)
    grid = (nb_pad // tile, NRB)
    rspec = lambda rows_: pl.BlockSpec(
        (rows_, tile), lambda t, rb: (rb, t), memory_space=pltpu.VMEM)
    cspec = lambda rows_: pl.BlockSpec(
        (rows_, tile), lambda t, rb: (0, t), memory_space=pltpu.VMEM)
    in_specs = [rspec(RB), rspec(RB), rspec(TEXT_B), cspec(1), cspec(1)]
    scratch = [pltpu.VMEM((BAND_PAD, tile), jnp.int32)] * 4
    if with_dirs:
        out_shape = (
            jax.ShapeDtypeStruct((8, nb_pad), jnp.int32),
            jax.ShapeDtypeStruct((Lp8 * BAND_PAD, nb_pad), jnp.uint8),
        )
        out_specs = (cspec(8), rspec(RB * BAND_PAD))
    else:
        out_shape = jax.ShapeDtypeStruct((8, nb_pad), jnp.int32)
        out_specs = cspec(8)
    out = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
    )(pm_t, mis_t, tb, plens_t, tlens_t)
    if with_dirs:
        out, dirs = out
    res = {
        "score": out[0][:NB],
        "p_end": out[1][:NB],
        "t_end": out[2][:NB],
    }
    if with_dirs:
        # match the short kernel's contract: (NB, ceil8(Lp) * BAND_PAD)
        # so walkers derive STRIDE from shape alone (rows beyond the
        # pattern are never walk-reachable)
        Lp8c = (Lp + 7) // 8 * 8
        return res, dirs.T[:NB, :Lp8c * BAND_PAD], BAND_PAD
    return res


@functools.partial(
    jax.jit,
    static_argnames=("scheme", "atype", "band_w", "interpret", "tile",
                     "row_block"),
)
def banded_score_long_pallas(
    patterns, plens, texts, tlens, quals=None, *,
    scheme: GotohScheme, atype: AlignmentType, band_w: int,
    interpret: bool = False, tile: int = 256, row_block: int = 256,
):
    """Score-only banded DP for patterns beyond the short-read
    kernel's VMEM reach (row-blocked grid; see module docstring).
    Bit-identical to alignment.banded_score_batch.

    Bands beyond this kernel's VMEM reach (~2*767+1 at row_block=256)
    dispatch to the anti-diagonal wavefront kernel
    (ops/wavefront_dp.py) transparently — one alignment per grid
    program, same bit-exact contract."""
    if not _band_fits(band_w, row_block, with_dirs=False):
        from .wavefront_dp import wavefront_score_pallas

        return wavefront_score_pallas(
            patterns, plens, texts, tlens, quals, scheme=scheme,
            atype=atype, band_w=band_w, interpret=interpret)
    _check_long(patterns.shape[1], band_w, scheme)
    return _long_call(patterns, plens, texts, tlens, quals,
                      scheme=scheme, atype=atype, band_w=band_w,
                      with_dirs=False, interpret=interpret, tile=tile,
                      row_block=row_block)


@functools.partial(
    jax.jit,
    static_argnames=("scheme", "atype", "band_w", "interpret", "tile",
                     "row_block"),
)
def banded_directions_long_pallas(
    patterns, plens, texts, tlens, quals=None, *,
    scheme: GotohScheme, atype: AlignmentType, band_w: int,
    interpret: bool = False, tile: int = 256, row_block: int = 256,
):
    """Directions variant: per-cell traceback flags streamed to HBM
    block-by-block.  Returns (res, dirs (NB, Lp8*BAND_PAD), BAND_PAD)
    — the walk contract of banded_directions_pallas.

    Wide bands shrink the row block (fewer pattern rows per grid
    step, so the per-block uint8 dirs tile stays in VMEM) before
    giving up: CIGAR reach extends from band_w ~104 (row_block=256)
    to ~815 (row_block=8).  Beyond that only the score-only
    wavefront path exists — emitted flags would exceed VMEM at any
    block shape."""
    while row_block > 8 and not _band_fits(band_w, row_block, True):
        row_block //= 2
    _check_long(patterns.shape[1], band_w, scheme)
    return _long_call(patterns, plens, texts, tlens, quals,
                      scheme=scheme, atype=atype, band_w=band_w,
                      with_dirs=True, interpret=interpret, tile=tile,
                      row_block=row_block)


def _band_fits(band_w: int, row_block: int, with_dirs: bool) -> bool:
    """Static feasibility of the row-blocked kernel's VMEM model at
    its minimum lane tile (mirrors _long_call's budget exactly)."""
    BAND_PAD = _band_pad(2 * band_w + 1)
    if with_dirs:
        BAND_PAD = (max(32, BAND_PAD) + 31) // 32 * 32
    CH = 8
    RB = max(row_block // CH * CH, CH)
    rows = (7 * BAND_PAD + 3 * RB + BAND_PAD + CH
            + (RB * BAND_PAD // 4 if with_dirs else 0))
    return rows * 128 * 4 <= 8 * 1024 * 1024


def _check_long(Lp: int, band_w: int, scheme) -> None:
    eo, ee, fo, fe = gap_penalties(scheme)
    worst = max(eo, fo) + (Lp + 2 * band_w + 1) * max(
        ee, fe, scheme.mismatch_max, scheme.n_penalty,
        abs(scheme.match))
    assert worst < -SCORE_FLOOR, (
        f"scores may cross the sentinel floor (worst={worst}); the "
        "long kernel supports patterns to ~80 kb at default penalties")
