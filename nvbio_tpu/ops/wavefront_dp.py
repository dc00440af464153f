"""Pallas TPU kernel: anti-diagonal wavefront banded Gotoh DP for WIDE
bands (score-only).

The short-read kernel (ops/banded_dp.py) and the row-blocked long
kernel (ops/long_dp.py) both lay the band across sublanes with the
batch across lanes; their VMEM working set scales with BAND_PAD x 128
lanes, capping the practical band at ~2*767+1.  This kernel serves the
reference's warp-per-alignment wavefront capability (ref:
nvbio/alignment/batched.h warp scheduler, SURVEY.md §3.5/§5.8(b)) for
bands beyond that reach — ONT-class long reads at high error rates
(band_w 1k-16k) — with a TPU-native schedule:

- **one alignment per grid program**; its anti-diagonal spans the
  whole (NR, 128) vector window, so a single long alignment fills the
  VPU instead of needing 128 same-length mates;
- diagonals are parameterized by the pattern row ``r`` (cell (r, j)
  with r + j = d lives at window lane r), which kills the diagonal
  parity problem and makes the in-diagonal width exactly band+1 cells;
- the within-row horizontal-gap (E) recurrence becomes a *same-lane*
  dependence between consecutive diagonals — the Kogge-Stone band scan
  of the row-wise kernels disappears entirely;
- text symbols are fed systolically: one scalar per diagonal is read
  from an SMEM stream, injected at the window's base lane, and rides
  the once-per-diagonal lane shift until the band edge consumes it
  (injection diag and travel distance agree by construction:
  a value injected at diag d' sits at absolute lane
  r_base(d') + (d - d') = r exactly when t[d' - r_base(d') - 1]
  = t[d - r - 1], the symbol cell (r, d - r) compares against);
- the window slides up the pattern by DC/2 lanes per DC-diagonal
  chunk; sink accumulators dropped off the window's low edge fold
  into SMEM scalar carries, preserving the twin's tie-break order.

Semantics are **bit-identical to alignment.banded_score_batch** (the
XLA twin, oracle-tested) for every cell, including the twin's masked /
unreachable-cell garbage: H/F/Hhat carries are masked to NEG_INF
outside (in-band AND 0 <= j <= tlen) exactly like the twin's row
masks, while the E chain — which the twin lets flow *unmasked* along
each row — is only pinned at the band's low edge (to EMASK, chosen so
the k=0 recurrence reproduces the twin's shift-fill value exactly).
No sentinel staging and no score floor: outputs are raw twin values.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..alignment.types import (AlignmentType, GotohScheme, NEG_INF,
                               gap_penalties)

PAD_SYMBOL = 7
I32_MAX = (1 << 31) - 1


def _flat_shift1(x, fill):
    """out.flat[m] = x.flat[m-1] over a row-major (NR, 128) window;
    out.flat[0] = fill.  One lane roll + one sublane shift + one
    boundary select."""
    r = pltpu.roll(x, 1, axis=1)  # r[:, 0] = x[:, 127] (wrap)
    rd = jnp.concatenate(
        [jnp.full((1, x.shape[1]), fill, x.dtype), r[:-1, :]], axis=0)
    lane0 = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) == 0
    return jnp.where(lane0, rd, r)


def _row_shift_down(x, rows, fill):
    """out[q] = x[q + rows] along sublanes (window rebase: drop the
    low-r rows, fill the new high-r rows)."""
    return jnp.concatenate(
        [x[rows:, :], jnp.full((rows, x.shape[1]), fill, x.dtype)],
        axis=0)


def _make_wavefront_kernel(scheme, atype, band_w, DC, S, SROWS, C0, NR,
                           NC, KMUL, LPC, interpret=False,
                           with_dirs=False, NR8=0):
    eo, ee, fo, fe = gap_penalties(scheme)
    is_local = atype == AlignmentType.LOCAL
    is_global = atype == AlignmentType.GLOBAL
    BAND = 2 * band_w + 1
    EMASK = NEG_INF - (eo + ee)  # <= NEG_INF - eo: k=0 E recurrence
    # reproduces the twin's shift-fill base exactly (module docstring)

    def kernel(pm_ref, mis_ref, ts_ref, plen_ref, tlen_ref, out_ref,
               *refs):
        if with_dirs:
            dirs_ref = refs[0]
            (tw_s, H1_s, H2_s, F1_s, E1_s, Hh1_s, bH_s, bK_s,
             g_s) = refs[1:]
        else:
            dirs_ref = None
            (tw_s, H1_s, H2_s, F1_s, E1_s, Hh1_s, bH_s, bK_s,
             g_s) = refs
        NEGc = jnp.int32(NEG_INF)
        EMASKc = jnp.int32(EMASK)
        PADc = jnp.int32(PAD_SYMBOL)
        c = pl.program_id(1)
        plen = plen_ref[0, 0, 0]
        tlen = tlen_ref[0, 0, 0]
        shape = (NR, 128)
        init_best = jnp.int32(0) if is_local else NEGc
        init_key = (jnp.int32(band_w) if is_local
                    else plen * jnp.int32(KMUL))

        @pl.when(c == 0)
        def _init():
            tw_s[...] = jnp.full(shape, PADc, jnp.int32)
            H1_s[...] = jnp.full(shape, NEGc, jnp.int32)
            H2_s[...] = jnp.full(shape, NEGc, jnp.int32)
            F1_s[...] = jnp.full(shape, NEGc, jnp.int32)
            E1_s[...] = jnp.full(shape, EMASKc, jnp.int32)
            Hh1_s[...] = jnp.full(shape, NEGc, jnp.int32)
            bH_s[...] = jnp.full(shape, init_best, jnp.int32)
            bK_s[...] = jnp.full(shape, init_key, jnp.int32)
            g_s[0] = init_best
            g_s[1] = init_key

        @pl.when(c > C0)
        def _rebase():
            # window slides up by S lanes: fold the dropped low rows'
            # sink accumulators into the scalar carry first (ties: max
            # score, then min key — the twin's order)
            dH = bH_s[0:SROWS, :]
            dK = bK_s[0:SROWS, :]
            dmax = jnp.max(dH)
            dkey = jnp.min(jnp.where(dH == dmax, dK, I32_MAX))
            g0, g1 = g_s[0], g_s[1]
            better = dmax > g0
            same = dmax == g0
            g_s[0] = jnp.where(better, dmax, g0)
            g_s[1] = jnp.where(better, dkey,
                               jnp.where(same, jnp.minimum(dkey, g1), g1))
            tw_s[...] = _row_shift_down(tw_s[...], SROWS, PADc)
            H1_s[...] = _row_shift_down(H1_s[...], SROWS, NEGc)
            H2_s[...] = _row_shift_down(H2_s[...], SROWS, NEGc)
            F1_s[...] = _row_shift_down(F1_s[...], SROWS, NEGc)
            E1_s[...] = _row_shift_down(E1_s[...], SROWS, EMASKc)
            Hh1_s[...] = _row_shift_down(Hh1_s[...], SROWS, NEGc)
            bH_s[...] = _row_shift_down(bH_s[...], SROWS, init_best)
            bK_s[...] = _row_shift_down(bK_s[...], SROWS, init_key)

        r_base = jnp.maximum(c - C0, 0) * jnp.int32(S)
        riota = (jax.lax.broadcasted_iota(jnp.int32, shape, 0) * 128
                 + jax.lax.broadcasted_iota(jnp.int32, shape, 1))
        r_vec = riota + r_base  # absolute twin row index per lane
        xA = -2 * r_vec         # x = d - 2r = k - band_w
        jA = -r_vec             # j = d - r
        # key = kA + d = r*KMUL + k; clamp r for lanes beyond the
        # pattern (never selected by rgate) so kA stays in int32
        kA = ((KMUL - 2) * jnp.minimum(r_vec, jnp.int32(LPC))
              + jnp.int32(band_w))
        lane00 = riota == 0
        pm = pm_ref[...]
        mis = mis_ref[...]
        d0 = c * jnp.int32(DC)
        if is_local:
            rgate = (r_vec >= 1) & (r_vec <= plen)
        else:
            rgate = (r_vec == plen) & (plen >= 1)
        if is_global:
            k_read = jnp.clip(tlen - plen + jnp.int32(band_w), 0,
                              jnp.int32(BAND - 1))
            x_goal = k_read - jnp.int32(band_w)
        MATCH = jnp.int32(scheme.match)
        NPEN = jnp.int32(-getattr(scheme, "n_penalty", 1))

        def body(i, carry):
            tw, H1, H2, F1, E1, Hh1, bH, bK = carry
            fl = jnp.zeros(shape, jnp.int32) if with_dirs else None

            def diag(rr, carry2, fl):
                tw, H1, H2, F1, E1, Hh1, bH, bK = carry2
                m = i * 8 + rr
                d = d0 + m
                tval = ts_ref[0, 0, m]
                tw = jnp.where(lane00, tval, _flat_shift1(tw, PADc))
                # substitution (twin _subst_scores; pm>=4 staged as 9)
                s = jnp.where(
                    (pm >= 4) | (tw >= 4), NPEN,
                    jnp.where(tw == pm, MATCH, -mis))
                H1s = _flat_shift1(H1, NEGc)   # (r-1) of diag d-1
                F1s = _flat_shift1(F1, NEGc)
                H2s = _flat_shift1(H2, NEGc)   # (r-1) of diag d-2
                f_open = H1s - jnp.int32(fo + fe)
                F_new = jnp.maximum(f_open, F1s - jnp.int32(fe))
                Hdiag = H2s + s
                Hhat = jnp.maximum(Hdiag, F_new)
                if is_local:
                    Hhat = jnp.maximum(Hhat, 0)
                e_open = Hh1 - jnp.int32(eo + ee)
                E_new = jnp.maximum(E1 - jnp.int32(ee), e_open)
                H_new = jnp.maximum(Hhat, E_new)
                if is_local:
                    H_new = jnp.maximum(H_new, 0)
                x = xA + d
                jv = jA + d
                ib = (x >= -band_w) & (x <= band_w)
                vib = ib & (jv >= 0) & (jv <= tlen)
                r0 = r_vec == 0
                if with_dirs:
                    # the twin's flag encoding (long_dp body / walk.py:
                    # bits 0-1 H-source 0 diag / 1 E / 2 F / 3 origin,
                    # bit 2 e_done, bit 3 f_done), packed 8 diagonals
                    # per int32 plane (this diag at nibble rr)
                    flag = jnp.where(H_new == Hdiag, 0,
                                     jnp.where(H_new == E_new, 1, 2))
                    if is_local:
                        flag = jnp.where(H_new <= 0, 3, flag)
                    flag4 = (flag
                             | ((E_new == e_open).astype(jnp.int32) << 2)
                             | ((F_new == f_open).astype(jnp.int32) << 3))
                    flag4 = jnp.where(r0 | ~vib, 3, flag4)
                    fl = fl | (flag4 << (4 * rr))
                H_d = jnp.where(vib, H_new, NEGc)
                F_d = jnp.where(vib, F_new, NEGc)
                Hh_d = jnp.where(vib, Hhat, NEGc)
                E_d = jnp.where(ib, E_new, EMASKc)
                # init-row injection (twin H0 scheme at r == 0)
                if atype == AlignmentType.GLOBAL:
                    h0 = jnp.where(d == 0, 0, -jnp.int32(eo) -
                                   jnp.int32(ee) * d)
                else:
                    h0 = jnp.int32(0)
                # row-0 cells exist only inside the band (j <= band_w)
                h0 = jnp.where((d <= tlen) & (d <= band_w), h0, NEGc)
                H_d = jnp.where(r0, h0, H_d)
                F_d = jnp.where(r0, NEGc, F_d)
                Hh_d = jnp.where(r0, NEGc, Hh_d)
                # sinks
                if is_global:
                    upd = rgate & (x == x_goal)
                    bH = jnp.where(upd, H_d, bH)
                else:
                    upd = rgate & (H_d > bH)
                    if is_local:
                        upd = upd & vib
                    bH = jnp.where(upd, H_d, bH)
                    bK = jnp.where(upd, kA + d, bK)
                return (tw, H_d, H1, F_d, E_d, Hh_d, bH, bK), fl

            for rr in range(8):
                carry, fl = diag(rr, carry, fl)
            if with_dirs:
                if NR8 > NR:
                    fl = jnp.concatenate(
                        [fl, jnp.zeros((NR8 - NR, 128), jnp.int32)],
                        axis=0)
                base = pl.multiple_of(i * NR8, NR8)
                dirs_ref[pl.ds(base, NR8), :] = fl
            return carry

        carry0 = (tw_s[...], H1_s[...], H2_s[...], F1_s[...], E1_s[...],
                  Hh1_s[...], bH_s[...], bK_s[...])
        tw, H1, H2, F1, E1, Hh1, bH, bK = jax.lax.fori_loop(
            0, DC // 8, body, carry0)
        tw_s[...] = tw
        H1_s[...] = H1
        H2_s[...] = H2
        F1_s[...] = F1
        E1_s[...] = E1
        Hh1_s[...] = Hh1
        bH_s[...] = bH
        bK_s[...] = bK

        @pl.when(c == NC - 1)
        def _finish():
            vmax = jnp.max(bH)
            vkey = jnp.min(jnp.where(bH == vmax, bK, I32_MAX))
            g0, g1 = g_s[0], g_s[1]
            score = jnp.maximum(vmax, g0)
            key = jnp.minimum(
                jnp.where(vmax == score, vkey, I32_MAX),
                jnp.where(g0 == score, g1, I32_MAX))
            if is_global:
                p_end = plen
                t_end = jnp.where(plen == 0, 0, tlen)
            else:
                p_end = key // jnp.int32(KMUL)
                kk = key - p_end * jnp.int32(KMUL)
                t_end = jnp.maximum(p_end + kk - jnp.int32(band_w), 0)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            out_ref[0, 0:1, :] = jnp.where(
                lane == 0, score,
                jnp.where(lane == 1, p_end,
                          jnp.where(lane == 2, t_end, 0)))

    return kernel


def _plan(Lp, Lt, band_w, dc):
    """Static chunk geometry: DC diagonals per chunk, window of NR
    128-lane rows sliding S = DC/2 lanes per chunk from chunk C0+1."""
    if dc is None:
        dc = min(1024, max(256, (band_w // 2) // 256 * 256))
    assert dc % 256 == 0, "dc must be a multiple of 256"
    S = dc // 2
    SROWS = S // 128
    C0 = -(-band_w // dc)  # ceil
    WV_req = C0 * S + S + band_w // 2 + 2
    # whole 8-sublane tiles: Mosaic requires non-full blocks 8-divisible
    # (extra high-r window rows just compute more valid cells — the
    # row-indexed math and sink gates are unchanged)
    NR = (-(-WV_req // 128) + 7) // 8 * 8
    ND = Lp + Lt + 2
    NC = -(-ND // dc)
    KMUL = 1 << max(2 * band_w + 2, 2).bit_length()
    assert (Lp + 2) * KMUL < (1 << 31), (
        f"pattern too long for the sink key encoding at band_w="
        f"{band_w} (Lp={Lp}, KMUL={KMUL})")
    return dc, S, SROWS, C0, NR, NC, KMUL


@functools.partial(
    jax.jit,
    static_argnames=("scheme", "atype", "band_w", "interpret", "dc"),
)
def wavefront_dirs_pallas(
    patterns, plens, texts, tlens, quals=None, *,
    scheme: GotohScheme, atype: AlignmentType, band_w: int,
    interpret: bool = False, dc: int | None = None,
):
    """Wide-band score + per-cell traceback flags streamed to HBM.

    Flags use the twin's encoding (bits 0-1 H-source diag/E/F/origin,
    bit 2 e_done, bit 3 f_done) packed 8 diagonals per int32 plane in
    (NB, NC, DC//8, NR8, 128) layout — diagonal d of alignment b lives
    at [b, d//DC, (d%DC)//8, :, :] nibble 4*(d%8), window lane
    r - 128*SROWS*max(d//DC - C0, 0).  The host walk
    (alignment.wavefront_walk.walk_wavefront_dirs) decodes it into
    CIGAR runs — the unbounded-band traceback the certificate ladder
    cannot reach (ref: checkpointed traceback, SURVEY §3.5/§5.8(c)).

    Returns (res dict, dirs (NB, NC, DC//8, NR8, 128) int32, plan
    tuple (DC, SROWS, C0, NR, NC, NR8)).
    """
    return _wavefront_call(patterns, plens, texts, tlens, quals,
                           scheme=scheme, atype=atype, band_w=band_w,
                           interpret=interpret, dc=dc, with_dirs=True)


@functools.partial(
    jax.jit,
    static_argnames=("scheme", "atype", "band_w", "interpret", "dc"),
)
def wavefront_score_pallas(
    patterns,  # (NB, Lp) symbols (0..3, >=4 N); pad arbitrary
    plens,  # (NB,) int32
    texts,  # (NB, Lt)
    tlens,  # (NB,) int32
    quals=None,  # (NB, Lp) or None
    *,
    scheme: GotohScheme,
    atype: AlignmentType,
    band_w: int,
    interpret: bool = False,
    dc: int | None = None,
):
    """Wide-band score-only banded Gotoh: one alignment per grid
    program, anti-diagonal across the vector window (module
    docstring).  Bit-identical to ``alignment.banded_score_batch`` —
    raw scores, no floor normalization.  Returns dict with ``score``,
    ``p_end``, ``t_end`` of shape (NB,)."""
    return _wavefront_call(patterns, plens, texts, tlens, quals,
                           scheme=scheme, atype=atype, band_w=band_w,
                           interpret=interpret, dc=dc, with_dirs=False)


def _wavefront_call(patterns, plens, texts, tlens, quals, *, scheme,
                    atype, band_w, interpret, dc, with_dirs):
    patterns = patterns.astype(jnp.int32)
    texts = texts.astype(jnp.int32)
    plens = plens.astype(jnp.int32)
    tlens = tlens.astype(jnp.int32)
    NB, Lp = patterns.shape
    Lt = texts.shape[1]
    assert Lp >= 1 and NB >= 1
    DC, S, SROWS, C0, NR, NC, KMUL = _plan(Lp, Lt, band_w, dc)
    maxpen = max(scheme.mismatch_max, getattr(scheme, "n_penalty", 1),
                 abs(scheme.match), *gap_penalties(scheme))
    assert (Lp + Lt + 2 * band_w + 4) * maxpen < (1 << 29), \
        "score range too wide for the int32 body"
    if quals is None:
        quals = jnp.full((NB, Lp), 40, jnp.int32)
    quals = quals.astype(jnp.int32)

    # lane-space pattern rows: lane r holds pattern symbol r-1 (lane 0
    # is the injected init row); quality-aware mismatch penalty staged
    # per lane (twin _subst_scores semantics; N/pad rows -> pm 9)
    RROWS = max(NC - 1 - C0, 0) * SROWS + NR
    RPAD = RROWS * 128
    pshift = jnp.pad(patterns, ((0, 0), (1, max(0, RPAD - Lp - 1))),
                     constant_values=PAD_SYMBOL)[:, :RPAD]
    qshift = jnp.pad(quals, ((0, 0), (1, max(0, RPAD - Lp - 1))),
                     constant_values=0)[:, :RPAD]
    pm_full = jnp.where(pshift >= 4, 9, pshift)
    mmq = scheme.mismatch_min + (
        (scheme.mismatch_max - scheme.mismatch_min)
        * jnp.minimum(qshift, 40)) // 40
    mis_full = jnp.where(pshift >= 4, scheme.n_penalty, mmq)
    # per-chunk (NR, 128) windows at row offset r_base(c)/128
    cidx = jnp.arange(NC, dtype=jnp.int32)
    rb_rows = jnp.maximum(cidx - C0, 0) * SROWS
    widx = rb_rows[:, None] + jnp.arange(NR, dtype=jnp.int32)[None, :]
    pm_w = pm_full.reshape(NB, RROWS, 128)[:, widx, :].reshape(
        NB * NC * NR, 128)
    mis_w = mis_full.reshape(NB, RROWS, 128)[:, widx, :].reshape(
        NB * NC * NR, 128)
    # systolic text stream: chunk c, step m injects t[c*DC+m - r_base - 1]
    tix = (cidx[:, None] * DC + jnp.arange(DC, dtype=jnp.int32)[None, :]
           - rb_rows[:, None] * 128 - 1)  # (NC, DC)
    tst = jnp.where(
        (tix >= 0) & (tix < Lt),
        texts[:, jnp.clip(tix, 0, Lt - 1)],
        PAD_SYMBOL).reshape(NB * NC, DC)

    NR8 = (NR + 7) // 8 * 8
    kernel = _make_wavefront_kernel(scheme, atype, band_w, DC, S, SROWS,
                                    C0, NR, NC, KMUL, Lp + 1, interpret,
                                    with_dirs=with_dirs, NR8=NR8)
    grid = (NB, NC)
    # Mosaic block legality: a block's last two dims must be divisible
    # by (8, 128) or equal the array's — hence the singleton middle
    # axes on out/text/lens (block dim == array dim == 1)
    out_shape = jax.ShapeDtypeStruct((NB, 1, 128), jnp.int32)
    out_specs = pl.BlockSpec((1, 1, 128), lambda b, c: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    if with_dirs:
        # flag planes: (NB, NC, DC//8, NR8, 128) int32 in HBM — the
        # traceback working set for ONE wide alignment is
        # NC * DC/8 * NR8 * 512 B (e.g. ~37 MB at Lp 10 kb, band 2000)
        dirs_bytes = NB * NC * (DC // 8) * NR8 * 128 * 4
        assert dirs_bytes <= (6 << 30), (
            f"wavefront dirs would need {dirs_bytes / 2**30:.1f} GiB "
            "HBM; walk fewer alignments per call")
        out_shape = (out_shape, jax.ShapeDtypeStruct(
            (NB * NC * (DC // 8) * NR8, 128), jnp.int32))
        out_specs = (out_specs, pl.BlockSpec(
            ((DC // 8) * NR8, 128), lambda b, c: (b * NC + c, 0),
            memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec((NR, 128), lambda b, c: (b * NC + c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NR, 128), lambda b, c: (b * NC + c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, DC), lambda b, c: (b * NC + c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((NR, 128), jnp.int32)] * 8
        + [pltpu.SMEM((2,), jnp.int32)],
        interpret=interpret,
    )(pm_w, mis_w, tst[:, None, :], plens[:, None, None],
      tlens[:, None, None])
    if with_dirs:
        out, dirs = out
        out = out[:, 0]
        res = {"score": out[:, 0], "p_end": out[:, 1],
               "t_end": out[:, 2]}
        return res, dirs.reshape(NB, NC, DC // 8, NR8, 128), (
            DC, SROWS, C0, NR, NC, NR8)
    out = out[:, 0]
    return {
        "score": out[:, 0],
        "p_end": out[:, 1],
        "t_end": out[:, 2],
    }
