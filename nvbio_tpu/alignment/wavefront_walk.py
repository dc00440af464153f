"""Host traceback walk over wavefront-kernel direction flags.

Completes the unbounded-band long-read traceback (ref: nvbio's
checkpointed traceback, SURVEY.md §3.5/§5.8(c); VERDICT r2 missing
#4): ops/wavefront_dp.wavefront_dirs_pallas streams 4-bit per-cell
flags (the twin's encoding) to HBM packed 8 diagonals per int32
plane; this walk decodes them into CIGAR runs on the host.  A single
alignment's walk is O(path length) scalar steps — microseconds per
kb in NumPy, vs one ~0.3 ms device gather PER STEP if walked on-chip
— and wide-band lanes are rare (only alignments whose score-gap
certificate exceeds the banded ladder reach this path).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def walk_wavefront_dirs(dirs, plan, band_w: int, p_end: int,
                        t_end: int):
    """Trace one alignment from (p_end, t_end) back to its start.

    ``dirs``: (NC, DC//8, NR8, 128) int32 flag planes for ONE
    alignment (wavefront_dirs_pallas layout); ``plan`` the kernel's
    (DC, SROWS, C0, NR, NC, NR8) geometry.

    Returns (run_ops uint8 codes {1 M, 2 D, 3 I} in END->START order,
    run_lens int32, p_start, t_start).
    """
    DC, SROWS, C0, NR, NC, NR8 = (int(x) for x in plan)
    dirs = np.asarray(dirs)

    def flag(r, j):
        d = r + j
        c = d // DC
        lane_flat = r - 128 * SROWS * max(c - C0, 0)
        if not (0 <= c < NC and 0 <= lane_flat < NR * 128):
            return 3  # outside the kernel's window: stop
        m = d - c * DC
        nib = int(dirs[c, m >> 3, lane_flat >> 7, lane_flat & 127])
        return (nib >> (4 * (m & 7))) & 0xF

    r, j = int(p_end), int(t_end)
    ops: list[list[int]] = []  # [code, len] runs, end->start

    def emit(code):
        if ops and ops[-1][0] == code:
            ops[-1][1] += 1
        else:
            ops.append([code, 1])

    state = 0  # 0 = H, 1 = E (text gap, D), 2 = F (pattern gap, I)
    guard = 2 * (r + j) + 8
    while r > 0 and guard > 0:
        guard -= 1
        f = flag(r, j)
        if state == 0:
            src = f & 3
            if src == 3:
                break
            if src == 0:
                emit(1)  # M
                r -= 1
                j -= 1
            elif src == 1:
                state = 1
            else:
                state = 2
        elif state == 1:
            emit(2)  # D consumes text column j
            done = (f >> 2) & 1
            j -= 1
            if done:
                state = 0
        else:
            emit(3)  # I consumes pattern row r
            done = (f >> 3) & 1
            r -= 1
            if done:
                state = 0
    run_ops = np.array([o for o, _l in ops], np.uint8)
    run_lens = np.array([l for _o, l in ops], np.int32)
    return run_ops, run_lens, r, j


def walk_wavefront_dirs_device(dirs, p_end, t_end, *, plan,
                               band_w: int):
    """Hashable-plan wrapper (the kernel returns plan as device
    scalars); see _walk_wavefront_dirs_device."""
    return _walk_wavefront_dirs_device(
        dirs, p_end, t_end, plan=tuple(int(x) for x in plan),
        band_w=int(band_w))


@functools.partial(jax.jit, static_argnames=("plan", "band_w"))
def _walk_wavefront_dirs_device(dirs, p_end, t_end, *, plan,
                                band_w: int):
    """Batched ON-DEVICE traceback over wavefront direction flags.

    The host walk above needs the whole flags tensor on the host —
    320–576 MB D2H for a 32-lane pass-3 slice (VERDICT r4 missing #5).
    This walk keeps the flags in HBM and traces every lane in lockstep
    inside one ``lax.while_loop``: per step, one 4-bit flag gather per
    lane + the same H/E/F state machine as ``walk_wavefront_dirs``
    (bit-identical op streams, tested), emitting per-step op codes
    {1 M, 2 D, 3 I} in END->START order into a bounded uint8 buffer.
    Only that buffer (~KB/lane) crosses to the host, where
    ``compress_ops`` turns it into CIGAR runs.

    ``dirs``: (NB, NC, DC//8, NR8, 128) int32 (wavefront_dirs_pallas
    layout); ``plan`` its geometry tuple.  Returns (ops (NB, SP)
    uint8, n_ops (NB,), p_start (NB,), t_start (NB,)).
    """
    DC, SROWS, C0, NR, NC, NR8 = (int(x) for x in plan)
    NB = dirs.shape[0]
    DC8 = DC // 8
    flat = dirs.reshape(NB, NC * DC8 * NR8 * 128)
    X = flat.shape[1]
    SP = NC * DC + 2  # emissions <= p_end + t_end <= ND <= NC*DC
    TMAX = 2 * SP + 8  # H->E/F transitions don't consume a step's
    # r/j but are each followed by a consuming step (host guard twin)

    r0 = p_end.astype(jnp.int32)
    j0 = t_end.astype(jnp.int32)

    def cond(sv):
        t, r, j, st, n, stopped, ops = sv
        return (t < TMAX) & jnp.any(~stopped & (r > 0))

    def body(sv):
        t, r, j, st, n, stopped, ops = sv
        d = r + j
        c = d // DC
        lane = r - 128 * SROWS * jnp.maximum(c - C0, 0)
        inb = (c >= 0) & (c < NC) & (lane >= 0) & (lane < NR * 128)
        m = d - c * DC
        idx = ((c * DC8 + (m >> 3)) * NR8 + (lane >> 7)) * 128 + (
            lane & 127)
        word = jnp.take_along_axis(
            flat, jnp.clip(idx, 0, X - 1)[:, None], axis=1)[:, 0]
        f = jnp.where(inb, (word >> (4 * (m & 7))) & 0xF, 3)
        active = ~stopped & (r > 0)
        src = f & 3
        is_h = st == 0
        stop_now = active & is_h & (src == 3)
        do_m = active & is_h & (src == 0)
        to_e = active & is_h & (src == 1)
        to_f = active & is_h & (src == 2)
        in_e = active & (st == 1)
        in_f = active & (st == 2)
        code = jnp.where(do_m, 1, jnp.where(in_e, 2,
                                            jnp.where(in_f, 3, 0)))
        emit = code > 0
        ops = ops.at[
            jnp.arange(NB), jnp.where(emit, n, SP)
        ].set(code.astype(jnp.uint8), mode="drop")
        n = n + emit.astype(jnp.int32)
        e_done = (f >> 2) & 1
        f_done = (f >> 3) & 1
        r = r - (do_m | in_f).astype(jnp.int32)
        j = j - (do_m | in_e).astype(jnp.int32)
        st = jnp.where(to_e, 1, jnp.where(to_f, 2, st))
        st = jnp.where((in_e & (e_done == 1))
                       | (in_f & (f_done == 1)), 0, st)
        stopped = stopped | stop_now
        return (t + 1, r, j, st, n, stopped, ops)

    sv0 = (jnp.int32(0), r0, j0, jnp.zeros(NB, jnp.int32),
           jnp.zeros(NB, jnp.int32), jnp.zeros(NB, bool),
           jnp.zeros((NB, SP + 1), jnp.uint8))
    _t, r, j, _st, n, _stopped, ops = jax.lax.while_loop(
        cond, body, sv0)
    return ops[:, :SP], n, r, j


def compress_ops(o: np.ndarray):
    """Per-step op codes (END->START) -> (run_ops, run_lens)."""
    o = np.asarray(o, np.uint8)
    if o.size == 0:
        return np.zeros(0, np.uint8), np.zeros(0, np.int32)
    starts = np.concatenate(
        [[0], np.flatnonzero(np.diff(o.astype(np.int16)) != 0) + 1])
    lens = np.diff(np.concatenate([starts, [o.size]]))
    return o[starts], lens.astype(np.int32)
