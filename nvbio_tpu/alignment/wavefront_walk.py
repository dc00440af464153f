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

import numpy as np


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
