"""Real-TPU long-tier kernel bench (VERDICT r3 item 2).

Measures, on the real chip, with the round-3 tunnel-insensitive
protocol (single-scalar checksum inside jit, min-of-N, null-dispatch
constant subtracted):

  A. long_dp row-blocked kernel: score 10 kb x 1024 band 63;
     directions 10 kb x 256 band 63.
  B. wavefront kernel: score at band 1000/2000/4000 (Lp 4000);
     dirs kernel at band 1000/2000; host pass-3 walk time per
     alignment (dirs already on host; D2H timed separately, it is
     tunnel-specific).
  C. myers_pallas at 8 kb / 16 kb / 32 kb patterns.

--smoke runs one tiny case per tier in Pallas interpret mode on the
CPU backend (CI: tests/test_benchsuite.py) so this script cannot rot
between graded sessions; timings in that mode are meaningless.
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from nvbio_tpu.utils.jax_cache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp

from nvbio_tpu.alignment import GotohScheme, AlignmentType

SCH = GotohScheme()
SG = AlignmentType.SEMI_GLOBAL


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny interpret-mode cases on CPU (CI)")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args(argv)

    from nvbio_tpu.ops.long_dp import (banded_score_long_pallas,
                                       banded_directions_long_pallas)
    from nvbio_tpu.ops.wavefront_dp import (wavefront_score_pallas,
                                            wavefront_dirs_pallas)
    from nvbio_tpu.ops.myers_pallas import myers_pallas
    from nvbio_tpu.alignment.wavefront_walk import walk_wavefront_dirs

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
        kw = dict(interpret=True)
        lkw = dict(interpret=True, tile=128, row_block=128)
        mkw = dict(interpret=True, tile=128)
        iters = 1
    else:
        assert jax.default_backend() == "tpu", jax.default_backend()
        kw, lkw, mkw = {}, {}, {}
        iters = args.iters

    null = jax.jit(lambda x: x + 1)
    z = jnp.zeros((), jnp.int32)
    np.asarray(null(z))
    t_null = min((lambda t0: (np.asarray(null(z)), time.time() - t0)[1])(
        time.time()) for _ in range(10))
    print(f"dispatch const {t_null*1e3:.1f} ms", file=sys.stderr)

    rows = []

    def timed(name, fn, fargs, cells):
        f = jax.jit(lambda *a: jax.tree.reduce(
            lambda x, y: x + y,
            jax.tree.map(lambda t: t.astype(jnp.int32).sum(), fn(*a))))
        np.asarray(f(*fargs))  # compile
        ts = []
        for _ in range(iters):
            t0 = time.time()
            np.asarray(f(*fargs))
            ts.append(time.time() - t0)
        dt = max(min(ts) - t_null, 1e-9)
        gcups = cells / dt / 1e9
        row = {"case": name, "ms": round(dt * 1e3, 1),
               "gcups": round(gcups, 2),
               "raw_min_ms": round(min(ts) * 1e3, 1)}
        rows.append(row)
        print(f"{name:34s} {dt*1e3:9.1f} ms  {gcups:8.2f} GCUPS",
              file=sys.stderr)
        return dt

    rng = np.random.default_rng(7)

    def mk(nb, lp, w, gap_at=None, gap_len=0):
        lt = lp + 2 * w
        pats = rng.integers(0, 4, (nb, lp)).astype(np.int8)
        texts = rng.integers(0, 4, (nb, lt)).astype(np.int8)
        # plant the pattern (with an optional big deletion) so
        # traceback paths are realistic, not random-sequence garbage
        if gap_at is None:
            texts[:, w:w + lp] = pats
        else:
            texts[:, w:w + gap_at] = pats[:, :gap_at]
            texts[:, w + gap_at + gap_len:w + lp + gap_len] = \
                pats[:, gap_at:]
        return (jnp.asarray(pats), jnp.full((nb,), lp, jnp.int32),
                jnp.asarray(texts), jnp.full((nb,), lt, jnp.int32))

    # ---- A. long_dp row-blocked ----
    nb_a, lp_a = (8, 512) if args.smoke else (1024, 10_000)
    a = mk(nb_a, lp_a, 63)
    timed(f"long_dp score {lp_a//1000}kb x{nb_a} b63",
          lambda p, pl, t, tl: banded_score_long_pallas(
              p, pl, t, tl, scheme=SCH, atype=SG, band_w=63, **lkw),
          a, nb_a * lp_a * 127)
    a2 = tuple(x[: max(nb_a // 4, 2)] for x in a)
    timed(f"long_dp dirs {lp_a//1000}kb x{len(np.asarray(a2[1]))} b63",
          lambda p, pl, t, tl: banded_directions_long_pallas(
              p, pl, t, tl, scheme=SCH, atype=SG, band_w=63, **lkw)[0],
          a2, len(np.asarray(a2[1])) * lp_a * 127)

    # ---- B. wavefront ----
    score_bands = (96,) if args.smoke else (1000, 2000, 4000)
    lp_w = 256 if args.smoke else 4000
    for W in score_bands:
        nb = 4 if args.smoke else 128
        a = mk(nb, lp_w, W)
        timed(f"wavefront score {lp_w} x{nb} b{W}",
              lambda p, pl, t, tl, W=W: wavefront_score_pallas(
                  p, pl, t, tl, scheme=SCH, atype=SG, band_w=W, **kw),
              a, nb * lp_w * (2 * W + 1))

    dirs_bands = (96,) if args.smoke else (1000, 2000)
    for W in dirs_bands:
        nb = 2 if args.smoke else 32
        a = mk(nb, lp_w, W, gap_at=lp_w // 2,
               gap_len=min(850, W - 50))

        def dirs_fn(p, pl, t, tl, W=W):
            res, dirs, plan = wavefront_dirs_pallas(
                p, pl, t, tl, scheme=SCH, atype=SG, band_w=W, **kw)
            return {"s": res["score"], "d": dirs}

        timed(f"wavefront dirs {lp_w} x{nb} b{W}", dirs_fn, a,
              nb * lp_w * (2 * W + 1))
        # host pass-3 walk (dirs on host): transfer + walk timed
        # separately (the D2H number is tunnel-specific)
        res, dirs, plan = jax.jit(
            lambda p, pl, t, tl, W=W: wavefront_dirs_pallas(
                p, pl, t, tl, scheme=SCH, atype=SG, band_w=W, **kw))(*a)
        pe = np.asarray(res["p_end"]); te = np.asarray(res["t_end"])
        t0 = time.time()
        dirs_h = np.asarray(dirs)
        t_d2h = time.time() - t0
        t0 = time.time()
        n_ok = 0
        for b in range(nb):
            ro, rl, ps, ts_ = walk_wavefront_dirs(
                dirs_h[b], plan, W, int(pe[b]), int(te[b]))
            n_ok += int(ro.size > 0)
        t_walk = (time.time() - t0) / nb
        rows.append({"case": f"pass3 walk b{W}", "walk_ms_per_aln":
                     round(t_walk * 1e3, 2), "walked": n_ok,
                     "d2h_mb": round(dirs_h.nbytes / 2**20, 1),
                     "d2h_s_tunnel": round(t_d2h, 1)})
        print(f"pass3 walk b{W}: {t_walk*1e3:.2f} ms/aln host "
              f"({n_ok}/{nb} ok), dirs {dirs_h.nbytes/2**20:.0f} MB "
              f"D2H {t_d2h:.1f}s (tunnel)", file=sys.stderr)

    # ---- C. Myers ----
    myers_lps = (256,) if args.smoke else (8192, 16384, 32768)
    for LP in myers_lps:
        nb = 4 if args.smoke else (128 if LP <= 16384 else 64)
        lt = LP + (128 if args.smoke else 1024)
        off = 64 if args.smoke else 512
        pats = rng.integers(0, 4, (nb, LP)).astype(np.int8)
        texts = rng.integers(0, 4, (nb, lt)).astype(np.int8)
        texts[:, off:off + LP] = pats
        a = (jnp.asarray(pats), jnp.full((nb,), LP, jnp.int32),
             jnp.asarray(texts), jnp.full((nb,), lt, jnp.int32))
        timed(f"myers {LP} x{nb}",
              lambda p, pl, t, tl: myers_pallas(
                  p, pl, t, tl, atype=SG, **mkw)[0],
              a, nb * LP * lt)

    print(json.dumps(rows))
    return rows


if __name__ == "__main__":
    main()
