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
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from nvbio_tpu.utils.jax_cache import enable_compilation_cache
enable_compilation_cache()

from nvbio_tpu.alignment import GotohScheme, AlignmentType
from nvbio_tpu.ops.long_dp import (banded_score_long_pallas,
                                   banded_directions_long_pallas)
from nvbio_tpu.ops.wavefront_dp import (wavefront_score_pallas,
                                        wavefront_dirs_pallas)
from nvbio_tpu.ops.myers_pallas import myers_pallas
from nvbio_tpu.alignment.wavefront_walk import walk_wavefront_dirs

assert jax.default_backend() == "tpu", jax.default_backend()

null = jax.jit(lambda x: x + 1)
z = jnp.zeros((), jnp.int32)
np.asarray(null(z))
T_NULL = min((lambda t0: (np.asarray(null(z)), time.time() - t0)[1])(
    time.time()) for _ in range(10))
print(f"dispatch const {T_NULL*1e3:.1f} ms", file=sys.stderr)

rows = []


def timed(name, fn, args, cells, iters=5):
    f = jax.jit(lambda *a: jax.tree.reduce(
        lambda x, y: x + y,
        jax.tree.map(lambda t: t.astype(jnp.int32).sum(), fn(*a))))
    np.asarray(f(*args))  # compile
    ts = []
    for _ in range(iters):
        t0 = time.time()
        np.asarray(f(*args))
        ts.append(time.time() - t0)
    dt = max(min(ts) - T_NULL, 1e-9)
    gcups = cells / dt / 1e9
    row = {"case": name, "ms": round(dt * 1e3, 1),
           "gcups": round(gcups, 2), "raw_min_ms": round(min(ts)*1e3, 1)}
    rows.append(row)
    print(f"{name:34s} {dt*1e3:9.1f} ms  {gcups:8.2f} GCUPS",
          file=sys.stderr)
    return dt


rng = np.random.default_rng(7)


def mk(nb, lp, w, gap_at=None, gap_len=0):
    lt = lp + 2 * w
    pats = rng.integers(0, 4, (nb, lp)).astype(np.int8)
    texts = rng.integers(0, 4, (nb, lt)).astype(np.int8)
    # plant the pattern (with an optional big deletion) so traceback
    # paths are realistic, not random-sequence garbage
    if gap_at is None:
        texts[:, w:w + lp] = pats
    else:
        texts[:, w:w + gap_at] = pats[:, :gap_at]
        texts[:, w + gap_at + gap_len:w + lp + gap_len] = pats[:, gap_at:]
    return (jnp.asarray(pats), jnp.full((nb,), lp, jnp.int32),
            jnp.asarray(texts), jnp.full((nb,), lt, jnp.int32))


SCH = GotohScheme()
SG = AlignmentType.SEMI_GLOBAL

# ---- A. long_dp row-blocked ----
a = mk(1024, 10_000, 63)
timed("long_dp score 10kb x1024 b63",
      lambda p, pl, t, tl: banded_score_long_pallas(
          p, pl, t, tl, scheme=SCH, atype=SG, band_w=63),
      a, 1024 * 10_000 * 127)
a2 = tuple(x[:256] for x in a)
timed("long_dp dirs 10kb x256 b63",
      lambda p, pl, t, tl: banded_directions_long_pallas(
          p, pl, t, tl, scheme=SCH, atype=SG, band_w=63)[0],
      a2, 256 * 10_000 * 127)

# ---- B. wavefront ----
for W in (1000, 2000, 4000):
    nb = 128
    a = mk(nb, 4000, W)
    timed(f"wavefront score 4kb x{nb} b{W}",
          lambda p, pl, t, tl, W=W: wavefront_score_pallas(
              p, pl, t, tl, scheme=SCH, atype=SG, band_w=W),
          a, nb * 4000 * (2 * W + 1))

for W in (1000, 2000):
    nb = 32
    a = mk(nb, 4000, W, gap_at=2000, gap_len=min(850, W - 50))
    res_dirs = [None]

    def dirs_fn(p, pl, t, tl, W=W):
        res, dirs, plan = wavefront_dirs_pallas(
            p, pl, t, tl, scheme=SCH, atype=SG, band_w=W)
        res_dirs[0] = plan
        return {"s": res["score"], "d": dirs}

    timed(f"wavefront dirs 4kb x{nb} b{W}", dirs_fn, a,
          nb * 4000 * (2 * W + 1))
    # host pass-3 walk (dirs on host): time transfer + walk separately
    res, dirs, plan = jax.jit(
        lambda p, pl, t, tl, W=W: wavefront_dirs_pallas(
            p, pl, t, tl, scheme=SCH, atype=SG, band_w=W))(*a)
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
for LP in (8192, 16384, 32768):
    nb = 128 if LP <= 16384 else 64
    lt = LP + 1024
    pats = rng.integers(0, 4, (nb, LP)).astype(np.int8)
    texts = rng.integers(0, 4, (nb, lt)).astype(np.int8)
    texts[:, 512:512 + LP] = pats
    a = (jnp.asarray(pats), jnp.full((nb,), LP, jnp.int32),
         jnp.asarray(texts), jnp.full((nb,), lt, jnp.int32))
    timed(f"myers {LP//1024}kb x{nb}",
          lambda p, pl, t, tl: myers_pallas(p, pl, t, tl, atype=SG)[0],
          a, nb * LP * lt)

print(json.dumps(rows))
