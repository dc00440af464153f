"""hg-scale per-stage mapping bench (BASELINE configs 3+5).

Reconstructs the round-4 measurement (BENCHMARKS.md "hg38-scale
mapping"): a repeat-structured genome (hgr protocol: 8 % planted
ALUs, segdups, tandems), sharded index (sa_sample 4, k=11 LUT),
16 384 x 100 bp reads/batch at 1 % error, and two phases:

  A. one chip holds ALL shards (sequential per-shard candidate
     stages + cross-shard top-2 + winner walk) -> reads/s/chip;
  B. ONE shard + resident device pair-BWT (fm2) -> the per-chip
     profile of the shard-per-chip mesh layout (config 5).

Device times are min-of-5 with the measured null-dispatch constant
subtracted (the round-3 tunnel-insensitive protocol).  Scale down
with --bp/--shards for smoke runs; the graded run is
  python benchsuite/hg_stage_bench.py --bp 3200000000 --shards 3
(index build ~80 min single-core; cached under --cache).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nvbio_tpu.utils.jax_cache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp


def checksum_time(fn, iters, t_null):
    """min-of-iters wall of jit(checksum(fn())), null-subtracted."""
    f = jax.jit(lambda: jax.tree.reduce(
        lambda x, y: x + y,
        jax.tree.map(lambda t: t.astype(jnp.int32).sum(), fn())))
    np.asarray(f())  # compile
    ts = []
    for _ in range(iters):
        t0 = time.time()
        np.asarray(f())
        ts.append(time.time() - t0)
    return max(min(ts) - t_null, 1e-9)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--bp", type=float, default=100e6)
    p.add_argument("--shards", type=int, default=3)
    p.add_argument("--batch", type=int, default=16384)
    p.add_argument("--read-len", type=int, default=100)
    p.add_argument("--seed", type=int, default=11)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--cache", default=".scratch/hgbench")
    p.add_argument("--skip-b", action="store_true")
    args = p.parse_args(argv)

    from nvbio_tpu.fmindex.sharded import (build_sharded_index,
                                           save_sharded_index,
                                           load_sharded_index)
    from nvbio_tpu.models import MapperParams
    from nvbio_tpu.models.sharded_mapper import (
        ShardedMapper, _shard_cands, _sharded_top2, _sharded_walk)
    from nvbio_tpu.utils.simulate import (repeat_structured_genome,
                                          simulate_reads)

    n = int(args.bp)
    scale = n / 3.2e9
    t0 = time.time()
    genome, _ = repeat_structured_genome(
        n, seed=args.seed, alu_frac=0.08,
        n_segdups=max(2, int(300 * scale)),
        segdup_len=min(100_000, n // 20),
        n_tandems=max(10, int(20_000 * scale)))
    print(f"[hg] genome {n/1e6:.0f} Mbp in {time.time()-t0:.0f}s",
          file=sys.stderr)

    os.makedirs(args.cache, exist_ok=True)
    prefix = os.path.join(args.cache,
                          f"hgr_{n//1_000_000}m_{args.shards}s")
    if not os.path.exists(prefix + ".manifest.json"):
        t0 = time.time()
        sidx = build_sharded_index(
            genome, shard_bp=(n + args.shards - 1) // args.shards,
            sa_sample=4, lut_k=11)
        save_sharded_index(prefix, sidx, genome, ["hgr"], [n])
        print(f"[hg] index built in {time.time()-t0:.0f}s",
              file=sys.stderr)
    loaded = load_sharded_index(prefix)
    sidx = loaded[0] if isinstance(loaded, tuple) else loaded

    sim = simulate_reads(genome, args.batch, read_len=args.read_len,
                         error_rate=0.01, seed=args.seed + 1)
    lens = np.full(args.batch, args.read_len, np.int32)

    null = jax.jit(lambda x: x + 1)
    z = jnp.zeros((), jnp.int32)
    np.asarray(null(z))
    t_null = min((lambda s: (np.asarray(null(z)), time.time() - s)[1])(
        time.time()) for _ in range(10))
    print(f"[hg] dispatch const {t_null*1e3:.1f} ms", file=sys.stderr)
    rows = []

    def run_phase(name, mapper, shard_ids):
        params = mapper._chunk_params(args.read_len, args.read_len)
        seqs, ls, qs = mapper._pad_chunk(sim["seqs"], lens, sim["quals"])
        jr, jl = jnp.asarray(seqs), jnp.asarray(ls.astype(np.int32))
        jq = jnp.asarray(qs.astype(np.uint8))
        total = 0.0
        cands = []
        for s in shard_ids:
            st = mapper.shard_state[s]
            fn = lambda st=st: _shard_cands(
                st["fm"], st["ssa"], st["g"], jr, jl, jq,
                jnp.asarray(st["own_lo"], jnp.int32),
                jnp.asarray(st["own_hi"], jnp.int32),
                params=params, use_pallas=mapper.use_pallas,
                lut=st["lut"], gwords=st["gw"], fm2=st["fm2"])
            dt = checksum_time(fn, args.iters, t_null)
            print(f"[{name}] candidate stage shard {s}: "
                  f"{dt*1e3:.0f} ms", file=sys.stderr)
            rows.append({"phase": name, "stage": f"cands_shard{s}",
                         "ms": round(dt * 1e3, 1)})
            total += dt
            cands.append(fn())
        dt = checksum_time(
            lambda: _sharded_top2(cands, jl, params), args.iters, t_null)
        rows.append({"phase": name, "stage": "top2", "ms":
                     round(dt * 1e3, 1)})
        total += dt
        fwd = _sharded_top2(cands, jl, params)
        dt = checksum_time(
            lambda: _sharded_walk(
                mapper._gs, mapper._glens, fwd["win_start"],
                fwd["shard"], jr, jl, jq, fwd["strand"], params=params,
                use_pallas=mapper.use_pallas),
            args.iters, t_null)
        rows.append({"phase": name, "stage": "walk",
                     "ms": round(dt * 1e3, 1)})
        total += dt
        rps = args.batch / total
        rows.append({"phase": name, "stage": "TOTAL",
                     "ms": round(total * 1e3, 1),
                     "reads_per_s_chip": round(rps)})
        print(f"[{name}] device total {total*1e3:.0f} ms -> "
              f"{rps:,.0f} reads/s/chip", file=sys.stderr)

    # phase A: all shards resident, fm2 off (HBM budget)
    mp = MapperParams(batch_size=args.batch, sa_sample=4, use_fm2=False)
    mapper = ShardedMapper(sidx, genome, params=mp, fm2_mode="off")
    run_phase("A_all_shards", mapper, list(range(len(mapper.shard_state))))
    del mapper

    if not args.skip_b:
        # phase B: ONE shard + resident device pair-BWT — the mesh
        # per-chip profile
        mp2 = MapperParams(batch_size=args.batch, sa_sample=4,
                           use_fm2=True)
        mapper = ShardedMapper(sidx, genome, params=mp2,
                               fm2_mode="resident")
        run_phase("B_one_shard_fm2", mapper, [0])

    print(json.dumps(rows))


if __name__ == "__main__":
    main()
