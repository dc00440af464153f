"""Multi-host scale-out path: FASTQ sharding + deterministic SAM merge.

The invariant under test (BASELINE.md config 5 correctness bar):
mapping N shards independently and merging in shard order is
bit-identical to mapping the unsharded input in one run.
"""

import os

import numpy as np
import pytest

from nvbio_tpu.parallel.distributed import (
    shard_fastq,
    read_fastq_range,
    merge_sam_shards,
)
from nvbio_tpu.io.fastq import read_fastq, write_fastq
from nvbio_tpu.utils.simulate import random_genome, simulate_reads


@pytest.fixture(scope="module")
def fastq_file(tmp_path_factory):
    genome = random_genome(60_000, seed=31)
    sim = simulate_reads(genome, 101, 100, seed=32)  # odd count on purpose
    path = tmp_path_factory.mktemp("dist") / "reads.fq"
    recs = [
        (f"read_{i}", sim["seqs"][i].astype(np.uint8), sim["quals"][i])
        for i in range(101)
    ]
    write_fastq(str(path), recs)
    return str(path), genome


@pytest.mark.parametrize("n_shards", [2, 3, 7])
def test_shard_fastq_partitions_records(fastq_file, n_shards):
    path, _ = fastq_file
    ranges = shard_fastq(path, n_shards)
    assert ranges[0][0] == 0
    assert ranges[-1][1] == os.path.getsize(path)
    for k in range(1, n_shards):
        assert ranges[k][0] == ranges[k - 1][1]  # contiguous partition
    all_names = []
    for s, e in ranges:
        names, seqs, quals = read_fastq_range(path, s, e)
        all_names.extend(names)
    want_names, want_seqs, _ = read_fastq(path)
    assert all_names == list(want_names)


def test_shard_fastq_quality_at_line_tricky(tmp_path):
    # quality strings starting with '@' must not fool the boundary scan
    path = tmp_path / "tricky.fq"
    with open(path, "w") as f:
        for i in range(40):
            f.write(f"@r{i}\nACGTACGTAC\n+\n@@@@@@@@@@\n")
    for n in (2, 3, 5):
        ranges = shard_fastq(str(path), n)
        total = []
        for s, e in ranges:
            names, _, _ = read_fastq_range(str(path), s, e)
            total.extend(names)
        assert total == [f"r{i}" for i in range(40)]


def test_sharded_mapping_matches_single_run(fastq_file, tmp_path):
    from nvbio_tpu.tools import map_reads, sam_merge
    from nvbio_tpu.tools.build_index import main as build_main

    path, genome = fastq_file
    from nvbio_tpu.io.fasta import write_fasta

    fa = tmp_path / "g.fa"
    write_fasta(str(fa), [("chr1", genome)])
    idx = tmp_path / "g.npz"
    build_main([str(fa), str(idx)])

    single = tmp_path / "single.sam"
    map_reads.main(["-x", str(idx), "-U", path, "-S", str(single),
                    "--cpu", "--batch", "64"])

    shards = []
    for k in range(2):
        sp = tmp_path / f"shard{k}.sam"
        map_reads.main(["-x", str(idx), "-U", path, "-S", str(sp),
                        "--cpu", "--batch", "64",
                        "--num-shards", "2", "--shard-id", str(k)])
        shards.append(str(sp))
    merged = tmp_path / "merged.sam"
    sam_merge.main(shards + ["-o", str(merged)])

    strip = lambda p: [
        l for l in open(p) if not l.startswith("@PG")
    ]
    assert strip(merged) == strip(single)


def test_two_process_jax_distributed(tmp_path):
    """Real jax.distributed: 2 CPU processes, global 2-device mesh,
    jitted mapping step over process-local shards (SURVEY.md §7.4)."""
    import socket
    import subprocess
    import sys as _sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    worker = os.path.join(os.path.dirname(__file__), "_dist_worker.py")
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    procs = [
        subprocess.Popen(
            [_sys.executable, worker, str(k), "2", port],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        )
        for k in range(2)
    ]
    outs = []
    try:
        for pr in procs:
            out, err = pr.communicate(timeout=240)
            outs.append((pr.returncode, out.decode(), err.decode()))
    finally:
        for pr in procs:
            if pr.poll() is None:
                pr.kill()
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{out}\n{err[-2000:]}"
        assert "DIST_OK" in out
    # the global aligned count must agree across processes
    counts = {o.split("aligned=")[1].split()[0] for _, o, _ in outs}
    assert len(counts) == 1
    n_ok, n_tot = counts.pop().split("/")
    assert int(n_ok) >= int(n_tot) * 9 // 10
