"""Persistent fm_server daemon: device-resident index serving mapping
jobs over a unix socket (nvFM-server capability equivalent)."""

import json
import os
import threading
import time

import numpy as np
import pytest

from nvbio_tpu.io.fasta import write_fasta
from nvbio_tpu.io.fastq import write_fastq
from nvbio_tpu.utils.simulate import random_genome, simulate_reads


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    from nvbio_tpu.tools.build_index import main as build
    from nvbio_tpu.tools import fm_server

    d = tmp_path_factory.mktemp("fmsrv")
    g = random_genome(120_000, seed=61)
    write_fasta(d / "g.fa", [("chr1", g)])
    sim = simulate_reads(g, 64, 100, seed=62, error_rate=0.01)
    write_fastq(d / "r.fq", [
        (f"s{i}", sim["seqs"][i].astype(np.uint8), sim["quals"][i])
        for i in range(64)])
    assert build([str(d / "g.fa"), str(d / "g.npz"),
                  "--sa-sample", "16"]) == 0
    sock = str(d / "fm.sock")
    t = threading.Thread(
        target=fm_server.serve,
        args=(str(d / "g.npz"), sock),
        kwargs=dict(batch=64, max_read_len=128, cpu=True),
        daemon=True)
    t.start()
    for _ in range(100):
        if os.path.exists(sock):
            break
        time.sleep(0.1)
    else:
        raise RuntimeError("server socket never appeared")
    yield d, sock, sim
    try:
        fm_server.request(sock, {"cmd": "stop"}, timeout=10)
    except Exception:
        pass
    t.join(timeout=30)


def test_ping_reports_attach_time(served):
    from nvbio_tpu.tools import fm_server

    _d, sock, _sim = served
    r = fm_server.request(sock, {"cmd": "ping"}, timeout=60)
    assert r["status"] == "ok"
    assert r["attach_seconds"] is not None


def test_map_requests_amortize_attach(served):
    """Two jobs against the resident index: both correct; the second
    skips load+upload+compile (steady-state much faster than first)."""
    from nvbio_tpu.tools import fm_server

    d, sock, sim = served
    t0 = time.time()
    r1 = fm_server.request(sock, {"cmd": "map", "u": str(d / "r.fq"),
                                  "sam": str(d / "o1.sam")})
    cold = time.time() - t0
    assert r1["status"] == "ok" and r1["reads"] == 64
    t0 = time.time()
    r2 = fm_server.request(sock, {"cmd": "map", "u": str(d / "r.fq"),
                                  "sam": str(d / "o2.sam")})
    warm = time.time() - t0
    assert r2["status"] == "ok"
    assert warm < cold / 2  # resident index + warm jit
    # output correctness: positions near simulated truth
    ok = 0
    for line in open(d / "o2.sam"):
        if line.startswith("@"):
            continue
        c = line.split("\t")
        if int(c[1]) & 4:
            continue
        if abs(int(c[3]) - 1 - sim["true_pos"][int(c[0][1:])]) <= 8:
            ok += 1
    assert ok >= 58
    # both outputs identical (same resident state)
    a = [l for l in open(d / "o1.sam") if not l.startswith("@PG")]
    b = [l for l in open(d / "o2.sam") if not l.startswith("@PG")]
    assert a == b


def test_bad_request_keeps_server_alive(served):
    from nvbio_tpu.tools import fm_server

    d, sock, _sim = served
    r = fm_server.request(sock, {"cmd": "map", "u": "/nonexistent.fq",
                                 "sam": str(d / "bad.sam")})
    assert r["status"] == "error"
    assert fm_server.request(sock, {"cmd": "ping"})["status"] == "ok"


def test_sharded_index_served(tmp_path):
    """The daemon serves sharded (hg-scale layout) indexes too —
    resident shards + warm jits, same outputs as a direct map_reads
    run."""
    import subprocess
    import sys as _sys
    from nvbio_tpu.tools.build_index import main as build
    from nvbio_tpu.tools import fm_server

    g = random_genome(150_000, seed=63)
    write_fasta(tmp_path / "g.fa", [("chr1", g)])
    sim = simulate_reads(g, 48, 100, seed=64, error_rate=0.01)
    write_fastq(tmp_path / "r.fq", [
        (f"s{i}", sim["seqs"][i].astype(np.uint8), sim["quals"][i])
        for i in range(48)])
    assert build([str(tmp_path / "g.fa"), str(tmp_path / "g.npz"),
                  "--sa-sample", "16", "--shard-bp", "60000"]) == 0
    sock = str(tmp_path / "fm.sock")
    t = threading.Thread(
        target=fm_server.serve,
        args=(str(tmp_path / "g"), sock),
        kwargs=dict(batch=48, max_read_len=128, cpu=True, once=True),
        daemon=True)
    t.start()
    for _ in range(300):
        if os.path.exists(sock):
            break
        time.sleep(0.1)
    else:
        raise RuntimeError("server socket never appeared")
    r = fm_server.request(sock, {"cmd": "map", "u": str(tmp_path / "r.fq"),
                                 "sam": str(tmp_path / "o.sam")},
                          timeout=600)
    assert r["status"] == "ok" and r["reads"] == 48
    t.join(timeout=60)
    ok = 0
    for line in open(tmp_path / "o.sam"):
        if line.startswith("@"):
            continue
        c = line.split("\t")
        if not int(c[1]) & 4 and \
                abs(int(c[3]) - 1 - sim["true_pos"][int(c[0][1:])]) <= 8:
            ok += 1
    assert ok >= 44
