"""Shared-index server (nvFM-server equivalent).

Ref parity: nvFM-server/nvFM-server.cpp + basic/mmap.h
(``ServerMappedFile``): the reference loads an FM-index once and serves
it to client processes through POSIX shared memory.  The TPU-host
equivalent: place the index container in /dev/shm; clients
``load_index(mmap=True)`` and share page-cache pages — same
amortization, no custom IPC needed.

    python -m nvbio_tpu.tools.fm_server publish idx.npz  # -> /dev/shm
    python -m nvbio_tpu.tools.fm_server list
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

SHM_DIR = "/dev/shm/nvbio_tpu"


def publish(path):
    os.makedirs(SHM_DIR, exist_ok=True)
    dst = os.path.join(SHM_DIR, os.path.basename(path))
    shutil.copyfile(path, dst)
    print(dst)
    return 0


def main(argv=None):
    p = argparse.ArgumentParser(prog="fm_server", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    pp = sub.add_parser("publish")
    pp.add_argument("index")
    sub.add_parser("list")
    pr = sub.add_parser("remove")
    pr.add_argument("name")
    args = p.parse_args(argv)
    if args.cmd == "publish":
        return publish(args.index)
    if args.cmd == "list":
        if os.path.isdir(SHM_DIR):
            for f in sorted(os.listdir(SHM_DIR)):
                print(os.path.join(SHM_DIR, f))
        return 0
    if args.cmd == "remove":
        os.remove(os.path.join(SHM_DIR, args.name))
        return 0


if __name__ == "__main__":
    sys.exit(main())
