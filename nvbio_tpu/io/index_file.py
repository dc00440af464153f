"""Index container: save/load FM-index + SSA + genome (+contig table).

Our container is a single .npz (Appendix A of SURVEY.md allows a
native container as long as BWA-style interop exists — ``write_pac`` /
``read_pac`` below implement the BWA .pac 2-bit format the reference
reads/writes via io/sequence/sequence_pac.cpp and nvBWT).

``load_index(mmap=True)`` memory-maps the container — the moral
equivalent of nvFM-server's shared-memory index serving (ref:
nvFM-server/nvFM-server.cpp, basic/mmap.h): multiple mapper processes
on one host share page-cache pages instead of re-parsing.
"""

from __future__ import annotations

import json

import numpy as np
import jax.numpy as jnp

from ..fmindex.index import FMIndex, SSA

FORMAT_VERSION = 1


def save_index(path, fm: FMIndex, ssa: SSA, genome: np.ndarray,
               contig_names, contig_lens, sa_sample: int,
               lut=None, lut_k: int = 0, amb=None):
    meta = {
        "version": FORMAT_VERSION,
        "sa_sample": int(sa_sample),
        "sa_bi": int(getattr(ssa, "bi", 0)),
        "lut_k": int(lut_k if lut is not None else 0),
        "contig_names": list(contig_names),
        "contig_lens": [int(x) for x in contig_lens],
        # substituted-N runs as [start, len] pairs (the BWA .amb
        # content; io/bwa_files.py export needs them)
        "amb": [[int(a), int(b)] for a, b in (amb or [])],
    }
    extra = {}
    if lut is not None:
        extra = {"lut_lo": np.asarray(lut[0]), "lut_hi": np.asarray(lut[1])}
    np.savez(
        path,
        meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
        genome=np.asarray(genome, dtype=np.int8),
        bwt_words=np.asarray(fm.bwt_words),
        occ_abs=np.asarray(fm.occ_abs),
        occ_sub=np.asarray(fm.occ_sub),
        C=np.asarray(fm.C),
        primary=np.asarray(fm.primary),
        n=np.asarray(fm.n),
        mark_words=np.asarray(ssa.mark_words),
        mark_abs=np.asarray(ssa.mark_abs),
        vals=np.asarray(ssa.vals),
        **extra,
    )


def load_index(path, mmap: bool = False):
    """Returns (fm, ssa, genome np.int8, meta dict)."""
    z = np.load(path, mmap_mode="r" if mmap else None)
    meta = json.loads(bytes(z["meta"]).decode())
    fm = FMIndex(
        bwt_words=jnp.asarray(z["bwt_words"]),
        occ_abs=jnp.asarray(z["occ_abs"]),
        occ_sub=jnp.asarray(z["occ_sub"]),
        C=jnp.asarray(z["C"]),
        primary=jnp.asarray(z["primary"]),
        n=jnp.asarray(z["n"]),
    )
    ssa = SSA(
        mark_words=jnp.asarray(z["mark_words"]),
        mark_abs=jnp.asarray(z["mark_abs"]),
        vals=jnp.asarray(z["vals"]),
        k=int(meta.get("sa_sample", 0)),
        bi=int(meta.get("sa_bi", 0)),
    )
    meta.setdefault("lut_k", 0)
    if "lut_lo" in getattr(z, "files", []):
        meta["lut"] = (jnp.asarray(z["lut_lo"]), jnp.asarray(z["lut_hi"]))
    return fm, ssa, np.asarray(z["genome"]), meta


def write_pac(path, symbols: np.ndarray):
    """BWA-layout .pac: 4 bases/byte, base i at shift ((~i & 3) << 1);
    trailing byte stores n % 4 (ref: sequence_pac.cpp, nvBWT)."""
    symbols = np.asarray(symbols, dtype=np.uint8) & 3
    n = len(symbols)
    n_bytes = (n + 3) // 4
    padded = np.zeros(n_bytes * 4, dtype=np.uint8)
    padded[:n] = symbols
    lanes = padded.reshape(n_bytes, 4)
    shifts = np.array([6, 4, 2, 0], dtype=np.uint8)
    pac = np.bitwise_or.reduce(lanes << shifts, axis=1).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(pac.tobytes())
        f.write(bytes([n % 4]))


def read_pac(path) -> np.ndarray:
    data = np.frombuffer(open(path, "rb").read(), dtype=np.uint8)
    rem = int(data[-1])
    pac = data[:-1]
    shifts = np.array([6, 4, 2, 0], dtype=np.uint8)
    syms = ((pac[:, None] >> shifts[None, :]) & 3).reshape(-1)
    n = (len(pac) - 1) * 4 + rem if rem else len(pac) * 4
    return syms[:n].astype(np.uint8)
