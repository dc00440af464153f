"""Persistent XLA compilation cache for the CLI tools.

The mapper pipeline compiles several large programs (~minutes on a
cold start); caching them on disk makes every run after the first
start mapping immediately — the moral equivalent of the reference
shipping precompiled CUDA binaries.  Controlled by NVBIO_TPU_CACHE
(set to "0" to disable; defaults to ~/.cache/nvbio_tpu/xla).
"""

from __future__ import annotations

import os


def enable_compilation_cache(min_compile_secs: float = 1.0):
    d = os.environ.get("NVBIO_TPU_CACHE")
    if d == "0":
        return
    if not d:
        d = os.path.expanduser("~/.cache/nvbio_tpu/xla")
    try:
        os.makedirs(d, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax or read-only fs: run uncached
