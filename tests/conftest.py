"""Test configuration.

Tests run on CPU with an 8-device virtual mesh so every sharding code
path (SURVEY.md §5.8) executes in CI without TPU hardware.  Must set the
env vars before the first `import jax` anywhere in the process.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # override axon: tests run on CPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the environment's sitecustomize force-selects the axon TPU platform
# even over JAX_PLATFORMS; override it after import
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    A full-suite run accumulates hundreds of XLA:CPU executables; with
    that state resident, compiling the wide-band traceback walk
    (alignment/wide.py pass 2) segfaulted inside XLA's
    backend_compile_and_load (reproduced in rounds 2 and 3).  Clearing
    the in-memory compilation caches between modules keeps the process
    state bounded; within-module caching (where shapes repeat) is
    unaffected."""
    yield
    jax.clear_caches()
