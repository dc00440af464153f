"""100 Mbp bucketed device suffix sort vs host SA-IS (VERDICT r3 #3)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from nvbio_tpu.utils.jax_cache import enable_compilation_cache
enable_compilation_cache()
import jax
assert jax.default_backend() == "tpu"

from nvbio_tpu.sufsort import suffix_array, suffix_array_bucketed
from nvbio_tpu.utils.simulate import repeat_structured_genome

N = 100_000_000
t0 = time.time()
text = repeat_structured_genome(N, seed=11)[0]
print(f"genome {N/1e6:.0f} Mbp in {time.time()-t0:.1f}s", file=sys.stderr)

t0 = time.time()
sa_host = suffix_array(text)
t_host = time.time() - t0
print(f"host SA-IS: {t_host:.1f}s", file=sys.stderr)

t0 = time.time()
sa_dev = suffix_array_bucketed(text, verbose=True)
t_dev = time.time() - t0
print(f"device bucketed: {t_dev:.1f}s", file=sys.stderr)

np.testing.assert_array_equal(sa_dev, sa_host)
print(f"OK 100 Mbp bit-identical; host {t_host:.1f}s device {t_dev:.1f}s",
      file=sys.stderr)
