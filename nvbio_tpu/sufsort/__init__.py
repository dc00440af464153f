"""Suffix-array / BWT construction.

Covers the reference's ``nvbio/sufsort/`` capability (ref: sufsort.h —
``cuda::suffix_sort``, ``cuda::bwt``, ``blockwise_suffix_sort``; the
module behind nvBWT and arXiv:1410.0562).  The host path here is a
vectorized NumPy prefix-doubling sort (the moral analog of the
reference's ``PrefixDoublingSufSort``); a device (JAX ``lax.sort``)
path and the blockwise difference-cover design for >RAM references are
staged in ``blockwise.py``.
"""

from .sa import suffix_array, bwt_from_sa  # noqa: F401
