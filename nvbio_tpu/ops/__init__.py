"""Pallas TPU kernels for the hot compute paths.

These back the alignment DP (``banded_dp``) and FM-index rank/search
(``fm_rank``) stages; each has an oracle-checked XLA twin in the parent
packages and runs under ``interpret=True`` on CPU for CI.
"""

from .banded_dp import banded_score_pallas  # noqa: F401
