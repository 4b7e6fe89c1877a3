"""Hand-written TPU kernels (Pallas) for the hot ops.

Each kernel has a pure-XLA reference twin in the parent ``ops`` modules; the
dispatchers here pick the Pallas path on TPU and fall back to the reference
implementation elsewhere (tests run the Pallas kernels in interpret mode and
assert bit-equality against the twins).
"""

from .fast import fast_score_pallas  # noqa: F401
from .hamming import hamming_matrix_mxu  # noqa: F401
