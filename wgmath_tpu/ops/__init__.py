"""Dense batched linear algebra (≙ wgebra/linalg).

GEMM/GEMV are MXU-tiled Pallas kernels; elementwise and reductions lean on
XLA's fusion with Pallas variants where a single-kernel form matters.
"""

from wgmath_tpu.ops.gemm import gemm, gemm_xla  # noqa: F401
from wgmath_tpu.ops.gemv import gemv, gemv_xla  # noqa: F401
from wgmath_tpu.ops.elementwise import op_assign, op_assign_pallas, VARIANTS  # noqa: F401
from wgmath_tpu.ops.reduce import reduce, eval_cpu  # noqa: F401
