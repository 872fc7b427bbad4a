"""Geometric types + small-matrix decompositions (≙ wgebra/geometry)."""

from wgmath_tpu.geometry import quat, rot2  # noqa: F401
from wgmath_tpu.geometry.sim import Sim  # noqa: F401
from wgmath_tpu.geometry import sim  # noqa: F401
from wgmath_tpu.geometry.inv import inv, inv2, inv3, inv4, det2, det3, det4  # noqa: F401
from wgmath_tpu.geometry.decomp import (  # noqa: F401
    cholesky,
    cholesky_solve,
    lu,
    lu_solve,
    lu_unpack,
    qr,
    svd,
    symmetric_eigen,
)
from wgmath_tpu.geometry.utils import stable_atan2, stable_atanh  # noqa: F401
