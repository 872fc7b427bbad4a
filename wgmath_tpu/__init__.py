"""wgmath_tpu — a TPU-native scientific-computing & rigid-body-physics framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the wgmath stack
(wgcore / wgebra / wgparry / wgrapier — see /root/reference), re-designed for TPU:

- ``core``        — kernel-module registry, dispatch helpers, profiling, config
                    (capability parity with wgcore's Shader trait / derive macro /
                    KernelDispatch / GpuTensor / GpuTimestamps).
- ``ops``         — dense batched linear algebra: MXU-tiled GEMM/GEMV, elementwise
                    op-assign family, reductions (parity with wgebra/linalg).
- ``geometry``    — quaternions, 2D rotations, similarity transforms, small-matrix
                    LU/QR/Cholesky/SVD/Eigen/inverse (parity with wgebra/geometry).
- ``shapes``      — shape tagged-union as structure-of-arrays (parity with
                    wgparry/shapes).
- ``queries``     — ray casts, point projection, GJK/EPA, SAT, contact manifolds
                    (parity with wgparry/queries).
- ``broad_phase`` — AABBs, brute-force and LBVH broad phases, morton codes, sort
                    (parity with wgparry/broad_phase + utils/radix_sort).
- ``dynamics``    — bodies, mass properties, constraints, TGS-soft / Jacobi solvers,
                    graph coloring, warmstarting, impulse joints, prefix sums
                    (parity with wgrapier/dynamics).
- ``pipeline``    — the full physics step as one jitted program (parity with
                    wgrapier/pipeline.rs).
- ``parallel``    — multi-chip scale-out via shard_map over an ICI mesh (additive;
                    the reference is single-device).
- ``scenes``      — demo scene builders (parity with wgrapier examples2d/3d).
- ``testbed``     — CLI runner + CPU oracle backend (parity with src_testbed).
"""

__version__ = "0.1.0"

from wgmath_tpu.core import module as module  # noqa: F401
from wgmath_tpu.core.module import KernelModule, register_module, get_module  # noqa: F401
