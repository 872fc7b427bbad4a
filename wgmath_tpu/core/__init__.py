"""Core runtime: kernel-module registry, dispatch helpers, profiling, views.

Capability parity with the reference's ``wgcore`` crate
(/root/reference/crates/wgcore/src): the WGSL shader-composition framework
(Shader trait shader.rs:65, derive macro, composer.rs) becomes a Python
kernel-module registry; GpuTensor/views (tensor.rs:192,416) become jax.Array +
strided View helpers; KernelDispatch (kernel.rs:51) becomes grid-math helpers +
jit; GpuTimestamps (timestamps.rs:9) becomes PhaseTimer/RunStats.
"""

from wgmath_tpu.core.module import (  # noqa: F401
    KernelModule,
    register_module,
    get_module,
    compose,
    flat_source,
    compile_check,
    all_modules,
)
from wgmath_tpu.core.dispatch import (  # noqa: F401
    cdiv,
    round_up,
    next_power_of_two,
    capacity_bucket,
    on_tpu,
    pallas_interpret,
)
from wgmath_tpu.core.profiling import RunStats, PhaseTimer  # noqa: F401
from wgmath_tpu.core.tensor import View, view_of  # noqa: F401
