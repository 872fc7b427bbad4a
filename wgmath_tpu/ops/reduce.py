"""Vector reductions (≙ wgebra Reduce, linalg/reduce.rs:16-97 + reduce.wgsl).

The reference runs a single-workgroup shared-memory tree reduction with three
redirected placeholder functions (init / workspace update / pairwise reduce)
for Min/Max/Sum/Prod/SqNorm. On TPU the same capability is a jitted reduction
(XLA emits the optimal multi-pass VPU tree) plus a Pallas kernel that keeps a
VMEM accumulator across a 1-D grid — the analog of the shared-memory
``workspace``. ``eval_cpu`` mirrors the reference's CPU oracle
(reduce.rs `eval_cpu`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wgmath_tpu.core.dispatch import cdiv, on_tpu, pallas_interpret
from wgmath_tpu.core.module import EntryPoint, KernelModule, register_module

# op name → (elementwise pre-map, pairwise combine, identity)
_OPS = {
    "sum": (lambda x: x, jnp.add, 0.0),
    "prod": (lambda x: x, jnp.multiply, 1.0),
    "min": (lambda x: x, jnp.minimum, np.inf),
    "max": (lambda x: x, jnp.maximum, -np.inf),
    "sqnorm": (lambda x: x * x, jnp.add, 0.0),
}


@functools.partial(jax.jit, static_argnames=("op", "impl"))
def reduce(x: jax.Array, op: str = "sum", *, impl: str = "auto") -> jax.Array:
    """Full reduction of ``x`` to a scalar under ``op``."""
    pre, combine, _ = _OPS[op]
    if impl == "pallas" or (impl == "auto" and on_tpu() and x.ndim == 1
                            and x.size % 1024 == 0 and x.size >= 8192):
        return _reduce_pallas(x, op)
    y = pre(x)
    return {
        "sum": jnp.sum, "prod": jnp.prod, "min": jnp.min, "max": jnp.max,
        "sqnorm": jnp.sum,
    }[op](y)


def _reduce_pallas(x: jax.Array, op: str) -> jax.Array:
    pre, combine, ident = _OPS[op]
    n = x.size
    block = 1024
    grid = (cdiv(n, block),)
    x2 = x.reshape(-1, 128)  # lanes on the trailing axis
    rows = block // 128

    def kernel(x_ref, o_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[0, 0] = jnp.float32(ident)

        part = {
            "sum": jnp.sum, "prod": jnp.prod, "min": jnp.min, "max": jnp.max,
            "sqnorm": jnp.sum,
        }[op](pre(x_ref[:]))
        acc_ref[0, 0] = combine(acc_ref[0, 0], part)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            o_ref[0, 0] = acc_ref[0, 0].astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((rows, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), x.dtype),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32)],
        interpret=pallas_interpret(),
    )(x2)
    return out[0, 0]


def eval_cpu(x: np.ndarray, op: str):
    """NumPy oracle (≙ Reduce::eval_cpu)."""
    x = np.asarray(x)
    return {
        "sum": np.sum(x), "prod": np.prod(x), "min": np.min(x),
        "max": np.max(x), "sqnorm": np.sum(x * x),
    }[op]


register_module(
    KernelModule(
        "linalg.reduce",
        provides={"reduce": reduce},
        entries={
            name: EntryPoint(
                fn=functools.partial(reduce, op=name),
                example_args=lambda: (jnp.ones((8192,), jnp.float32),),
            )
            for name in _OPS
        },
        doc="Scalar reductions min/max/sum/prod/sqnorm (≙ wgebra linalg/reduce.rs).",
    )
)
