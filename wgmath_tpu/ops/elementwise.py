"""Elementwise op-assign family (≙ wgebra OpAssign, linalg/op_assign.rs:15-68).

The reference ships one WGSL kernel with a placeholder function that naga_oil's
IR-level ``Redirector::redirect_function`` substitutes per variant
(Add/Sub/Mul/Div/Copy). The TPU-native equivalent of "function redirection"
is a higher-order jitted kernel: :func:`op_assign` takes either a named
variant or *any* binary Python callable, which traces straight into the same
fused XLA program. Elementwise chains fuse into neighbors automatically, so
no Pallas kernel is warranted here (XLA emits optimal VPU code); a Pallas
variant exists for demonstration/benchmark of the composition layer.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wgmath_tpu.core.dispatch import pallas_interpret
from wgmath_tpu.core.module import EntryPoint, KernelModule, register_module

VARIANTS: dict[str, Callable] = {
    "add": lambda a, b: a + b,
    "sub": lambda a, b: a - b,
    "mul": lambda a, b: a * b,
    "div": lambda a, b: a / b,
    "copy": lambda a, b: b,
}


@functools.partial(jax.jit, static_argnames=("op",))
def op_assign(a: jax.Array, b: jax.Array, op="add") -> jax.Array:
    """Return ``a <op>= b`` (functional: a new array).

    ``op`` is a variant name or any binary callable (the redirect mechanism).
    """
    fn = VARIANTS[op] if isinstance(op, str) else op
    return fn(a, b)


def op_assign_pallas(a: jax.Array, b: jax.Array, op="add") -> jax.Array:
    """Single-kernel Pallas variant (composition-layer demo/benchmark)."""
    fn = VARIANTS[op] if isinstance(op, str) else op
    flat_a = a.reshape(-1)
    flat_b = b.reshape(-1)

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = fn(a_ref[:], b_ref[:])

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(flat_a.shape, a.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=pallas_interpret(),
    )(flat_a, flat_b)
    return out.reshape(a.shape)


register_module(
    KernelModule(
        "linalg.op_assign",
        provides={"op_assign": op_assign, **VARIANTS},
        entries={
            name: EntryPoint(
                fn=functools.partial(op_assign, op=name),
                example_args=lambda: (
                    jnp.zeros((128, 128), jnp.float32),
                    jnp.ones((128, 128), jnp.float32),
                ),
            )
            for name in VARIANTS
        },
        doc="Elementwise a ?= b family with callable redirection "
            "(≙ wgebra linalg/op_assign.rs).",
    )
)
