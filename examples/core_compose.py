"""Kernel-module composition (≙ wgcore examples/compose.rs:20-36).

Registers a module depending on the geometry stack, then materializes its
composed namespace and flattened source — the TPU analog of naga_oil
shader composition: the "source" is the jitted HLO, deps resolve by module
name, and the composed entry is a single fused XLA program.
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp

from wgmath_tpu.core.module import (
    KernelModule, EntryPoint, register_module, compose, dependency_order,
    flat_source, compile_check,
)
import wgmath_tpu.geometry.quat  # noqa: F401 — registers geometry.quat


def rotate_twice(q, v):
    from wgmath_tpu.geometry import quat
    return quat.mul_vec(q, quat.mul_vec(q, v))


register_module(KernelModule(
    "examples.rotate_twice",
    deps=("geometry.quat",),
    provides={"rotate_twice": rotate_twice},
    entries={"rotate_twice": EntryPoint(
        fn=rotate_twice,
        example_args=lambda: (jnp.asarray([[0.0, 0, 0, 1.0]]),
                              jnp.ones((1, 3))))},
    doc="compose.rs parity example",
))

print("dependency order:", dependency_order("examples.rotate_twice"))
ns = compose("examples.rotate_twice")
print("composed symbols:", sorted(ns)[:8])
print("compiled entries:", compile_check("examples.rotate_twice"))
print("flat source bytes:", len(flat_source("examples.rotate_twice")))
