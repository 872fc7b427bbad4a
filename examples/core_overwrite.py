"""Registry path override (≙ wgcore examples/overwrite.rs:55-80).

The reference swaps a dependency module's WGSL source on disk
(`Composable::set_wgsl_path`) and recompiles the dependent kernel; the TPU
analog replaces a registered KernelModule in the registry
(``register_module(..., allow_replace=True)``) and re-composes — dependents
pick up the overwritten implementation on their next trace, no framework
changes needed.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

# the axon sitecustomize forces jax_platforms="axon,cpu"; the config update
# (not the env var) is what actually keeps this demo off the shared TPU
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from wgmath_tpu.core.module import (
    EntryPoint,
    KernelModule,
    compose,
    register_module,
)

# --- the dependency (≙ composable.wgsl's `shared_function`) ----------------
register_module(KernelModule(
    "examples.composable",
    deps=(),
    provides={"shared_value": lambda a: a * 10.0},
    doc="original dependency (composable.wgsl analog)",
))

# --- the dependent kernel (≙ overwrite.wgsl's main kernel) ------------------


def kernel(a, b):
    shared = compose("examples.composable")["shared_value"]
    return shared(a) + b


register_module(KernelModule(
    "examples.overwrite_kernel",
    deps=("examples.composable",),
    provides={"kernel": kernel},
    entries={"kernel": EntryPoint(
        fn=kernel,
        example_args=lambda: (jnp.ones((4,)), jnp.ones((4,))))},
    doc="overwrite.rs parity example",
))

a = jnp.arange(4, dtype=jnp.float32)
b = a * 100.0

before = kernel(a, b)
print("Result before overwrite:", list(map(float, before)))

# --- overwrite the dependency in place (≙ set_wgsl_path + recompile) --------
register_module(KernelModule(
    "examples.composable",
    deps=(),
    provides={"shared_value": lambda a: a * 1000.0},
    doc="overwritten dependency (overwritten_dependency.wgsl analog)",
), allow_replace=True)

after = kernel(a, b)
print("Result after overwrite: ", list(map(float, after)))
assert list(map(float, after)) != list(map(float, before))
print("dependency override propagated through composition")
