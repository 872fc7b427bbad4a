"""Prefix sums + key/value sort (≙ wgrapier dynamics/prefix_sum.rs:25-172 —
multi-level workgroup scan — and wgparry utils/radix_sort/mod.rs:84-477 —
4-bit-digit radix sort with GPU-side indirect dispatches).

On TPU both are single XLA ops: ``cumsum`` lowers to a log-depth scan across
lanes/sublanes and ``lax.sort`` is a bitonic/merge network tuned by the
compiler. The reference's stage pyramid (``PrefixSumWorkspace``) and
ping-pong digit passes exist purely to emulate what the compiler provides
here, so these wrappers keep the API surface + the CPU oracle used by the
reference's tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from wgmath_tpu.core.module import EntryPoint, KernelModule, register_module


def prefix_sum(x: jax.Array) -> jax.Array:
    """Inclusive scan (≙ WgPrefixSum::dispatch)."""
    return jnp.cumsum(x, axis=-1)


def prefix_sum_exclusive(x: jax.Array) -> jax.Array:
    """Exclusive scan — 0-prepended variant (≙ dispatch_exclusive)."""
    inc = jnp.cumsum(x, axis=-1)
    return jnp.concatenate([jnp.zeros_like(inc[..., :1]), inc[..., :-1]],
                           axis=-1)


def prefix_sum_cpu(x: np.ndarray) -> np.ndarray:
    """NumPy oracle (≙ WgPrefixSum::eval_cpu)."""
    return np.cumsum(np.asarray(x), axis=-1)


def radix_sort(keys: jax.Array, values: jax.Array):
    """Stable key/value sort for u32/i32 keys (≙ RadixSort::dispatch; used
    for morton codes)."""
    return jax.lax.sort_key_val(keys, values)


def argsort_u32(keys: jax.Array) -> jax.Array:
    return jnp.argsort(keys).astype(jnp.int32)


register_module(
    KernelModule(
        "utils.scan_sort",
        provides={
            "prefix_sum": prefix_sum,
            "prefix_sum_exclusive": prefix_sum_exclusive,
            "radix_sort": radix_sort,
            "argsort_u32": argsort_u32,
        },
        entries={
            "prefix_sum": EntryPoint(
                fn=prefix_sum,
                example_args=lambda: (jnp.ones((4096,), jnp.int32),),
            ),
            "radix_sort": EntryPoint(
                fn=radix_sort,
                example_args=lambda: (jnp.ones((4096,), jnp.uint32),
                                      jnp.ones((4096,), jnp.int32)),
            ),
        },
        doc="Scan + sort primitives (≙ WgPrefixSum, RadixSort).",
    )
)
