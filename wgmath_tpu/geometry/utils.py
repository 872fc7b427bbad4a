"""Numeric utility device functions (≙ wgebra WgTrig utils/trig.rs:1-11 +
WgMinMax utils/min_max.rs).

The reference carries a numerically-stable atan2/atanh because Metal's
builtins misbehave; TPU's transcendentals are fine, but the stable forms are
kept as the module contract (and guard the x==y==0 pole the same way).
"""

from __future__ import annotations

import jax.numpy as jnp

from wgmath_tpu.core.module import KernelModule, register_module


def stable_atan2(y, x):
    """atan2 that returns 0 at the (0, 0) pole instead of NaN-prone forms."""
    both_zero = (jnp.abs(x) < 1e-38) & (jnp.abs(y) < 1e-38)
    return jnp.where(both_zero, 0.0, jnp.arctan2(y, jnp.where(both_zero, 1.0, x)))


def stable_atanh(x):
    x = jnp.clip(x, -1.0 + 1e-7, 1.0 - 1e-7)
    return 0.5 * jnp.log((1 + x) / (1 - x))


def vec_min(a, b):
    return jnp.minimum(a, b)


def vec_max(a, b):
    return jnp.maximum(a, b)


def component_min(v):
    return jnp.min(v, axis=-1)


def component_max(v):
    return jnp.max(v, axis=-1)


register_module(
    KernelModule(
        "geometry.utils",
        provides={
            "stable_atan2": stable_atan2,
            "stable_atanh": stable_atanh,
            "vec_min": vec_min,
            "vec_max": vec_max,
            "component_min": component_min,
            "component_max": component_max,
        },
        doc="Trig + min/max helpers (≙ wgebra utils/trig.rs, utils/min_max.rs).",
    )
)
