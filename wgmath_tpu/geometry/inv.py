"""Batched closed-form inverses for 2×2/3×3/4×4 matrices (≙ wgebra WgInv,
geometry/inv.rs:4 + inv.wgsl inv2/inv3/inv4).

Fully vectorized over leading batch axes — a million tiny inverses run as a
handful of fused VPU ops rather than per-thread scalar code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from wgmath_tpu.core.module import EntryPoint, KernelModule, register_module


def det2(m: jax.Array) -> jax.Array:
    return m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]


def inv2(m: jax.Array) -> jax.Array:
    d = det2(m)[..., None, None]
    adj = jnp.stack(
        [
            jnp.stack([m[..., 1, 1], -m[..., 0, 1]], axis=-1),
            jnp.stack([-m[..., 1, 0], m[..., 0, 0]], axis=-1),
        ],
        axis=-2,
    )
    return adj / d


def det3(m: jax.Array) -> jax.Array:
    return (
        m[..., 0, 0] * (m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1])
        - m[..., 0, 1] * (m[..., 1, 0] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 0])
        + m[..., 0, 2] * (m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0])
    )


def inv3(m: jax.Array) -> jax.Array:
    # adjugate: cofactor(j, i) / det
    c = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(3):
            r = [k for k in range(3) if k != i]
            s = [k for k in range(3) if k != j]
            minor = (m[..., r[0], s[0]] * m[..., r[1], s[1]]
                     - m[..., r[0], s[1]] * m[..., r[1], s[0]])
            c[j][i] = ((-1.0) ** (i + j)) * minor
    adj = jnp.stack([jnp.stack(row, axis=-1) for row in c], axis=-2)
    return adj / det3(m)[..., None, None]


def det4(m: jax.Array) -> jax.Array:
    def minor(r0, r1, c0, c1):
        return m[..., r0, c0] * m[..., r1, c1] - m[..., r0, c1] * m[..., r1, c0]

    s0 = minor(0, 1, 0, 1); s1 = minor(0, 1, 0, 2); s2 = minor(0, 1, 0, 3)
    s3 = minor(0, 1, 1, 2); s4 = minor(0, 1, 1, 3); s5 = minor(0, 1, 2, 3)
    c5 = minor(2, 3, 2, 3); c4 = minor(2, 3, 1, 3); c3 = minor(2, 3, 1, 2)
    c2 = minor(2, 3, 0, 3); c1 = minor(2, 3, 0, 2); c0 = minor(2, 3, 0, 1)
    return s0 * c5 - s1 * c4 + s2 * c3 + s3 * c2 - s4 * c1 + s5 * c0


def inv4(m: jax.Array) -> jax.Array:
    """Cramer's rule with cached 2×2 minors — one fused VPU expression."""
    m = jnp.asarray(m)

    def minor(r0, r1, c0, c1):
        return m[..., r0, c0] * m[..., r1, c1] - m[..., r0, c1] * m[..., r1, c0]

    s0 = minor(0, 1, 0, 1); s1 = minor(0, 1, 0, 2); s2 = minor(0, 1, 0, 3)
    s3 = minor(0, 1, 1, 2); s4 = minor(0, 1, 1, 3); s5 = minor(0, 1, 2, 3)
    c5 = minor(2, 3, 2, 3); c4 = minor(2, 3, 1, 3); c3 = minor(2, 3, 1, 2)
    c2 = minor(2, 3, 0, 3); c1 = minor(2, 3, 0, 2); c0 = minor(2, 3, 0, 1)
    det = s0 * c5 - s1 * c4 + s2 * c3 + s3 * c2 - s4 * c1 + s5 * c0
    inv_det = 1.0 / det

    a = m
    out = jnp.stack([
        jnp.stack([a[..., 1, 1] * c5 - a[..., 1, 2] * c4 + a[..., 1, 3] * c3,
                   -a[..., 0, 1] * c5 + a[..., 0, 2] * c4 - a[..., 0, 3] * c3,
                   a[..., 3, 1] * s5 - a[..., 3, 2] * s4 + a[..., 3, 3] * s3,
                   -a[..., 2, 1] * s5 + a[..., 2, 2] * s4 - a[..., 2, 3] * s3], axis=-1),
        jnp.stack([-a[..., 1, 0] * c5 + a[..., 1, 2] * c2 - a[..., 1, 3] * c1,
                   a[..., 0, 0] * c5 - a[..., 0, 2] * c2 + a[..., 0, 3] * c1,
                   -a[..., 3, 0] * s5 + a[..., 3, 2] * s2 - a[..., 3, 3] * s1,
                   a[..., 2, 0] * s5 - a[..., 2, 2] * s2 + a[..., 2, 3] * s1], axis=-1),
        jnp.stack([a[..., 1, 0] * c4 - a[..., 1, 1] * c2 + a[..., 1, 3] * c0,
                   -a[..., 0, 0] * c4 + a[..., 0, 1] * c2 - a[..., 0, 3] * c0,
                   a[..., 3, 0] * s4 - a[..., 3, 1] * s2 + a[..., 3, 3] * s0,
                   -a[..., 2, 0] * s4 + a[..., 2, 1] * s2 - a[..., 2, 3] * s0], axis=-1),
        jnp.stack([-a[..., 1, 0] * c3 + a[..., 1, 1] * c1 - a[..., 1, 2] * c0,
                   a[..., 0, 0] * c3 - a[..., 0, 1] * c1 + a[..., 0, 2] * c0,
                   -a[..., 3, 0] * s3 + a[..., 3, 1] * s1 - a[..., 3, 2] * s0,
                   a[..., 2, 0] * s3 - a[..., 2, 1] * s1 + a[..., 2, 2] * s0], axis=-1),
    ], axis=-2)
    return out * inv_det[..., None, None]


def inv(m: jax.Array) -> jax.Array:
    """Dispatch by static trailing dimension (2, 3 or 4)."""
    n = m.shape[-1]
    if m.shape[-2] != n:
        raise ValueError("inv expects square matrices")
    return {2: inv2, 3: inv3, 4: inv4}[n](m)


register_module(
    KernelModule(
        "geometry.inv",
        provides={"inv2": inv2, "inv3": inv3, "inv4": inv4, "inv": inv,
                  "det2": det2, "det3": det3},
        entries={
            f"inv{n}": EntryPoint(
                fn={2: inv2, 3: inv3, 4: inv4}[n],
                example_args=(lambda n=n: (jnp.eye(n)[None].repeat(64, 0),)),
            )
            for n in (2, 3, 4)
        },
        doc="Closed-form batched small-matrix inverses (≙ wgebra geometry/inv.wgsl).",
    )
)
