"""Demo scene builders (≙ wgrapier examples2d/3d scene suite:
balls, boxes, boxes_and_balls, pyramid, many_pyramids, primitives —
all_examples3.rs:41-66, pyramid3.rs:36-76).

Each builder returns a ``PhysicsState`` ready for ``pipeline.step``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from wgmath_tpu.dynamics import (
    Bodies,
    Velocity,
    ball_local_mprops,
    cuboid_local_mprops,
)
from wgmath_tpu.dynamics.body import LocalMassProperties
from wgmath_tpu.geometry import sim as sim_ops
from wgmath_tpu.pipeline import PhysicsState, new_state
from wgmath_tpu.shapes import ShapeSet


def _merge_mprops(*mp: LocalMassProperties) -> LocalMassProperties:
    fields = {}
    for f in ("inv_mass", "com", "inertia_ref_frame", "inv_principal_inertia"):
        vals = [getattr(m, f) for m in mp]
        fields[f] = None if vals[0] is None else jnp.concatenate(vals)
    return LocalMassProperties(**fields)


def _with_ground(shapes, translations, mprops, dim=3,
                 ground_he=(100.0, 1.0, 100.0)):
    ground_he = jnp.asarray([ground_he[:dim]], jnp.float32)
    all_shapes = ShapeSet.concat(ShapeSet.cuboids(ground_he), shapes)
    g_trans = jnp.zeros((1, dim), jnp.float32).at[0, 1].set(-float(ground_he[0, 1]))
    trans = jnp.concatenate([g_trans, translations])
    n = trans.shape[0]
    if dim == 3:
        rot = jnp.tile(jnp.asarray([0.0, 0, 0, 1]), (n, 1))
    else:
        rot = jnp.tile(jnp.asarray([1.0, 0.0]), (n, 1))
    poses = sim_ops.from_parts(rot, trans)
    mp = _merge_mprops(
        cuboid_local_mprops(ground_he, dynamic=jnp.asarray([False])), mprops)
    bodies = Bodies(poses, Velocity.zero(n, dim), mp)
    return new_state(bodies, all_shapes)


def balls(n: int = 1000, *, radius: float = 0.5, dim: int = 3,
          seed: int = 0) -> PhysicsState:
    """Grid of falling balls over a ground slab (≙ examples balls3.rs).

    Bodies are laid out in a loose cubic lattice with deterministic jitter so
    the pile settles with many simultaneous contacts.
    """
    rng = np.random.default_rng(seed)
    side = int(np.ceil(n ** (1.0 / dim)))
    coords = np.stack(np.meshgrid(*([np.arange(side)] * dim),
                                  indexing="ij"), -1).reshape(-1, dim)[:n]
    spacing = 2.0 * radius * 1.05
    pos = coords.astype(np.float32) * spacing
    pos -= pos.mean(0, keepdims=True) * np.asarray([1.0, 0.0] + [1.0] * (dim - 2))
    pos[:, 1] += 2.0 * radius
    pos += rng.uniform(-0.05, 0.05, pos.shape).astype(np.float32) * radius
    shapes = ShapeSet.balls(jnp.full((n,), radius), dim=dim)
    mp = ball_local_mprops(jnp.full((n,), radius), dim=dim)
    return _with_ground(shapes, jnp.asarray(pos), mp, dim=dim)


def boxes(n: int = 1000, *, half_extent: float = 0.5, dim: int = 3,
          seed: int = 0) -> PhysicsState:
    """Grid of falling cuboids (≙ examples boxes3.rs)."""
    rng = np.random.default_rng(seed)
    side = int(np.ceil(n ** (1.0 / dim)))
    coords = np.stack(np.meshgrid(*([np.arange(side)] * dim),
                                  indexing="ij"), -1).reshape(-1, dim)[:n]
    spacing = 2.0 * half_extent * 1.1
    pos = coords.astype(np.float32) * spacing
    pos -= pos.mean(0, keepdims=True) * np.asarray([1.0, 0.0] + [1.0] * (dim - 2))
    pos[:, 1] += 2.0 * half_extent
    pos += rng.uniform(-0.02, 0.02, pos.shape).astype(np.float32)
    he = jnp.full((n, dim), half_extent)
    shapes = ShapeSet.cuboids(he)
    mp = cuboid_local_mprops(he)
    return _with_ground(shapes, jnp.asarray(pos), mp, dim=dim)


def pyramid(levels: int = 20, *, half_extent: float = 0.5,
            use_balls: bool = False) -> PhysicsState:
    """Square pyramid of cuboids (≙ pyramid3.rs:36-76; 50 levels ≈ 42.9k
    bodies is the reference's stress demo)."""
    he = half_extent
    spacing = 2.0 * he * 1.02
    pos = []
    for lvl in range(levels):
        width = levels - lvl
        for i in range(width):
            for j in range(width):
                pos.append([
                    (i - width / 2.0 + 0.5) * spacing,
                    he + lvl * 2.0 * he * 1.01,
                    (j - width / 2.0 + 0.5) * spacing,
                ])
    pos = np.asarray(pos, np.float32)
    n = len(pos)
    if use_balls:
        shapes = ShapeSet.balls(jnp.full((n,), he))
        mp = ball_local_mprops(jnp.full((n,), he))
    else:
        he_arr = jnp.full((n, 3), he)
        shapes = ShapeSet.cuboids(he_arr)
        mp = cuboid_local_mprops(he_arr)
    return _with_ground(shapes, jnp.asarray(pos), mp)


def pyramid_levels_for_bodies(target: int) -> int:
    """Smallest level count whose pyramid has >= target bodies."""
    for lv in range(1, 80):
        if sum((lv - k) ** 2 for k in range(lv)) >= target:
            return lv
    return 80


SCENES = {
    "balls3": lambda: balls(1000, dim=3),
    "boxes3": lambda: boxes(1000, dim=3),
    "pyramid3": lambda: pyramid(20),
    "ball_pyramid3": lambda: pyramid(20, use_balls=True),
    "balls10k": lambda: balls(10_000, dim=3),
}
