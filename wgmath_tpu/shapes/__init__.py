"""Collision shapes (≙ wgparry/src/shapes)."""

from wgmath_tpu.shapes.shape import (  # noqa: F401
    BALL,
    CAPSULE,
    CONE,
    CONVEX,
    CUBOID,
    CYLINDER,
    POLYLINE,
    SEGMENT,
    TRIANGLE,
    TRIMESH,
    ShapeSet,
    local_aabb_half_extents,
    world_aabbs,
)
