"""Geometric queries (≙ wgparry/src/queries)."""

from wgmath_tpu.queries.narrow_phase import narrow_phase, ball_ball, ball_cuboid  # noqa: F401
