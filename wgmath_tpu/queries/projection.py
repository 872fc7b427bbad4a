"""Point projection onto shapes (≙ wgparry queries/projection.rs:31-57
GpuProjectionResult + per-shape projectLocalPoint / projectLocalPointOnBoundary
in ball.wgsl/cuboid.wgsl/capsule.wgsl/segment.wgsl/triangle.wgsl).

Two flavors per the reference contract:
- ``project_point``: closest point of the *solid* shape (inside → the point
  itself, is_inside=True);
- ``project_point_on_boundary``: closest boundary point even from inside.
All functions are batched, local-space; ``project`` dispatches world-space
points over the tagged union.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import tree_util

from wgmath_tpu.core.module import EntryPoint, KernelModule, register_module
from wgmath_tpu.geometry import sim as sim_ops
from wgmath_tpu.geometry.sim import Sim
from wgmath_tpu.shapes import shape as shp


@tree_util.register_pytree_node_class
@dataclasses.dataclass
class Projection:
    """≙ GpuProjectionResult {point, is_inside}."""

    point: jax.Array
    is_inside: jax.Array

    def tree_flatten(self):
        return (self.point, self.is_inside), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _norm(v):
    return jnp.linalg.norm(v, axis=-1)


def _unit(v, fallback_axis=0):
    n = _norm(v)[..., None]
    fb = jnp.zeros_like(v).at[..., fallback_axis].set(1.0)
    return jnp.where(n > 1e-9, v / jnp.maximum(n, 1e-30), fb)


def project_ball(pt, radius, *, boundary: bool):
    d = _norm(pt)
    inside = d <= radius
    on_sphere = _unit(pt) * radius
    point = on_sphere if boundary else jnp.where(inside[..., None], pt, on_sphere)
    return Projection(point, inside)


def project_cuboid(pt, half_extents, *, boundary: bool):
    clamped = jnp.clip(pt, -half_extents, half_extents)
    inside = jnp.all(jnp.abs(pt) <= half_extents, axis=-1)
    if not boundary:
        return Projection(jnp.where(inside[..., None], pt, clamped), inside)
    # inside → project to nearest face
    gap = half_extents - jnp.abs(pt)
    axis = jnp.argmin(gap, axis=-1)
    sign = jnp.where(jnp.take_along_axis(pt, axis[..., None], -1) >= 0.0, 1.0, -1.0)
    he_ax = jnp.take_along_axis(jnp.broadcast_to(half_extents, pt.shape),
                                axis[..., None], -1)
    face_pt = jnp.put_along_axis(pt, axis[..., None], sign * he_ax, axis=-1,
                                 inplace=False)
    return Projection(jnp.where(inside[..., None], face_pt, clamped), inside)


def project_segment(pt, a, b):
    ab = b - a
    t = jnp.clip(jnp.sum((pt - a) * ab, axis=-1)
                 / jnp.maximum(jnp.sum(ab * ab, axis=-1), 1e-30), 0.0, 1.0)
    proj = a + t[..., None] * ab
    return Projection(proj, jnp.zeros(pt.shape[:-1], bool))


def project_capsule(pt, half_height, radius, *, boundary: bool):
    y = jnp.clip(pt[..., 1], -half_height, half_height)
    seg_pt = jnp.zeros_like(pt).at[..., 1].set(y)
    d = pt - seg_pt
    dist = _norm(d)
    inside = dist <= radius
    on_surface = seg_pt + _unit(d) * radius
    point = (on_surface if boundary
             else jnp.where(inside[..., None], pt, on_surface))
    return Projection(point, inside)


def project_triangle(pt, va, vb, vc):
    """Closest point on a 3D triangle (Ericson's region method, branch-free)."""
    ab = vb - va
    ac = vc - va
    ap = pt - va
    d1 = jnp.sum(ab * ap, axis=-1)
    d2 = jnp.sum(ac * ap, axis=-1)
    bp = pt - vb
    d3 = jnp.sum(ab * bp, axis=-1)
    d4 = jnp.sum(ac * bp, axis=-1)
    cp = pt - vc
    d5 = jnp.sum(ab * cp, axis=-1)
    d6 = jnp.sum(ac * cp, axis=-1)

    va_r = d3 * d6 - d5 * d4
    vb_r = d5 * d2 - d1 * d6
    vc_r = d1 * d4 - d3 * d2

    # interior barycentric
    denom = jnp.maximum(va_r + vb_r + vc_r, 1e-30)
    v = vb_r / denom
    w = vc_r / denom
    p_face = va + ab * v[..., None] + ac * w[..., None]

    # edge/vertex regions
    t_ab = jnp.clip(d1 / jnp.maximum(d1 - d3, 1e-30), 0.0, 1.0)
    p_ab = va + ab * t_ab[..., None]
    t_ac = jnp.clip(d2 / jnp.maximum(d2 - d6, 1e-30), 0.0, 1.0)
    p_ac = va + ac * t_ac[..., None]
    t_bc = jnp.clip((d4 - d3) / jnp.maximum((d4 - d3) + (d5 - d6), 1e-30), 0.0, 1.0)
    p_bc = vb + (vc - vb) * t_bc[..., None]

    in_vert_a = (d1 <= 0) & (d2 <= 0)
    in_vert_b = (d3 >= 0) & (d4 <= d3)
    in_vert_c = (d6 >= 0) & (d5 <= d6)
    in_edge_ab = (vc_r <= 0) & (d1 >= 0) & (d3 <= 0)
    in_edge_ac = (vb_r <= 0) & (d2 >= 0) & (d6 <= 0)
    in_edge_bc = (va_r <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)

    point = p_face
    point = jnp.where(in_edge_bc[..., None], p_bc, point)
    point = jnp.where(in_edge_ac[..., None], p_ac, point)
    point = jnp.where(in_edge_ab[..., None], p_ab, point)
    point = jnp.where(in_vert_c[..., None], vc, point)
    point = jnp.where(in_vert_b[..., None], vb, point)
    point = jnp.where(in_vert_a[..., None], va, point)
    return Projection(point, jnp.zeros(pt.shape[:-1], bool))


def project(shapes: shp.ShapeSet, poses: Sim, points: jax.Array,
            *, boundary: bool = False) -> Projection:
    """World-space projection of point i onto collider i (masked dispatch,
    ≙ shape.wgsl projectPoint/projectPointOnBoundary switch)."""
    p_loc = sim_ops.inv_mul_pt(poses, points)
    par = shapes.params
    tag = shapes.tag
    dim = points.shape[-1]

    res_pt = p_loc
    res_in = jnp.zeros(points.shape[:-1], bool)

    pb = project_ball(p_loc, par[:, 0], boundary=boundary)
    res_pt = jnp.where((tag == shp.BALL)[..., None], pb.point, res_pt)
    res_in = jnp.where(tag == shp.BALL, pb.is_inside, res_in)

    pc = project_cuboid(p_loc, par[:, :dim], boundary=boundary)
    res_pt = jnp.where((tag == shp.CUBOID)[..., None], pc.point, res_pt)
    res_in = jnp.where(tag == shp.CUBOID, pc.is_inside, res_in)

    if dim == 3:
        pcap = project_capsule(p_loc, par[:, 0], par[:, 1], boundary=boundary)
        res_pt = jnp.where((tag == shp.CAPSULE)[..., None], pcap.point, res_pt)
        res_in = jnp.where(tag == shp.CAPSULE, pcap.is_inside, res_in)

    return Projection(sim_ops.mul_pt(poses, res_pt), res_in)


register_module(
    KernelModule(
        "queries.projection",
        deps=("geometry.sim",),
        provides={
            "project_ball": project_ball,
            "project_cuboid": project_cuboid,
            "project_segment": project_segment,
            "project_capsule": project_capsule,
            "project_triangle": project_triangle,
            "project": project,
        },
        entries={
            "project_balls": EntryPoint(
                fn=lambda p: project_ball(p, jnp.float32(1.0), boundary=False),
                example_args=lambda: (jnp.ones((512, 3), jnp.float32),),
            )
        },
        doc="Point projection queries (≙ wgparry queries/projection).",
    )
)
