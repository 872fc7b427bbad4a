"""Multi-chip scale-out: the physics step sharded over an ICI mesh.

Additive layer — the reference is single-device (SURVEY §2.5, §5: no
distributed backend exists in wgmath). TPU-native design per the
shard_map/collectives recipe:

- Mesh axis ``"b"`` shards *bodies* (and therefore broad-phase rows).
- Broad phase: each device tests its row block against all columns
  (all-gathered AABBs ride ICI once per step) — the O(n²) part scales
  linearly with device count.
- Narrow phase: local pairs → local contact manifolds, embarrassingly
  parallel.
- Solver (round 1): contacts are all-gathered and solved redundantly on every
  device (identical replicated compute, zero divergence). Velocity state is
  tiny next to pair work, so this already scales the dominant cost; sharding
  the color loop with per-color psum of velocity deltas is the planned next
  step (deltas within one color are independent, so a single psum per color
  preserves exact Gauss-Seidel semantics).
- Integration: sharded over bodies.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from wgmath_tpu.broad_phase.brute_force import find_pairs_partial
from wgmath_tpu.dynamics.body import Bodies, Velocity, update_mprops
from wgmath_tpu.dynamics.solver import solve
from wgmath_tpu.dynamics.sim_params import SimParams
from wgmath_tpu.geometry.sim import Sim
from wgmath_tpu.pipeline import PhysicsState, PipelineConfig
from wgmath_tpu.queries.narrow_phase import narrow_phase
from wgmath_tpu.shapes.shape import ShapeSet, world_aabbs

try:  # jax >= 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def body_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the body axis."""
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devices), axis_names=("b",))


def _gather_bodies(local: Bodies) -> Bodies:
    g = functools.partial(jax.lax.all_gather, axis_name="b", tiled=True)
    return jax.tree.map(g, local)


def make_sharded_step(mesh: Mesh, params: SimParams, config: PipelineConfig):
    """Build a jitted sharded step: Bodies sharded on axis 0, shapes
    replicated. Returns ``fn(bodies, shapes) -> (bodies, pair_count)``."""
    n_dev = mesh.devices.size
    cap_local = max(config.pair_capacity // n_dev, 64)

    def local_step(bodies_local: Bodies, shapes: ShapeSet):
        n_local = bodies_local.poses.translation.shape[0]
        idx = jax.lax.axis_index("b")
        row_offset = idx * n_local

        bodies = _gather_bodies(bodies_local)
        mprops = update_mprops(bodies.poses, bodies.local_mprops)
        mins, maxs = world_aabbs(shapes, bodies.poses,
                                 margin=params.prediction_distance)
        row_slice = lambda x: jax.lax.dynamic_slice_in_dim(x, row_offset, n_local)
        from wgmath_tpu.shapes.shape import BALL, ball_radii_or_nan

        radii = (ball_radii_or_nan(shapes, bodies.poses)
                 if BALL in shapes.kinds else None)
        pairs = find_pairs_partial(
            row_slice(mins), row_slice(maxs), row_offset, mins, maxs,
            capacity=cap_local, block=config.broad_phase_block,
            max_per_row=config.broad_phase_max_per_row,
            ball_radius=radii,
            row_ball_radius=None if radii is None else row_slice(radii),
            margin=params.prediction_distance)
        contacts_local = narrow_phase(bodies.poses, shapes, pairs,
                                      params.prediction_distance)
        # gather the full manifold list; solve with color windows split
        # across the mesh (per-color psum of velocity deltas — exact GS;
        # Jacobi stays replicated: it has no color windows to split)
        contacts = jax.tree.map(
            lambda x: (jax.lax.all_gather(x, "b", tiled=True)
                       if x.ndim >= 1 else x), contacts_local)
        poses, vels, _cons, _max_class, _colors, _cache = solve(
            bodies, mprops, contacts, params,
            use_jacobi=config.use_jacobi, max_colors=config.max_colors,
            max_per_body=config.max_per_body,
            shard=None if config.use_jacobi else ("b", n_dev))
        new_bodies = Bodies(poses, vels, bodies.local_mprops,
                            bodies.kinematic)
        out_local = jax.tree.map(
            lambda x: jax.lax.dynamic_slice_in_dim(x, row_offset, n_local),
            new_bodies)
        total_pairs = jax.lax.psum(pairs.count, "b")
        return out_local, total_pairs

    @jax.jit
    def stepped(bodies: Bodies, shapes: ShapeSet):
        body_spec = jax.tree.map(lambda _: P("b"), bodies)
        shape_spec = jax.tree.map(lambda _: P(), shapes)
        try:
            fn = shard_map(local_step, mesh=mesh,
                           in_specs=(body_spec, shape_spec),
                           out_specs=(body_spec, P()),
                           check_vma=False)
        except TypeError:  # older jax: the kwarg was named check_rep
            fn = shard_map(local_step, mesh=mesh,
                           in_specs=(body_spec, shape_spec),
                           out_specs=(body_spec, P()),
                           check_rep=False)
        return fn(bodies, shapes)

    return stepped


def shard_state(state: PhysicsState, mesh: Mesh) -> tuple[Bodies, ShapeSet]:
    """Place bodies sharded / shapes replicated on the mesh (pads the body
    count to a multiple of the device count — padded slots are static)."""
    from jax.sharding import NamedSharding

    n_dev = mesh.devices.size
    n = state.bodies.num_bodies
    pad = (-n) % n_dev

    def pad0(x):
        if pad == 0 or x.ndim == 0:
            return x
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))

    bodies = jax.tree.map(pad0, state.bodies)
    # padded slots: zero inv-mass (static), identity-ish rotation to stay sane
    if pad:
        rot = bodies.poses.rotation
        rot = rot.at[n:, -1].set(1.0)
        bodies = dataclasses.replace(
            bodies, poses=Sim(rot, bodies.poses.translation,
                              bodies.poses.scale.at[n:].set(1.0)))
    bodies = jax.device_put(
        bodies, jax.tree.map(lambda _: NamedSharding(mesh, P("b")), bodies))
    shapes = jax.tree.map(pad0, state.shapes)
    shapes = jax.device_put(
        shapes, jax.tree.map(lambda _: NamedSharding(mesh, P()), shapes))
    return bodies, shapes
