"""Full physics step pipeline (≙ wgrapier pipeline.rs: GpuPhysicsState +
GpuPhysicsPipeline::step, pipeline.rs:153-691).

One frame = ONE jitted program: mass-props update → broad phase → narrow
phase → constraint build (+warmstart transfer) → TGS-soft/Jacobi solve →
integration. The reference's per-frame CPU/GPU sync points (pair-count
readback pipeline.rs:488-499, coloring convergence readbacks) are gone: pair
capacity is a static bucket and coloring is device-resident. The only
host-side decision is capacity re-bucketing when the device-reported pair
count overflows — the analog of the reference's reallocate-and-rerun
(pipeline.rs:505-545), amortized by power-of-two buckets.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import tree_util

from wgmath_tpu.broad_phase.brute_force import find_pairs
from wgmath_tpu.core.dispatch import capacity_bucket
from wgmath_tpu.core.profiling import RunStats
from wgmath_tpu.dynamics.body import Bodies, update_mprops
from wgmath_tpu.dynamics.constraint import ContactConstraints, Contacts
from wgmath_tpu.dynamics.solver import solve
from wgmath_tpu.dynamics.sim_params import SimParams
from wgmath_tpu.queries.narrow_phase import narrow_phase
from wgmath_tpu.shapes.shape import ShapeSet, world_aabbs


@tree_util.register_pytree_node_class
@dataclasses.dataclass
class PhysicsState:
    """Device-side world state (≙ GpuPhysicsState, pipeline.rs:67-150).

    Everything is a pytree of static-shaped arrays, so the whole state is
    trivially checkpointable (pickle/orbax) — a capability the reference
    lacks (SURVEY §5 checkpoint/resume: none).
    """

    bodies: Bodies
    shapes: ShapeSet
    prev_constraints: ContactConstraints | None
    pair_count: jax.Array  # i32 [3] — [pairs, contacts, max GS color class]
    joints: Any = None  # JointSet | None
    prev_colors: Any = None  # i32 [C] — last frame's constraint coloring

    def tree_flatten(self):
        return (self.bodies, self.shapes, self.prev_constraints,
                self.pair_count, self.joints, self.prev_colors), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Static configuration (shapes the compiled program)."""

    pair_capacity: int = 1024
    contact_capacity: int = 0  # 0 → no compaction (buffer = pair capacity)
    use_jacobi: bool = False
    max_colors: int = 32
    max_per_body: int = 32
    broad_phase_block: int = 256
    broad_phase_max_per_row: int = 64
    sat_pair_capacity: int = 0  # >0: compact cuboid-cuboid pairs before SAT
    pfm_pair_capacity: int = 0  # >0: compact support-mapped pairs before GJK
    gs_cmax: int = 0  # >0: per-color GS window (host-grown on overflow)
    mesh_pair_capacity: int = 512
    mesh_k_best: int = 4
    bp_algo: str = "auto"  # "grid" | "brute" | "auto" (grid when n >= 1024)
    bp_cell_cap: int = 8  # grid: max occupants read per cell (host-grown)
    bp_global_cap: int = 16  # grid: dense side list for oversized AABBs
    bp_cand_budget: int = 48  # grid: pre-compaction candidates per body


def _has_mesh(shapes: ShapeSet) -> bool:
    from wgmath_tpu.shapes.shape import POLYLINE, TRIMESH

    return bool(shapes.kinds & {TRIMESH, POLYLINE})


def new_state(bodies: Bodies, shapes: ShapeSet, joints=None) -> PhysicsState:
    return PhysicsState(bodies, shapes, None, jnp.zeros(3, jnp.int32), joints)


@functools.partial(jax.jit, static_argnames=("params", "config", "warmstart"))
def step(state: PhysicsState, params: SimParams, config: PipelineConfig,
         *, warmstart: bool = True) -> PhysicsState:
    """Advance one frame of length ``params.dt`` (≙ GpuPhysicsPipeline::step).

    Phases mirror pipeline.rs:423-691: mprops update ("step_simulation"
    pass), broad phase, narrow phase, solver prepare + solve, integration —
    fused into a single XLA program.
    """
    bodies = state.bodies
    mprops = update_mprops(bodies.poses, bodies.local_mprops)

    mins, maxs = world_aabbs(state.shapes, bodies.poses,
                             margin=params.prediction_distance)
    from wgmath_tpu.shapes.shape import BALL, ball_radii_or_nan

    radii = (ball_radii_or_nan(state.shapes, bodies.poses)
             if BALL in state.shapes.kinds else None)
    n_bodies = mins.shape[0]
    use_grid = config.bp_algo == "grid" or (config.bp_algo == "auto"
                                            and n_bodies >= 1024)
    if use_grid:
        from wgmath_tpu.broad_phase.grid import find_pairs_grid

        pairs = find_pairs_grid(mins, maxs, capacity=config.pair_capacity,
                                max_per_body=config.broad_phase_max_per_row,
                                cell_cap=config.bp_cell_cap,
                                global_cap=config.bp_global_cap,
                                cand_budget=config.bp_cand_budget,
                                ball_radius=radii,
                                margin=params.prediction_distance)
    else:
        pairs = find_pairs(mins, maxs, capacity=config.pair_capacity,
                           block=config.broad_phase_block,
                           max_per_row=config.broad_phase_max_per_row,
                           ball_radius=radii,
                           margin=params.prediction_distance)
    contacts = narrow_phase(bodies.poses, state.shapes, pairs,
                            params.prediction_distance,
                            sat_capacity=config.sat_pair_capacity,
                            pfm_capacity=config.pfm_pair_capacity)
    if _has_mesh(state.shapes):
        from wgmath_tpu.queries.mesh_contact import (
            concat_contacts,
            mesh_ball_contacts,
        )

        from wgmath_tpu.queries.mesh_contact import mesh_convex_contacts

        from wgmath_tpu.shapes.shape import TRIMESH as _TM

        if _TM in state.shapes.kinds:
            mesh_contacts = mesh_ball_contacts(
                bodies.poses, state.shapes, pairs,
                params.prediction_distance,
                pair_cap=config.mesh_pair_capacity,
                k_best=config.mesh_k_best)
            contacts = concat_contacts(contacts, mesh_contacts)
        from wgmath_tpu.shapes.shape import POLYLINE, TRIMESH

        if TRIMESH in state.shapes.kinds:
            cvx_contacts = mesh_convex_contacts(
                bodies.poses, state.shapes, pairs,
                params.prediction_distance,
                pair_cap=config.mesh_pair_capacity // 2,
                k_best=config.mesh_k_best)
            contacts = concat_contacts(contacts, cvx_contacts)
        if POLYLINE in state.shapes.kinds:
            from wgmath_tpu.queries.mesh_contact import polyline_ball_contacts
            from wgmath_tpu.shapes.shape import BALL as _BALL
            from wgmath_tpu.shapes.shape import CUBOID as _CUBOID

            if _BALL in state.shapes.kinds:
                pl_contacts = polyline_ball_contacts(
                    bodies.poses, state.shapes, pairs,
                    params.prediction_distance,
                    pair_cap=config.mesh_pair_capacity // 2, k_best=2)
                contacts = concat_contacts(contacts, pl_contacts)
            if _CUBOID in state.shapes.kinds:
                from wgmath_tpu.queries.mesh_contact import (
                    polyline_cuboid_contacts,
                )

                pc_contacts = polyline_cuboid_contacts(
                    bodies.poses, state.shapes, pairs,
                    params.prediction_distance,
                    pair_cap=config.mesh_pair_capacity // 2, k_best=2)
                contacts = concat_contacts(contacts, pc_contacts)
    if config.contact_capacity:
        from wgmath_tpu.dynamics.constraint import compact_contacts

        contacts, contact_count = compact_contacts(contacts,
                                                   config.contact_capacity)
    else:
        contact_count = jnp.sum(contacts.valid.astype(jnp.int32))

    prev = state.prev_constraints if warmstart else None
    poses, vels, cons, max_class, colors = solve(
        bodies, mprops, contacts, params,
        use_jacobi=config.use_jacobi,
        max_colors=config.max_colors,
        max_per_body=config.max_per_body,
        warmstart_from=prev,
        joints=state.joints,
        gs_cmax=config.gs_cmax,
        prev_colors=state.prev_colors if warmstart else None,
    )
    new_bodies = Bodies(poses, vels, bodies.local_mprops)
    counts = jnp.stack([pairs.count, contact_count, max_class])
    return PhysicsState(new_bodies, state.shapes, cons, counts,
                        state.joints, colors)


@functools.partial(jax.jit, static_argnames=("params", "config", "n_steps"))
def multi_step(state: PhysicsState, params: SimParams, config: PipelineConfig,
               n_steps: int) -> PhysicsState:
    """Advance ``n_steps`` frames inside one compiled program (lax.scan) —
    amortizes dispatch overhead for serving/benchmark loops. Requires a
    warmed state (prev_constraints present) so the carry structure is fixed.
    """
    if state.prev_constraints is None or state.prev_colors is None:
        state = step(state, params, config,
                     warmstart=state.prev_constraints is not None)

    def body(s, _):
        return step(s, params, config, warmstart=True), None

    out, _ = jax.lax.scan(body, state, None, length=n_steps)
    return out


def step_checked(state: PhysicsState, params: SimParams,
                 config: PipelineConfig, stats: RunStats | None = None):
    """Host wrapper: step, then re-bucket pair capacity and re-run if the
    broad phase overflowed (≙ pipeline.rs:500-545 resize + re-run). Returns
    ``(state, config)`` — the possibly-enlarged config keys the jit cache."""
    first_frame = state.prev_constraints is None
    new = step(state, params, config, warmstart=not first_frame)
    counts = np.asarray(new.pair_count)
    regrow = {}
    if int(counts[0]) < 0:  # broad-phase budget overflow → widen budgets
        regrow["broad_phase_max_per_row"] = config.broad_phase_max_per_row * 2
        regrow["bp_cell_cap"] = config.bp_cell_cap * 2
        regrow["bp_global_cap"] = config.bp_global_cap * 2
        regrow["bp_cand_budget"] = config.bp_cand_budget * 2
        counts[0] = -counts[0]
    if int(counts[0]) > config.pair_capacity:
        regrow["pair_capacity"] = capacity_bucket(int(counts[0]))
    if config.contact_capacity and int(counts[1]) > config.contact_capacity:
        regrow["contact_capacity"] = capacity_bucket(int(counts[1]))
    if config.gs_cmax and int(counts[2]) > config.gs_cmax:
        regrow["gs_cmax"] = capacity_bucket(int(counts[2]), floor=256)
    if regrow:
        config = dataclasses.replace(config, **regrow)
        if stats is not None:
            stats.bump("capacity_regrowths")
        new = step(state, params, config, warmstart=not first_frame)
    if stats is not None:
        stats.bump("steps")
    return new, config
