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

from wgmath_tpu.broad_phase.brute_force import PairList, find_pairs
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
    pair_count: jax.Array  # i32 [8] — [pairs, contacts, max GS color
    # class, BP path taken (0 = cache hit, 1 = incremental repair,
    # 2 = full broad phase),
    # max tail color class (split-window sweep overflow signal),
    # bc/sat/pfm narrow-phase compaction demand (unclamped match counts —
    # step_checked regrows the matching capacity when one exceeds it)]
    joints: Any = None  # JointSet | None
    prev_colors: Any = None  # i32 [C] — last frame's constraint coloring
    # broad-phase temporal-coherence cache (bp_slack > 0): last pair list +
    # the slack-inflated AABBs it was built from. Pairs stay valid while
    # every body's AABB remains inside its inflated reference box.
    bp_pairs: Any = None  # PairList | None
    bp_ref: Any = None  # (mins, maxs) | None
    # pair-graph edge coloring cached with the pairs: colors of a superset
    # graph stay valid for every per-frame contact subset, so steady-state
    # frames skip coloring entirely. (colors, class_cap_used, max_colors_used)
    bp_colors: Any = None
    # solver layout + warmstart-segment cache, reused under the
    # stable-contact-keys cond (order/offsets/counts + side sort/segments)
    solve_cache: Any = None

    def tree_flatten(self):
        return (self.bodies, self.shapes, self.prev_constraints,
                self.pair_count, self.joints, self.prev_colors,
                self.bp_pairs, self.bp_ref, self.bp_colors,
                self.solve_cache), None

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
    bc_pair_capacity: int = 0  # >0: compact ball-cuboid pairs (size well
    # above the expected ground-contact count; compaction truncates silently)
    gs_cmax: int = 0  # >0: per-color GS window (host-grown on overflow)
    mesh_pair_capacity: int = 512
    mesh_k_best: int = 4
    # "grid" | "brute" | "lbvh" | "auto" (grid when n >= 1024); "lbvh" is
    # the reference's production algorithm (pipeline.rs:470) — on TPU the
    # grid wins at every measured scale (see BENCH_NOTES), but the option
    # is wired for parity and for pathological aspect-ratio scenes
    bp_algo: str = "auto"
    bp_cell_cap: int = 8  # grid: max occupants read per cell (host-grown)
    bp_global_cap: int = 16  # grid: dense side list for oversized AABBs
    bp_cand_budget: int = 48  # grid: pre-compaction candidates per body
    manifold_points: int = 0  # 0 = max_points(dim); see auto_manifold_points
    # >0: temporal-coherence broad phase. AABBs are inflated by this slack at
    # BP time and the pair list is reused (lax.cond) until some body's AABB
    # escapes its inflated box — exact, since the narrow phase re-tests every
    # pair each frame and the sphere prefilter limit is widened to cover the
    # worst-case drift. Settled scenes then pay the BP cost ~never.
    bp_slack: float = 0.0
    # velocity-aware slack (active when bp_slack > 0): each body's reference
    # box additionally grows by min(bp_vel_slack * |v|, bp_vel_slack_cap) —
    # ≈ that many seconds of travel before the body re-triggers a BP refresh.
    # Keeps settled-scene stragglers (a ball bouncing across the pile) from
    # invalidating the cache every frame; the cap bounds pair-list growth
    # during free-fall phases where everything is fast.
    # cap 0.1: keeps next-nearest lattice neighbors outside the widened
    # sphere-prefilter limit during synchronized free fall (pair-capacity
    # pollution), while still covering ~3-10 frames for 0.3-1.7 m/s
    # stragglers — whose refreshes then reuse cached colors via the
    # pair-key match and pay for the broad phase alone.
    bp_vel_slack: float = 0.33
    bp_vel_slack_cap: float = 0.1
    # refresh-path incremental recoloring: carry surviving pairs' colors by
    # key match; greedily color up to this many new pairs sequentially. More
    # churn than this (or regrown knobs) falls back to the full recolor.
    bp_recolor_cap: int = 128
    # Luby claim rounds per color class on the (rare) full-recolor path.
    # More rounds densify each class toward a maximal independent set →
    # fewer classes → a shorter sweep ladder; every steady-state frame pays
    # sweep cost ∝ classes while the recolor itself is amortized over the
    # BP-cache lifetime.
    bp_claim_rounds: int = 4
    # pair-slot solve layout (chained+windows+BP-colors only): the cached
    # pair list is kept color-major-SORTED and contacts stay at their pair
    # slots — no per-frame compaction. Slots are then bitwise-stable for
    # the whole BP-cache lifetime, so the solve's layout/sides/chain
    # bundle and the slotwise warmstart ride a bp-cache-hit cond instead
    # of the (always-failing) bitwise key-equality predicate: one
    # flickering marginal contact used to shift ~every compacted slot
    # (measured 24k/26k changed keys per settled frame => the 3.9 ms
    # layout + 1.7 ms by-key warmstart recomputed EVERY step). Cost:
    # windows cover pair classes (~27% more masked rows in the sweep).
    gs_pair_slots: bool = False
    # STATIC pair slots (on top of gs_pair_slots): color c's pairs land at
    # compile-time slots [Σwindows[:c-1], Σwindows[:c-1]+windows[c-1]) of
    # the cached pair list, residue/overflow in a tail segment past
    # Σwindows (unswept for a frame, standard regrow contract). Every
    # per-rung slice/update of the solve's field+impulse matrices then has
    # a STATIC offset — the round-4 device profile showed ~2.1 ms/step of
    # runtime-addressed async slice-starts on the dynamic class
    # boundaries, and a 13-rung microbench (scripts/exp_static_rungs.py)
    # reads 0.88 → 0.55 ms/step from this change alone. Requires
    # pair_capacity ≥ Σwindows + tail (step_checked maintains it).
    gs_static_slots: bool = False
    # TOPO-GC-style color-count minimization sweeps after a full Luby
    # recolor (solver.minimize_colors ≙ the reference's primary min-color
    # pass, coloring.rs:220-325): reseat edges into the lowest free color,
    # draining high classes. Fewer occupied classes = fewer GS rungs =
    # less per-sweep dispatch; cost is only paid at recolor boundaries.
    # 0 disables.
    bp_min_color_sweeps: int = 0
    # incremental BP repair: when 1..bp_repair_cap bodies escape their
    # inflated reference boxes, only their pair rows are recomputed (one
    # [E, N] brute pass against the cached reference boxes) and merged into
    # the cached pair list — the full grid refresh (~2x a hit step at 10k
    # bodies) is reserved for real churn. 0 disables. Escaped bodies get
    # fresh reference boxes; everyone else keeps theirs, so the repaired
    # list stays a superset of true overlaps by the same invariant.
    bp_repair_cap: int = 32
    # profiling knob: force the BP-cache predicate to a fixed value so the
    # hit path and the refresh path can be timed in isolation.
    bp_force: str | None = None  # None | "hit" | "miss" | "repair"
    # split-window GS sweep: colors past gs_split use this (smaller) window;
    # 0 = single-window sweep. Host-grown via the tail-overflow signal.
    gs_tail_window: int = 0
    gs_split: int = 8
    # static per-color GS window ladder (solver.gs_color_major_pass): entry
    # c-1 is color c's window. () = uniform gs_cmax windows (the split
    # scheme above). Host-rebucketed per color from the exported class
    # counts — supersedes the 2-level split when set.
    gs_windows: tuple = ()
    # fused sweep (dynamics/gs_fused.py): the whole GS sweep as ONE Pallas
    # kernel with VMEM-resident velocities. Requires gs_windows + the
    # color-major cached-BP path (bp_slack > 0, gs_cmax > 0), 3D, no
    # sharding. Contacts are then compacted to a STATIC rung-padded layout
    # (contact_capacity is ignored; buffer = gs_rung0 + sum(gs_windows)).
    gs_fused: bool = False
    # fused-path backend: True = Pallas kernels (VMEM-resident sweep).
    # False = the same fused formulation lowered by XLA (wide lane
    # gathers + inverse-permutation "scatter"). Default False: Mosaic on
    # v5e / jax 0.9 rejects tpu.dynamic_gather at multi-tile lane widths
    # ("Multiple source vregs along gather dimension"), so the Pallas
    # sweep can't compile at 10k-scale class sizes. The builder/integrate
    # kernels themselves are exact on device (the round-2 "compile-but-
    # miscompute" was a host-side field-order bug in the builder wrapper,
    # fixed round 4 — scripts/isolate_fused_kernels.py shows all three
    # checks bitwise-clean, and the full fused[pallas] step matches the
    # ladder to 6e-8 on TPU where the sweep shapes fit single-vreg).
    gs_fused_pallas: bool = False
    # static budget for the uncolored residue class (color 0, parked
    # unswept for a frame) in the fused layout; host-grown on overflow
    gs_rung0: int = 256
    # chained (scatter-free) GS sweep (solver.build_gs_chain): each color
    # writes its updated body velocities CONTIGUOUSLY into a velocity
    # stream at static offsets; later colors gather through a cached
    # last-writer index chain. Removes the sweep's per-color scatter-add —
    # the slowest TPU op in the solve (~49 Mrow/s vs 135 Mrow/s gathers).
    # Requires gs_windows; unsharded, non-fused, non-jacobi.
    gs_chained: bool = False
    # chained-sweep rhs-in-rung: each rung recomputes its substep rhs
    # INSIDE the GS math kernel from poses ridden through the velocity
    # stream (biased sweep) / the stored rhs_wo_bias (unbiased sweep) —
    # the per-substep update_rhs_sorted phase (a 2C-row pose gather + XLA
    # relinearization) disappears. Requires gs_chained; 3D. Joints ride
    # along: they rebuild per substep and solve in their own
    # joint_gs_pass around the chained contact sweeps (round 5).
    gs_rhs_in_rung: bool = False
    # fine-grained pair/contact capacity re-bucketing: ceil(1.10·n/1024)
    # ·1024 instead of the 1.5x bucket ladder. Every capacity-sized pass
    # (narrow phase, warmstart sides, rhs gathers) pays bucket overshoot
    # every frame and the solve is gather-ROW bound on TPU; in a settled
    # scene counts drift slowly, so the tighter buckets trade a few extra
    # growth recompiles for 10-25% fewer gathered rows.
    fine_capacities: bool = False
    # GS window-ladder rung quantization + growth headroom (step_checked
    # re-bucketing): rung = max(quantum, ceil(headroom·count/quantum)
    # ·quantum). Sweep cost tracks sum(windows) rows, so tighter rungs cut
    # the per-color gather volume at the price of more frequent rung
    # regrows when classes drift.
    gs_rung_quantum: int = 256
    gs_rung_headroom: float = 1.15


def _has_mesh(shapes: ShapeSet) -> bool:
    from wgmath_tpu.shapes.shape import POLYLINE, TRIMESH

    return bool(shapes.kinds & {TRIMESH, POLYLINE})


def auto_manifold_points(shapes: ShapeSet, dim: int, dynamic=None) -> int:
    """Narrowest safe manifold width for this scene (host-side: reads the
    concrete shape tags). Cuboid-cuboid SAT (3D/2D), the support-mapped
    PFM clip (3D: capsule/cylinder/cone/convex/segment stacks), and
    polyline-cuboid (2D) clipping emit multi-point manifolds; every other
    kernel emits one-point manifolds per slot, and all solver passes cost
    ∝ width — a balls-over-one-ground-slab scene runs its whole solve 4×
    leaner at width 1. Pass the result as ``PipelineConfig.manifold_points``.

    ``dynamic``: optional per-body dynamic mask — when every cuboid is
    static (ground + walls), cuboid-cuboid manifolds can never act and the
    width stays 1."""
    from wgmath_tpu.shapes.shape import (
        CAPSULE,
        CONE,
        CONVEX,
        CUBOID,
        CYLINDER,
        POLYLINE,
        SEGMENT,
        TRIANGLE,
    )

    tags = np.asarray(shapes.tag)
    cuboid = tags == CUBOID
    n_cuboids = int(np.sum(cuboid))
    any_dyn_cuboid = (True if dynamic is None
                      else bool(np.any(cuboid & np.asarray(dynamic))))
    if dim == 3:
        if n_cuboids >= 2 and any_dyn_cuboid:
            return 4
        # support-mapped pairs route through the PFM manifold clip: flat
        # resting needs the full width whenever a PFM-capable shape can
        # move (or a dynamic cuboid can rest on a static one)
        pfm = np.isin(tags, [CAPSULE, CYLINDER, CONE, CONVEX, SEGMENT,
                             TRIANGLE])
        any_dyn_pfm = (True if dynamic is None
                       else bool(np.any(pfm & np.asarray(dynamic))))
        if np.any(pfm) and (any_dyn_pfm or any_dyn_cuboid):
            return 4
        return 1
    polyline = tags == POLYLINE
    any_dyn_pl_or_cuboid = (True if dynamic is None else
                            bool(np.any((cuboid | polyline)
                                        & np.asarray(dynamic))))
    if (n_cuboids >= 2 and any_dyn_cuboid) or (
            n_cuboids >= 1 and POLYLINE in shapes.kinds
            and any_dyn_pl_or_cuboid):
        return 2
    return 1


def new_state(bodies: Bodies, shapes: ShapeSet, joints=None) -> PhysicsState:
    return PhysicsState(bodies, shapes, None, jnp.zeros(8, jnp.int32), joints)


@functools.partial(jax.jit, static_argnames=("params", "config", "warmstart",
                                             "shard"))
def step(state: PhysicsState, params: SimParams, config: PipelineConfig,
         *, warmstart: bool = True, shard: tuple | None = None
         ) -> PhysicsState:
    """Advance one frame of length ``params.dt`` (≙ GpuPhysicsPipeline::step).

    Phases mirror pipeline.rs:423-691: mprops update ("step_simulation"
    pass), broad phase, narrow phase, solver prepare + solve, integration —
    fused into a single XLA program.

    ``shard``: optional ``(axis_name, n_devices)`` — run inside shard_map
    with fully-REPLICATED state and the heavy phases split across the mesh:
    broad-phase rows (each device owns a body-row block of the grid/brute
    pass), narrow-phase pair blocks, and the solver's per-color GS windows
    (per-color psum of velocity deltas — exact Gauss-Seidel). Everything
    else (caches, coloring, compaction, integration) is replicated and
    deterministic, so every device carries bitwise-identical state and the
    result matches the single-device step exactly (see
    parallel/sharded_pipeline.py for the entry point and the design notes).
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
    slack = config.bp_slack
    dim_sqrt = float(np.sqrt(mins.shape[1]))
    dyn_mask = bodies.is_dynamic()
    move_mask = bodies.is_moving()  # dynamic ∪ kinematic (one-way) bodies

    # Velocity-aware per-body slack: a settled pile usually has a few
    # stragglers (a ball bouncing on top) whose per-frame motion exceeds any
    # uniform slack — one such body re-triggers the 100+ ms BP refresh every
    # frame. Each body's reference box instead grows with its speed
    # (≈ bp_vel_slack seconds of travel, capped so free-fall phases don't
    # blow up the pair list), so fast bodies stop invalidating the cache.
    if slack > 0:
        speed = jnp.linalg.norm(bodies.vels.linear, axis=-1, keepdims=True)
        # QUANTIZED to 3 levels: a continuous speed-dependent inflation
        # makes the sphere-prefilter threshold wiggle every refresh, so
        # thousands of marginal pairs flicker in/out and the incremental
        # recoloring path never applies (full recolor ≈ 120 ms). With
        # discrete levels, consecutive refreshes use bitwise-identical
        # thresholds for every body that stayed in its speed band — pair
        # churn collapses to the genuinely moving bodies.
        cap = config.bp_vel_slack_cap
        t1 = 0.25 * cap / config.bp_vel_slack
        t2 = 0.75 * cap / config.bp_vel_slack
        infl = slack + 0.5 * cap * ((speed > t1).astype(jnp.float32)
                                    + (speed > t2).astype(jnp.float32))
        # the sphere prefilter must admit the same drift: each center can
        # move ≤ infl per axis (= infl·√dim in distance) before a refresh
        if radii is not None:
            radii_bp = radii + dim_sqrt * infl[:, 0]
        else:
            radii_bp = None
    else:
        infl = None
        radii_bp = radii
    sphere_margin = params.prediction_distance

    def _run_bp(mn, mx):
        if shard is not None:
            axis, n_dev = shard
            assert config.pair_capacity % n_dev == 0, \
                "pair_capacity must divide the device count"
            cap_l = config.pair_capacity // n_dev
            nb_l = -(-n_bodies // n_dev)
            k = jax.lax.axis_index(axis)
            if use_grid:
                from wgmath_tpu.broad_phase.grid import find_pairs_grid

                p = find_pairs_grid(
                    mn, mx, capacity=cap_l,
                    max_per_body=config.broad_phase_max_per_row,
                    cell_cap=config.bp_cell_cap,
                    global_cap=config.bp_global_cap,
                    cand_budget=config.bp_cand_budget,
                    ball_radius=radii_bp, margin=sphere_margin,
                    dynamic=dyn_mask,
                    row_offset=k * nb_l, row_count=nb_l)
            else:
                from wgmath_tpu.broad_phase.brute_force import (
                    find_pairs_partial,
                )

                rsl = lambda x: jax.lax.dynamic_slice_in_dim(
                    jnp.concatenate(
                        [x, jnp.zeros((nb_l * n_dev - n_bodies,)
                                      + x.shape[1:], x.dtype)]),
                    k * nb_l, nb_l, 0)
                p = find_pairs_partial(
                    rsl(mn), rsl(mx), k * nb_l, mn, mx, capacity=cap_l,
                    row_active=rsl(jnp.ones((n_bodies,), bool)),
                    block=config.broad_phase_block,
                    max_per_row=config.broad_phase_max_per_row,
                    ball_radius=radii_bp,
                    row_ball_radius=None if radii_bp is None
                    else rsl(radii_bp),
                    margin=sphere_margin, dynamic=dyn_mask,
                    row_dynamic=None if dyn_mask is None
                    else rsl(dyn_mask.astype(jnp.float32)) > 0.5)
            g = functools.partial(jax.lax.all_gather, axis_name=axis,
                                  tiled=True)
            # overflow rides a sign bit: any device negative → total
            # negative (the host regrows budgets exactly as single-chip)
            neg = jax.lax.psum((p.count < 0).astype(jnp.int32), axis) > 0
            tot = jax.lax.psum(jnp.abs(p.count), axis)
            return PairList(g(p.body_a), g(p.body_b), g(p.valid),
                            jnp.where(neg, -jnp.maximum(tot, 1), tot))
        if config.bp_algo == "lbvh":
            # Karras LBVH traversal (≙ the reference's production broad
            # phase, pipeline.rs:470). The tree pass has no ball/dynamic
            # knowledge, so the grid's sphere prefilter + static-static
            # drop are applied to the emitted pairs instead — same final
            # pair-set semantics, slightly higher capacity pressure.
            from wgmath_tpu.broad_phase.lbvh import find_pairs_lbvh

            p = find_pairs_lbvh(mn, mx, capacity=config.pair_capacity)
            keep = p.valid
            if dyn_mask is not None:
                keep &= dyn_mask[p.body_a] | dyn_mask[p.body_b]
            if radii_bp is not None:
                centers = (mn + mx) * 0.5
                d = jnp.linalg.norm(centers[p.body_a] - centers[p.body_b],
                                    axis=-1)
                lim = radii_bp[p.body_a] + radii_bp[p.body_b] + sphere_margin
                keep &= ~(d > lim)  # NaN lim (non-ball) keeps the pair
            return PairList(jnp.where(keep, p.body_a, 0),
                            jnp.where(keep, p.body_b, 0), keep, p.count)
        if use_grid:
            from wgmath_tpu.broad_phase.grid import find_pairs_grid

            return find_pairs_grid(mn, mx, capacity=config.pair_capacity,
                                   max_per_body=config.broad_phase_max_per_row,
                                   cell_cap=config.bp_cell_cap,
                                   global_cap=config.bp_global_cap,
                                   cand_budget=config.bp_cand_budget,
                                   ball_radius=radii_bp,
                                   margin=sphere_margin,
                                   dynamic=dyn_mask)
        return find_pairs(mn, mx, capacity=config.pair_capacity,
                          block=config.broad_phase_block,
                          max_per_row=config.broad_phase_max_per_row,
                          ball_radius=radii_bp, margin=sphere_margin,
                          dynamic=dyn_mask)

    # pair-graph coloring rides the BP cache: recolor only when the broad
    # phase actually re-runs. Gated off for mesh scenes (k-best rows of one
    # pair share bodies, so pair-level colors would break GS disjointness),
    # for Jacobi (needs no coloring), and for gs_cmax == 0: the class-cap
    # regime is what parks coloring residue in an unswept segment AND gives
    # step_checked a regrow signal — without it, residue pairs would share
    # a GS color window and break the unique-indices scatter promise.
    color_with_bp = (slack > 0 and not config.use_jacobi
                     and config.gs_cmax > 0 and not _has_mesh(state.shapes))
    # pair-slot solve layout (see PipelineConfig.gs_pair_slots): cached
    # pair list kept color-major; contacts stay at pair slots
    # joints are no bar: the pair-slot layout caches CONTACT constraints
    # only; joint constraints rebuild per substep from poses and solve in
    # their own (CPU-greedy-colored) joint_gs_pass around the chained
    # contact sweeps
    use_pair_slots = (config.gs_pair_slots and color_with_bp
                      and config.gs_chained and bool(config.gs_windows)
                      and not config.gs_fused and shard is None
                      and mins.shape[1] == 3)
    _mc = config.max_colors
    _swin = tuple(config.gs_windows[:_mc]) if use_pair_slots else ()
    use_static_slots = (use_pair_slots and config.gs_static_slots
                        and config.pair_capacity >= sum(_swin) + 256)
    if use_static_slots:
        import zlib

        # the cached layout is only valid for THIS window ladder: fold the
        # ladder into the tag flag so a re-bucketed ladder forces a refresh
        slot_flag = np.int32(2 + zlib.crc32(repr(_swin).encode())
                             % 2000000000)
    else:
        slot_flag = np.int32(1)

    def _sort_pairs_cm(p, tag):
        """Color-major pair order: valid pairs ascending by color, invalid
        tail. Stable, so surviving pairs keep relative order across
        repairs (slots still shift on repair frames — the solve falls
        back to by-key warmstart + fresh layout exactly then)."""
        if use_static_slots:
            return _sort_pairs_static(p, tag)
        # clip LOW bound 0, not 1: uncolored residue must sort BEFORE
        # class 1 as its own contiguous block — solve's pair-slot layout
        # derives offsets[1] = count(color 0), so clipping residue into
        # class 1's key interleaved it through the first classes' windows
        # (wrong rows swept; disjointness not guaranteed). Found via the
        # static-slot A/B (round 5); reachable only when the colorer
        # leaves residue (max_colors exhausted — not the bench regime).
        key = jnp.where(p.valid, jnp.clip(tag[0], 0, config.max_colors),
                        config.max_colors + 1).astype(jnp.int32)
        perm = jnp.argsort(key, stable=True).astype(jnp.int32)
        g = lambda x: x[perm]
        return (PairList(g(p.body_a), g(p.body_b), g(p.valid), p.count),
                (g(tag[0]),) + tuple(tag[1:-1]) + (slot_flag,))

    def _sort_pairs_static(p, tag):
        """Static rung placement (PipelineConfig.gs_static_slots): color
        c's valid pairs land at slots [W_{c-1}, W_{c-1}+count_c) where
        W = cumsum(windows) — compile-time class offsets, so every
        per-rung slice in the solve is STATIC. Valid pairs that don't fit
        (class overflow beyond its rung, uncolored residue) go to the
        tail segment [ΣW, cap) and are unswept for one frame (regrow
        contract); invalid rows are dropped (their slots read as empty).
        A tail that outgrows the segment flips the pair count negative
        with an inflated magnitude so step_checked regrows capacity."""
        cap = p.body_a.shape[0]
        Wnp = np.concatenate([[0], np.cumsum(_swin)]).astype(np.int32)
        T = int(Wnp[-1])
        w_start = jnp.asarray(Wnp[:-1])  # [max_colors] class starts
        win_arr = jnp.asarray(np.asarray(_swin, np.int32))
        cls = jnp.clip(tag[0], 0, _mc)
        in_class = p.valid & (cls >= 1)
        key = jnp.where(in_class, cls, _mc + 1).astype(jnp.int32)
        perm = jnp.argsort(key, stable=True).astype(jnp.int32)
        skey = key[perm]
        valid_s = p.valid[perm]
        counts = jax.ops.segment_sum(jnp.ones(cap, jnp.int32), skey,
                                     num_segments=_mc + 2)
        dyn_off = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                   jnp.cumsum(counts)[:-1].astype(jnp.int32)])
        pos = jnp.arange(cap, dtype=jnp.int32)
        rank = pos - dyn_off[skey]
        is_class = skey <= _mc  # class rows are valid by construction
        ci = jnp.maximum(skey - 1, 0)
        fits = is_class & (rank < win_arr[ci])
        tail_need = valid_s & ~fits
        tail_rank = jnp.cumsum(tail_need.astype(jnp.int32)) - 1
        tail_ok = tail_need & (T + tail_rank < cap)
        dst = jnp.where(fits, w_start[ci] + rank,
                        jnp.where(tail_ok, T + tail_rank, cap))
        n_drop = jnp.sum((tail_need & ~tail_ok).astype(jnp.int32))

        def sc(x, fill=0):
            return jnp.full((cap,), fill, x.dtype).at[dst].set(
                x[perm], mode="drop")

        new_valid = jnp.zeros((cap,), bool).at[dst].set(valid_s,
                                                        mode="drop")
        # dropped tail ⇒ signal with an inflated magnitude so the host's
        # pair_capacity regrow creates enough room for ΣW + tail
        need = T + jnp.sum(tail_need.astype(jnp.int32)) + 256
        mag = jnp.maximum(jnp.abs(p.count), need)
        cnt = jnp.where((p.count < 0) | (n_drop > 0),
                        -jnp.maximum(mag, 1), p.count)
        return (PairList(sc(p.body_a), sc(p.body_b), new_valid, cnt),
                (sc(tag[0]),) + tuple(tag[1:-1]) + (slot_flag,))

    def _colored_bp(mn, mx, reuse=None):
        p = _run_bp(mn, mx)
        if not color_with_bp:
            return p, (mn, mx), None
        from wgmath_tpu.dynamics.solver import color_pairs

        dyn = dyn_mask

        def recolor():
            cols = color_pairs(p.body_a, p.body_b, p.valid,
                               dyn[p.body_a], dyn[p.body_b], n_bodies,
                               max_colors=config.max_colors,
                               claim_rounds=config.bp_claim_rounds,
                               class_cap=config.gs_cmax)
            if config.bp_min_color_sweeps:
                from wgmath_tpu.dynamics.solver import minimize_colors

                cols = minimize_colors(p.body_a, p.body_b, p.valid, cols,
                                       dyn[p.body_a], dyn[p.body_b],
                                       n_bodies,
                                       max_colors=config.max_colors,
                                       sweeps=config.bp_min_color_sweeps,
                                       class_cap=config.gs_cmax)
            return cols

        if reuse is None:
            cols = recolor()
        else:
            # a refresh triggered by a straggler escaping its box changes a
            # handful of pairs (its wall/neighbor pairs flicker). Carry the
            # surviving pairs' colors by key match and greedily color only
            # the new pairs — a full Luby recolor of the 64k-capacity graph
            # costs ~4× the broad phase itself and is reserved for real
            # pair-set churn (> bp_recolor_cap new pairs) or stale knobs.
            from wgmath_tpu.dynamics.solver import (
                assign_new_pair_colors,
                transfer_pair_colors,
            )

            prev_p, prev_tag = reuse
            mapped = transfer_pair_colors(p.body_a, p.body_b, p.valid,
                                          prev_p.body_a, prev_p.body_b,
                                          prev_p.valid, prev_tag[0])
            n_new = jnp.sum((p.valid & (mapped == 0)).astype(jnp.int32))
            knobs_ok = ((prev_tag[1] == config.gs_cmax)
                        & (prev_tag[2] == config.max_colors))
            cols = jax.lax.cond(
                knobs_ok & (n_new == 0),
                lambda: mapped,  # every pair kept its color: skip the
                # greedy assigner's setup (used tables + slot sort, ~2 ms)
                lambda: jax.lax.cond(
                    knobs_ok & (n_new <= config.bp_recolor_cap),
                    lambda: assign_new_pair_colors(
                        p.body_a, p.body_b, p.valid, mapped,
                        dyn[p.body_a], dyn[p.body_b], n_bodies,
                        max_colors=config.max_colors,
                        class_cap=config.gs_cmax,
                        new_cap=config.bp_recolor_cap),
                    recolor))
        tag = (cols, jnp.int32(config.gs_cmax),
               jnp.int32(config.max_colors), jnp.int32(0))
        if use_pair_slots:
            p, tag = _sort_pairs_cm(p, tag)
        return p, (mn, mx), tag

    cache_ok = (slack > 0 and state.bp_pairs is not None
                and state.bp_ref is not None
                and state.bp_pairs.body_a.shape[0] == config.pair_capacity
                and (not color_with_bp or state.bp_colors is not None))

    def _repair_bp(esc):
        """Recompute the repaired bodies' pair rows and merge them into
        the cached list. Repaired bodies get fresh inflated reference boxes;
        candidate tests run against the OTHER bodies' cached reference boxes
        (not their current AABBs), preserving the superset invariant: pair
        (i, j) is listed whenever ref_i and ref_j overlap, and bodies stay
        inside their refs until they trigger their own repair/refresh.

        Proactive cohort batching: the [E, N] candidate rows below cost the
        same whether 1 or E bodies are repaired (static shapes), so the
        spare slots are filled with the bodies CLOSEST to their reference-
        box walls — the next frames' escapees. Escaped bodies have negative
        wall margin, so ascending-margin top_k always selects all of them
        first (the switch guarantees n_esc <= E), and each repair resets
        the whole almost-escaped cohort: without batching a settled 10k
        pile dribbles escapes nearly every frame (measured natural mix:
        157 repairs / 200 steps)."""
        ref0, ref1 = state.bp_ref
        ecap = min(config.bp_repair_cap, n_bodies)
        margin = jnp.min(jnp.minimum(mins - ref0, ref1 - maxs), axis=1)
        # cohort selection covers every body that can MOVE: kinematic
        # (one-way) bodies are non-dynamic for pair filtering but their
        # prescribed velocity carries them out of their reference boxes
        # just like dynamics — excluding them would leave stale pair rows
        # behind a moving platform (superset contract violation)
        urgency = jnp.where(move_mask, -margin, -jnp.inf)
        _, e_ids = jax.lax.top_k(urgency, ecap)
        e_ids = e_ids.astype(jnp.int32)
        e_valid = jnp.ones((ecap,), bool)
        sel = jnp.zeros((n_bodies,), bool).at[e_ids].set(True)
        r0 = jnp.where(sel[:, None], mins - infl, ref0)
        r1 = jnp.where(sel[:, None], maxs + infl, ref1)
        op = state.bp_pairs
        keep = op.valid & ~sel[op.body_a] & ~sel[op.body_b]
        # [E, N] brute rows (exact AABB on reference boxes; the sphere
        # prefilter is skipped — a few extra superset pairs, re-tested by
        # the narrow phase anyway)
        cols = jnp.arange(n_bodies, dtype=jnp.int32)
        ov = jnp.all((r0[e_ids][:, None, :] <= r1[None])
                     & (r0[None] <= r1[e_ids][:, None, :]), axis=-1)
        ov &= e_valid[:, None]
        ov &= cols[None, :] != e_ids[:, None]
        ov &= dyn_mask[e_ids][:, None] | dyn_mask[None, :]
        # repaired-repaired pairs emit from the lower body id only
        ov &= (~sel[cols])[None, :] | (cols[None, :] > e_ids[:, None])
        if radii is not None:
            # sphere prefilter on reference boxes (mirrors the grid BP's
            # ball_radius filter; without it box-corner pairs accumulate
            # across repairs — measured 33.7k -> 48.4k pairs at 10k with a
            # 256-body cohort, saturating the pair budget). Sound: a body
            # stays inside its ref box, so any future contact needs the
            # ref CENTERS within r_i + r_j + sqrt(dim)*(drift_i + drift_j)
            # + margin, drift = he - r the per-axis slack (Euclidean corner
            # factor sqrt(dim), same bound as the grid BP's radii_bp).
            # Ball-only — for non-ball shapes (NaN radii) the comparison is
            # false and the box test stands (the Euclidean bound would
            # wrongly drop corner-overlapping boxes).
            refc = 0.5 * (r0 + r1)
            he = 0.5 * jnp.max(r1 - r0, axis=1)
            reach = radii + dim_sqrt * (he - radii)
            d2 = jnp.sum((refc[e_ids][:, None, :] - refc[None]) ** 2,
                         axis=-1)
            lim = reach[e_ids][:, None] + reach[None] + sphere_margin
            both_ball = (jnp.isfinite(radii)[e_ids][:, None]
                         & jnp.isfinite(radii)[None])
            ov &= (d2 <= lim * lim) | ~both_ball
        row_counts = jnp.sum(ov, axis=-1, dtype=jnp.int32)
        kk = min(max(64, config.broad_phase_max_per_row), n_bodies)
        row_overflow = jnp.any(row_counts > kk)
        sc2 = jnp.where(ov, n_bodies - cols[None, :], 0)
        top2, _ = jax.lax.top_k(sc2, kk)  # [E, kk]
        hit2 = top2 > 0
        nb = jnp.where(hit2, n_bodies - top2, 0)
        na = jnp.broadcast_to(e_ids[:, None], nb.shape)
        # merge surviving old pairs + new rows into the capacity buffer
        cap = config.pair_capacity
        all_a = jnp.concatenate([op.body_a, jnp.minimum(na, nb).reshape(-1)])
        all_b = jnp.concatenate([op.body_b, jnp.maximum(na, nb).reshape(-1)])
        all_v = jnp.concatenate([keep, hit2.reshape(-1)])
        pos = jnp.cumsum(all_v.astype(jnp.int32)) - 1
        slot = jnp.where(all_v & (pos < cap), pos, cap)
        out_a = jnp.zeros(cap, jnp.int32).at[slot].set(all_a, mode="drop")
        out_b = jnp.zeros(cap, jnp.int32).at[slot].set(all_b, mode="drop")
        total = jnp.sum(all_v.astype(jnp.int32))
        count = jnp.where(row_overflow, -jnp.maximum(total, 1), total)
        valid = jnp.arange(cap) < jnp.minimum(total, cap)
        p = PairList(out_a, out_b, valid, count)
        if not color_with_bp:
            return p, (r0, r1), None
        from wgmath_tpu.dynamics.solver import (
            assign_new_pair_colors,
            color_pairs,
            transfer_pair_colors,
        )

        mapped = transfer_pair_colors(p.body_a, p.body_b, p.valid,
                                      op.body_a, op.body_b, op.valid,
                                      state.bp_colors[0])
        n_new = jnp.sum((p.valid & (mapped == 0)).astype(jnp.int32))
        # n_new == 0 shortcut: every pair kept its color — skip even the
        # greedy assigner's setup (used-color tables + slot sort, ~2 ms at
        # 10k), the common case when a repair only re-emits existing pairs
        cols_out = jax.lax.cond(
            n_new == 0,
            lambda: mapped,
            lambda: jax.lax.cond(
                n_new <= config.bp_recolor_cap,
                lambda: assign_new_pair_colors(
                    p.body_a, p.body_b, p.valid, mapped,
                    dyn_mask[p.body_a], dyn_mask[p.body_b], n_bodies,
                    max_colors=config.max_colors, class_cap=config.gs_cmax,
                    new_cap=config.bp_recolor_cap),
                lambda: color_pairs(p.body_a, p.body_b, p.valid,
                                    dyn_mask[p.body_a], dyn_mask[p.body_b],
                                    n_bodies, max_colors=config.max_colors,
                                    claim_rounds=config.bp_claim_rounds,
                                    class_cap=config.gs_cmax)))
        tag = (cols_out, jnp.int32(config.gs_cmax),
               jnp.int32(config.max_colors), jnp.int32(0))
        if use_pair_slots:
            p, tag = _sort_pairs_cm(p, tag)
        return p, (r0, r1), tag

    bp_path = jnp.int32(2)  # 0 = cache hit, 1 = repair, 2 = full BP
    if slack > 0:
        if cache_ok:
            esc = jnp.any((mins < state.bp_ref[0])
                          | (maxs > state.bp_ref[1]), axis=1)
            n_esc = jnp.sum(esc.astype(jnp.int32))
            knobs_ok = jnp.bool_(True)
            if color_with_bp:
                # cached colors are stale if the coloring knobs changed
                # (host regrew gs_cmax after a residue signal)
                knobs_ok = ((state.bp_colors[1] == config.gs_cmax)
                            & (state.bp_colors[2] == config.max_colors))
                if use_pair_slots:
                    # the pair-slot layout REQUIRES a cached pair list
                    # sorted under the SAME slot scheme: flag 1 = dynamic
                    # color-major, 2+hash(ladder) = static rungs — a cache
                    # written by any other config forces a refresh
                    knobs_ok &= (state.bp_colors[3] == slot_flag
                                 if len(state.bp_colors) > 3
                                 else jnp.bool_(False))
            # cached pairs stay a superset of true overlaps while every AABB
            # remains inside its slack-inflated reference box
            reuse = ((state.bp_pairs, state.bp_colors)
                     if color_with_bp else None)
            repair_on = config.bp_repair_cap > 0
            idx = jnp.where(
                knobs_ok & (n_esc == 0), 0,
                jnp.where(knobs_ok & repair_on
                          & (n_esc <= config.bp_repair_cap), 1, 2))
            if config.bp_force == "hit":
                idx = jnp.int32(0)
            elif config.bp_force == "miss":
                idx = jnp.int32(2)
            elif config.bp_force == "repair":
                idx = jnp.int32(1)
            bp_path = idx
            pairs, bp_ref, bp_colors = jax.lax.switch(
                idx,
                [lambda: (state.bp_pairs, state.bp_ref, state.bp_colors),
                 lambda: _repair_bp(esc),
                 lambda: _colored_bp(mins - infl, maxs + infl, reuse=reuse)])
        else:
            pairs, bp_ref, bp_colors = _colored_bp(mins - infl, maxs + infl)
    else:
        pairs, bp_ref, bp_colors = _colored_bp(mins, maxs)
        bp_ref = None
    p_max = config.manifold_points
    if shard is None:
        contacts, np_needed = narrow_phase(
            bodies.poses, state.shapes, pairs, params.prediction_distance,
            sat_capacity=config.sat_pair_capacity,
            pfm_capacity=config.pfm_pair_capacity,
            p_max=p_max, bc_capacity=config.bc_pair_capacity,
            with_overflow=True)
    else:
        # pair-block sharding: device k processes pairs [k·C/D, (k+1)·C/D).
        # Type compactions scatter back to the pair slots they came from,
        # so the gathered contact buffer is slot-identical to single-chip;
        # per-device compaction caps are the global knobs / D, and their
        # overflow signal is pmax·D (a device exceeding its share must
        # regrow the global knob, same host contract).
        axis, n_dev = shard
        cap_l = config.pair_capacity // n_dev
        k = jax.lax.axis_index(axis)
        psl = lambda x: jax.lax.dynamic_slice_in_dim(x, k * cap_l, cap_l, 0)
        pairs_l = PairList(psl(pairs.body_a), psl(pairs.body_b),
                           psl(pairs.valid), pairs.count)
        div = lambda cap: -(-cap // n_dev) if cap else 0
        contacts_l, np_needed_l = narrow_phase(
            bodies.poses, state.shapes, pairs_l, params.prediction_distance,
            sat_capacity=div(config.sat_pair_capacity),
            pfm_capacity=div(config.pfm_pair_capacity),
            p_max=p_max, bc_capacity=div(config.bc_pair_capacity),
            with_overflow=True)
        g = functools.partial(jax.lax.all_gather, axis_name=axis,
                              tiled=True)
        contacts = jax.tree.map(
            lambda x: g(x) if x.ndim >= 1 else x, contacts_l)
        np_needed = jax.lax.pmax(np_needed_l, axis) * n_dev
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
                k_best=config.mesh_k_best, p_max=p_max)
            contacts = concat_contacts(contacts, mesh_contacts)
        from wgmath_tpu.shapes.shape import POLYLINE, TRIMESH

        if TRIMESH in state.shapes.kinds:
            cvx_contacts = mesh_convex_contacts(
                bodies.poses, state.shapes, pairs,
                params.prediction_distance,
                pair_cap=config.mesh_pair_capacity // 2,
                k_best=config.mesh_k_best, p_max=p_max)
            contacts = concat_contacts(contacts, cvx_contacts)
        if POLYLINE in state.shapes.kinds:
            from wgmath_tpu.queries.mesh_contact import polyline_ball_contacts
            from wgmath_tpu.shapes.shape import BALL as _BALL
            from wgmath_tpu.shapes.shape import CUBOID as _CUBOID

            if _BALL in state.shapes.kinds:
                pl_contacts = polyline_ball_contacts(
                    bodies.poses, state.shapes, pairs,
                    params.prediction_distance,
                    pair_cap=config.mesh_pair_capacity // 2, k_best=2,
                    p_max=p_max)
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
    contact_colors = bp_colors[0] if color_with_bp else None
    presorted = False
    dim_ = state.bodies.dim
    use_fused = (config.gs_fused and bool(config.gs_windows)
                 and contact_colors is not None and shard is None
                 and dim_ == 3)
    fused_class_counts = None
    if use_pair_slots:
        # contacts stay at their (color-major, BP-cached) pair slots: no
        # compaction, bitwise-stable slots for the BP-cache lifetime. The
        # constraint buffer spans pair_capacity; contact-invalid rows are
        # masked in the solve (impulse-preserving pass-throughs).
        contact_count = jnp.sum(contacts.valid.astype(jnp.int32))
        presorted = True
    elif use_fused:
        from wgmath_tpu.dynamics.constraint import compact_contacts

        # STATIC rung-padded color-major layout (fused-sweep kernel):
        # color k's contacts land at compile-time offsets, padded to the
        # ladder rung; per-class TRUE counts signal rung overflow
        windows = (config.gs_rung0,) + tuple(
            config.gs_windows[:config.max_colors])
        contacts, contact_count, contact_colors, fused_class_counts = \
            compact_contacts(contacts, 0, extra=contact_colors,
                             sort_by_extra=True, static_windows=windows)
        presorted = True
    elif config.contact_capacity:
        from wgmath_tpu.dynamics.constraint import compact_contacts

        if contact_colors is not None:
            # color-major compaction: the constraint buffer comes out
            # already sorted by color, so solve() skips its per-frame
            # field sort-gather (identity layout)
            contacts, contact_count, contact_colors = compact_contacts(
                contacts, config.contact_capacity, extra=contact_colors,
                sort_by_extra=True)
            presorted = True
        else:
            contacts, contact_count = compact_contacts(
                contacts, config.contact_capacity)
    else:
        contact_count = jnp.sum(contacts.valid.astype(jnp.int32))

    prev = state.prev_constraints if warmstart else None
    if prev is not None and prev.n_impulse.shape[1] != contacts.dist.shape[1]:
        prev = None  # stale state from before a manifold-width change
    poses, vels, cons, max_class, colors, solve_cache = solve(
        bodies, mprops, contacts, params,
        use_jacobi=config.use_jacobi,
        max_colors=config.max_colors,
        max_per_body=config.max_per_body,
        warmstart_from=prev,
        joints=state.joints,
        gs_cmax=config.gs_cmax,
        prev_colors=state.prev_colors if warmstart else None,
        colors_in=contact_colors,
        stable_slots=not _has_mesh(state.shapes),
        pair_slots=use_pair_slots,
        layout_valid=pairs.valid if use_pair_slots else None,
        stable_hint=(bp_path == 0) if use_pair_slots else None,
        gs_tail_window=config.gs_tail_window,
        gs_split=config.gs_split,
        cache_in=state.solve_cache if warmstart else None,
        presorted=presorted,
        # the per-class window ladder shards too (each rung splits across
        # the mesh with a per-rung psum — solve() rounds rungs up to
        # device-count multiples); chained/pair-slot stay unsharded
        gs_windows=config.gs_windows,
        shard=shard,
        fused=use_fused,
        fused_rung0=config.gs_rung0,
        fused_class_counts=fused_class_counts,
        fused_pallas=config.gs_fused_pallas,
        chained=config.gs_chained,
        rhs_in_rung=config.gs_rhs_in_rung,
        static_layout=_swin if use_static_slots else None,
    )
    new_bodies = Bodies(poses, vels, bodies.local_mprops, bodies.kinematic)
    counts = jnp.concatenate([
        jnp.stack([pairs.count, contact_count, max_class[0],
                   bp_path, max_class[1]]), np_needed,
        # ladder mode: per-class counts ride along for window re-bucketing
        max_class[2:].astype(jnp.int32)])
    return PhysicsState(new_bodies, state.shapes, cons, counts,
                        state.joints, colors,
                        pairs if config.bp_slack > 0 else None, bp_ref,
                        bp_colors if config.bp_slack > 0 else None,
                        solve_cache)


@functools.partial(jax.jit, static_argnames=("params", "config", "n_steps"))
def multi_step(state: PhysicsState, params: SimParams, config: PipelineConfig,
               n_steps: int) -> PhysicsState:
    """Advance ``n_steps`` frames inside one compiled program (lax.scan) —
    amortizes dispatch overhead for serving/benchmark loops. Requires a
    warmed state (prev_constraints present) so the carry structure is fixed.
    """
    # must mirror step()'s gating exactly (incl. gs_cmax > 0) or the
    # burn-in below runs a spurious extra frame waiting for a cache that
    # step never populates (multi_step(n) would then advance n+1 frames)
    color_with_bp = (config.bp_slack > 0 and not config.use_jacobi
                     and config.gs_cmax > 0 and not _has_mesh(state.shapes))
    needs_bp_cache = config.bp_slack > 0 and (
        state.bp_pairs is None
        or state.bp_pairs.body_a.shape[0] != config.pair_capacity
        or (color_with_bp and state.bp_colors is None))
    expected_counts = 8 + ((config.max_colors + 2)
                           if (config.gs_windows and not config.use_jacobi)
                           else 0)
    if (state.prev_constraints is None or state.prev_colors is None
            or needs_bp_cache or state.pair_count.shape[0] != expected_counts
            or (config.bp_slack <= 0 and state.bp_pairs is not None)):
        state = step(state, params, config,
                     warmstart=state.prev_constraints is not None)

    def body(s, _):
        return step(s, params, config, warmstart=True), None

    out, _ = jax.lax.scan(body, state, None, length=n_steps)
    return out


def fine_bucket(n: int, *, floor: int = 2048, quantum: int = 1024,
                headroom: float = 1.10) -> int:
    """Fine-grained capacity bucket: ``headroom``·n rounded up to a
    ``quantum`` multiple (see ``PipelineConfig.fine_capacities``)."""
    return max(floor, -(-int(int(n) * headroom) // quantum) * quantum)


def step_checked(state: PhysicsState, params: SimParams,
                 config: PipelineConfig, stats: RunStats | None = None):
    """Host wrapper: step, then re-bucket pair capacity and re-run if the
    broad phase overflowed (≙ pipeline.rs:500-545 resize + re-run). Returns
    ``(state, config)`` — the possibly-enlarged config keys the jit cache."""
    first_frame = state.prev_constraints is None
    new = step(state, params, config, warmstart=not first_frame)
    counts = np.array(new.pair_count)  # writable copy (asarray is read-only)
    regrow = {}
    if int(counts[0]) < 0:  # broad-phase budget overflow → widen budgets
        # bounded growth: repeated transient overflows (a settling pile's
        # churn phase) must not compound into huge candidate buffers — two
        # uncapped doublings once produced a 21 GB grid-BP allocation
        grown = {
            "broad_phase_max_per_row": min(
                config.broad_phase_max_per_row * 2, 512),
            "bp_cell_cap": min(config.bp_cell_cap * 2, 32),
            "bp_global_cap": min(config.bp_global_cap * 2, 64),
            "bp_cand_budget": min(config.bp_cand_budget * 3 // 2, 432),
        }
        if all(getattr(config, k) == v for k, v in grown.items()):
            # every budget knob is already at its cap but the grid still
            # overflows: the sign-flipped count below would look healthy.
            # Surface it (stats + warning) and drop the overflowed pair
            # list from the BP cache so bp_slack cannot freeze the
            # truncation in — next frame takes the refresh path.
            if stats is not None:
                stats.bump("bp_budget_saturated")
            import warnings

            warnings.warn(
                "broad-phase budgets saturated at their caps while still "
                "overflowing; pair list may be truncated this frame")
            if new.bp_ref is not None:
                # invalidate in-place (keeps the pytree structure → no new
                # trace): an empty reference box can never contain an AABB
                bad_ref = (jnp.full_like(new.bp_ref[0], jnp.inf),
                           jnp.full_like(new.bp_ref[1], -jnp.inf))
                new = dataclasses.replace(new, bp_ref=bad_ref)
        else:
            regrow.update(grown)
        counts[0] = -counts[0]
    bucket = fine_bucket if config.fine_capacities else \
        (lambda n: capacity_bucket(n))
    if int(counts[0]) > config.pair_capacity:
        regrow["pair_capacity"] = bucket(int(counts[0]))
    if (config.contact_capacity and not config.gs_fused
            and not config.gs_pair_slots
            and int(counts[1]) > config.contact_capacity):
        # (fused layout sizes the buffer from the rungs; pair-slot layout
        # spans pair_capacity — neither uses this knob)
        regrow["contact_capacity"] = bucket(int(counts[1]))
    if config.gs_cmax and int(counts[2]) > config.gs_cmax:
        regrow["gs_cmax"] = capacity_bucket(int(counts[2]), floor=256)
    if (config.gs_tail_window and len(counts) > 4
            and int(counts[4]) > config.gs_tail_window):
        regrow["gs_tail_window"] = capacity_bucket(int(counts[4]), floor=256)
    # narrow-phase compaction demand (unclamped match counts): a saturated
    # capacity silently drops contacts, so regrow it like the others
    if len(counts) > 7:
        for i, knob in ((5, "bc_pair_capacity"), (6, "sat_pair_capacity"),
                        (7, "pfm_pair_capacity")):
            cap = getattr(config, knob)
            if cap and int(counts[i]) > cap:
                regrow[knob] = capacity_bucket(int(counts[i]), floor=256)
    # GS window-ladder re-bucketing: class c's rung must hold its count
    # (plus 25% headroom so steady-state jitter doesn't thrash recompiles);
    # rungs only grow — class shrink just wastes masked rows until the next
    # explicit re-settle
    if config.gs_windows and len(counts) >= 8 + config.max_colors + 2:
        cc = counts[8:8 + config.max_colors + 2]
        rungs = list(config.gs_windows[:config.max_colors])
        while len(rungs) < config.max_colors:
            rungs.append(rungs[-1] if rungs else 256)
        changed = False
        q = config.gs_rung_quantum
        hr = config.gs_rung_headroom
        for c in range(config.max_colors):
            occ = int(cc[c + 1])
            if occ > rungs[c]:
                # quantum-granular with headroom: the whole point of the
                # ladder is window rows ≈ class rows, so the coarse 1.5x
                # capacity buckets (which overshot to MORE total rows than
                # the uniform split scheme) are wrong here
                rungs[c] = max(q, -(-int(occ * hr) // q) * q)
                changed = True
        if not config.gs_fused:
            # prune rungs past the last occupied class (keep ONE spare as
            # flicker hysteresis): the chained/unrolled ladder pays every
            # nonzero rung at trace time, and a fresh recolor typically
            # occupies fewer classes than the seeded max_colors ladder. A
            # class reappearing past the spare is parked one frame and the
            # grow loop above restores its rung.
            last = max((c for c in range(config.max_colors)
                        if int(cc[c + 1]) > 0), default=-1)
            for c in range(last + 2, config.max_colors):
                if rungs[c]:
                    rungs[c] = 0
                    changed = True
        if changed:
            regrow["gs_windows"] = tuple(rungs)
        # fused layout: the residue class (color 0) has its own static
        # budget — grow it the same way (overflow drops contacts)
        if config.gs_fused and int(cc[0]) > config.gs_rung0:
            regrow["gs_rung0"] = max(
                256, -(-int(cc[0]) * 23 // 20 // 256) * 256)
    if config.gs_static_slots and config.gs_windows:
        # static rung placement needs pair_capacity ≥ Σwindows + tail
        # (grow-only, same bucketing as the count-driven regrow)
        rungs_now = (regrow.get("gs_windows")
                     or config.gs_windows)[:config.max_colors]
        need = sum(rungs_now) + 256
        have = regrow.get("pair_capacity", config.pair_capacity)
        if have < need:
            regrow["pair_capacity"] = max(bucket(need), have)
    if regrow:
        config = dataclasses.replace(config, **regrow)
        if stats is not None:
            stats.bump("capacity_regrowths")
        new = step(state, params, config, warmstart=not first_frame)
    if stats is not None:
        stats.bump("steps")
    return new, config
