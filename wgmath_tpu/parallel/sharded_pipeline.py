"""Full-pipeline multi-chip step (round 2; supersedes the reduced demo in
``parallel/sharded.py`` which remains for the body-sharded brute-force
variant and its exactness tests).

Design — replicated STATE, sharded WORK:

The reference is single-device, so scale-out is an additive design (SURVEY
§2.5). At rigid-body scales the state is tiny (10k bodies ≈ 1 MB of poses/
velocities) while the WORK is quadratic-ish (broad-phase rows, narrow-phase
pairs, GS color windows). The TPU-native decomposition therefore keeps the
full ``PhysicsState`` bitwise-replicated on every device and splits the
three dominant phases across the ICI mesh:

- broad phase: each device owns a body-row block of the grid/brute pass
  (the cell table is body-global and replicated — it is O(N log N) and
  cheap); per-block pair lists ride ONE tiled all-gather (3 ints/pair).
- narrow phase: each device processes a pair block; contact manifolds ride
  one tiled all-gather (pair-type compactions scatter back to their pair
  slots, so the gathered buffer is slot-identical to single-chip).
- solver: per-color GS windows split evenly across devices with one psum
  of velocity deltas per color — exact (same-color constraints share no
  dynamic body), verified bitwise vs the sequential sweep in
  tests/test_parallel.py.

Everything else — the slack/velocity BP cache and its cond, incremental
repair, pair-graph recoloring, color-major compaction, warmstart transfer,
constraint build, joints, integration — runs replicated and deterministic,
so every device's carried state stays bitwise-identical with NO additional
communication: total per-step ICI traffic is the two pair/contact
all-gathers plus one small psum per GS color iteration. (No per-step body
or AABB gather at all — the round-1 design's full ``Bodies`` + contact
all-gather from HBM-sharded state cost more ICI than this and scaled
nothing but memory, which is not the scarce resource.)

This is the production scale-out path: it accepts the SAME PipelineConfig
(grid broad phase, bp_slack cache, warmstart, joints, capacity signals) and
produces results matching the single-device ``pipeline.step`` exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wgmath_tpu.dynamics.sim_params import SimParams
from wgmath_tpu.pipeline import PhysicsState, PipelineConfig, step

try:  # jax >= 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def replicate_state(state: PhysicsState, mesh: Mesh) -> PhysicsState:
    """Place every leaf replicated on the mesh."""
    return jax.device_put(
        state, jax.tree.map(lambda _: NamedSharding(mesh, P()), state))


def make_sharded_step(mesh: Mesh, params: SimParams, config: PipelineConfig,
                      *, n_steps: int = 1):
    """Build a jitted multi-chip step: ``fn(state) -> state`` advancing
    ``n_steps`` frames with the full pipeline sharded over ``mesh``'s first
    axis. State must be replicated (``replicate_state``)."""
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    assert config.pair_capacity % n_dev == 0
    shard = (axis, n_dev)

    def local(state: PhysicsState) -> PhysicsState:
        def body(s, _):
            return step.__wrapped__(s, params, config, warmstart=True,
                                    shard=shard), None

        # first step unscanned: the sharded solve rounds its color-window
        # caches to the device count, so a single-device-warmed cache
        # changes shape once — after that the scan carry is stable
        out, _ = body(state, None)
        if n_steps > 1:
            out, _ = jax.lax.scan(body, out, None, length=n_steps - 1)
        return out

    @jax.jit
    def run(state: PhysicsState) -> PhysicsState:
        specs = jax.tree.map(lambda _: P(), state)
        try:
            fn = shard_map(local, mesh=mesh, in_specs=(specs,),
                           out_specs=specs, check_vma=False)
        except TypeError:  # older jax: the kwarg was named check_rep
            fn = shard_map(local, mesh=mesh, in_specs=(specs,),
                           out_specs=specs, check_rep=False)
        return fn(state)

    return run
