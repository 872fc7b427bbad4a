"""Brute-force broad phase (≙ wgparry broad_phase/brute_force_broad_phase.rs:38-93
+ brute_force_broad_phase.wgsl).

The reference tests all O(n²) AABB pairs with one thread per pair and
atomic-appends hits. TPU-native: row-blocked pairwise overlap matrices
(VPU-friendly [block, N] comparisons) with cumsum+scatter compaction into a
fixed-capacity pair buffer — the masked-static-shape replacement for atomic
append + indirect dispatch (SURVEY §2.5). Overflow is reported via the
returned count; the caller re-buckets capacity and re-runs (the analog of the
reference's reallocate-and-rerun, pipeline.rs:505-545).

``find_pairs_partial`` tests a row *slice* against all columns — the unit of
multi-chip sharding: each device owns a contiguous row block and finds every
pair (i, j) with i in its block and i < j globally.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax import tree_util

from wgmath_tpu.core.dispatch import cdiv


@tree_util.register_pytree_node_class
@dataclasses.dataclass
class PairList:
    """Fixed-capacity collision pair buffer + device count."""

    body_a: jax.Array  # i32 [C]
    body_b: jax.Array  # i32 [C]
    valid: jax.Array  # bool [C]
    count: jax.Array  # i32 [] — true number of overlaps found (may exceed C)

    def tree_flatten(self):
        return (self.body_a, self.body_b, self.valid, self.count), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def capacity(self):
        return self.body_a.shape[0]


@functools.partial(jax.jit,
                   static_argnames=("capacity", "block", "max_per_row"))
def find_pairs(mins: jax.Array, maxs: jax.Array, *, capacity: int,
               active=None, block: int = 256, max_per_row: int = 64,
               ball_radius=None, margin: float = 0.0,
               dynamic=None) -> PairList:
    """All overlapping AABB pairs (i < j), compacted into ``capacity`` slots.

    ``ball_radius``: optional [N] array, NaN for non-ball colliders. When
    given, ball-ball candidates use the *exact* sphere-sphere test instead of
    the conservative AABB box — on the VPU the exact test costs the same as
    the box test and cuts the pair list (and all downstream per-pair work)
    several-fold in ball-heavy scenes.

    ``dynamic``: optional [N] bool; when given, pairs where BOTH bodies are
    static are dropped (overlapping static geometry — ground, walls — can
    never produce an acting contact and would spam hub-row budgets).
    """
    return find_pairs_partial(mins, maxs, 0, mins, maxs, capacity=capacity,
                              row_active=active, col_active=active,
                              block=block, max_per_row=max_per_row,
                              ball_radius=ball_radius, margin=margin,
                              dynamic=dynamic)


@functools.partial(jax.jit,
                   static_argnames=("capacity", "block", "max_per_row",
                                    "margin"))
def find_pairs_partial(row_mins: jax.Array, row_maxs: jax.Array,
                       row_offset, mins: jax.Array, maxs: jax.Array, *,
                       capacity: int, row_active=None, col_active=None,
                       block: int = 256, max_per_row: int = 32,
                       ball_radius=None, row_ball_radius=None,
                       margin: float = 0.0, dynamic=None,
                       row_dynamic=None) -> PairList:
    """Pairs (i, j) with i ∈ [row_offset, row_offset+R), j global, i < j.

    ``row_offset`` may be a traced scalar (device index × shard size under
    shard_map).

    Compaction is two-level to keep scatters tiny (XLA TPU scatter cost is
    ∝ index count): a per-row ``top_k`` extracts up to ``max_per_row``
    overlapping columns (a vectorized sort, not a scatter), then only the
    [block × max_per_row] survivors scatter into the output buffer. Rows
    with more than ``max_per_row`` overlaps signal through ``count`` so the
    host re-buckets (they only occur in pathologically dense scenes).
    """
    r = row_mins.shape[0]
    n = mins.shape[0]
    nb = cdiv(r, block)
    pad = nb * block - r
    big = jnp.float32(3.0e38)
    rmins_p = jnp.pad(row_mins, ((0, pad), (0, 0)), constant_values=big)
    rmaxs_p = jnp.pad(row_maxs, ((0, pad), (0, 0)), constant_values=-big)
    if row_active is None:
        row_active = jnp.ones((r,), bool)
    if col_active is None:
        col_active = jnp.ones((n,), bool)
    ract_p = jnp.pad(row_active, (0, pad), constant_values=False)
    if dynamic is not None:
        rdyn = jnp.asarray(dynamic if row_dynamic is None else row_dynamic)
        rdyn_p = jnp.pad(rdyn, (0, pad), constant_values=False)
    row_offset = jnp.asarray(row_offset, jnp.int32)

    cols = jnp.arange(n, dtype=jnp.int32)
    kk = min(max_per_row, n)
    if ball_radius is not None:
        centers = 0.5 * (mins + maxs)
        row_rad = (ball_radius if row_ball_radius is None
                   else row_ball_radius)
        rad_p = jnp.pad(jnp.asarray(row_rad), (0, pad),
                        constant_values=jnp.nan)
        cen_p = 0.5 * (rmins_p + rmaxs_p)

    def scan_block(carry, ib):
        out_a, out_b, emit_count, true_count, row_overflow = carry
        local_rows = ib * block + jnp.arange(block, dtype=jnp.int32)
        grows = row_offset + local_rows
        rmin = rmins_p[local_rows]  # [B, dim]
        rmax = rmaxs_p[local_rows]
        overlap = jnp.all(
            (rmin[:, None, :] <= maxs[None, :, :])
            & (mins[None, :, :] <= rmax[:, None, :]), axis=-1)
        if ball_radius is not None:
            # exact sphere-sphere prefilter where both sides are balls
            rr = rad_p[local_rows]
            d2 = jnp.sum((cen_p[local_rows][:, None, :]
                          - centers[None, :, :]) ** 2, axis=-1)
            lim = rr[:, None] + jnp.asarray(ball_radius)[None, :] + margin
            sphere_hit = d2 <= lim * lim
            both_balls = jnp.isfinite(lim)
            overlap = jnp.where(both_balls, overlap & sphere_hit, overlap)
        # each unordered pair is emitted by its HIGHER-index row: hub
        # colliders (large statics like the ground) live at low indices by
        # scene-builder convention, so their hundreds of partners emit from
        # the partners' rows and per-row budgets stay small
        m = overlap & (grows[:, None] > cols[None, :])
        m &= ract_p[local_rows][:, None] & col_active[None, :]
        if dynamic is not None:
            m &= rdyn_p[local_rows][:, None] | jnp.asarray(dynamic)[None, :]

        row_counts = jnp.sum(m, axis=-1, dtype=jnp.int32)  # [B]
        row_overflow |= jnp.any(row_counts > kk)
        # per-row hit extraction: top-k over (hit ? N - col : 0)
        score = jnp.where(m, n - cols[None, :], 0)
        top, _ = jax.lax.top_k(score, kk)  # [B, kk]
        hit = top > 0
        b_ids = n - top  # recover column ids
        a_ids = jnp.broadcast_to(grows[:, None], (block, kk))

        flat_hit = hit.reshape(-1)
        local = jnp.cumsum(flat_hit.astype(jnp.int32)) - 1
        pos = jnp.where(flat_hit, emit_count + local, capacity)
        pos = jnp.where(pos < capacity, pos, capacity)  # overflow → dropped
        out_a = out_a.at[pos].set(a_ids.reshape(-1), mode="drop")
        out_b = out_b.at[pos].set(b_ids.reshape(-1), mode="drop")
        emit_count = emit_count + jnp.sum(flat_hit, dtype=jnp.int32)
        true_count = true_count + jnp.sum(row_counts)
        return (out_a, out_b, emit_count, true_count, row_overflow), None

    # seed the carry with row_offset*0 so its varying-axis type matches the
    # loop body under shard_map (row_offset is device-varying there)
    taint = row_offset * 0
    init = (jnp.zeros(capacity, jnp.int32) + taint,
            jnp.zeros(capacity, jnp.int32) + taint,
            jnp.int32(0) + taint,
            jnp.int32(0) + taint,
            (taint != 0))
    (out_a, out_b, emit_count, true_count, row_overflow), _ = jax.lax.scan(
        scan_block, init, jnp.arange(nb, dtype=jnp.int32))
    valid = jnp.arange(capacity) < jnp.minimum(emit_count, capacity)
    # row overflow (a row had more than max_per_row hits → pairs dropped)
    # signals with a NEGATIVE count so the host grows max_per_row, distinct
    # from plain capacity overflow (count > capacity)
    count = jnp.where(row_overflow, -jnp.maximum(true_count, 1), true_count)
    # normalize to (a < b) for downstream pair-key matching
    lo = jnp.minimum(out_a, out_b)
    hi = jnp.maximum(out_a, out_b)
    return PairList(lo, hi, valid, count)
