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


@functools.partial(jax.jit, static_argnames=("capacity", "block"))
def find_pairs(mins: jax.Array, maxs: jax.Array, *, capacity: int,
               active=None, block: int = 256) -> PairList:
    """All overlapping AABB pairs (i < j), compacted into ``capacity`` slots."""
    return find_pairs_partial(mins, maxs, 0, mins, maxs, capacity=capacity,
                              row_active=active, col_active=active,
                              block=block)


@functools.partial(jax.jit, static_argnames=("capacity", "block"))
def find_pairs_partial(row_mins: jax.Array, row_maxs: jax.Array,
                       row_offset, mins: jax.Array, maxs: jax.Array, *,
                       capacity: int, row_active=None, col_active=None,
                       block: int = 256) -> PairList:
    """Pairs (i, j) with i ∈ [row_offset, row_offset+R), j global, i < j.

    ``row_offset`` may be a traced scalar (device index × shard size under
    shard_map).
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
    row_offset = jnp.asarray(row_offset, jnp.int32)

    cols = jnp.arange(n, dtype=jnp.int32)

    def scan_block(carry, ib):
        out_a, out_b, count = carry
        local_rows = ib * block + jnp.arange(block, dtype=jnp.int32)
        grows = row_offset + local_rows
        rmin = rmins_p[local_rows]  # [B, dim]
        rmax = rmaxs_p[local_rows]
        overlap = jnp.all(
            (rmin[:, None, :] <= maxs[None, :, :])
            & (mins[None, :, :] <= rmax[:, None, :]), axis=-1)
        m = overlap & (grows[:, None] < cols[None, :])
        m &= ract_p[local_rows][:, None] & col_active[None, :]
        flat = m.reshape(-1)
        a_flat = jnp.broadcast_to(grows[:, None], m.shape).reshape(-1)
        b_flat = jnp.broadcast_to(cols[None, :], m.shape).reshape(-1)
        local = jnp.cumsum(flat.astype(jnp.int32)) - 1
        pos = jnp.where(flat, count + local, capacity)
        pos = jnp.where(pos < capacity, pos, capacity)  # overflow → dropped
        out_a = out_a.at[pos].set(a_flat, mode="drop")
        out_b = out_b.at[pos].set(b_flat, mode="drop")
        count = count + jnp.sum(flat, dtype=jnp.int32)
        return (out_a, out_b, count), None

    # seed the carry with row_offset*0 so its varying-axis type matches the
    # loop body under shard_map (row_offset is device-varying there)
    taint = row_offset * 0
    init = (jnp.zeros(capacity, jnp.int32) + taint,
            jnp.zeros(capacity, jnp.int32) + taint,
            jnp.int32(0) + taint)
    (out_a, out_b, count), _ = jax.lax.scan(
        scan_block, init, jnp.arange(nb, dtype=jnp.int32))
    valid = jnp.arange(capacity) < jnp.minimum(count, capacity)
    return PairList(out_a, out_b, valid, count)
