"""Stage-level slope timing of the grid broad phase on the settled 10k state.

Each stage re-implements the grid BP up to a cut point and consumes its
outputs, so the slope difference between consecutive stages isolates that
stage's cost.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from scripts.profile_step import settled_state  # noqa: E402
from wgmath_tpu.broad_phase.grid import _neighbor_offsets, _pack_key  # noqa: E402
from wgmath_tpu.shapes.shape import ball_radii_or_nan, world_aabbs  # noqa: E402


def main():
    state, params, config = settled_state()
    shapes = state.shapes
    poses = state.bodies.poses
    mins, maxs = world_aabbs(shapes, poses, margin=params.prediction_distance)
    mins = jax.block_until_ready(mins)
    n, dim = mins.shape
    n_off = 27
    cell_cap = config.bp_cell_cap
    gcap = config.bp_global_cap

    def stages(mins, maxs, upto):
        ext = maxs - mins
        ext_max = jnp.max(ext, axis=-1)
        k90 = max(int(n * 0.92) - 1, 0)
        cell = jnp.sort(ext_max)[k90] * 1.0001 + 1e-6
        center = 0.5 * (mins + maxs)
        is_global = ext_max > cell
        if upto == "cellsize":
            return cell + jnp.sum(center) * 1e-9
        cells = jnp.floor(center / cell).astype(jnp.int32)
        key = jnp.where(~is_global, _pack_key(cells), jnp.int32(0x7FFFFFFF))
        ids = jnp.arange(n, dtype=jnp.int32)
        skey, sid = jax.lax.sort_key_val(key, ids)
        if upto == "sort":
            return cell + jnp.sum(skey) * 1e-9 + jnp.sum(sid) * 1e-9
        offs = _neighbor_offsets(dim)
        nkeys = _pack_key(cells[:, None, :] + offs[None, :, :])
        lo = jnp.searchsorted(skey, nkeys.reshape(-1)).reshape(n, n_off)
        hi = jnp.searchsorted(skey, nkeys.reshape(-1),
                              side="right").reshape(n, n_off)
        if upto == "search":
            return cell + jnp.sum(lo + hi) * 1e-9
        dup = (nkeys[:, :, None] == nkeys[:, None, :])
        earlier = jnp.tril(jnp.ones((n_off, n_off), bool), k=-1)
        fresh = ~jnp.any(dup & earlier[None], axis=-1)
        slots = jnp.arange(cell_cap, dtype=jnp.int32)
        pos = lo[:, :, None] + slots[None, None, :]
        in_cell = (pos < hi[:, :, None]) & fresh[:, :, None]
        pos = jnp.minimum(pos, n - 1)
        cand = sid[pos]
        if upto == "cand":
            return cell + jnp.sum(cand) * 1e-9 + jnp.sum(in_cell) * 1e-9
        cand_f = cand.reshape(n, n_off * cell_cap)
        mask_f = in_cell.reshape(n, n_off * cell_cap)
        cmins = mins[cand_f]
        cmaxs = maxs[cand_f]
        overlap = jnp.all((mins[:, None, :] <= cmaxs)
                          & (cmins <= maxs[:, None, :]), axis=-1)
        mask_f &= overlap & (cand_f < ids[:, None])
        if upto == "aabb":
            return cell + jnp.sum(mask_f) * 1e-9 + jnp.sum(cmins) * 1e-9
        score = jnp.where(mask_f, n - cand_f, 0)
        kk = min(config.broad_phase_max_per_row, score.shape[1])
        top, _ = jax.lax.top_k(score, kk)
        if upto == "topk":
            return cell + jnp.sum(top) * 1e-9
        hit = top > 0
        flat_hit = hit.reshape(-1)
        local = jnp.cumsum(flat_hit.astype(jnp.int32)) - 1
        out_pos = jnp.where(flat_hit, local, config.pair_capacity)
        out_b = jnp.zeros(config.pair_capacity, jnp.int32).at[out_pos].set(
            (n - top).reshape(-1), mode="drop")
        return cell + jnp.sum(out_b) * 1e-9

    for name in ("cellsize", "sort", "search", "cand", "aabb", "topk",
                 "scatter"):
        def make(k, name=name):
            @jax.jit
            def f(mins, maxs):
                def body(i, acc):
                    return acc + stages(mins + acc * 0, maxs, name)
                return jax.lax.fori_loop(0, k, body, 0.0)
            return f

        t = bench.slope_time(make, (mins, maxs), k_small=2, k_large=16,
                             reps=2)
        bench._log(f"{name}: {t * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
