"""Stage-level slope timing of the grid broad phase (current implementation).

Cut points mirror broad_phase/grid.py exactly; the delta between consecutive
stages isolates each stage's cost on the settled 10k state.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from scripts.profile_step import settled_state  # noqa: E402
from wgmath_tpu.broad_phase.grid import _neighbor_offsets, _pack_key  # noqa: E402
from wgmath_tpu.shapes.shape import ball_radii_or_nan, world_aabbs  # noqa: E402


def main():
    state, params, config = settled_state()
    shapes = state.shapes
    poses = state.bodies.poses
    mins0, maxs0 = world_aabbs(shapes, poses,
                               margin=params.prediction_distance)
    radii = ball_radii_or_nan(shapes, poses)
    mins0 = jax.block_until_ready(mins0)
    n, dim = mins0.shape
    n_off = 27
    cell_cap = config.bp_cell_cap
    gcap = config.bp_global_cap
    max_per_body = config.broad_phase_max_per_row
    margin = params.prediction_distance

    def stages(mins, maxs, upto):
        ext_max = jnp.max(maxs - mins, axis=-1)
        k90 = max(int(n * 0.92) - 1, 0)
        cell = jnp.sort(ext_max)[k90] * 1.0001 + 1e-6
        center = 0.5 * (mins + maxs)
        is_global = ext_max > cell
        gscore = jnp.where(is_global, n - jnp.arange(n), 0)
        gtop, _ = jax.lax.top_k(gscore, gcap)
        g_ids = jnp.where(gtop > 0, n - gtop, n - 1)
        g_valid = gtop > 0
        cells = jnp.floor(center / cell).astype(jnp.int32)
        key = jnp.where(~is_global, _pack_key(cells), jnp.int32(0x7FFFFFFF))
        ids = jnp.arange(n, dtype=jnp.int32)
        skey, sid = jax.lax.sort_key_val(key, ids)
        if upto == "sort":
            return jnp.sum(skey + sid) * 1e-9
        offs = _neighbor_offsets(dim)
        nkeys = _pack_key(cells[:, None, :] + offs[None, :, :])
        lo = jnp.searchsorted(skey, nkeys.reshape(-1),
                              method="sort").reshape(n, n_off)
        if upto == "search":
            return jnp.sum(lo) * 1e-9
        spos = jnp.arange(n, dtype=jnp.int32)
        is_start = jnp.concatenate([jnp.ones(1, bool), skey[1:] != skey[:-1]])
        start_of_run = jax.lax.cummax(jnp.where(is_start, spos, 0))
        is_end = jnp.concatenate([skey[1:] != skey[:-1], jnp.ones(1, bool)])
        end_of_run = jax.lax.cummin(jnp.where(is_end, spos, n - 1),
                                    reverse=True)
        run_len = end_of_run - start_of_run + 1
        lo_c = jnp.minimum(lo, n - 1)
        found = skey[lo_c] == nkeys
        cnt = jnp.where(found, run_len[lo_c], 0)
        dup = (nkeys[:, :, None] == nkeys[:, None, :])
        earlier = jnp.tril(jnp.ones((n_off, n_off), bool), k=-1)
        fresh = ~jnp.any(dup & earlier[None], axis=-1)
        slots = jnp.arange(cell_cap, dtype=jnp.int32)
        pos = lo[:, :, None] + slots[None, None, :]
        in_cell = (slots[None, None, :] < cnt[:, :, None]) & fresh[:, :, None]
        pos = jnp.minimum(pos, n - 1)
        if upto == "runlen":
            return jnp.sum(in_cell) * 1e-9 + jnp.sum(pos) * 1e-9
        wide = n_off * cell_cap
        c_budget = min(max(2 * max_per_body, 32), wide)
        slot_ids = jnp.arange(wide, dtype=jnp.int16)
        occ_score = jnp.where(in_cell.reshape(n, wide), wide - slot_ids,
                              jnp.asarray(0, jnp.int16))
        otop, osel = jax.lax.top_k(occ_score, c_budget)
        cand_valid = otop > 0
        pos_sel = jnp.take_along_axis(pos.reshape(n, wide), osel, axis=1)
        if upto == "precompact":
            return jnp.sum(pos_sel) * 1e-9 + jnp.sum(cand_valid) * 1e-9
        cand_sel = sid[pos_sel]
        if upto == "idgather":
            return jnp.sum(cand_sel) * 1e-9
        gcols = jnp.broadcast_to(g_ids[None, :], (n, gcap))
        gmask = jnp.broadcast_to(g_valid[None, :], (n, gcap))
        cand_f = jnp.concatenate([cand_sel, gcols], axis=1)
        mask_f = jnp.concatenate([cand_valid, gmask], axis=1)
        w = cand_f.shape[1]
        rows = ids[:, None]
        grid_cols = jnp.arange(w) < c_budget
        is_glob_col = ~grid_cols[None, :]
        order_ok = jnp.where(is_glob_col & ~is_global[:, None], True,
                             rows > cand_f)
        mask_f &= order_ok & (cand_f != rows)
        mask_f &= jnp.where(is_global[:, None] & grid_cols[None, :], False,
                            True)
        packed = jnp.concatenate([mins, maxs, center, radii[:, None]], -1)
        cdata = packed[cand_f]
        if upto == "datagather":
            return jnp.sum(cdata) * 1e-9 + jnp.sum(mask_f) * 1e-9
        cmins = cdata[..., :dim]
        cmaxs = cdata[..., dim:2 * dim]
        overlap = jnp.all((mins[:, None, :] <= cmaxs)
                          & (cmins <= maxs[:, None, :]), axis=-1)
        ccen = cdata[..., 2 * dim:3 * dim]
        crad = cdata[..., 3 * dim]
        d2 = jnp.sum((center[:, None, :] - ccen) ** 2, axis=-1)
        lim = radii[:, None] + crad + margin
        overlap = jnp.where(jnp.isfinite(lim), overlap & (d2 <= lim * lim),
                            overlap)
        mask_f &= overlap
        kk = min(max_per_body, w)
        score = jnp.where(mask_f, n - cand_f, 0)
        top, _ = jax.lax.top_k(score, kk)
        if upto == "test+topk":
            return jnp.sum(top) * 1e-9
        hit = top > 0
        flat_hit = hit.reshape(-1)
        local = jnp.cumsum(flat_hit.astype(jnp.int32)) - 1
        out_pos = jnp.where(flat_hit, local, config.pair_capacity)
        out_b = jnp.zeros(config.pair_capacity, jnp.int32).at[out_pos].set(
            (n - top).reshape(-1), mode="drop")
        return jnp.sum(out_b) * 1e-9

    for name in ("sort", "search", "runlen", "precompact", "idgather",
                 "datagather", "test+topk", "scatter"):
        def make(k, name=name):
            @jax.jit
            def f(mins, maxs):
                def body(i, acc):
                    return acc + stages(mins + acc * 0, maxs, name)
                return jax.lax.fori_loop(0, k, body, 0.0)
            return f

        t = bench.slope_time(make, (mins0, maxs0), k_small=2, k_large=16,
                             reps=2)
        bench._log(f"{name}: {t * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
