"""Uniform-grid broad phase — sort-based spatial hashing.

Functional upgrade over the reference's brute-force/LBVH broad phases
(broad_phase/brute_force_broad_phase.rs, lbvh.rs): same contract (all
overlapping AABB pairs, fixed-capacity output, overflow via count), but
O(N·27·cell_cap) instead of O(N²). The TPU recipe is the classic GPU
particle-grid method recast as sorts and gathers (no atomics, no
data-dependent shapes):

1. pick ``cell_size`` ≥ every "small" body's AABB extent (a high percentile
   of the extent distribution, so outliers don't blow up cell occupancy);
   larger bodies go to a dense side list (``global_cap``),
2. sort bodies by packed integer cell key,
3. each body binary-searches its 27 (3D) / 9 (2D) neighbor cells in the
   sorted keys and reads up to ``cell_cap`` occupants per cell,
4. exact AABB (and optional exact sphere-sphere) tests on the candidates,
5. per-body ``top_k`` extracts up to ``max_per_body`` hits, then one small
   cumsum+scatter compacts them into the output buffer.

Cell-key wraparound (coordinates are hashed into 10 bits per axis) can only
*add* candidates — they are removed by the exact AABB test — and duplicate
neighbor keys (two offsets wrapping onto the same cell) are masked so no
pair is emitted twice.

Overflow protocol matches brute_force.find_pairs: ``count`` is the true pair
count, negative when any per-body/cell/global budget was exceeded (the host
doubles the budgets and re-runs, ≙ pipeline.rs:505-545 reallocate-and-rerun).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from wgmath_tpu.broad_phase.brute_force import PairList
from wgmath_tpu.core.module import KernelModule, register_module


def _neighbor_offsets(dim: int) -> jnp.ndarray:
    rng = jnp.arange(-1, 2)
    if dim == 3:
        g = jnp.stack(jnp.meshgrid(rng, rng, rng, indexing="ij"), -1)
        return g.reshape(27, 3)
    g = jnp.stack(jnp.meshgrid(rng, rng, indexing="ij"), -1)
    return g.reshape(9, 2)


def _pack_key(cells: jax.Array) -> jax.Array:
    """Pack per-axis cell coords into one i32 key (10 bits/axis 3D,
    15 bits/axis 2D). Wraparound collisions are safe (extra candidates only).
    """
    dim = cells.shape[-1]
    if dim == 3:
        c = cells & 1023
        return c[..., 0] | (c[..., 1] << 10) | (c[..., 2] << 20)
    c = cells & 32767
    return c[..., 0] | (c[..., 1] << 15)


@functools.partial(jax.jit, static_argnames=("capacity", "max_per_body",
                                             "cell_cap", "global_cap",
                                             "cand_budget", "row_count"))
def find_pairs_grid(mins: jax.Array, maxs: jax.Array, *, capacity: int,
                    max_per_body: int = 16, cell_cap: int = 8,
                    global_cap: int = 64, cand_budget: int = 48,
                    active=None,
                    ball_radius=None, margin: float = 0.0,
                    dynamic=None, row_offset=None,
                    row_count: int | None = None) -> PairList:
    """All overlapping AABB pairs (i < j) via the sorted uniform grid.

    ``dynamic``: optional [N] bool — static-static pairs are dropped (see
    brute_force.find_pairs).

    ``row_offset``/``row_count``: optional row block — only rows in
    [offset, offset+count) emit pairs (each pair from its HIGHER body
    index, so disjoint blocks partition the pair set exactly). The cell
    table stays body-global; the multi-chip path gives each device one
    block and all-gathers the per-block pair lists."""
    n, dim = mins.shape
    n_off = 27 if dim == 3 else 9
    if active is None:
        active = jnp.ones((n,), bool)

    ext = maxs - mins
    ext_max = jnp.max(ext, axis=-1)
    # Global bodies = genuine OUTLIERS (> 3x the median extent: grounds,
    # walls, huge meshes), not a fixed percentile. The old "92nd percentile
    # is the cell size, anything above is global" rule was degenerate for
    # uniform-extent populations: the 42.9k cuboid pyramid's boxes all
    # share extent ~1.0 at rest, so the first frames' tiny tilts sent an
    # ARBITRARY ~8% of 43k bodies (>> global_cap) to the global list —
    # overflow, truncated pairs, bottom layers lost support and the
    # pyramid free-fell through itself (round-5 root cause). Spheres never
    # showed it (rotation-invariant AABBs).
    ext_sorted = jnp.sort(jnp.where(active, ext_max, jnp.inf))
    med = ext_sorted[n // 2]
    glob_thr = jnp.where(jnp.isfinite(med), 3.0 * med, jnp.inf)
    is_global = active & (ext_max > glob_thr)
    # cell size = the largest NON-global extent, so every grid body fits
    # inside one cell and the ±1-cell neighbor scan keeps its exactness
    # invariant (a grid pair's centers lie within one cell of each other).
    cell = (jnp.max(jnp.where(active & ~is_global, ext_max, 0.0))
            * 1.0001 + 1e-6)
    center = 0.5 * (mins + maxs)
    n_glob = jnp.sum(is_global.astype(jnp.int32))
    glob_overflow = n_glob > global_cap
    gcap = min(global_cap, n)
    gscore = jnp.where(is_global, n - jnp.arange(n), 0)
    gtop, _ = jax.lax.top_k(gscore, gcap)
    g_ids = jnp.where(gtop > 0, n - gtop, n - 1)  # [G]
    g_valid = gtop > 0

    # --- grid side: small active bodies only
    in_grid = active & ~is_global
    cells = jnp.floor(center / cell).astype(jnp.int32)
    key = jnp.where(in_grid, _pack_key(cells), jnp.int32(0x7FFFFFFF))
    ids = jnp.arange(n, dtype=jnp.int32)
    skey, sid = jax.lax.sort_key_val(key, ids)

    # --- optional row block (multi-chip: each device owns a row slice;
    # the cell table above is body-global). row_count is static so shapes
    # stay fixed; row_offset may be traced (lax.axis_index).
    if row_count is None:
        nr = n
        r_ids = ids
        rsl = lambda x: x
        r_active = active
    else:
        nr = row_count
        roff = jnp.asarray(row_offset, jnp.int32)
        r_ids = roff + jnp.arange(nr, dtype=jnp.int32)
        r_clamp = jnp.minimum(r_ids, n - 1)
        # index-gather (not dynamic_slice): blocks may run past n when
        # ceil(n / n_devices) tiles don't divide evenly — the overhang rows
        # are masked inactive, so any block partition stays exact
        rsl = lambda x: x[r_clamp]
        r_active = active[r_clamp] & (r_ids < n)
    r_cells = rsl(cells)
    r_mins, r_maxs, r_center = rsl(mins), rsl(maxs), rsl(center)
    r_is_global = rsl(is_global)

    offs = _neighbor_offsets(dim)  # [O, dim]
    nkeys = _pack_key(r_cells[:, None, :] + offs[None, :, :])  # [NR, O]
    # mask neighbor offsets whose wrapped key repeats an earlier offset
    dup = (nkeys[:, :, None] == nkeys[:, None, :])
    earlier = jnp.tril(jnp.ones((n_off, n_off), bool), k=-1)
    fresh = ~jnp.any(dup & earlier[None], axis=-1)  # [N, O]

    # one sort-based searchsorted (the default binary-search lowering costs
    # ~50 ms at this size on TPU; the merge-sort variant is ~10x cheaper),
    # then per-position run lengths replace the second (side="right") search
    lo = jnp.searchsorted(skey, nkeys.reshape(-1),
                          method="sort").reshape(nr, n_off)
    spos = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones(1, bool), skey[1:] != skey[:-1]])
    start_of_run = jax.lax.cummax(jnp.where(is_start, spos, 0))
    is_end = jnp.concatenate([skey[1:] != skey[:-1], jnp.ones(1, bool)])
    end_of_run = jax.lax.cummin(jnp.where(is_end, spos, n - 1), reverse=True)
    run_len = end_of_run - start_of_run + 1  # [N] length of this key's run
    lo_c = jnp.minimum(lo, n - 1)
    found = skey[lo_c] == nkeys
    cnt = jnp.where(found, run_len[lo_c], 0)  # [N, O]
    cell_overflow = jnp.any(cnt > cell_cap)

    slots = jnp.arange(cell_cap, dtype=jnp.int32)
    pos = lo[:, :, None] + slots[None, None, :]  # [N, O, K]
    in_cell = (slots[None, None, :] < cnt[:, :, None]) & fresh[:, :, None]
    pos = jnp.minimum(pos, n - 1)

    # pre-compact candidates BEFORE any body-data gathers: most of the
    # n_off × cell_cap slots are empty, and TPU gather cost is per row — an
    # int16 top_k over the occupancy mask shrinks the gather volume ~7x
    wide = n_off * cell_cap
    c_budget = min(cand_budget, wide)
    sdt = jnp.int16 if wide < 32000 else jnp.int32
    slot_ids = jnp.arange(wide, dtype=sdt)
    occ_score = jnp.where(in_cell.reshape(nr, wide), wide - slot_ids,
                          jnp.asarray(0, sdt))
    otop, osel = jax.lax.top_k(occ_score, c_budget)  # [N, B]
    cand_valid = otop > 0
    cand_overflow = jnp.any(
        jnp.sum(in_cell.reshape(nr, wide), axis=-1) > c_budget)
    pos_sel = jnp.take_along_axis(pos.reshape(nr, wide), osel, axis=1)
    cand_sel = sid[pos_sel]  # [N, B] — the only irregular id gather

    # append the dense global columns (globals never appear in the grid)
    gcols = jnp.broadcast_to(g_ids[None, :], (nr, gcap))
    gmask = jnp.broadcast_to(g_valid[None, :], (nr, gcap))
    cand_f = jnp.concatenate([cand_sel, gcols], axis=1)
    mask_f = jnp.concatenate([cand_valid, gmask], axis=1)
    w = cand_f.shape[1]
    n_grid_cols = c_budget

    rows = r_ids[:, None]
    # grid-grid pairs emit from the higher body index; pairs with a global
    # emit from the non-global side (globals never enter the grid, so a
    # column is global iff it's one of the appended dense columns),
    # global-global pairs from the higher index
    is_glob_row = r_is_global[:, None]
    grid_cols = jnp.arange(w) < n_grid_cols
    is_glob_col = ~grid_cols[None, :]
    order_ok = jnp.where(is_glob_col & ~is_glob_row, True, rows > cand_f)
    # inactive bodies never enter the grid or the global list, so no
    # per-column active gather is needed
    mask_f &= order_ok & (cand_f != rows) & r_active[:, None]
    # rows: grid bodies scan grid+globals; global rows scan globals only
    mask_f &= jnp.where(is_glob_row & grid_cols[None, :], False, True)

    # exact AABB overlap — all per-candidate body data rides ONE gather,
    # COMPONENT-MAJOR along the lane axis: take([D, n], idx, axis=1) keeps
    # the long candidate axis minormost, so nothing tile-pads. The earlier
    # row-major packed[cand_f] ([rows, w, 7]) padded its minor dim 7→128 —
    # an 18x HBM blowup that OOM'd the 43k pyramid (10.2 GB temp) and,
    # measured at bench scale (scripts/exp_bp_gather.py), was also 1.6x
    # SLOWER than the lane gather (12.05 vs 7.54 ms; per-component
    # element gathers read 107 ms — per-row cost dominates TPU gathers).
    packed_cols = [mins, maxs]
    if ball_radius is not None:
        rr = jnp.asarray(ball_radius)
        packed_cols += [center, rr[:, None]]
    if dynamic is not None:
        packed_cols += [jnp.asarray(dynamic, jnp.float32)[:, None]]
    packedT = jnp.concatenate(packed_cols, axis=-1).T  # [D, n]
    D = packedT.shape[0]
    if D % 8:  # sublane-align the component rows
        packedT = jnp.concatenate(
            [packedT, jnp.zeros((8 - D % 8, packedT.shape[1]),
                                packedT.dtype)])
    # direct 3-D take (indices stay [nr, w]): the flat-then-reshape form
    # let XLA pick a transposed {0,1} layout for the [8, nr*w] intermediate
    # at 43k scale — minor dim 8 → 16x tile padding, 10 GB temp, HBM OOM.
    # With the candidate axis minormost nothing pads.
    cd = jnp.take(packedT, cand_f, axis=1, mode="clip")  # [D8, nr, w]
    if dynamic is not None:
        mask_f &= rsl(jnp.asarray(dynamic))[:, None] | (cd[D - 1] > 0.5)
    overlap = jnp.ones_like(mask_f)
    for a in range(dim):
        overlap &= ((r_mins[:, a:a + 1] <= cd[dim + a])
                    & (cd[a] <= r_maxs[:, a:a + 1]))
    if ball_radius is not None:
        d2 = jnp.zeros_like(cd[0])
        for a in range(dim):
            da = r_center[:, a:a + 1] - cd[2 * dim + a]
            d2 += da * da
        lim = rsl(rr)[:, None] + cd[3 * dim] + margin
        sphere_hit = d2 <= lim * lim
        overlap = jnp.where(jnp.isfinite(lim), overlap & sphere_hit, overlap)
    mask_f &= overlap

    row_counts = jnp.sum(mask_f, axis=-1, dtype=jnp.int32)
    kk = min(max_per_body, w)
    row_overflow = jnp.any(row_counts > kk) | cand_overflow
    if kk * 4 >= w * 3:
        # budget nearly covers the candidate width — skip the final top_k
        hit = mask_f
        b_ids = cand_f
        kk = w
    else:
        score = jnp.where(mask_f, n - cand_f, 0)
        top, _ = jax.lax.top_k(score, kk)
        hit = top > 0
        b_ids = n - top
    a_ids = jnp.broadcast_to(r_ids[:, None], (nr, kk))

    flat_hit = hit.reshape(-1)
    local = jnp.cumsum(flat_hit.astype(jnp.int32)) - 1
    out_pos = jnp.where(flat_hit, local, capacity)
    out_pos = jnp.minimum(out_pos, capacity)
    out_a = jnp.zeros(capacity, jnp.int32).at[out_pos].set(
        a_ids.reshape(-1), mode="drop")
    out_b = jnp.zeros(capacity, jnp.int32).at[out_pos].set(
        b_ids.reshape(-1), mode="drop")
    emit = jnp.sum(flat_hit, dtype=jnp.int32)
    true_count = jnp.sum(row_counts)
    overflow = row_overflow | cell_overflow | glob_overflow
    count = jnp.where(overflow, -jnp.maximum(true_count, 1), true_count)
    valid = jnp.arange(capacity) < jnp.minimum(emit, capacity)
    lo_b = jnp.minimum(out_a, out_b)
    hi_b = jnp.maximum(out_a, out_b)
    return PairList(lo_b, hi_b, valid, count)


register_module(
    KernelModule(
        "broad_phase.grid",
        deps=("broad_phase.brute_force",),
        provides={"find_pairs_grid": find_pairs_grid},
        doc="Sorted uniform-grid broad phase (≙ LBVH find_pairs contract, "
            "lbvh.rs:285, with the particle-grid algorithm).",
    )
)
