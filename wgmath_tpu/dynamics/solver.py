"""Contact solver: TGS-soft + pseudo-Jacobi (≙ wgrapier dynamics/solver.rs:47-467
+ solver.wgsl kernels).

TPU-native redesign of the reference's 16-kernel launch storm:

- The whole ``solve_tgs`` (4 substeps × {apply increments, relinearize,
  warmstart, biased GS per color, integrate, unbiased GS per color}) is ONE
  jitted program: the per-color sequencing is a ``lax.fori_loop`` with masked
  scatter updates instead of one kernel launch per color — eliminating the
  launch-count ∝ substeps × colors cost identified in SURVEY §3.1.
- Atomic body-constraint counting + prefix-sum + sort (solver.wgsl
  init_constraints/sort_constraints + WgPrefixSum) becomes a single
  ``lax.sort_key_val`` + ``segment_sum`` CSR build — sorting is the idiomatic
  TPU replacement for atomic-append (SURVEY §2.5).
- Graph coloring (≙ coloring.rs TOPO-GC/Luby with per-iteration readbacks)
  becomes a deterministic parallel claim scheme: per color, constraints
  scatter-min their index into a per-body slot and win if they own both
  slots; a few claim rounds per color densify the independent set. Fully
  on-device, zero readbacks.
- Scatter-adds replace atomics: within a color the independent set guarantees
  exact Gauss-Seidel; warmstarting (pure accumulation) needs no coloring at
  all because ``.at[].add`` handles duplicate indices deterministically.

The per-body "pseudo-Jacobi" variant (solver.wgsl step_jacobi:211-351, which
solves all constraints of one body sequentially with side-local impulse
copies) is reproduced with a bounded ``fori_loop`` over each body's CSR row.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from wgmath_tpu.dynamics.body import (
    Bodies,
    Velocity,
    WorldMassProperties,
    integrate_velocity,
    update_mprops,
)
from wgmath_tpu.dynamics.constraint import (
    ContactConstraints,
    Contacts,
    build_constraints,
    cap_magnitude,
    gdot,
    maybe_inv,
    remove_cfm_and_bias,
    sub_len,
    update_constraints,
    update_rhs_sorted,
)
from wgmath_tpu.dynamics.sim_params import SimParams


# ---------------------------------------------------------------------------
# CSR: body → constraint ids (replaces atomics + prefix sum + sort kernels)
# ---------------------------------------------------------------------------


def build_body_constraint_csr(cons: ContactConstraints, num_bodies: int):
    """Sorted (body → constraint, side) adjacency.

    Returns ``(entries, offsets, counts)``: ``entries[offsets[b] + k]`` is
    ``2*cid + side`` for the k-th constraint touching dynamic body ``b``.
    ≙ solver.wgsl init_constraints/sort_constraints + prefix sum, built with
    one sort instead of atomics.
    """
    c = cons.body_a.shape[0]
    dyn_a = jnp.any(cons.im_a != 0.0, axis=-1) & cons.valid
    dyn_b = jnp.any(cons.im_b != 0.0, axis=-1) & cons.valid
    sentinel = num_bodies
    key_a = jnp.where(dyn_a, cons.body_a, sentinel)
    key_b = jnp.where(dyn_b, cons.body_b, sentinel)
    keys = jnp.concatenate([key_a, key_b]).astype(jnp.int32)
    idx = jnp.arange(c, dtype=jnp.int32)
    vals = jnp.concatenate([idx * 2, idx * 2 + 1])
    sk, sv = jax.lax.sort_key_val(keys, vals)
    ones = (sk < sentinel).astype(jnp.int32)
    counts = jax.ops.segment_sum(ones, sk, num_segments=num_bodies + 1)[:num_bodies]
    offsets = jnp.concatenate([jnp.zeros(1, jnp.int32),
                               jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    return sv, offsets, counts


# ---------------------------------------------------------------------------
# Graph coloring (≙ dynamics/coloring.rs, device-resident, zero readbacks)
# ---------------------------------------------------------------------------


def color_pairs(body_a, body_b, valid, dyn_a, dyn_b, num_bodies: int,
                *, max_colors: int = 32, claim_rounds: int = 4,
                class_cap: int = 0):
    """Edge-color a body-pair graph (array-level core of
    ``color_constraints``; also used to color the broad-phase pair list
    directly). Coloring a SUPERSET graph stays valid for every subset, so
    pair-level colors cached alongside the slack-cached broad phase survive
    per-frame contact flicker — the reference recolors every frame
    (coloring.rs); here steady-state frames pay zero coloring."""
    from types import SimpleNamespace

    cons = SimpleNamespace(body_a=body_a, body_b=body_b, valid=valid)
    return _color_edges(cons, dyn_a, dyn_b, num_bodies,
                        max_colors=max_colors, claim_rounds=claim_rounds,
                        class_cap=class_cap)


def color_constraints(cons: ContactConstraints, num_bodies: int,
                      *, max_colors: int = 32, claim_rounds: int = 4,
                      class_cap: int = 0):
    """Assign colors 1..max_colors so same-color constraints share no dynamic
    body. Per color: constraints scatter-min their index into per-body slots;
    winners (owning both slots) take the color; repeated claim rounds densify.
    Leftovers after ``max_colors`` get the last color (solved with
    scatter-add — deterministic, Jacobi-flavored for that residue).

    The color loop is a ``while_loop`` that retires as soon as every valid
    constraint is colored — scenes with few colors pay only for those.
    Claims use Luby-style hashed priorities (≙ the reference's Luby MIS
    fallback, coloring.rs:127-196, minus its per-color readbacks): random
    local minima select a large independent set per round; the low 16 bits
    carry the constraint index so priorities are unique.

    ``claim_rounds=4`` saturates each color to a near-maximal independent
    set: on a jammed 10k-ball pair graph (58k pairs, max degree 19) it
    reaches 19 colors — the graph's chromatic-index lower bound — vs 21 at
    2 rounds; more rounds change nothing. Sweep cost ∝ colors, and the
    extra rounds only run on the (rare) full-recolor frames.

    ``class_cap`` > 0 balances class sizes: winners beyond the cap are
    deferred to later colors. Unbalanced Luby claims front-load huge
    independent sets (up to num_bodies/2), and the GS sweep's uniform
    per-color window must cover the *largest* class — capping trades a
    slightly longer color loop for a much tighter window (sweep work =
    colors × window). The cap matches the ``gs_cmax`` window budget.
    """
    dyn_a = jnp.any(cons.im_a != 0.0, axis=-1)
    dyn_b = jnp.any(cons.im_b != 0.0, axis=-1)
    return _color_edges(cons, dyn_a, dyn_b, num_bodies,
                        max_colors=max_colors, claim_rounds=claim_rounds,
                        class_cap=class_cap)


def _color_edges(cons, dyn_a, dyn_b, num_bodies: int, *, max_colors: int,
                 claim_rounds: int, class_cap: int):
    c = cons.body_a.shape[0]
    idx_bits = max(int(c - 1).bit_length(), 1)  # unique low bits per index
    hash_shift = idx_bits
    inf = jnp.uint32(0xFFFFFFFF)
    idx = jnp.arange(c, dtype=jnp.int32)
    dyn2 = jnp.concatenate([dyn_a, dyn_b])
    bodies2 = jnp.concatenate([cons.body_a, cons.body_b])

    def priorities(salt):
        h = (idx.astype(jnp.uint32) * jnp.uint32(2654435761)
             + salt.astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
        h ^= h >> 15
        # random high bits + unique index low bits → unique keys, Luby order
        return (h << hash_shift) | idx.astype(jnp.uint32)

    def claim(colors, color):
        def one_round(r, state):
            colors, used = state
            cand = cons.valid & (colors == 0)
            cand &= ~(used[cons.body_a] & dyn_a) & ~(used[cons.body_b] & dyn_b)
            prio = priorities(color * 31 + r)
            cand2 = jnp.concatenate([cand, cand]) & dyn2
            prio2 = jnp.concatenate([prio, prio])
            slot = jnp.full((num_bodies,), inf, jnp.uint32)
            slot = slot.at[jnp.where(cand2, bodies2, num_bodies)].min(
                jnp.where(cand2, prio2, inf), mode="drop")
            win_a = ~dyn_a | (slot[jnp.minimum(cons.body_a, num_bodies - 1)] == prio)
            win_b = ~dyn_b | (slot[jnp.minimum(cons.body_b, num_bodies - 1)] == prio)
            win = cand & win_a & win_b
            if class_cap:
                # defer winners beyond the class budget to later colors; the
                # effective cap never drops below an even split over the
                # remaining colors, so capping cannot create residue that an
                # uncapped coloring would have avoided
                already = jnp.sum((colors == color).astype(jnp.int32))
                even = jnp.sum((cons.valid & (colors == 0)).astype(jnp.int32)
                               ) // jnp.maximum(max_colors - color, 1) + 1
                cap = jnp.maximum(jnp.int32(class_cap), even)
                win &= (jnp.cumsum(win.astype(jnp.int32)) + already <= cap)
            colors = jnp.where(win, color, colors)
            win2 = jnp.concatenate([win, win]) & dyn2
            # winners form an independent set → their bodies are unique;
            # losers go to disjoint scratch rows → fast-path scatter
            used = used.at[jnp.where(win2, bodies2, trash2)].set(
                True, mode="promise_in_bounds", unique_indices=True)
            return colors, used

        trash2 = num_bodies + jnp.arange(2 * c, dtype=jnp.int32)
        used = jnp.zeros((num_bodies + 2 * c,), bool)
        colors, _ = jax.lax.fori_loop(0, claim_rounds, one_round, (colors, used))
        return colors

    def cond(state):
        color, colors = state
        return (color < max_colors) & jnp.any(cons.valid & (colors == 0))

    def body(state):
        color, colors = state
        return color + 1, claim(colors, color)

    colors = jnp.zeros((c,), jnp.int32)
    _, colors = jax.lax.while_loop(cond, body, (jnp.int32(1), colors))
    if not class_cap:
        # legacy: residue → last color (solved scatter-add style; duplicates
        # there lose updates — only reachable when chromatic > max_colors)
        colors = jnp.where(cons.valid & (colors == 0), max_colors, colors)
    # under class_cap, residue stays color 0: the layout parks it in an
    # unswept segment and solve() signals overflow so the host regrows the
    # window (a bigger cap ⇒ fewer colors ⇒ no residue next compile)
    return colors


def pair_key(ba, bb, valid, num_bodies: int | None = None):
    """u32 key (a<<16 | b) per pair; invalid slots → 0xFFFFFFFF. Assumes
    < 65536 bodies (the pipeline's same-contact-set predicate shares this);
    pass ``num_bodies`` to assert that statically at the call site."""
    if num_bodies is not None:
        assert num_bodies < (1 << 16), (
            f"{num_bodies} bodies: 16-bit pair keys alias at >= 65536")
    k = (ba.astype(jnp.uint32) << 16) | (bb.astype(jnp.uint32) & 0xFFFF)
    return jnp.where(valid, k, jnp.uint32(0xFFFFFFFF))


def transfer_pair_colors(new_ba, new_bb, new_valid,
                         old_ba, old_bb, old_valid, old_colors):
    """Carry pair colors across a broad-phase refresh by key match: slots
    whose (a, b) pair survived keep their color; genuinely new pairs get 0.
    A valid coloring of the old graph restricted to surviving edges stays
    valid — removals never create conflicts."""
    ko = pair_key(old_ba, old_bb, old_valid)
    kn = pair_key(new_ba, new_bb, new_valid)
    order = jnp.argsort(ko)
    ko_s = ko[order]
    oc_s = old_colors[order]
    pos = jnp.searchsorted(ko_s, kn, method="sort").astype(jnp.int32)
    pos = jnp.minimum(pos, ko.shape[0] - 1)
    hit = (ko_s[pos] == kn) & new_valid & (kn != jnp.uint32(0xFFFFFFFF))
    return jnp.where(hit, oc_s[pos], 0)


def assign_new_pair_colors(ba, bb, valid, colors, dyn_a, dyn_b,
                           num_bodies: int, *, max_colors: int,
                           class_cap: int, new_cap: int):
    """Greedy sequential color assignment for the (few) uncolored pairs.

    Builds per-body used-color tables + per-class sizes from the already-
    colored pairs, then walks up to ``new_cap`` uncolored slots giving each
    the first color unused at both its dynamic bodies (and under the class
    budget). Pairs that find no color stay 0 — the layout parks them
    unswept and solve() signals overflow exactly like coloring residue.

    This is the refresh-path complement of the cached pair-graph coloring:
    a straggler bouncing off a wall changes a handful of pairs, and a full
    Luby recolor of a 64k-capacity graph (~120 ms on TPU at 10k bodies)
    is absurd for that. ≙ nothing in the reference — it recolors from
    scratch every frame (coloring.rs).
    """
    c = ba.shape[0]
    mc = max_colors + 1
    rows2 = jnp.concatenate([
        jnp.where(valid & dyn_a & (colors > 0), ba, num_bodies),
        jnp.where(valid & dyn_b & (colors > 0), bb, num_bodies)])
    cols2 = jnp.concatenate([colors, colors]).astype(jnp.int32)
    used = jnp.zeros((num_bodies + 1, mc), bool)
    used = used.at[rows2, jnp.clip(cols2, 0, max_colors)].set(True,
                                                             mode="drop")
    counts = jax.ops.segment_sum(
        (valid & (colors > 0)).astype(jnp.int32),
        jnp.clip(colors, 0, max_colors), num_segments=mc)
    cap = jnp.int32(class_cap if class_cap else c)

    # compact uncolored-slot indices to the front (one sort)
    is_new = valid & (colors == 0)
    slots = jnp.sort(jnp.where(is_new, jnp.arange(c, dtype=jnp.int32),
                               jnp.int32(c)))

    col_ids = jnp.arange(mc, dtype=jnp.int32)

    def assign(carry):
        i, colors, used, counts = carry
        s = jnp.minimum(slots[i], c - 1)
        active = slots[i] < c
        a, b = ba[s], bb[s]
        free = ~(used[a] & dyn_a[s]) & ~(used[b] & dyn_b[s])
        free &= counts < cap
        free = free.at[0].set(False)
        color = jnp.where(free.any() & active,
                          jnp.argmax(free).astype(jnp.int32), 0)
        colors = colors.at[s].set(jnp.where(active, color, colors[s]))
        hit = active & (color > 0)
        used = used.at[jnp.where(hit & dyn_a[s], a, num_bodies), color].set(
            True, mode="drop")
        used = used.at[jnp.where(hit & dyn_b[s], b, num_bodies), color].set(
            True, mode="drop")
        counts = counts + jnp.where(hit, col_ids == color, False)
        return i + 1, colors, used, counts

    # while_loop (not fori): a straggler escape recolors ~10-20 pairs, and
    # the untaken tail of a fixed new_cap=128 sweep would still cost ~50 µs
    # per sequential iteration on TPU (measured: +6 ms/frame on the repair
    # path). The dynamic exit skips it (lax early-exit verified on this
    # backend, CLAUDE.md).
    _, colors, _, _ = jax.lax.while_loop(
        lambda carry: ((carry[0] < new_cap)
                       & (slots[jnp.minimum(carry[0], c - 1)] < c)),
        assign, (jnp.int32(0), colors, used, counts))
    return colors


def minimize_colors(ba, bb, valid, colors, dyn_a, dyn_b, num_bodies: int,
                    *, max_colors: int, sweeps: int = 2, class_cap: int = 0):
    """Color-count minimization: reseat edges to the lowest free color.

    TPU-native analog of the reference's primary TOPO-GC colorer, which
    iteratively assigns min-available colors and fixes conflicts
    (/root/reference/crates/wgrapier/src/dynamics/coloring.rs:220-325) —
    its Luby MIS scheme is only the fallback there, while ``color_pairs``
    made Luby primary here. This pass runs AFTER a Luby coloring and walks
    source color classes top-down, moving every edge of the class to its
    lowest color unused at both dynamic endpoints. A color class is an
    independent set (no two same-color edges share a body), so all its
    moves commute — no conflict-fix round is needed, unlike the per-vertex
    sequential reference. High classes drain into low ones; emptied
    trailing classes shorten the GS rung ladder directly (sweep dispatch
    cost ∝ occupied colors).

    ``class_cap`` > 0 keeps destination classes within the GS window
    budget: arrivals are rank-capped per destination (same contract as the
    claim scheme's cap). Cost: sweeps × max_colors fori iterations of
    C×(max_colors+1) bool work — only paid at full-recolor boundaries.
    """
    c = ba.shape[0]
    mc = max_colors + 1
    col_ids = jnp.arange(mc, dtype=jnp.int32)
    ba_s = jnp.minimum(ba, num_bodies - 1)
    bb_s = jnp.minimum(bb, num_bodies - 1)

    def build_used(colors):
        rows2 = jnp.concatenate([
            jnp.where(valid & dyn_a & (colors > 0), ba, num_bodies),
            jnp.where(valid & dyn_b & (colors > 0), bb, num_bodies)])
        cols2 = jnp.concatenate([colors, colors]).astype(jnp.int32)
        used = jnp.zeros((num_bodies + 1, mc), bool)
        return used.at[rows2, jnp.clip(cols2, 0, max_colors)].set(
            True, mode="drop")

    def one_sweep(_, colors):
        used = build_used(colors)
        counts = jax.ops.segment_sum(
            (valid & (colors > 0)).astype(jnp.int32),
            jnp.clip(colors, 0, max_colors), num_segments=mc)

        def one_source(c_rev, state):
            colors, used, counts = state
            src = max_colors - c_rev  # descend max_colors .. 2
            movers = valid & (colors == src)
            # free at both dynamic endpoints, strictly below the source
            free = (~(used[ba_s] & dyn_a[:, None])
                    & ~(used[bb_s] & dyn_b[:, None])
                    & (col_ids[None, :] < src) & (col_ids[None, :] > 0))
            tgt = jnp.argmax(free, axis=1).astype(jnp.int32)  # lowest free
            can = movers & jnp.take_along_axis(
                free, tgt[:, None], axis=1)[:, 0]
            if class_cap:
                # rank arrivals per destination; late arrivals past the
                # window budget stay at the source color
                onehot = jnp.where(can[:, None], col_ids[None, :] == tgt[:, None],
                                   False).astype(jnp.int32)
                rank = jnp.cumsum(onehot, axis=0)
                ok = jnp.take_along_axis(
                    rank + counts[None, :], tgt[:, None], axis=1)[:, 0] \
                    <= class_cap
                can &= ok
            colors = jnp.where(can, tgt, colors)
            # movers are an independent set: unique bodies → plain scatter.
            # Only SET the destinations (sources are never re-consulted:
            # later iterations target colors < src) — used is rebuilt per
            # sweep so cleared sources come back correct next sweep.
            rows2 = jnp.concatenate([
                jnp.where(can & dyn_a, ba, num_bodies),
                jnp.where(can & dyn_b, bb, num_bodies)])
            tgt2 = jnp.concatenate([tgt, tgt])
            used = used.at[rows2, tgt2].set(True, mode="drop")
            moved = jax.ops.segment_sum(can.astype(jnp.int32),
                                        jnp.where(can, tgt, 0),
                                        num_segments=mc)
            moved = moved.at[0].set(0)
            counts = counts + moved - moved.sum() * (col_ids == src)
            return colors, used, counts

        colors, _, _ = jax.lax.fori_loop(0, max_colors - 1, one_source,
                                         (colors, used, counts))
        return colors

    return jax.lax.fori_loop(0, sweeps, one_sweep, colors)


# ---------------------------------------------------------------------------
# Shared per-constraint impulse math (one point-loop used by GS and Jacobi)
# ---------------------------------------------------------------------------


_VIEW_FIELDS = ("dir_a", "tangent_a", "im_a", "im_b", "cfm_factor", "limit",
                "num_points", "n_torque_a", "n_torque_b", "n_ii_torque_a",
                "n_ii_torque_b", "n_rhs", "n_r", "t_torque_a", "t_torque_b",
                "t_ii_torque_a", "t_ii_torque_b", "t_rhs", "t_r")


def _view(cons, cid):
    """Gather only the solver-read constraint fields at ``cid``."""
    from types import SimpleNamespace

    return SimpleNamespace(**{f: getattr(cons, f)[cid] for f in _VIEW_FIELDS})


def _point_updates(cons, active, v1l, v1a, v2l, v2a,
                   prev_n_imp, prev_t_imp, p_max, dim):
    """Run the normal+friction impulse updates for every contact point,
    sequentially over the (static) point axis, vectorized over constraints.

    ``cons`` fields must already be at the working axis (the full constraint
    buffer for GS; a ``_view`` gather for Jacobi). Returns new per-point
    impulses and the locally-updated body velocities
    (≙ solver.wgsl step_gauss_seidel inner loop:579-660).
    """
    dir_a = cons.dir_a
    tangents = cons.tangent_a  # [M, S, dim]
    im_a = cons.im_a
    im_b = cons.im_b
    cfm = cons.cfm_factor
    friction = cons.limit
    num_points = cons.num_points
    s_len = tangents.shape[-2]

    new_n = []
    new_t = []
    for k in range(p_max):
        pt_active = active & (k < num_points)
        m = pt_active.astype(v1l.dtype)

        # --- normal part ---
        td_a = cons.n_torque_a[:, k]
        td_b = cons.n_torque_b[:, k]
        iitd_a = cons.n_ii_torque_a[:, k]
        iitd_b = cons.n_ii_torque_b[:, k]
        rhs = cons.n_rhs[:, k]
        r = cons.n_r[:, k]
        prev = prev_n_imp[:, k]

        dvel = (jnp.sum(dir_a * v1l, axis=-1) + gdot(td_a, v1a)
                - jnp.sum(dir_a * v2l, axis=-1) + gdot(td_b, v2a) + rhs)
        cand = cfm * jnp.maximum(prev - r * dvel, 0.0)
        new_imp = jnp.where(pt_active, cand, prev)
        d_imp = new_imp - prev
        v1l = v1l + dir_a * (im_a * d_imp[..., None])
        v1a = v1a + _scale_ang(iitd_a, d_imp)
        v2l = v2l - dir_a * (im_b * d_imp[..., None])
        v2a = v2a + _scale_ang(iitd_b, d_imp)
        limit = new_imp * friction
        new_n.append(new_imp)

        # --- tangent (friction) part ---
        t_td_a = cons.t_torque_a[:, k]  # [M, S(, 3)]
        t_td_b = cons.t_torque_b[:, k]
        t_iitd_a = cons.t_ii_torque_a[:, k]
        t_iitd_b = cons.t_ii_torque_b[:, k]
        t_rhs = cons.t_rhs[:, k]  # [M, S]
        t_r = cons.t_r[:, k]  # [M, 3] or [M, 1]
        t_prev = prev_t_imp[:, k]  # [M, S]

        if dim == 2:
            tj = tangents[:, 0]
            dvel = (jnp.sum(tj * v1l, axis=-1) + gdot(t_td_a[:, 0], v1a)
                    - jnp.sum(tj * v2l, axis=-1) + gdot(t_td_b[:, 0], v2a)
                    + t_rhs[:, 0])
            cand = cfm * jnp.clip(t_prev[:, 0] - t_r[:, 0] * dvel, -limit, limit)
            t_new = jnp.where(pt_active, cand, t_prev[:, 0])
            dl = t_new - t_prev[:, 0]
            v1l = v1l + tj * (im_a * dl[..., None])
            v1a = v1a + _scale_ang(t_iitd_a[:, 0], dl)
            v2l = v2l - tj * (im_b * dl[..., None])
            v2a = v2a + _scale_ang(t_iitd_b[:, 0], dl)
            new_t.append(t_new[:, None])
        else:
            d0 = (jnp.sum(tangents[:, 0] * v1l, axis=-1)
                  + gdot(t_td_a[:, 0], v1a)
                  - jnp.sum(tangents[:, 0] * v2l, axis=-1)
                  + gdot(t_td_b[:, 0], v2a) + t_rhs[:, 0])
            d1 = (jnp.sum(tangents[:, 1] * v1l, axis=-1)
                  + gdot(t_td_a[:, 1], v1a)
                  - jnp.sum(tangents[:, 1] * v2l, axis=-1)
                  + gdot(t_td_b[:, 1], v2a) + t_rhs[:, 1])
            d00, d11, d01 = d0 * d0, d1 * d1, d0 * d1
            inv_lhs = (d00 + d11) * maybe_inv(
                d00 * t_r[:, 0] + d11 * t_r[:, 1] + d01 * t_r[:, 2])
            delta = jnp.stack([inv_lhs * d0, inv_lhs * d1], axis=-1)
            cand = cap_magnitude(t_prev - delta, limit)
            t_new = jnp.where(pt_active[..., None], cand, t_prev)
            dl = t_new - t_prev  # [M, 2]
            lin_dir = (tangents[:, 0] * dl[:, 0:1] + tangents[:, 1] * dl[:, 1:2])
            v1l = v1l + lin_dir * im_a
            v1a = v1a + _scale_ang(t_iitd_a[:, 0], dl[:, 0]) + _scale_ang(t_iitd_a[:, 1], dl[:, 1])
            v2l = v2l - lin_dir * im_b
            v2a = v2a + _scale_ang(t_iitd_b[:, 0], dl[:, 0]) + _scale_ang(t_iitd_b[:, 1], dl[:, 1])
            new_t.append(t_new)

    return (jnp.stack(new_n, axis=1), jnp.stack(new_t, axis=1),
            v1l, v1a, v2l, v2a)


def _scale_ang(ang_dir, scalar):
    """angular_direction * impulse for scalar (2D) or vector (3D) angulars."""
    if ang_dir.ndim == scalar.ndim + 1:
        return ang_dir * scalar[..., None]
    return ang_dir * scalar


# ---------------------------------------------------------------------------
# Warmstart (pure accumulation — no coloring needed on TPU)
# ---------------------------------------------------------------------------


def warmstart_apply(cons: ContactConstraints, vels: Velocity) -> Velocity:
    """Apply stored impulses to velocities (≙ solver.wgsl warmstart:464-524).
    Duplicate body indices accumulate exactly via index-add, so one fused
    scatter replaces the reference's per-color loop."""
    dim = cons.dim
    p_max = cons.n_impulse.shape[1]
    lin, ang = vels.linear, vels.angular
    d1l = jnp.zeros_like(cons.dir_a)
    d2l = jnp.zeros_like(cons.dir_a)
    d1a = jnp.zeros_like(cons.n_torque_a[:, 0])
    d2a = jnp.zeros_like(d1a)
    mask = cons.valid
    for k in range(p_max):
        imp = jnp.where(mask & (k < cons.num_points), cons.n_impulse[:, k], 0.0)
        d1l += cons.dir_a * (cons.im_a * imp[:, None])
        d1a += _scale_ang(cons.n_ii_torque_a[:, k], imp)
        d2l -= cons.dir_a * (cons.im_b * imp[:, None])
        d2a += _scale_ang(cons.n_ii_torque_b[:, k], imp)
        for j in range(cons.tangent_a.shape[-2]):
            timp = jnp.where(mask & (k < cons.num_points),
                             cons.t_impulse[:, k, j], 0.0)
            tj = cons.tangent_a[:, j]
            d1l += tj * (cons.im_a * timp[:, None])
            d1a += _scale_ang(cons.t_ii_torque_a[:, k, j], timp)
            d2l -= tj * (cons.im_b * timp[:, None])
            d2a += _scale_ang(cons.t_ii_torque_b[:, k, j], timp)
    lin = lin.at[cons.body_a].add(d1l).at[cons.body_b].add(d2l)
    ang = ang.at[cons.body_a].add(d1a).at[cons.body_b].add(d2a)
    return Velocity(lin, ang)


def _build_sides(body_a, body_b, dyn_a, dyn_b, valid, n: int):
    side_valid = jnp.concatenate([valid & dyn_a, valid & dyn_b])
    side_bodies = jnp.concatenate([body_a, body_b])
    key = jnp.where(side_valid, side_bodies, n).astype(jnp.int32)
    order = jnp.argsort(key).astype(jnp.int32)
    sorted_keys = key[order]
    bodies_idx = jnp.arange(n, dtype=jnp.int32)
    # method="sort": the default binary-search lowering is pathological on
    # TPU (CLAUDE.md); the sort-based variant rides the fast lax.sort path
    left = jnp.searchsorted(sorted_keys, bodies_idx, side="left",
                            method="sort")
    right = jnp.searchsorted(sorted_keys, bodies_idx, side="right",
                             method="sort")
    return order, left.astype(jnp.int32), right.astype(jnp.int32)


def _ws_deltas(ns, n_imp, t_imp, mask, p_max):
    """Per-side warmstart velocity deltas [2M, dim(+adim)] from impulse
    accumulators (shared by the sorted- and unsorted-space warmstarts)."""
    d1l = jnp.zeros_like(ns.dir_a)
    d2l = jnp.zeros_like(ns.dir_a)
    d1a = jnp.zeros_like(ns.n_torque_a[:, 0])
    d2a = jnp.zeros_like(d1a)
    for k in range(p_max):
        imp = jnp.where(mask & (k < ns.num_points), n_imp[:, k], 0.0)
        d1l += ns.dir_a * (ns.im_a * imp[:, None])
        d1a += _scale_ang(ns.n_ii_torque_a[:, k], imp)
        d2l -= ns.dir_a * (ns.im_b * imp[:, None])
        d2a += _scale_ang(ns.n_ii_torque_b[:, k], imp)
        for j in range(ns.tangent_a.shape[-2]):
            timp = jnp.where(mask & (k < ns.num_points), t_imp[:, k, j], 0.0)
            tj = ns.tangent_a[:, j]
            d1l += tj * (ns.im_a * timp[:, None])
            d1a += _scale_ang(ns.t_ii_torque_a[:, k, j], timp)
            d2l -= tj * (ns.im_b * timp[:, None])
            d2a += _scale_ang(ns.t_ii_torque_b[:, k, j], timp)
    ang2d = d1a.ndim == 1
    da = jnp.concatenate([d1a, d2a])
    if ang2d:
        da = da[:, None]
    return jnp.concatenate([jnp.concatenate([d1l, d2l]), da], axis=-1)


def _ws_apply(vels: Velocity, packed, sides) -> Velocity:
    """Segment-difference application of per-side deltas (no scatters)."""
    order, left, right = sides
    dim = vels.linear.shape[-1]
    packed = packed[order]
    cs = jnp.concatenate([jnp.zeros((1, packed.shape[1]), packed.dtype),
                          jnp.cumsum(packed, axis=0)])
    seg = cs[right] - cs[left]
    lin = vels.linear + seg[:, :dim]
    ang_d = seg[:, dim:]
    ang2d = vels.angular.ndim == 1
    ang = vels.angular + (ang_d[:, 0] if ang2d else ang_d)
    return Velocity(lin, ang)


def build_sorted_sides(cons: ContactConstraints, n: int):
    """Per-frame prep for ``warmstart_apply_sorted``: order the 2C constraint
    sides by body index and precompute each body's [left, right) segment.
    One u32 sort per frame replaces four duplicate-heavy scatter-adds per
    substep (duplicate scatters serialize on TPU)."""
    dyn_a = jnp.any(cons.im_a != 0.0, axis=-1)
    dyn_b = jnp.any(cons.im_b != 0.0, axis=-1)
    side_valid = jnp.concatenate([cons.valid & dyn_a, cons.valid & dyn_b])
    side_bodies = jnp.concatenate([cons.body_a, cons.body_b])
    key = jnp.where(side_valid, side_bodies, n).astype(jnp.int32)
    order = jnp.argsort(key).astype(jnp.int32)
    sorted_keys = key[order]
    bodies_idx = jnp.arange(n, dtype=jnp.int32)
    # method="sort": the default binary-search lowering is pathological on
    # TPU (CLAUDE.md); the sort-based variant rides the fast lax.sort path
    left = jnp.searchsorted(sorted_keys, bodies_idx, side="left",
                            method="sort")
    right = jnp.searchsorted(sorted_keys, bodies_idx, side="right",
                             method="sort")
    return order, left.astype(jnp.int32), right.astype(jnp.int32)


def warmstart_apply_sorted(cons: ContactConstraints, vels: Velocity,
                           sides) -> Velocity:
    """``warmstart_apply`` via body-sorted sides + prefix-sum segment
    differences — gathers and one cumsum instead of scatter-adds."""
    order, left, right = sides
    dim = cons.dim
    p_max = cons.n_impulse.shape[1]
    d1l = jnp.zeros_like(cons.dir_a)
    d2l = jnp.zeros_like(cons.dir_a)
    d1a = jnp.zeros_like(cons.n_torque_a[:, 0])
    d2a = jnp.zeros_like(d1a)
    mask = cons.valid
    for k in range(p_max):
        imp = jnp.where(mask & (k < cons.num_points), cons.n_impulse[:, k], 0.0)
        d1l += cons.dir_a * (cons.im_a * imp[:, None])
        d1a += _scale_ang(cons.n_ii_torque_a[:, k], imp)
        d2l -= cons.dir_a * (cons.im_b * imp[:, None])
        d2a += _scale_ang(cons.n_ii_torque_b[:, k], imp)
        for j in range(cons.tangent_a.shape[-2]):
            timp = jnp.where(mask & (k < cons.num_points),
                             cons.t_impulse[:, k, j], 0.0)
            tj = cons.tangent_a[:, j]
            d1l += tj * (cons.im_a * timp[:, None])
            d1a += _scale_ang(cons.t_ii_torque_a[:, k, j], timp)
            d2l -= tj * (cons.im_b * timp[:, None])
            d2a += _scale_ang(cons.t_ii_torque_b[:, k, j], timp)
    ang2d = d1a.ndim == 1
    da = jnp.concatenate([d1a, d2a])
    if ang2d:
        da = da[:, None]
    packed = jnp.concatenate([jnp.concatenate([d1l, d2l]), da], axis=-1)
    packed = packed[order]
    cs = jnp.concatenate([jnp.zeros((1, packed.shape[1]), packed.dtype),
                          jnp.cumsum(packed, axis=0)])
    seg = cs[right] - cs[left]
    lin = vels.linear + seg[:, :dim]
    ang_d = seg[:, dim:]
    ang = vels.angular + (ang_d[:, 0] if ang2d else ang_d)
    return Velocity(lin, ang)


# ---------------------------------------------------------------------------
# Colored Gauss-Seidel pass (≙ step_gauss_seidel per color)
# ---------------------------------------------------------------------------

# A/B switch for the fused component-major impulse-math kernel (gs_pallas);
# flip off to fall back to the op-per-op XLA math on TPU.
GS_CM_KERNEL = True


def gs_colored_pass(cons: ContactConstraints, vels: Velocity,
                    colors: jax.Array, *, max_colors: int = 32,
                    num_colors=None):
    """One full PGS sweep: sequentially over colors, in parallel within.

    ``num_colors``: device scalar — the loop retires after the last color in
    use (fori_loop with a traced bound lowers to while)."""
    dim = cons.dim
    p_max = cons.n_impulse.shape[1]
    if num_colors is None:
        num_colors = jnp.max(jnp.where(cons.valid, colors, 0))

    def one_color(color, carry):
        lin, ang, n_imp, t_imp = carry
        active = cons.valid & (colors == color)
        v1l, v1a = lin[cons.body_a], ang[cons.body_a]
        v2l, v2a = lin[cons.body_b], ang[cons.body_b]
        i1l, i1a, i2l, i2a = v1l, v1a, v2l, v2a
        new_n, new_t, v1l, v1a, v2l, v2a = _point_updates(
            cons, active, v1l, v1a, v2l, v2a, n_imp, t_imp, p_max, dim)
        n_imp = jnp.where(active[:, None], new_n, n_imp)
        t_imp = jnp.where(active[:, None, None], new_t, t_imp)
        lin = lin.at[cons.body_a].add(v1l - i1l).at[cons.body_b].add(v2l - i2l)
        ang = ang.at[cons.body_a].add(v1a - i1a).at[cons.body_b].add(v2a - i2a)
        return lin, ang, n_imp, t_imp

    lin, ang, n_imp, t_imp = jax.lax.fori_loop(
        1, num_colors + 1, one_color,
        (vels.linear, vels.angular, cons.n_impulse, cons.t_impulse))
    return (Velocity(lin, ang),
            dataclasses.replace(cons, n_impulse=n_imp, t_impulse=t_imp))


def build_color_layout(colors: jax.Array, valid: jax.Array, *,
                       max_colors: int, cmax: int):
    """Color-major constraint ordering: ``order`` sorted by color with
    per-color ``offsets``/``counts``. Each GS color pass then touches only a
    ``cmax``-sized window instead of the whole capacity — the sweep costs
    O(total constraints), not O(capacity × colors).

    ``cmax`` must bound the largest color class; an independent set uses each
    dynamic body at most once, so ``num_bodies // 2 + slack`` is safe.
    """
    c = colors.shape[0]
    key = jnp.where(valid, colors, max_colors + 1).astype(jnp.int32)
    order = jnp.argsort(key, stable=True).astype(jnp.int32)
    counts = jax.ops.segment_sum(valid.astype(jnp.int32), key,
                                 num_segments=max_colors + 2)
    offsets = jnp.concatenate([jnp.zeros(1, jnp.int32),
                               jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    # pad so dynamic_slice never clamps (start + cmax <= len)
    order_padded = jnp.concatenate([order, jnp.full((cmax,), c, jnp.int32)])
    return order_padded, offsets, counts


_SORT_FIELDS = _VIEW_FIELDS + ("body_a", "body_b", "n_rhs_wo_bias",
                               "t_rhs_wo_bias", "valid", "local_pt_a",
                               "local_pt_b", "info_dist", "info_normal_vel")

# solver-read fields that stay CONSTANT across the substep loop — packed
# into one [C, K] f32 matrix so each GS color iteration pays one
# dynamic-slice instead of ~15 (the sweep is op-dispatch bound on TPU).
# The rhs-relinearization inputs (local anchors + builder infos) ride the
# pack too: the rhs-in-rung sweep (gs_pallas.gs_math_block_rhs) recomputes
# each rung's substep rhs IN KERNEL from them, deleting the per-substep
# 2C-row pose gather + XLA relinearization phase.
_PACK_FIELDS = ("dir_a", "tangent_a", "im_a", "im_b", "limit",
                "n_torque_a", "n_torque_b", "n_ii_torque_a", "n_ii_torque_b",
                "n_r", "t_torque_a", "t_torque_b", "t_ii_torque_a",
                "t_ii_torque_b", "t_r", "local_pt_a", "local_pt_b",
                "info_dist", "info_normal_vel", "t_rhs_wo_bias")


def pack_sorted_fields(ss):
    """Concatenate the substep-invariant solver fields into one [C, K] f32
    matrix + a static layout map name → (col_start, tail_shape)."""
    cols = []
    meta = {}
    at = 0
    c = ss.body_a.shape[0]
    for f in _PACK_FIELDS:
        v = getattr(ss, f)
        tail = v.shape[1:]
        k = int(np.prod(tail)) if tail else 1
        meta[f] = (at, tail)
        cols.append(v.reshape(c, k).astype(jnp.float32))
        at += k
    return jnp.concatenate(cols, axis=1), meta


def _unpack_window(win2d, meta):
    out = {}
    n = win2d.shape[0]
    for f, (at, tail) in meta.items():
        k = int(np.prod(tail)) if tail else 1
        v = jax.lax.slice_in_dim(win2d, at, at + k, axis=1)
        out[f] = v.reshape((n,) + tail)
    return out


_F32_SORT_FIELDS = _PACK_FIELDS + (
    "cfm_factor", "n_rhs", "t_rhs", "n_rhs_wo_bias")


def sort_solver_fields_packed(cons: ContactConstraints,
                              order_padded: jax.Array):
    """Color-major sort of every solver-read field via ONE row gather.

    All f32 fields are flattened into one [C, K] matrix first, so the sort
    costs a single K-wide gather instead of ~20 per-field gathers (row count
    dominates TPU gather cost). The ``_PACK_FIELDS`` prefix of the matrix
    doubles as the GS sweep's per-color window block. Returns
    ``(ss_namespace, (packed2d, meta))``."""
    from types import SimpleNamespace

    c = cons.body_a.shape[0]
    idx = jnp.minimum(order_padded, c - 1)
    pad_invalid = order_padded >= c
    cols, meta, at = [], {}, 0
    for f in _F32_SORT_FIELDS:
        v = getattr(cons, f)
        tail = v.shape[1:]
        k = int(np.prod(tail)) if tail else 1
        meta[f] = (at, tail)
        cols.append(v.reshape(c, k).astype(jnp.float32))
        at += k
    big = jnp.concatenate(cols, axis=1)[idx]  # the ONE gather
    n = big.shape[0]
    fields = {}
    for f, (a0, tail) in meta.items():
        k = int(np.prod(tail)) if tail else 1
        fields[f] = jax.lax.slice_in_dim(big, a0, a0 + k,
                                         axis=1).reshape((n,) + tail)
    fields["body_a"] = cons.body_a[idx]
    fields["body_b"] = cons.body_b[idx]
    fields["num_points"] = jnp.where(pad_invalid, 0, cons.num_points[idx])
    fields["valid"] = jnp.where(pad_invalid, False, cons.valid[idx])
    ss = SimpleNamespace(**fields)
    k_pack = meta[_PACK_FIELDS[-1]][0] + max(
        int(np.prod(meta[_PACK_FIELDS[-1]][1])), 1)
    packed2d = jax.lax.slice_in_dim(big, 0, k_pack, axis=1)
    pack_meta = {f: meta[f] for f in _PACK_FIELDS}
    return ss, (packed2d, pack_meta)


def pad_solver_fields_packed(cons: ContactConstraints, pad: int):
    """``sort_solver_fields_packed`` for constraints that are ALREADY in
    color-major order (contacts compacted sorted-by-color upstream,
    ``compact_contacts(..., sort_by_extra=True)``): no gather at all — one
    concat builds the packed window matrix; ``pad`` zero rows keep the GS
    window dynamic-slices in bounds past the last color's offset."""
    from types import SimpleNamespace

    c = cons.body_a.shape[0]
    cols, meta, at = [], {}, 0
    for f in _F32_SORT_FIELDS:
        v = getattr(cons, f)
        tail = v.shape[1:]
        k = int(np.prod(tail)) if tail else 1
        meta[f] = (at, tail)
        cols.append(v.reshape(c, k).astype(jnp.float32))
        at += k
    big = jnp.concatenate(cols, axis=1)
    big = jnp.concatenate([big, jnp.zeros((pad, big.shape[1]), jnp.float32)])
    n = c + pad
    fields = {}
    for f, (a0, tail) in meta.items():
        k = int(np.prod(tail)) if tail else 1
        fields[f] = jax.lax.slice_in_dim(big, a0, a0 + k,
                                         axis=1).reshape((n,) + tail)
    zpad_i = jnp.zeros((pad,), jnp.int32)
    fields["body_a"] = jnp.concatenate([cons.body_a, zpad_i])
    fields["body_b"] = jnp.concatenate([cons.body_b, zpad_i])
    fields["num_points"] = jnp.concatenate([cons.num_points, zpad_i])
    fields["valid"] = jnp.concatenate([cons.valid, jnp.zeros((pad,), bool)])
    ss = SimpleNamespace(**fields)
    k_pack = meta[_PACK_FIELDS[-1]][0] + max(
        int(np.prod(meta[_PACK_FIELDS[-1]][1])), 1)
    packed2d = jax.lax.slice_in_dim(big, 0, k_pack, axis=1)
    pack_meta = {f: meta[f] for f in _PACK_FIELDS}
    return ss, (packed2d, pack_meta)


def sort_solver_fields(cons: ContactConstraints, order_padded: jax.Array):
    """Gather the solver-read constraint fields into color-major order —
    once per relinearization, so every GS color window below is a contiguous
    ``dynamic_slice`` instead of ~20 gathers per color per sweep."""
    from types import SimpleNamespace

    c = cons.body_a.shape[0]
    idx = jnp.minimum(order_padded, c - 1)
    pad_invalid = order_padded >= c
    ns = {f: getattr(cons, f)[idx] for f in _SORT_FIELDS}
    # deactivate padding slots via num_points = 0
    ns["num_points"] = jnp.where(pad_invalid, 0, ns["num_points"])
    ns["valid"] = jnp.where(pad_invalid, False, ns["valid"])
    return SimpleNamespace(**ns)


def build_gs_chain(body_a_s, body_b_s, dyn_a_s, dyn_b_s, offsets, counts,
                   windows: tuple, n: int):
    """Last-writer index chain for the scatter-free ("chained") GS sweep.

    The chained sweep keeps velocities in a STREAM: rows ``[0, n)`` are the
    body table, and color ``c`` (1-based, window ``windows[c-1]``) writes its
    updated a-side/b-side body velocities contiguously at the static rows
    ``n + 2*W_c + [0, 2*w)`` where ``W_c = sum(windows[:c-1])``. That turns
    the sweep's per-color scatter-add — the slowest TPU op in the solve
    (~49 Mrow/s vs 135 Mrow/s gathers) — into a static-offset
    ``dynamic_update_slice`` (≈ free), at the cost of gathering each color's
    inputs through this precomputed chain instead of by body index.

    ``src[2*W_c + s]`` is the stream row holding the most recent velocity of
    color ``c`` slot ``s``'s body (a-side for ``s < w``, b-side at ``s - w``):
    its body-table row if no earlier color touched it, else the earlier
    color's static write slot. ``last_writer[b]`` is the stream row holding
    body ``b``'s final post-sweep velocity. Only (active & dynamic) sides
    advance the chain — same-color constraints touch disjoint dynamic
    bodies (the coloring invariant), so each scatter below carries unique
    indices. Recomputed only on contact-set changes; cached in the solve
    bundle under the stable-keys ``lax.cond`` like the rest of the layout.

    Exactness: within a color at most one constraint updates a given body,
    and its written value ``v_gathered + delta`` equals the ladder's
    ``packed.at[b].add(delta)`` up to one float re-association (the ladder
    adds the delta to the same gathered value).
    """
    w_max = max(windows) if windows else 1
    cur = jnp.concatenate([jnp.arange(n, dtype=jnp.int32),
                           jnp.zeros((w_max,), jnp.int32)])
    srcs = []
    w_off = 0
    for ci, w in enumerate(windows, start=1):
        if w == 0:  # pruned empty class: no stream segment, no chain rows
            continue
        start = offsets[ci]
        slot = jnp.arange(w, dtype=jnp.int32)
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, start, w)
        ba, bb = sl(body_a_s), sl(body_b_s)
        active = slot < counts[ci]
        wa = active & sl(dyn_a_s)
        wb = active & sl(dyn_b_s)
        srcs.append(cur[jnp.concatenate([ba, bb])])
        pos_a = (n + 2 * w_off + slot).astype(jnp.int32)
        trash = n + slot  # disjoint rows absorb masked writes → unique
        cur = cur.at[jnp.where(wa, ba, trash)].set(
            pos_a, mode="promise_in_bounds", unique_indices=True)
        cur = cur.at[jnp.where(wb, bb, trash)].set(
            pos_a + w, mode="promise_in_bounds", unique_indices=True)
        w_off += w
    return jnp.concatenate(srcs), cur[:n]


def gs_color_major_pass(sorted_cons, vels: Velocity, n_imp_s, t_imp_s,
                        layout, num_colors, *, cmax: int, dim: int,
                        shard=None, packed_fields=None, color_lo=1,
                        windows=None, chain=None, rhs_mode=None,
                        pose_tab=None, rhs_consts=None, rhs_store=None):
    """PGS sweep over pre-sorted color-major constraints.

    ``n_imp_s``/``t_imp_s`` are impulse accumulators in SORTED order; they
    stay sorted across sweeps and are unsorted once at the end of the solve.
    Velocities travel as one packed [N, dim+adim] array so each color costs
    two gathers + two scatter-adds (instead of four of each).

    ``shard``: optional ``(axis_name, n_shards)`` — inside ``shard_map``,
    split every color window across the mesh axis. Same-color constraints
    are body-disjoint, so each device solves its slice of the window and a
    single ``psum`` of velocity deltas per color reproduces the sequential
    Gauss-Seidel result EXACTLY (the scaling-book collective recipe applied
    to the reference's per-color kernel launches, solver.rs:238-460).
    Constraint fields/impulses stay replicated; impulse updates are psum'd
    the same way so every replica stays bitwise consistent.

    ``windows``: optional static per-color window LADDER, a tuple of one
    window size per color (index c uses ``windows[c-1]``). Gather/scatter
    rows per color then track the actual class size (bucketed by the host
    from the previous frame's class counts) instead of paying the uniform
    worst-case ``cmax`` for every color — in a jammed pile the tail colors
    hold ~10-20%-occupancy classes, so the uniform window wastes most of the
    sweep's memory traffic. Colors run as a statically-unrolled loop of
    ``lax.cond``s (empty classes skip their body on this backend). Classes
    larger than their rung are left partially unswept for one frame and
    re-bucketed by ``step_checked`` via the exported class counts — the same
    contract as every other capacity in the pipeline. Unsharded only.
    """
    p_max = n_imp_s.shape[1]
    order_padded, offsets, counts = layout
    axis_name, n_shards = shard if shard is not None else (None, 1)
    # per-device window slice; cmax must divide evenly (solve() rounds up)
    assert cmax % n_shards == 0
    if windows is not None:
        # sharded ladder: each color's rung splits evenly across devices
        # (solve() rounds the windows up to multiples of n_shards)
        assert all(w % n_shards == 0 for w in windows), (windows, n_shards)
        max_lw = max(windows) // n_shards
    else:
        max_lw = cmax // n_shards
    from types import SimpleNamespace

    ang2d = vels.angular.ndim == 1
    ang_v = vels.angular[:, None] if ang2d else vels.angular
    n_bodies = vels.linear.shape[0]
    packed0 = jnp.concatenate([vels.linear, ang_v], axis=-1)
    adim = ang_v.shape[-1]
    vel_w = dim + adim
    # rhs-in-rung (chained only): each rung recomputes its substep rhs
    # IN KERNEL (gs_pallas.gs_math_block_rhs) — the biased sweep's poses
    # ride the velocity stream (written through unchanged), the unbiased
    # sweep reads the biased sweep's stored rhs_wo_bias from the merged
    # impulse matrix. Deletes the per-substep update_rhs_sorted phase
    # (one 2C-row pose gather + the XLA relinearization ops).
    if rhs_mode is not None:
        assert chain is not None and packed_fields is not None and dim == 3
        assert rhs_consts is not None and rhs_store is not None
        if rhs_mode == "biased":
            assert pose_tab is not None
            packed0 = jnp.concatenate([packed0, pose_tab], axis=-1)
    if chain is not None:
        # chained (scatter-free) sweep: the buffer is the velocity STREAM —
        # body table + one static 2w-row segment per color (build_gs_chain)
        assert windows is not None and axis_name is None
        src_all, last_writer = chain
        packed0 = jnp.concatenate(
            [packed0,
             jnp.zeros((2 * sum(windows), packed0.shape[-1]),
                       packed0.dtype)])
    else:
        # scratch rows absorb padding/static writes so every scatter-add
        # below carries unique indices — XLA's fast TPU scatter path (the
        # duplicate-tolerant path serializes; it dominated the solve before)
        packed0 = jnp.concatenate(
            [packed0, jnp.zeros((2 * max_lw, dim + adim), packed0.dtype)])
    # same-color constraints share no *dynamic* body (coloring predicate:
    # any(im != 0)); only dynamic-body writes keep their real index
    dyn_a_s = jnp.any(sorted_cons.im_a != 0.0, axis=-1)
    dyn_b_s = jnp.any(sorted_cons.im_b != 0.0, axis=-1)

    if packed_fields is not None:
        pf2d, pf_meta = packed_fields
    from wgmath_tpu.core.dispatch import on_tpu

    s_len_ = sorted_cons.tangent_a.shape[-2]
    # fused math kernel: 3D only, unsharded, packed fields present, real TPU
    use_cm_kernel = (GS_CM_KERNEL and packed_fields is not None and dim == 3
                     and axis_name is None and on_tpu())

    # windows mode (unsharded) carries the n/t impulses as ONE merged
    # [C, p_max*(1+s_len)] matrix: each color pays one dynamic-slice + one
    # update instead of two of each (the sweep is op-dispatch bound)
    merge_imp = windows is not None and axis_name is None
    p_flat = n_imp_s.shape[1]

    def one_color_lw(color, carry, lw, w_off=0):
        slot = jnp.arange(lw, dtype=jnp.int32)
        if merge_imp:
            packed, imp = carry
        else:
            packed, n_imp, t_imp = carry
        base = offsets[color]
        # device-local slice of this color's window (uniform mode:
        # lw = cmax/n_shards; ladder mode: lw = windows[c-1]/n_shards)
        shard_off = (jax.lax.axis_index(axis_name) * lw
                     if axis_name is not None else jnp.int32(0))
        start = base + shard_off
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, start, lw)
        # positional (slot < class count) AND per-row contact validity: in
        # pair-slot layouts a window row can be a cached pair whose contact
        # is currently inactive — it must pass velocities through with
        # zero impulse delta (prev impulses preserved by the masked math).
        # In compacted layouts valid rows are exactly the positional
        # prefix, so the extra AND is a no-op there.
        active = (shard_off + slot < counts[color]) & sl(sorted_cons.valid)
        if packed_fields is not None:
            # one wide slice replaces ~15 per-field dynamic slices — the
            # sweep is op-dispatch bound, not bandwidth bound
            win2d = jax.lax.dynamic_slice_in_dim(pf2d, start, lw)
            fields = _unpack_window(win2d, pf_meta)
            for f in _VIEW_FIELDS:
                if f not in fields:
                    fields[f] = sl(getattr(sorted_cons, f))
            view = SimpleNamespace(**fields)
        else:
            view = SimpleNamespace(
                **{f: sl(getattr(sorted_cons, f)) for f in _VIEW_FIELDS})
        if merge_imp:
            win_i = sl(imp)
            prev_n = jax.lax.slice_in_dim(win_i, 0, p_flat, axis=1)
            prev_t = jax.lax.slice_in_dim(win_i, p_flat,
                                          p_flat * (1 + s_len_),
                                          axis=1).reshape(lw, p_flat, s_len_)
        else:
            prev_n = sl(n_imp)
            prev_t = sl(t_imp)
        if chain is not None:
            # gather through the cached last-writer chain (STATIC slice of
            # the precomputed per-color src rows — see build_gs_chain)
            src_c = jax.lax.slice_in_dim(src_all, 2 * w_off,
                                         2 * w_off + 2 * lw)
            pp = packed[src_c]
        else:
            ba = sl(sorted_cons.body_a)
            bb = sl(sorted_cons.body_b)
            # ONE merged gather for both sides: gather/scatter cost on TPU
            # is dominated by fixed per-op overhead, so 1x8192 rows beats
            # 2x4096
            pp = packed[jnp.concatenate([ba, bb])]
        p1, p2 = pp[:lw], pp[lw:]
        v1l, v1a = p1[:, :dim], p1[:, dim:vel_w]
        v2l, v2a = p2[:, :dim], p2[:, dim:vel_w]
        if ang2d:
            v1a = v1a[:, 0]
            v2a = v2a[:, 0]
        if rhs_mode is not None:
            # in-kernel rhs relinearization (see gs_math_block_rhs): the
            # biased rung computes this substep's rhs from the stream-ridden
            # poses and stores rhs_wo_bias in the merged impulse matrix; the
            # unbiased rung consumes it with cfm = 1
            from wgmath_tpu.dynamics.gs_pallas import gs_math_block_rhs

            num_pts = sl(sorted_cons.num_points)
            kw = dict(mode=rhs_mode, consts=rhs_consts, p_max=p_max,
                      s_len=s_len_,
                      use_pallas=None if use_cm_kernel else False)
            if rhs_mode == "biased":
                new_n, new_t, d1, d2, rhs_wo = gs_math_block_rhs(
                    win2d, pf_meta, num_pts, active, p1[:, :vel_w],
                    p2[:, :vel_w], prev_n, prev_t,
                    pose1=p1[:, vel_w:], pose2=p2[:, vel_w:], **kw)
            else:
                rhs_wo = jax.lax.slice_in_dim(
                    win_i, p_flat * (1 + s_len_), p_flat * (2 + s_len_),
                    axis=1)
                new_n, new_t, d1, d2 = gs_math_block_rhs(
                    win2d, pf_meta, num_pts, active, p1[:, :vel_w],
                    p2[:, :vel_w], prev_n, prev_t, n_rhs_wo=rhs_wo, **kw)
        elif use_cm_kernel:
            # fused component-major impulse math: one Pallas VPU kernel
            # replaces ~55 dispatch-bound XLA ops per color iteration
            from wgmath_tpu.dynamics.gs_pallas import gs_math_block

            new_n, new_t, d1, d2 = gs_math_block(
                win2d, pf_meta, view, active, p1, p2, prev_n, prev_t,
                p_max=p_max, s_len=s_len_)
        else:
            i1l, i1a, i2l, i2a = v1l, v1a, v2l, v2a
            new_n, new_t, v1l, v1a, v2l, v2a = _point_updates(
                view, active, v1l, v1a, v2l, v2a, prev_n, prev_t, p_max,
                dim)
            if ang2d:
                v1a, i1a = v1a[:, None], i1a[:, None]
                v2a, i2a = v2a[:, None], i2a[:, None]
            d1 = jnp.concatenate([v1l - i1l, v1a - i1a], axis=-1)
            d2 = jnp.concatenate([v2l - i2l, v2a - i2a], axis=-1)
        d12 = jnp.concatenate([d1, d2])
        if rhs_mode == "biased":
            # pose columns ride the stream unchanged (delta 0)
            d12 = jnp.concatenate(
                [d12, jnp.zeros((d12.shape[0], packed.shape[-1] - vel_w),
                                d12.dtype)], axis=-1)

        def upd_imps():
            if merge_imp:
                cols = [new_n, new_t.reshape(lw, -1)]
                if rhs_mode is not None:
                    cols.append(rhs_wo)
                new_i = jnp.concatenate(cols, axis=1)
                return (jax.lax.dynamic_update_slice_in_dim(imp, new_i,
                                                            start, 0),)
            return (jax.lax.dynamic_update_slice_in_dim(n_imp, new_n,
                                                        start, 0),
                    jax.lax.dynamic_update_slice_in_dim(t_imp, new_t,
                                                        start, 0))

        if chain is not None:
            # scatter-free: write BOTH sides' updated velocities to this
            # color's static stream segment; rows whose side is static or
            # inactive are never chained-from, so their (unmasked) values
            # are harmless. Later colors read them via src_all.
            packed = jax.lax.dynamic_update_slice_in_dim(
                packed, pp + d12, n_bodies + 2 * w_off, 0)
            return (packed,) + upd_imps()
        trash = n_bodies + slot  # disjoint scratch row per slot → unique
        ba_sel = jnp.where(active & sl(dyn_a_s), ba, trash)
        bb_sel = jnp.where(active & sl(dyn_b_s), bb, trash + lw)
        sel2 = jnp.concatenate([ba_sel, bb_sel])
        if axis_name is None:
            # one merged scatter: a-side and b-side bodies within a color
            # are ALL distinct (disjoint dynamic bodies; trash rows split)
            packed = packed.at[sel2].add(d12, mode="promise_in_bounds",
                                         unique_indices=True)
            return (packed,) + upd_imps()
        else:
            # every device owns a disjoint slice of the window: one psum of
            # the (dense-represented) deltas reproduces sequential GS
            delta = jnp.zeros_like(packed)
            delta = delta.at[sel2].add(d12, mode="promise_in_bounds",
                                       unique_indices=True)
            delta = delta.at[n_bodies:].set(0.0)
            packed = packed + jax.lax.psum(delta, axis_name)
            # impulse deltas ride the same pattern (window-sized psum) so
            # the replicated accumulators stay consistent for warmstart
            wf = lw * n_shards  # full (all-device) window size
            win_n = jnp.zeros((wf,) + new_n.shape[1:], new_n.dtype)
            win_t = jnp.zeros((wf,) + new_t.shape[1:], new_t.dtype)
            win_n = jax.lax.dynamic_update_slice_in_dim(
                win_n, new_n - prev_n, shard_off, 0)
            win_t = jax.lax.dynamic_update_slice_in_dim(
                win_t, new_t - prev_t, shard_off, 0)
            win_n = jax.lax.psum(win_n, axis_name)
            win_t = jax.lax.psum(win_t, axis_name)
            cur_n = jax.lax.dynamic_slice_in_dim(n_imp, base, wf)
            cur_t = jax.lax.dynamic_slice_in_dim(t_imp, base, wf)
            n_imp = jax.lax.dynamic_update_slice_in_dim(
                n_imp, cur_n + win_n, base, 0)
            t_imp = jax.lax.dynamic_update_slice_in_dim(
                t_imp, cur_t + win_t, base, 0)
        return packed, n_imp, t_imp

    if windows is not None:
        if merge_imp:
            # merged sorted-space impulse matrix for the unrolled ladder
            # (the rhs-in-rung store rides it as trailing columns)
            imp_cols = [n_imp_s, t_imp_s.reshape(t_imp_s.shape[0], -1)]
            if rhs_mode is not None:
                imp_cols.append(rhs_store)
            imp0 = jnp.concatenate(imp_cols, axis=1)
            carry = (packed0, imp0)
        else:
            # sharded ladder: impulses stay as separate arrays (the psum
            # branch in one_color_lw keeps the replicas consistent)
            carry = (packed0, n_imp_s, t_imp_s)
        # static unrolled ladder: color c sweeps a windows[c-1]-sized slice;
        # empty classes skip their body via lax.cond (verified cheap on this
        # backend). The compiled program grows with max_colors, but every
        # color now moves only ~its class size of gather/scatter rows.
        w_off = 0
        for ci, w in enumerate(windows, start=1):
            if w == 0:
                # pruned rung (step_checked zeroes rungs past the last
                # occupied class): skipped at TRACE time — a class that
                # re-occupies it is parked one frame and the rung regrows,
                # the standard capacity contract
                continue
            lw_c = w if axis_name is None else w // n_shards
            if ci >= color_lo:
                if chain is not None or axis_name is not None:
                    # unconditional: an empty color's stream rows are never
                    # chained-from and its impulse window rewrites prev
                    # values (active=False masks the math) — the cond's
                    # per-color dispatch overhead buys nothing on the
                    # settled hot path where every class is occupied.
                    # Sharded rungs are unconditional for a second reason:
                    # psum inside a lax.cond branch is not portably legal
                    # under shard_map (an empty class psums zeros instead).
                    carry = one_color_lw(ci, carry, lw_c, w_off=w_off)
                else:
                    carry = jax.lax.cond(
                        counts[ci] > 0,
                        lambda carry, ci=ci, w=lw_c, wo=w_off: one_color_lw(
                            ci, carry, w, w_off=wo),
                        lambda carry: carry,
                        carry)
            w_off += w
        if merge_imp:
            packed, imp1 = carry
            n_imp_s = jax.lax.slice_in_dim(imp1, 0, p_flat, axis=1)
            t_imp_s = jax.lax.slice_in_dim(imp1, p_flat,
                                           p_flat * (1 + s_len_),
                                           axis=1).reshape(t_imp_s.shape)
            if rhs_mode is not None:
                rhs_store = jax.lax.slice_in_dim(
                    imp1, p_flat * (1 + s_len_), p_flat * (2 + s_len_),
                    axis=1)
        else:
            packed, n_imp_s, t_imp_s = carry
    else:
        one_color = functools.partial(one_color_lw, lw=cmax // n_shards)
        packed, n_imp_s, t_imp_s = jax.lax.fori_loop(
            color_lo, num_colors + 1, one_color, (packed0, n_imp_s, t_imp_s))
    # chained mode: each body's final velocity lives at its last writer's
    # stream row (identity for untouched bodies)
    packed = packed[last_writer] if chain is not None else packed[:n_bodies]
    ang_out = packed[:, dim:vel_w]
    if ang2d:
        ang_out = ang_out[:, 0]
    out = (Velocity(packed[:, :dim], ang_out), n_imp_s, t_imp_s)
    if rhs_mode is not None:
        return out + (rhs_store,)
    return out


# ---------------------------------------------------------------------------
# Per-body pseudo-Jacobi pass (≙ step_jacobi)
# ---------------------------------------------------------------------------


def jacobi_pass(cons: ContactConstraints, vels: Velocity, csr,
                *, max_per_body: int = 32):
    """Each body solves its own constraints sequentially against a stale
    snapshot of other bodies (side-local impulse copies), all bodies in
    parallel (≙ solver.wgsl step_jacobi:211-351)."""
    entries, offsets, counts = csr
    dim = cons.dim
    p_max = cons.n_impulse.shape[1]
    n = vels.linear.shape[0]
    c = cons.body_a.shape[0]
    snap_l, snap_a = vels.linear, vels.angular

    def body_fn(k, carry):
        own_l, own_a, n_imp, n_imp_j, t_imp, t_imp_j = carry
        active = k < counts
        e = jnp.clip(offsets + k, 0, entries.shape[0] - 1)
        v = entries[e]
        cid = jnp.where(active, v >> 1, 0)
        is_a = (v & 1) == 0

        body_a = cons.body_a[cid]
        body_b = cons.body_b[cid]
        other = jnp.where(is_a, body_b, body_a)
        v1l = jnp.where(is_a[:, None], own_l, snap_l[other])
        v2l = jnp.where(is_a[:, None], snap_l[other], own_l)
        if own_a.ndim == 2:
            v1a = jnp.where(is_a[:, None], own_a, snap_a[other])
            v2a = jnp.where(is_a[:, None], snap_a[other], own_a)
        else:
            v1a = jnp.where(is_a, own_a, snap_a[other])
            v2a = jnp.where(is_a, snap_a[other], own_a)

        prev_n = jnp.where(is_a[:, None], n_imp[cid], n_imp_j[cid])
        prev_t = jnp.where(is_a[:, None, None], t_imp[cid], t_imp_j[cid])
        new_n, new_t, v1l, v1a, v2l, v2a = _point_updates(
            _view(cons, cid), active, v1l, v1a, v2l, v2a, prev_n, prev_t,
            p_max, dim)

        # store impulses on own side only (each (cid, side) owned by one body)
        drop = c  # out-of-range → dropped
        cid_a = jnp.where(active & is_a, cid, drop)
        cid_b = jnp.where(active & ~is_a, cid, drop)
        n_imp = n_imp.at[cid_a].set(new_n, mode="drop")
        n_imp_j = n_imp_j.at[cid_b].set(new_n, mode="drop")
        t_imp = t_imp.at[cid_a].set(new_t, mode="drop")
        t_imp_j = t_imp_j.at[cid_b].set(new_t, mode="drop")

        keep_l = jnp.where(is_a[:, None], v1l, v2l)
        own_l = jnp.where(active[:, None], keep_l, own_l)
        if own_a.ndim == 2:
            keep_a = jnp.where(is_a[:, None], v1a, v2a)
            own_a = jnp.where(active[:, None], keep_a, own_a)
        else:
            keep_a = jnp.where(is_a, v1a, v2a)
            own_a = jnp.where(active, keep_a, own_a)
        return own_l, own_a, n_imp, n_imp_j, t_imp, t_imp_j

    own_l, own_a, n_imp, n_imp_j, t_imp, t_imp_j = jax.lax.fori_loop(
        0, max_per_body, body_fn,
        (vels.linear, vels.angular, cons.n_impulse, cons.n_impulse_jacobi,
         cons.t_impulse, cons.t_impulse_jacobi))
    return (Velocity(own_l, own_a),
            dataclasses.replace(cons, n_impulse=n_imp, n_impulse_jacobi=n_imp_j,
                                t_impulse=t_imp, t_impulse_jacobi=t_imp_j))


# ---------------------------------------------------------------------------
# Full TGS-soft / Jacobi solve (≙ solver.rs prepare + solve_tgs)
# ---------------------------------------------------------------------------


def solve(bodies: Bodies, mprops: WorldMassProperties, contacts: Contacts,
          params: SimParams, *, use_jacobi: bool = False,
          max_colors: int = 32, max_per_body: int = 32,
          warmstart_from: ContactConstraints | None = None,
          joints=None, gs_cmax: int = 0, prev_colors=None,
          colors_in=None, shard=None, stable_slots: bool = False,
          pair_slots: bool = False, layout_valid=None, stable_hint=None,
          gs_tail_window: int = 0, gs_split: int = 8,
          cache_in=None,
          presorted: bool = False, gs_windows: tuple = (),
          fused: bool = False, fused_rung0: int = 0,
          fused_class_counts=None, fused_pallas: bool = True,
          chained: bool = False, rhs_in_rung: bool = False,
          static_layout: tuple | None = None):
    """Run the complete constraint solve for one frame; returns
    ``(new_poses, new_vels, constraints, max_class, colors, solve_cache)``
    — always six (solve_cache is None under jacobi). One
    jit-traceable program.

    Sequence ≙ solver.rs:238-460 with the substep dt convention of
    pipeline.rs:266 (device dt = frame dt / num_solver_iterations).

    ``prev_colors``: last frame's coloring. When the constraint pair keys
    are bitwise-identical to ``warmstart_from``'s (the common settled-scene
    case — BP and narrow phase are deterministic and order-stable), the
    coloring is reused via ``lax.cond`` instead of re-run; the contact graph
    is unchanged so the old independent sets are still exact. The reference
    recolors every frame (coloring.rs) because its readback-driven loop
    cannot cheaply test set equality on device.

    ``presorted``: the contacts (hence ``cons`` and ``colors_in``) are
    already color-major (``compact_contacts(..., sort_by_extra=True)``) —
    the layout becomes identity order + segment counts and the per-frame
    field sort-gather is skipped.

    ``pair_slots``: contacts sit at their (color-major-sorted, BP-cached)
    PAIR slots — no per-frame compaction upstream, so slots are bitwise
    stable for the whole BP-cache lifetime regardless of contact-validity
    flicker (the cumsum compaction shifted ~every slot whenever one
    marginal contact flickered, defeating the stable-keys conds: measured
    ~24k/26k changed keys per settled frame). ``layout_valid`` is the PAIR
    validity (layout/windows/chain cover every cached pair; contact-invalid
    rows ride as impulse-preserving identity pass-throughs, masked by
    ``valid`` in the math), and ``stable_hint`` (the pipeline's
    bp_path == 0) replaces the bitwise key-equality predicate for the
    layout-bundle and slotwise-warmstart conds.
    """
    dim = bodies.dim
    sub = params.substep().with_dim(dim)
    n = bodies.num_bodies
    # pair keys (warmstart match, stable-contact-set predicate, cached
    # pair-graph colors) pack (a, b) as a<<16|b — silent aliasing past 64k
    # bodies would match wrong pairs; widen pair_key to u64 before lifting
    assert n < (1 << 16), (
        f"{n} bodies: 16-bit pair keys alias at >= 65536 bodies")

    use_fused = (fused and bool(gs_windows) and presorted
                 and colors_in is not None and shard is None and dim == 3
                 and fused_class_counts is not None and not use_jacobi)
    if use_fused:
        # fused builder: one Pallas kernel emits the packed transposed
        # field matrix directly (build_pallas.py) — the per-frame
        # constraint build was solve-setup's dominant dispatch cost
        from wgmath_tpu.dynamics.build_pallas import build_constraints_fused

        cons, pre_bigT, pre_meta = build_constraints_fused(
            bodies.poses, bodies.vels, mprops, contacts, params,
            use_pallas=None if fused_pallas else False)
    else:
        cons = build_constraints(bodies.poses, bodies.vels, mprops,
                                 contacts, params)
    # contact-set stability predicate: when the (body_a, body_b, valid) keys
    # are bitwise-identical to last frame's (the settled-scene common case),
    # the graph coloring is reused under lax.cond — colors depend only on
    # the pair graph, which this predicate captures exactly
    same = None
    if pair_slots:
        # slots are pair slots: stable exactly when the BP cache was reused
        # this frame (stable_hint) — contact flicker no longer matters
        if (stable_hint is not None and warmstart_from is not None
                and warmstart_from.body_a.shape == cons.body_a.shape):
            same = stable_hint
    elif (warmstart_from is not None
            and warmstart_from.body_a.shape == cons.body_a.shape):
        def _keys(ba, bb, valid):
            k = (ba.astype(jnp.uint32) << 16) | (bb.astype(jnp.uint32)
                                                 & 0xFFFF)
            return jnp.where(valid, k, jnp.uint32(0xFFFFFFFF))

        same = jnp.all(
            _keys(cons.body_a, cons.body_b, cons.valid)
            == _keys(warmstart_from.body_a, warmstart_from.body_b,
                     warmstart_from.valid))
    if warmstart_from is not None:
        # By-key matching is the robust default: even when the pair set is
        # stable, MESH manifolds re-pick their K-best triangles per frame,
        # so a slotwise impulse copy can pair an impulse with a different
        # anchor (measured as residual jitter on trimesh resting tests).
        # Mesh-free scenes (``stable_slots``) skip the sort+match (~5 ms at
        # 32k constraints) whenever the contact keys are bitwise-stable:
        # slot i is then the SAME (body_a, body_b) manifold as last frame.
        if stable_slots and same is not None:
            cons = jax.lax.cond(
                same,
                lambda: slotwise_warmstart(cons, warmstart_from, params),
                lambda: transfer_warmstart(cons, warmstart_from, params))
        else:
            cons = transfer_warmstart(cons, warmstart_from, params)

    dynamic = bodies.is_dynamic()
    # cleanup (solver.wgsl:194-208): dynamic bodies start from their
    # velocity, statics from zero. Kinematic (one-way-coupled) bodies KEEP
    # their prescribed velocity too — unlike the reference, which zeroes
    # every im=0 body: the sweep gathers both sides' velocities from the
    # stream, so the platform's motion enters each contact's relative
    # velocity while its im=0 sides still take zero impulse deltas, and
    # integrate_velocity below advances its pose (body.rs:169-192 intent).
    keep_v = dynamic | bodies.is_kinematic()
    lin = jnp.where(keep_v[:, None], bodies.vels.linear, 0.0)
    if bodies.vels.angular.ndim == 2:
        ang = jnp.where(keep_v[:, None], bodies.vels.angular, 0.0)
    else:
        ang = jnp.where(keep_v, bodies.vels.angular, 0.0)
    vels = Velocity(lin, ang)

    # init_solver_vels_inc (solver.wgsl:354-374): gravity per substep
    g = sub.gravity_array(dim)
    inc = jnp.where(dynamic[:, None], g[None, :] * sub.dt, 0.0)

    if use_jacobi:
        csr = build_body_constraint_csr(cons, n)
        colors = None
        layout = None
        num_colors = None
        cmax = 0
    else:
        if colors_in is not None:
            # pre-colored (pair-graph colors cached with the broad phase):
            # steady-state frames skip coloring entirely
            colors = colors_in
        elif same is not None and prev_colors is not None \
                and prev_colors.shape == cons.body_a.shape:
            colors = jax.lax.cond(
                same, lambda: prev_colors,
                lambda: color_constraints(cons, n, max_colors=max_colors,
                                          class_cap=gs_cmax))
        else:
            colors = color_constraints(cons, n, max_colors=max_colors,
                                       class_cap=gs_cmax)
        # a color class holds ≤ one constraint per dynamic body; gs_cmax
        # tightens the per-color window (host-grown via the overflow count)
        cmax = min(cons.body_a.shape[0], n + 64)
        if gs_cmax:
            cmax = min(cmax, gs_cmax)
        if gs_windows:
            # static per-color window ladder (see gs_color_major_pass):
            # padding/caps size to the largest rung. Sharded runs split
            # each rung evenly across the mesh — round the windows up to
            # multiples of the device count (padding rows are masked).
            assert len(gs_windows) >= max_colors
            gs_windows = tuple(gs_windows[:max_colors])
            if shard is not None:
                nsh = shard[1]
                gs_windows = tuple(-(-w // nsh) * nsh for w in gs_windows)
            cmax = max(gs_windows)
        if shard is not None:  # color windows split evenly across devices
            cmax = -(-cmax // shard[1]) * shard[1]
        c_cap = cons.body_a.shape[0]
        # contacts compacted sorted-by-color upstream: the constraint buffer
        # IS color-major, so the layout is identity order + segment counts
        # and the per-frame field sort-gather disappears entirely
        use_presorted = bool(presorted and colors_in is not None
                             and shard is None)
        # chained (scatter-free) sweep: windows-ladder mode only, unsharded
        use_chained = bool(chained and not use_fused and gs_windows
                           and shard is None)
        # fused sweep (gs_fused.py): STATIC rung-padded layout — contacts
        # compacted to compile-time per-color offsets upstream
        # (compact_contacts(static_windows=...)), the whole sweep one
        # Pallas kernel. Requires the presorted color-major path, 3D.
        # (use_fused itself was decided before the constraint build.)
        if use_fused:
            from wgmath_tpu.dynamics.gs_fused import (
                build_fused_tables,
                fused_layout,
                fused_sweep,
                gather_width,
            )

            f_rungs, f_offs, f_ctot = fused_layout(
                tuple(gs_windows[:max_colors]), fused_rung0)
            assert c_cap == f_ctot, (c_cap, f_ctot)
            f_wg = gather_width(n, tuple(gs_windows[:max_colors]))

        def _layout_sides():
            if use_fused:
                # static rung-padded layout: identity order, compile-time
                # offsets, TRUE class counts (the rung-regrow signal)
                counts = jnp.concatenate([
                    fused_class_counts.astype(jnp.int32),
                    jnp.zeros(max_colors + 2 - fused_class_counts.shape[0],
                              jnp.int32)])
                offsets = jnp.asarray(f_offs)  # [max_colors + 2] static
                order_padded = jnp.arange(c_cap, dtype=jnp.int32)
                layout = (order_padded, offsets, counts)
            elif use_presorted:
                # pair-slot mode: layout/windows cover every cached PAIR
                # (stable under the BP cache); contact-invalid rows are
                # masked in the math, not excluded from the layout
                lv = (layout_valid if pair_slots and layout_valid is not None
                      else cons.valid)
                key = jnp.where(lv,
                                jnp.clip(colors, 0, max_colors),
                                max_colors + 1).astype(jnp.int32)
                counts = jax.ops.segment_sum(
                    lv.astype(jnp.int32), key,
                    num_segments=max_colors + 2)
                if static_layout is not None:
                    # static rung placement (gs_static_slots): class c
                    # starts at the COMPILE-TIME offset Σwindows[:c-1] —
                    # every downstream per-rung dynamic_slice folds to a
                    # static slice (the scheduler can fuse/prefetch it;
                    # dynamic class boundaries cost ~2.1 ms/step of async
                    # slice-starts in the round-4 device profile).
                    # Residue (0) and invalid (max+1) park at the tail.
                    Wnp = np.concatenate(
                        [[0], np.cumsum(static_layout)]).astype(np.int32)
                    offsets = jnp.asarray(np.concatenate(
                        [[Wnp[-1]], Wnp[:-1], [Wnp[-1]]]).astype(np.int32))
                else:
                    offsets = jnp.concatenate([
                        jnp.zeros(1, jnp.int32),
                        jnp.cumsum(counts)[:-1].astype(jnp.int32)])
                order_padded = jnp.concatenate(
                    [jnp.arange(c_cap, dtype=jnp.int32),
                     jnp.full((cmax,), c_cap, jnp.int32)])
                layout = (order_padded, offsets, counts)
            else:
                layout = build_color_layout(colors, cons.valid,
                                            max_colors=max_colors, cmax=cmax)
            if pair_slots and layout_valid is not None:
                # sides/chain must span every PAIR row (contact-invalid
                # rows pass velocities through with zero deltas), and must
                # not read contact data at all — the bundle is cached
                # across frames keyed on the BP cache, so anything
                # per-frame here would go stale. Dynamic flags come from
                # the body table, not cons.im (bitwise-identical: statics
                # have zero inv mass on every axis).
                dyn_bodies = bodies.is_dynamic()
                dyn_a = dyn_bodies[cons.body_a]
                dyn_b = dyn_bodies[cons.body_b]
                lv_s = layout_valid
            else:
                dyn_a = jnp.any(cons.im_a != 0.0, axis=-1)
                dyn_b = jnp.any(cons.im_b != 0.0, axis=-1)
                lv_s = cons.valid
            order_padded = layout[0]
            idxp = jnp.minimum(order_padded, cons.body_a.shape[0] - 1)
            padv = order_padded >= cons.body_a.shape[0]
            ba_p, bb_p = cons.body_a[idxp], cons.body_b[idxp]
            dyn_a_p, dyn_b_p = dyn_a[idxp], dyn_b[idxp]
            sides = _build_sides(ba_p, bb_p, dyn_a_p, dyn_b_p,
                                 jnp.where(padv, False, lv_s[idxp]), n)
            if use_fused:
                tables = build_fused_tables(
                    cons.body_a, cons.body_b, dyn_a, dyn_b, cons.valid,
                    windows=tuple(gs_windows[:max_colors]),
                    rung0=fused_rung0, w_g=f_wg)
                return layout + sides + tables
            if use_chained:
                chain_t = build_gs_chain(ba_p, bb_p, dyn_a_p, dyn_b_p,
                                         layout[1], layout[2],
                                         tuple(gs_windows), n)
                return layout + sides + chain_t
            return layout + sides

        # layout + warmstart segments depend only on (pair keys, colors):
        # bitwise-stable contact sets reuse last frame's (sort-free)
        bundle_len = 8 if (use_fused or use_chained) else 6
        if (cache_in is not None and same is not None
                and len(cache_in) == bundle_len):
            fresh = _layout_sides()
            shapes_ok = all(
                tuple(c.shape) == tuple(f.shape) and c.dtype == f.dtype
                for c, f in zip(cache_in, fresh))
            # shapes_ok is static; fresh is only used as the fallback branch
            if shapes_ok:
                bundle = jax.lax.cond(same, lambda: tuple(cache_in),
                                      lambda: _layout_sides())
            else:
                bundle = fresh
        else:
            bundle = _layout_sides()
        layout = bundle[:3]
        ws_sides = bundle[3:6]
        fused_tables = bundle[6:8] if use_fused else None
        gs_chain = bundle[6:8] if use_chained else None
        solve_cache = bundle
        # num_colors must come from the layout actually swept: when `same`
        # reuses the cached bundle while `colors` was freshly recolored (a
        # BP refresh that fell back to a full recolor of a bitwise-identical
        # contact graph), a fresh-colors maximum could exceed the cached
        # layout's class count and classes past it would never be swept.
        # The bundle's own class_counts are consistent in both branches.
        class_ids = jnp.arange(max_colors + 2, dtype=jnp.int32)
        num_colors = jnp.max(jnp.where(
            (bundle[2] > 0) & (class_ids >= 1) & (class_ids <= max_colors),
            class_ids, 0))
        csr = None
        # everything below lives in color-sorted space for the whole solve:
        # fields sorted once, impulses carried sorted, unsorted once at end
        order_padded = layout[0]
        if use_fused:
            # the fused builder's cons fields ARE row-major views of the
            # packed matrix — no repacking at all; the sweep kernel takes
            # the transposed matrix's _PACK_FIELDS prefix directly
            from types import SimpleNamespace

            ss = SimpleNamespace(
                **{f: getattr(cons, f) for f in _F32_SORT_FIELDS},
                body_a=cons.body_a, body_b=cons.body_b,
                num_points=cons.num_points, valid=cons.valid)
            k_pack = pre_meta["cfm_factor"][0]
            packed_fields = (pre_bigT[:k_pack],
                             {f: pre_meta[f] for f in _PACK_FIELDS})
        elif use_presorted:
            ss, packed_fields = pad_solver_fields_packed(cons, cmax)
        else:
            ss, packed_fields = sort_solver_fields_packed(cons, order_padded)
            idx_s0 = jnp.minimum(order_padded, c_cap - 1)

    if joints is not None:
        from wgmath_tpu.dynamics.joint import (
            build_joint_constraints,
            joint_gs_pass,
            remove_joint_bias,
        )

    dim_ = dim
    # split-window sweep: the claim-capped coloring front-loads big color
    # classes, so the tail colors (tiny classes) sweep through a narrower
    # window — total window slots drop ~30% at 13 colors (the tail-window
    # overflow signal below lets the host regrow gs_tail_window)
    use_tail = (not use_jacobi and gs_tail_window
                and gs_tail_window < cmax and shard is None
                and not gs_windows)

    if not use_jacobi and use_fused:
        # hoisted per-solve: transposed invariant fields for the fused
        # sweep kernel (substep-invariant; already transposed — the fused
        # builder emits the matrix component-major)
        f_winT = packed_fields[0]
        f_activeT = ss.valid.astype(jnp.float32)[None, :]
        f_numpT = ss.num_points.astype(jnp.float32)[None, :]
        f_p_max = cons.n_impulse.shape[1]
        f_s_len = cons.tangent_a.shape[-2]
        f_windows = tuple(gs_windows[:max_colors])
        f_idx, f_inv = fused_tables

    def run_sweep(cons_ns, vels, ni, ti):
        if use_fused:
            vt = jnp.zeros((8, f_wg), jnp.float32)
            vt = vt.at[0:3, :n].set(vels.linear.T)
            vt = vt.at[3:6, :n].set(vels.angular.T)
            nT = ni.reshape(c_cap, f_p_max).T
            tT = ti.reshape(c_cap, f_p_max * f_s_len).T
            n_rhsT = cons_ns.n_rhs.reshape(c_cap, f_p_max).T
            t_rhsT = cons_ns.t_rhs.reshape(c_cap, f_p_max * f_s_len).T
            vt, nT, tT = fused_sweep(
                vt, nT, tT, f_winT, f_activeT, f_numpT,
                cons_ns.cfm_factor[0], n_rhsT, t_rhsT, f_idx, f_inv,
                layout[2], windows=f_windows, rung0=fused_rung0,
                p_max=f_p_max, s_len=f_s_len, meta=packed_fields[1],
                use_pallas=None if fused_pallas else False)
            vels = Velocity(vt[0:3, :n].T, vt[3:6, :n].T)
            return (vels, nT.T.reshape(ni.shape), tT.T.reshape(ti.shape))
        if not use_tail:
            return gs_color_major_pass(
                cons_ns, vels, ni, ti, layout, num_colors, cmax=cmax,
                dim=dim_, shard=shard, packed_fields=packed_fields,
                windows=gs_windows or None,
                chain=gs_chain if use_chained else None)
        head_hi = jnp.minimum(num_colors, gs_split)
        vels, ni, ti = gs_color_major_pass(
            cons_ns, vels, ni, ti, layout, head_hi, cmax=cmax, dim=dim_,
            shard=shard, packed_fields=packed_fields)
        return gs_color_major_pass(
            cons_ns, vels, ni, ti, layout, num_colors,
            cmax=gs_tail_window, dim=dim_, shard=shard,
            packed_fields=packed_fields, color_lo=gs_split + 1)

    import types as _types

    # rhs-in-rung: chained sweeps recompute each rung's substep rhs IN the
    # math kernel (gs_pallas.gs_math_block_rhs) — no update_rhs_sorted
    # phase, no per-substep 2C-row pose gather. Joints run the classic
    # per-substep joint passes AROUND the chained contact sweeps (the
    # joint builder needs substep poses anyway, and the joint graph has
    # its own colors) — jointed scenes keep the fast contact path.
    use_rhs_rung = (rhs_in_rung and not use_jacobi and use_chained
                    and dim == 3)
    if use_rhs_rung:
        rhs_consts = (float(sub.inv_dt), float(sub.contact_erp_inv_dt),
                      float(sub.allowed_linear_error),
                      float(sub.max_corrective_velocity),
                      float(sub.contact_cfm_factor))

    def substep_gs_rhs(_, carry):
        vels, poses, n_imp_s, t_imp_s = carry
        vels = Velocity(vels.linear + inc, vels.angular)
        n_imp_s = n_imp_s * sub.warmstart_coefficient
        t_imp_s = t_imp_s * sub.warmstart_coefficient
        if joints is not None:
            jcons = build_joint_constraints(joints, poses, mprops, sub)
        deltas = _ws_deltas(ss, n_imp_s, t_imp_s, ss.valid,
                            n_imp_s.shape[1])
        vels = _ws_apply(vels, deltas, ws_sides)
        if joints is not None:
            vels, jcons = joint_gs_pass(jcons, vels, joints.colors,
                                        max_colors=max_colors)
        pose_tab = jnp.concatenate(
            [poses.rotation, poses.translation, poses.scale[:, None]],
            axis=-1)
        rhs0 = jnp.zeros((n_imp_s.shape[0], n_imp_s.shape[1]), jnp.float32)
        vels, n_imp_s, t_imp_s, rhs_store = gs_color_major_pass(
            ss, vels, n_imp_s, t_imp_s, layout, num_colors, cmax=cmax,
            dim=dim_, packed_fields=packed_fields, windows=gs_windows,
            chain=gs_chain, rhs_mode="biased", pose_tab=pose_tab,
            rhs_consts=rhs_consts, rhs_store=rhs0)
        poses = integrate_velocity(poses, vels, bodies.local_mprops.com,
                                   sub.dt)
        if joints is not None:
            jcons = remove_joint_bias(jcons)
            vels, jcons = joint_gs_pass(jcons, vels, joints.colors,
                                        max_colors=max_colors)
        vels, n_imp_s, t_imp_s, _ = gs_color_major_pass(
            ss, vels, n_imp_s, t_imp_s, layout, num_colors, cmax=cmax,
            dim=dim_, packed_fields=packed_fields, windows=gs_windows,
            chain=gs_chain, rhs_mode="unbiased",
            rhs_consts=rhs_consts, rhs_store=rhs_store)
        return vels, poses, n_imp_s, t_imp_s

    def substep_gs(_, carry):
        vels, poses, n_imp_s, t_imp_s = carry
        vels = Velocity(vels.linear + inc, vels.angular)
        # relinearize rhs + rescale impulses entirely in sorted space
        # (≙ update_constraints, solver.wgsl:103-170)
        n_rhs, n_rhs_wo_bias, t_rhs = update_rhs_sorted(ss, poses, sub)
        n_imp_s = n_imp_s * sub.warmstart_coefficient
        t_imp_s = t_imp_s * sub.warmstart_coefficient
        sorted_cons = _types.SimpleNamespace(**vars(ss))
        sorted_cons.n_rhs = n_rhs
        sorted_cons.n_rhs_wo_bias = n_rhs_wo_bias
        sorted_cons.t_rhs = t_rhs
        sorted_cons.cfm_factor = jnp.full_like(ss.cfm_factor,
                                               sub.contact_cfm_factor)
        if joints is not None:
            jcons = build_joint_constraints(joints, poses, mprops, sub)
        deltas = _ws_deltas(ss, n_imp_s, t_imp_s, ss.valid,
                            n_imp_s.shape[1])
        vels = _ws_apply(vels, deltas, ws_sides)
        if joints is not None:
            vels, jcons = joint_gs_pass(jcons, vels, joints.colors,
                                        max_colors=max_colors)
        vels, n_imp_s, t_imp_s = run_sweep(sorted_cons, vels,
                                           n_imp_s, t_imp_s)
        poses = integrate_velocity(poses, vels, bodies.local_mprops.com, sub.dt)
        if joints is not None:
            jcons = remove_joint_bias(jcons)
            vels, jcons = joint_gs_pass(jcons, vels, joints.colors,
                                        max_colors=max_colors)
        unbiased = _types.SimpleNamespace(**vars(sorted_cons))
        unbiased.n_rhs = sorted_cons.n_rhs_wo_bias
        unbiased.t_rhs = sorted_cons.t_rhs_wo_bias
        unbiased.cfm_factor = jnp.ones_like(sorted_cons.cfm_factor)
        vels, n_imp_s, t_imp_s = run_sweep(unbiased, vels,
                                           n_imp_s, t_imp_s)
        return vels, poses, n_imp_s, t_imp_s

    # phase-2 fused substep (no joints): impulse scale + warmstart apply +
    # rhs relinearization + biased sweep all in ONE kernel, unbiased sweep
    # in a second — the per-substep 2C-row pose gather and the 2C-row
    # warmstart segment apply disappear from XLA entirely
    use_fused2 = use_fused and joints is None
    if use_fused2:
        from wgmath_tpu.dynamics.gs_fused import (
            fused_integrate,
            fused_substep1,
        )

        _relin = ("t_rhs_wo_bias", "local_pt_a", "local_pt_b",
                  "info_dist", "info_normal_vel")
        src0 = min(int(pre_meta[f][0]) for f in _relin)
        f_srcT = pre_bigT[src0:]
        f_src_meta = {f: (int(pre_meta[f][0]) - src0, pre_meta[f][1])
                      for f in _relin}
        _t0 = int(pre_meta["t_rhs_wo_bias"][0])
        f_trwbT = pre_bigT[_t0:_t0 + f_p_max * f_s_len]
        f_scalars = (float(sub.warmstart_coefficient),
                     float(sub.contact_cfm_factor), float(sub.inv_dt),
                     float(sub.contact_erp_inv_dt),
                     float(sub.allowed_linear_error),
                     float(sub.max_corrective_velocity))
        f_counts = layout[2]
        # everything rides component-major tables for the WHOLE substep
        # loop — velocities/poses/impulses pack once per solve, not once
        # per substep
        f_incT = jnp.zeros((8, f_wg), jnp.float32).at[0:3, :n].set(inc.T)
        f_comT = jnp.zeros((3, f_wg), jnp.float32).at[:, :n].set(
            bodies.local_mprops.com.T)
        if fused_rung0:
            r0 = fused_rung0
            from types import SimpleNamespace as _NS

            res_ns = _NS(**{f: getattr(ss, f)[:r0] for f in
                            ("dir_a", "tangent_a", "im_a", "im_b",
                             "n_torque_a", "n_ii_torque_a", "n_torque_b",
                             "n_ii_torque_b", "t_ii_torque_a",
                             "t_ii_torque_b", "num_points")})
            # static sides keep zero velocity: route them out of bounds
            # (mode=drop), mirroring _build_sides' side_valid
            va = ss.valid[:r0] & jnp.any(ss.im_a[:r0] != 0.0, -1)
            vb = ss.valid[:r0] & jnp.any(ss.im_b[:r0] != 0.0, -1)
            res_sel = jnp.concatenate([
                jnp.where(va, ss.body_a[:r0], f_wg - 1),
                jnp.where(vb, ss.body_b[:r0], f_wg - 1)])

        def substep_fused(_, carry):
            vt, poseP, nT, tT = carry
            vt = vt + f_incT
            if fused_rung0:
                # residue rows (color 0) can share bodies — no inverse
                # permutation exists, so their warmstart applies here via
                # a plain lane scatter-add on the scaled impulses (the
                # kernel scales ALL rows; pre-scale just these)
                d = _ws_deltas(
                    res_ns,
                    nT[:, :fused_rung0].T * sub.warmstart_coefficient,
                    tT[:, :fused_rung0].T.reshape(
                        fused_rung0, f_p_max, f_s_len)
                    * sub.warmstart_coefficient,
                    ss.valid[:fused_rung0], f_p_max)
                # trash lane f_wg-1 absorbs static/invalid sides
                vt = vt.at[0:6, res_sel].add(d.T).at[:, f_wg - 1].set(0.0)
            vt, nT, tT, n_woT = fused_substep1(
                vt, nT, tT, f_winT, f_srcT, poseP, f_activeT, f_numpT,
                f_idx, f_inv, f_counts, windows=f_windows,
                rung0=fused_rung0, p_max=f_p_max, s_len=f_s_len,
                meta=packed_fields[1], src_meta=f_src_meta,
                scalars=f_scalars,
                use_pallas=None if fused_pallas else False)
            poseP = fused_integrate(poseP, vt, f_comT, sub.dt,
                                    use_pallas=None if fused_pallas
                                    else False)
            vt, nT, tT = fused_sweep(
                vt, nT, tT, f_winT, f_activeT, f_numpT, 1.0, n_woT,
                f_trwbT, f_idx, f_inv, f_counts, windows=f_windows,
                rung0=fused_rung0, p_max=f_p_max, s_len=f_s_len,
                meta=packed_fields[1],
                use_pallas=None if fused_pallas else False)
            return vt, poseP, nT, tT

    def substep_jacobi(_, carry):
        vels, poses, cons = carry
        vels = Velocity(vels.linear + inc, vels.angular)
        cons = update_constraints(cons, poses, sub)
        if joints is not None:
            jcons = build_joint_constraints(joints, poses, mprops, sub)
            vels, jcons = joint_gs_pass(jcons, vels, joints.colors,
                                        max_colors=max_colors)
        vels, cons = jacobi_pass(cons, vels, csr, max_per_body=max_per_body)
        poses = integrate_velocity(poses, vels, bodies.local_mprops.com, sub.dt)
        if joints is not None:
            jcons = remove_joint_bias(jcons)
            vels, jcons = joint_gs_pass(jcons, vels, joints.colors,
                                        max_colors=max_colors)
        cons = remove_cfm_and_bias(cons)
        vels, cons = jacobi_pass(cons, vels, csr, max_per_body=max_per_body)
        return vels, poses, cons

    if use_jacobi:
        vels, poses, cons = jax.lax.fori_loop(
            0, params.num_solver_iterations, substep_jacobi,
            (vels, bodies.poses, cons))
    else:
        if use_presorted:
            imp_pad = 0 if use_fused else cmax
            n_imp_s = jnp.concatenate(
                [cons.n_impulse,
                 jnp.zeros((imp_pad,) + cons.n_impulse.shape[1:],
                           jnp.float32)])
            t_imp_s = jnp.concatenate(
                [cons.t_impulse,
                 jnp.zeros((imp_pad,) + cons.t_impulse.shape[1:],
                           jnp.float32)])
        else:
            n_imp_s = cons.n_impulse[idx_s0]
            t_imp_s = cons.t_impulse[idx_s0]
        if use_fused2:
            from wgmath_tpu.geometry.sim import Sim as _Sim

            vt0 = jnp.zeros((8, f_wg), jnp.float32)
            vt0 = vt0.at[0:3, :n].set(vels.linear.T)
            vt0 = vt0.at[3:6, :n].set(vels.angular.T)
            pose_cols = jnp.concatenate(
                [bodies.poses.rotation, bodies.poses.translation,
                 bodies.poses.scale[:, None]], axis=-1)  # [N, 8]
            poseP0 = jnp.zeros((8, f_wg), jnp.float32)
            poseP0 = poseP0.at[:, :n].set(pose_cols.T)
            nT0 = n_imp_s.reshape(c_cap, f_p_max).T
            tT0 = t_imp_s.reshape(c_cap, f_p_max * f_s_len).T
            vt, poseP, nT, tT = jax.lax.fori_loop(
                0, params.num_solver_iterations, substep_fused,
                (vt0, poseP0, nT0, tT0))
            vels = Velocity(vt[0:3, :n].T, vt[3:6, :n].T)
            poses = _Sim(poseP[0:4, :n].T, poseP[4:7, :n].T,
                         poseP[7, :n])
            n_imp_s = nT.T.reshape(n_imp_s.shape)
            t_imp_s = tT.T.reshape(t_imp_s.shape)
        else:
            vels, poses, n_imp_s, t_imp_s = jax.lax.fori_loop(
                0, params.num_solver_iterations,
                substep_gs_rhs if use_rhs_rung else substep_gs,
                (vels, bodies.poses, n_imp_s, t_imp_s))
        # unsort impulses once (next frame's warmstart source)
        if use_presorted:  # identity order: drop the padding rows
            n_imp, t_imp = n_imp_s[:c_cap], t_imp_s[:c_cap]
        else:
            sel = jnp.where(order_padded < c_cap, order_padded, c_cap)
            n_imp = cons.n_impulse.at[sel].set(n_imp_s, mode="drop")
            t_imp = cons.t_impulse.at[sel].set(t_imp_s, mode="drop")
        cons = dataclasses.replace(cons, n_impulse=n_imp, t_impulse=t_imp)
    # largest color-class size (0 when jacobi): host grows gs_cmax on overflow
    if use_jacobi:
        max_class = jnp.zeros(2, jnp.int32)
        colors_out = jnp.zeros_like(cons.body_a)
    else:
        _, _, class_counts = layout
        head = jnp.max(class_counts[1:max_colors + 1])
        # uncolored residue (class_cap regime): segment 0 of the layout was
        # skipped this frame — report it through max_class so the host
        # regrows gs_cmax (bigger cap ⇒ fewer colors ⇒ residue vanishes)
        residue_budget = fused_rung0 if use_fused else 0
        head = head + jnp.where(class_counts[0] > residue_budget,
                                cmax + class_counts[0], 0)
        # tail-window overflow: the largest class past the split color must
        # fit gs_tail_window (0 when the split sweep is off)
        tail = (jnp.max(class_counts[gs_split + 1:max_colors + 1])
                if use_tail else jnp.int32(0))
        max_class = jnp.stack([head, jnp.int32(tail)])
        if gs_windows:
            # export per-class counts so the host can re-bucket the window
            # ladder (same contract as every other capacity signal)
            max_class = jnp.concatenate(
                [max_class, class_counts.astype(jnp.int32)])
        colors_out = colors
    # ONE return shape (round-1 review: the conditional 5/6-tuple was a
    # silent-unpacking hazard as cache features accreted)
    return (poses, vels, cons, max_class, colors_out,
            None if use_jacobi else solve_cache)


def slotwise_warmstart(cons: ContactConstraints, prev: ContactConstraints,
                       params: SimParams) -> ContactConstraints:
    """Impulse carry-over for the bitwise-stable contact-set case: slot i
    holds the same (body_a, body_b) manifold as last frame, so the by-key
    sort+match collapses to a masked scale-and-copy."""
    ws = params.warmstart_coefficient
    v = cons.valid
    return dataclasses.replace(
        cons,
        n_impulse=jnp.where(v[:, None], prev.n_impulse * ws, cons.n_impulse),
        n_impulse_jacobi=jnp.where(v[:, None], prev.n_impulse_jacobi * ws,
                                   cons.n_impulse_jacobi),
        t_impulse=jnp.where(v[:, None, None], prev.t_impulse * ws,
                            cons.t_impulse),
        t_impulse_jacobi=jnp.where(v[:, None, None],
                                   prev.t_impulse_jacobi * ws,
                                   cons.t_impulse_jacobi),
    )


def transfer_warmstart(cons: ContactConstraints, prev: ContactConstraints,
                       params: SimParams) -> ContactConstraints:
    """Frame-to-frame impulse transfer (≙ dynamics/warmstart.rs:36-97):
    match new constraints to previous ones by (body_a, body_b) pair and copy
    impulse accumulators scaled by the warmstart coefficient. Pair matching
    uses a sort of the previous frame's pairs + searchsorted instead of the
    reference's per-body hash walk.

    Pair keys pack (body_a, body_b) into one uint32 per 16-bit half when the
    body count allows, else fall back to f64-free double-key matching via
    separate sorts — here we use the packed u32 (bodies < 65536; lift when
    sharding raises the per-shard body count)."""
    cnew = cons.body_a.shape[0]

    def pack(a, b, valid):
        key = (a.astype(jnp.uint32) << 16) | (b.astype(jnp.uint32) & 0xFFFF)
        return jnp.where(valid, key, jnp.uint32(0xFFFFFFFF))

    key_prev = pack(prev.body_a, prev.body_b, prev.valid)
    order = jnp.argsort(key_prev)
    sorted_prev = key_prev[order]
    key_new = pack(cons.body_a, cons.body_b, cons.valid)
    pos = jnp.searchsorted(sorted_prev, key_new, method="sort")
    # clip by the PREVIOUS buffer's size: capacities may differ across a
    # re-bucket frame (the transfer is by key, not slot)
    pos = jnp.clip(pos, 0, prev.body_a.shape[0] - 1)
    hit = (sorted_prev[pos] == key_new) & cons.valid
    src = order[pos]
    ws = params.warmstart_coefficient
    n_imp = jnp.where(hit[:, None], prev.n_impulse[src] * ws, cons.n_impulse)
    n_imp_j = jnp.where(hit[:, None], prev.n_impulse_jacobi[src] * ws,
                        cons.n_impulse_jacobi)
    t_imp = jnp.where(hit[:, None, None], prev.t_impulse[src] * ws,
                      cons.t_impulse)
    t_imp_j = jnp.where(hit[:, None, None], prev.t_impulse_jacobi[src] * ws,
                        cons.t_impulse_jacobi)
    return dataclasses.replace(cons, n_impulse=n_imp, n_impulse_jacobi=n_imp_j,
                               t_impulse=t_imp, t_impulse_jacobi=t_imp_j)
