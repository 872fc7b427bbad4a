"""Decompose the TGS solve cost on the settled 10k state (real TPU).

Times each solve ingredient in isolation with slope timing:
  build      build_constraints
  coloring   color_constraints
  layout     build_color_layout + sort_solver_fields + sides
  ws_xfer    transfer_warmstart
  rhs        update_rhs_sorted
  ws_apply   _ws_deltas + _ws_apply
  gs_pass    one gs_color_major_pass (per real num_colors)
  gs_1color  gs pass with num_colors=1 (isolates per-color overhead)

Run: python scripts/profile_solve.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import dataclasses  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from profile_step import settled_state  # noqa: E402
from wgmath_tpu.dynamics.body import update_mprops  # noqa: E402
from wgmath_tpu.dynamics.constraint import (  # noqa: E402
    build_constraints,
    compact_contacts,
    update_rhs_sorted,
)
from wgmath_tpu.dynamics import solver as S  # noqa: E402
from wgmath_tpu.queries.narrow_phase import narrow_phase  # noqa: E402
from wgmath_tpu.shapes.shape import (  # noqa: E402
    BALL,
    ball_radii_or_nan,
    world_aabbs,
)


def main():
    state, params, config = settled_state()
    bodies = state.bodies
    shapes = state.shapes
    poses = bodies.poses
    n = bodies.num_bodies
    mprops = update_mprops(poses, bodies.local_mprops)
    mins, maxs = world_aabbs(shapes, poses, margin=params.prediction_distance)
    radii = ball_radii_or_nan(shapes, poses)
    from wgmath_tpu.broad_phase.grid import find_pairs_grid

    pairs = find_pairs_grid(mins, maxs, capacity=config.pair_capacity,
                            max_per_body=config.broad_phase_max_per_row,
                            cell_cap=config.bp_cell_cap,
                            global_cap=config.bp_global_cap,
                            ball_radius=radii,
                            margin=params.prediction_distance)
    contacts = narrow_phase(poses, shapes, pairs, params.prediction_distance,
                            sat_capacity=config.sat_pair_capacity,
                            pfm_capacity=config.pfm_pair_capacity,
                            p_max=config.manifold_points)
    contacts, cnt = compact_contacts(contacts, config.contact_capacity)
    contacts = jax.block_until_ready(contacts)
    bench._log(f"contacts={int(cnt)} capacity={contacts.capacity} "
               f"gs_cmax={config.gs_cmax} max_colors={config.max_colors}")

    cons = jax.jit(lambda p, v, m, c: build_constraints(p, v, m, c, params))(
        poses, bodies.vels, mprops, contacts)
    cons = jax.block_until_ready(cons)
    colors = jax.jit(lambda c: S.color_constraints(
        c, n, max_colors=config.max_colors,
        class_cap=config.gs_cmax))(cons)
    colors = jax.block_until_ready(colors)
    ccount = np.asarray(jax.ops.segment_sum(
        np.asarray(cons.valid).astype(np.int32), np.asarray(colors),
        num_segments=config.max_colors + 2))
    bench._log(f"color class sizes: {ccount.tolist()}")

    results = {}

    def phase(name, make, args, ks=(4, 20)):
        t = bench.slope_time(make, args, k_small=ks[0], k_large=ks[1], reps=2)
        results[name] = t * 1e3
        bench._log(f"{name}: {t * 1e3:.2f} ms")

    def consume(tree):
        return sum(jnp.sum(x if x.dtype != bool else x.astype(jnp.float32))
                   * 1e-9 for x in jax.tree.leaves(tree)
                   if jnp.issubdtype(x.dtype, jnp.number) or x.dtype == bool)

    # --- build_constraints
    def mk_build(k):
        @jax.jit
        def f(poses, vels, mprops, contacts):
            def body(i, acc):
                c = build_constraints(
                    poses, vels, mprops,
                    dataclasses.replace(contacts, dist=contacts.dist + acc * 0),
                    params)
                return acc + consume((c.n_rhs, c.n_r, c.t_r, c.dir_a,
                                      c.local_pt_a, c.n_torque_a))
            return jax.lax.fori_loop(0, k, body, 0.0)
        return f

    phase("build", mk_build, (poses, bodies.vels, mprops, contacts))

    # --- coloring
    def mk_color(k):
        @jax.jit
        def f(cons):
            def body(i, acc):
                col = S.color_constraints(
                    dataclasses.replace(cons, body_a=cons.body_a + (acc == -1)),
                    n, max_colors=config.max_colors,
                    class_cap=config.gs_cmax)
                return acc + jnp.sum(col) * 1e-9
            return jax.lax.fori_loop(0, k, body, 0.0)
        return f

    phase("coloring", mk_color, (cons,), ks=(2, 10))

    # --- layout + field sort + sides
    cmax = min(cons.body_a.shape[0], n + 64)
    if config.gs_cmax:
        cmax = min(cmax, config.gs_cmax)

    def mk_layout(k):
        @jax.jit
        def f(cons, colors):
            def body(i, acc):
                lay = S.build_color_layout(
                    jnp.where(acc == -1, 0, colors), cons.valid,
                    max_colors=config.max_colors, cmax=cmax)
                ss = S.sort_solver_fields(cons, lay[0])
                dyn_a = jnp.any(ss.im_a != 0.0, axis=-1)
                dyn_b = jnp.any(ss.im_b != 0.0, axis=-1)
                sides = S._build_sides(ss.body_a, ss.body_b, dyn_a, dyn_b,
                                       ss.valid, n)
                return acc + consume((lay[1], lay[2], ss.n_rhs, ss.dir_a,
                                      sides[0], sides[1]))
            return jax.lax.fori_loop(0, k, body, 0.0)
        return f

    phase("layout+sort", mk_layout, (cons, colors), ks=(2, 10))

    # --- transfer warmstart
    def mk_ws(k):
        @jax.jit
        def f(cons):
            def body(i, acc):
                c2 = S.transfer_warmstart(
                    dataclasses.replace(cons,
                                        n_impulse=cons.n_impulse + acc * 0),
                    cons, params)
                return acc + consume((c2.n_impulse, c2.t_impulse))
            return jax.lax.fori_loop(0, k, body, 0.0)
        return f

    phase("ws_xfer", mk_ws, (cons,), ks=(4, 20))

    # prep shared sorted-space inputs
    sub = params.substep().with_dim(3)
    layout = jax.jit(lambda colors, valid: S.build_color_layout(
        colors, valid, max_colors=config.max_colors, cmax=cmax))(
            colors, cons.valid)
    ss = S.sort_solver_fields(cons, layout[0])
    num_colors = jnp.minimum(jnp.max(jnp.where(cons.valid, colors, 0)),
                             config.max_colors)
    dyn_a = jnp.any(ss.im_a != 0.0, axis=-1)
    dyn_b = jnp.any(ss.im_b != 0.0, axis=-1)
    sides = S._build_sides(ss.body_a, ss.body_b, dyn_a, dyn_b, ss.valid, n)
    c_cap = cons.body_a.shape[0]
    idx_s0 = jnp.minimum(layout[0], c_cap - 1)
    n_imp_s = cons.n_impulse[idx_s0]
    t_imp_s = cons.t_impulse[idx_s0]
    vels = bodies.vels
    (ss, layout, n_imp_s, t_imp_s, sides, num_colors) = jax.block_until_ready(
        (ss, layout, n_imp_s, t_imp_s, sides, num_colors))
    bench._log(f"num_colors={int(num_colors)} cmax={cmax}")

    # --- rhs relinearization
    def mk_rhs(k):
        @jax.jit
        def f(poses):
            def body(i, acc):
                import types
                ss2 = types.SimpleNamespace(**vars(ss))
                n_rhs, nb, t_rhs = update_rhs_sorted(
                    ss2, dataclasses.replace(
                        poses, translation=poses.translation + acc * 0), sub)
                return acc + consume((n_rhs, nb, t_rhs))
            return jax.lax.fori_loop(0, k, body, 0.0)
        return f

    phase("rhs", mk_rhs, (poses,))

    # --- warmstart apply (deltas + segment apply)
    def mk_wsapply(k):
        @jax.jit
        def f(vels, n_imp_s, t_imp_s):
            def body(i, carry):
                acc, v = carry
                deltas = S._ws_deltas(ss, n_imp_s + acc * 0, t_imp_s,
                                      ss.valid, n_imp_s.shape[1])
                v2 = S._ws_apply(v, deltas, sides)
                return acc + consume((v2.linear, v2.angular)), v2
            acc, _ = jax.lax.fori_loop(0, k, body, (0.0, vels))
            return acc
        return f

    phase("ws_apply", mk_wsapply, (vels, n_imp_s, t_imp_s))

    # --- one GS color-major pass at various color counts
    import types

    sc = types.SimpleNamespace(**vars(ss))

    def mk_gs(nc):
        def mk(k):
            @jax.jit
            def f(vels, n_imp_s, t_imp_s):
                def body(i, carry):
                    acc, v, ni, ti = carry
                    v2, ni2, ti2 = S.gs_color_major_pass(
                        sc, v, ni, ti, layout, nc, cmax=cmax, dim=3)
                    return (acc + consume((v2.linear,)), v2, ni2, ti2)
                acc, _, _, _ = jax.lax.fori_loop(
                    0, k, body, (0.0, vels, n_imp_s, t_imp_s))
                return acc
            return f
        return mk

    phase("gs_full", mk_gs(num_colors), (vels, n_imp_s, t_imp_s), ks=(2, 10))
    phase("gs_1color", mk_gs(jnp.int32(1)), (vels, n_imp_s, t_imp_s),
          ks=(2, 10))
    phase("gs_3color", mk_gs(jnp.int32(3)), (vels, n_imp_s, t_imp_s),
          ks=(2, 10))

    bench._log("---- summary (ms) ----")
    for k, v in results.items():
        bench._log(f"{k:12s} {v:8.2f}")


if __name__ == "__main__":
    main()
