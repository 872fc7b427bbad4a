"""EPA: penetration depth/normal for intersecting convex pairs
(≙ wgparry queries/gjk/epa3.wgsl — 554 lines of per-thread polytope
expansion — and epa2.wgsl).

TPU-native shape: EPA runs only on the *compacted* set of intersecting pairs
(they are rare — the solver keeps penetrations shallow), with a
fixed-capacity polytope (V_CAP vertices / F_CAP faces) and a fixed iteration
budget. The horizon of each expansion step is found by counting edge
multiplicity among removed faces (an O(E²) masked compare — cheap at the
compacted batch size, and branch-free).

Seeding: an octahedron of CSO supports along ±x/±y/±z. The seed hull is
inscribed in the CSO, so for extremely shallow or degenerate intersections
the first iterations re-orient it; the iteration budget covers typical
physics contacts (penetration ≪ shape size).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from wgmath_tpu.queries.gjk import cso_support

V_CAP = 30
F_CAP = 56
ITERS = 14
_BIG = 1.0e10


def epa_penetration(tag_a, par_a, tag_b, par_b, r_ab, t_ab,
                    vertices=None):
    """Penetration depth + direction for intersecting pairs (A-frame).

    All args are batched [M]; returns ``(normal [M,3], depth [M],
    point_a [M,3])`` with ``normal`` pointing from A to B (the direction to
    push B to separate), ``depth >= 0``, ``point_a`` the deepest point of the
    contact on shape A.
    """
    m = t_ab.shape[0]

    # --- seed octahedron -------------------------------------------------------
    dirs = jnp.asarray([[1.0, 0, 0], [-1.0, 0, 0], [0, 1.0, 0],
                        [0, -1.0, 0], [0, 0, 1.0], [0, 0, -1.0]], jnp.float32)
    verts = jnp.zeros((m, V_CAP, 3), jnp.float32)
    wit_a = jnp.zeros((m, V_CAP, 3), jnp.float32)
    wit_b = jnp.zeros((m, V_CAP, 3), jnp.float32)
    for i in range(6):
        d = jnp.broadcast_to(dirs[i], (m, 3))
        s = cso_support(tag_a, par_a, tag_b, par_b, r_ab, t_ab, d,
                        vertices)
        verts = verts.at[:, i].set(s.w)
        wit_a = wit_a.at[:, i].set(s.p_a)
        wit_b = wit_b.at[:, i].set(s.p_b)
    nverts = jnp.full((m,), 6, jnp.int32)

    # octahedron faces (+x,+y,+z),(+x,+z,-y)… with outward winding
    oct_faces = jnp.asarray([
        [0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
        [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5],
    ], jnp.int32)
    faces = jnp.zeros((m, F_CAP, 3), jnp.int32)
    faces = faces.at[:, :8].set(oct_faces)
    fvalid = jnp.zeros((m, F_CAP), bool).at[:, :8].set(True)
    nfaces = jnp.full((m,), 8, jnp.int32)

    def face_planes(verts, faces, fvalid):
        idx = faces.reshape(m, -1)  # [M, F*3]
        pts = jnp.take_along_axis(verts, idx[..., None].repeat(3, -1), 1)
        pts = pts.reshape(m, F_CAP, 3, 3)
        v0, v1, v2 = pts[:, :, 0], pts[:, :, 1], pts[:, :, 2]
        n = jnp.cross(v1 - v0, v2 - v0)
        nn = jnp.linalg.norm(n, axis=-1, keepdims=True)
        n = n / jnp.maximum(nn, 1e-30)
        d = jnp.sum(n * v0, axis=-1)
        # d < 0 = the polytope does not yet contain the origin on that
        # side (collapsed seeds on thin CSOs). Trust the outward WINDING
        # instead of flipping: expanding at the most-violated face along
        # its true outward normal recovers the missing hull region —
        # flipping silently inverted the expansion direction and returned
        # a wrong (far-side) penetration for those cases.
        degen = nn[..., 0] < 1e-12
        d = jnp.where(fvalid & ~degen, d, _BIG)
        return n, d

    def body(_, state):
        verts, wit_a, wit_b, nverts, faces, fvalid, nfaces, done = state
        normals, dists = face_planes(verts, faces, fvalid)
        best = jnp.argmin(dists, axis=-1)
        best_n = jnp.take_along_axis(normals, best[:, None, None].repeat(3, -1), 1)[:, 0]
        best_d = jnp.take_along_axis(dists, best[:, None], -1)[:, 0]

        s = cso_support(tag_a, par_a, tag_b, par_b, r_ab, t_ab, best_n,
                        vertices)
        gap = jnp.sum(s.w * best_n, -1) - best_d
        newly_done = gap < 1e-4
        grow = ~done & ~newly_done & (nverts < V_CAP)
        done = done | newly_done | (nverts >= V_CAP)

        # visible faces from the new point
        vis = fvalid & (jnp.einsum("mfd,md->mf", normals, s.w) - dists > 1e-7)
        vis &= grow[:, None]

        # horizon edges: directed edges of visible faces whose reverse is not
        # among visible faces' edges
        e0 = faces[..., [0, 1, 2]]
        e1 = faces[..., [1, 2, 0]]
        edges_a = e0.reshape(m, -1)  # [M, 3F]
        edges_b = e1.reshape(m, -1)
        evalid = jnp.repeat(vis, 3, axis=-1)
        # edge (a,b) is horizon iff no visible edge equals (b,a)
        key_fwd = edges_a * V_CAP + edges_b
        key_rev = edges_b * V_CAP + edges_a
        has_rev = jnp.any(
            (key_fwd[:, None, :] == key_rev[:, :, None])
            & evalid[:, None, :] & evalid[:, :, None], axis=-1)
        horizon = evalid & ~has_rev

        # insert new vertex
        vslot = jnp.minimum(nverts, V_CAP - 1)
        verts = jax.vmap(lambda v, i, x: v.at[i].set(x))(verts, vslot, s.w)
        wit_a = jax.vmap(lambda v, i, x: v.at[i].set(x))(wit_a, vslot, s.p_a)
        wit_b = jax.vmap(lambda v, i, x: v.at[i].set(x))(wit_b, vslot, s.p_b)
        nverts = jnp.where(grow, nverts + 1, nverts)

        # free visible face slots, then append one new face per horizon edge
        fvalid_new = fvalid & ~vis
        free_rank = jnp.cumsum((~fvalid_new).astype(jnp.int32), axis=-1) - 1
        hor_rank = jnp.cumsum(horizon.astype(jnp.int32), axis=-1) - 1
        # target free slot for k-th horizon edge = index of k-th free slot
        # build mapping: free_slots[m, k] = index of k-th invalid face slot
        slot_idx = jnp.argsort(jnp.where(fvalid_new, 1, 0), axis=-1,
                               stable=True)  # invalid slots first
        n_free = jnp.sum(~fvalid_new, axis=-1)
        target = jnp.take_along_axis(
            slot_idx, jnp.minimum(hor_rank, F_CAP - 1).clip(0), axis=-1)
        can_place = horizon & (hor_rank < n_free[:, None]) & grow[:, None]
        tgt = jnp.where(can_place, target, F_CAP)
        new_face = jnp.stack([edges_a, edges_b,
                              jnp.broadcast_to(vslot[:, None], edges_a.shape)],
                             axis=-1)
        faces = jax.vmap(lambda f, t, nf: f.at[t].set(nf, mode="drop"))(
            faces, tgt, new_face)
        fvalid = jax.vmap(lambda fv, t: fv.at[t].set(True, mode="drop"))(
            fvalid_new, tgt)
        return verts, wit_a, wit_b, nverts, faces, fvalid, nfaces, done

    # --- flat-CSO slab candidate (crossed segment cores make the CSO a
    # planar set; the coplanar seed then stalls the loop in-plane with a
    # garbage normal — epa3.wgsl degenerates the same way). Fit the seed's
    # plane normal, take the two out-of-plane supports: h(±n̂) is a
    # CERTIFIED upper bound on penetration depth (moving B by h·n̂
    # separates), so the end of the function keeps whichever of {EPA
    # answer, slab answer} is smaller — converged EPA always wins, the
    # slab rescues degenerate polytopes.
    seed_e = verts[:, 1:6] - verts[:, :1]  # [M, 5, 3]
    pi, pj = np.triu_indices(5, 1)
    crs = jnp.cross(seed_e[:, pi], seed_e[:, pj])  # [M, 10, 3]
    crn = jnp.linalg.norm(crs, axis=-1)
    n_pl = jnp.take_along_axis(
        crs, jnp.argmax(crn, -1)[:, None, None].repeat(3, -1), 1)[:, 0]
    e_len = jnp.linalg.norm(seed_e, axis=-1)
    scale = jnp.max(e_len, axis=-1)
    # line-degenerate CSO (parallel segment cores): any perpendicular of
    # the longest edge serves as the plane normal
    e_long = jnp.take_along_axis(
        seed_e, jnp.argmax(e_len, -1)[:, None, None].repeat(3, -1), 1)[:, 0]
    alt = jnp.where((jnp.abs(e_long[:, :1])
                     < 0.9 * jnp.maximum(scale, 1e-30)[:, None]),
                    jnp.asarray([1.0, 0.0, 0.0], jnp.float32),
                    jnp.asarray([0.0, 1.0, 0.0], jnp.float32))
    perp = jnp.cross(e_long, alt)
    line_degen = jnp.max(crn, -1) <= 1e-6 * scale * scale
    n_pl = jnp.where(line_degen[:, None], perp, n_pl)
    n_pl = n_pl / jnp.maximum(
        jnp.linalg.norm(n_pl, axis=-1, keepdims=True), 1e-30)
    s_p = cso_support(tag_a, par_a, tag_b, par_b, r_ab, t_ab, n_pl, vertices)
    s_n = cso_support(tag_a, par_a, tag_b, par_b, r_ab, t_ab, -n_pl, vertices)
    h_p = jnp.sum(s_p.w * n_pl, -1)
    h_n = -jnp.sum(s_n.w * n_pl, -1)
    slab_pos = h_p <= h_n
    slab_depth = jnp.maximum(jnp.where(slab_pos, h_p, h_n), 0.0)
    slab_n = jnp.where(slab_pos[:, None], n_pl, -n_pl)
    slab_pt = jnp.where(slab_pos[:, None], s_p.p_a, s_n.p_a)

    done0 = jnp.zeros((m,), bool)
    state = (verts, wit_a, wit_b, nverts, faces, fvalid, nfaces, done0)
    verts, wit_a, wit_b, nverts, faces, fvalid, nfaces, done = jax.lax.fori_loop(
        0, ITERS, body, state)

    normals, dists = face_planes(verts, faces, fvalid)
    best = jnp.argmin(dists, axis=-1)
    n = jnp.take_along_axis(normals, best[:, None, None].repeat(3, -1), 1)[:, 0]
    depth = jnp.take_along_axis(dists, best[:, None], -1)[:, 0]
    depth = jnp.where(depth >= _BIG * 0.5, 0.0, depth)

    # witness: barycentric projection of the origin onto the best face
    fidx = jnp.take_along_axis(faces, best[:, None, None].repeat(3, -1), 1)[:, 0]
    wv = jnp.take_along_axis(verts, fidx[..., None].repeat(3, -1), 1)
    wa = jnp.take_along_axis(wit_a, fidx[..., None].repeat(3, -1), 1)
    proj = n * depth[:, None]
    # barycentric coords of proj in triangle wv
    v0 = wv[:, 1] - wv[:, 0]
    v1 = wv[:, 2] - wv[:, 0]
    v2 = proj - wv[:, 0]
    d00 = jnp.sum(v0 * v0, -1)
    d01 = jnp.sum(v0 * v1, -1)
    d11 = jnp.sum(v1 * v1, -1)
    d20 = jnp.sum(v2 * v0, -1)
    d21 = jnp.sum(v2 * v1, -1)
    den = jnp.maximum(d00 * d11 - d01 * d01, 1e-30)
    v = (d11 * d20 - d01 * d21) / den
    w = (d00 * d21 - d01 * d20) / den
    u = 1.0 - v - w
    bary = jnp.stack([u, v, w], -1)
    point_a = jnp.einsum("mk,mkd->md", bary, wa)
    # slab rescue: the certified upper bound beats a degenerate/failed
    # polytope answer (flat CSOs); a converged EPA depth is the true
    # minimum over all directions, so it is never above the slab bound
    failed = jnp.take_along_axis(dists, best[:, None], -1)[:, 0] >= _BIG * 0.5
    # <= with tolerance: on a tie both directions attain the same support
    # bound, but a degenerate (flat) polytope's tiny-area face normal is
    # noise while the slab normal is the fitted plane normal — prefer it.
    # A clearly-negative final depth is a degenerate claim too (the origin
    # is inside the CSO by contract), so it loses to the slab as well.
    use_slab = (failed | (depth < -1e-6 * scale)
                | (slab_depth <= depth * 1.0001 + 1e-6 * scale))
    n = jnp.where(use_slab[:, None], slab_n, n)
    depth = jnp.where(use_slab, slab_depth, depth)
    point_a = jnp.where(use_slab[:, None], slab_pt, point_a)
    # n is the min-translation direction for the CSO (A−B): moving A by −n·depth
    # separates; the A→B contact normal is therefore −n? The MTV on the CSO
    # points from the origin toward the boundary: B must move along +n.
    return n, depth, point_a


# ---------------------------------------------------------------------------
# 2D EPA (≙ wgparry queries/gjk/epa2.wgsl) — polygon expansion in the
# embedded z=0 plane used by the 2D support-mapped narrow phase
# ---------------------------------------------------------------------------

V2_CAP = 24
ITERS2 = 16


def epa2_penetration(tag_a, par_a, tag_b, par_b, r_ab, t_ab, vertices=None):
    """Penetration depth + direction for intersecting 2D pairs embedded in
    3D (z = 0). Same contract as ``epa_penetration``; the polytope is a
    CCW-ordered polygon ring with fixed capacity, expanded at the edge
    closest to the origin each iteration (≙ epa2.wgsl's edge heap, made
    batched + branch-free)."""
    import numpy as np

    m = t_ab.shape[0]
    angs = 2.0 * np.pi * np.arange(8) / 8.0
    seed_dirs = np.stack([np.cos(angs), np.sin(angs),
                          np.zeros_like(angs)], -1).astype(np.float32)
    verts = jnp.zeros((m, V2_CAP, 3), jnp.float32)
    wit_a = jnp.zeros((m, V2_CAP, 3), jnp.float32)
    wit_b = jnp.zeros((m, V2_CAP, 3), jnp.float32)
    for i in range(8):
        d = jnp.broadcast_to(jnp.asarray(seed_dirs[i]), (m, 3))
        s = cso_support(tag_a, par_a, tag_b, par_b, r_ab, t_ab, d, vertices)
        verts = verts.at[:, i].set(s.w)
        wit_a = wit_a.at[:, i].set(s.p_a)
        wit_b = wit_b.at[:, i].set(s.p_b)
    nv = jnp.full((m,), 8, jnp.int32)
    idx = jnp.arange(V2_CAP, dtype=jnp.int32)

    def edge_planes(verts, nv):
        nxt = jnp.where(idx[None, :] + 1 >= nv[:, None],
                        idx[None, :] + 1 - nv[:, None], idx[None, :] + 1)
        vj = jnp.take_along_axis(verts, nxt[..., None].repeat(3, -1), 1)
        e = vj - verts
        elen = jnp.sqrt(e[..., 0] ** 2 + e[..., 1] ** 2)
        inv = 1.0 / jnp.maximum(elen, 1e-30)
        # CCW ring: outward normal of edge (vi -> vj) is (ey, -ex)
        nx = e[..., 1] * inv
        ny = -e[..., 0] * inv
        d = nx * verts[..., 0] + ny * verts[..., 1]
        # d < 0 means the (CCW-wound) ring does not yet contain the origin
        # on that side — collapsed seeds do this. Do NOT flip the normal:
        # expanding at the most-violated edge (min d, possibly negative)
        # along its true outward normal recovers the missing hull corner.
        valid = (idx[None, :] < nv[:, None]) & (elen > 1e-9)
        d = jnp.where(valid, d, _BIG)
        nrm = jnp.stack([nx, ny, jnp.zeros_like(nx)], -1)
        return nrm, d, nxt

    def body(_, state):
        verts, wit_a, wit_b, nv, done = state
        nrm, d, _ = edge_planes(verts, nv)
        best = jnp.argmin(d, axis=-1)
        bn = jnp.take_along_axis(nrm, best[:, None, None].repeat(3, -1),
                                 1)[:, 0]
        bd = jnp.take_along_axis(d, best[:, None], -1)[:, 0]
        s = cso_support(tag_a, par_a, tag_b, par_b, r_ab, t_ab, bn, vertices)
        gap = jnp.sum(s.w * bn, -1) - bd
        grow = ~done & (gap >= 1e-4) & (nv < V2_CAP)
        done = done | (gap < 1e-4) | (nv >= V2_CAP)
        # insert the new vertex after `best` (ring order preserved: the
        # support along the edge normal lies angularly inside the edge)
        ins = best + 1
        prev_idx = jnp.maximum(idx[None, :] - 1, 0)

        def shift(arr, new_val):
            shifted = jnp.take_along_axis(
                arr, prev_idx[..., None].repeat(arr.shape[-1], -1), 1)
            keep = idx[None, :] <= best[:, None]
            is_new = idx[None, :] == ins[:, None]
            out = jnp.where(keep[..., None], arr,
                            jnp.where(is_new[..., None], new_val[:, None, :],
                                      shifted))
            return jnp.where(grow[:, None, None], out, arr)

        verts = shift(verts, s.w)
        wit_a = shift(wit_a, s.p_a)
        wit_b = shift(wit_b, s.p_b)
        nv = jnp.where(grow, nv + 1, nv)
        return verts, wit_a, wit_b, nv, done

    state = (verts, wit_a, wit_b, nv, jnp.zeros((m,), bool))
    verts, wit_a, wit_b, nv, done = jax.lax.fori_loop(0, ITERS2, body, state)

    nrm, d, nxt = edge_planes(verts, nv)
    best = jnp.argmin(d, axis=-1)
    n = jnp.take_along_axis(nrm, best[:, None, None].repeat(3, -1), 1)[:, 0]
    depth = jnp.take_along_axis(d, best[:, None], -1)[:, 0]
    depth = jnp.where(depth >= _BIG * 0.5, 0.0, depth)
    # witness: origin's projection onto the best edge, lerped into A's frame
    bi = best
    bj = jnp.take_along_axis(nxt, best[:, None], -1)[:, 0]
    vi = jnp.take_along_axis(verts, bi[:, None, None].repeat(3, -1), 1)[:, 0]
    vj = jnp.take_along_axis(verts, bj[:, None, None].repeat(3, -1), 1)[:, 0]
    ai = jnp.take_along_axis(wit_a, bi[:, None, None].repeat(3, -1), 1)[:, 0]
    aj = jnp.take_along_axis(wit_a, bj[:, None, None].repeat(3, -1), 1)[:, 0]
    proj = n * depth[:, None]
    e = vj - vi
    t = jnp.sum((proj - vi) * e, -1) / jnp.maximum(jnp.sum(e * e, -1), 1e-30)
    t = jnp.clip(t, 0.0, 1.0)
    point_a = ai * (1.0 - t)[:, None] + aj * t[:, None]
    return n, depth, point_a
