"""Narrow phase: collision pairs → contact manifolds
(≙ wgparry broad_phase/narrow_phase.rs:49-116 + narrow_phase.wgsl:62-172).

The reference grid-strides over pairs and switches on the shape-type pair
(ball_ball / ball_convex / cuboid_cuboid / pfm_pfm / mesh variants),
atomic-appending contacts. TPU-native: evaluate each type-pair kernel as a
masked vectorized pass over the (fixed-capacity) pair list and select — cheap
pairs (ball/cuboid analytic) run branch-free; expensive GJK/EPA pairs are
masked out of the cheap math and vice versa. Contacts reuse the pair slots
1:1 (one manifold per pair), so no compaction pass is needed; manifolds keep
up to P points with a per-manifold count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from wgmath_tpu.broad_phase.brute_force import PairList
from wgmath_tpu.dynamics.constraint import Contacts, max_points
from wgmath_tpu.geometry import sim as sim_ops
from wgmath_tpu.geometry.sim import Sim
from wgmath_tpu.shapes import shape as shp


def _take_sim(poses: Sim, idx):
    return Sim(poses.rotation[idx], poses.translation[idx], poses.scale[idx])


def ball_ball(pose_a: Sim, pose_b: Sim, ra, rb):
    """Single-point ball-ball manifold (≙ wgparry ball.wgsl contact).

    Returns (normal_a_local, point_a_local, dist): the contact normal and
    point expressed in body A's local frame, signed distance (<0 penetrating).
    """
    ra_eff = ra * pose_a.scale
    rb_eff = rb * pose_b.scale
    d = pose_b.translation - pose_a.translation
    center_dist = jnp.linalg.norm(d, axis=-1)
    dist = center_dist - (ra_eff + rb_eff)
    # degenerate concentric guard: pick +x
    safe = center_dist > 1e-9
    n_world = jnp.where(safe[..., None], d / jnp.maximum(center_dist, 1e-30)[..., None],
                        jnp.zeros_like(d).at[..., 0].set(1.0))
    pt_world = pose_a.translation + n_world * ra_eff[..., None]
    n_local = sim_ops.inv_mul_unit_vec(pose_a, n_world)
    pt_local = sim_ops.inv_mul_pt(pose_a, pt_world)
    return n_local, pt_local, dist


def ball_cuboid(pose_ball: Sim, pose_box: Sim, radius, half_extents):
    """Single-point ball-cuboid manifold via point-AABB projection in the
    box's local frame (≙ wgparry ball_convex projection path)."""
    c_local = sim_ops.inv_mul_pt(pose_box, pose_ball.translation)
    he = half_extents
    clamped = jnp.clip(c_local, -he, he)
    delta = c_local - clamped
    d_out = jnp.linalg.norm(delta, axis=-1)
    outside = d_out > 1e-9

    # inside: push out along the closest face
    gap = he - jnp.abs(c_local)
    axis = jnp.argmin(gap, axis=-1)
    sign = jnp.where(jnp.take_along_axis(c_local, axis[..., None], -1) >= 0, 1.0, -1.0)
    n_in = jnp.zeros_like(c_local)
    n_in = jnp.put_along_axis(n_in, axis[..., None], sign, axis=-1, inplace=False)
    depth_in = -jnp.take_along_axis(gap, axis[..., None], -1)[..., 0]

    n_local_box = jnp.where(outside[..., None],
                            delta / jnp.maximum(d_out, 1e-30)[..., None], n_in)
    dist_surface = jnp.where(outside, d_out, depth_in)
    r_eff = radius * pose_ball.scale
    dist = dist_surface - r_eff
    # contact point on the box surface, box-local
    pt_box_local = jnp.where(outside[..., None], clamped,
                             c_local - n_in * depth_in[..., None])
    pt_world = sim_ops.mul_pt(pose_box, pt_box_local)
    n_world = sim_ops.mul_unit_vec(pose_box, n_local_box)
    # express in the *ball*'s frame as body A with normal pointing A→B:
    return pt_world, n_world, dist


def _compact_mask(mask, capacity):
    """Indices of up to ``capacity`` set entries of ``mask`` (+active flags).

    The narrow-phase analog of the EPA batch compaction: expensive kernels
    (SAT, GJK) run on just the pairs of their type instead of every slot —
    the TPU answer to SURVEY §7 hard part 6's "partition pairs by type-pair".

    Also returns the UNCLAMPED match count: entries past ``capacity`` are
    dropped, so the caller must surface ``total`` for the host to regrow the
    capacity (a silent truncation here = contacts that never form).
    """
    n = mask.shape[0]
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    slot = jnp.where(mask & (pos < capacity), pos, capacity)
    sel = jnp.zeros((capacity,), jnp.int32).at[slot].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    total = jnp.sum(mask.astype(jnp.int32))
    count = jnp.minimum(total, capacity)
    active = jnp.arange(capacity) < count
    return sel, active, total


def narrow_phase(poses: Sim, shapes: shp.ShapeSet, pairs: PairList,
                 prediction_distance: float, *, sat_capacity: int = 0,
                 pfm_capacity: int = 0, p_max: int = 0,
                 bc_capacity: int = 0, with_overflow: bool = False):
    """Dispatch contact kernels over the pair list; one manifold per pair.

    ``sat_capacity``/``pfm_capacity`` > 0 compact the matching pairs into a
    bounded batch before running the expensive kernel (0 = dense evaluation
    over every slot — right when most pairs are of that type).

    ``p_max`` (0 = ``max_points(dim)``) sets the manifold width. Every solver
    pass costs ∝ width, but only cuboid-cuboid SAT clipping can emit more
    than one point — scenes that cannot produce such a pair (e.g. balls over
    a single ground cuboid) should pass ``p_max=1``
    (``pipeline.auto_manifold_points`` derives the safe value from the shape
    tags). ``p_max == 1`` asserts cuboid-cuboid pairs cannot occur and skips
    the SAT kernel entirely; wider-but-truncated manifolds keep their
    deepest ``p_max`` points.

    ``with_overflow=True`` additionally returns an i32[3] vector of the
    UNCLAMPED per-kernel match counts [bc, sat, pfm] so the host can regrow
    a saturated compaction capacity (truncation would otherwise silently
    drop contacts)."""
    dim = poses.translation.shape[-1]
    bc_needed = sat_needed = pfm_needed = jnp.int32(0)
    p_max = p_max or max_points(dim)
    a, b = pairs.body_a, pairs.body_b
    # ONE merged wide gather for both sides' pose+shape data: TPU gather
    # cost is per ROW, so 1x2C rows of [rot|trans|scale|params|tag] beats
    # the 6 narrow gathers it replaces ~3x (this header was most of the
    # narrow phase at 10k bodies). Tag values are tiny ints — exact in f32.
    rw = poses.rotation.shape[-1]
    pw = shapes.params.shape[-1]
    packed = jnp.concatenate(
        [poses.rotation, poses.translation, poses.scale[:, None],
         shapes.params.astype(jnp.float32),
         shapes.tag.astype(jnp.float32)[:, None]], axis=-1)
    pp = packed[jnp.concatenate([a, b])]
    cc_ = a.shape[0]
    pa_, pb_ = pp[:cc_], pp[cc_:]
    pose_a = Sim(pa_[:, :rw], pa_[:, rw:rw + dim], pa_[:, rw + dim])
    pose_b = Sim(pb_[:, :rw], pb_[:, rw:rw + dim], pb_[:, rw + dim])
    par_a = pa_[:, rw + dim + 1:rw + dim + 1 + pw]
    par_b = pb_[:, rw + dim + 1:rw + dim + 1 + pw]
    tag_a = pa_[:, rw + dim + 1 + pw].astype(jnp.int32)
    tag_b = pb_[:, rw + dim + 1 + pw].astype(jnp.int32)

    c = pairs.capacity
    normal_a = jnp.zeros((c, dim), jnp.float32)
    points_a = jnp.zeros((c, p_max, dim), jnp.float32)
    dist = jnp.full((c, p_max), 1e9, jnp.float32)
    num_points = jnp.zeros((c,), jnp.int32)

    # static scene-composition gating: skip whole kernels when the shape set
    # cannot produce that type pair (SURVEY §7 hard part 6 — instead of
    # sorting pairs by type, specialize the compiled program per scene)
    kinds = shapes.kinds
    has_ball = shp.BALL in kinds
    has_cuboid = shp.CUBOID in kinds
    has_pfm_only = bool(kinds - {shp.BALL, shp.CUBOID, shp.TRIMESH,
                                 shp.POLYLINE})

    # --- ball vs ball -------------------------------------------------------
    bb = (tag_a == shp.BALL) & (tag_b == shp.BALL)
    if has_ball:
        n_l, p_l, d_bb = ball_ball(pose_a, pose_b, par_a[:, 0], par_b[:, 0])
        normal_a = jnp.where(bb[:, None], n_l, normal_a)
        points_a = points_a.at[:, 0].set(
            jnp.where(bb[:, None], p_l, points_a[:, 0]))
        dist = dist.at[:, 0].set(jnp.where(bb, d_bb, dist[:, 0]))
        num_points = jnp.where(bb, 1, num_points)

    # --- ball vs cuboid (either order) --------------------------------------
    if has_ball and has_cuboid and bc_capacity:
        # compacted: ball-vs-(usually one ground) cuboid pairs are a tiny
        # fraction of the pair list — run one normalized pass on just them
        m = (((tag_a == shp.BALL) & (tag_b == shp.CUBOID))
             | ((tag_a == shp.CUBOID) & (tag_b == shp.BALL))) & pairs.valid
        sel, act, bc_needed = _compact_mask(m, bc_capacity)
        swap = tag_a[sel] == shp.CUBOID  # True: A is the cuboid
        pa_s = _take_sim(poses, a[sel])
        pb_s = _take_sim(poses, b[sel])
        pball = Sim(jnp.where(swap[:, None], pb_s.rotation, pa_s.rotation),
                    jnp.where(swap[:, None], pb_s.translation,
                              pa_s.translation),
                    jnp.where(swap, pb_s.scale, pa_s.scale))
        pbox = Sim(jnp.where(swap[:, None], pa_s.rotation, pb_s.rotation),
                   jnp.where(swap[:, None], pa_s.translation,
                             pb_s.translation),
                   jnp.where(swap, pa_s.scale, pb_s.scale))
        r = jnp.where(swap, par_b[sel, 0], par_a[sel, 0])
        he = jnp.where(swap[:, None], par_a[sel, :dim], par_b[sel, :dim])
        pt_w, n_w, d_bc = ball_cuboid(pball, pbox, r, he)
        n_ab = jnp.where(swap[:, None], n_w, -n_w)
        n_loc = sim_ops.inv_mul_unit_vec(pa_s, n_ab)
        r_eff = r * pball.scale
        pt_ball_w = pball.translation - n_w * r_eff[:, None]
        pt_a_w = jnp.where(swap[:, None], pt_w, pt_ball_w)
        p_loc = sim_ops.inv_mul_pt(pa_s, pt_a_w)
        sel_drop = jnp.where(act, sel, c)
        normal_a = normal_a.at[sel_drop].set(n_loc, mode="drop")
        points_a = points_a.at[sel_drop, 0].set(p_loc, mode="drop")
        dist = dist.at[sel_drop, 0].set(d_bc, mode="drop")
        num_points = num_points.at[sel_drop].set(1, mode="drop")
    for swap in (False, True) if (has_ball and has_cuboid
                                  and not bc_capacity) else ():
        if swap:
            m = (tag_a == shp.CUBOID) & (tag_b == shp.BALL)
            pb, pc = pose_b, pose_a
            r = par_b[:, 0]
            he = par_a[:, :dim]
        else:
            m = (tag_a == shp.BALL) & (tag_b == shp.CUBOID)
            pb, pc = pose_a, pose_b
            r = par_a[:, 0]
            he = par_b[:, :dim]
        pt_w, n_w, d_bc = ball_cuboid(pb, pc, r, he)
        # n_w points box→ball; contact normal A→B must point from A to B.
        n_ab = n_w if swap else -n_w
        n_loc = sim_ops.inv_mul_unit_vec(pose_a, n_ab)
        # point on A's surface: ball surface (if A is ball) else box surface
        r_eff = r * pb.scale
        pt_ball_w = pb.translation - n_w * r_eff[:, None]
        pt_a_w = pt_w if swap else pt_ball_w
        p_loc = sim_ops.inv_mul_pt(pose_a, pt_a_w)
        normal_a = jnp.where(m[:, None], n_loc, normal_a)
        points_a = points_a.at[:, 0].set(
            jnp.where(m[:, None], p_loc, points_a[:, 0]))
        dist = dist.at[:, 0].set(jnp.where(m, d_bc, dist[:, 0]))
        num_points = jnp.where(m, 1, num_points)

    # --- cuboid vs cuboid (SAT + face clipping) -------------------------------
    if has_cuboid and p_max > 1:
        if dim == 3:
            from wgmath_tpu.queries.sat import cuboid_cuboid_manifold as _cc
        else:
            from wgmath_tpu.queries.sat import cuboid_cuboid_manifold_2d as _cc

        def _cc_fn(*args):
            n_l, pts_l, d_cc, np_cc = _cc(*args)
            if p_max < d_cc.shape[1]:  # keep the p_max deepest points
                neg_d, kidx = jax.lax.top_k(-d_cc, p_max)
                d_cc = -neg_d
                pts_l = jnp.take_along_axis(pts_l, kidx[..., None], axis=1)
                np_cc = jnp.minimum(np_cc, p_max)
            return n_l, pts_l, d_cc, np_cc

        cc = (tag_a == shp.CUBOID) & (tag_b == shp.CUBOID) & pairs.valid
        if sat_capacity:
            sel, act, sat_needed = _compact_mask(cc, sat_capacity)
            n_l, pts_l, d_cc, np_cc = _cc_fn(
                _take_sim(poses, a[sel]), _take_sim(poses, b[sel]),
                par_a[sel, :dim], par_b[sel, :dim], prediction_distance)
            sel_drop = jnp.where(act, sel, c)
            normal_a = normal_a.at[sel_drop].set(n_l, mode="drop")
            points_a = points_a.at[sel_drop].set(pts_l, mode="drop")
            dist = dist.at[sel_drop].set(d_cc, mode="drop")
            num_points = num_points.at[sel_drop].set(np_cc, mode="drop")
        else:
            n_l, pts_l, d_cc, np_cc = _cc_fn(
                pose_a, pose_b, par_a[:, :dim], par_b[:, :dim],
                prediction_distance)
            normal_a = jnp.where(cc[:, None], n_l, normal_a)
            points_a = jnp.where(cc[:, None, None], pts_l, points_a)
            dist = jnp.where(cc[:, None], d_cc, dist)
            num_points = jnp.where(cc, np_cc, num_points)

    # --- generic support-mapped pairs via GJK (capsule/cylinder/cone/…) ------
    # ≙ narrow_phase.wgsl pfm_pfm fallback: any pair not handled by an
    # analytic kernel above. Single-point manifold.
    if dim == 3 and has_pfm_only:
        from wgmath_tpu.queries.gjk import pfm_contact

        handled = bb
        handled |= (tag_a == shp.BALL) & (tag_b == shp.CUBOID)
        handled |= (tag_a == shp.CUBOID) & (tag_b == shp.BALL)
        handled |= (tag_a == shp.CUBOID) & (tag_b == shp.CUBOID)
        # ≤ TRIANGLE covers ball..cylinder plus standalone segment/triangle
        # colliders (their supports live in gjk.support_core); CONVEX rides
        # the vertex-range arg-max
        supported = (((tag_a <= shp.TRIANGLE) | (tag_a == shp.CONVEX))
                     & ((tag_b <= shp.TRIANGLE) | (tag_b == shp.CONVEX)))
        pfm = ~handled & supported & pairs.valid

        def _pfm_manifold(n_p, p_p, d_p, ta, pa_, sa, tb, pb_, sb):
            """Up-to-4-point manifold on top of the GJK/EPA witness
            (≙ WgContactPfmPfm's support-face clipping,
            contact_pfm_pfm.wgsl contact_manifold_pfm_pfm)."""
            from wgmath_tpu.queries.pfm_manifold import pfm_manifold

            pts_m, d_m, np_m = pfm_manifold(
                ta, pa_, sa, tb, pb_, sb, n_p, p_p, d_p,
                prediction_distance, vertices=shapes.vertices,
                indices=shapes.indices)
            k = min(4, p_max)
            if k < 4:  # keep the k deepest points
                neg_d, kidx = jax.lax.top_k(-d_m, k)
                d_m = -neg_d
                pts_m = jnp.take_along_axis(pts_m, kidx[..., None], axis=1)
            return pts_m[:, :k], d_m[:, :k], jnp.minimum(np_m, k), k

        if pfm_capacity:
            sel, act, pfm_needed = _compact_mask(pfm, pfm_capacity)
            n_p, p_p, d_p = pfm_contact(
                tag_a[sel], par_a[sel], _take_sim(poses, a[sel]),
                tag_b[sel], par_b[sel], _take_sim(poses, b[sel]), mask=act,
                vertices=shapes.vertices)
            sel_drop = jnp.where(act, sel, c)
            normal_a = normal_a.at[sel_drop].set(n_p, mode="drop")
            if p_max > 1:
                pts_m, d_m, np_m, k = _pfm_manifold(
                    n_p, p_p, d_p, tag_a[sel], par_a[sel],
                    _take_sim(poses, a[sel]), tag_b[sel], par_b[sel],
                    _take_sim(poses, b[sel]))
                points_a = points_a.at[sel_drop, :k].set(pts_m, mode="drop")
                dist = dist.at[sel_drop, :k].set(d_m, mode="drop")
                num_points = num_points.at[sel_drop].set(np_m, mode="drop")
            else:
                points_a = points_a.at[sel_drop, 0].set(p_p, mode="drop")
                dist = dist.at[sel_drop, 0].set(d_p, mode="drop")
                num_points = num_points.at[sel_drop].set(1, mode="drop")
        else:
            n_p, p_p, d_p = pfm_contact(tag_a, par_a, pose_a, tag_b, par_b,
                                        pose_b, mask=pfm,
                                        vertices=shapes.vertices)
            normal_a = jnp.where(pfm[:, None], n_p, normal_a)
            if p_max > 1:
                pts_m, d_m, np_m, k = _pfm_manifold(
                    n_p, p_p, d_p, tag_a, par_a, pose_a, tag_b, par_b,
                    pose_b)
                points_a = points_a.at[:, :k].set(
                    jnp.where(pfm[:, None, None], pts_m, points_a[:, :k]))
                dist = dist.at[:, :k].set(
                    jnp.where(pfm[:, None], d_m, dist[:, :k]))
                num_points = jnp.where(pfm, np_m, num_points)
            else:
                points_a = points_a.at[:, 0].set(
                    jnp.where(pfm[:, None], p_p, points_a[:, 0]))
                dist = dist.at[:, 0].set(jnp.where(pfm, d_p, dist[:, 0]))
                num_points = jnp.where(pfm, 1, num_points)

    if dim == 2 and has_pfm_only:
        # 2D support-mapped pairs (capsules): embed in 3D (rotation about z,
        # boxes get a tall z-extent so no z-face can win) and reuse the 3D
        # GJK machinery; deep-core pairs run the 2D EPA polygon expansion
        # in the z=0 plane (≙ wgparry2d pfm_pfm + epa2.wgsl).
        from wgmath_tpu.queries.gjk import pfm_contact

        def embed(pose2, tag, par):
            cth = pose2.rotation[..., 0]
            sth = pose2.rotation[..., 1]
            half = jnp.sqrt(jnp.maximum((1.0 + cth) * 0.5, 0.0))
            sh = jnp.where(half > 1e-6, sth / jnp.maximum(2.0 * half, 1e-30),
                           1.0)
            q = jnp.stack([jnp.zeros_like(cth), jnp.zeros_like(cth),
                           sh, half], -1)
            t3 = jnp.pad(pose2.translation, ((0, 0), (0, 1)))
            par3 = jnp.where((tag == shp.CUBOID)[:, None],
                             par.at[:, 2].set(1e3), par)
            return Sim(q, t3, pose2.scale), par3

        pose_a3, par_a3 = embed(pose_a, tag_a, par_a)
        pose_b3, par_b3 = embed(pose_b, tag_b, par_b)
        handled = bb
        handled |= (tag_a == shp.BALL) & (tag_b == shp.CUBOID)
        handled |= (tag_a == shp.CUBOID) & (tag_b == shp.BALL)
        handled |= (tag_a == shp.CUBOID) & (tag_b == shp.CUBOID)
        supported = (tag_a <= shp.CAPSULE) & (tag_b <= shp.CAPSULE)
        pfm = ~handled & supported & pairs.valid
        n_p3, p_p3, d_p = pfm_contact(tag_a, par_a3, pose_a3,
                                      tag_b, par_b3, pose_b3, mask=pfm,
                                      vertices=None, use_epa="2d")
        n2 = n_p3[:, :2]
        nn = jnp.linalg.norm(n2, axis=-1, keepdims=True)
        n2 = jnp.where(nn > 1e-6, n2 / jnp.maximum(nn, 1e-30),
                       jnp.zeros_like(n2).at[:, 1].set(1.0))
        normal_a = jnp.where(pfm[:, None], n2, normal_a)
        points_a = points_a.at[:, 0].set(
            jnp.where(pfm[:, None], p_p3[:, :2], points_a[:, 0]))
        dist = dist.at[:, 0].set(jnp.where(pfm, d_p, dist[:, 0]))
        num_points = jnp.where(pfm, 1, num_points)

    valid = pairs.valid & (num_points > 0) & (dist[:, 0] < prediction_distance)
    contacts = Contacts(a, b, normal_a, points_a, dist, num_points, valid)
    if with_overflow:
        return contacts, jnp.stack([bc_needed, sat_needed, pfm_needed])
    return contacts
