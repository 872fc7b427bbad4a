"""Fused Pallas kernel for the GS color-iteration impulse math (3D).

The per-color Gauss-Seidel body (``solver._point_updates`` + velocity-delta
assembly) is ~55 small XLA ops over [window, <=8]-shaped arrays; on TPU the
cost is per-op dispatch overhead, not arithmetic (~80+ us per color
iteration at window 4096). This module runs the same math as ONE Pallas
VPU kernel in component-major layout ([rows, window] — the window rides the
128-lane axis), with the XLA-side gathers/scatters unchanged.

The math is a transcription of ``solver._point_updates`` (3D / 2-tangent
case; ≙ solver.wgsl step_gauss_seidel:579-660). ``_cm_point_updates`` is
pure jnp so the identical code runs inside the kernel on TPU and as a plain
XLA function elsewhere — and is unit-tested against ``_point_updates``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from wgmath_tpu.core.dispatch import on_tpu, pallas_interpret


def _cm_point_updates(f, v1l, v1a, v2l, v2a, prev_n, prev_t,
                      p_max: int, s_len: int):
    """Component-major impulse updates.

    ``f``: dict of component-major fields —
      dir_a [3,L], tangent_a [S,3,L], im_a/im_b [3,L], cfm [1,L],
      limit [1,L], nump [1,L] (f32), active [1,L] (f32 0/1),
      n_torque_a/b [P,3,L], n_ii_torque_a/b [P,3,L], n_rhs/n_r [P,L],
      t_torque_a/b [P,S,3,L], t_ii_torque_a/b [P,S,3,L], t_rhs [P,S,L],
      t_r [P,3,L].
    Velocities / impulses: v1l,v1a,v2l,v2a [3,L]; prev_n [P,L],
    prev_t [P,S,L]. Returns (new_n [P,L], new_t [P,S,L], v1l', v1a',
    v2l', v2a').
    """
    dir_a = f["dir_a"]
    tang = f["tangent_a"]
    im_a, im_b = f["im_a"], f["im_b"]
    cfm = f["cfm"]
    friction = f["limit"]
    new_n, new_t = [], []
    for k in range(p_max):
        pt_active = (f["active"] > 0.5) & (f["nump"] > k)  # [1, L] bool

        td_a = f["n_torque_a"][k]
        td_b = f["n_torque_b"][k]
        iitd_a = f["n_ii_torque_a"][k]
        iitd_b = f["n_ii_torque_b"][k]
        rhs = f["n_rhs"][k:k + 1]
        r = f["n_r"][k:k + 1]
        prev = prev_n[k:k + 1]

        dvel = (jnp.sum(dir_a * v1l, axis=0, keepdims=True)
                + jnp.sum(td_a * v1a, axis=0, keepdims=True)
                - jnp.sum(dir_a * v2l, axis=0, keepdims=True)
                + jnp.sum(td_b * v2a, axis=0, keepdims=True) + rhs)
        cand = cfm * jnp.maximum(prev - r * dvel, 0.0)
        new_imp = jnp.where(pt_active, cand, prev)
        d_imp = new_imp - prev  # [1, L]
        v1l = v1l + dir_a * (im_a * d_imp)
        v1a = v1a + iitd_a * d_imp
        v2l = v2l - dir_a * (im_b * d_imp)
        v2a = v2a + iitd_b * d_imp
        limit = new_imp * friction  # [1, L]
        new_n.append(new_imp)

        t_rhs = f["t_rhs"][k]  # [S, L]
        t_r = f["t_r"][k]  # [3, L]
        t_prev = prev_t[k]  # [S, L]
        t0, t1 = tang[0], tang[1]  # [3, L]
        ta0, ta1 = f["t_torque_a"][k, 0], f["t_torque_a"][k, 1]
        tb0, tb1 = f["t_torque_b"][k, 0], f["t_torque_b"][k, 1]
        ia0, ia1 = f["t_ii_torque_a"][k, 0], f["t_ii_torque_a"][k, 1]
        ib0, ib1 = f["t_ii_torque_b"][k, 0], f["t_ii_torque_b"][k, 1]

        d0 = (jnp.sum(t0 * v1l, axis=0, keepdims=True)
              + jnp.sum(ta0 * v1a, axis=0, keepdims=True)
              - jnp.sum(t0 * v2l, axis=0, keepdims=True)
              + jnp.sum(tb0 * v2a, axis=0, keepdims=True)
              + t_rhs[0:1])
        d1 = (jnp.sum(t1 * v1l, axis=0, keepdims=True)
              + jnp.sum(ta1 * v1a, axis=0, keepdims=True)
              - jnp.sum(t1 * v2l, axis=0, keepdims=True)
              + jnp.sum(tb1 * v2a, axis=0, keepdims=True)
              + t_rhs[1:2])
        d00, d11, d01 = d0 * d0, d1 * d1, d0 * d1
        lhs = d00 * t_r[0:1] + d11 * t_r[1:2] + d01 * t_r[2:3]
        ok = jnp.abs(lhs) > 1e-20  # maybe_inv semantics
        inv_lhs = (d00 + d11) * jnp.where(ok, 1.0 / jnp.where(ok, lhs, 1.0),
                                          0.0)
        delta = jnp.concatenate([inv_lhs * d0, inv_lhs * d1], axis=0)
        raw = t_prev - delta  # [S, L]
        # cap_magnitude over the S axis (axis 0 here)
        n_ = jnp.sqrt(jnp.sum(raw * raw, axis=0, keepdims=True))
        scale = jnp.where(n_ > limit, limit / jnp.maximum(n_, 1e-30), 1.0)
        cand_t = raw * scale
        t_new = jnp.where(pt_active, cand_t, t_prev)
        dl = t_new - t_prev  # [S, L]
        lin_dir = t0 * dl[0:1] + t1 * dl[1:2]
        v1l = v1l + lin_dir * im_a
        v1a = v1a + ia0 * dl[0:1] + ia1 * dl[1:2]
        v2l = v2l - lin_dir * im_b
        v2a = v2a + ib0 * dl[0:1] + ib1 * dl[1:2]
        new_t.append(t_new)

    return (jnp.concatenate(new_n, axis=0),
            jnp.stack(new_t, axis=0), v1l, v1a, v2l, v2a)


def _cm_fields_base(win_ref, meta, p_max, s_len):
    """Component-major views of the packed invariant fields [K, L]."""
    f = {}

    def rows(name, shape):
        a0, tail = meta[name]
        k = int(np.prod(tail)) if tail else 1
        v = win_ref[a0:a0 + k, :]
        return v.reshape(shape + (v.shape[-1],))

    f["dir_a"] = rows("dir_a", (3,))
    f["tangent_a"] = rows("tangent_a", (s_len, 3))
    f["im_a"] = rows("im_a", (3,))
    f["im_b"] = rows("im_b", (3,))
    f["limit"] = rows("limit", (1,))
    f["n_torque_a"] = rows("n_torque_a", (p_max, 3))
    f["n_torque_b"] = rows("n_torque_b", (p_max, 3))
    f["n_ii_torque_a"] = rows("n_ii_torque_a", (p_max, 3))
    f["n_ii_torque_b"] = rows("n_ii_torque_b", (p_max, 3))
    f["n_r"] = rows("n_r", (p_max,))
    f["t_torque_a"] = rows("t_torque_a", (p_max, s_len, 3))
    f["t_torque_b"] = rows("t_torque_b", (p_max, s_len, 3))
    f["t_ii_torque_a"] = rows("t_ii_torque_a", (p_max, s_len, 3))
    f["t_ii_torque_b"] = rows("t_ii_torque_b", (p_max, s_len, 3))
    f["t_r"] = rows("t_r", (p_max, 3))
    # rhs-relinearization inputs (present when _PACK_FIELDS carries them)
    if "local_pt_a" in meta:
        f["local_pt_a"] = rows("local_pt_a", (p_max, 3))
        f["local_pt_b"] = rows("local_pt_b", (p_max, 3))
        f["info_dist"] = rows("info_dist", (p_max,))
        f["info_normal_vel"] = rows("info_normal_vel", (p_max,))
        f["t_rhs_wo_bias"] = rows("t_rhs_wo_bias", (p_max, s_len))
    return f


def _cm_fields_from_refs(win_ref, meta, extras, p_max, s_len):
    """Build the component-major field dict from the transposed packed
    window [K, L] (+ transposed mutable extras)."""
    f = _cm_fields_base(win_ref, meta, p_max, s_len)
    f["cfm"], f["n_rhs"], f["t_rhs"], f["nump"], f["active"] = extras
    return f


def _cm_rot(q, v3):
    """quat.mul_vec (xyzw), component-major: v + 2(w(u×v) + u×(u×v))."""
    ux, uy, uz, w = q[0:1], q[1:2], q[2:3], q[3:4]
    vx, vy, vz = v3[0:1], v3[1:2], v3[2:3]
    cx = uy * vz - uz * vy
    cy = uz * vx - ux * vz
    cz = ux * vy - uy * vx
    dx = uy * cz - uz * cy
    dy = uz * cx - ux * cz
    dz = ux * cy - uy * cx
    return jnp.concatenate([vx + 2.0 * (w * cx + dx),
                            vy + 2.0 * (w * cy + dy),
                            vz + 2.0 * (w * cz + dz)], axis=0)


def _cm_rhs(f, pose1, pose2, consts, p_max, s_len):
    """Component-major substep rhs relinearization — the in-kernel twin of
    ``constraint.update_rhs_sorted`` (≙ solver.wgsl update_constraints
    :103-170). ``pose1``/``pose2`` [8, L]: quat xyzw, translation, scale of
    each side's body at substep start (ridden through the chained sweep's
    velocity stream). Returns ``(n_rhsT [P,L], rhs_woT [P,L],
    t_rhsT [P,S,L])``."""
    inv_dt, erp_inv_dt, allowed, max_corr = consts

    def mul_pt(pose, v3):  # sim.mul_pt: scale·rot(v) + translation
        return pose[7:8] * _cm_rot(pose[0:4], v3) + pose[4:7]

    dir_a = f["dir_a"]
    tang = f["tangent_a"]
    n_rhs, rhs_wo, t_rhs = [], [], []
    for k in range(p_max):
        p1w = mul_pt(pose1, f["local_pt_a"][k])
        p2w = mul_pt(pose2, f["local_pt_b"][k])
        drift = p1w - p2w  # [3, L]
        dist = (f["info_dist"][k:k + 1]
                + jnp.sum(drift * dir_a, axis=0, keepdims=True))
        wo = (f["info_normal_vel"][k:k + 1]
              + jnp.maximum(dist, 0.0) * inv_dt)
        bias = jnp.clip((dist + allowed) * erp_inv_dt, -max_corr, 0.0)
        n_rhs.append(wo + bias)
        rhs_wo.append(wo)
        tk = []
        for j in range(s_len):
            tb = jnp.sum(drift * tang[j], axis=0, keepdims=True) * inv_dt
            tk.append(f["t_rhs_wo_bias"][k, j:j + 1] + tb)
        t_rhs.append(jnp.concatenate(tk, axis=0))
    return (jnp.concatenate(n_rhs, axis=0), jnp.concatenate(rhs_wo, axis=0),
            jnp.stack(t_rhs, axis=0))


@functools.partial(jax.jit, static_argnames=("p_max", "s_len", "meta_t"))
def _gs_math_xla(winT, cfmT, n_rhsT, t_rhsT, numpT, activeT, p1T, p2T,
                 prev_nT, prev_tT, *, p_max, s_len, meta_t):
    meta = dict(meta_t)
    extras = (cfmT, n_rhsT, t_rhsT.reshape(p_max, s_len, -1), numpT, activeT)
    f = _cm_fields_from_refs(winT, meta, extras, p_max, s_len)
    v1l, v1a = p1T[:3], p1T[3:6]
    v2l, v2a = p2T[:3], p2T[3:6]
    new_n, new_t, w1l, w1a, w2l, w2a = _cm_point_updates(
        f, v1l, v1a, v2l, v2a, prev_nT, prev_tT.reshape(p_max, s_len, -1),
        p_max, s_len)
    d1 = jnp.concatenate([w1l - v1l, w1a - v1a], axis=0)
    d2 = jnp.concatenate([w2l - v2l, w2a - v2a], axis=0)
    return new_n, new_t.reshape(p_max * s_len, -1), d1, d2


def _lane_tiling(L, rows=280):
    """(block_width, n_blocks): wide windows split along the lane axis —
    the math is purely columnwise, and one [~280-row, L] operand set past
    L≈8k blows the 16 MB scoped-VMEM budget (pyramid-43k regrow OOM'd at
    L=24576: the first fix tiled at a fixed 8192, but 280 combined rows
    x 8192 lanes x f32, double-buffered, is still 22 MB — the budget must
    scale with the ROW count, which varies with p_max/s_len/meta).
    ``rows``: total first-dim rows across all in/out operands. Tile width
    is the largest 128-quantum divisor whose double-buffered resident set
    fits ~10 MB (slack below the 16 MB scoped limit for compiler
    scratch). Rung widths are 128-quantum, so a power-of-two tile always
    divides them in practice; indivisible widths keep the single block."""
    budget = 10 * 1024 * 1024
    bl_max = max(budget // (max(rows, 1) * 4 * 2), 512)
    if L <= min(8192, bl_max):
        return L, 1
    for cand in (8192, 4096, 2048, 1024, 512, 256, 128):
        if cand <= bl_max and L % cand == 0:
            return cand, L // cand
    return L, 1


def _gs_math_pallas_call(winT, cfmT, n_rhsT, t_rhsT, numpT, activeT,
                         p1T, p2T, prev_nT, prev_tT, *, p_max, s_len,
                         meta_t):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = winT.shape[1]
    meta = dict(meta_t)
    ins_rows = (winT.shape[0] + cfmT.shape[0] + n_rhsT.shape[0]
                + t_rhsT.shape[0] + numpT.shape[0] + activeT.shape[0]
                + p1T.shape[0] + p2T.shape[0] + prev_nT.shape[0]
                + prev_tT.shape[0])
    BL, n_blk = _lane_tiling(L, ins_rows + 2 * p_max * (1 + s_len) + 12)

    def kernel(win_ref, cfm_ref, nrhs_ref, trhs_ref, nump_ref, act_ref,
               p1_ref, p2_ref, pn_ref, pt_ref,
               nn_ref, nt_ref, d1_ref, d2_ref):
        bl = win_ref.shape[1]
        extras = (cfm_ref[:, :], nrhs_ref[:, :],
                  trhs_ref[:, :].reshape(p_max, s_len, bl),
                  nump_ref[:, :], act_ref[:, :])
        f = _cm_fields_from_refs(win_ref[:, :], meta, extras, p_max, s_len)
        p1 = p1_ref[:, :]
        p2 = p2_ref[:, :]
        v1l, v1a = p1[:3], p1[3:6]
        v2l, v2a = p2[:3], p2[3:6]
        new_n, new_t, w1l, w1a, w2l, w2a = _cm_point_updates(
            f, v1l, v1a, v2l, v2a, pn_ref[:, :],
            pt_ref[:, :].reshape(p_max, s_len, bl), p_max, s_len)
        nn_ref[:, :] = new_n
        nt_ref[:, :] = new_t.reshape(p_max * s_len, bl)
        d1_ref[:, :] = jnp.concatenate([w1l - v1l, w1a - v1a], axis=0)
        d2_ref[:, :] = jnp.concatenate([w2l - v2l, w2a - v2a], axis=0)

    def bspec(rows):
        return pl.BlockSpec((rows, BL), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    ins = (winT, cfmT, n_rhsT, t_rhsT, numpT, activeT, p1T, p2T,
           prev_nT, prev_tT)
    out_rows = (p_max, p_max * s_len, 6, 6)
    return pl.pallas_call(
        kernel,
        grid=(n_blk,),
        out_shape=tuple(jax.ShapeDtypeStruct((r, L), jnp.float32)
                        for r in out_rows),
        in_specs=[bspec(x.shape[0]) for x in ins],
        out_specs=tuple(bspec(r) for r in out_rows),
        interpret=pallas_interpret(),
    )(*ins)


@functools.partial(jax.jit, static_argnames=("p_max", "s_len", "meta_t",
                                              "consts", "mode"))
def _gs_math_rhs_xla(winT, numpT, activeT, p1T, p2T, auxT,
                     prev_nT, prev_tT, pose2T, *, p_max, s_len, meta_t,
                     consts, mode):
    meta = dict(meta_t)
    f = _cm_fields_base(winT, meta, p_max, s_len)
    L = winT.shape[1]
    if mode == "biased":
        pose1T = auxT
        n_rhsT, rhs_woT, t_rhsT = _cm_rhs(f, pose1T, pose2T, consts[:4],
                                          p_max, s_len)
        cfm = jnp.full((1, L), consts[4], jnp.float32)
    else:  # unbiased: stored rhs_wo + packed t_rhs_wo_bias, cfm = 1
        n_rhsT = auxT
        rhs_woT = None
        t_rhsT = f["t_rhs_wo_bias"]
        cfm = jnp.ones((1, L), jnp.float32)
    f["cfm"], f["n_rhs"], f["t_rhs"] = cfm, n_rhsT, t_rhsT
    f["nump"], f["active"] = numpT, activeT
    v1l, v1a = p1T[:3], p1T[3:6]
    v2l, v2a = p2T[:3], p2T[3:6]
    new_n, new_t, w1l, w1a, w2l, w2a = _cm_point_updates(
        f, v1l, v1a, v2l, v2a, prev_nT, prev_tT.reshape(p_max, s_len, -1),
        p_max, s_len)
    d1 = jnp.concatenate([w1l - v1l, w1a - v1a], axis=0)
    d2 = jnp.concatenate([w2l - v2l, w2a - v2a], axis=0)
    if mode == "biased":
        return new_n, new_t.reshape(p_max * s_len, -1), d1, d2, rhs_woT
    return new_n, new_t.reshape(p_max * s_len, -1), d1, d2


def _gs_math_rhs_pallas_call(winT, numpT, activeT, p1T, p2T, auxT,
                             prev_nT, prev_tT, pose2T, *, p_max, s_len,
                             meta_t, consts, mode):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = winT.shape[1]
    meta = dict(meta_t)
    biased = mode == "biased"
    ins_rows = (winT.shape[0] + numpT.shape[0] + activeT.shape[0]
                + p1T.shape[0] + p2T.shape[0] + auxT.shape[0]
                + prev_nT.shape[0] + prev_tT.shape[0] + pose2T.shape[0])
    outs_rows = p_max * (1 + s_len) + 12 + (p_max if biased else 0)
    BL, n_blk = _lane_tiling(L, ins_rows + outs_rows)

    def kernel(win_ref, nump_ref, act_ref, p1_ref, p2_ref, aux_ref,
               pn_ref, pt_ref, pose2_ref, *out_refs):
        bl = win_ref.shape[1]
        f = _cm_fields_base(win_ref[:, :], meta, p_max, s_len)
        if biased:
            n_rhsT, rhs_woT, t_rhsT = _cm_rhs(
                f, aux_ref[:, :], pose2_ref[:, :], consts[:4], p_max, s_len)
            cfm = jnp.full((1, bl), consts[4], jnp.float32)
        else:
            n_rhsT = aux_ref[:, :]
            t_rhsT = f["t_rhs_wo_bias"]
            cfm = jnp.ones((1, bl), jnp.float32)
        f["cfm"], f["n_rhs"], f["t_rhs"] = cfm, n_rhsT, t_rhsT
        f["nump"], f["active"] = nump_ref[:, :], act_ref[:, :]
        p1 = p1_ref[:, :]
        p2 = p2_ref[:, :]
        v1l, v1a = p1[:3], p1[3:6]
        v2l, v2a = p2[:3], p2[3:6]
        new_n, new_t, w1l, w1a, w2l, w2a = _cm_point_updates(
            f, v1l, v1a, v2l, v2a, pn_ref[:, :],
            pt_ref[:, :].reshape(p_max, s_len, bl), p_max, s_len)
        out_refs[0][:, :] = new_n
        out_refs[1][:, :] = new_t.reshape(p_max * s_len, bl)
        out_refs[2][:, :] = jnp.concatenate([w1l - v1l, w1a - v1a], axis=0)
        out_refs[3][:, :] = jnp.concatenate([w2l - v2l, w2a - v2a], axis=0)
        if biased:
            out_refs[4][:, :] = rhs_woT

    def bspec(rows):
        return pl.BlockSpec((rows, BL), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    ins = (winT, numpT, activeT, p1T, p2T, auxT, prev_nT, prev_tT, pose2T)
    out_rows = [p_max, p_max * s_len, 6, 6]
    if biased:
        out_rows.append(p_max)
    return pl.pallas_call(
        kernel,
        grid=(n_blk,),
        out_shape=tuple(jax.ShapeDtypeStruct((r, L), jnp.float32)
                        for r in out_rows),
        in_specs=[bspec(x.shape[0]) for x in ins],
        out_specs=tuple(bspec(r) for r in out_rows),
        interpret=pallas_interpret(),
    )(*ins)


def gs_math_block_rhs(win2d, meta, num_points, active, p1, p2, prev_n,
                      prev_t, *, mode: str, consts: tuple, pose1=None,
                      pose2=None, n_rhs_wo=None, p_max: int, s_len: int,
                      use_pallas: bool | None = None):
    """``gs_math_block`` with IN-KERNEL substep rhs relinearization (the
    chained rhs-in-rung path): the per-substep 2C-row pose gather + XLA
    relinearization phase disappears — each rung recomputes its own rhs
    from the poses ridden through the velocity stream.

    ``mode``: "biased" computes n_rhs/t_rhs from ``pose1``/``pose2``
    [L, 8] and additionally returns ``rhs_wo`` [L, P] (stored for the
    unbiased sweep, whose pre-integrate poses these are);  "unbiased"
    consumes ``n_rhs_wo`` [L, P] + the packed t_rhs_wo_bias with cfm = 1
    (≙ remove_cfm_and_bias, solver.wgsl:688-699).
    ``consts`` = (inv_dt, erp_inv_dt, allowed_err, max_corr, cfm_factor).
    """
    L = win2d.shape[0]
    if use_pallas is None:
        use_pallas = on_tpu()
    winT = win2d.T
    numpT = num_points.astype(jnp.float32).reshape(L, 1).T
    activeT = active.astype(jnp.float32).reshape(L, 1).T
    p1T, p2T = p1.T, p2.T
    prev_nT = prev_n.reshape(L, p_max).T
    prev_tT = prev_t.reshape(L, p_max * s_len).T
    if mode == "biased":
        auxT = pose1.T
        pose2T = pose2.T
    else:
        auxT = n_rhs_wo.reshape(L, p_max).T
        pose2T = jnp.zeros((8, L), jnp.float32)
    meta_t = tuple(sorted((k, (a, tuple(t))) for k, (a, t) in meta.items()))
    fn = _gs_math_rhs_pallas_call if use_pallas else _gs_math_rhs_xla
    out = fn(winT, numpT, activeT, p1T, p2T, auxT, prev_nT, prev_tT,
             pose2T, p_max=p_max, s_len=s_len, meta_t=meta_t,
             consts=consts, mode=mode)
    new_nT, new_tT, d1T, d2T = out[:4]
    res = (new_nT.T, new_tT.T.reshape(L, p_max, s_len), d1T.T, d2T.T)
    if mode == "biased":
        return res + (out[4].T,)
    return res


def gs_math_block(win2d, meta, view, active, p1, p2, prev_n, prev_t,
                  *, p_max: int, s_len: int, use_pallas: bool | None = None):
    """Row-major in/out wrapper around the component-major math.

    ``win2d`` [L, K_pack] (the packed invariant fields), ``view`` carries
    the mutable per-substep fields (cfm_factor, n_rhs, t_rhs, num_points),
    ``p1``/``p2`` [L, 6] gathered velocities. Returns row-major
    ``(new_n [L,P], new_t [L,P,S], d1 [L,6], d2 [L,6])``.
    """
    L = win2d.shape[0]
    if use_pallas is None:
        use_pallas = on_tpu()
    winT = win2d.T
    cfmT = view.cfm_factor.reshape(L, 1).T
    n_rhsT = view.n_rhs.reshape(L, p_max).T
    t_rhsT = view.t_rhs.reshape(L, p_max * s_len).T
    numpT = view.num_points.astype(jnp.float32).reshape(L, 1).T
    activeT = active.astype(jnp.float32).reshape(L, 1).T
    p1T, p2T = p1.T, p2.T
    prev_nT = prev_n.reshape(L, p_max).T
    prev_tT = prev_t.reshape(L, p_max * s_len).T
    meta_t = tuple(sorted((k, (a, tuple(t))) for k, (a, t) in meta.items()))
    fn = _gs_math_pallas_call if use_pallas else _gs_math_xla
    new_nT, new_tT, d1T, d2T = fn(
        winT, cfmT, n_rhsT, t_rhsT, numpT, activeT, p1T, p2T, prev_nT,
        prev_tT, p_max=p_max, s_len=s_len, meta_t=meta_t)
    return (new_nT.T, new_tT.T.reshape(L, p_max, s_len), d1T.T, d2T.T)
