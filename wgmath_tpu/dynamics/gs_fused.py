"""Fully-fused Gauss-Seidel sweep: ONE Pallas kernel per sweep.

The ladder sweep (``solver.gs_color_major_pass``) is floor-bound by XLA's
per-color gather (135 Mrow/s) + scatter-add (49 Mrow/s) + dispatch overhead
(~95 us/color x 24 colors x 8 sweeps = the whole substep budget at 10k
bodies). This module runs an ENTIRE sweep — all color windows — as one
Pallas kernel with the velocity table VMEM-resident in component-major
layout ([8, W] — bodies on the 128-lane axis):

- body-velocity gather: ``tpu.dynamic_gather`` (``jnp.take_along_axis`` on
  the lane axis) with a per-color index row that packs BOTH sides
  (a-side at lanes [0, rung), b-side at [rung, 2*rung)) — one gather per
  color instead of one 2W-row HBM gather.
- scatter-add: same-color constraints touch disjoint dynamic bodies, so
  the color's scatter is a masked PERMUTATION — applied as a second
  ``dynamic_gather`` through the per-frame INVERSE table (body lane ->
  delta lane, statics/outsiders -> a zero lane). No scatter primitive
  needed, no 49 Mrow/s floor.
- the color windows are STATIC slices: the pipeline compacts contacts
  color-major with each color padded to its static ladder rung
  (``compact_contacts(static_windows=...)``), so offsets are compile-time
  constants and the kernel is a plain unrolled loop — no scalar prefetch,
  no dynamic DMA.

The impulse-math body is ``gs_pallas._cm_point_updates`` — the same code
(and unit tests) as the per-color fused-math kernel this supersedes.

Index tables (built once per frame, cached with the solver bundle under
the stable-contact-keys cond):
  idx [C, Wg] i32: lanes [0,rung) = body_a of the color's rows, lanes
      [rung, 2rung) = body_b, rest = 0 (gathers garbage, masked inactive).
  inv [C, Wg] i32: body lane -> its delta lane in the color (a-side j,
      b-side rung+j), or ``Wg-1`` (a permanently-zero delta lane) for
      bodies outside the color / static sides / scratch lanes.

Reference: the per-color kernel-launch ladder this replaces mirrors
solver.rs:238-460 + solver.wgsl step_gauss_seidel:579-660; the fused
velocity-resident sweep is the TPU-native redesign of that launch loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from wgmath_tpu.core.dispatch import on_tpu, pallas_interpret
from wgmath_tpu.dynamics.gs_pallas import _cm_point_updates

ROWS = 8  # velocity rows: 3 linear + 3 angular + 2 zero padding


def fused_layout(windows: tuple, rung0: int):
    """Static color-major rung layout: offsets[c] = start row of color c
    (c = 0 is the residue class), total = offsets[-1]."""
    rungs = (rung0,) + tuple(windows)
    offsets = np.concatenate([[0], np.cumsum(rungs)]).astype(np.int32)
    return rungs, offsets, int(offsets[-1])


def gather_width(n_bodies: int, windows: tuple) -> int:
    """Lane width of the velocity/idx/inv tables: bodies plus room for
    both sides of the largest window plus the zero/trash lane."""
    need = max(n_bodies + 1, 2 * max(windows) + 1 if windows else 1)
    return -(-need // 128) * 128


def build_fused_tables(body_a, body_b, dyn_a, dyn_b, valid, *,
                       windows: tuple, rung0: int, w_g: int):
    """Per-color gather + inverse-permutation tables from RUNG-PADDED
    color-major constraint rows ([Ctot] each). Cached per frame."""
    rungs, offsets, ctot = fused_layout(windows, rung0)
    assert body_a.shape[0] == ctot, (body_a.shape, ctot)
    c = len(windows)
    trash = w_g - 1

    idx_rows = []
    for k in range(1, c + 1):
        off, rung = int(offsets[k]), rungs[k]
        row = jnp.concatenate([
            body_a[off:off + rung], body_b[off:off + rung],
            jnp.zeros((w_g - 2 * rung,), body_a.dtype)])
        idx_rows.append(row)
    idx = jnp.stack(idx_rows).astype(jnp.int32)

    # inverse permutation: ONE scatter for all colors and both sides.
    # Static row->color / row->rank / row->rung maps (the layout is static).
    col_of_row = np.zeros((ctot,), np.int32)
    j_of_row = np.zeros((ctot,), np.int32)
    rung_of_row = np.zeros((ctot,), np.int32)
    in_color_np = np.zeros((ctot,), bool)  # residue (color 0) is excluded
    for k in range(1, c + 1):
        off, rung = int(offsets[k]), rungs[k]
        col_of_row[off:off + rung] = k - 1  # idx/inv rows are 0-based
        j_of_row[off:off + rung] = np.arange(rung)
        rung_of_row[off:off + rung] = rung
        in_color_np[off:off + rung] = True
    col_of_row = jnp.asarray(col_of_row)
    j_of_row = jnp.asarray(j_of_row)
    rung_of_row = jnp.asarray(rung_of_row)
    in_color = jnp.asarray(in_color_np)
    ok_a = in_color & valid & dyn_a & (body_a < w_g)
    ok_b = in_color & valid & dyn_b & (body_b < w_g)
    flat_a = jnp.where(ok_a, col_of_row * w_g + body_a, c * w_g)
    flat_b = jnp.where(ok_b, col_of_row * w_g + body_b, c * w_g)
    inv = jnp.full((c * w_g + 1,), trash, jnp.int32)
    inv = inv.at[flat_a].set(j_of_row, mode="drop")
    inv = inv.at[flat_b].set(j_of_row + rung_of_row, mode="drop")
    return idx, inv[:c * w_g].reshape(c, w_g)


def _fields_cm(win, meta, rhs_extras, p_max, s_len):
    """Component-major field dict from a [K, rung] window slice (value,
    not ref — works identically in-kernel and in the XLA fallback)."""
    f = {}

    def rows(name, shape):
        a0, tail = meta[name]
        k = int(np.prod(tail)) if tail else 1
        v = win[a0:a0 + k, :]
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
    f["cfm"], f["n_rhs"], f["t_rhs"], f["nump"], f["active"] = rhs_extras
    return f


def _sweep_color(c, off, rung, w_g, vt, n_imp, t_imp, winT, activeT, numpT,
                 cfmT, n_rhs_w, t_rhs_w, idx_row, inv_row, meta, p_max,
                 s_len):
    """One color window on VALUES (shared by kernel and XLA fallback).

    ``n_rhs_w`` [P, rung] / ``t_rhs_w`` [P*S, rung] are the color's rhs
    slices (pre-sliced so the substep kernel can feed freshly relinearized
    values). Returns (v_add [8, Wg] to accumulate into vt, new_n
    [P, rung], new_t [P*S, rung])."""
    sl = lambda x: x[:, off:off + rung]
    idx8 = jnp.broadcast_to(idx_row, (ROWS, w_g))
    pp = jnp.take_along_axis(vt, idx8, axis=1, mode="promise_in_bounds")
    v1l, v1a = pp[0:3, 0:rung], pp[3:6, 0:rung]
    v2l = pp[0:3, rung:2 * rung]
    v2a = pp[3:6, rung:2 * rung]
    extras = (cfmT, n_rhs_w.reshape(p_max, rung),
              t_rhs_w.reshape(p_max, s_len, rung),
              sl(numpT), sl(activeT))
    f = _fields_cm(sl(winT), meta, extras, p_max, s_len)
    prev_n = sl(n_imp).reshape(p_max, rung)
    prev_t = sl(t_imp).reshape(p_max, s_len, rung)
    new_n, new_t, w1l, w1a, w2l, w2a = _cm_point_updates(
        f, v1l, v1a, v2l, v2a, prev_n, prev_t, p_max, s_len)
    d12 = jnp.concatenate([
        jnp.concatenate([w1l - v1l, w1a - v1a], axis=0),
        jnp.concatenate([w2l - v2l, w2a - v2a], axis=0)], axis=1)
    # [6, 2*rung] deltas -> a zero-padded [8, Wg] table, then the inverse
    # permutation places each body's delta at its lane (trash lane = 0)
    d_pad = _pad_table(d12, ROWS, w_g)
    inv8 = jnp.broadcast_to(inv_row, (ROWS, w_g))
    v_add = jnp.take_along_axis(d_pad, inv8, axis=1,
                                mode="promise_in_bounds")
    return v_add, new_n.reshape(p_max, rung), new_t.reshape(
        p_max * s_len, rung)


def _pad_table(x, rows, cols):
    """Zero-pad [r, c] x to [rows, cols] at the top-left. Static shapes via
    concatenate (Mosaic has no value-level dynamic_update_slice lowering)."""
    r, c = x.shape
    if c < cols:
        x = jnp.concatenate([x, jnp.zeros((r, cols - c), x.dtype)], axis=1)
    if r < rows:
        x = jnp.concatenate([x, jnp.zeros((rows - r, cols), x.dtype)],
                            axis=0)
    return x


def _quat_rot_cm(q, v):
    """Rotate [3, L] v by [4, L] xyzw quaternion (component-major)."""
    u, w = q[0:3], q[3:4]
    def cr(a, b):
        return jnp.concatenate([
            a[1:2] * b[2:3] - a[2:3] * b[1:2],
            a[2:3] * b[0:1] - a[0:1] * b[2:3],
            a[0:1] * b[1:2] - a[1:2] * b[0:1]], axis=0)
    uv = cr(u, v)
    return v + 2.0 * (w * uv + cr(u, uv))


def _ws_color(off, rung, w_g, n_imp, t_imp, winT, activeT, numpT, inv_row,
              meta, p_max, s_len):
    """Warmstart velocity deltas of one color window, returned as a
    [8, Wg] add via the inverse permutation (≙ solver._ws_deltas +
    _ws_apply, color-sliced — addition commutes so per-color application
    equals the all-at-once segment sum)."""
    sl = lambda x: x[:, off:off + rung]
    f = _fields_cm(sl(winT), meta,
                   (None, None, None, sl(numpT), sl(activeT)),
                   p_max, s_len)
    active = (f["active"] > 0.5)
    dir_a = f["dir_a"]
    d1l = jnp.zeros_like(dir_a)
    d2l = jnp.zeros_like(dir_a)
    d1a = jnp.zeros_like(dir_a)
    d2a = jnp.zeros_like(dir_a)
    nT = sl(n_imp).reshape(p_max, rung)
    tT = sl(t_imp).reshape(p_max, s_len, rung)
    for k in range(p_max):
        m = active & (f["nump"] > k)
        imp = jnp.where(m, nT[k:k + 1], 0.0)
        d1l = d1l + dir_a * (f["im_a"] * imp)
        d1a = d1a + f["n_ii_torque_a"][k] * imp
        d2l = d2l - dir_a * (f["im_b"] * imp)
        d2a = d2a + f["n_ii_torque_b"][k] * imp
        for j in range(s_len):
            timp = jnp.where(m, tT[k, j:j + 1], 0.0)
            tj = f["tangent_a"][j]
            d1l = d1l + tj * (f["im_a"] * timp)
            d1a = d1a + f["t_ii_torque_a"][k, j] * timp
            d2l = d2l - tj * (f["im_b"] * timp)
            d2a = d2a + f["t_ii_torque_b"][k, j] * timp
    d12 = jnp.concatenate([jnp.concatenate([d1l, d1a], axis=0),
                           jnp.concatenate([d2l, d2a], axis=0)], axis=1)
    d_pad = _pad_table(d12, ROWS, w_g)
    inv8 = jnp.broadcast_to(inv_row, (ROWS, w_g))
    return jnp.take_along_axis(d_pad, inv8, axis=1,
                               mode="promise_in_bounds")


def _rhs_color(off, rung, poseT, idx_row, winT, rhs_srcT, src_meta, meta,
               p_max, s_len, w_g, *, inv_dt, erp_inv_dt, allowed_err,
               max_corr):
    """Per-color rhs relinearization (≙ constraint.update_rhs_sorted) with
    the pose gather riding the color's index row. Returns
    (n_rhs [P, rung], n_rhs_wo [P, rung], t_rhs [P*S, rung])."""
    sl = lambda x: x[:, off:off + rung]
    idx8 = jnp.broadcast_to(idx_row, (ROWS, w_g))
    pp = jnp.take_along_axis(poseT, idx8, axis=1, mode="promise_in_bounds")
    q1, t1_, s1 = pp[0:4, 0:rung], pp[4:7, 0:rung], pp[7:8, 0:rung]
    q2 = pp[0:4, rung:2 * rung]
    t2_ = pp[4:7, rung:2 * rung]
    s2 = pp[7:8, rung:2 * rung]

    # source rows live in rhs_srcT with their own meta
    def src(name, shape):
        a0, tail = src_meta[name]
        k = int(np.prod(tail)) if tail else 1
        v = rhs_srcT[a0:a0 + k, off:off + rung]
        return v.reshape(shape + (rung,))

    dir_a = winT[meta["dir_a"][0]:meta["dir_a"][0] + 3, off:off + rung]
    ta0 = meta["tangent_a"][0]
    tang = winT[ta0:ta0 + s_len * 3, off:off + rung].reshape(s_len, 3, rung)
    lpa = src("local_pt_a", (p_max, 3))
    lpb = src("local_pt_b", (p_max, 3))
    idist = src("info_dist", (p_max,))
    invel = src("info_normal_vel", (p_max,))
    trwb = src("t_rhs_wo_bias", (p_max, s_len))

    n_rhs, n_wo, t_rhs = [], [], []
    for k in range(p_max):
        p1 = s1 * _quat_rot_cm(q1, lpa[k]) + t1_
        p2 = s2 * _quat_rot_cm(q2, lpb[k]) + t2_
        drift = p1 - p2
        dist = idist[k:k + 1] + jnp.sum(drift * dir_a, axis=0,
                                        keepdims=True)
        wo = invel[k:k + 1] + jnp.maximum(dist, 0.0) * inv_dt
        bias = jnp.clip((dist + allowed_err) * erp_inv_dt, -max_corr, 0.0)
        n_rhs.append(wo + bias)
        n_wo.append(wo)
        for j in range(s_len):
            tb = jnp.sum(drift * tang[j], axis=0, keepdims=True) * inv_dt
            t_rhs.append(trwb[k, j:j + 1] + tb)
    return (jnp.concatenate(n_rhs, axis=0), jnp.concatenate(n_wo, axis=0),
            jnp.concatenate(t_rhs, axis=0))


def _fused_sweep_xla(vt, n_imp, t_imp, winT, activeT, numpT, cfm, n_rhsT,
                     t_rhsT, idx, inv, counts, *, windows, rung0, p_max,
                     s_len, meta_t):
    meta = dict(meta_t)
    w_g = vt.shape[1]
    rungs, offsets, _ = fused_layout(windows, rung0)
    cfmT = jnp.full((1, 1), cfm, jnp.float32)
    for k, rung in enumerate(windows, start=1):
        off = int(offsets[k])

        def body(args, k=k, off=off, rung=rung):
            vt, n_imp, t_imp = args
            cfm_w = jnp.broadcast_to(cfmT, (1, rung))
            v_add, new_n, new_t = _sweep_color(
                k, off, rung, w_g, vt, n_imp, t_imp, winT, activeT, numpT,
                cfm_w, n_rhsT[:, off:off + rung],
                t_rhsT[:, off:off + rung], idx[k - 1:k], inv[k - 1:k],
                meta, p_max, s_len)
            vt = vt + v_add
            n_imp = jax.lax.dynamic_update_slice(n_imp, new_n, (0, off))
            t_imp = jax.lax.dynamic_update_slice(t_imp, new_t, (0, off))
            return vt, n_imp, t_imp

        vt, n_imp, t_imp = jax.lax.cond(
            counts[k] > 0, body, lambda a: a, (vt, n_imp, t_imp))
    return vt, n_imp, t_imp


def _fused_sweep_pallas(vt, n_imp, t_imp, winT, activeT, numpT, cfm, n_rhsT,
                        t_rhsT, idx, inv, counts, *, windows, rung0, p_max,
                        s_len, meta_t):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    meta = dict(meta_t)
    w_g = vt.shape[1]
    rungs, offsets, ctot = fused_layout(windows, rung0)
    cfm_arr = jnp.full((1, 1), cfm, jnp.float32)

    def kernel(counts_ref, vin_ref, nin_ref, tin_ref, win_ref, act_ref,
               nump_ref, cfm_ref, nrhs_ref, trhs_ref, idx_ref, inv_ref,
               vout_ref, nout_ref, tout_ref):
        vout_ref[...] = vin_ref[...]
        nout_ref[...] = nin_ref[...]
        tout_ref[...] = tin_ref[...]
        for k, rung in enumerate(windows, start=1):
            off = int(offsets[k])

            @pl.when(counts_ref[0, k] > 0)
            def _(k=k, off=off, rung=rung):
                cfm_w = jnp.broadcast_to(cfm_ref[...], (1, rung))
                v_add, new_n, new_t = _sweep_color(
                    k, off, rung, w_g, vout_ref[...], nout_ref[...],
                    tout_ref[...], win_ref[...], act_ref[...],
                    nump_ref[...], cfm_w, nrhs_ref[:, off:off + rung],
                    trhs_ref[:, off:off + rung],
                    idx_ref[k - 1:k, :], inv_ref[k - 1:k, :], meta,
                    p_max, s_len)
                vout_ref[...] += v_add
                nout_ref[:, off:off + rung] = new_n
                tout_ref[:, off:off + rung] = new_t

    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct(vt.shape, jnp.float32),
                   jax.ShapeDtypeStruct(n_imp.shape, jnp.float32),
                   jax.ShapeDtypeStruct(t_imp.shape, jnp.float32)),
        in_specs=[smem] + [spec] * 11,
        out_specs=(spec, spec, spec),
        interpret=pallas_interpret(),
    )(counts.reshape(1, -1).astype(jnp.int32), vt, n_imp, t_imp, winT,
      activeT, numpT, cfm_arr, n_rhsT, t_rhsT, idx, inv)


def fused_sweep(vt, n_imp, t_imp, winT, activeT, numpT, cfm, n_rhsT,
                t_rhsT, idx, inv, counts, *, windows: tuple, rung0: int,
                p_max: int, s_len: int, meta, use_pallas: bool | None = None):
    """One full GS sweep over all color windows.

    vt [8, Wg] component-major velocities (rows 0-2 linear, 3-5 angular,
    6-7 zero); n_imp [P, Ctot] / t_imp [P*S, Ctot] impulses; winT
    [K, Ctot] transposed packed invariant fields; activeT/numpT [1, Ctot];
    cfm scalar; n_rhsT [P, Ctot] / t_rhsT [P*S, Ctot]; idx/inv [C, Wg];
    counts [C+2] class sizes (counts[k] = color k's size). Returns updated
    (vt, n_imp, t_imp).
    """
    if use_pallas is None:
        use_pallas = on_tpu()
    meta_t = tuple(sorted((k, (a, tuple(t))) for k, (a, t) in meta.items()))
    fn = _fused_sweep_pallas if use_pallas else _fused_sweep_xla
    return fn(vt, n_imp, t_imp, winT, activeT, numpT, cfm, n_rhsT, t_rhsT,
              idx, inv, counts, windows=windows, rung0=rung0, p_max=p_max,
              s_len=s_len, meta_t=meta_t)


# ---------------------------------------------------------------------------
# Fused substep-1: impulse scale + warmstart apply + rhs relinearization +
# the biased sweep, all in one kernel (phase 2 — removes the per-substep
# 2C-row pose gather and the 2C-row warmstart segment apply from XLA)
# ---------------------------------------------------------------------------


def _substep1_xla(vt, n_imp, t_imp, winT, rhs_srcT, poseT, activeT, numpT,
                  idx, inv, counts, *, windows, rung0, p_max, s_len,
                  meta_t, src_meta_t, scalars):
    meta = dict(meta_t)
    src_meta = dict(src_meta_t)
    ws_coeff, cfm, inv_dt, erp_inv_dt, allowed_err, max_corr = scalars
    w_g = vt.shape[1]
    rungs, offsets, ctot = fused_layout(windows, rung0)
    n_imp = n_imp * ws_coeff
    t_imp = t_imp * ws_coeff
    n_wo_out = jnp.zeros((p_max, n_imp.shape[1]), jnp.float32)

    # phase 1: warmstart apply, all colors (pure adds — order-free)
    for k, rung in enumerate(windows, start=1):
        off = int(offsets[k])

        def ws(v, k=k, off=off, rung=rung):
            return v + _ws_color(off, rung, w_g, n_imp, t_imp, winT,
                                 activeT, numpT, inv[k - 1:k], meta,
                                 p_max, s_len)

        vt = jax.lax.cond(counts[k] > 0, ws, lambda v: v, vt)

    # phase 2: rhs + biased sweep, sequential colors
    cfmT = jnp.full((1, 1), cfm, jnp.float32)
    for k, rung in enumerate(windows, start=1):
        off = int(offsets[k])

        def body(args, k=k, off=off, rung=rung):
            vt, n_imp, t_imp, n_wo_out = args
            n_rhs, n_wo, t_rhs = _rhs_color(
                off, rung, poseT, idx[k - 1:k], winT, rhs_srcT, src_meta,
                meta, p_max, s_len, w_g, inv_dt=inv_dt,
                erp_inv_dt=erp_inv_dt, allowed_err=allowed_err,
                max_corr=max_corr)
            n_wo_out = jax.lax.dynamic_update_slice(n_wo_out, n_wo,
                                                    (0, off))
            cfm_w = jnp.broadcast_to(cfmT, (1, rung))
            v_add, new_n, new_t = _sweep_color(
                k, off, rung, w_g, vt, n_imp, t_imp, winT, activeT, numpT,
                cfm_w, n_rhs, t_rhs, idx[k - 1:k], inv[k - 1:k], meta,
                p_max, s_len)
            vt = vt + v_add
            n_imp = jax.lax.dynamic_update_slice(n_imp, new_n, (0, off))
            t_imp = jax.lax.dynamic_update_slice(t_imp, new_t, (0, off))
            return vt, n_imp, t_imp, n_wo_out

        vt, n_imp, t_imp, n_wo_out = jax.lax.cond(
            counts[k] > 0, body, lambda a: a, (vt, n_imp, t_imp, n_wo_out))
    return vt, n_imp, t_imp, n_wo_out


def _substep1_pallas(vt, n_imp, t_imp, winT, rhs_srcT, poseT, activeT,
                     numpT, idx, inv, counts, *, windows, rung0, p_max,
                     s_len, meta_t, src_meta_t, scalars):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    meta = dict(meta_t)
    src_meta = dict(src_meta_t)
    ws_coeff, cfm, inv_dt, erp_inv_dt, allowed_err, max_corr = scalars
    w_g = vt.shape[1]
    rungs, offsets, ctot = fused_layout(windows, rung0)

    def kernel(counts_ref, vin_ref, nin_ref, tin_ref, win_ref, src_ref,
               pose_ref, act_ref, nump_ref, idx_ref, inv_ref,
               vout_ref, nout_ref, tout_ref, nwo_ref):
        vout_ref[...] = vin_ref[...]
        nout_ref[...] = nin_ref[...] * ws_coeff
        tout_ref[...] = tin_ref[...] * ws_coeff
        nwo_ref[...] = jnp.zeros_like(nwo_ref)
        for k, rung in enumerate(windows, start=1):
            off = int(offsets[k])

            @pl.when(counts_ref[0, k] > 0)
            def _(k=k, off=off, rung=rung):
                vout_ref[...] += _ws_color(
                    off, rung, w_g, nout_ref[...], tout_ref[...],
                    win_ref[...], act_ref[...], nump_ref[...],
                    inv_ref[k - 1:k, :], meta, p_max, s_len)
        for k, rung in enumerate(windows, start=1):
            off = int(offsets[k])

            @pl.when(counts_ref[0, k] > 0)
            def _(k=k, off=off, rung=rung):
                n_rhs, n_wo, t_rhs = _rhs_color(
                    off, rung, pose_ref[...], idx_ref[k - 1:k, :],
                    win_ref[...], src_ref[...], src_meta, meta, p_max,
                    s_len, w_g, inv_dt=inv_dt, erp_inv_dt=erp_inv_dt,
                    allowed_err=allowed_err, max_corr=max_corr)
                nwo_ref[:, off:off + rung] = n_wo
                cfm_w = jnp.full((1, rung), cfm, jnp.float32)
                v_add, new_n, new_t = _sweep_color(
                    k, off, rung, w_g, vout_ref[...], nout_ref[...],
                    tout_ref[...], win_ref[...], act_ref[...],
                    nump_ref[...], cfm_w, n_rhs, t_rhs,
                    idx_ref[k - 1:k, :], inv_ref[k - 1:k, :], meta,
                    p_max, s_len)
                vout_ref[...] += v_add
                nout_ref[:, off:off + rung] = new_n
                tout_ref[:, off:off + rung] = new_t

    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct(vt.shape, jnp.float32),
                   jax.ShapeDtypeStruct(n_imp.shape, jnp.float32),
                   jax.ShapeDtypeStruct(t_imp.shape, jnp.float32),
                   jax.ShapeDtypeStruct((p_max, n_imp.shape[1]),
                                        jnp.float32)),
        in_specs=[smem] + [spec] * 10,
        out_specs=(spec, spec, spec, spec),
        interpret=pallas_interpret(),
    )(counts.reshape(1, -1).astype(jnp.int32), vt, n_imp, t_imp, winT,
      rhs_srcT, poseT, activeT, numpT, idx, inv)


def fused_substep1(vt, n_imp, t_imp, winT, rhs_srcT, poseT, activeT, numpT,
                   idx, inv, counts, *, windows: tuple, rung0: int,
                   p_max: int, s_len: int, meta, src_meta, scalars,
                   use_pallas: bool | None = None):
    """Substep opening: impulses *= ws_coeff, warmstart applied to the
    velocity table, per-color rhs relinearization from ``poseT``
    ([8, Wg]: quat 4 + translation 3 + scale 1, component-major), then the
    BIASED sweep. Returns (vt, n_imp, t_imp, n_rhs_wo_bias [P, Ctot]) —
    the wo-bias rhs feeds the unbiased second sweep (``fused_sweep`` with
    cfm=1 and t_rhs = the invariant t_rhs_wo_bias rows).

    ``scalars`` = (ws_coeff, cfm, inv_dt, erp_inv_dt, allowed_err,
    max_corr) — substep-static python floats.

    NOTE: the uncolored residue class (color 0) is NOT warmstart-applied
    here (its rows can share bodies — no inverse permutation exists); the
    caller applies those rows via the XLA segment path when rung0 > 0.
    """
    if use_pallas is None:
        use_pallas = on_tpu()
    meta_t = tuple(sorted((k, (a, tuple(t))) for k, (a, t) in meta.items()))
    src_meta_t = tuple(sorted((k, (a, tuple(t)))
                              for k, (a, t) in src_meta.items()))
    fn = _substep1_pallas if use_pallas else _substep1_xla
    return fn(vt, n_imp, t_imp, winT, rhs_srcT, poseT, activeT, numpT, idx,
              inv, counts, windows=windows, rung0=rung0, p_max=p_max,
              s_len=s_len, meta_t=meta_t, src_meta_t=src_meta_t,
              scalars=scalars)


# ---------------------------------------------------------------------------
# Fused pose integration (keeps the substep loop fully component-major:
# poses/velocities pack ONCE per solve, not once per substep)
# ---------------------------------------------------------------------------


def _cm_quat_mul(a, b):
    ax, ay, az, aw = a[0:1], a[1:2], a[2:3], a[3:4]
    bx, by, bz, bw = b[0:1], b[1:2], b[2:3], b[3:4]
    return jnp.concatenate([
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz], axis=0)


def _cm_integrate(poseP, vt, comT, dt):
    """Component-major semi-implicit Euler pose update (≙
    body.integrate_velocity, 3D): poseP [8, L] = quat 4 + translation 3 +
    scale 1; vt rows 0:3 linear, 3:6 angular; comT [3, L] local COM."""
    q, t, s = poseP[0:4], poseP[4:7], poseP[7:8]
    lin, ang = vt[0:3], vt[3:6]
    init_com = s * _quat_rot_cm(q, comT) + t
    v = ang * dt
    angle = jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True))
    half = 0.5 * angle
    small = angle < 1e-6
    sinc_half = jnp.where(small, 0.5 - angle * angle / 48.0,
                          jnp.sin(half) / jnp.maximum(angle, 1e-30))
    dq = jnp.concatenate([v * sinc_half, jnp.cos(half)], axis=0)
    rotated = _quat_rot_cm(dq, t - init_com)
    new_q = _cm_quat_mul(dq, q)
    new_q = new_q * jax.lax.rsqrt(
        jnp.sum(new_q * new_q, axis=0, keepdims=True) + 1e-30)
    new_t = init_com + rotated * s + lin * dt
    return jnp.concatenate([new_q, new_t, s], axis=0)


def fused_integrate(poseP, vt, comT, dt, *, use_pallas: bool | None = None):
    if use_pallas is None:
        use_pallas = on_tpu()
    if not use_pallas:
        return _cm_integrate(poseP, vt, comT, float(dt))
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(p_ref, v_ref, c_ref, o_ref):
        o_ref[...] = _cm_integrate(p_ref[...], v_ref[...], c_ref[...],
                                   float(dt))

    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(poseP.shape, jnp.float32),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=pallas_interpret(),
    )(poseP, vt, comT)
