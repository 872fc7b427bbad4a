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
                 cfmT, n_rhsT, t_rhsT, idx_row, inv_row, meta, p_max, s_len):
    """One color window on VALUES (shared by kernel and XLA fallback).

    Returns (v_add [8, Wg] to accumulate into vt, new_n [P, rung],
    new_t [P*S, rung])."""
    sl = lambda x: x[:, off:off + rung]
    idx8 = jnp.broadcast_to(idx_row, (ROWS, w_g))
    pp = jnp.take_along_axis(vt, idx8, axis=1, mode="promise_in_bounds")
    v1l, v1a = pp[0:3, 0:rung], pp[3:6, 0:rung]
    v2l = pp[0:3, rung:2 * rung]
    v2a = pp[3:6, rung:2 * rung]
    extras = (cfmT, sl(n_rhsT).reshape(p_max, rung),
              sl(t_rhsT).reshape(p_max, s_len, rung),
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
    d_pad = jnp.zeros((ROWS, w_g), jnp.float32)
    d_pad = jax.lax.dynamic_update_slice(d_pad, d12, (0, 0))
    inv8 = jnp.broadcast_to(inv_row, (ROWS, w_g))
    v_add = jnp.take_along_axis(d_pad, inv8, axis=1,
                                mode="promise_in_bounds")
    return v_add, new_n.reshape(p_max, rung), new_t.reshape(
        p_max * s_len, rung)


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
                cfm_w, n_rhsT, t_rhsT, idx[k - 1:k], inv[k - 1:k], meta,
                p_max, s_len)
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
                    nump_ref[...], cfm_w, nrhs_ref[...], trhs_ref[...],
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
