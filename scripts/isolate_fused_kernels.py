"""Isolate which fused Pallas kernel mis-computes on real TPU.

The all-XLA fused path is exact vs the ladder on device, but the same
step with the Pallas builder + integrate kernels diverges wildly
(validate_fused_tpu, 2026-08-18). Compare each kernel against its own
XLA twin on random inputs, on whatever backend jax selects.

Run: python scripts/isolate_fused_kernels.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (compile cache + logging)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from wgmath_tpu.dynamics.build_pallas import (  # noqa: E402
    CHUNK,
    _SIDE_OFFS,
    _W_SIDE,
    _build_pallas_call,
    _cm_build,
    field_meta,
)
from wgmath_tpu.dynamics.gs_fused import (  # noqa: E402
    _cm_integrate,
    fused_integrate,
)


def check_integrate():
    rng = np.random.default_rng(0)
    L = 640
    q = rng.normal(size=(4, L)).astype(np.float32)
    q /= np.linalg.norm(q, axis=0, keepdims=True)
    poseP = np.concatenate([q, rng.normal(size=(3, L)).astype(np.float32),
                            np.ones((1, L), np.float32)])
    vt = np.concatenate([rng.normal(size=(6, L)).astype(np.float32),
                         np.zeros((2, L), np.float32)])
    comT = rng.normal(size=(3, L)).astype(np.float32) * 0.1
    a = jax.jit(lambda p, v, c: fused_integrate(p, v, c, 1 / 240.0,
                                                use_pallas=True))(
        jnp.asarray(poseP), jnp.asarray(vt), jnp.asarray(comT))
    b = jax.jit(lambda p, v, c: _cm_integrate(p, v, c, 1 / 240.0))(
        jnp.asarray(poseP), jnp.asarray(vt), jnp.asarray(comT))
    d = np.abs(np.asarray(a) - np.asarray(b)).max()
    bench._log(f"integrate pallas-vs-xla max|d| = {d:.3e}")
    return d


def check_builder(p_max=1, s_len=2, c=1024):
    rng = np.random.default_rng(1)
    meta, k_all = field_meta(p_max, s_len)
    aT = rng.normal(size=(_W_SIDE, c)).astype(np.float32)
    bT = rng.normal(size=(_W_SIDE, c)).astype(np.float32)
    for t in (aT, bT):
        t[0:4] /= np.linalg.norm(t[0:4], axis=0, keepdims=True)  # quat
        t[7:8] = 1.0  # scale
        t[14:17] = np.abs(t[14:17])  # inv mass
    nT = rng.normal(size=(3, c)).astype(np.float32)
    nT /= np.linalg.norm(nT, axis=0, keepdims=True)
    ptsT = rng.normal(size=(3 * p_max, c)).astype(np.float32)
    distT = rng.normal(size=(p_max, c)).astype(np.float32) * 0.01
    consts = (0.0, 240.0, 0.5, 1.0)
    meta_t = tuple(sorted((k, (a0, tuple(t0))) for k, (a0, t0)
                          in meta.items()))
    args = tuple(jnp.asarray(x) for x in (aT, bT, nT, ptsT, distT))
    a = jax.jit(lambda *xs: _build_pallas_call(
        *xs, p_max=p_max, s_len=s_len, consts=consts, meta_t=meta_t,
        k_all=k_all))(*args)
    b = jax.jit(lambda *xs: _cm_build(
        xs[0], xs[1], _SIDE_OFFS, xs[2], xs[3], xs[4], p_max=p_max,
        s_len=s_len, restitution=consts[0], inv_dt=consts[1],
        friction=consts[2], cfm_factor=consts[3], meta=meta,
        k_all=k_all))(*args)
    an, bn = np.asarray(a), np.asarray(b)
    d = np.abs(an - bn)
    rel = d / (np.abs(bn) + 1.0)
    bench._log(f"builder p_max={p_max} pallas-vs-xla max|d| = {d.max():.3e} "
               f"rel = {rel.max():.3e}")
    if rel.max() > 1e-3:
        bad = np.argwhere(rel > 1e-3)
        rows = sorted(set(bad[:, 0].tolist()))
        names = {a0: f for f, (a0, t0) in meta.items()}
        starts = sorted(names)
        def row_field(r):
            lo = [s for s in starts if s <= r]
            return names[lo[-1]] if lo else "?"
        bench._log(f"  bad rows: {rows[:20]} -> fields "
                   f"{sorted(set(row_field(r) for r in rows))}")
    return rel.max()


def check_copy(c=2048, p_max=1, s_len=2):
    """Identity kernel through the builder's exact BlockSpecs: if THIS is
    wrong on device, the miscompute is pure Mosaic layout (unaligned row
    counts), not the _cm_build math."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from wgmath_tpu.core.dispatch import pallas_interpret

    meta, k_all = field_meta(p_max, s_len)
    rng = np.random.default_rng(2)
    shapes = [(_W_SIDE, c), (_W_SIDE, c), (3, c), (3 * p_max, c),
              (p_max, c)]
    args = [rng.normal(size=s).astype(np.float32) for s in shapes]
    rows_in = sum(s[0] for s in shapes)
    assert rows_in <= k_all

    def kernel(a_ref, b_ref, n_ref, p_ref, d_ref, out_ref):
        cat = jnp.concatenate([a_ref[...], b_ref[...], n_ref[...],
                               p_ref[...], d_ref[...]], axis=0)
        pad = jnp.zeros((k_all - rows_in, cat.shape[1]), jnp.float32)
        out_ref[...] = jnp.concatenate([cat, pad], axis=0)

    lane_spec = lambda rows: pl.BlockSpec(
        (rows, CHUNK), lambda i: (0, i), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(-(-c // CHUNK),),
        in_specs=[lane_spec(_W_SIDE), lane_spec(_W_SIDE), lane_spec(3),
                  lane_spec(3 * p_max), lane_spec(p_max)],
        out_specs=lane_spec(k_all),
        out_shape=jax.ShapeDtypeStruct((k_all, c), jnp.float32),
        interpret=pallas_interpret(),
    )(*[jnp.asarray(x) for x in args])
    want = np.concatenate(args + [np.zeros((k_all - rows_in, c),
                                           np.float32)], axis=0)
    d = np.abs(np.asarray(out) - want).max()
    bench._log(f"copy-kernel c={c} pallas-vs-host max|d| = {d:.3e}")
    return d


def main():
    bench._log(f"backend: {jax.devices()}")
    check_integrate()
    # c=1024 < CHUNK: the original repro (block overhangs the array);
    # c=2048/4096: production-shaped widths (contact caps are multiples
    # of 2048) — separates a test artifact from a real kernel bug
    check_builder(p_max=1, c=1024)
    check_builder(p_max=1, c=2048)
    check_builder(p_max=4, c=4096)
    check_copy(c=2048)
    check_copy(c=1024)


if __name__ == "__main__":
    main()
