"""Probe: does Mosaic's tpu.dynamic_gather (jnp.take_along_axis inside a
Pallas TPU kernel) compile and run fast at body-table sizes?  If yes, the
GS sweep's per-color XLA gather (135 Mrow/s) and scatter-add (49 Mrow/s)
can both become in-kernel gathers (scatter via the per-frame-cached
INVERSE permutation — same-color constraints touch disjoint bodies, so the
color's scatter is a masked permutation), unlocking a single fused sweep
kernel with VMEM-resident velocities.

Also times, in plain XLA, the inverse-permutation gather-add vs the
scatter-add it would replace (a win available without Pallas).

Run on real TPU: python scripts/exp_dyngather.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (sets up compile cache + axon platform)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402


N = 14464   # padded body count of the 10k bench
K = 200     # chained iterations inside one jit


def time_k(fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / K * 1e6, out  # us per iteration


def main():
    rng = np.random.default_rng(0)
    perm = rng.permutation(N).astype(np.int32)

    # ---------------- Pallas lane-dim gather: table [8, N] ----------------
    tab_cm = jnp.asarray(rng.standard_normal((8, N)), jnp.float32)
    idx_cm = jnp.asarray(np.broadcast_to(perm, (8, N)).copy())

    def k_lane(tab_ref, idx_ref, out_ref):
        out_ref[...] = jnp.take_along_axis(
            tab_ref[...], idx_ref[...], axis=1, mode="promise_in_bounds")

    lane_call = pl.pallas_call(
        k_lane,
        out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
    )

    @jax.jit
    def run_lane(tab, idx):
        def body(i, t):
            return lane_call(t, idx)

        return jax.lax.fori_loop(0, K, body, tab)

    try:
        us, out = time_k(run_lane, tab_cm, idx_cm)
        ref = tab_cm
        for _ in range(4):
            ref = jnp.take_along_axis(ref, idx_cm, axis=1)
        # correctness on a short chain
        got = tab_cm
        for _ in range(4):
            got = lane_call(got, idx_cm)
        ok = bool(jnp.allclose(got, ref))
        bench._log(f"pallas lane-gather [8,{N}]: {us:.1f} us/iter ok={ok}")
    except Exception as e:  # noqa: BLE001
        bench._log(f"pallas lane-gather FAILED: {type(e).__name__}: "
                   f"{str(e)[:300]}")

    # ---------------- Pallas sublane-dim gather: table [N, 128] -----------
    tab_rm = jnp.asarray(rng.standard_normal((N, 128)), jnp.float32)
    idx_rm = jnp.asarray(np.broadcast_to(perm[:, None], (N, 128)).copy())

    def k_sub(tab_ref, idx_ref, out_ref):
        out_ref[...] = jnp.take_along_axis(
            tab_ref[...], idx_ref[...], axis=0, mode="promise_in_bounds")

    sub_call = pl.pallas_call(
        k_sub,
        out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
    )

    @jax.jit
    def run_sub(tab, idx):
        def body(i, t):
            return sub_call(t, idx)

        return jax.lax.fori_loop(0, K, body, tab)

    try:
        us, out = time_k(run_sub, tab_rm, idx_rm)
        got = sub_call(tab_rm, idx_rm)
        ref = jnp.take_along_axis(tab_rm, idx_rm, axis=0)
        ok = bool(jnp.allclose(got, ref))
        bench._log(f"pallas sublane-gather [{N},128]: {us:.1f} us/iter "
                   f"ok={ok}")
    except Exception as e:  # noqa: BLE001
        bench._log(f"pallas sublane-gather FAILED: {type(e).__name__}: "
                   f"{str(e)[:300]}")

    # -------- XLA baselines at sweep shapes: [N, 8] row ops ---------------
    W = 4096  # head-color window rows (one side merged: 2W gathered rows)
    tab8 = jnp.asarray(rng.standard_normal((N + 2 * W, 8)), jnp.float32)
    sel = jnp.asarray(rng.choice(N, size=2 * W, replace=False).astype(np.int32))
    d12 = jnp.asarray(rng.standard_normal((2 * W, 8)), jnp.float32)
    # inverse permutation table: body row -> delta row (or trash 2W slot)
    inv = np.full(N + 2 * W, 2 * W, np.int32)
    inv[np.asarray(sel)] = np.arange(2 * W, dtype=np.int32)
    inv = jnp.asarray(inv)
    d_pad = jnp.concatenate([d12, jnp.zeros((1, 8), jnp.float32)])

    @jax.jit
    def run_scatter(tab):
        def body(i, t):
            d = d12 * (1.0 + t[0, 0] * 1e-30)
            return t.at[sel].add(d, mode="promise_in_bounds",
                                 unique_indices=True)

        return jax.lax.fori_loop(0, K, body, tab)

    us, _ = time_k(run_scatter, tab8)
    bench._log(f"xla scatter-add {2*W} rows into [{N}+,8]: {us:.1f} us/iter")

    @jax.jit
    def run_invgather(tab):
        def body(i, t):
            d = d_pad * (1.0 + t[0, 0] * 1e-30)
            return t + d[inv]

        return jax.lax.fori_loop(0, K, body, tab)

    us, _ = time_k(run_invgather, tab8)
    bench._log(f"xla inverse-gather-add [{N}+,8] (replaces the scatter): "
               f"{us:.1f} us/iter")

    @jax.jit
    def run_gather(tab):
        def body(i, t):
            g = t[sel]
            return t.at[:1].add(jnp.sum(g) * 1e-30)

        return jax.lax.fori_loop(0, K, body, tab)

    us, _ = time_k(run_gather, tab8)
    bench._log(f"xla gather {2*W} rows from [{N}+,8]: {us:.1f} us/iter")


if __name__ == "__main__":
    main()
