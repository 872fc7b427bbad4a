"""Positively isolate narrow_phase + compact_contacts on device under the
bench rr config: capture real (poses, pairs) from one step trace, then
abs-time K chained calls consuming every output.

Run: python scripts/isolate_np.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

import bench  # noqa: E402
import dataclasses  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import wgmath_tpu.pipeline as pl  # noqa: E402
from wgmath_tpu.pipeline import step, step_checked  # noqa: E402


def main():
    state, params, steady_base, ladder = bench.physics_steady_setup()
    cfg = dataclasses.replace(ladder, gs_chained=True, gs_rhs_in_rung=True)
    for _ in range(6):
        state, cfg = step_checked(state, params, cfg)
    state = jax.block_until_ready(state)
    cfg = dataclasses.replace(cfg, bp_force="hit")

    real_np = pl.narrow_phase
    grabbed = {}

    def capturing_np(poses, shapes, pairs, pred, **kw):
        out = real_np(poses, shapes, pairs, pred, **kw)
        grabbed["args"] = (poses, pairs)
        grabbed["kw"] = kw
        grabbed["pred"] = pred
        return out

    def grab(s0):
        pl.narrow_phase = capturing_np
        try:
            step.__wrapped__(s0, params, cfg)
        finally:
            pl.narrow_phase = real_np
        return grabbed["args"]

    poses, pairs = jax.block_until_ready(jax.jit(grab)(state))
    kw = grabbed["kw"]
    pred = grabbed["pred"]
    shapes = state.shapes
    bench._log(f"captured pairs cap={pairs.body_a.shape[0]} kw={kw}")

    def time_phase(fn, label, K=200):
        @jax.jit
        def run_k(tr):
            def body(i, tr):
                p = dataclasses.replace(poses, translation=tr)
                out = fn(p)
                s = sum(jnp.sum(x) for x in jax.tree.leaves(out)
                        if jnp.issubdtype(x.dtype, jnp.floating))
                s = s + sum(jnp.sum(x) for x in jax.tree.leaves(out)
                            if jnp.issubdtype(x.dtype, jnp.integer)) * 1e-30
                return tr + s * 1e-30
            return jax.lax.fori_loop(0, K, body, poses.translation)

        jax.block_until_ready(run_k(poses.translation))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run_k(poses.translation))
            ts.append(time.perf_counter() - t0)
        ms = min(ts) / K * 1e3
        bench._log(f"{label}: {ms:.3f} ms")
        return ms

    time_phase(lambda p: real_np(p, shapes, pairs, pred, **kw), "np alone")

    from wgmath_tpu.dynamics.constraint import compact_contacts

    contacts0 = real_np(poses, shapes, pairs, pred, **kw)[0]
    colors0 = state.bp_colors[0] if state.bp_colors is not None else None
    bench._log(f"colors present: {colors0 is not None}")

    def np_compact(p):
        contacts, needed = real_np(p, shapes, pairs, pred, **kw)
        if colors0 is not None:
            return compact_contacts(contacts, cfg.contact_capacity,
                                    extra=colors0, sort_by_extra=True)
        return compact_contacts(contacts, cfg.contact_capacity)

    time_phase(np_compact, "np + color-major compaction")


if __name__ == "__main__":
    main()
