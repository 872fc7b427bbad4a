"""Does making the rung-ladder offsets STATIC kill the async-slice cost?

Round-4 device profile: the chained_ps solve shows ~14 async `slice-start`
gathers of the merged impulse matrix per step (~80-160 us each, ~2.1 ms
total) — dynamic_slice with a TRACED offset is a runtime-addressed DMA the
scheduler cannot fuse or prefetch statically. This microbench mimics the
ladder (13 rungs over a [38912, 24] impulse matrix + [38912, 66] field
matrix, 8 sweeps/step, feedback-chained K=50) with (a) traced offsets
(today's layout) vs (b) Python-int static offsets (the static rung-padded
layout the fused path already uses) and prints ms/step for both.

Run on the TPU: python scripts/exp_static_rungs.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import bench  # noqa: E402  (compile cache)

RUNGS = (4224, 4224, 4224, 4224, 4096, 3968, 3712, 3328, 2816, 2176,
         1408, 640, 128)
C = sum(RUNGS)  # 39168
SWEEPS = 8
K = 50


def make_run(static: bool):
    offs_np = np.concatenate([[0], np.cumsum(RUNGS)[:-1]]).astype(np.int32)

    @jax.jit
    def run(imp, pf, offs):
        def body(i, imp):
            for s in range(SWEEPS):
                for r, w in enumerate(RUNGS):
                    if static:
                        st = int(offs_np[r])
                        im = jax.lax.slice_in_dim(imp, st, st + w)
                        fl = jax.lax.slice_in_dim(pf, st, st + w)
                    else:
                        st = offs[r]
                        im = jax.lax.dynamic_slice_in_dim(imp, st, w)
                        fl = jax.lax.dynamic_slice_in_dim(pf, st, w)
                    # non-foldable per-sweep math (a linear per-rung scale
                    # collapses across sweeps: first attempt read 0.001 ms)
                    out = im + 1e-6 * fl[:, :24] / (1.0 + im * im)
                    if static:
                        imp = jax.lax.dynamic_update_slice_in_dim(
                            imp, out, int(offs_np[r]), 0)
                    else:
                        imp = jax.lax.dynamic_update_slice_in_dim(
                            imp, out, st, 0)
            return imp * (1.0 - 1e-15 * i)

        return jax.lax.fori_loop(0, K, body, imp)

    return run


def main():
    rng = np.random.default_rng(0)
    imp = jnp.asarray(rng.normal(size=(C, 24)).astype(np.float32))
    pf = jnp.asarray(rng.normal(size=(C, 66)).astype(np.float32))
    offs = jnp.asarray(
        np.concatenate([[0], np.cumsum(RUNGS)[:-1]]).astype(np.int32))
    for name, static in (("dynamic_offsets", False),
                         ("static_offsets", True)):
        f = make_run(static)
        bench._sync(f(imp, pf, offs))  # tunnel: block_until_ready lies
        ts = []
        for _ in range(3):
            t0 = time.time()
            bench._sync(f(imp, pf, offs))
            ts.append(time.time() - t0)
        print(f"{name}: {min(ts) / K * 1e3:.3f} ms/step "
              f"({SWEEPS}x{len(RUNGS)} rungs)", flush=True)


if __name__ == "__main__":
    main()
