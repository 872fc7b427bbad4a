"""Microbenchmark: TPU gather / unique-scatter-add rates vs row width.

The GS color sweep is bound by velocity gathers + scatter-adds
([cmax≈4096] random rows of a [N≈10k, W] array, ~56 color iterations per
step). This measures XLA's achievable row rate as a function of row width W
and N, plus a one-hot-matmul gather for comparison — the data that decides
whether the fused Pallas sweep should re-layout velocities.

Run: python scripts/bench_gather.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    n, m = 10368, 4096

    for w in (8, 16, 32, 64, 128):
        src = jnp.asarray(rng.normal(size=(n, w)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, n, size=(m,)).astype(np.int32))
        # unique scatter indices: a random permutation slice
        uidx = jnp.asarray(
            rng.permutation(n)[:m].astype(np.int32))
        d = jnp.asarray(rng.normal(size=(m, w)).astype(np.float32))

        def make_gather(k):
            @jax.jit
            def f(src, idx):
                def body(i, acc):
                    g = src[(idx + i) % n]
                    return acc + jnp.sum(g) * 1e-9
                return jax.lax.fori_loop(0, k, body, 0.0)
            return f

        t = bench.slope_time(make_gather, (src, idx), k_small=10,
                             k_large=50, reps=2)
        bench._log(f"gather  w={w:4d}: {t*1e6:8.1f} us  "
                   f"{m/t/1e6:8.1f} Mrow/s  {m*w*4/t/1e9:6.1f} GB/s")

        def make_scatter(k):
            @jax.jit
            def f(src, uidx, d):
                def body(i, s):
                    s = s.at[uidx].add(d + i * 0.0, mode="promise_in_bounds",
                                       unique_indices=True)
                    return s
                s = jax.lax.fori_loop(0, k, body, src)
                return jnp.sum(s) * 1e-9
            return f

        t = bench.slope_time(make_scatter, (src, uidx, d), k_small=10,
                             k_large=50, reps=2)
        bench._log(f"scatter w={w:4d}: {t*1e6:8.1f} us  "
                   f"{m/t/1e6:8.1f} Mrow/s  {m*w*4/t/1e9:6.1f} GB/s")

    # one-hot matmul gather (MXU): out = onehot(idx) @ src, w=8 padded to 128
    src8 = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, size=(m,)).astype(np.int32))

    def make_onehot(k):
        @jax.jit
        def f(src, idx):
            def body(i, acc):
                oh = jax.nn.one_hot(idx + (i % 2), n, dtype=jnp.bfloat16)
                g = jnp.dot(oh, src.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
                return acc + jnp.sum(g) * 1e-9
            return jax.lax.fori_loop(0, k, body, 0.0)
        return f

    t = bench.slope_time(make_onehot, (src8, idx), k_small=2, k_large=10,
                         reps=2)
    bench._log(f"onehot-matmul gather (w=8): {t*1e6:8.1f} us  "
               f"{m/t/1e6:8.1f} Mrow/s")

    # take-along-axis gather through a [N,8] -> [N/16,128] packed layout:
    # row r of the packed array holds bodies 16r..16r+15; body i lives at
    # (i//16, (i%16)*8 + lane). Gathers touch 128-wide rows (full lanes).
    packed = src8.reshape(n // 16, 128)
    def make_packed_gather(k):
        @jax.jit
        def f(packed, idx):
            def body(i, acc):
                ii = (idx + i) % n
                rows = packed[ii // 16]  # [m, 128]
                lane0 = (ii % 16) * 8
                lanes = lane0[:, None] + jnp.arange(8)[None, :]
                g = jnp.take_along_axis(rows, lanes, axis=1)
                return acc + jnp.sum(g) * 1e-9
            return jax.lax.fori_loop(0, k, body, 0.0)
        return f

    t = bench.slope_time(make_packed_gather, (packed, idx), k_small=10,
                         k_large=50, reps=2)
    bench._log(f"packed [N/16,128] gather+lane-select (w=8): {t*1e6:8.1f} us  "
               f"{m/t/1e6:8.1f} Mrow/s")


if __name__ == "__main__":
    main()
