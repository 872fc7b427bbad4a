"""Microbenchmark: in-kernel gather strategies for the fused Pallas TGS sweep.

The GS color sweep needs, per color window, v[ba] and v[bb] gathers from a
[N≈14k, 8] f32 velocity array plus unique-index scatter-adds back. This
measures the candidate Pallas implementations against the XLA baseline:

  1. xla-gather / xla-scatter-add      (the current sweep's primitive)
  2. pallas ref[idx] fancy gather      (does Mosaic even lower it? how fast?)
  3. pallas one-hot local-chunk gather (window sorted by body: each
     128-constraint tile spans a small body range; DMA the range, build the
     one-hot tile from an iota compare, gather = MXU matmul)

Run: python scripts/bench_pallas_gather.py
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

N = 14464  # bodies + trash rows
M = 4096   # color-window size
W = 8      # packed velocity row width


def xla_baseline(src, idx, uidx, d):
    def make_gather(k):
        @jax.jit
        def f(src, idx):
            def body(i, acc):
                g = src[(idx + i) % N]
                return acc + jnp.sum(g) * 1e-9
            return jax.lax.fori_loop(0, k, body, 0.0)
        return f

    t = bench.slope_time(make_gather, (src, idx), k_small=10, k_large=50,
                         reps=2)
    bench._log(f"xla gather:        {t*1e6:8.1f} us  {M/t/1e6:7.1f} Mrow/s")

    def make_scatter(k):
        @jax.jit
        def f(src, uidx, d):
            def body(i, s):
                return s.at[uidx].add(d + i * 0.0, mode="promise_in_bounds",
                                      unique_indices=True)
            s = jax.lax.fori_loop(0, k, body, src)
            return jnp.sum(s) * 1e-9
        return f

    t = bench.slope_time(make_scatter, (src, uidx, d), k_small=10,
                         k_large=50, reps=2)
    bench._log(f"xla scatter-add:   {t*1e6:8.1f} us  {M/t/1e6:7.1f} Mrow/s")


def pallas_fancy(src, idx):
    def kernel(src_ref, idx_ref, out_ref):
        out_ref[:] = src_ref[idx_ref[:], :]

    @jax.jit
    def f(src, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, W), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(src, idx)

    try:
        out = jax.block_until_ready(f(src, idx))
        ok = np.allclose(np.asarray(out), np.asarray(src)[np.asarray(idx)])
        bench._log(f"pallas ref[idx] gather compiles; correct={ok}")
    except Exception as e:  # noqa: BLE001
        bench._log(f"pallas ref[idx] gather FAILED: {type(e).__name__}: "
                   f"{str(e).splitlines()[0][:160]}")
        return

    def make(k):
        @jax.jit
        def g(src, idx):
            def body(i, acc):
                o = f(src, (idx + i) % N)
                return acc + jnp.sum(o) * 1e-9
            return jax.lax.fori_loop(0, k, body, 0.0)
        return g

    t = bench.slope_time(make, (src, idx), k_small=10, k_large=50, reps=2)
    bench._log(f"pallas ref[idx]:   {t*1e6:8.1f} us  {M/t/1e6:7.1f} Mrow/s")


def pallas_onehot_chunk(src, idx_sorted):
    """Window sorted by body id; tile t covers bodies
    [lo_t, lo_t + CHUNK). Gather = one-hot [128, CHUNK] @ chunk [CHUNK, W].
    lo_t passed via scalar prefetch (computed on host/XLA side)."""
    TILE = 128
    CHUNK = 1024  # must cover max body-range of any 128-constraint tile
    n_tiles = M // TILE

    def kernel(lo_ref, idx_ref, src_ref, out_ref):
        t = pl.program_id(0)
        lo = lo_ref[t]
        rows = idx_ref[pl.ds(t * TILE, TILE)]  # [TILE] i32 (sorted)
        chunk = src_ref[pl.ds(lo, CHUNK), :]   # [CHUNK, W]
        local = rows - lo                       # in [0, CHUNK)
        onehot = (local[:, None]
                  == jax.lax.broadcasted_iota(jnp.int32, (TILE, CHUNK), 1)
                  ).astype(jnp.float32)
        out_ref[pl.ds(t * TILE, TILE), :] = jax.lax.dot_general(
            onehot, chunk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @jax.jit
    def f(lo, idx, src):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, W), jnp.float32),
            grid_spec=grid_spec,
        )(lo, idx, src)

    idx_np = np.asarray(idx_sorted)
    lo = np.minimum(idx_np.reshape(n_tiles, TILE)[:, 0],
                    N - CHUNK).astype(np.int32)
    lo = (lo // 8) * 8  # sublane-aligned dynamic slice for Mosaic
    span = idx_np.reshape(n_tiles, TILE)[:, -1] - lo
    bench._log(f"one-hot chunk: max tile body-span = {int(span.max())} "
               f"(CHUNK={CHUNK})")
    if int(span.max()) >= CHUNK:
        bench._log("one-hot chunk: span exceeds CHUNK on this data; skipping")
        return
    lo_j = jnp.asarray(lo)

    try:
        out = jax.block_until_ready(f(lo_j, idx_sorted, src))
        ok = np.allclose(np.asarray(out), np.asarray(src)[idx_np])
        bench._log(f"pallas one-hot chunk compiles; correct={ok}")
    except Exception as e:  # noqa: BLE001
        bench._log(f"pallas one-hot chunk FAILED: {type(e).__name__}: "
                   f"{str(e).splitlines()[0][:160]}")
        return

    def make(k):
        @jax.jit
        def g(lo, idx, src):
            def body(i, acc):
                o = f(lo, idx, src + acc * 1e-30)
                return acc + jnp.sum(o) * 1e-9
            return jax.lax.fori_loop(0, k, body, 0.0)
        return g

    t = bench.slope_time(make, (lo_j, idx_sorted, src), k_small=10,
                         k_large=50, reps=2)
    bench._log(f"pallas one-hot:    {t*1e6:8.1f} us  {M/t/1e6:7.1f} Mrow/s")


def main():
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(N, W)).astype(np.float32))
    # window indices: an independent set = unique bodies, roughly uniform
    idx_np = rng.permutation(N - 4096)[:M].astype(np.int32)
    idx = jnp.asarray(idx_np)
    idx_sorted = jnp.asarray(np.sort(idx_np))
    uidx = jnp.asarray(rng.permutation(N)[:M].astype(np.int32))
    d = jnp.asarray(rng.normal(size=(M, W)).astype(np.float32))

    xla_baseline(src, idx, uidx, d)
    pallas_fancy(src, idx)
    pallas_onehot_chunk(src, idx_sorted)


if __name__ == "__main__":
    main()
