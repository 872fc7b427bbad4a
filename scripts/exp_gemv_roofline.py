"""GEMV roofline diagnosis (VERDICT r04 item 7).

gemv4096 plateaus at 611-648 GB/s while the repo's own measured HBM
stream is ~914 GB/s effective (BENCH_NOTES axpy). Is the gap gemv-kernel
slack, or the row-reduction access pattern itself? Measure, on the SAME
absolute-K chained harness:

  - axpy        y := 1.0000001*y + c      (64 MB read + 64 MB write)
  - row-sum     s := Σ_k a[i,k]·c_j       (64 MB read, 16 KB write; the
                                           memory access pattern of gemv
                                           WITHOUT the x-vector multiply)
  - col-sum     s := Σ_i a[i,k]·c_j       (lane-major reduction)
  - gemv        pallas + xla              (the bench kernel)
  - gemv bf16   half traffic (not the bench contract; locates the
                              bandwidth-vs-latency split)

If row-sum ≈ gemv ≪ axpy, the plateau is the reduction pattern (every
f32 row must cross the VPU's 8x128 lanes and reduce 4096 lanes to 1);
write THAT down as the roofline. If row-sum ≈ axpy, the kernel has slack.

Run on the TPU: python scripts/exp_gemv_roofline.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import bench  # noqa: E402
import importlib

# the package re-exports the gemv FUNCTION under the submodule's name, so
# `import wgmath_tpu.ops.gemv as m` resolves to the function — go via importlib
gemv_mod = importlib.import_module('wgmath_tpu.ops.gemv')
from wgmath_tpu.ops.gemv import gemv_xla

N = 4096


def report(name, make, args, traffic_bytes, k0=64):
    try:
        t = bench.abs_time(make, args, k0=k0)
    except Exception as e:
        print(f"{name:24s} FAILED {type(e).__name__}: {str(e)[:120]}",
              flush=True)
        return
    print(f"{name:24s} {t * 1e6:8.1f} us/iter  "
          f"{traffic_bytes / t / 1e9:7.1f} GB/s", flush=True)


def main():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(N, N)).astype(np.float32) / 64.0)
    x = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))
    ab = a.astype(jnp.bfloat16)
    xb = x.astype(jnp.bfloat16)

    def make_axpy(k):
        @jax.jit
        def f(y):
            def body(i, y):
                return y * 1.0000001 + 1e-30
            return jax.lax.fori_loop(0, k, body, y)
        return f

    report("axpy (r+w stream)", make_axpy, (a,), 2 * N * N * 4)

    def make_rowsum(k):
        @jax.jit
        def f(a, s):
            def body(i, s):
                return jnp.sum(a * (1.0 + 1e-30 * s[0]), axis=1)
            return jax.lax.fori_loop(0, k, body, s)
        return f

    report("row-sum (gemv pattern)", make_rowsum, (a, x), N * N * 4)

    def make_colsum(k):
        @jax.jit
        def f(a, s):
            def body(i, s):
                return jnp.sum(a * (1.0 + 1e-30 * s[0]), axis=0)
            return jax.lax.fori_loop(0, k, body, s)
        return f

    report("col-sum", make_colsum, (a, x), N * N * 4)

    def make_gemv(impl):
        def mk(k):
            @jax.jit
            def f(a, v):
                def body(i, v):
                    return gemv_mod.gemv(a, v, impl=impl)
                return jax.lax.fori_loop(0, k, body, v)
            return f
        return mk

    report("gemv pallas", make_gemv("pallas"), (a, x), (N * N + 2 * N) * 4)
    report("gemv xla", make_gemv("xla"), (a, x), (N * N + 2 * N) * 4)

    def make_gemv_bf16(k):
        @jax.jit
        def f(a, v):
            def body(i, v):
                return gemv_xla(a, v).astype(jnp.bfloat16)
            return jax.lax.fori_loop(0, k, body, v)
        return f

    report("gemv bf16 xla", make_gemv_bf16, (ab, xb),
           (N * N + 2 * N) * 2)

    # matrix-matrix with a thin rhs: 8 columns amortize the reduction tail
    # over 8x the useful work at the same matrix traffic
    x8 = jnp.asarray(rng.normal(size=(N, 8)).astype(np.float32))

    def make_thin(k):
        @jax.jit
        def f(a, v):
            def body(i, v):
                return jnp.matmul(a, v, precision="highest")
            return jax.lax.fori_loop(0, k, body, v)
        return f

    report("a @ [4096,8] thin", make_thin, (a, x8), N * N * 4)

    # --- VMEM-residency control: 8192^2 f32 = 256 MB cannot sit in the
    # 128 MB VMEM, so this is an honest HBM read no matter what XLA
    # allocates. If it matches the 4096^2 row-sum rate, the 4096 numbers
    # above were HBM-bound too (only the axpy CARRY was VMEM-resident).
    N2 = 8192
    a2 = jnp.asarray(rng.normal(size=(N2, N2)).astype(np.float32) / 64.0)
    s2 = jnp.zeros((N2,), jnp.float32)
    report("row-sum 8192 (256MB)", make_rowsum, (a2, s2), N2 * N2 * 4)

    def make_gemv2(k):
        @jax.jit
        def f(a, v):
            def body(i, v):
                return gemv_mod.gemv(a, v)
            return jax.lax.fori_loop(0, k, body, v)
        return f

    report("gemv 8192 (256MB)", make_gemv2,
           (a2, jnp.ones((N2,), jnp.float32)), N2 * N2 * 4)

    # --- max-stream probe: Pallas kernel that READS [block, N] tiles
    # double-buffered and does only lane-wise vector adds (no cross-lane
    # reduce, no rhs multiply) — the fastest a kernel can possibly
    # traverse the matrix. If THIS plateaus at the row-sum rate, ~620 GB/s
    # IS the chip's effective sequential-read ceiling and gemv is at its
    # roofline; if it streams faster, gemv has kernel slack.
    from jax.experimental import pallas as pl

    def tile_sum_kernel(s_ref, a_ref, o_ref):
        # chain rides the tiny s operand so `a` stays untouched (scaling
        # `a` outside the pallas_call would materialize a 64 MB temp —
        # XLA cannot fuse elementwise producers into a custom call)
        blk = a_ref[...]  # [B, N] tile
        part = jnp.sum(blk.reshape(8, -1, 128), axis=1)
        i = pl.program_id(0)
        prev = jnp.where(i == 0, 1e-30 * s_ref[...], o_ref[...])
        o_ref[...] = prev + part  # accumulate: no grid step is dead

    def make_tile_sum(block):
        def mk(k):
            def one(a, s):
                g = N // block
                return pl.pallas_call(
                    tile_sum_kernel,
                    grid=(g,),
                    in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0)),
                              pl.BlockSpec((block, N),
                                           lambda i: (i, 0))],
                    out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0)),
                    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                )(s, a)

            @jax.jit
            def f(a, s):
                def body(i, s):
                    return one(a, s)
                return jax.lax.fori_loop(0, k, body, s)
            return f
        return mk

    # b512+ needs >16 MB of double-buffered scoped VMEM — remote compile
    # rejects it; 128/256 fit
    for blk in (128, 256):
        report(f"pallas tile-sum b{blk}", make_tile_sum(blk),
               (a, jnp.zeros((8, 128), jnp.float32)), N * N * 4)


if __name__ == "__main__":
    main()
