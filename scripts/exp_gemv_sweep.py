"""GEMV block-size sweep (VERDICT r03 item 7).

gemv reads 648 GB/s = 79% of v5e HBM on the bench harness; the reference
ships 4 tuned pipelines with a documented WG-size tradeoff (gemv.wgsl:16).
Sweep the Pallas row-block (plain) / K-block (transposed) sizes on the
bench shape (4096x4096 f32, chained feedback) and report GB/s; adopt the
winner as the kernel default.

Run on the TPU:  python scripts/exp_gemv_sweep.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import importlib

import bench  # noqa: F401  (compile cache config)

# the package re-exports the gemv FUNCTION under the submodule's name
gemv_mod = importlib.import_module("wgmath_tpu.ops.gemv")

N = 4096


def time_variant(name, fn, a, x):
    """bench.abs_time sizes K so the ~30 ms tunnel latency amortizes to
    <4% (a fixed K=200 run measured 240 us/iter for a 100 us kernel —
    pure latency pollution)."""
    def make(k):
        @jax.jit
        def run(a, x):
            def body(i, v):
                return fn(a, v)
            return jax.lax.fori_loop(0, k, body, x)
        return run

    try:
        t = bench.abs_time(make, (a, x), k0=64)
    except Exception as e:  # Mosaic/VMEM rejects oversized blocks
        print(f"{name}: FAILED ({type(e).__name__}: {str(e)[:120]})",
              flush=True)
        return None
    gbs = (N * N + 2 * N) * 4 / t / 1e9
    print(f"{name}: {t*1e6:.1f} us/iter = {gbs:.0f} GB/s", flush=True)
    return gbs


def main():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(N, N)).astype(np.float32) / 64.0)
    x = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))

    print("== plain gemv (row blocks) ==")
    # scoped-VMEM limit is 16 MB: block x double-buffer caps bm*4096*4*2
    for bm in (128, 256, 384, 512):
        time_variant(f"pallas bm={bm}",
                     lambda A, v, bm=bm: gemv_mod._gemv_pallas(A, v, bm=bm),
                     a, x)
    time_variant("xla", lambda A, v: gemv_mod.gemv_xla(A, v), a, x)

    print("== transposed gemv (K blocks) ==")
    for bk in (128, 256, 384, 512):
        time_variant(f"pallas_tr bk={bk}",
                     lambda A, v, bk=bk: gemv_mod._gemv_tr_pallas(A, v, bk=bk),
                     a, x)
    time_variant("xla_tr", lambda A, v: gemv_mod.gemv_xla(A, v,
                                                          transpose_a=True),
                 a, x)


if __name__ == "__main__":
    main()
