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

import bench  # noqa: F401  (compile cache config)
from wgmath_tpu.ops import gemv as gemv_mod

N = 4096
K_ITERS = 200


def time_variant(name, fn, a, x):
    @jax.jit
    def run(a, x):
        def body(i, v):
            return fn(a, v)
        return jax.lax.fori_loop(0, K_ITERS, body, x)

    out = jax.block_until_ready(run(a, x))
    if not bool(jnp.all(jnp.isfinite(out))):
        print(f"{name}: NON-FINITE, skipped")
        return
    ts = []
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(run(a, x))
        ts.append(time.time() - t0)
    t = min(ts) / K_ITERS
    gbs = (N * N + 2 * N) * 4 / t / 1e9
    print(f"{name}: {t*1e6:.1f} us/iter = {gbs:.0f} GB/s", flush=True)
    return gbs


def main():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(N, N)).astype(np.float32) / 64.0)
    x = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))

    print("== plain gemv (row blocks) ==")
    for bm in (128, 256, 512, 1024, 2048):
        time_variant(f"pallas bm={bm}",
                     lambda A, v, bm=bm: gemv_mod._gemv_pallas(A, v, bm=bm),
                     a, x)
    time_variant("xla", lambda A, v: gemv_mod.gemv_xla(A, v), a, x)

    print("== transposed gemv (K blocks) ==")
    for bk in (128, 256, 512, 1024, 2048):
        time_variant(f"pallas_tr bk={bk}",
                     lambda A, v, bk=bk: gemv_mod._gemv_tr_pallas(A, v, bk=bk),
                     a, x)
    time_variant("xla_tr", lambda A, v: gemv_mod.gemv_xla(A, v,
                                                          transpose_a=True),
                 a, x)


if __name__ == "__main__":
    main()
