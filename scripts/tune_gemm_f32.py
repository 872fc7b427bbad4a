"""Retune the f32 Pallas GEMM tile for >= 30 TF at 4096^2 f32-highest under
COLD-cache AOT compiles (VERDICT r2 weak #4: the (512,1024,256) tile reads
28.9-29.1 TF; r01's (512,1024,512) hit 31.8-32.2 but overflows scoped VMEM
on fresh AOT compiles).

Each candidate compiles into its OWN throwaway compile-cache dir so a fresh
AOT compile is exercised (the driver's environment), then is timed with the
absolute-K method. Run: python scripts/tune_gemm_f32.py
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import math  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import importlib  # noqa: E402

# ops/__init__ re-exports the gemm FUNCTION under the submodule's name;
# go through sys.modules for the module itself
gemm_mod = importlib.import_module("wgmath_tpu.ops.gemm")

CANDIDATES = [
    (512, 512, 512),    # round-3 best so far (29.1)
    (512, 1024, 512),   # r01 peak — retry: the 13:42 failure may be a
                        # transient tunnel HTTP 500, VMEM is only ~8 MB now
    (1024, 1024, 512),  # big out block (4 MB resident), ~12 MB total
    (1024, 512, 512),
    (2048, 512, 256),
    (512, 1024, 256),   # previous default (baseline)
]

N = 4096


def time_tile(bm, bn, bk):
    a = jnp.asarray(np.random.default_rng(0).normal(
        size=(N, N)).astype(np.float32))
    b = jnp.asarray(np.random.default_rng(1).normal(
        size=(N, N)).astype(np.float32) / math.sqrt(N))

    def make(k):
        @jax.jit
        def f(a, b):
            def body(i, c):
                return gemm_mod._gemm_pallas(
                    c, b, False, False, bm, bn, bk,
                    jax.lax.Precision.HIGHEST)
            return jax.lax.fori_loop(0, k, body, a)
        return f

    # correctness gate vs the XLA twin (Mosaic can compile-and-miscompute:
    # BENCH_NOTES round-2 finding) before any timing
    got = jax.jit(lambda a, b: gemm_mod._gemm_pallas(
        a, b, False, False, bm, bn, bk, jax.lax.Precision.HIGHEST))(a, b)
    want = gemm_mod.gemm_xla(a, b, precision=jax.lax.Precision.HIGHEST)
    err = float(jnp.max(jnp.abs(got - want)) / jnp.max(jnp.abs(want)))
    assert err < 1e-4, f"pallas gemm diverges from XLA: rel {err:.3g}"

    t = bench.abs_time(make, (a, b), k0=8)
    return 2 * N**3 / t / 1e12


def time_xla():
    a = jnp.asarray(np.random.default_rng(0).normal(
        size=(N, N)).astype(np.float32))
    b = jnp.asarray(np.random.default_rng(1).normal(
        size=(N, N)).astype(np.float32) / math.sqrt(N))

    def make(k):
        @jax.jit
        def f(a, b):
            def body(i, c):
                return gemm_mod.gemm_xla(c, b,
                                         precision=jax.lax.Precision.HIGHEST)
            return jax.lax.fori_loop(0, k, body, a)
        return f

    t = bench.abs_time(make, (a, b), k0=8)
    return 2 * N**3 / t / 1e12


def main():
    results = {}
    try:
        tf = time_xla()
        results["xla"] = tf
        bench._log(f"xla highest: {tf:.1f} TF")
    except Exception as e:  # noqa: BLE001
        bench._log(f"xla highest: FAILED {type(e).__name__}: {str(e)[:200]}")
    for bm, bn, bk in CANDIDATES:
        if N % bm or N % bn or N % bk:
            continue
        # throwaway cache dir => every candidate pays a genuine cold AOT
        # compile, catching scoped-VMEM overflows the warm cache would hide
        cache = tempfile.mkdtemp(prefix="jaxcache_tune_")
        jax.config.update("jax_compilation_cache_dir", cache)
        try:
            t0 = time.time()
            tf = time_tile(bm, bn, bk)
            results[(bm, bn, bk)] = tf
            bench._log(f"tile ({bm},{bn},{bk}): {tf:.1f} TF "
                       f"(wall {time.time()-t0:.0f}s)")
        except Exception as e:  # noqa: BLE001 - report and move on
            bench._log(f"tile ({bm},{bn},{bk}): FAILED "
                       f"{type(e).__name__}: {str(e)[:2000]}")
    best = max(results.items(), key=lambda kv: kv[1], default=None)
    bench._log(f"best: {best}")


if __name__ == "__main__":
    main()
