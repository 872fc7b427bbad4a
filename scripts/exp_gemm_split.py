"""GEMM f32 experiment: pre-split bf16 multi-pass vs in-kernel highest.

VERDICT r04 item 1: (a) run the bf16x3 split-accumulation experiment and
measure accuracy against the reference's own 1e-3 golden tolerance
(/root/reference/crates/wgebra/src/linalg/gemm.rs:199-202); (b) sweep the
6-pass path's remaining ~10% (the bf16 kernel sustains 99.8% MXU, so the
6-pass overhead must be schedulable — hypothesis: XLA re-splits the f32
tiles into bf16 planes inside the k-loop; pre-splitting once in HBM
leaves pure MXU passes).

Run on the TPU (one measurement process at a time):
    python scripts/exp_gemm_split.py [n]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import bench  # noqa: E402  (compile cache + map-limit setup)
from wgmath_tpu.ops.gemm import gemm, gemm_split, gemm_xla


def err_stats(out, ref64):
    """(max_rel, golden_ok): golden_ok applies the reference's own
    criterion — approx::assert_relative_eq(eps=1e-3) passes an entry when
    |d| <= eps (absolute branch, catches cancellation-heavy near-zero
    entries) OR |d| <= eps*max(|a|,|b|) (gemm.rs:199-202)."""
    out = np.asarray(out, np.float64)
    d = np.abs(out - ref64)
    rel = d / np.maximum(np.abs(ref64), 1e-30)
    eps = 1e-3
    ok = np.all((d <= eps) | (d <= eps * np.maximum(np.abs(out),
                                                    np.abs(ref64))))
    return float(rel.max()), bool(ok), float(np.percentile(rel, 99.9))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    rng = np.random.default_rng(0)
    a_h = rng.normal(size=(n, n)).astype(np.float32)
    b_h = (rng.normal(size=(n, n)) / np.sqrt(n)).astype(np.float32)
    a = jnp.asarray(a_h)
    b = jnp.asarray(b_h)
    print("computing f64 reference on host...", flush=True)
    ref64 = a_h.astype(np.float64) @ b_h.astype(np.float64)

    cands = {
        "pallas_highest_inkernel": lambda aa, bb: gemm(
            aa, bb, impl="pallas", precision="highest"),
        "pallas_high_inkernel": lambda aa, bb: gemm(
            aa, bb, impl="pallas", precision="high"),
        "presplit6": lambda aa, bb: gemm_split(aa, bb, n_passes=6),
        "presplit3": lambda aa, bb: gemm_split(aa, bb, n_passes=3),
        "xla_highest": lambda aa, bb: gemm_xla(aa, bb,
                                               precision="highest"),
        "xla_high": lambda aa, bb: gemm_xla(aa, bb, precision="high"),
    }
    # presplit6 tile sweep (cold-compile safe tiles only; bm>=1024 fails
    # remote AOT per BENCH_NOTES round-3)
    for bm, bn, bk in ((512, 1024, 512), (512, 2048, 256),
                      (256, 1024, 512), (512, 512, 512)):
        cands[f"presplit6_{bm}_{bn}_{bk}"] = (
            lambda aa, bb, t=(bm, bn, bk): gemm_split(
                aa, bb, n_passes=6, bm=t[0], bn=t[1], bk=t[2]))

    results = {}
    for name, f in cands.items():
        try:
            out = jax.block_until_ready(f(a, b))
            err, golden_ok, p999 = err_stats(out, ref64)

            def make(k, f=f):
                @jax.jit
                def run(aa, bb):
                    def body(i, c):
                        return f(c, bb)
                    return jax.lax.fori_loop(0, k, body, aa)
                return run

            t = bench.abs_time(make, (a, b), k0=8)
            tf = 2 * n**3 / t / 1e12
            results[name] = (tf, err, golden_ok)
            print(f"{name:28s} {tf:7.2f} TF/s   max_rel {err:.3g}  "
                  f"rel_p99.9 {p999:.3g}  golden_1e-3 "
                  f"{'PASS' if golden_ok else 'FAIL'}", flush=True)
        except Exception as e:
            print(f"{name:28s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    print("\nreference golden tolerance (gemm.rs:199-202): rel 1e-3")
    return results


if __name__ == "__main__":
    main()
