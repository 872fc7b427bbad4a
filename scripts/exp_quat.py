"""Layout experiments for the 1M-quaternion benchmark (config 2).

The [N, 4]/[N, 3] component-minor layout wastes 125/128 lanes per VPU op on
TPU; these variants measure component-major alternatives. Run on real TPU:

    python scripts/exp_quat.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (compile cache + slope_time)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from wgmath_tpu.geometry import quat  # noqa: E402

N = 1_000_000
rng = np.random.default_rng(1)
q = rng.normal(size=(N, 4)).astype(np.float32)
q /= np.linalg.norm(q, axis=-1, keepdims=True)
v = rng.normal(size=(N, 3)).astype(np.float32)
qj, vj = jnp.asarray(q), jnp.asarray(v)


def mul_vec_t(qt, vt):
    """Component-major rotate: qt [4, N], vt [3, N] → [3, N]."""
    ux, uy, uz, w = qt[0], qt[1], qt[2], qt[3]
    vx, vy, vz = vt[0], vt[1], vt[2]
    cx = uy * vz - uz * vy
    cy = uz * vx - ux * vz
    cz = ux * vy - uy * vx
    dx = uy * cz - uz * cy
    dy = uz * cx - ux * cz
    dz = ux * cy - uy * cx
    return jnp.stack([vx + 2.0 * (w * cx + dx),
                      vy + 2.0 * (w * cy + dy),
                      vz + 2.0 * (w * cz + dz)])


def variant_current(k):
    @jax.jit
    def f(q, v):
        def body(i, vv):
            return quat.mul_vec(q, vv)
        return jax.lax.fori_loop(0, k, body, v)
    return f


def variant_transposed_carry(k):
    """Transpose once outside the loop; carry [3, N]."""
    @jax.jit
    def f(q, v):
        qt = q.T
        vt = v.T

        def body(i, vv):
            return mul_vec_t(qt, vv)
        return jax.lax.fori_loop(0, k, body, vt).T
    return f


def variant_transpose_inside(k):
    """mul_vec that transposes in/out per call (tests XLA transpose fusion)."""
    @jax.jit
    def f(q, v):
        def body(i, vv):
            return mul_vec_t(q.T, vv.T).T
        return jax.lax.fori_loop(0, k, body, v)
    return f


def main():
    for name, mk in [("current", variant_current),
                     ("carry_T", variant_transposed_carry),
                     ("inside_T", variant_transpose_inside)]:
        # correctness vs reference
        out = mk(1)(qj, vj)
        ref = quat.mul_vec(qj, vj)
        err = float(jnp.max(jnp.abs(out - ref)))
        t = bench.slope_time(mk, (qj, vj), k_small=64, k_large=512)
        bench._log(f"{name}: {N / t / 1e9:.2f} Gop/s (err={err:.2e})")


if __name__ == "__main__":
    main()
