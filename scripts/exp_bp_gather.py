"""Grid-BP candidate gather layout experiment (round 5).

The grid BP's "ONE packed gather" (`packed[cand_f]`, grid.py:211) produces
[rows, w, 7] with the minor dim tile-padded 7→128: an 18x HBM blowup that
OOM'd the 43k pyramid (10.2 GB temp) and silently costs ~1.2 GB of padded
write traffic at the 10k bench. Candidates per variant, timed on the
bench-scale index set (chained, scalar-synced):

  packed_row   — today's [n,7] row gather
  per_comp     — 7 element-gathers from [n] component vectors
  lane_gather  — one take along the lane axis of the [8, n] transposed
                 table (minor dim = candidates: no padding)

Run on the TPU: python scripts/exp_bp_gather.py [n] [w]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import bench  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10005
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 232
    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.normal(size=(n, 7)).astype(np.float32))
    packedT = jnp.asarray(
        np.concatenate([np.asarray(packed).T,
                        np.zeros((1, n), np.float32)]))  # [8, n]
    cand = jnp.asarray(rng.integers(0, n, size=(n, w)).astype(np.int32))

    def consume(cd3):
        # mimic the real consumers: component slices + reduction
        return (jnp.sum(cd3[..., :3], axis=-1) - jnp.sum(cd3[..., 3:6],
                                                         axis=-1)
                + cd3[..., 6])

    def make_row(k):
        @jax.jit
        def f(packed, cand):
            def body(i, c):
                cd = packed[c]
                s = consume(cd)
                return jnp.clip(c + s.astype(jnp.int32) % 2, 0, n - 1)
            return jax.lax.fori_loop(0, k, body, cand)
        return f

    def make_comp(k):
        @jax.jit
        def f(packed, cand):
            comps = [packed[:, j] for j in range(7)]

            def body(i, c):
                cs = [cc[c] for cc in comps]
                s = cs[0] + cs[1] + cs[2] - cs[3] - cs[4] - cs[5] + cs[6]
                return jnp.clip(c + s.astype(jnp.int32) % 2, 0, n - 1)
            return jax.lax.fori_loop(0, k, body, cand)
        return f

    def make_lane(k):
        @jax.jit
        def f(packedT, cand):
            def body(i, c):
                cd = jnp.take(packedT, c.reshape(-1), axis=1)  # [8, n*w]
                cd3 = cd.reshape(8, n, w)
                s = (cd3[0] + cd3[1] + cd3[2] - cd3[3] - cd3[4] - cd3[5]
                     + cd3[6])
                return jnp.clip(c + s.astype(jnp.int32) % 2, 0, n - 1)
            return jax.lax.fori_loop(0, k, body, cand)
        return f

    def make_lane3d(k):
        @jax.jit
        def f(packedT, cand):
            def body(i, c):
                cd3 = jnp.take(packedT, c, axis=1, mode="clip")  # [8,n,w]
                s = (cd3[0] + cd3[1] + cd3[2] - cd3[3] - cd3[4] - cd3[5]
                     + cd3[6])
                return jnp.clip(c + s.astype(jnp.int32) % 2, 0, n - 1)
            return jax.lax.fori_loop(0, k, body, cand)
        return f

    variants = (("packed_row", make_row, (packed, cand)),
                ("per_comp", make_comp, (packed, cand)),
                ("lane_gather", make_lane, (packedT, cand)),
                ("lane_gather3d", make_lane3d, (packedT, cand)))
    if "--only3d" in sys.argv:
        variants = variants[3:]
    for name, mk, args in variants:
        try:
            t = bench.abs_time(mk, args, k0=8)
            print(f"{name:12s} {t * 1e3:8.3f} ms/iter "
                  f"({n * w / t / 1e6:8.1f} M lookups/s)", flush=True)
        except Exception as e:
            print(f"{name:12s} FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
