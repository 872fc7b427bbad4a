"""Device timing: pair-slot solve layout vs plain chained_rr (round 4).

The device profile showed the stable-keys conds failing every settled
frame (cumsum compaction shifts ~every slot on one marginal-contact
flicker): layout/sides/chain 3.9 ms + by-key warmstart 1.7 ms paid per
step. gs_pair_slots freezes slots to the color-major BP-cached pair list.

Run: python scripts/exp_pair_slots.py
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from wgmath_tpu.pipeline import step, step_checked

K = 50


def main():
    state0, params, steady_base, ladder = bench.physics_steady_setup()
    cands = [
        ("chained_rr", dataclasses.replace(ladder, gs_chained=True,
                                           gs_rhs_in_rung=True)),
        ("chained_ps", dataclasses.replace(ladder, gs_chained=True,
                                           gs_rhs_in_rung=True,
                                           gs_pair_slots=True)),
    ]
    ref = None
    for name, cfg in cands:
        st = state0
        t0 = time.time()
        for _ in range(6):
            st, cfg = step_checked(st, params, cfg)
        st = jax.block_until_ready(st)
        print(f"{name}: warmup {time.time()-t0:.0f}s windows="
              f"{tuple(w for w in cfg.gs_windows if w)}", flush=True)

        @jax.jit
        def run_k(s, cfg=cfg):
            def body(i, ss):
                return step(ss, params, cfg)
            out = jax.lax.fori_loop(0, K, body, s)
            return out.bodies.poses.translation, out.pair_count

        out = jax.block_until_ready(run_k(st))
        pos = np.asarray(out[0])
        if ref is None:
            ref = pos
        else:
            err = float(np.max(np.abs(pos - ref)))
            print(f"  max|dp| vs chained_rr after {K + 6} steps: {err:.3g}",
                  flush=True)
            assert np.isfinite(err) and err < 5e-2, err
        ts = []
        for _ in range(3):
            t0 = time.time()
            out = jax.block_until_ready(run_k(st))
            ts.append(time.time() - t0)
        print(f"  {min(ts)/K*1e3:.2f} ms/step ({K/min(ts):.1f} steps/s) "
              f"contacts={int(np.asarray(out[1])[1])}", flush=True)


if __name__ == "__main__":
    main()
