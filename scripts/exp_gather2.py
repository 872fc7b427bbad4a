"""Round-2 gather/scatter strategy microbench (absolute timing).

The GS sweep's floor is 2 gathers + 2 scatter-adds per color on a
[N=14464, 8] f32 table. Strategies:

  1. XLA gather / scatter-add baseline (current sweep primitive)
  2. Pallas full-N one-hot gather: table resident in VMEM, per chunk build
     (idx == iota) masks and matmul them against the table (no sorting,
     exact) — cost model says VPU compare generation dominates; measure it
  3. Pallas sorted-window LOCAL one-hot: rows sorted by body id, per-chunk
     scalar-prefetched base offset, compares only against a SPAN-sized
     local iota window (dynamic-sliced from the VMEM table)

Run: python scripts/exp_gather2.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (compile cache)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

N = 14464
F = 8
W = 8192
CHUNK = 512


def timeit(label, fn, *args, K=100, reps=3):
    @jax.jit
    def run(args):
        def body(i, carry):
            out = fn(*args[:-1], carry)
            # feed output back through the index-free operand to chain
            return carry + out.reshape(-1)[0] * 1e-30

        return jax.lax.fori_loop(0, K, body, args[-1])

    out = jax.block_until_ready(run(args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(args))
        ts.append(time.perf_counter() - t0)
    us = min(ts) / K * 1e6
    bench._log(f"{label}: {us:.1f} us  ({W / (us * 1e-6) / 1e6:.0f} Mrow/s)")
    return us


# --- 1. XLA baseline --------------------------------------------------------


def xla_gather(idx, table, chain):
    t = table.at[0, 0].add(chain * 1e-30)
    return t[idx]


def xla_scatter(idx, delta, table, chain):
    t = table.at[0, 0].add(chain * 1e-30)
    return t.at[idx].add(delta, mode="promise_in_bounds",
                         unique_indices=False)


def xla_scatter_unique(uidx, delta, table, chain):
    t = table.at[0, 0].add(chain * 1e-30)
    return t.at[uidx].add(delta, mode="promise_in_bounds",
                          unique_indices=True)


# --- 2. Pallas full-N one-hot ----------------------------------------------


def _onehot_kernel(idx_ref, table_ref, out_ref):
    # idx block [CHUNK, 1] i32; table [N, F] resident; out [CHUNK, F]
    idx = idx_ref[:, :1]  # [CHUNK, 1]
    acc = jnp.zeros((CHUNK, F), jnp.float32)
    n_sub = N // CHUNK
    for c in range(n_sub):
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1) + c * CHUNK
        oh = (idx == iota).astype(jnp.float32)  # [CHUNK, CHUNK]
        acc += jax.lax.dot_general(
            oh, table_ref[c * CHUNK:(c + 1) * CHUNK, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    out_ref[:, :] = acc


def pallas_onehot_gather(idx2d, table, chain):
    t = table.at[0, 0].add(chain * 1e-30)
    return pl.pallas_call(
        _onehot_kernel,
        grid=(W // CHUNK,),
        in_specs=[
            pl.BlockSpec((CHUNK, 1), lambda i: (i, 0)),
            pl.BlockSpec((N, F), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((CHUNK, F), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((W, F), jnp.float32),
    )(idx2d, t)


# --- 3. Pallas local-window one-hot (sorted rows, scalar-prefetch base) ----

SPAN = 2048


def _local_kernel(base_ref, idx_ref, table_ref, out_ref):
    i = pl.program_id(0)
    base = base_ref[i]
    idx = idx_ref[:, :1] - base  # local ids in [0, SPAN)
    win = table_ref[pl.ds(base, SPAN), :]  # dynamic slice of VMEM table
    acc = jnp.zeros((CHUNK, F), jnp.float32)
    n_sub = SPAN // CHUNK
    for c in range(n_sub):
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1) + c * CHUNK
        oh = (idx == iota).astype(jnp.float32)
        acc += jax.lax.dot_general(
            oh, win[c * CHUNK:(c + 1) * CHUNK, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    out_ref[:, :] = acc


def pallas_local_gather(bases, idx2d, table, chain):
    t = table.at[0, 0].add(chain * 1e-30)
    return pl.pallas_call(
        _local_kernel,
        grid=(W // CHUNK,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((CHUNK, 1), lambda i: (i, 0)),
            pl.BlockSpec((N + SPAN, F), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((CHUNK, F), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((W, F), jnp.float32),
    )(bases, idx2d, t)


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    idx = rng.integers(0, N, W).astype(np.int32)
    delta = jnp.asarray(rng.normal(size=(W, F)).astype(np.float32))
    uidx = rng.permutation(N)[:W].astype(np.int32)

    timeit("xla gather", xla_gather, jnp.asarray(idx), table,
           jnp.float32(0.0))
    timeit("xla scatter-add dup", xla_scatter, jnp.asarray(idx), delta,
           table, jnp.float32(0.0))
    timeit("xla scatter-add unique", xla_scatter_unique, jnp.asarray(uidx),
           delta, table, jnp.float32(0.0))

    idx2d = jnp.asarray(idx[:, None])
    try:
        out = pallas_onehot_gather(idx2d, table, jnp.float32(0.0))
        ref = np.asarray(table)[idx]
        err = np.abs(np.asarray(out) - ref).max()
        bench._log(f"onehot gather correct: maxerr={err:.2e}")
        timeit("pallas one-hot full-N gather", pallas_onehot_gather, idx2d,
               table, jnp.float32(0.0))
    except Exception as e:  # noqa: BLE001
        bench._log(f"one-hot full-N FAILED: {type(e).__name__}: {e}")

    # sorted-window variant: sort ids, chunk bases = aligned min of chunk
    sidx = np.sort(idx)
    bases = []
    ok_span = True
    for c in range(W // CHUNK):
        lo = int(sidx[c * CHUNK])
        hi = int(sidx[(c + 1) * CHUNK - 1])
        base = (lo // 8) * 8
        if hi - base >= SPAN:
            ok_span = False
        bases.append(base)
    bench._log(f"sorted-chunk spans ok for SPAN={SPAN}: {ok_span} "
               f"(max span {max(int(sidx[(c + 1) * CHUNK - 1]) - b for c, b in enumerate(bases))})")
    table_pad = jnp.concatenate(
        [table, jnp.zeros((SPAN, F), jnp.float32)])
    try:
        out = pallas_local_gather(jnp.asarray(np.asarray(bases, np.int32)),
                                  jnp.asarray(sidx[:, None]), table_pad,
                                  jnp.float32(0.0))
        ref = np.asarray(table)[sidx]
        err = np.abs(np.asarray(out) - ref).max() if ok_span else -1.0
        bench._log(f"local gather correct: maxerr={err:.2e}")
        timeit("pallas local-window gather", pallas_local_gather,
               jnp.asarray(np.asarray(bases, np.int32)),
               jnp.asarray(sidx[:, None]), table_pad, jnp.float32(0.0))
    except Exception as e:  # noqa: BLE001
        bench._log(f"local-window FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
