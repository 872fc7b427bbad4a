"""Mosaic feasibility probes for the fused TGS solve kernel: dynamic row
gather / scatter-add / cumsum inside a TPU Pallas kernel. Run on real TPU."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (compile cache)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

rng = np.random.default_rng(0)
N, M, F = 256, 64, 8
x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, N, M), jnp.int32)
uniq = jnp.asarray(rng.permutation(N)[:M], jnp.int32)


def probe(name, fn):
    try:
        out = fn()
        print(f"{name}: OK {np.asarray(out).shape}", flush=True)
        return np.asarray(out)
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:200]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)
        return None


def gather_vmem_idx():
    def kern(idx_ref, x_ref, o_ref):
        o_ref[:] = x_ref[idx_ref[:]]

    return pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((M, F), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(idx, x)


def gather_take():
    def kern(idx_ref, x_ref, o_ref):
        o_ref[:] = jnp.take(x_ref[:], idx_ref[:], axis=0)

    return pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((M, F), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(idx, x)


def gather_loop_smem():
    def kern(idx_ref, x_ref, o_ref):
        def body(i, _):
            o_ref[i, :] = x_ref[idx_ref[i], :]
            return 0
        jax.lax.fori_loop(0, M, body, 0)

    return pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((M, F), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(idx, x)


def scatter_add_at():
    def kern(idx_ref, d_ref, x_ref, o_ref):
        o_ref[:] = x_ref[:]
        o_ref[idx_ref[:]] += d_ref[:]

    d = jnp.ones((M, F), jnp.float32)
    return pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((N, F), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(uniq, d, x)


def scatter_loop_smem():
    def kern(idx_ref, d_ref, x_ref, o_ref):
        o_ref[:] = x_ref[:]

        def body(i, _):
            j = idx_ref[i]
            o_ref[j, :] = o_ref[j, :] + d_ref[i, :]
            return 0
        jax.lax.fori_loop(0, M, body, 0)

    d = jnp.ones((M, F), jnp.float32)
    return pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((N, F), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(uniq, d, x)


def cumsum_kernel():
    def kern(x_ref, o_ref):
        o_ref[:] = jnp.cumsum(x_ref[:], axis=0)

    return pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((N, F), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)


def onehot_gather_mxu():
    def kern(idx_ref, x_ref, o_ref):
        rows = jax.lax.broadcasted_iota(jnp.int32, (M, N), 1)
        oh = (rows == idx_ref[:][:, None]).astype(jnp.float32)
        o_ref[:] = jnp.dot(oh, x_ref[:], preferred_element_type=jnp.float32)

    return pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((M, F), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(idx, x)


def main():
    ref_g = np.asarray(x)[np.asarray(idx)]
    for name, fn, ref in [
        ("gather_vmem_idx", gather_vmem_idx, ref_g),
        ("gather_take", gather_take, ref_g),
        ("gather_loop_smem", gather_loop_smem, ref_g),
        ("scatter_add_at", scatter_add_at, None),
        ("scatter_loop_smem", scatter_loop_smem, None),
        ("cumsum", cumsum_kernel, np.cumsum(np.asarray(x), axis=0)),
        ("onehot_gather_mxu", onehot_gather_mxu, ref_g),
    ]:
        out = probe(name, fn)
        if out is not None and ref is not None:
            print(f"   match: {np.allclose(out, ref, atol=1e-5)}", flush=True)
        if out is not None and ref is None and name.startswith("scatter"):
            exp = np.asarray(x).copy()
            exp[np.asarray(uniq)] += 1.0
            print(f"   match: {np.allclose(out, exp, atol=1e-5)}", flush=True)


if __name__ == "__main__":
    main()
