"""Batched GEMV (≙ wgebra Gemv, linalg/gemv.rs:12 + gemv.wgsl kernels
gemv/gemv_fast/gemv_tr/gemv_tr_fast).

GEMV is HBM-bandwidth-bound on TPU (one pass over the matrix); the Pallas
kernel streams row blocks of A through VMEM while the vector stays resident,
reducing along the lane axis on the VPU. The reference's workgroup-reduction
"fast" variants and its GemvTrFast→GemvTr alignment fallback (gemv.rs:100-107)
map to: always-tiled kernel + `impl="auto"` falling back to the XLA twin for
unaligned shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wgmath_tpu.core.dispatch import cdiv, on_tpu, pallas_interpret
from wgmath_tpu.core.module import EntryPoint, KernelModule, register_module


@functools.partial(jax.jit, static_argnames=("transpose_a", "impl"))
def gemv(a: jax.Array, x: jax.Array, *, transpose_a: bool = False,
         impl: str = "auto") -> jax.Array:
    """``op(a) @ x`` for ``a: [..., M, K]``, ``x: [..., K]`` → ``[..., M]``."""
    m, k = (a.shape[-1], a.shape[-2]) if transpose_a else (a.shape[-2], a.shape[-1])
    if x.shape[-1] != k:
        raise ValueError(f"gemv inner dim mismatch: {a.shape} vs {x.shape}")
    if transpose_a:
        use_pallas = (
            impl == "pallas"
            or (impl == "auto" and on_tpu() and m % 128 == 0
                and k % 256 == 0 and a.ndim == 2 and x.ndim == 1))
        if use_pallas:
            return _gemv_tr_pallas(a, x)
        return gemv_xla(a, x, transpose_a=True)
    use_pallas = (
        impl == "pallas"
        or (impl == "auto" and on_tpu()
            and m % 256 == 0 and k % 128 == 0 and a.ndim == 2 and x.ndim == 1)
    )
    if use_pallas:
        return _gemv_pallas(a, x)
    return gemv_xla(a, x, transpose_a=transpose_a)


def gemv_xla(a, x, *, transpose_a=False):
    if transpose_a:
        a = jnp.swapaxes(a, -1, -2)
    return jnp.einsum("...mk,...k->...m", a, x,
                      precision=jax.lax.Precision.HIGHEST)


def _gemv_pallas(a, x, bm: int = 256):
    m, k = a.shape
    # Stream A row-blocks; x resident in VMEM; lane-axis reduce on the VPU.
    # Output lives as one (n_blocks, bm) VMEM block — each grid step writes
    # row i; the reshape back to (m,) is free (row-major). Partial 1-D output
    # blocks violate Mosaic's layout tiling, hence the 2-D staging.
    n_blocks = cdiv(m, bm)
    grid = (n_blocks,)

    def kernel(a_ref, x_ref, o_ref):
        i = pl.program_id(0)
        o_ref[i, :] = jnp.sum(a_ref[:] * x_ref[0][None, :], axis=1)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks, bm), a.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k,
            bytes_accessed=(m * k + k + m) * a.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=pallas_interpret(),
    )(a, x.reshape(1, k))
    return out.reshape(m)


def _gemv_tr_pallas(a, x, bk: int = 256):
    """``a.T @ x`` for a [K, M]: stream K-blocks of A (M stays on lanes),
    accumulate the row-combination across the sequential TPU grid
    (≙ gemv.wgsl gemv_tr/gemv_tr_fast — the reference reduces with
    workgroup shared memory; here the VPU reduces along sublanes and the
    grid carry IS the accumulator)."""
    k, m = a.shape
    n_blocks = cdiv(k, bk)

    def kernel(a_ref, x_ref, o_ref):
        i = pl.program_id(0)
        part = jnp.sum(a_ref[:] * x_ref[0][:, None], axis=0)

        @pl.when(i == 0)
        def _():
            o_ref[0, :] = part

        @pl.when(i > 0)
        def _():
            o_ref[0, :] += part

    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((bk, m), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, m), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, m), a.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k,
            bytes_accessed=(m * k + k + m) * a.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=pallas_interpret(),
    )(a, x.reshape(1, k))
    return out.reshape(m)


register_module(
    KernelModule(
        "linalg.gemv",
        provides={"gemv": gemv, "gemv_xla": gemv_xla},
        entries={
            "gemv": EntryPoint(
                fn=lambda a, x: gemv(a, x),
                example_args=lambda: (
                    jnp.zeros((256, 256), jnp.float32),
                    jnp.zeros((256,), jnp.float32),
                ),
            ),
            "gemv_tr": EntryPoint(
                fn=lambda a, x: gemv(a, x, transpose_a=True),
                example_args=lambda: (
                    jnp.zeros((4, 128, 128), jnp.float32),
                    jnp.zeros((4, 128), jnp.float32),
                ),
            ),
        },
        doc="Batched GEMV (≙ wgebra linalg/gemv.rs).",
    )
)
