"""Linalg golden tests vs NumPy oracles at the reference's f32 tolerance
(rel 1e-3, ≙ wgebra gemm.rs:141-203 / gemv.rs:147-198 / op_assign.rs:106-160 /
reduce.rs:133-180) plus compile-only checks (≙ test_shader_compilation!)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wgmath_tpu.core.module import compile_check
from wgmath_tpu.core.testing import assert_close
from wgmath_tpu.ops import (
    VARIANTS,
    eval_cpu,
    gemm,
    gemv,
    op_assign,
    op_assign_pallas,
    reduce,
)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


# --- GEMM (all four reference variants: plain/tr × auto-tiled) -------------
@pytest.mark.parametrize("ta,tb", [(False, False), (True, False),
                                   (False, True), (True, True)])
def test_gemm_variants_vs_numpy_256(rng, ta, tb):
    a = rng.normal(size=(256, 256)).astype(np.float32)
    b = rng.normal(size=(256, 256)).astype(np.float32)
    want = (a.T if ta else a) @ (b.T if tb else b)
    got = gemm(jnp.asarray(a), jnp.asarray(b), transpose_a=ta, transpose_b=tb)
    assert_close(got, want, rtol=1e-3, atol=1e-3)


def test_gemm_batched_and_unaligned(rng):
    a = rng.normal(size=(3, 64, 100)).astype(np.float32)
    b = rng.normal(size=(3, 100, 48)).astype(np.float32)
    got = gemm(jnp.asarray(a), jnp.asarray(b))
    assert_close(got, a @ b, rtol=1e-3, atol=1e-3)


def test_gemm_pallas_interpret_aligned(rng):
    # force the Pallas path (interpret mode off-TPU) on aligned shapes
    a = rng.normal(size=(2, 256, 512)).astype(np.float32)
    b = rng.normal(size=(2, 512, 128)).astype(np.float32)
    got = gemm(jnp.asarray(a), jnp.asarray(b), impl="pallas")
    assert_close(got, a @ b, rtol=1e-3, atol=1e-3)


def test_gemm_pallas_transpose(rng):
    a = rng.normal(size=(1, 512, 256)).astype(np.float32)
    b = rng.normal(size=(1, 512, 128)).astype(np.float32)
    got = gemm(jnp.asarray(a), jnp.asarray(b), transpose_a=True, impl="pallas")
    assert_close(got, np.swapaxes(a, -1, -2) @ b, rtol=1e-3, atol=1e-3)


# --- GEMV -------------------------------------------------------------------
@pytest.mark.parametrize("ta", [False, True])
def test_gemv_vs_numpy_1024(rng, ta):
    a = rng.normal(size=(1024, 1024)).astype(np.float32) / 32.0
    x = rng.normal(size=(1024,)).astype(np.float32)
    want = (a.T if ta else a) @ x
    got = gemv(jnp.asarray(a), jnp.asarray(x), transpose_a=ta)
    assert_close(got, want, rtol=1e-3, atol=1e-3)


def test_gemv_pallas(rng):
    a = rng.normal(size=(512, 384)).astype(np.float32)
    x = rng.normal(size=(384,)).astype(np.float32)
    got = gemv(jnp.asarray(a), jnp.asarray(x), impl="pallas")
    assert_close(got, a @ x, rtol=1e-3, atol=1e-3)


def test_gemv_tr_pallas(rng):
    a = rng.normal(size=(512, 384)).astype(np.float32)
    x = rng.normal(size=(512,)).astype(np.float32)
    got = gemv(jnp.asarray(a), jnp.asarray(x), transpose_a=True,
               impl="pallas")
    assert_close(got, a.T @ x, rtol=1e-3, atol=1e-3)


def test_gemv_batched(rng):
    a = rng.normal(size=(5, 64, 96)).astype(np.float32)
    x = rng.normal(size=(5, 96)).astype(np.float32)
    got = gemv(jnp.asarray(a), jnp.asarray(x))
    assert_close(got, np.einsum("bmk,bk->bm", a, x), rtol=1e-3, atol=1e-3)


# --- OpAssign (all variants + callable redirection) -------------------------
@pytest.mark.parametrize("op", sorted(VARIANTS))
def test_op_assign_variants(rng, op):
    a = rng.normal(size=(33, 77)).astype(np.float32)
    b = rng.normal(size=(33, 77)).astype(np.float32) + 2.0
    want = {"add": a + b, "sub": a - b, "mul": a * b, "div": a / b, "copy": b}[op]
    assert_close(op_assign(jnp.asarray(a), jnp.asarray(b), op), want, rtol=1e-6)


def test_op_assign_callable_redirect(rng):
    a = rng.normal(size=(16,)).astype(np.float32)
    b = rng.normal(size=(16,)).astype(np.float32)
    got = op_assign(jnp.asarray(a), jnp.asarray(b), op=lambda x, y: x * 2 + y)
    assert_close(got, a * 2 + b, rtol=1e-6)


def test_op_assign_pallas(rng):
    a = rng.normal(size=(64, 128)).astype(np.float32)
    b = rng.normal(size=(64, 128)).astype(np.float32)
    assert_close(op_assign_pallas(jnp.asarray(a), jnp.asarray(b), "mul"),
                 a * b, rtol=1e-6)


# --- Reduce ------------------------------------------------------------------
@pytest.mark.parametrize("op", ["sum", "min", "max", "sqnorm", "prod"])
def test_reduce_vs_cpu(rng, op):
    x = rng.uniform(0.5, 1.5, size=(4096,)).astype(np.float32)
    got = reduce(jnp.asarray(x), op)
    rtol = 5e-3 if op == "prod" else 1e-3
    assert_close(got, eval_cpu(x, op), rtol=rtol)


@pytest.mark.parametrize("op", ["sum", "min", "max", "sqnorm"])
def test_reduce_pallas(rng, op):
    x = rng.normal(size=(8192,)).astype(np.float32)
    got = reduce(jnp.asarray(x), op, impl="pallas")
    assert_close(got, eval_cpu(x, op), rtol=1e-3, atol=1e-3)


# --- compile-only (≙ test_shader_compilation!) ------------------------------
@pytest.mark.parametrize("mod", ["linalg.gemm", "linalg.gemv",
                                 "linalg.op_assign", "linalg.reduce"])
def test_modules_lower(mod):
    assert compile_check(mod)


def test_gemm_split_planes_and_product():
    """Pre-split bf16 multi-pass GEMM (scripts/exp_gemm_split.py): the
    bitmask 3-plane decomposition must reconstruct f32 exactly, and the
    6-pass product must land within f32-matmul accuracy of the f64
    reference (the 3-pass within the reference's 1e-3 golden band,
    gemm.rs:199-202)."""
    import numpy as np

    from wgmath_tpu.ops.gemm import _split3, gemm_split

    rng = np.random.default_rng(7)
    a = rng.normal(size=(256, 256)).astype(np.float32)
    b = (rng.normal(size=(256, 256)) / 16).astype(np.float32)
    planes = np.asarray(jax.jit(_split3)(jnp.asarray(a)), np.float32)
    np.testing.assert_array_equal(planes.sum(0), a)
    ref = a.astype(np.float64) @ b.astype(np.float64)
    scale = np.abs(ref).mean()
    for n_passes, tol in ((6, 5e-6), (3, 1e-3)):
        out = np.asarray(gemm_split(jnp.asarray(a), jnp.asarray(b),
                                    n_passes=n_passes,
                                    bm=256, bn=256, bk=256), np.float64)
        assert np.abs(out - ref).max() / scale < tol
