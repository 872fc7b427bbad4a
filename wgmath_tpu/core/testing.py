"""Golden-test utilities (≙ the reference's four test patterns, SURVEY §4).

- :func:`assert_close` — CPU-reference numeric compare at the reference's f32
  tolerance (rel eps 1e-3 for GEMM-class kernels, wgebra gemm.rs:199-202).
- :func:`check_lowers` — trace + lower succeeds (≙ test_shader_compilation!).
"""

from __future__ import annotations

import jax
import numpy as np


def assert_close(actual, expected, *, rtol: float = 1e-3, atol: float = 1e-5, msg: str = ""):
    actual = np.asarray(actual)
    expected = np.asarray(expected)
    np.testing.assert_allclose(actual, expected, rtol=rtol, atol=atol, err_msg=msg)


def check_lowers(fn, *args, static_argnames=()):
    """Assert fn traces and lowers for the current backend; returns lowered."""
    return jax.jit(fn, static_argnames=static_argnames).lower(*args)


def random_sim3(rng: np.random.Generator, n: int):
    """n random (quat[4] wxyz-normalized as xyzw, trans[3], scale) tuples."""
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    t = rng.normal(size=(n, 3)).astype(np.float32)
    s = rng.uniform(0.5, 2.0, size=(n,)).astype(np.float32)
    return q, t, s
