"""Batched small-matrix decompositions: LU, QR, Cholesky, symmetric eigen, SVD
(≙ wgebra geometry/lu.rs:5-82, qr{2,3,4}.rs, cholesky.rs, eig{2,3,4}.rs,
svd2.rs/svd3.rs:15-22).

The reference stamps out sizes 2/3/4 from one WGSL template via `src_fn`
textual substitution (lu.rs:5-27). The TPU-native analog is a single Python
implementation parameterized by the *static* size n — jit specializes per
size, and everything is vectorized over leading batch axes so a million tiny
factorizations run as fused VPU code (no per-thread scalar loops, no
divergence).

All routines are fixed-iteration / branch-free (jnp.where) per XLA semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from wgmath_tpu.core.module import EntryPoint, KernelModule, register_module

# ---------------------------------------------------------------------------
# LU with partial pivoting (packed L\U + permutation)
# ---------------------------------------------------------------------------


def lu(m: jax.Array):
    """Packed LU with partial pivoting.

    Returns ``(lu, perm)``: ``lu`` holds U on/above the diagonal and the unit
    lower-triangular L factors below (like the reference's GpuLU output);
    ``perm`` is int32 ``[..., n]`` with ``P·A = L·U`` meaning row ``i`` of the
    factored matrix came from row ``perm[i]`` of ``A``.
    """
    n = m.shape[-1]
    a = jnp.asarray(m)
    batch = a.shape[:-2]
    perm = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), batch + (n,))
    rows = jnp.arange(n)

    def swap_rows(x, k, p):
        idx = jnp.broadcast_to(rows, p.shape + (n,))
        pk = p[..., None]
        idx = jnp.where(idx == k, pk, jnp.where(idx == pk, k, idx))
        return jnp.take_along_axis(x, idx[..., None], axis=-2), idx

    for k in range(n):
        col = jnp.abs(a[..., :, k])
        col = jnp.where(rows >= k, col, -jnp.inf)
        p = jnp.argmax(col, axis=-1)
        a, idx = swap_rows(a, k, p)
        perm = jnp.take_along_axis(perm, idx, axis=-1)
        pivot = a[..., k, k]
        below = rows > k
        factors = jnp.where(below, a[..., :, k] / jnp.where(pivot == 0, 1.0, pivot)[..., None], 0.0)
        # eliminate only columns > k: columns < k store already-final L factors
        row_k = jnp.where(rows > k, a[..., k, :], 0.0)
        a = a - factors[..., :, None] * row_k[..., None, :]
        a = a.at[..., :, k].set(jnp.where(below, factors, a[..., :, k]))
    return a, perm


def lu_unpack(packed: jax.Array):
    n = packed.shape[-1]
    eye = jnp.eye(n, dtype=packed.dtype)
    l = jnp.tril(packed, -1) + eye
    u = jnp.triu(packed)
    return l, u


def lu_solve(packed: jax.Array, perm: jax.Array, b: jax.Array) -> jax.Array:
    """Solve A x = b given lu(A). ``b``: [..., n]."""
    n = packed.shape[-1]
    pb = jnp.take_along_axis(b, perm, axis=-1)
    # forward substitution (unit lower)
    y = pb
    for i in range(1, n):
        y = y.at[..., i].add(-jnp.einsum("...k,...k->...", packed[..., i, :i], y[..., :i]))
    # back substitution
    x = y
    for i in reversed(range(n)):
        s = x[..., i]
        if i + 1 < n:
            s = s - jnp.einsum("...k,...k->...", packed[..., i, i + 1:], x[..., i + 1:])
        x = x.at[..., i].set(s / packed[..., i, i])
    return x


# ---------------------------------------------------------------------------
# QR (Householder)
# ---------------------------------------------------------------------------


def qr(m: jax.Array):
    """Householder QR: returns (q, r) with q orthogonal, r upper triangular."""
    n = m.shape[-1]
    r = jnp.asarray(m)
    q = jnp.broadcast_to(jnp.eye(n, dtype=r.dtype), r.shape)
    rows = jnp.arange(n)
    for k in range(n - 1):
        x = jnp.where(rows >= k, r[..., :, k], 0.0)
        norm = jnp.sqrt(jnp.sum(x * x, axis=-1))
        sign = jnp.where(x[..., k] >= 0, 1.0, -1.0)
        alpha = -sign * norm
        v = x.at[..., k].add(-alpha)
        vnorm2 = jnp.sum(v * v, axis=-1)
        safe = vnorm2 > 1e-30
        inv = jnp.where(safe, 2.0 / jnp.where(safe, vnorm2, 1.0), 0.0)
        # r ← (I - 2vvᵀ/|v|²) r ;  q ← q (I - 2vvᵀ/|v|²)
        vr = jnp.einsum("...i,...ij->...j", v, r)
        r = r - inv[..., None, None] * v[..., :, None] * vr[..., None, :]
        qv = jnp.einsum("...ij,...j->...i", q, v)
        q = q - inv[..., None, None] * qv[..., :, None] * v[..., None, :]
    return q, r


# ---------------------------------------------------------------------------
# Cholesky (unrolled Crout)
# ---------------------------------------------------------------------------


def cholesky(m: jax.Array) -> jax.Array:
    """Lower-triangular L with L·Lᵀ = m (SPD input), batched, unrolled."""
    n = m.shape[-1]
    l = jnp.zeros_like(m)
    for j in range(n):
        d = m[..., j, j]
        for k in range(j):
            d = d - l[..., j, k] * l[..., j, k]
        ljj = jnp.sqrt(jnp.maximum(d, 1e-30))
        l = l.at[..., j, j].set(ljj)
        for i in range(j + 1, n):
            s = m[..., i, j]
            for k in range(j):
                s = s - l[..., i, k] * l[..., j, k]
            l = l.at[..., i, j].set(s / ljj)
    return l


def cholesky_solve(l: jax.Array, b: jax.Array) -> jax.Array:
    n = l.shape[-1]
    y = b
    for i in range(n):
        s = y[..., i]
        for k in range(i):
            s = s - l[..., i, k] * y[..., k]
        y = y.at[..., i].set(s / l[..., i, i])
    x = y
    for i in reversed(range(n)):
        s = x[..., i]
        for k in range(i + 1, n):
            s = s - l[..., k, i] * x[..., k]
        x = x.at[..., i].set(s / l[..., i, i])
    return x


# ---------------------------------------------------------------------------
# Symmetric eigendecomposition (cyclic Jacobi, fixed sweeps)
# ---------------------------------------------------------------------------


def symmetric_eigen(m: jax.Array, *, sweeps: int = 8):
    """Eigenvalues + eigenvectors of a symmetric matrix, batched.

    Cyclic Jacobi with a static sweep count (data-dependent convergence loops
    don't jit; 8 sweeps ≫ machine precision for n ≤ 4). Returns
    ``(eigenvalues [..., n], eigenvectors [..., n, n])`` with
    ``m ≈ V diag(w) Vᵀ`` (columns of V are eigenvectors), ascending order.
    """
    n = m.shape[-1]
    a = jnp.asarray(m)
    v = jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), a.shape)
    for _ in range(sweeps):
        for p in range(n - 1):
            for q in range(p + 1, n):
                app = a[..., p, p]
                aqq = a[..., q, q]
                apq = a[..., p, q]
                small = jnp.abs(apq) < 1e-30
                tau = (aqq - app) / jnp.where(small, 1.0, 2.0 * apq)
                t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
                t = jnp.where(tau == 0.0, 1.0, t)
                t = jnp.where(small, 0.0, t)
                c = jax.lax.rsqrt(1.0 + t * t)
                s = t * c
                # a ← Gᵀ a G on rows/cols p,q ; v ← v G
                ap = a[..., p, :]
                aq = a[..., q, :]
                a = a.at[..., p, :].set(c[..., None] * ap - s[..., None] * aq)
                a = a.at[..., q, :].set(s[..., None] * ap + c[..., None] * aq)
                ap = a[..., :, p]
                aq = a[..., :, q]
                a = a.at[..., :, p].set(c[..., None] * ap - s[..., None] * aq)
                a = a.at[..., :, q].set(s[..., None] * ap + c[..., None] * aq)
                vp = v[..., :, p]
                vq = v[..., :, q]
                v = v.at[..., :, p].set(c[..., None] * vp - s[..., None] * vq)
                v = v.at[..., :, q].set(s[..., None] * vp + c[..., None] * vq)
    w = jnp.diagonal(a, axis1=-2, axis2=-1)
    order = jnp.argsort(w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    v = jnp.take_along_axis(v, order[..., None, :], axis=-1)
    return w, v


# ---------------------------------------------------------------------------
# SVD for 2×2 / 3×3 via eigen(AᵀA) (≙ svd2.rs / svd3.rs quaternion iteration)
# ---------------------------------------------------------------------------


def svd(a: jax.Array):
    """SVD of 2×2 or 3×3 batched matrices: returns (u, s, vt) with
    ``a ≈ u @ diag(s) @ vt``, s descending, u/v orthogonal (det may be ±1).
    """
    n = a.shape[-1]
    if n not in (2, 3):
        raise ValueError("svd supports n in {2, 3}")
    ata = jnp.einsum("...ki,...kj->...ij", a, a)
    w, v = symmetric_eigen(ata)
    # descending singular values
    w = w[..., ::-1]
    v = v[..., :, ::-1]
    s = jnp.sqrt(jnp.maximum(w, 0.0))
    b = jnp.einsum("...ij,...jk->...ik", a, v)  # = U Σ
    eps = 1e-12
    u_cols = []
    for i in range(n):
        col = b[..., :, i]
        sig = s[..., i]
        good = sig > eps
        u_cols.append(jnp.where(good[..., None],
                                col / jnp.where(good, sig, 1.0)[..., None],
                                0.0))
    # ``A·v/σ`` loses orthogonality as 1/σ for small singular values, so
    # re-orthonormalize against the better-conditioned (larger-σ) columns:
    # Gram-Schmidt col1 against col0, rebuild col2 as their cross product
    # (sign-matched so the reconstruction keeps σ ≥ 0).
    if n == 3:
        bad1 = jnp.sum(u_cols[1] * u_cols[1], axis=-1) < 0.5
        alt = _any_orthonormal(u_cols[0])
        c1 = jnp.where(bad1[..., None], alt, u_cols[1])
        c1 = c1 - jnp.sum(c1 * u_cols[0], -1, keepdims=True) * u_cols[0]
        c1n = jnp.linalg.norm(c1, axis=-1, keepdims=True)
        u_cols[1] = jnp.where(c1n > 1e-6, c1 / jnp.maximum(c1n, 1e-30), alt)
        c2 = jnp.cross(u_cols[0], u_cols[1])
        flip = jnp.sum(c2 * u_cols[2], axis=-1, keepdims=True) < 0.0
        bad2 = (jnp.sum(u_cols[2] * u_cols[2], axis=-1, keepdims=True)
                < 0.5)
        u_cols[2] = jnp.where(flip & ~bad2, -c2, c2)
    else:
        perp = jnp.stack([-u_cols[0][..., 1], u_cols[0][..., 0]], axis=-1)
        flip = jnp.sum(perp * u_cols[1], axis=-1, keepdims=True) < 0.0
        bad1 = (jnp.sum(u_cols[1] * u_cols[1], axis=-1, keepdims=True)
                < 0.5)
        u_cols[1] = jnp.where(flip & ~bad1, -perp, perp)
    # fully-degenerate guard (a == 0): use identity
    zero = s[..., 0] < eps
    u = jnp.stack(u_cols, axis=-1)
    u = jnp.where(zero[..., None, None], jnp.eye(n, dtype=a.dtype), u)
    vt = jnp.swapaxes(v, -1, -2)
    return u, s, vt


def _any_orthonormal(x: jax.Array) -> jax.Array:
    """A unit vector orthogonal to unit 3-vector x (branch-free)."""
    ex = jnp.zeros_like(x).at[..., 0].set(1.0)
    ey = jnp.zeros_like(x).at[..., 1].set(1.0)
    ref = jnp.where((jnp.abs(x[..., 0]) > 0.9)[..., None], ey, ex)
    c = jnp.cross(x, ref)
    return c * jax.lax.rsqrt(jnp.sum(c * c, axis=-1, keepdims=True) + 1e-30)


def _ex(n):
    rngless = jnp.eye(n, dtype=jnp.float32)[None].repeat(32, 0) * 2.0
    return (rngless,)


register_module(
    KernelModule(
        "geometry.decomp",
        provides={
            "lu": lu, "lu_unpack": lu_unpack, "lu_solve": lu_solve,
            "qr": qr, "cholesky": cholesky, "cholesky_solve": cholesky_solve,
            "symmetric_eigen": symmetric_eigen, "svd": svd,
        },
        entries={
            **{f"lu{n}": EntryPoint(fn=lu, example_args=functools.partial(_ex, n))
               for n in (2, 3, 4)},
            **{f"qr{n}": EntryPoint(fn=qr, example_args=functools.partial(_ex, n))
               for n in (2, 3, 4)},
            **{f"cholesky{n}": EntryPoint(fn=cholesky,
                                          example_args=functools.partial(_ex, n))
               for n in (2, 3, 4)},
            **{f"eig{n}": EntryPoint(fn=symmetric_eigen,
                                     example_args=functools.partial(_ex, n))
               for n in (2, 3, 4)},
            **{f"svd{n}": EntryPoint(fn=svd, example_args=functools.partial(_ex, n))
               for n in (2, 3)},
        },
        doc="Batched LU/QR/Cholesky/Eigen/SVD for sizes 2-4 "
            "(≙ wgebra geometry decompositions).",
    )
)
