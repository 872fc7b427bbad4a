"""Geometry golden tests vs NumPy oracles (≙ wgebra's embedded WGSL test
kernels compared against nalgebra, e.g. sim3.rs:15-63 345-sample test,
svd3.rs:30-57, lu/qr/eig inline tests)."""

import jax.numpy as jnp
import numpy as np
import pytest

from wgmath_tpu.core.module import compile_check
from wgmath_tpu.core.testing import assert_close
from wgmath_tpu.geometry import (
    Sim,
    cholesky,
    cholesky_solve,
    det2,
    det3,
    det4,
    inv2,
    inv3,
    inv4,
    lu,
    lu_solve,
    lu_unpack,
    qr,
    quat,
    rot2,
    sim,
    svd,
    symmetric_eigen,
)

N = 345  # same sample count as the reference's sim tests


@pytest.fixture()
def rng():
    # function-scoped: every test sees the same draws regardless of which
    # tests ran before it (the suite self-splits across processes)
    return np.random.default_rng(7)


def _rand_quat(rng, n):
    q = rng.normal(size=(n, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def _np_quat_rotmat(q):
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    m = np.empty(q.shape[:-1] + (3, 3), np.float32)
    m[..., 0, 0] = 1 - 2 * (y * y + z * z); m[..., 0, 1] = 2 * (x * y - w * z); m[..., 0, 2] = 2 * (x * z + w * y)
    m[..., 1, 0] = 2 * (x * y + w * z); m[..., 1, 1] = 1 - 2 * (x * x + z * z); m[..., 1, 2] = 2 * (y * z - w * x)
    m[..., 2, 0] = 2 * (x * z - w * y); m[..., 2, 1] = 2 * (y * z + w * x); m[..., 2, 2] = 1 - 2 * (x * x + y * y)
    return m


# --- quat --------------------------------------------------------------------
def test_quat_mul_vec_matches_matrix(rng):
    q = _rand_quat(rng, N)
    v = rng.normal(size=(N, 3)).astype(np.float32)
    got = quat.mul_vec(jnp.asarray(q), jnp.asarray(v))
    want = np.einsum("nij,nj->ni", _np_quat_rotmat(q), v)
    assert_close(got, want, rtol=1e-3, atol=1e-4)


def test_quat_to_matrix_and_back(rng):
    q = _rand_quat(rng, N)
    m = quat.to_matrix(jnp.asarray(q))
    assert_close(m, _np_quat_rotmat(q), rtol=1e-4, atol=1e-5)
    q2 = np.asarray(quat.from_matrix(m))
    # q and -q encode the same rotation
    sign = np.sign(np.sum(q2 * q, axis=-1, keepdims=True))
    assert_close(q2 * sign, q, rtol=1e-3, atol=1e-3)


def test_quat_mul_inv_roundtrip(rng):
    a = _rand_quat(rng, N)
    b = _rand_quat(rng, N)
    ab = quat.mul(jnp.asarray(a), jnp.asarray(b))
    back = quat.mul(ab, quat.inv(jnp.asarray(b)))
    assert_close(back, a, rtol=1e-3, atol=1e-4)


def test_quat_from_scaled_axis_rodrigues(rng):
    v = rng.normal(size=(N, 3)).astype(np.float32)
    q = quat.from_scaled_axis(jnp.asarray(v))
    # Rodrigues rotation of a probe vector
    p = rng.normal(size=(N, 3)).astype(np.float32)
    theta = np.linalg.norm(v, axis=-1, keepdims=True)
    k = v / np.maximum(theta, 1e-12)
    want = (p * np.cos(theta)
            + np.cross(k, p) * np.sin(theta)
            + k * np.sum(k * p, axis=-1, keepdims=True) * (1 - np.cos(theta)))
    got = quat.mul_vec(q, jnp.asarray(p))
    assert_close(got, want, rtol=1e-3, atol=1e-3)
    # tiny-angle branch
    tiny = jnp.asarray(np.full((4, 3), 1e-9, np.float32))
    assert_close(quat.from_scaled_axis(tiny)[..., 3], np.ones(4), rtol=1e-6)


def test_quat_log_exp_roundtrip(rng):
    v = rng.normal(size=(N, 3)).astype(np.float32) * 0.8
    back = quat.to_scaled_axis(quat.from_scaled_axis(jnp.asarray(v)))
    assert_close(back, v, rtol=1e-3, atol=1e-4)


def test_quat_slerp_endpoints(rng):
    a = jnp.asarray(_rand_quat(rng, N))
    b = jnp.asarray(_rand_quat(rng, N))
    s0 = np.asarray(quat.slerp(a, b, 0.0))
    sign = np.sign(np.sum(s0 * np.asarray(a), axis=-1, keepdims=True))
    assert_close(s0 * sign, a, rtol=1e-3, atol=1e-3)


# --- rot2 --------------------------------------------------------------------
def test_rot2_roundtrip(rng):
    th = rng.normal(size=(N,)).astype(np.float32)
    r = rot2.from_angle(jnp.asarray(th))
    v = rng.normal(size=(N, 2)).astype(np.float32)
    c, s = np.cos(th), np.sin(th)
    want = np.stack([c * v[:, 0] - s * v[:, 1], s * v[:, 0] + c * v[:, 1]], -1)
    assert_close(rot2.mul_vec(r, jnp.asarray(v)), want, rtol=1e-4, atol=1e-5)
    assert_close(rot2.mul_vec(rot2.inv(r), rot2.mul_vec(r, jnp.asarray(v))), v,
                 rtol=1e-3, atol=1e-4)
    assert_close(rot2.angle(r), np.arctan2(s, c), rtol=1e-4, atol=1e-5)


# --- sim ---------------------------------------------------------------------
@pytest.mark.parametrize("dim", [2, 3])
def test_sim_group_laws(rng, dim):
    def rand_sim():
        if dim == 3:
            rot = jnp.asarray(_rand_quat(rng, N))
        else:
            rot = rot2.from_angle(jnp.asarray(rng.normal(size=(N,)).astype(np.float32)))
        t = jnp.asarray(rng.normal(size=(N, dim)).astype(np.float32))
        s = jnp.asarray(rng.uniform(0.5, 2.0, size=(N,)).astype(np.float32))
        return Sim(rot, t, s)

    a, b = rand_sim(), rand_sim()
    p = jnp.asarray(rng.normal(size=(N, dim)).astype(np.float32))
    # (a∘b)(p) == a(b(p))
    assert_close(sim.mul_pt(sim.mul(a, b), p), sim.mul_pt(a, sim.mul_pt(b, p)),
                 rtol=1e-3, atol=1e-3)
    # a⁻¹(a(p)) == p
    assert_close(sim.inv_mul_pt(a, sim.mul_pt(a, p)), p, rtol=1e-3, atol=1e-3)
    assert_close(sim.mul_pt(sim.inv(a), sim.mul_pt(a, p)), p, rtol=1e-3, atol=1e-3)
    # inv_mul == inv ∘ mul
    ab1 = sim.inv_mul(a, b)
    ab2 = sim.mul(sim.inv(a), b)
    assert_close(sim.mul_pt(ab1, p), sim.mul_pt(ab2, p), rtol=1e-3, atol=1e-3)
    # vectors ignore translation
    assert_close(sim.mul_vec(a, p),
                 sim.mul_pt(a, p) - sim.mul_pt(a, jnp.zeros_like(p)),
                 rtol=1e-3, atol=1e-3)


# --- inverses ----------------------------------------------------------------
@pytest.mark.parametrize("n,fn,detfn", [(2, inv2, det2), (3, inv3, det3), (4, inv4, det4)])
def test_inv_and_det(rng, n, fn, detfn):
    a = rng.normal(size=(N, n, n)).astype(np.float32) + np.eye(n, dtype=np.float32) * n
    got = fn(jnp.asarray(a))
    assert_close(got, np.linalg.inv(a), rtol=5e-3, atol=1e-3)
    assert_close(detfn(jnp.asarray(a)), np.linalg.det(a), rtol=5e-3, atol=1e-3)


# --- decompositions ----------------------------------------------------------
@pytest.mark.parametrize("n", [2, 3, 4])
def test_lu_reconstruction_and_solve(rng, n):
    a = rng.normal(size=(N, n, n)).astype(np.float32) + np.eye(n, dtype=np.float32)
    packed, perm = lu(jnp.asarray(a))
    l, u = lu_unpack(packed)
    pa = np.take_along_axis(a, np.asarray(perm)[..., None], axis=-2)
    assert_close(np.asarray(l) @ np.asarray(u), pa, rtol=1e-2, atol=1e-3)
    b = rng.normal(size=(N, n)).astype(np.float32)
    x = lu_solve(packed, perm, jnp.asarray(b))
    assert_close(np.einsum("nij,nj->ni", a, np.asarray(x)), b, rtol=1e-2, atol=1e-2)


@pytest.mark.parametrize("n", [2, 3, 4])
def test_qr(rng, n):
    a = rng.normal(size=(N, n, n)).astype(np.float32)
    q, r = qr(jnp.asarray(a))
    q, r = np.asarray(q), np.asarray(r)
    assert_close(q @ r, a, rtol=1e-2, atol=1e-3)
    assert_close(np.einsum("nij,nik->njk", q, q), np.broadcast_to(np.eye(n), (N, n, n)),
                 rtol=1e-3, atol=1e-3)
    for i in range(1, n):
        assert np.max(np.abs(r[:, i, :i])) < 1e-3


@pytest.mark.parametrize("n", [2, 3, 4])
def test_cholesky(rng, n):
    b = rng.normal(size=(N, n, n)).astype(np.float32)
    a = np.einsum("nki,nkj->nij", b, b) + np.eye(n, dtype=np.float32) * 0.5
    l = cholesky(jnp.asarray(a))
    assert_close(np.einsum("nik,njk->nij", np.asarray(l), np.asarray(l)), a,
                 rtol=1e-2, atol=1e-3)
    rhs = rng.normal(size=(N, n)).astype(np.float32)
    x = cholesky_solve(l, jnp.asarray(rhs))
    assert_close(np.einsum("nij,nj->ni", a, np.asarray(x)), rhs, rtol=1e-2, atol=1e-2)


@pytest.mark.parametrize("n", [2, 3, 4])
def test_symmetric_eigen(rng, n):
    b = rng.normal(size=(N, n, n)).astype(np.float32)
    a = (b + np.swapaxes(b, -1, -2)) / 2
    w, v = symmetric_eigen(jnp.asarray(a))
    w, v = np.asarray(w), np.asarray(v)
    # reconstruction + eigenvalue match vs numpy (ascending)
    assert_close(np.einsum("nik,nk,njk->nij", v, w, v), a, rtol=1e-2, atol=1e-3)
    assert_close(w, np.linalg.eigvalsh(a), rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("n", [2, 3])
def test_svd(rng, n):
    a = rng.normal(size=(N, n, n)).astype(np.float32)
    u, s, vt = (np.asarray(x) for x in svd(jnp.asarray(a)))
    assert_close(u @ (s[..., None] * vt), a, rtol=1e-2, atol=1e-3)
    eye = np.broadcast_to(np.eye(n), (N, n, n))
    assert_close(np.einsum("nij,nik->njk", u, u), eye, rtol=1e-3, atol=2e-3)
    assert_close(s, np.linalg.svd(a, compute_uv=False), rtol=1e-3, atol=1e-3)
    assert np.all(np.diff(s, axis=-1) <= 1e-5)


def test_svd_degenerate():
    # rank-1 and zero matrices
    col = np.array([1.0, 2.0, 3.0], np.float32)
    a = np.stack([np.outer(col, col), np.zeros((3, 3), np.float32)])
    u, s, vt = (np.asarray(x) for x in svd(jnp.asarray(a)))
    assert_close(u @ (s[..., None] * vt), a, rtol=1e-2, atol=1e-3)
    eye = np.broadcast_to(np.eye(3), (2, 3, 3))
    assert_close(np.einsum("nij,nik->njk", u, u), eye, rtol=1e-3, atol=2e-3)


# --- compile-only ------------------------------------------------------------
@pytest.mark.parametrize("mod", ["geometry.quat", "geometry.rot2", "geometry.sim",
                                 "geometry.inv", "geometry.decomp"])
def test_geometry_modules_lower(mod):
    assert compile_check(mod)


def test_component_major_fast_paths_match():
    """quat.mul/normalize and sim.mul/inv/inv_mul route large flat batches
    through component-major ([C, N]) arithmetic for TPU lane occupancy —
    the fast branch must be numerically identical to the row-major path
    (checked by driving the same rows through both, above and below the
    _CM_MIN_BATCH threshold)."""
    from wgmath_tpu.geometry import sim

    rng = np.random.default_rng(7)
    n = quat._CM_MIN_BATCH + 128
    m = 512  # slow-path slice
    q1 = rng.normal(size=(n, 4)).astype(np.float32)
    q1 /= np.linalg.norm(q1, axis=-1, keepdims=True)
    q2 = rng.normal(size=(n, 4)).astype(np.float32)
    q2 /= np.linalg.norm(q2, axis=-1, keepdims=True)
    t1 = rng.normal(size=(n, 3)).astype(np.float32)
    t2 = rng.normal(size=(n, 3)).astype(np.float32)
    s1 = rng.uniform(0.5, 2, n).astype(np.float32)
    s2 = rng.uniform(0.5, 2, n).astype(np.float32)

    big = quat.mul(jnp.asarray(q1), jnp.asarray(q2))
    small = quat.mul(jnp.asarray(q1[:m]), jnp.asarray(q2[:m]))
    assert_close(np.asarray(big[:m]), np.asarray(small), rtol=1e-6, atol=1e-6)

    bign = quat.normalize(jnp.asarray(q1 * 3))
    smalln = quat.normalize(jnp.asarray(q1[:m] * 3))
    assert_close(np.asarray(bign[:m]), np.asarray(smalln),
                 rtol=1e-6, atol=1e-6)

    A = sim.Sim(jnp.asarray(q1), jnp.asarray(t1), jnp.asarray(s1))
    B = sim.Sim(jnp.asarray(q2), jnp.asarray(t2), jnp.asarray(s2))
    As = sim.Sim(jnp.asarray(q1[:m]), jnp.asarray(t1[:m]), jnp.asarray(s1[:m]))
    Bs = sim.Sim(jnp.asarray(q2[:m]), jnp.asarray(t2[:m]), jnp.asarray(s2[:m]))
    for f in (sim.mul, sim.inv_mul):
        out_b, out_s = f(A, B), f(As, Bs)
        assert_close(np.asarray(out_b.rotation[:m]), np.asarray(out_s.rotation),
                     rtol=1e-6, atol=1e-6)
        assert_close(np.asarray(out_b.translation[:m]),
                     np.asarray(out_s.translation), rtol=1e-5, atol=2e-6)
        assert_close(np.asarray(out_b.scale[:m]), np.asarray(out_s.scale),
                     rtol=1e-6, atol=1e-6)
    inv_b, inv_s = sim.inv(A), sim.inv(As)
    assert_close(np.asarray(inv_b.rotation[:m]), np.asarray(inv_s.rotation),
                 rtol=1e-6, atol=1e-6)
    assert_close(np.asarray(inv_b.translation[:m]),
                 np.asarray(inv_s.translation), rtol=1e-5, atol=2e-6)


def test_sim_component_major_storage_matches():
    """cm=True SoA-tuple storage (to_cm/from_cm + mul/inv/inv_mul/
    normalize_rotation/mul_pt) must reproduce the row-major chain."""
    from wgmath_tpu.geometry import sim
    from wgmath_tpu.geometry.sim import Sim

    rng = np.random.default_rng(5)
    n = 257
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    t = rng.normal(size=(n, 3)).astype(np.float32)
    s0 = Sim(jnp.asarray(q), jnp.asarray(t), jnp.ones((n,)))
    c0 = sim.to_cm(s0)
    assert c0.cm and c0.dim == 3

    # chained compose+inv+renormalize, both layouts
    s, c = s0, c0
    for _ in range(4):
        out = sim.mul(s, sim.inv(s0))
        s = Sim(quat.normalize(out.rotation), out.translation,
                jnp.clip(out.scale, 0.5, 2.0))
        outc = sim.normalize_rotation(sim.mul(c, sim.inv(c0)))
        c = Sim(outc.rotation, outc.translation,
                jnp.clip(outc.scale, 0.5, 2.0), cm=True)
    back = sim.from_cm(c)
    assert_close(np.asarray(back.rotation), np.asarray(s.rotation),
                 rtol=1e-5, atol=1e-5)
    assert_close(np.asarray(back.translation), np.asarray(s.translation),
                 rtol=1e-4, atol=1e-5)
    assert_close(np.asarray(back.scale), np.asarray(s.scale),
                 rtol=1e-6, atol=1e-6)

    # inv_mul + mul_pt
    b = sim.mul(s0, s0)
    cb = sim.to_cm(b)
    im = sim.from_cm(sim.inv_mul(c0, cb))
    im_ref = sim.inv_mul(s0, b)
    assert_close(np.asarray(im.translation), np.asarray(im_ref.translation),
                 rtol=1e-4, atol=1e-5)
    p = rng.normal(size=(n, 3)).astype(np.float32)
    pc = quat.split_soa(jnp.asarray(p))
    got = quat.merge_soa(sim.mul_pt(c0, pc))
    assert_close(np.asarray(got), np.asarray(sim.mul_pt(s0, jnp.asarray(p))),
                 rtol=1e-4, atol=1e-5)

    # SoA quat helpers round-trip
    qs = quat.split_soa(jnp.asarray(q))
    assert_close(np.asarray(quat.merge_soa(quat.normalize_soa(qs))),
                 np.asarray(quat.normalize(jnp.asarray(q))),
                 rtol=1e-6, atol=1e-6)
    assert_close(np.asarray(quat.merge_soa(quat.mul_soa(qs, qs))),
                 np.asarray(quat.mul(jnp.asarray(q), jnp.asarray(q))),
                 rtol=1e-5, atol=1e-6)
