"""Native library tests: C++ greedy coloring + BVH vs NumPy fallbacks and
invariants (≙ the reference's CPU-side joint coloring / mesh BVH build)."""

import numpy as np

from wgmath_tpu import native


def test_native_greedy_color_valid():
    rng = np.random.default_rng(0)
    n_bodies = 200
    n = 800
    body_a = rng.integers(0, n_bodies, n).astype(np.int32)
    body_b = ((body_a + 1 + rng.integers(0, n_bodies - 1, n)) % n_bodies
              ).astype(np.int32)  # no self-pairs
    dynamic = rng.random(n_bodies) > 0.2
    colors = native.greedy_color(body_a, body_b, dynamic)
    assert colors.min() >= 1
    # proper coloring: same color never shares a dynamic body
    for c in np.unique(colors):
        sel = colors == c
        seen = set()
        for a, b in zip(body_a[sel], body_b[sel]):
            for x in (int(a), int(b)):
                if dynamic[x]:
                    assert x not in seen, (c, x)
                    seen.add(x)


def test_native_bvh_invariants():
    rng = np.random.default_rng(1)
    n = 257
    centers = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    he = rng.uniform(0.1, 1.0, (n, 3)).astype(np.float32)
    left, right, nmin, nmax, order = native.build_bvh(centers - he, centers + he)
    assert sorted(order.tolist()) == list(range(n))
    # root bound == global bound
    np.testing.assert_allclose(nmin[0], (centers - he).min(0), rtol=1e-6)
    np.testing.assert_allclose(nmax[0], (centers + he).max(0), rtol=1e-6)
    # every leaf reachable exactly once
    seen = []
    stack = [0]
    while stack:
        nd = stack.pop()
        if nd >= n - 1:
            seen.append(nd - (n - 1))
        else:
            stack.append(int(left[nd]))
            stack.append(int(right[nd]))
    assert sorted(seen) == list(range(n))
    # parent bounds contain children
    for i in range(n - 1):
        for ch in (left[i], right[i]):
            assert np.all(nmin[i] <= nmin[ch] + 1e-6)
            assert np.all(nmax[i] >= nmax[ch] - 1e-6)


def test_native_matches_python_coloring():
    from wgmath_tpu.dynamics.joint import _greedy_color

    rng = np.random.default_rng(2)
    n_bodies = 50
    n = 120
    body_a = rng.integers(0, n_bodies, n).astype(np.int32)
    body_b = rng.integers(0, n_bodies, n).astype(np.int32)
    dynamic = np.ones(n_bodies, bool)
    valid = np.ones(n, bool)
    c_native = native.greedy_color(body_a, body_b, dynamic, valid)
    c_python = _greedy_color(body_a, body_b, valid, dynamic)
    np.testing.assert_array_equal(c_native, c_python)
