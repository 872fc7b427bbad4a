"""Native scene-build kernels: ctypes bindings for libwgnative.so with NumPy
fallbacks (≙ the reference's CPU-side Rust: joint coloring joint.rs:228-290,
mesh BVH build shape.rs:307-480).

The library is compiled on demand with g++ (cached next to this package); all
call sites transparently fall back to the NumPy implementations if no
toolchain is available, so the framework stays importable everywhere.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "wgnative.cpp")
_SO = os.path.join(_HERE, "libwgnative.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                check=True, capture_output=True)
        except Exception as e:  # pragma: no cover - toolchain missing
            print(f"[wgmath_tpu.native] build failed, using NumPy fallback: {e}",
                  file=sys.stderr)
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(_SO)
        lib.wg_greedy_color.restype = ctypes.c_int
        lib.wg_build_bvh.restype = ctypes.c_int
        _lib = lib
    except OSError as e:  # pragma: no cover
        print(f"[wgmath_tpu.native] load failed, using NumPy fallback: {e}",
              file=sys.stderr)
        _lib = False
    return _lib


def _ptr(a, dtype):
    a = np.ascontiguousarray(a, dtype=dtype)
    return a, a.ctypes.data_as(ctypes.c_void_p)


def greedy_color(body_a, body_b, dynamic, valid=None) -> np.ndarray:
    """1-based greedy coloring of the constraint graph (native, ≤64 colors)."""
    body_a = np.ascontiguousarray(body_a, np.int32)
    body_b = np.ascontiguousarray(body_b, np.int32)
    n = len(body_a)
    if valid is None:
        valid = np.ones(n, np.uint8)
    dynamic = np.ascontiguousarray(dynamic, np.uint8)
    valid = np.ascontiguousarray(valid, np.uint8)
    colors = np.zeros(n, np.int32)
    lib = _load()
    if lib:
        rc = lib.wg_greedy_color(
            body_a.ctypes.data_as(ctypes.c_void_p),
            body_b.ctypes.data_as(ctypes.c_void_p),
            dynamic.ctypes.data_as(ctypes.c_void_p),
            valid.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int32(n), ctypes.c_int32(len(dynamic)),
            colors.ctypes.data_as(ctypes.c_void_p))
        if rc >= 0:
            return colors
    # NumPy/Python fallback
    masks: dict[int, int] = {}
    for j in range(n):
        if not valid[j]:
            continue
        used = 0
        for b in (int(body_a[j]), int(body_b[j])):
            if dynamic[b]:
                used |= masks.get(b, 0)
        c = 1
        while used & (1 << (c - 1)):
            c += 1
        colors[j] = c
        for b in (int(body_a[j]), int(body_b[j])):
            if dynamic[b]:
                masks[b] = masks.get(b, 0) | (1 << (c - 1))
    return colors


def build_bvh(mins, maxs):
    """Flattened median-split BVH (device-LBVH layout). Returns
    ``(left, right, node_min, node_max, order)``."""
    mins = np.ascontiguousarray(mins, np.float32)
    maxs = np.ascontiguousarray(maxs, np.float32)
    n, dim = mins.shape
    left = np.zeros(max(n - 1, 1), np.int32)
    right = np.zeros(max(n - 1, 1), np.int32)
    node_min = np.zeros((2 * n - 1, dim), np.float32)
    node_max = np.zeros((2 * n - 1, dim), np.float32)
    order = np.zeros(n, np.int32)
    lib = _load()
    if lib:
        rc = lib.wg_build_bvh(
            mins.ctypes.data_as(ctypes.c_void_p),
            maxs.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int32(n), ctypes.c_int32(dim),
            left.ctypes.data_as(ctypes.c_void_p),
            right.ctypes.data_as(ctypes.c_void_p),
            node_min.ctypes.data_as(ctypes.c_void_p),
            node_max.ctypes.data_as(ctypes.c_void_p),
            order.ctypes.data_as(ctypes.c_void_p))
        if rc == 0:
            return left, right, node_min, node_max, order
    # NumPy fallback: simple recursive median split
    prims = list(range(n))
    state = {"internal": 0, "leaf": 0}

    def rec(lo, hi):
        if hi - lo == 1:
            k = state["leaf"]
            state["leaf"] += 1
            order[k] = prims[lo]
            node = k + (n - 1)
            node_min[node] = mins[prims[lo]]
            node_max[node] = maxs[prims[lo]]
            return node
        cents = (mins[prims[lo:hi]] + maxs[prims[lo:hi]]) / 2
        axis = int(np.argmax(cents.max(0) - cents.min(0)))
        prims[lo:hi] = sorted(prims[lo:hi],
                              key=lambda p: mins[p, axis] + maxs[p, axis])
        mid = (lo + hi) // 2
        node = state["internal"]
        state["internal"] += 1
        l = rec(lo, mid)
        r = rec(mid, hi)
        left[node] = l
        right[node] = r
        node_min[node] = np.minimum(node_min[l], node_min[r])
        node_max[node] = np.maximum(node_max[l], node_max[r])
        return node

    if n == 1:
        order[0] = 0
        node_min[0] = mins[0]
        node_max[0] = maxs[0]
    else:
        rec(0, n)
    return left, right, node_min, node_max, order
