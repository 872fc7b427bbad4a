"""LBVH broad phase: Karras-2012 linear BVH (≙ wgparry broad_phase/lbvh.rs:32-321
+ lbvh.wgsl compute_domain/compute_morton/build/refit/find_collision_pairs).

TPU-native redesign:
- domain AABB: one min/max reduce (≙ the single-workgroup reduction kernel);
- morton codes + ``lax.sort_key_val`` (≙ WGSL radix sort of codes);
- topology build: every internal node's (range, split) is computed
  *independently* via common-prefix binary searches — embarrassingly
  vectorizable over nodes, no divergence penalty on the VPU
  (≙ lbvh.wgsl build:179);
- refit: the reference's atomic second-visitor bottom-up walk
  (refit_leaves/refit_internal) becomes a fixed-point level sweep — R rounds
  of "internal AABB = union(children)", correct once R ≥ tree depth;
- pair finding: per-leaf stack traversal (fixed-depth stack), two phases —
  count, exclusive-scan, emit — replacing atomic append (SURVEY §2.5).

Tree layout (n leaves): nodes 0..n-2 are internal, node i's children index
into either internals (idx < n-1) or leaves (idx >= n-1 encodes leaf idx-n+1
— we store child ids with leaves offset by (n-1)).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax import tree_util

from wgmath_tpu.broad_phase.brute_force import PairList
from wgmath_tpu.broad_phase.morton import clz32, morton_codes


@tree_util.register_pytree_node_class
@dataclasses.dataclass
class Lbvh:
    """Built tree over n leaves (≙ LbvhState, lbvh.rs:120)."""

    left: jax.Array  # i32 [n-1] child id (internal < n-1, else leaf id+n-1)
    right: jax.Array  # i32 [n-1]
    node_min: jax.Array  # [2n-1, dim] — internal nodes then leaves
    node_max: jax.Array  # [2n-1, dim]
    order: jax.Array  # i32 [n] — leaf k ↦ original body index

    def tree_flatten(self):
        return (self.left, self.right, self.node_min, self.node_max,
                self.order), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def num_leaves(self):
        return self.order.shape[0]


def _delta_fn(codes_aug):
    """delta(i, j): common prefix length of augmented (code, index) keys.
    codes_aug is uint64-free: we append the index as a tiebreak by comparing
    codes first, then indices (≙ Karras §4 tie handling)."""

    n = codes_aug.shape[0]

    def delta(i, j):
        valid = (j >= 0) & (j < n)
        j_c = jnp.clip(j, 0, n - 1)
        ci = codes_aug[i]
        cj = codes_aug[j_c]
        x = ci ^ cj
        d = clz32(x)
        # equal codes: tie-break on indices (adds 32)
        tie = 32 + clz32(i.astype(jnp.uint32) ^ j_c.astype(jnp.uint32))
        d = jnp.where(x == 0, tie, d)
        return jnp.where(valid, d, -1)

    return delta


@functools.partial(jax.jit, static_argnames=("refit_rounds",))
def build(mins: jax.Array, maxs: jax.Array, *, refit_rounds: int = 48) -> Lbvh:
    """Build the LBVH from leaf AABBs (≙ Lbvh::update_tree, lbvh.rs:204-270)."""
    n, dim = mins.shape
    centers = 0.5 * (mins + maxs)
    dom_min = jnp.min(mins, axis=0)
    dom_max = jnp.max(maxs, axis=0)
    codes = morton_codes(centers, dom_min, dom_max)
    order = jnp.argsort(codes).astype(jnp.int32)
    codes = codes[order]
    smin = mins[order]
    smax = maxs[order]

    delta = _delta_fn(codes)
    i = jnp.arange(n - 1, dtype=jnp.int32)

    d = jnp.sign(delta(i, i + 1) - delta(i, i - 1)).astype(jnp.int32)
    d = jnp.where(d == 0, 1, d)
    delta_min = delta(i, i - d)

    # doubling upper bound for the range length
    def grow(_, lmax):
        cond = delta(i, i + lmax * d) > delta_min
        return jnp.where(cond, lmax * 2, lmax)

    lmax = jax.lax.fori_loop(0, 31, grow, jnp.full((n - 1,), 2, jnp.int32))

    # binary search for the exact range end: lmax/2, lmax/4, ..., 1
    def shrink_loop(t, carry):
        l, step = carry
        cond = delta(i, i + (l + step) * d) > delta_min
        l = jnp.where((step >= 1) & cond, l + step, l)
        return l, jnp.maximum(step >> 1, 0)

    l0 = jnp.zeros((n - 1,), jnp.int32)
    l, _ = jax.lax.fori_loop(0, 32, shrink_loop, (l0, lmax >> 1))
    j = i + l * d
    delta_node = delta(i, j)

    # split search: largest s in [min(i,j), max(i,j)) with
    # delta(i, split+1) > delta_node
    def split_loop(t, carry):
        s, step = carry
        step = (step + 1) >> 1
        cond = delta(i, i + (s + step) * d) > delta_node
        s = jnp.where(cond, s + step, s)
        return s, step

    s0 = jnp.zeros((n - 1,), jnp.int32)
    s, _ = jax.lax.fori_loop(0, 32, split_loop, (s0, l))
    gamma = i + s * d + jnp.minimum(d, 0)

    lo = jnp.minimum(i, j)
    hi = jnp.maximum(i, j)
    # child ids: internal node k < n-1; leaf k encoded as k + (n-1)
    left = jnp.where(lo == gamma, gamma + (n - 1), gamma)
    right = jnp.where(hi == gamma + 1, gamma + n, gamma + 1)

    # refit: fixed-point level sweep
    big = jnp.float32(3.0e38)
    node_min = jnp.concatenate(
        [jnp.full((n - 1, dim), big), smin], axis=0)
    node_max = jnp.concatenate(
        [jnp.full((n - 1, dim), -big), smax], axis=0)

    def refit(_, mm):
        nmin, nmax = mm
        lmin = nmin[left]
        rmin = nmin[right]
        lmaxx = nmax[left]
        rmaxx = nmax[right]
        new_min = jnp.minimum(lmin, rmin)
        new_max = jnp.maximum(lmaxx, rmaxx)
        nmin = nmin.at[: n - 1].set(new_min)
        nmax = nmax.at[: n - 1].set(new_max)
        return nmin, nmax

    node_min, node_max = jax.lax.fori_loop(0, refit_rounds, refit,
                                           (node_min, node_max))
    return Lbvh(left, right, node_min, node_max, order)


_STACK = 64


def _traverse_counts(tree: Lbvh, qmin, qmax, leaf_rank):
    """Per-leaf traversal counting overlapping later-ranked leaves.

    ``leaf_rank``: this query's leaf rank (pairs deduped by sorted-leaf rank
    ordering). Returns counts [n].
    """
    n = tree.num_leaves

    def count_one(qmn, qmx, rank):
        def cond(state):
            sp, _, _ = state
            return sp > 0

        def body(state):
            sp, stack, cnt = state
            node = stack[sp - 1]
            sp -= 1
            is_leaf = node >= n - 1
            nmin = tree.node_min[node]
            nmax = tree.node_max[node]
            overlap = jnp.all((qmn <= nmax) & (nmin <= qmx))
            leaf_idx = node - (n - 1)
            emit = is_leaf & overlap & (leaf_idx > rank)
            cnt += emit.astype(jnp.int32)
            push = overlap & ~is_leaf
            stack = stack.at[sp].set(jnp.where(push, tree.left[jnp.minimum(node, n - 2)], 0))
            sp1 = sp + push.astype(jnp.int32)
            stack = stack.at[sp1].set(jnp.where(push, tree.right[jnp.minimum(node, n - 2)], 0))
            sp = sp1 + push.astype(jnp.int32)
            return sp, stack, cnt

        stack = jnp.zeros((_STACK,), jnp.int32)
        root = jnp.int32(0) if n > 1 else jnp.int32(n - 1)
        stack = stack.at[0].set(root)
        _, _, cnt = jax.lax.while_loop(cond, body, (jnp.int32(1), stack, jnp.int32(0)))
        return cnt

    return jax.vmap(count_one)(qmin, qmax, leaf_rank)


def _traverse_emit(tree: Lbvh, qmin, qmax, leaf_rank, offsets, out_cap):
    """Second pass: emit (rank, other_rank) pairs at offsets."""
    n = tree.num_leaves

    def emit_one(qmn, qmx, rank, base):
        def cond(state):
            sp, *_ = state
            return sp > 0

        def body(state):
            sp, stack, k, acc = state
            node = stack[sp - 1]
            sp -= 1
            is_leaf = node >= n - 1
            nmin = tree.node_min[node]
            nmax = tree.node_max[node]
            overlap = jnp.all((qmn <= nmax) & (nmin <= qmx))
            leaf_idx = node - (n - 1)
            emit = is_leaf & overlap & (leaf_idx > rank)
            store = emit & (k < _PER_LEAF_CAP)
            acc = acc.at[jnp.where(store, k, _PER_LEAF_CAP)].set(
                leaf_idx, mode="drop")
            k += store.astype(jnp.int32)
            push = overlap & ~is_leaf
            stack = stack.at[sp].set(jnp.where(push, tree.left[jnp.minimum(node, n - 2)], 0))
            sp1 = sp + push.astype(jnp.int32)
            stack = stack.at[sp1].set(jnp.where(push, tree.right[jnp.minimum(node, n - 2)], 0))
            sp = sp1 + push.astype(jnp.int32)
            return sp, stack, k, acc

        stack = jnp.zeros((_STACK,), jnp.int32)
        root = jnp.int32(0) if n > 1 else jnp.int32(n - 1)
        stack = stack.at[0].set(root)
        acc = jnp.zeros((_PER_LEAF_CAP,), jnp.int32)
        _, _, k, acc = jax.lax.while_loop(
            cond, body, (jnp.int32(1), stack, jnp.int32(0), acc))
        return k, acc

    return jax.vmap(emit_one)(qmin, qmax, leaf_rank, offsets)


_PER_LEAF_CAP = 64


@functools.partial(jax.jit, static_argnames=("capacity",))
def find_pairs_lbvh(mins: jax.Array, maxs: jax.Array, *,
                    capacity: int) -> PairList:
    """Overlapping AABB pairs via LBVH (≙ Lbvh::find_pairs, lbvh.rs:285-321).

    Each leaf emits into a bounded per-leaf window (``_PER_LEAF_CAP``) and
    windows are compacted via exclusive scan — the count is exact, pairs
    beyond either the per-leaf window or total ``capacity`` are dropped and
    reported through ``count`` for re-bucketing.
    """
    n = mins.shape[0]
    tree = build(mins, maxs)
    ranks = jnp.arange(n, dtype=jnp.int32)
    qmin = tree.node_min[n - 1:]
    qmax = tree.node_max[n - 1:]

    counts = _traverse_counts(tree, qmin, qmax, ranks)
    total = jnp.sum(counts)  # exact — reported for re-bucketing
    counts_c = jnp.minimum(counts, _PER_LEAF_CAP)
    emitted = jnp.sum(counts_c)
    offsets = jnp.concatenate([jnp.zeros(1, jnp.int32),
                               jnp.cumsum(counts_c)[:-1].astype(jnp.int32)])
    _, acc = _traverse_emit(tree, qmin, qmax, ranks, offsets, capacity)

    # scatter per-leaf windows into the global buffer
    slot = jnp.arange(_PER_LEAF_CAP, dtype=jnp.int32)
    valid_slot = slot[None, :] < counts_c[:, None]
    pos = offsets[:, None] + slot[None, :]
    pos = jnp.where(valid_slot & (pos < capacity), pos, capacity)
    body_a = tree.order[ranks]
    a_flat = jnp.broadcast_to(body_a[:, None], pos.shape).reshape(-1)
    b_flat = tree.order[acc.reshape(-1)]
    out_a = jnp.zeros((capacity,), jnp.int32).at[pos.reshape(-1)].set(
        a_flat, mode="drop")
    out_b = jnp.zeros((capacity,), jnp.int32).at[pos.reshape(-1)].set(
        b_flat, mode="drop")
    # per-leaf window overflow also signals through count so the host
    # re-buckets (a larger pair capacity implies denser scenes anyway)
    total = jnp.where(jnp.any(counts > _PER_LEAF_CAP),
                      jnp.maximum(total, capacity + 1), total)
    valid = jnp.arange(capacity) < jnp.minimum(emitted, capacity)
    # normalize (a < b) for downstream warmstart pair matching
    lo = jnp.minimum(out_a, out_b)
    hi = jnp.maximum(out_a, out_b)
    return PairList(lo, hi, valid, total)
