"""CPU experiment: does a degree-aware Luby claim priority reduce the
number of occupied color classes on the settled 10k pair graph?

The sweep ladder pays ~55 us per rung per sweep pass (8 passes/step), so
2-4 fewer classes is ~1-2 ms/step. The standard claim uses hash-random
priorities; here pairs with higher conflict degree (sum of endpoint pair
degrees) get numerically smaller priorities so they claim early classes,
leaving low-degree pairs to fill in — classic largest-degree-first greedy
coloring, known to use fewer colors than random order.

Runs entirely on CPU (coloring is deterministic given inputs).
Run: python scripts/exp_degree_priority.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from wgmath_tpu.utils import checkpoint  # noqa: E402

CKPT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    ".settled_10k_v4.pkl")


def color_edges(ba, bb, valid, dyn_a, dyn_b, n, *, max_colors, claim_rounds,
                class_cap, degree_weight: bool):
    """Standalone copy of solver._color_edges with an optional
    degree-weighted priority (high conflict degree -> smaller priority)."""
    c = ba.shape[0]
    idx_bits = max(int(c - 1).bit_length(), 1)
    inf = jnp.uint32(0xFFFFFFFF)
    idx = jnp.arange(c, dtype=jnp.int32)
    dyn2 = jnp.concatenate([dyn_a, dyn_b])
    bodies2 = jnp.concatenate([ba, bb])

    if degree_weight:
        deg_b = jax.ops.segment_sum(
            jnp.concatenate([valid, valid]).astype(jnp.int32),
            jnp.clip(bodies2, 0, n - 1), num_segments=n)
        deg_pair = deg_b[ba] + deg_b[bb]  # 2..~30
        # 6-bit inverted degree band in the TOP bits: higher degree claims
        # earlier; hash bits break ties randomly inside a band
        band = jnp.clip(63 - deg_pair, 0, 63).astype(jnp.uint32)
        hash_bits = max(32 - idx_bits - 6, 2)
    else:
        band = None
        hash_bits = 32 - idx_bits

    def priorities(salt):
        h = (idx.astype(jnp.uint32) * jnp.uint32(2654435761)
             + jnp.uint32(salt) * jnp.uint32(0x9E3779B9))
        h ^= h >> 15
        if band is None:
            return (h << idx_bits) | idx.astype(jnp.uint32)
        h &= jnp.uint32((1 << hash_bits) - 1)
        return ((band << (hash_bits + idx_bits)) | (h << idx_bits)
                | idx.astype(jnp.uint32))

    def claim(colors, color):
        def one_round(r, state):
            colors, used = state
            cand = valid & (colors == 0)
            cand &= ~(used[ba] & dyn_a) & ~(used[bb] & dyn_b)
            prio = priorities(color * 31 + r)
            cand2 = jnp.concatenate([cand, cand]) & dyn2
            prio2 = jnp.concatenate([prio, prio])
            slot = jnp.full((n,), inf, jnp.uint32)
            slot = slot.at[jnp.where(cand2, bodies2, n)].min(
                jnp.where(cand2, prio2, inf), mode="drop")
            win_a = ~dyn_a | (slot[jnp.minimum(ba, n - 1)] == prio)
            win_b = ~dyn_b | (slot[jnp.minimum(bb, n - 1)] == prio)
            win = cand & win_a & win_b
            if class_cap:
                already = jnp.sum((colors == color).astype(jnp.int32))
                even = jnp.sum((valid & (colors == 0)).astype(jnp.int32)
                               ) // max(max_colors - color, 1) + 1
                cap = jnp.maximum(jnp.int32(class_cap), even)
                win &= (jnp.cumsum(win.astype(jnp.int32)) + already <= cap)
            colors = jnp.where(win, color, colors)
            win2 = jnp.concatenate([win, win]) & dyn2
            trash2 = n + jnp.arange(2 * c, dtype=jnp.int32)
            used = used.at[jnp.where(win2, bodies2, trash2)].set(
                True, mode="drop")
            return colors, used

        used = jnp.zeros((n + 2 * c,), bool)
        colors, _ = jax.lax.fori_loop(0, claim_rounds, one_round,
                                      (colors, used))
        return colors

    colors = jnp.zeros((c,), jnp.int32)
    color = 1
    while color <= max_colors and bool(jnp.any(valid & (colors == 0))):
        colors = claim(colors, color)
        color += 1
    return colors


def main():
    blob = checkpoint.load(CKPT)
    state = blob["state"]
    p = state.bp_pairs
    ba = jnp.asarray(np.asarray(p.body_a))
    bb = jnp.asarray(np.asarray(p.body_b))
    valid = jnp.asarray(np.asarray(p.valid))
    n = state.bodies.poses.translation.shape[0]
    dyn = state.bodies.is_dynamic()
    dyn = jnp.asarray(np.asarray(dyn))
    print(f"pairs={int(valid.sum())} of {valid.shape[0]}")

    for name, dw, cap in (("hash", False, 1024), ("degree", True, 1024),
                          ("hash capless", False, 0),
                          ("degree capless", True, 0)):
        cols = color_edges(ba, bb, valid, dyn[ba], dyn[bb], n,
                           max_colors=24, claim_rounds=4, class_cap=cap,
                           degree_weight=dw)
        cnts = np.bincount(np.asarray(cols)[np.asarray(valid)],
                           minlength=25)
        occ = int((cnts[1:] > 0).sum())
        print(f"{name}: occupied={occ} residue={cnts[0]} "
              f"counts={cnts[1:occ + 1].tolist()}")


if __name__ == "__main__":
    main()
