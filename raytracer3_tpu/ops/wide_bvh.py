"""8-wide BVH: collapse of the binary LBVH + vectorized traversal.

Motivation (TPU): the binary lockstep traversal (ops/traverse.py) pays one
XLA while-loop iteration per visited node — each iteration is a separate
fusion with HBM round-trips. An 8-ary BVH cuts the visit count ~3-4× and
turns each iteration into dense [N, 8] AABB arithmetic, exactly the shape the
VPU wants. Leaves hold up to `leaf_size` triangles that are *contiguous in
Morton order* (a property of the Karras range construction), so leaf entries
encode (start, count) into the sorted triangle order — no extra indirection.

This (plus quantization, later) follows the wide-BVH/ray-stream literature
referenced in PAPERS.md; the collapse runs host-side at scene build, like the
reference's one-time acceleration-structure build (raytracing.rs:88-148).

STATUS (round 5): the 8-wide tables built here feed the production cluster
builder (ops/cluster_bvh) — that path is live. The XLA-level traversal in
THIS module (`wide_intersect`) is the INTERPRET-MODE REFERENCE
IMPLEMENTATION: superseded on-chip by the Pallas packet/treelet kernels
(ops/pallas/traverse_kernel.py), it remains the readable, pure-jnp oracle
the kernel tests compare against and the CPU fallback for environments
without Mosaic. It is intentionally kept; do not route production traces
through it.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from raytracer3_tpu.ops import bvh as bvh_mod
from raytracer3_tpu.ops import intersect, mathx

WIDTH = 8
STACK_DEPTH = 48
_LEAF_COUNT_BITS = 4
_LEAF_COUNT_MAX = (1 << _LEAF_COUNT_BITS) - 1


class WideBVH(NamedTuple):
    child_min: jax.Array  # [W, 8, 3] f32 (+inf for empty slots)
    child_max: jax.Array  # [W, 8, 3] f32 (-inf for empty slots)
    # child_code: empty → -1; internal → wide node id (>= 0);
    # leaf → -(start << 4 | count) - 2  (count in [1, 15])
    child_code: jax.Array  # [W, 8] int32
    tri_order: jax.Array  # [T] int32 morton-sorted triangle ids
    tri_v0: jax.Array  # [T, 3] pre-gathered sorted triangle vertices
    tri_v1: jax.Array
    tri_v2: jax.Array


def _binary_ranges(left: np.ndarray, right: np.ndarray, t: int):
    """Leaf-range [lo, hi] per binary internal node (iterative postorder)."""
    lo = np.full(t - 1, -1, np.int64)
    hi = np.full(t - 1, -1, np.int64)

    def leaf_range(c):
        if c >= t - 1:
            k = c - (t - 1)
            return k, k
        return None

    stack = [(0, False)]
    while stack:
        node, processed = stack.pop()
        l, r = left[node], right[node]
        if processed:
            llo, lhi = (leaf_range(l) or (lo[l], hi[l]))
            rlo, rhi = (leaf_range(r) or (lo[r], hi[r]))
            lo[node] = min(llo, rlo)
            hi[node] = max(lhi, rhi)
        else:
            stack.append((node, True))
            for c in (l, r):
                if c < t - 1:
                    stack.append((int(c), False))
    return lo, hi


def collapse(bvh: bvh_mod.BVH, v0, v1, v2, leaf_size: int = 4, width: int = WIDTH) -> WideBVH:
    """Collapse a binary LBVH into a `width`-ary BVH (host-side numpy)."""
    assert 1 <= leaf_size <= _LEAF_COUNT_MAX
    t = bvh.num_tris
    left = np.asarray(bvh.node_left)
    right = np.asarray(bvh.node_right)
    nmin = np.asarray(bvh.node_min)
    nmax = np.asarray(bvh.node_max)
    lo, hi = _binary_ranges(left, right, t)

    def subtree_size(b):
        if b >= t - 1:
            return 1
        return int(hi[b] - lo[b] + 1)

    def subtree_range(b):
        if b >= t - 1:
            k = b - (t - 1)
            return k, k
        return int(lo[b]), int(hi[b])

    wide_children: list[list] = []  # per wide node: list of (binary_id, is_leaf_range)

    # Build wide nodes breadth-first; each entry is a binary node id to expand.
    pending = [0]  # binary ids to become wide nodes
    wide_of_binary = {0: 0}
    wide_children.append(None)
    out_codes = []
    while pending:
        b = pending.pop(0)
        w = wide_of_binary[b]
        # Gather up to 8 slots by splitting the largest internal child.
        slots = [left[b], right[b]] if b < t - 1 else [b]
        while len(slots) < width:
            # find expandable slot: internal node with subtree > leaf_size
            best = -1
            best_sz = 0
            for si, sb in enumerate(slots):
                if sb < t - 1:
                    sz = subtree_size(sb)
                    if sz > leaf_size and sz > best_sz:
                        best, best_sz = si, sz
            if best < 0:
                break
            sb = slots.pop(best)
            slots.extend([left[sb], right[sb]])
        wide_children[w] = list(slots)
        # Children that stay internal become new wide nodes.
        for sb in slots:
            sb = int(sb)
            if sb < t - 1 and subtree_size(sb) > leaf_size:
                if sb not in wide_of_binary:
                    wide_of_binary[sb] = len(wide_children)
                    wide_children.append(None)
                    pending.append(sb)

    wn = len(wide_children)
    child_min = np.full((wn, width, 3), np.inf, np.float32)
    child_max = np.full((wn, width, 3), -np.inf, np.float32)
    child_code = np.full((wn, width), -1, np.int32)

    for b, w in wide_of_binary.items():
        for si, sb in enumerate(wide_children[w]):
            sb = int(sb)
            if sb >= t - 1:  # single-triangle binary leaf
                start = sb - (t - 1)
                cmin, cmax = nmin[sb], nmax[sb]
                code = -(((start << _LEAF_COUNT_BITS) | 1)) - 2
            elif subtree_size(sb) <= leaf_size:  # multi-tri leaf range
                start, end = subtree_range(sb)
                count = end - start + 1
                cmin, cmax = nmin[sb], nmax[sb]
                code = -(((start << _LEAF_COUNT_BITS) | count)) - 2
            else:  # internal
                cmin, cmax = nmin[sb], nmax[sb]
                code = wide_of_binary[sb]
            child_min[w, si] = cmin
            child_max[w, si] = cmax
            child_code[w, si] = code

    order = np.asarray(bvh.leaf_tri)
    v0s = np.asarray(v0)[order]
    v1s = np.asarray(v1)[order]
    v2s = np.asarray(v2)[order]
    # HOST arrays on purpose: cluster_bvh.build_cluster_bvh_host immediately
    # reads these back with np.asarray — returning device arrays cost 4
    # tunnel round-trips *per treelet* (~4 s each on the tunneled TPU).
    # build_wide uploads for callers that want device tables.
    return WideBVH(
        child_min=child_min,
        child_max=child_max,
        child_code=child_code,
        tri_order=order.astype(np.int32),
        tri_v0=v0s,
        tri_v1=v1s,
        tri_v2=v2s,
    )


def build_wide(v0, v1, v2, leaf_size: int = 4) -> WideBVH:
    """LBVH build (device) + collapse (host) + one bulk device upload."""
    bvh = jax.jit(bvh_mod.build_lbvh)(v0, v1, v2)
    wb = collapse(jax.tree.map(np.asarray, bvh), v0, v1, v2, leaf_size)
    return WideBVH(*(jnp.asarray(a) for a in wb))


# ---------------------------------------------------------------------------
# Traversal
# ---------------------------------------------------------------------------


def wbvh_intersect(
    wb: WideBVH,
    origins: jax.Array,
    directions: jax.Array,
    t_min: float = 1e-4,
    t_max=mathx.BACKGROUND_DEPTH,
    any_hit: bool = False,
    leaf_size: int = 4,
) -> intersect.Hit:
    """Lockstep 8-wide traversal. Stack entries reuse the child_code encoding
    (internal id ≥ 0, leaf ranges < -1, empty -1)."""
    n = origins.shape[0]
    d = jnp.where(jnp.abs(directions) < 1e-12, 1e-12, directions)
    inv_d = 1.0 / d
    t_max_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    lanes = jnp.arange(n)

    state = dict(
        stack=jnp.zeros((n, STACK_DEPTH), jnp.int32),
        sp=jnp.ones((n,), jnp.int32),  # root (wide node 0) pre-pushed
        best_t=t_max_arr,
        best_u=jnp.zeros((n,), jnp.float32),
        best_v=jnp.zeros((n,), jnp.float32),
        best_id=jnp.full((n,), -1, jnp.int32),
    )

    def cond(st):
        return jnp.any(st["sp"] > 0)

    def body(st):
        sp = st["sp"]
        running = sp > 0
        sp_pop = jnp.maximum(sp - 1, 0)
        entry = st["stack"][lanes, sp_pop]
        sp = jnp.where(running, sp_pop, sp)

        is_leaf = entry < -1
        is_node = running & (entry >= 0)

        # --- Leaf: intersect up to leaf_size contiguous triangles --------
        leaf_bits = -(entry + 2)
        start = leaf_bits >> _LEAF_COUNT_BITS
        count = leaf_bits & _LEAF_COUNT_MAX
        best_t, best_u, best_v, best_id = (
            st["best_t"], st["best_u"], st["best_v"], st["best_id"],
        )
        for j in range(leaf_size):
            ti = jnp.clip(start + j, 0, wb.tri_order.shape[0] - 1)
            tt, uu, vv, hh = intersect.ray_triangle(
                origins, directions, wb.tri_v0[ti], wb.tri_v1[ti], wb.tri_v2[ti],
                t_min, best_t,
            )
            take = running & is_leaf & (j < count) & hh & (tt < best_t)
            best_t = jnp.where(take, tt, best_t)
            best_u = jnp.where(take, uu, best_u)
            best_v = jnp.where(take, vv, best_v)
            best_id = jnp.where(take, wb.tri_order[ti], best_id)

        # --- Internal: test 8 children, push far-to-near ------------------
        node = jnp.clip(entry, 0, wb.child_code.shape[0] - 1)
        cmin = wb.child_min[node]  # [N, 8, 3]
        cmax = wb.child_max[node]
        codes = wb.child_code[node]  # [N, 8]
        tn, hit8 = intersect.ray_aabb(
            origins[:, None, :], inv_d[:, None, :], cmin, cmax,
            t_min, best_t[:, None],
        )
        valid8 = hit8 & (codes != -1) & is_node[:, None]
        # Sort children by descending t_near so nearest is pushed last.
        key = jnp.where(valid8, tn, -jnp.inf)
        order = jnp.argsort(-key, axis=1)  # far → near
        codes_s = jnp.take_along_axis(codes, order, axis=1)
        valid_s = jnp.take_along_axis(valid8, order, axis=1)

        stack = st["stack"]
        for c in range(WIDTH):
            push = valid_s[:, c]
            idx = jnp.where(push, sp, STACK_DEPTH)
            stack = stack.at[lanes, idx].set(codes_s[:, c], mode="drop")
            # Clamp so an overflowing push drops entries instead of letting
            # later pops read out of range and decode as the root (live-lock).
            sp = jnp.minimum(sp + push.astype(jnp.int32), STACK_DEPTH)

        if any_hit:
            sp = jnp.where(best_id >= 0, 0, sp)

        return dict(
            stack=stack, sp=sp, best_t=best_t, best_u=best_u,
            best_v=best_v, best_id=best_id,
        )

    st = jax.lax.while_loop(cond, body, state)
    found = st["best_id"] >= 0
    return intersect.Hit(
        t=jnp.where(found, st["best_t"], mathx.BACKGROUND_DEPTH),
        uv=jnp.stack([st["best_u"], st["best_v"]], axis=-1),
        prim_id=st["best_id"],
        hit=found,
    )


def make_wide_backend(scene, leaf_size: int = 4):
    """Scene → (intersect_fn, occluded_fn, WideBVH)."""
    v0, v1, v2 = scene.tri_vertices()
    wb = build_wide(v0, v1, v2, leaf_size)

    def isect(o, d):
        return wbvh_intersect(wb, o, d, leaf_size=leaf_size)

    def occl(o, d, tmax):
        return wbvh_intersect(
            wb, o, d, t_max=tmax, any_hit=True, leaf_size=leaf_size
        ).hit

    return isect, occl, wb
