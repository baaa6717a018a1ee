"""BVH traversal: batched closest-hit and any-hit (shadow) queries.

The TPU replacement for hardware ``cmd_trace_rays``
(src/renderer/pipeline_cache/mod.rs:64-73) + the RT pipeline's fixed
closest-hit/miss behavior (shaders/old/default_hit.slang / default_miss.slang:
record t/barycentrics/primitive id, miss → sentinel).

Strategy: the whole ray wavefront advances in lockstep through one
``lax.while_loop``; every ray carries a near-first traversal stack. Per
iteration each ray either intersects a leaf triangle or descends an internal
node (both children's AABBs tested, pushed far-then-near). Dead lanes are
masked. All tree reads are dense gathers — XLA vectorizes them on the VPU.
A VMEM-resident Pallas variant lives in ops/pallas/traverse_kernel.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raytracer3_tpu.ops import bvh as bvh_mod
from raytracer3_tpu.ops import intersect, mathx

STACK_DEPTH = 64


def _prep(directions: jax.Array) -> jax.Array:
    d = jnp.where(jnp.abs(directions) < 1e-12, 1e-12, directions)
    return 1.0 / d


def bvh_intersect(
    bvh: bvh_mod.BVH,
    v0: jax.Array,
    v1: jax.Array,
    v2: jax.Array,
    origins: jax.Array,
    directions: jax.Array,
    t_min: float = 1e-4,
    t_max=mathx.BACKGROUND_DEPTH,
    any_hit: bool = False,
) -> intersect.Hit:
    """Closest-hit query for rays [N, 3] against the LBVH.

    any_hit=True turns it into an occlusion query that terminates lanes on
    the first accepted hit (shadow rays)."""
    n = origins.shape[0]
    # BVH tables may be host numpy (builders are host-native end-to-end —
    # ops/bvh.py / native.build_sah_bvh); traced indexing needs device
    # arrays, so coerce once at query entry (no-op for jax.Array fields).
    bvh = bvh_mod.BVH(*(jnp.asarray(t) for t in bvh))
    t_internal = bvh.num_internal
    inv_d = _prep(directions)
    t_max_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    lanes = jnp.arange(n)

    stack = jnp.zeros((n, STACK_DEPTH), jnp.int32)
    # Initialize: push root (node 0). For a 1-triangle degenerate tree the
    # builder requires T>=2, so root is always internal.
    sp = jnp.ones((n,), jnp.int32)

    state = dict(
        stack=stack,
        sp=sp,
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
        node = st["stack"][lanes, sp_pop]
        sp = jnp.where(running, sp_pop, sp)

        is_leaf = node >= t_internal
        node_i = jnp.clip(node, 0, t_internal - 1)

        # --- Leaf: triangle intersection --------------------------------
        leaf_idx = jnp.clip(node - t_internal, 0, bvh.num_tris - 1)
        tri = bvh.leaf_tri[leaf_idx]
        tt, uu, vv, hh = intersect.ray_triangle(
            origins, directions, v0[tri], v1[tri], v2[tri], t_min, st["best_t"]
        )
        take = running & is_leaf & hh & (tt < st["best_t"])
        best_t = jnp.where(take, tt, st["best_t"])
        best_u = jnp.where(take, uu, st["best_u"])
        best_v = jnp.where(take, vv, st["best_v"])
        best_id = jnp.where(take, tri, st["best_id"])

        # --- Internal: descend both children, near-first ----------------
        lchild = bvh.node_left[node_i]
        rchild = bvh.node_right[node_i]
        tl, hl = intersect.ray_aabb(
            origins, inv_d, bvh.node_min[lchild], bvh.node_max[lchild],
            t_min, best_t,
        )
        tr, hr = intersect.ray_aabb(
            origins, inv_d, bvh.node_min[rchild], bvh.node_max[rchild],
            t_min, best_t,
        )
        descend = running & ~is_leaf
        l_first = tl <= tr
        near = jnp.where(l_first, lchild, rchild)
        far = jnp.where(l_first, rchild, lchild)
        push_near = descend & jnp.where(l_first, hl, hr)
        push_far = descend & jnp.where(l_first, hr, hl)

        stack = st["stack"]
        # Far first so near pops first. Masked scatter via out-of-bounds drop.
        idx_far = jnp.where(push_far, sp, STACK_DEPTH)
        stack = stack.at[lanes, idx_far].set(far, mode="drop")
        sp = sp + push_far.astype(jnp.int32)
        idx_near = jnp.where(push_near, sp, STACK_DEPTH)
        stack = stack.at[lanes, idx_near].set(near, mode="drop")
        sp = sp + push_near.astype(jnp.int32)

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


def bvh_occluded(
    bvh: bvh_mod.BVH,
    v0: jax.Array,
    v1: jax.Array,
    v2: jax.Array,
    origins: jax.Array,
    directions: jax.Array,
    t_max,
    t_min: float = 1e-4,
) -> jax.Array:
    """Shadow query: True where the segment is blocked."""
    h = bvh_intersect(
        bvh, v0, v1, v2, origins, directions, t_min, t_max, any_hit=True
    )
    return h.hit


def make_bvh_backend(scene):
    """Build the BVH for a Scene and return (intersect_fn, occluded_fn)
    closures matching render/pathtracer.py's injected-backend signature."""
    v0, v1, v2 = scene.tri_vertices()
    bvh = build_lbvh_cached(v0, v1, v2)

    def isect(o, d):
        return bvh_intersect(bvh, v0, v1, v2, o, d)

    def occl(o, d, tmax):
        return bvh_occluded(bvh, v0, v1, v2, o, d, tmax)

    return isect, occl, bvh


def build_lbvh_cached(v0, v1, v2):
    """Jitted LBVH build (one XLA program; the scene-load-time analog of the
    reference's one-time AS build, world/mod.rs:137-154)."""
    build = jax.jit(bvh_mod.build_lbvh, static_argnums=())
    out = build(v0, v1, v2)
    return jax.tree.map(lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, out)
