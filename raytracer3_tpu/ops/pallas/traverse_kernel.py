"""Pallas packet-traversal kernel: the speed-of-light path for BVH tracing.

Hardware rationale (measured, see ops/cluster_bvh.py docstring): Mosaic has
no fast per-lane gather, but *scalar* dynamic slices from VMEM are cheap and
scalar control flow compiles to real branches. So rays are traced in
**packets of 1024** (an [8, 128] register tile per component): the packet
shares one traversal stack in SMEM (scalar ints), each popped node is fetched
with a scalar dynamic slice, its 8 child boxes are tested against all 1024
rays as dense [8, 128] vector math, and a child is pushed if *any* ray wants
it. Leaf clusters branch (scalar predicate → genuinely skipped when no ray
hits) into 8 Möller–Trumbore tests broadcast across the packet.

This is classic packet tracing (coherent rays share work; the packet visits
the union of its rays' nodes), mapped onto the TPU's scalar-vs-vector split.
Ray coherence is restored between bounces by the wavefront sorter
(render/wavefront.py), mirroring the ray-reordering literature in PAPERS.md.

Tables come from ops/cluster_bvh.build_cluster_bvh; cluster rows are repacked
to carry triangle ids in their padding lanes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer3_tpu.ops import cluster_bvh as cb_mod
from raytracer3_tpu.ops import intersect, mathx

PACKET_SUBLANES = 64  # default sublane rows per packet (64 × 128 = 8192 rays;
# measured on v5e: bigger packets amortize the scalar per-node overhead)
STACK = 64
_BG = mathx.BACKGROUND_DEPTH


def _sort_network(n: int):
    """Batcher odd-even mergesort compare-exchange pairs for n a power of 2."""
    pairs = []
    p = 1
    while p < n:
        k = p
        while k >= 1:
            for j in range(k % p, n - k, 2 * k):
                for i in range(0, min(k, n - j - k)):
                    if (i + j) // (2 * p) == (i + j + k) // (2 * p):
                        pairs.append((i + j, i + j + k))
            k //= 2
        p *= 2
    return pairs


class PacketTables(NamedTuple):
    node_table: jax.Array  # [M, *] f32 (cmin 3w | cmax 3w | codes w | pad)
    cluster_table: jax.Array  # [C, 128] f32 (9L tri data | L tri ids | pad)
    leaf_size: int
    num_nodes: int
    num_clusters: int
    width: int = 8
    depth: int = 1  # tree depth (root = 1) — sizes the traversal stack


def pack_tables(cb: cb_mod.ClusterBVH) -> PacketTables:
    """Repack ClusterBVH for the kernel: cluster rows append triangle ids.
    Row length is the lane-multiple that fits 9·L floats + L ids."""
    ls = cb.leaf_size
    row_len = ((9 * ls + ls + 127) // 128) * 128
    ct = np.asarray(cb.cluster_table)
    tids = np.asarray(cb.tri_id).astype(np.float32)
    rows = np.zeros((ct.shape[0], row_len), np.float32)
    rows[:, : 9 * ls] = ct[:, : 9 * ls]
    rows[:, 9 * ls : 9 * ls + ls] = tids
    return PacketTables(
        node_table=cb.node_table,
        cluster_table=jnp.asarray(rows),
        leaf_size=ls,
        num_nodes=cb.num_nodes,
        num_clusters=cb.num_clusters,
        width=cb.width,
        depth=cb.depth,
    )


def _kernel(
    rays_ref,  # [1, 8, 8, 128]: attr (ox oy oz dx dy dz tmax unused)
    nodes_ref,  # [M, 64]
    clusters_ref,  # [C, 128]
    out_ref,  # [1, 4, 8, 128]: t, u, v, prim_id(f32 bits)
    *,
    leaf_size: int,
    any_hit: bool,
    t_min: float,
    width: int = 8,
    use_masks: bool = False,
    stack: int = STACK,
):
    def scoped(stack_ref, mask_ref, child_mask_ref):
        ox = rays_ref[0, 0]
        oy = rays_ref[0, 1]
        oz = rays_ref[0, 2]
        dx = rays_ref[0, 3]
        dy = rays_ref[0, 4]
        dz = rays_ref[0, 5]
        t_cap = rays_ref[0, 6]

        eps = 1e-12
        ix = 1.0 / jnp.where(jnp.abs(dx) < eps, eps, dx)
        iy = 1.0 / jnp.where(jnp.abs(dy) < eps, eps, dy)
        iz = 1.0 / jnp.where(jnp.abs(dz) < eps, eps, dz)

        stack_ref[0] = 0  # root
        if use_masks:
            mask_ref[0] = jnp.ones_like(ox)  # all rays active at the root

        # The stack pointer travels in the while carry, NOT in SMEM: a loop
        # condition reading a mutated ref never terminates in interpret mode,
        # and a carried scalar also spares Mosaic one SMEM round-trip per
        # iteration.
        init = (
            jnp.int32(1),  # sp
            t_cap,  # best_t
            jnp.zeros_like(ox),  # u
            jnp.zeros_like(ox),  # v
            jnp.full_like(ox, -1.0),  # prim id (float)
        )

        def cond(carry):
            return carry[0] > 0

        def body(carry):
            sp, best_t, best_u, best_v, best_id = carry
            sp = sp - 1
            entry = stack_ref[sp]
            # Per-ray active mask recorded when this entry was pushed: only
            # rays that hit the child's AABB participate in its subtree —
            # the packet narrows hierarchically instead of scanning the tree
            # with the full-union any-hit test.
            active = (mask_ref[sp] > 0.5) if use_masks else True

            def handle_node(carry):
                # Expand an internal node: width AABB packet tests, order
                # children near-first, push every taken child (leaf codes and
                # internal ids share the stack; leaves are handled at pop).
                sp, best_t, best_u, best_v, best_id = carry
                row = nodes_ref[entry]  # scalar dynamic index
                masked_tn = []
                slot_codes = []
                slot_real = []
                for s in range(width):
                    cminx = row[s * 3 + 0]
                    cminy = row[s * 3 + 1]
                    cminz = row[s * 3 + 2]
                    cmaxx = row[3 * width + s * 3 + 0]
                    cmaxy = row[3 * width + s * 3 + 1]
                    cmaxz = row[3 * width + s * 3 + 2]
                    code = row[6 * width + s]

                    t0x = (cminx - ox) * ix
                    t1x = (cmaxx - ox) * ix
                    t0y = (cminy - oy) * iy
                    t1y = (cmaxy - oy) * iy
                    t0z = (cminz - oz) * iz
                    t1z = (cmaxz - oz) * iz
                    tn = jnp.maximum(
                        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                        jnp.maximum(jnp.minimum(t0z, t1z), t_min),
                    )
                    tf = jnp.minimum(
                        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                        jnp.minimum(jnp.maximum(t0z, t1z), best_t),
                    )
                    hit_here = (tn <= tf) & active if use_masks else (tn <= tf)
                    masked_tn.append(jnp.where(hit_here, tn, jnp.inf))
                    slot_codes.append(code)
                    slot_real.append(jnp.abs(code + 1.0) > 0.25)

                # Per-slot packet stats via one sublane fold per slot + a
                # single cross-lane reduction over the [width, 128] stack
                # (cross-packet reductions are the scalar-side bottleneck).
                folded = [jnp.min(m, axis=0) for m in masked_tn]
                keys_vec = jnp.min(jnp.stack(folded), axis=1)  # [width]
                keys = [keys_vec[s] for s in range(width)]
                codes_l = list(slot_codes)
                takes = [
                    (keys[s] < jnp.inf) & slot_real[s] for s in range(width)
                ]
                idxs = list(range(width))  # original slot of each sorted entry
                # Child masks staged in scratch so pushes can copy them with
                # a dynamic (sorted) slot index — Mosaic only supports
                # dynamic indexing on refs, not values.
                if use_masks:
                    for s in range(width):
                        child_mask_ref[s] = jnp.where(
                            masked_tn[s] < jnp.inf, 1.0, 0.0
                        )

                # Scalar sort (descending key): push far-first so the nearest
                # child pops first. Any-hit queries skip the ordering.
                if not any_hit:
                    for a, b in _sort_network(width):
                        swap = keys[a] < keys[b]  # descending

                        def pick(x, y):
                            return jnp.where(swap, y, x), jnp.where(swap, x, y)

                        keys[a], keys[b] = pick(keys[a], keys[b])
                        codes_l[a], codes_l[b] = pick(codes_l[a], codes_l[b])
                        takes[a], takes[b] = pick(takes[a], takes[b])
                        ia = jnp.asarray(idxs[a], jnp.int32)
                        ib = jnp.asarray(idxs[b], jnp.int32)
                        idxs[a], idxs[b] = pick(ia, ib)

                # Compacted branch-free pushes: slot s lands at
                # sp + (#takes before s), clamped to the (build-sized) stack.
                pushed = jnp.int32(0)
                for s in range(width):
                    code = codes_l[s]
                    take = takes[s]
                    orig = idxs[s]
                    pos = jnp.minimum(sp + pushed, stack - 1)

                    @pl.when(take)
                    def _(code=code, orig=orig, pos=pos):
                        stack_ref[pos] = code.astype(jnp.int32)
                        if use_masks:
                            mask_ref[pos] = child_mask_ref[orig]

                    pushed = pushed + take.astype(jnp.int32)

                sp = jnp.minimum(sp + pushed, stack)
                return sp, best_t, best_u, best_v, best_id

            def handle_leaf(carry):
                sp, best_t, best_u, best_v, best_id = carry
                cl = -entry - 2  # int32 leaf code
                crow = clusters_ref[cl]  # [128]
                for j in range(leaf_size):
                    b = j * 9
                    v0x, v0y, v0z = crow[b], crow[b + 1], crow[b + 2]
                    e1x, e1y, e1z = crow[b + 3], crow[b + 4], crow[b + 5]
                    e2x, e2y, e2z = crow[b + 6], crow[b + 7], crow[b + 8]
                    tid = crow[9 * leaf_size + j]
                    # pvec = d × e2
                    px_ = dy * e2z - dz * e2y
                    py_ = dz * e2x - dx * e2z
                    pz_ = dx * e2y - dy * e2x
                    det = e1x * px_ + e1y * py_ + e1z * pz_
                    inv_det = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)
                    tx = ox - v0x
                    ty = oy - v0y
                    tz = oz - v0z
                    uu = (tx * px_ + ty * py_ + tz * pz_) * inv_det
                    # qvec = tvec × e1
                    qx = ty * e1z - tz * e1y
                    qy = tz * e1x - tx * e1z
                    qz = tx * e1y - ty * e1x
                    vv = (dx * qx + dy * qy + dz * qz) * inv_det
                    tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                    ok = (
                        (active if use_masks else (jnp.abs(det) > -1.0))
                        & (jnp.abs(det) > 1e-9)
                        & (uu >= 0.0)
                        & (vv >= 0.0)
                        & (uu + vv <= 1.0)
                        & (tt > t_min)
                        & (tt < best_t)
                        & (tid >= 0.0)
                    )
                    best_t = jnp.where(ok, tt, best_t)
                    best_u = jnp.where(ok, uu, best_u)
                    best_v = jnp.where(ok, vv, best_v)
                    best_id = jnp.where(ok, tid, best_id)
                return sp, best_t, best_u, best_v, best_id

            carry = jax.lax.cond(
                entry >= 0,
                handle_node,
                handle_leaf,
                (sp, best_t, best_u, best_v, best_id),
            )
            if any_hit:
                # Terminate the packet when every live ray is blocked
                # (padding rays carry t_cap <= t_min and count as done).
                done = (carry[4] >= 0.0) | (t_cap <= t_min)
                carry = (
                    jnp.where(jnp.all(done), 0, carry[0]),
                ) + carry[1:]

            return carry

        _, best_t, best_u, best_v, best_id = jax.lax.while_loop(cond, body, init)
        out_ref[0, 0] = best_t
        out_ref[0, 1] = best_u
        out_ref[0, 2] = best_v
        out_ref[0, 3] = best_id

    sublanes = rays_ref.shape[2]
    mdepth = stack if use_masks else 1
    mw = width if use_masks else 1
    pl.run_scoped(
        scoped,
        pltpu.SMEM((stack,), jnp.int32),
        pltpu.VMEM((mdepth, sublanes, 128), jnp.float32),
        pltpu.VMEM((mw, sublanes, 128), jnp.float32),
    )


def packet_intersect(
    pt: PacketTables,
    origins: jax.Array,
    directions: jax.Array,
    t_min: float = 1e-4,
    t_max=_BG,
    any_hit: bool = False,
    interpret: bool = False,
    sublanes: int = PACKET_SUBLANES,
    use_masks: bool = False,
) -> intersect.Hit:
    """Trace rays [N, 3] through the packet kernel. N is padded to a multiple
    of PACKET; callers should order rays coherently (tiles / sorted queues)."""
    n = origins.shape[0]
    packet = sublanes * 128
    g = (n + packet - 1) // packet
    pad = g * packet - n

    t_cap = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    o = jnp.pad(origins, ((0, pad), (0, 0)))
    d = jnp.pad(directions, ((0, pad), (0, 0)), constant_values=1.0)
    tc = jnp.pad(t_cap, (0, pad))  # zero t_cap → padding rays never hit

    rays = jnp.stack(
        [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], tc, tc], axis=0
    )  # [8, G*packet]
    rays = rays.reshape(8, g, sublanes, 128).transpose(1, 0, 2, 3)

    # Worst case ≤ (width-1) siblings left per level + the entry in flight.
    stack = max(STACK, (pt.width - 1) * pt.depth + 1)
    kernel = functools.partial(
        _kernel, leaf_size=pt.leaf_size, any_hit=any_hit, t_min=t_min,
        width=pt.width, use_masks=use_masks, stack=stack,
    )
    out = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 8, sublanes, 128), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 4, sublanes, 128), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((g, 4, sublanes, 128), jnp.float32),
        interpret=interpret,
    )(rays, pt.node_table, pt.cluster_table)

    out = out.transpose(1, 0, 2, 3).reshape(4, g * packet)[:, :n]
    best_t, u, v, fid = out[0], out[1], out[2], out[3]
    prim_id = fid.astype(jnp.int32)
    found = prim_id >= 0
    return intersect.Hit(
        t=jnp.where(found, best_t, _BG),
        uv=jnp.stack([u, v], axis=-1),
        prim_id=prim_id,
        hit=found,
    )


def make_packet_backend(
    scene, leaf_size: int = 12, interpret: bool = False,
    sublanes: int = PACKET_SUBLANES, width: int = 16,
    use_masks: bool = False,
):
    """Scene → (intersect_fn, occluded_fn, PacketTables)."""
    v0, v1, v2 = scene.tri_vertices()
    cb = cb_mod.build_cluster_bvh(v0, v1, v2, leaf_size, width=width)
    pt = pack_tables(cb)

    def isect(o, d):
        return packet_intersect(
            pt, o, d, interpret=interpret, sublanes=sublanes,
            use_masks=use_masks,
        )

    def occl(o, d, tmax):
        return packet_intersect(
            pt, o, d, t_max=tmax, any_hit=True, interpret=interpret,
            sublanes=sublanes, use_masks=use_masks,
        ).hit

    return isect, occl, pt
