"""Pallas packet-traversal kernel: the speed-of-light path for BVH tracing.

Hardware rationale (measured, see ops/cluster_bvh.py docstring): Mosaic has
no fast per-lane gather, but *scalar* dynamic slices from VMEM are cheap and
scalar control flow compiles to real branches. So rays are traced in
**packets of sublanes×128** (an [8, 128] register tile per component): the
packet shares one traversal stack in SMEM (scalar ints), each popped node is
fetched with a scalar dynamic slice, its child boxes are tested against all
rays as dense vector math, and a child is pushed if *any* ray wants it.

Work skipping is hierarchical at **sublane-group granularity**: every stack
entry carries a bitmask of which 8-row groups of the packet hit that child's
AABB when it was pushed. Because child boxes nest inside parent boxes, a
group that missed a box can never hit anything in its subtree, so leaf
clusters run their Möller–Trumbore tests only for active groups (predicated
[rows, 128] slabs writing straight into the output ref). With coherence-
sorted wavefronts (render/wavefront.py) most leaves activate a small fraction
of the packet, which is what makes large packets affordable: the scalar
per-node cost is amortized over 8192 rays while the vector cost scales with
the rays that actually want the subtree.

This is classic packet tracing (coherent rays share work; the packet visits
the union of its rays' nodes) mapped onto the TPU's scalar-vs-vector split,
plus the ray-reordering literature in PAPERS.md for inter-bounce coherence.

Tables come from ops/cluster_bvh.build_cluster_bvh; cluster rows are repacked
to carry triangle ids in their padding lanes.

Capability parity: this kernel is the TPU counterpart of the reference's
hardware ray dispatch (reference: src/renderer/vulkan/raytracing.rs:88-148,
cmd_trace_rays via src/renderer/pipeline_cache/mod.rs:64-73).
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

PACKET_SUBLANES = 256  # default sublane rows per packet (256 × 128 = 32768
# rays; measured on v5e: bigger packets amortize the scalar per-node overhead,
# and group-bit work skipping keeps the vector cost proportional to the rays
# that actually want each subtree, so huge packets stay affordable)
STACK = 64
GROUP_ROWS = 8  # sublane rows per work-skipping group (one native VPU tile)
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
        node_table=jnp.asarray(cb.node_table),
        cluster_table=jnp.asarray(rows),
        leaf_size=ls,
        num_nodes=cb.num_nodes,
        num_clusters=cb.num_clusters,
        width=cb.width,
        depth=cb.depth,
    )


def _kernel(
    rays_ref,  # [1, 8, S, 128]: attr (ox oy oz dx dy dz tmax unused)
    nodes_ref,  # [M, 64|128]
    clusters_ref,  # [C, 128]
    out_ref,  # [1, 4, S, 128]: t, u, v, prim_id(f32 bits)
    *,
    leaf_size: int,
    any_hit: bool,
    t_min: float,
    width: int = 8,
    stack: int = STACK,
):
    sublanes = rays_ref.shape[2]
    n_groups = max(1, sublanes // GROUP_ROWS)
    rows = sublanes // n_groups
    all_bits = -1 if n_groups >= 32 else (1 << n_groups) - 1

    def scoped(stack_ref, gbits_ref):
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

        # Hit state lives in the output ref so leaf groups can update their
        # own [rows, 128] slab without touching the rest of the packet.
        out_ref[0, 0] = t_cap  # best_t
        out_ref[0, 1] = jnp.zeros_like(ox)  # u
        out_ref[0, 2] = jnp.zeros_like(ox)  # v
        out_ref[0, 3] = jnp.full_like(ox, -1.0)  # prim id (float)

        stack_ref[0] = 0  # root
        gbits_ref[0] = jnp.int32(all_bits)

        # The stack pointer travels in the while carry, NOT in SMEM: a loop
        # condition reading a mutated ref never terminates in interpret mode,
        # and a carried scalar also spares Mosaic one SMEM round-trip per
        # iteration.
        def cond(sp):
            return sp > 0

        def body(sp):
            sp = sp - 1
            entry = stack_ref[sp]
            mbits = gbits_ref[sp]

            def handle_node(sp):
                # Expand an internal node: per active sublane-group AABB
                # tests (inactive groups skipped entirely), order children
                # near-first, push every taken child (leaf codes and internal
                # ids share the stack; leaves are handled at pop).
                row = nodes_ref[entry]  # scalar dynamic index
                slot_codes = [row[6 * width + s] for s in range(width)]
                slot_real = [
                    jnp.abs(code + 1.0) > 0.25 for code in slot_codes
                ]
                boxes = [
                    (
                        row[s * 3 + 0], row[s * 3 + 1], row[s * 3 + 2],
                        row[3 * width + s * 3 + 0],
                        row[3 * width + s * 3 + 1],
                        row[3 * width + s * 3 + 2],
                    )
                    for s in range(width)
                ]

                def group_keys(g):
                    """Row-folded min-tn per child slot over group g's rays
                    ([width, 128]; inf where the slot's box was missed)."""
                    sl = slice(g * rows, (g + 1) * rows)
                    gox, goy, goz = ox[sl], oy[sl], oz[sl]
                    gix, giy, giz = ix[sl], iy[sl], iz[sl]
                    bt = out_ref[0, 0, sl]
                    masked = []
                    for s in range(width):
                        cminx, cminy, cminz, cmaxx, cmaxy, cmaxz = boxes[s]
                        t0x = (cminx - gox) * gix
                        t1x = (cmaxx - gox) * gix
                        t0y = (cminy - goy) * giy
                        t1y = (cmaxy - goy) * giy
                        t0z = (cminz - goz) * giz
                        t1z = (cmaxz - goz) * giz
                        tn = jnp.maximum(
                            jnp.maximum(
                                jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)
                            ),
                            jnp.maximum(jnp.minimum(t0z, t1z), t_min),
                        )
                        tf = jnp.minimum(
                            jnp.minimum(
                                jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)
                            ),
                            jnp.minimum(jnp.maximum(t0z, t1z), bt),
                        )
                        masked.append(jnp.where(tn <= tf, tn, jnp.inf))
                    # Fold the row axis in one fused reduction over the
                    # stacked [width, rows, 128] block.
                    return jnp.min(jnp.stack(masked), axis=1)

                gvecs = []
                for g in range(n_groups):
                    gvecs.append(
                        jax.lax.cond(
                            ((mbits >> g) & 1) == 1,
                            functools.partial(group_keys, g),
                            lambda: jnp.full((width, 128), jnp.inf, jnp.float32),
                        )
                    )
                merged = functools.reduce(jnp.minimum, gvecs)  # [width, 128]
                keys_vec = jnp.min(merged, axis=1)  # [width]
                bits_vec = jnp.zeros((width,), jnp.int32)
                for g in range(n_groups):
                    gfin = jnp.min(gvecs[g], axis=1) < jnp.inf  # [width]
                    bits_vec = bits_vec | jnp.where(
                        gfin, jnp.left_shift(jnp.int32(1), jnp.int32(g)), 0
                    )

                keys = [keys_vec[s] for s in range(width)]
                bits = [bits_vec[s] for s in range(width)]
                codes_l = list(slot_codes)
                takes = [
                    (keys[s] < jnp.inf) & slot_real[s] for s in range(width)
                ]

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
                        bits[a], bits[b] = pick(bits[a], bits[b])

                # Compacted branch-free pushes: slot s lands at
                # sp + (#takes before s), clamped to the (build-sized) stack.
                pushed = jnp.int32(0)
                for s in range(width):
                    code = codes_l[s]
                    take = takes[s]
                    bit = bits[s]
                    pos = jnp.minimum(sp + pushed, stack - 1)

                    @pl.when(take)
                    def _(code=code, bit=bit, pos=pos):
                        stack_ref[pos] = code.astype(jnp.int32)
                        gbits_ref[pos] = bit

                    pushed = pushed + take.astype(jnp.int32)

                return jnp.minimum(sp + pushed, stack)

            def handle_leaf(sp):
                cl = -entry - 2  # int32 leaf code
                crow = clusters_ref[cl]  # [128]
                # Triangle scalars extracted once; broadcast inside each
                # active group's predicated body.
                tris = []
                for j in range(leaf_size):
                    b = j * 9
                    tris.append(
                        (
                            crow[b], crow[b + 1], crow[b + 2],
                            crow[b + 3], crow[b + 4], crow[b + 5],
                            crow[b + 6], crow[b + 7], crow[b + 8],
                            crow[9 * leaf_size + j],
                        )
                    )

                for g in range(n_groups):

                    @pl.when(((mbits >> g) & 1) == 1)
                    def _(g=g):
                        sl = slice(g * rows, (g + 1) * rows)
                        gox, goy, goz = ox[sl], oy[sl], oz[sl]
                        gdx, gdy, gdz = dx[sl], dy[sl], dz[sl]
                        bt = out_ref[0, 0, sl]
                        bu = out_ref[0, 1, sl]
                        bv = out_ref[0, 2, sl]
                        bid = out_ref[0, 3, sl]
                        for (
                            v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z, tid
                        ) in tris:
                            # pvec = d × e2
                            px_ = gdy * e2z - gdz * e2y
                            py_ = gdz * e2x - gdx * e2z
                            pz_ = gdx * e2y - gdy * e2x
                            det = e1x * px_ + e1y * py_ + e1z * pz_
                            inv_det = jnp.where(
                                jnp.abs(det) > 1e-9, 1.0 / det, 0.0
                            )
                            tx = gox - v0x
                            ty = goy - v0y
                            tz = goz - v0z
                            uu = (tx * px_ + ty * py_ + tz * pz_) * inv_det
                            # qvec = tvec × e1
                            qx = ty * e1z - tz * e1y
                            qy = tz * e1x - tx * e1z
                            qz = tx * e1y - ty * e1x
                            vv = (gdx * qx + gdy * qy + gdz * qz) * inv_det
                            tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                            ok = (
                                (jnp.abs(det) > 1e-9)
                                & (uu >= 0.0)
                                & (vv >= 0.0)
                                & (uu + vv <= 1.0)
                                & (tt > t_min)
                                & (tt < bt)
                                & (tid >= 0.0)
                            )
                            bt = jnp.where(ok, tt, bt)
                            bu = jnp.where(ok, uu, bu)
                            bv = jnp.where(ok, vv, bv)
                            bid = jnp.where(ok, tid, bid)
                        out_ref[0, 0, sl] = bt
                        out_ref[0, 1, sl] = bu
                        out_ref[0, 2, sl] = bv
                        out_ref[0, 3, sl] = bid

                return sp

            sp = jax.lax.cond(entry >= 0, handle_node, handle_leaf, sp)
            if any_hit:
                # Terminate the packet when every live ray is blocked
                # (padding rays carry t_cap <= t_min and count as done).
                done = (out_ref[0, 3] >= 0.0) | (t_cap <= t_min)
                sp = jnp.where(jnp.all(done), 0, sp)

            return sp

        jax.lax.while_loop(cond, body, jnp.int32(1))

    pl.run_scoped(
        scoped,
        pltpu.SMEM((stack,), jnp.int32),
        pltpu.SMEM((stack,), jnp.int32),
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
        width=pt.width, stack=stack,
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


def packet_backend(
    scene=None, leaf_size: int = 12, interpret: bool = False,
    sublanes: int = PACKET_SUBLANES, width: int = 16,
    host_tris=None,
):
    """Build a TraceBackend whose tables travel as jit arguments (see
    ops/backend.py for why closures over device tables are forbidden)."""
    from raytracer3_tpu.ops.backend import TraceBackend

    if host_tris is not None:
        v0, v1, v2 = host_tris
    else:
        v0, v1, v2 = scene.tri_vertices()
    cb = cb_mod.build_cluster_bvh_host(v0, v1, v2, leaf_size, width=width)
    pt = pack_tables(cb)
    meta = pt._replace(node_table=None, cluster_table=None)
    arrays = {"nodes": pt.node_table, "clusters": pt.cluster_table}

    def isect_fn(arrays, o, d):
        pt2 = meta._replace(
            node_table=arrays["nodes"], cluster_table=arrays["clusters"]
        )
        return packet_intersect(pt2, o, d, interpret=interpret, sublanes=sublanes)

    def occl_fn(arrays, o, d, tmax):
        pt2 = meta._replace(
            node_table=arrays["nodes"], cluster_table=arrays["clusters"]
        )
        return packet_intersect(
            pt2, o, d, t_max=tmax, any_hit=True, interpret=interpret,
            sublanes=sublanes,
        ).hit

    return TraceBackend(arrays, isect_fn, occl_fn, meta=pt)


def make_packet_backend(
    scene, leaf_size: int = 12, interpret: bool = False,
    sublanes: int = PACKET_SUBLANES, width: int = 16,
    host_tris=None,
):
    """Scene → (intersect_fn, occluded_fn, PacketTables).

    Pass ``host_tris=(v0, v1, v2)`` (numpy) when the caller has host-side
    geometry: pulling gathered vertices back from a tunneled TPU device can
    cost minutes, so the BVH build should never depend on device arrays."""
    if host_tris is not None:
        v0, v1, v2 = host_tris
    else:
        v0, v1, v2 = scene.tri_vertices()
    cb = cb_mod.build_cluster_bvh_host(v0, v1, v2, leaf_size, width=width)
    pt = pack_tables(cb)

    def isect(o, d):
        return packet_intersect(
            pt, o, d, interpret=interpret, sublanes=sublanes,
        )

    def occl(o, d, tmax):
        return packet_intersect(
            pt, o, d, t_max=tmax, any_hit=True, interpret=interpret,
            sublanes=sublanes,
        ).hit

    return isect, occl, pt
