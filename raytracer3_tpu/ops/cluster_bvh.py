"""Gather-free BVH traversal: cluster-leaf wide BVH walked with one-hot
matmuls on the MXU.

Why this exists (measured on TPU v5e, see git history): XLA's per-lane
gather/scatter lower to serial loops — a [36k]→[36k,8,3] gather from a 437-row
table costs ~2.5 ms, ~1000× off roofline — so the classic stack traversal
(ops/traverse.py, ops/wide_bvh.py) is HBM-latency-bound. This module removes
every per-lane gather/scatter from the hot loop:

- **Node fetch** = one-hot(node_id) @ node_table — an [N, M]×[M, 64] matmul
  the MXU eats (boxes in bf16 with conservative outward rounding; child codes
  exact in f32 below 2^24).
- **Leaf fetch** = one-hot(cluster_id) @ cluster_triangle_table — triangles
  are pre-grouped into fixed-size Morton-ordered *clusters* (the meshlet
  analog of the reference's 64/124-limit meshlets, assets/mod.rs:267); a leaf
  references exactly one cluster.
- **Stack push/pop** = one-hot select / masked reduction over a fixed-depth
  [N, D] register stack — dense VPU math, no scatter.

The BVH itself is an LBVH over cluster AABBs (ops/bvh.py) collapsed to
branching factor 8 (ops/wide_bvh.collapse machinery), so build stays
device-side and O(C log C).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from raytracer3_tpu.ops import bvh as bvh_mod
from raytracer3_tpu.ops import intersect, mathx

WIDTH = 8
STACK_DEPTH = 32


class ClusterBVH(NamedTuple):
    # Wide-node table, one row per node:
    # [cmin(w×3) | cmax(w×3) | code(w)], padded (64 lanes for w=8, 128 for w=16).
    node_table: jax.Array  # [M, 64|128] f32
    # Per-cluster packed triangles: L × (v0(3) e1(3) e2(3)) = 9L floats,
    # padded to a multiple of 128 lanes.
    cluster_table: jax.Array  # [C, ceil(9L/128)*128] f32
    tri_id: jax.Array  # [C, L] int32 original triangle ids (-1 padding)
    leaf_size: int
    num_nodes: int
    num_clusters: int
    width: int = 8
    # Exact tree depth (root = 1) measured at build; traversal stacks are
    # sized (width-1)·depth + 1 so pushes can never overflow silently.
    depth: int = 1


def _host_tree_depth(codes: np.ndarray) -> int:
    """BFS depth of the wide tree from its child-code table (host-side).
    codes [M, width]: internal child = node id ≥ 0, leaf < -1, empty = -1."""
    depth = 1
    frontier = np.array([0], np.int64)
    while frontier.size:
        ch = codes[frontier].reshape(-1)
        nxt = np.unique(ch[ch >= 0].astype(np.int64))
        if nxt.size == 0:
            break
        frontier = nxt
        depth += 1
        if depth > 64:
            raise ValueError("BVH deeper than 64 levels — build produced a cycle?")
    return depth


def _build_clusters(
    v0, v1, v2, leaf_size: int, use_sah: bool = True,
    cluster_mode: str = "median", split_budget: float = 0.0,
):
    """Group triangles into clusters of <= leaf_size via the native library
    when available (tighter boxes), else Morton blocks. cluster_mode picks
    median-bisection (balanced, full clusters) vs SAH-split placement
    (tighter AABBs, underfull clusters) — see native.build_clusters.

    split_budget > 0 enables SBVH-style spatial splits: up to
    (1+budget)×T fragments with axis-clipped boxes are clustered instead of
    whole triangles (native.split_fragments). A fragment's cluster row still
    packs the ORIGINAL triangle, so hits are unchanged; a triangle hit may
    just be found from any of the clusters carrying one of its fragments
    (duplicates resolve through the closest-hit min)."""
    t = v0.shape[0]
    tri_min = np.minimum(np.minimum(v0, v1), v2)
    tri_max = np.maximum(np.maximum(v0, v1), v2)

    # Primitive = fragment (spatial splits) or whole triangle.
    prim_tri = None  # fragment -> original triangle; None = identity
    prim_min, prim_max = tri_min, tri_max
    if split_budget > 0:
        from raytracer3_tpu import native

        frags = native.split_fragments(v0, v1, v2, budget=1.0 + split_budget)
        if frags is not None:
            prim_tri, prim_min, prim_max = frags
            prim_tri = prim_tri.astype(np.int64)
    p_count = prim_min.shape[0]

    order_p = None
    if use_sah:
        from raytracer3_tpu import native

        res = native.build_clusters(
            prim_min, prim_max, leaf_size, mode=cluster_mode
        )
        if res is not None:
            cluster_of, c = res
            # Group primitive ids by cluster, pad each cluster to leaf_size.
            order = np.argsort(cluster_of, kind="stable").astype(np.int64)
            sizes = np.bincount(cluster_of, minlength=c)
            order_p = np.full((c, leaf_size), -1, np.int64)
            pos = 0
            for ci in range(c):
                k = sizes[ci]
                order_p[ci, :k] = order[pos : pos + k]
                pos += k
            order_p = order_p.reshape(-1)

    if order_p is None:
        centroid = (prim_min + prim_max) * 0.5
        smin = prim_min.min(0)
        ext = np.maximum(prim_max.max(0) - smin, 1e-9)
        norm = (centroid - smin) / ext
        q = np.clip(norm * 1024.0, 0, 1023).astype(np.uint64)

        def explode(x):
            x = x & np.uint64(0x3FF)
            x = (x | (x << np.uint64(16))) & np.uint64(0x030000FF)
            x = (x | (x << np.uint64(8))) & np.uint64(0x0300F00F)
            x = (x | (x << np.uint64(4))) & np.uint64(0x030C30C3)
            x = (x | (x << np.uint64(2))) & np.uint64(0x09249249)
            return x

        codes = (
            (explode(q[:, 0]) << np.uint64(2))
            | (explode(q[:, 1]) << np.uint64(1))
            | explode(q[:, 2])
        )
        order = np.argsort(codes, kind="stable").astype(np.int64)
        c = (p_count + leaf_size - 1) // leaf_size
        pad = c * leaf_size - p_count
        order_p = np.concatenate([order, np.full(pad, -1, np.int64)])

    c = len(order_p) // leaf_size
    # Fragment slots resolve to their original triangle for packing/ids.
    if prim_tri is not None:
        tri_of = np.where(order_p >= 0, prim_tri[np.maximum(order_p, 0)], -1)
    else:
        tri_of = order_p
    tri_id = tri_of.reshape(c, leaf_size).astype(np.int32)

    # Packed per-cluster triangle data (v0, e1, e2), degenerate for padding.
    safe = np.maximum(tri_of, 0)
    pv0 = v0[safe]
    pe1 = v1[safe] - pv0
    pe2 = v2[safe] - pv0
    dead = (order_p < 0)[:, None]
    pv0 = np.where(dead, 1e30, pv0)
    pe1 = np.where(dead, 0.0, pe1)
    pe2 = np.where(dead, 0.0, pe2)
    packed = np.concatenate([pv0, pe1, pe2], axis=-1).reshape(c, leaf_size * 9)
    lanes = ((leaf_size * 9 + 127) // 128) * 128
    packed = np.pad(packed, ((0, 0), (0, lanes - leaf_size * 9)))

    # Cluster boxes come from the PRIMITIVE (fragment) boxes — with spatial
    # splits these are the clipped boxes, i.e. the entire tightness win.
    psafe = np.maximum(order_p, 0)
    cmin = np.where(order_p[:, None] < 0, np.inf, prim_min[psafe]).reshape(c, leaf_size, 3).min(1)
    cmax = np.where(order_p[:, None] < 0, -np.inf, prim_max[psafe]).reshape(c, leaf_size, 3).max(1)
    return packed.astype(np.float32), tri_id, cmin.astype(np.float32), cmax.astype(np.float32)


def build_cluster_bvh_host(
    v0, v1, v2, leaf_size: int = 8, width: int = 8,
    cluster_mode: str = "median", split_budget: float = 0.0,
) -> ClusterBVH:
    """Host-side build: clusters → SAH/LBVH over cluster AABBs → wide
    collapse → packed tables, all numpy. Device↔host traffic is a single
    bulk pull of the vertices — per-array transfers through a tunneled TPU
    cost ~1 s each, so the build must never round-trip intermediates."""
    v0, v1, v2 = jax.device_get((v0, v1, v2))
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)
    packed, tri_id, cmin, cmax = _build_clusters(
        v0, v1, v2, leaf_size, cluster_mode=cluster_mode,
        split_budget=split_budget,
    )
    c = cmin.shape[0]

    if c == 1:
        # Single cluster: trivial one-node tree (root's first child = leaf 0).
        node = np.full((1, 64), 0.0, np.float32)
        node[0, 0:3] = cmin[0]
        node[0, 24:27] = cmax[0]
        node[0, 48] = -2.0  # leaf code for cluster 0: -(0)-2
        for s in range(1, 8):
            node[0, 48 + s] = -1.0
            node[0, s * 3 : s * 3 + 3] = 1e30  # inverted finite box: no hit
            node[0, 24 + s * 3 : 24 + s * 3 + 3] = -1e30
        return ClusterBVH(
            node_table=node,
            cluster_table=packed,
            tri_id=tri_id,
            leaf_size=leaf_size,
            num_nodes=1,
            num_clusters=1,
            width=8,  # single-node trees always use the 8-slot layout
            depth=1,
        )

    # Binary BVH over cluster AABBs: native binned-SAH when available (better
    # trees for static scenes), else the device LBVH.
    from raytracer3_tpu import native

    bvh = native.build_sah_bvh(cmin, cmax)
    if bvh is None:
        bvh = jax.device_get(
            jax.jit(bvh_mod.build_lbvh_aabbs)(jnp.asarray(cmin), jnp.asarray(cmax))
        )
    bvh = jax.tree.map(np.asarray, bvh)

    # Collapse binary → 8-wide with one cluster per leaf (host).
    from raytracer3_tpu.ops import wide_bvh as wb_mod

    wb = wb_mod.collapse(
        bvh,
        cmin, cmin, cmax,  # verts unused beyond AABBs
        leaf_size=1,
        width=width,
    )
    child_min = np.asarray(wb.child_min)
    child_max = np.asarray(wb.child_max)
    child_code = np.asarray(wb.child_code)
    cluster_order = np.asarray(wb.tri_order)  # morton order of clusters

    m = child_min.shape[0]
    # Leaf codes in `collapse` encode -(start<<4|1)-2 where start indexes the
    # *sorted cluster order*; translate to plain cluster ids: -(cluster)-2.
    codes = child_code.astype(np.float64).copy()
    leaf_mask = child_code < -1
    if leaf_mask.any():
        bits = -(child_code[leaf_mask].astype(np.int64) + 2)
        start = bits >> 4
        codes[leaf_mask] = -(cluster_order[start].astype(np.float64)) - 2.0

    # Row layout: cmin(3w) | cmax(3w) | codes(w), padded to a lane multiple.
    row_len = 64 if width == 8 else ((7 * width + 127) // 128) * 128
    table = np.zeros((m, row_len), np.float32)
    # One-hot matmul fetch requires finite table entries (0 × inf = NaN would
    # poison whole columns); empty slots use an inverted big-finite box.
    big = np.float32(1e30)
    table[:, 0 : 3 * width] = np.clip(child_min.reshape(m, 3 * width), -big, big)
    table[:, 3 * width : 6 * width] = np.clip(child_max.reshape(m, 3 * width), -big, big)
    table[:, 6 * width : 7 * width] = codes.astype(np.float32)
    depth = _host_tree_depth(codes.reshape(m, width))
    return ClusterBVH(
        node_table=table,
        cluster_table=packed,
        tri_id=tri_id,
        leaf_size=leaf_size,
        num_nodes=m,
        num_clusters=c,
        width=width,
        depth=depth,
    )


def build_cluster_bvh(v0, v1, v2, leaf_size: int = 8, width: int = 8) -> ClusterBVH:
    """build_cluster_bvh_host + a single device upload of the tables."""
    cb = build_cluster_bvh_host(v0, v1, v2, leaf_size, width)
    return cb._replace(
        node_table=jnp.asarray(cb.node_table),
        cluster_table=jnp.asarray(cb.cluster_table),
        tri_id=jnp.asarray(cb.tri_id),
    )


# ---------------------------------------------------------------------------
# Gather-free helpers
# ---------------------------------------------------------------------------


def _onehot_fetch(table: jax.Array, ids: jax.Array, *, exact: bool) -> jax.Array:
    """rows = one_hot(ids) @ table — the MXU gather. ids: [N] int32 in
    [0, M); table [M, K]. exact=True keeps f32 precision (codes); else bf16
    inputs with f32 accumulation (boxes — pre-rounded conservatively)."""
    m = table.shape[0]
    onehot = (ids[:, None] == jnp.arange(m, dtype=jnp.int32)[None, :])
    if exact:
        onehot = onehot.astype(jnp.float32)
        return jax.lax.dot(
            onehot, table, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
    onehot = onehot.astype(jnp.bfloat16)
    return jax.lax.dot(
        onehot, table.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


def _stack_pop(stack: jax.Array, sp: jax.Array) -> jax.Array:
    """value = stack[lane, sp-1] without a gather: one-hot masked reduction."""
    d = stack.shape[1]
    sel = jnp.arange(d, dtype=jnp.int32)[None, :] == (sp - 1)[:, None]
    return jnp.sum(jnp.where(sel, stack, 0.0), axis=1)


def _stack_push(stack: jax.Array, sp: jax.Array, value: jax.Array, mask: jax.Array):
    """Masked push without scatter: one-hot select write. The pointer is
    clamped to the stack depth so a (build-bug) overflow drops entries instead
    of decoding garbage pops as the root and live-locking."""
    d = stack.shape[1]
    sel = (jnp.arange(d, dtype=jnp.int32)[None, :] == sp[:, None]) & mask[:, None]
    stack = jnp.where(sel, value[:, None], stack)
    return stack, jnp.minimum(sp + mask.astype(jnp.int32), d)


def _round_table_conservative(table: jax.Array) -> jax.Array:
    """Expand child boxes outward so bf16 rounding can't cull true hits."""
    eps = 0.008  # > 2^-7 relative (bf16 mantissa)
    cmin = table[:, 0:24]
    cmax = table[:, 24:48]
    span = jnp.abs(cmin) * eps + 1e-6
    span2 = jnp.abs(cmax) * eps + 1e-6
    out = table.at[:, 0:24].set(cmin - span)
    out = out.at[:, 24:48].set(cmax + span2)
    return out


# ---------------------------------------------------------------------------
# Traversal
# ---------------------------------------------------------------------------


def cbvh_intersect(
    cb: ClusterBVH,
    origins: jax.Array,
    directions: jax.Array,
    t_min: float = 1e-4,
    t_max=mathx.BACKGROUND_DEPTH,
    any_hit: bool = False,
) -> intersect.Hit:
    """Closest-hit traversal with one-hot matmul fetches (no gathers).

    Stack entries are float32 codes: node id m ≥ 0; leaf cluster −(c)−2;
    empty slots never pushed."""
    n = origins.shape[0]
    ls = cb.leaf_size
    d = jnp.where(jnp.abs(directions) < 1e-12, 1e-12, directions)
    inv_d = 1.0 / d
    t_max_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    node_table = _round_table_conservative(cb.node_table)

    # Exact worst case: every level on the path leaves ≤ width-1 siblings
    # on the stack, +1 for the entry in flight.
    stack_depth = max(STACK_DEPTH, (cb.width - 1) * cb.depth + 1)
    state = dict(
        stack=jnp.zeros((n, stack_depth), jnp.float32),
        sp=jnp.ones((n,), jnp.int32),  # root (code 0.0) pre-pushed
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
        entry = _stack_pop(st["stack"], sp)
        sp = jnp.where(running, jnp.maximum(sp - 1, 0), sp)

        is_leaf = entry < -1.0
        is_node = running & (entry >= 0.0)

        # ---- Leaf: up-to-L triangle tests from the cluster table ---------
        cluster = jnp.clip((-entry - 2.0).astype(jnp.int32), 0, cb.num_clusters - 1)
        rows = _onehot_fetch(cb.cluster_table, cluster, exact=True)  # [N, 128*]
        tri_ids = _onehot_fetch(
            cb.tri_id.astype(jnp.float32), cluster, exact=True
        ).astype(jnp.int32)  # [N, L]
        best_t, best_u, best_v, best_id = (
            st["best_t"], st["best_u"], st["best_v"], st["best_id"],
        )
        take_leaf = running & is_leaf
        for j in range(ls):
            base = j * 9
            tv0 = rows[:, base : base + 3]
            te1 = rows[:, base + 3 : base + 6]
            te2 = rows[:, base + 6 : base + 9]
            # Möller–Trumbore with precomputed edges.
            pvec = jnp.cross(d, te2)
            det = jnp.sum(te1 * pvec, -1)
            inv_det = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)
            tvec = origins - tv0
            uu = jnp.sum(tvec * pvec, -1) * inv_det
            qvec = jnp.cross(tvec, te1)
            vv = jnp.sum(d * qvec, -1) * inv_det
            tt = jnp.sum(te2 * qvec, -1) * inv_det
            hh = (
                (jnp.abs(det) > 1e-9)
                & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                & (tt > t_min) & (tt < best_t)
            )
            take = take_leaf & hh & (tri_ids[:, j] >= 0)
            best_t = jnp.where(take, tt, best_t)
            best_u = jnp.where(take, uu, best_u)
            best_v = jnp.where(take, vv, best_v)
            best_id = jnp.where(take, tri_ids[:, j], best_id)

        # ---- Internal: 8 children, push far→near -------------------------
        node = jnp.clip(entry.astype(jnp.int32), 0, cb.num_nodes - 1)
        ndata = _onehot_fetch(node_table[:, :48], node, exact=False)  # bf16 boxes
        codes = _onehot_fetch(node_table[:, 48:56], node, exact=True)  # [N, 8]
        cmin = ndata[:, 0:24].reshape(n, 8, 3)
        cmax = ndata[:, 24:48].reshape(n, 8, 3)
        tn, hit8 = intersect.ray_aabb(
            origins[:, None, :], inv_d[:, None, :], cmin, cmax,
            t_min, best_t[:, None],
        )
        # Empty slots carry code -1.0 exactly; exclude them.
        valid8 = hit8 & (jnp.abs(codes + 1.0) > 0.25) & is_node[:, None]

        # Order children far→near with a compare-swap network on (key, code).
        key = jnp.where(valid8, tn, jnp.inf)
        code_s, key_s, valid_s = _sort8_desc(codes, key, valid8)

        stack = st["stack"]
        for c in range(WIDTH):
            stack, sp = _stack_push(stack, sp, code_s[:, c], valid_s[:, c])

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


_SORT8_PAIRS = [
    (0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3), (4, 6), (5, 7),
    (1, 2), (5, 6), (0, 4), (3, 7), (1, 5), (2, 6), (1, 4), (3, 6),
    (2, 4), (3, 5), (3, 4),
]


def _sort8_desc(codes: jax.Array, key: jax.Array, valid: jax.Array):
    """Sort 8 (code, key, valid) columns by key descending (far first, so the
    nearest child pops first; invalid = +inf keys land first and are
    mask-skipped on push... no: invalid must not be pushed at all, they keep
    valid=False). Compare-swap network, dense ops only."""
    cols_k = [key[:, i] for i in range(8)]
    cols_c = [codes[:, i] for i in range(8)]
    cols_v = [valid[:, i] for i in range(8)]
    # Invalid entries get key -inf so they sort to the *end* (descending).
    cols_k = [jnp.where(v, k, -jnp.inf) for k, v in zip(cols_k, cols_v)]
    for i, j in _SORT8_PAIRS:
        swap = cols_k[i] < cols_k[j]  # descending
        ki, kj = cols_k[i], cols_k[j]
        ci, cj = cols_c[i], cols_c[j]
        vi, vj = cols_v[i], cols_v[j]
        cols_k[i] = jnp.where(swap, kj, ki)
        cols_k[j] = jnp.where(swap, ki, kj)
        cols_c[i] = jnp.where(swap, cj, ci)
        cols_c[j] = jnp.where(swap, ci, cj)
        cols_v[i] = jnp.where(swap, vj, vi)
        cols_v[j] = jnp.where(swap, vi, vj)
    return (
        jnp.stack(cols_c, axis=1),
        jnp.stack(cols_k, axis=1),
        jnp.stack(cols_v, axis=1),
    )


def cluster_backend(scene=None, leaf_size: int = 8, host_tris=None):
    """TraceBackend over the gather-free matmul traversal; tables travel as
    jit arguments (ops/backend.py)."""
    from raytracer3_tpu.ops.backend import TraceBackend

    if host_tris is not None:
        v0, v1, v2 = host_tris
    else:
        v0, v1, v2 = scene.tri_vertices()
    cb = build_cluster_bvh(v0, v1, v2, leaf_size)
    meta = cb._replace(node_table=None, cluster_table=None, tri_id=None)
    arrays = {
        "nodes": cb.node_table, "clusters": cb.cluster_table, "tids": cb.tri_id
    }

    def _rebind(arrays):
        return meta._replace(
            node_table=arrays["nodes"],
            cluster_table=arrays["clusters"],
            tri_id=arrays["tids"],
        )

    def isect_fn(arrays, o, d):
        return cbvh_intersect(_rebind(arrays), o, d)

    def occl_fn(arrays, o, d, tmax):
        return cbvh_intersect(
            _rebind(arrays), o, d, t_max=tmax, any_hit=True
        ).hit

    return TraceBackend(arrays, isect_fn, occl_fn, meta=cb)


def make_cluster_backend(scene, leaf_size: int = 8, host_tris=None):
    """Scene → (intersect_fn, occluded_fn, ClusterBVH). Pass numpy
    ``host_tris`` to keep the build off the device (see traverse_kernel)."""
    if host_tris is not None:
        v0, v1, v2 = host_tris
    else:
        v0, v1, v2 = scene.tri_vertices()
    cb = build_cluster_bvh(v0, v1, v2, leaf_size)

    def isect(o, d):
        return cbvh_intersect(cb, o, d)

    def occl(o, d, tmax):
        return cbvh_intersect(cb, o, d, t_max=tmax, any_hit=True).hit

    return isect, occl, cb
