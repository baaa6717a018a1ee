"""Treelet-binned traversal for scenes whose BVH tables exceed VMEM.

Design (docs/TREELETS.md): the scene's triangles are partitioned into K
balanced **treelets** (recursive centroid-median split), each with its own
VMEM-sized wide cluster BVH (built by ops/cluster_bvh machinery). A trace:

1. Dense `[N, K]` slab tests vs treelet AABBs give each ray its candidate
   treelets and entry distances (pure VPU, fraction of a ms).
2. Rays are coherence-sorted ONCE (nearest-candidate treelet, direction
   octant, Morton of the entry point) into fixed segments of `sublanes×128`.
3. One `pallas_call` over grid `(segments, K)`: step `(s, e)` traverses the
   `e`-th treelet of segment `s`'s candidate-union list (scalar-prefetched,
   sorted near-first, sentinel-padded). The BlockSpec index_map selects that
   treelet's node/cluster tables, so the Pallas pipeline DMAs each treelet
   HBM→VMEM once per run of steps, double-buffered behind traversal. The ray
   and output blocks stay resident across `e` — per-ray best-t accumulates,
   so later (farther) treelets are t-culled exactly like a global near-first
   traversal. Sublane-group activation for step `(s, e)` comes free from a
   scalar-prefetched per-(segment, treelet) group bitmask.
4. Results gather back through the inverse permutation (no scatters).

This replaces the per-leaf-DMA `clusters_hbm` mode as the production path
for Sponza-scale scenes: packets only run treelets that some ray in the
segment actually wants, so group activations are useful work instead of the
65k-ray whole-tree union overdraw measured in round 2 (docs/ROADMAP.md).

Capability parity: large-scene hardware ray dispatch
(reference: src/renderer/vulkan/raytracing.rs:88-148); the reference leans on
RT cores + a large L2, the TPU shape is explicit working-set scheduling.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from raytracer3_tpu.ops import cluster_bvh as cb_mod
from raytracer3_tpu.ops import intersect, mathx

_BG = mathx.BACKGROUND_DEPTH
GROUP_ROWS = 8
# Max segments per pallas_call (SMEM scalar-prefetch ceiling; see
# _run_segments). 256 = the largest count a working config has used
# (sponza1080@16spp, 255 segments at 1024 sublanes) rounded up.
SEG_LAUNCH_CHUNK = 256


class TreeletTables(NamedTuple):
    """Per-treelet packed tables, padded to a common size and stacked."""

    node_tables: jax.Array  # [K, Mt, row_len] f32 (wide-node rows, local ids)
    cluster_tables: jax.Array  # [K, Ct, 128] f32 (kernel layout, global tids)
    aabb: jax.Array  # [K, 8] f32 rows: (min xyz | max xyz | pad)
    leaf_size: int
    width: int
    depth: int  # max treelet depth (stack sizing)
    num_treelets: int
    max_nodes: int
    max_clusters: int
    leaf_aabb: bool = False  # cluster rows carry AABBs in lanes [10L, 10L+6)
    bw_leaf: bool = False  # Baldwin–Weber cluster rows (traverse_kernel)


def _median_partition(centroids: np.ndarray, max_items: int) -> list[np.ndarray]:
    """Recursive largest-axis centroid-median split → balanced index groups
    of ≤ max_items (the treelet cut; balance keeps table padding small)."""
    parts = []

    def rec(idx):
        if idx.size <= max_items:
            parts.append(idx)
            return
        c = centroids[idx]
        axis = int(np.argmax(c.max(0) - c.min(0)))
        order = np.argsort(c[:, axis], kind="stable")
        half = idx.size // 2
        rec(idx[order[:half]])
        rec(idx[order[half:]])

    rec(np.arange(centroids.shape[0], dtype=np.int64))
    return parts


def _sah_partition(
    centroids: np.ndarray,
    tri_min: np.ndarray,
    tri_max: np.ndarray,
    max_items: int,
    balance: int = 3,
) -> list[np.ndarray]:
    """Surface-area-minimizing treelet cut: recursive sweep over the three
    centroid orders picking the split that minimizes SA(left)·n_l +
    SA(right)·n_r, with cuts confined to [1/(b+1), b/(b+1)] of the range so
    table padding stays bounded.

    Measured vs the centroid-median cut on the 300k-tri atrium at 4.2M-ray
    density (tools note in docs/ROADMAP.md): per-ray candidate treelets
    4.46 → 2.4-2.6, segment-grid steps −17% (32k treelets) to −69% (100k
    treelets) — treelet AABBs stop overlapping where the median cut sliced
    through walls."""
    parts = []

    def sa(lo, hi):
        e = np.maximum(hi - lo, 0)
        return e[:, 0] * e[:, 1] + e[:, 1] * e[:, 2] + e[:, 0] * e[:, 2]

    def rec(idx):
        if idx.size <= max_items:
            parts.append(idx)
            return
        best = None
        m = idx.size
        cand = np.arange(
            max(1, m // (balance + 1)), min(m, balance * m // (balance + 1))
        )
        for ax in range(3):
            order = np.argsort(centroids[idx, ax], kind="stable")
            si = idx[order]
            lo_c = np.minimum.accumulate(tri_min[si], axis=0)
            hi_c = np.maximum.accumulate(tri_max[si], axis=0)
            lo_r = np.minimum.accumulate(tri_min[si][::-1], axis=0)[::-1]
            hi_r = np.maximum.accumulate(tri_max[si][::-1], axis=0)[::-1]
            cost = (
                sa(lo_c, hi_c)[cand - 1] * cand
                + sa(lo_r, hi_r)[cand] * (m - cand)
            )
            j = int(np.argmin(cost))
            if best is None or cost[j] < best[0]:
                best = (cost[j], si, int(cand[j]))
        _, si, cut = best
        rec(si[:cut])
        rec(si[cut:])

    rec(np.arange(centroids.shape[0], dtype=np.int64))
    return parts


def build_treelets_host(
    v0: np.ndarray,
    v1: np.ndarray,
    v2: np.ndarray,
    leaf_size: int = 24,
    width: int = 16,
    max_tris: int = 98304,
    partition: str = "sah",
    bw_leaf: bool = False,
    cluster_mode: str = "median",
    split_budget: float = 0.0,
) -> TreeletTables:
    """Partition triangles into treelets and build each treelet's wide
    cluster BVH (host numpy end-to-end — device pulls through a tunneled TPU
    cost ~1 s each, see cluster_bvh.build_cluster_bvh_host).

    partition: "sah" (default; overlap-minimizing cut, see _sah_partition)
    or "median" (the balanced centroid-median cut)."""
    from raytracer3_tpu.ops.pallas import traverse_kernel as tk

    v0 = np.asarray(jax.device_get(v0), np.float32)
    v1 = np.asarray(jax.device_get(v1), np.float32)
    v2 = np.asarray(jax.device_get(v2), np.float32)
    cent = (v0 + v1 + v2) / 3.0
    if partition == "sah":
        tri_min = np.minimum(np.minimum(v0, v1), v2)
        tri_max = np.maximum(np.maximum(v0, v1), v2)
        parts = _sah_partition(cent, tri_min, tri_max, max_tris)
    else:
        parts = _median_partition(cent, max_tris)

    per_tri = 12 if bw_leaf else 9
    nodes, clusters, aabbs, depth = [], [], [], 1
    for idx in parts:
        cb = cb_mod.build_cluster_bvh_host(
            v0[idx], v1[idx], v2[idx], leaf_size, width=width,
            cluster_mode=cluster_mode, split_budget=split_budget,
        )
        pt = tk.pack_tables_host(cb, bw_leaf=bw_leaf)
        ct = np.array(pt.cluster_table)  # writable copy (tid remap below)
        # Remap local tri ids → global (float rows; ids exact below 2^24).
        ls = pt.leaf_size
        local = ct[:, per_tri * ls : (per_tri + 1) * ls].astype(np.int64)
        remapped = np.where(
            local >= 0, idx[np.clip(local, 0, idx.size - 1)], -1
        )
        ct[:, per_tri * ls : (per_tri + 1) * ls] = remapped.astype(np.float32)
        nodes.append(np.asarray(pt.node_table))
        clusters.append(ct)
        lo = np.minimum(np.minimum(v0[idx].min(0), v1[idx].min(0)), v2[idx].min(0))
        hi = np.maximum(np.maximum(v0[idx].max(0), v1[idx].max(0)), v2[idx].max(0))
        aabbs.append(np.concatenate([lo, hi]))
        depth = max(depth, pt.depth)

    k = len(parts)
    mt = max(n.shape[0] for n in nodes)
    ctm = max(c.shape[0] for c in clusters)
    row_len = nodes[0].shape[1]
    lane = clusters[0].shape[1]
    node_t = np.zeros((k, mt, row_len), np.float32)
    clus_t = np.zeros((k, ctm, lane), np.float32)
    # Padding cluster rows: degenerate tris (all-zero rows → det/nd 0) +
    # tid -1, and inverted AABBs so half-culling skips them outright.
    tid0 = per_tri * leaf_size
    clus_t[:, :, tid0 : tid0 + leaf_size] = -1.0
    ab0 = (per_tri + 1) * leaf_size
    clus_t[:, :, ab0 : ab0 + 3] = 1e30
    clus_t[:, :, ab0 + 3 : ab0 + 6] = -1e30
    # Padding node rows: every slot an inverted box with empty code -1.
    node_t[:, :, 0 : 3 * width] = 1e30
    node_t[:, :, 3 * width : 6 * width] = -1e30
    node_t[:, :, 6 * width : 7 * width] = -1.0
    for i, (nd, c) in enumerate(zip(nodes, clusters)):
        node_t[i, : nd.shape[0]] = nd
        clus_t[i, : c.shape[0]] = c
    aabb = np.zeros((k, 8), np.float32)
    aabb[:, :6] = np.stack(aabbs).astype(np.float32)
    return TreeletTables(
        node_tables=jnp.asarray(node_t),
        cluster_tables=jnp.asarray(clus_t),
        aabb=jnp.asarray(aabb),
        leaf_size=leaf_size,
        width=width,
        depth=depth,
        num_treelets=k,
        max_nodes=mt,
        max_clusters=ctm,
        leaf_aabb=True,
        bw_leaf=bw_leaf,
    )


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------


def _treelet_slabs(aabb, o, inv_d, t_min, t_cap):
    """Dense [N, K] slab tests vs treelet AABBs → (entry_t, hit)."""
    lo = aabb[None, :, 0:3]  # [1, K, 3]
    hi = aabb[None, :, 3:6]
    t0 = (lo - o[:, None, :]) * inv_d[:, None, :]
    t1 = (hi - o[:, None, :]) * inv_d[:, None, :]
    tn = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=-1), t_min)
    tf = jnp.minimum(jnp.min(jnp.maximum(t0, t1), axis=-1), t_cap[:, None])
    return tn, tn <= tf


def _morton6(pos, lo, hi):
    norm = (pos - lo) / jnp.maximum(hi - lo, 1e-6)
    q = jnp.clip(norm * 63.0, 0, 63).astype(jnp.int32)
    m = jnp.zeros(pos.shape[0], jnp.int32)
    for b in range(6):
        m = (
            m
            | (((q[:, 0] >> b) & 1) << (3 * b + 2))
            | (((q[:, 1] >> b) & 1) << (3 * b + 1))
            | (((q[:, 2] >> b) & 1) << (3 * b))
        )
    return m


def _chunk_count(s_count: int, cap: int = 16) -> int:
    """Largest divisor of s_count that is <= cap (lax.map needs equal
    chunks; s_count is static so this runs at trace time)."""
    for c in range(min(cap, s_count), 0, -1):
        if s_count % c == 0:
            return c
    return 1


def _seg_reduce_chunked(
    aabb, o, d, cap, *, t_min, p, groups, rows_per_group,
    only_tid=None, exclude_tid=None,
):
    """Segment-granular slab reductions WITHOUT materializing [N, K]:
    (seg_tn [S,K], seg_any [S,K], gact [S,G,K]) computed per segment chunk
    under lax.map. The dense [N, K] tn/want matrices cost ~2 GB apiece in
    padded T(8,128) layout at a 66.8M-lane fused-tail launch (measured: the
    sponza1080@16spp compile OOM'd HBM by 298 MB with ~7 GB of slab temps,
    2026-08-19) while every consumer is a per-segment min/any — so reduce
    inside the chunk and never keep more than chunk_segs segments of slabs
    live.

    only_tid [Np] i32: restrict each ray's want to that single treelet
    (nearest-first phase 1). exclude_tid [Np] i32: drop that treelet from
    each ray's want (phase 2 — already visited). Mutually exclusive."""
    k = aabb.shape[0]
    n_pad = o.shape[0]
    s_count = n_pad // p
    cs = _chunk_count(s_count)
    nc = s_count // cs
    tid = only_tid if only_tid is not None else exclude_tid

    def one(chunk):
        oc, dc, cc = chunk[:3]  # [cs*p, 3] / [cs*p, 3] / [cs*p]
        inv = 1.0 / jnp.where(jnp.abs(dc) < 1e-12, 1e-12, dc)
        tn, want = _treelet_slabs(aabb, oc, inv, t_min, cc)
        if tid is not None:
            cols = jax.lax.broadcasted_iota(jnp.int32, want.shape, 1)
            sel = cols == chunk[3][:, None]
            want = want & (sel if only_tid is not None else ~sel)
        tn_m = jnp.where(want, tn, jnp.inf).reshape(cs, p, k)
        w = want.reshape(cs, p, k)
        return (
            jnp.min(tn_m, axis=1),
            jnp.any(w, axis=1),
            jnp.any(w.reshape(cs, groups, rows_per_group * 128, k), axis=2),
        )

    operands = (
        o.reshape(nc, cs * p, 3),
        d.reshape(nc, cs * p, 3),
        cap.reshape(nc, cs * p),
    )
    if tid is not None:
        operands = operands + (tid.reshape(nc, cs * p),)
    seg_tn, seg_any, gact = jax.lax.map(one, operands)
    return (
        seg_tn.reshape(s_count, k),
        seg_any.reshape(s_count, k),
        gact.reshape(s_count, groups, k),
    )


def _near_tid_chunked(aabb, o, d, cap, *, t_min, p):
    """Per-ray (nearest-candidate entry t, treelet id) for the sort key,
    chunked like _seg_reduce_chunked (the [N, K] slab matrix never
    materializes; K-way argmin happens inside the chunk)."""
    k = aabb.shape[0]
    n_pad = o.shape[0]
    s_count = max(1, n_pad // p)
    cs = _chunk_count(s_count)
    nc = s_count // cs
    rows = n_pad // nc

    def one(chunk):
        oc, dc, cc = chunk
        inv = 1.0 / jnp.where(jnp.abs(dc) < 1e-12, 1e-12, dc)
        tn, want = _treelet_slabs(aabb, oc, inv, t_min, cc)
        tn_m = jnp.where(want, tn, jnp.inf)
        near = jnp.min(tn_m, axis=1)
        tid = jnp.where(
            jnp.isfinite(near),
            jnp.argmin(tn_m, axis=1).astype(jnp.int32),
            k,
        )
        return near, tid

    near, tid = jax.lax.map(
        one,
        (
            o.reshape(nc, rows, 3),
            d.reshape(nc, rows, 3),
            cap.reshape(nc, rows),
        ),
    )
    return near.reshape(n_pad), tid.reshape(n_pad)


def _run_segments(
    tt: TreeletTables,
    o: jax.Array,  # [Np, 3] rays already segment-ordered + padded
    d: jax.Array,
    cap: jax.Array,  # [Np] per-ray t cap (0 parks)
    want_s: jax.Array,  # [Np, K] bool — which treelets each ray wants
    tn_s: jax.Array,  # [Np, K] entry t (inf where not wanted)
    *,
    seg_meta=None,  # optional (seg_tn, seg_any, gact) — skips the dense
    # [N, K] reductions (want_s/tn_s may then be None)
    t_min: float,
    any_hit: bool,
    interpret: bool,
    sublanes: int,
    e_cap=None,
    stats: bool = False,
    half_leaf: bool = False,
    div_free: bool = False,
    rank_push: bool = False,
    anyhit_row=None,
    step_cull: bool = False,
    tables_hbm: bool = False,
    vmem_limit=None,
    bit_loop: bool = False,
    max_groups: int = 32,
):
    """Segment metadata + kernel launch: per-segment near-first candidate
    lists (sentinel slots repeat the last valid id so Pallas keeps the
    resident table block), per-(segment, treelet) group bitmasks, one
    pallas_call. Returns [4, Np] rows in the caller's (sorted) ray order."""
    from raytracer3_tpu.ops.pallas import traverse_kernel as tk

    k = tt.num_treelets
    p = sublanes * 128
    n_pad = o.shape[0]
    s_count = n_pad // p
    groups = max(1, min(max_groups, sublanes // GROUP_ROWS))  # _kernel's cap
    rows_per_group = sublanes // groups
    n_words = (groups + 31) // 32  # must match _kernel's word split

    if seg_meta is not None:
        seg_tn, seg_any, gact = seg_meta
    else:
        seg_tn = jnp.min(tn_s.reshape(s_count, p, k), axis=1)  # [S, K]
        seg_any = jnp.any(want_s.reshape(s_count, p, k), axis=1)
        # Group g of segment s is active for treelet t iff any of its
        # rows×128 rays wants t.
        gact = jnp.any(
            want_s.reshape(s_count, groups, rows_per_group * 128, k), axis=2
        )  # [S, G, K]
    seg_key = jnp.where(seg_any, seg_tn, jnp.inf)
    seg_order = jnp.argsort(seg_key, axis=1).astype(jnp.int32)  # [S, K]
    seg_valid = jnp.take_along_axis(
        jnp.isfinite(seg_key), seg_order, axis=1
    )
    length = jnp.sum(seg_valid, axis=1).astype(jnp.int32)
    last = jnp.take_along_axis(
        seg_order, jnp.maximum(length - 1, 0)[:, None], axis=1
    )
    seg_list = jnp.where(seg_valid, seg_order, last)
    # Per-step t-cull keys: the step's min entry distance, nudged down so fp
    # jitter between the driver slab test and the kernel's Möller parameter
    # can't cull a boundary hit. The kernel skips step e once every lane's
    # best-t is at or below this entry (max-reduce vs one SMEM scalar) —
    # meaningful because caps are scene-exit-bounded (treelet_intersect) and
    # any-hit lanes retire to best-t 0, so no lane pins the max at BG.
    seg_entry = jnp.where(
        seg_valid,
        jnp.take_along_axis(seg_key, seg_order, axis=1) * (1.0 - 1e-4) - 1e-5,
        1e30,  # sentinel slots are killed by gmask 0; keep SMEM finite
    ).astype(jnp.float32)

    words = []
    for wd in range(n_words):
        lo, hi = 32 * wd, min(32 * (wd + 1), groups)
        shifts = jnp.arange(hi - lo, dtype=jnp.int32)
        words.append(
            jnp.sum(
                gact[:, lo:hi].astype(jnp.int32) << shifts[None, :, None],
                axis=1, dtype=jnp.int32,
            )
        )
    gmask_k = jnp.stack(words, axis=-1)  # [S, K, W]
    seg_gmask = jnp.take_along_axis(
        gmask_k, jnp.maximum(seg_order, 0)[:, :, None], axis=1
    )  # [S, E, W]
    seg_gmask = jnp.where(seg_valid[:, :, None], seg_gmask, 0)
    if e_cap is not None:
        slot = jax.lax.broadcasted_iota(jnp.int32, seg_gmask.shape, 1)
        seg_gmask = jnp.where(slot < e_cap, seg_gmask, 0)

    def launch(sl, o_, d_, cap_, ah_):
        return tk.packet_intersect_segments(
            tt, seg_list[sl], seg_entry[sl], seg_gmask[sl], o_, d_, cap_,
            t_min=t_min, any_hit=any_hit, interpret=interpret,
            sublanes=sublanes, stats=stats, half_leaf=half_leaf,
            div_free=div_free, rank_push=rank_push, anyhit_row=ah_,
            step_cull=step_cull, tables_hbm=tables_hbm,
            vmem_limit=vmem_limit, bit_loop=bit_loop, max_groups=max_groups,
        )

    # SMEM ceiling: the scalar-prefetch arrays (seg_list/entry/gmask) pad
    # their LAST dim to 128 lanes, so SMEM grows ~1.5 KB/segment — 510
    # segments (sponza1080@32spp, 66.8M lanes) blew the 1.0 MB budget at
    # compile (1.50 M needed, 2026-08-20). Segments are independent grid
    # rows, so launches chunk freely over them: ≤ SEG_LAUNCH_CHUNK segments
    # per pallas_call, outputs concatenated (the global coherence sort is
    # untouched — chunking only slices the grid).
    if s_count > SEG_LAUNCH_CHUNK:
        # Prefer equal chunks (one compiled kernel shape across launches);
        # when ceil-division doesn't divide evenly, take fixed-size chunks
        # with a ragged tail (two compiled shapes) — requiring an exact
        # divisor would degenerate to one launch PER segment on prime-ish
        # counts, exactly the big workloads the chunking exists for.
        n_chunks = -(-s_count // SEG_LAUNCH_CHUNK)
        if s_count % n_chunks == 0:
            sizes = [s_count // n_chunks] * n_chunks
        else:
            sizes = [SEG_LAUNCH_CHUNK] * (s_count // SEG_LAUNCH_CHUNK)
            if s_count % SEG_LAUNCH_CHUNK:
                sizes.append(s_count % SEG_LAUNCH_CHUNK)
        parts, stat_parts, start = [], [], 0
        for size in sizes:
            sl = slice(start, start + size)
            rs = slice(start * p, (start + size) * p)
            r = launch(
                sl, o[rs], d[rs], cap[rs],
                None if anyhit_row is None else anyhit_row[rs],
            )
            if stats:
                r, st = r  # [S_chunk, 8] per-segment counters
                stat_parts.append(st)
            parts.append(r)
            start += size
        out = jnp.concatenate(parts, axis=1)
        if stats:
            return out, jnp.concatenate(stat_parts, axis=0)
        return out
    return launch(slice(None), o, d, cap, anyhit_row)


def treelet_intersect(
    tt: TreeletTables,
    origins: jax.Array,
    directions: jax.Array,
    t_min: float = 1e-4,
    t_max=_BG,
    any_hit: bool = False,
    interpret: bool = False,
    sublanes: int = 512,
    presorted: bool = False,
    sort_chunk: int = 1,
    e_cap=None,
    stats: bool = False,
    half_leaf: bool = False,
    div_free: bool = False,
    rank_push: bool = False,
    anyhit_mask=None,
    step_cull: bool = False,
    tables_hbm: bool = False,
    vmem_limit=None,
    bit_loop: bool = False,
    max_groups: int = 32,
    nearest_first: bool = False,
    hit_only: bool = False,
) -> intersect.Hit:
    """Trace rays [N, 3] through the treelet segment grid (module docstring).

    hit_only=True (any-hit occlusion callers that read ONLY Hit.hit): the
    un-sort carries just the prim-id row through the variadic sort instead
    of all four result rows — the un-sort's cost is linear in operand count
    (~170 ms for key+4 rows at 16.7M lanes, tools/probe_driver.py), so
    shadow launches shed ~3/5 of it. Hit.t degrades to 0/BG flags.

    nearest_first=True splits the sorted launch into two phases: phase 1
    traces each ray ONLY through its nearest candidate treelet (the sort
    key's tid — segments are tid-ordered so phase-1 unions are ~pure),
    phase 2 retraces the remaining candidates with each ray's cap tightened
    to its phase-1 best-t. Per-RAY pruning where step_cull can only prune
    per segment-step max: rays whose closest hit lives in their nearest
    treelet (the common case) drop every other candidate individually.
    One extra kernel launch + seg-reduce, no extra sort. Requires the
    sorted path (ignored when presorted / single-treelet / sort_chunk>1).

    t_max may be scalar or per-ray [N] (shadow distances; 0 parks a lane).
    anyhit_mask ([N] bool): per-LANE any-hit flags for mixed shadow+bounce
    launches — flagged lanes retire on their first accepted hit (Hit.hit is
    the occlusion bit; their t is unordered), unflagged lanes keep exact
    closest-hit results (traverse_kernel mixed_hit).
    presorted=True skips the coherence sort (caller already ordered rays).
    sort_chunk=g > 1 sorts g-ray chunks by their min key instead of single
    rays (N/g-key argsorts, g-contiguous gathers). MEASURED NEGATIVE on
    every 2M-ray population (tools/probe_r3.py, chunk 8/32/128: bounces
    2.75 → 1.3 Mray/s, sun shadows 9.7 → 1.9): chunk-diluted segments blow
    up the per-segment treelet-candidate union, and extra live steps cost
    far more than the smaller argsort saves. Kept as a diagnostic knob;
    production paths use per-ray sorting (default 1).
    tables_hbm=True keeps the treelet tables in HBM and DMAs each live
    step's tables into single-buffered VMEM scratch inside the kernel
    (vs the default revolving 2× BlockSpec window) — half the table VMEM,
    so ~2× bigger treelets (or segments) fit; the per-step copy is µs vs
    the step's ms of traversal. Flag-gated until A/B-measured.
    step_cull=True arms per-step t-culling: caps are clamped to the
    scene-AABB exit (conservative — nothing exists beyond it; misses are
    rewritten to _BG so callers never see the clamp) and the kernel skips
    candidate step e once every lane's best-t ≤ the step's min entry
    (one max-reduce per live step). Flag-gated until A/B-measured
    (tools/probe_r3.py --what tcull).
    e_cap: TRACED scalar; candidate slots ≥ e_cap get gmask 0 (skipped).
    Diagnostic only — caps < the true union size drop hits. One compiled
    program serves every cap (the compile costs minutes on this runtime)."""
    from raytracer3_tpu.ops.pallas import traverse_kernel as tk

    n = origins.shape[0]
    k = tt.num_treelets
    p = sublanes * 128
    n_pad = ((n + p - 1) // p) * p
    s_count = n_pad // p

    t_cap = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    o = jnp.pad(origins, ((0, n_pad - n), (0, 0)), constant_values=1e30)
    d = jnp.pad(directions, ((0, n_pad - n), (0, 0)), constant_values=1.0)
    cap = jnp.pad(t_cap, (0, n_pad - n))  # zero cap → padding never hits
    ah = (
        None
        if anyhit_mask is None
        else jnp.pad(anyhit_mask.astype(jnp.float32), (0, n_pad - n))
    )

    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)

    if step_cull:
        # Scene-exit caps: clamp every lane's cap to where it LEAVES the
        # scene AABB (padded up so fp rounding keeps boundary hits) — no
        # triangle exists beyond that, so nothing is lost, and escaping
        # rays get a finite best-t instead of BG. That finiteness is what
        # arms the kernel's per-step t-cull (max best-t vs the step's min
        # entry): round 2's per-pop culling measured ZERO culls precisely
        # because one never-hitting ray pinned every bound at
        # BACKGROUND_DEPTH. Misses are rewritten to _BG below, so the
        # clamp is invisible to callers.
        lo_g = tt.aabb[:, 0:3].min(axis=0)
        hi_g = tt.aabb[:, 3:6].max(axis=0)
        t0g = (lo_g[None] - o) * inv_d
        t1g = (hi_g[None] - o) * inv_d
        tn_g = jnp.maximum(jnp.max(jnp.minimum(t0g, t1g), axis=1), t_min)
        tf_g = jnp.min(jnp.maximum(t0g, t1g), axis=1)
        exit_t = tf_g * (1.0 + 1e-4) + 1e-5
        cap = jnp.where(tn_g <= exit_t, jnp.minimum(cap, exit_t), 0.0)

    if presorted or k == 1:
        order = None
    else:
        near, tid0 = _near_tid_chunked(tt.aabb, o, d, cap, t_min=t_min, p=p)
        octant = (
            (d[:, 0] >= 0).astype(jnp.int32)
            + 2 * (d[:, 1] >= 0).astype(jnp.int32)
            + 4 * (d[:, 2] >= 0).astype(jnp.int32)
        )
        entry = jnp.where(
            jnp.isfinite(near)[:, None],
            o + jnp.maximum(near, 0.0)[:, None] * d,
            1e30,
        )
        lo = tt.aabb[:, 0:3].min(axis=0)
        hi = tt.aabb[:, 3:6].max(axis=0)
        key = (tid0 << 21) | (octant << 18) | _morton6(entry, lo, hi)
        if sort_chunk > 1:
            g = sort_chunk
            kc = jnp.min(key.reshape(-1, g), axis=1)
            cperm = jnp.argsort(kc)
            off = jnp.arange(g, dtype=cperm.dtype)[None, :]
            order = (cperm[:, None] * g + off).reshape(-1)
            cols = [o, d, cap[:, None]] + ([] if ah is None else [ah[:, None]])
            packed = jnp.concatenate(cols, axis=1)[order]
            o, d, cap = packed[:, 0:3], packed[:, 3:6], packed[:, 6]
            if ah is not None:
                ah = packed[:, 7]
        else:
            # Variadic sort: move the ray payload THROUGH lax.sort instead
            # of argsort + [N,7] pack gather — the sort's sequential passes
            # beat the row-count-bound random gather ~2× at 16.7M lanes
            # (173 vs 334 ms, tools/probe_driver.py), and the co-sorted
            # iota is the un-sort key for the result pass below. (key,
            # iota) as a two-operand key keeps ties deterministic like the
            # stable argsort this replaces.
            ops = (
                key,
                jnp.arange(n_pad, dtype=jnp.int32),
                o[:, 0], o[:, 1], o[:, 2],
                d[:, 0], d[:, 1], d[:, 2],
                cap,
            ) + (() if ah is None else (ah,)) + (
                (tid0,) if nearest_first else ()
            )
            sorted_ops = jax.lax.sort(ops, dimension=0, num_keys=2)
            order = sorted_ops[1]
            o = jnp.stack(sorted_ops[2:5], axis=-1)
            d = jnp.stack(sorted_ops[5:8], axis=-1)
            cap = sorted_ops[8]
            if ah is not None:
                ah = sorted_ops[9]
            if nearest_first:
                tid_s = sorted_ops[-1]
    # Segment metadata needs per-SORTED-ray slabs: RECOMPUTE on the sorted
    # rays (≈1 ms of VPU) instead of gathering the [N, K] tn/want matrices
    # through the permutation — XLA's per-lane gathers made those two pulls
    # the bulk of a measured 46 ms driver overhead. The recompute runs
    # CHUNKED (per segment block under lax.map, _seg_reduce_chunked): the
    # dense [N, K] matrices held ~7 GB of padded HBM temps at the 66.8M-lane
    # fused-tail launch and OOM'd sponza1080@16spp.
    groups = max(1, min(max_groups, sublanes // GROUP_ROWS))
    run_kw = dict(
        t_min=t_min, any_hit=any_hit, interpret=interpret,
        sublanes=sublanes, e_cap=e_cap, stats=stats, half_leaf=half_leaf,
        div_free=div_free, rank_push=rank_push, anyhit_row=ah,
        step_cull=step_cull, tables_hbm=tables_hbm, vmem_limit=vmem_limit,
        bit_loop=bit_loop, max_groups=max_groups,
    )
    red_kw = dict(
        t_min=t_min, p=p, groups=groups, rows_per_group=sublanes // groups,
    )
    if nearest_first and order is not None and sort_chunk == 1 and k > 1:
        # Phase 1: nearest candidate only (tid-sorted → ~pure unions).
        meta1 = _seg_reduce_chunked(
            tt.aabb, o, d, cap, only_tid=tid_s, **red_kw
        )
        out1 = _run_segments(tt, o, d, cap, None, None, seg_meta=meta1, **run_kw)
        if stats:
            out1, stat1 = out1
        # Phase 2: remaining candidates, caps tightened to phase-1 best-t
        # (inflated ~1e-4 so slab/Möller fp jitter can't drop a boundary
        # hit; any-hit winners get cap ≈ 0 → parked). Miss lanes keep the
        # EXACT original cap — inflating a shadow distance would admit
        # blockers beyond the light.
        hit1 = out1[3] >= 0.0
        cap2 = jnp.where(hit1, out1[0] * (1.0 + 1e-4) + 1e-5, cap)
        meta2 = _seg_reduce_chunked(
            tt.aabb, o, d, cap2, exclude_tid=tid_s, **red_kw
        )
        out2 = _run_segments(
            tt, o, d, cap2, None, None, seg_meta=meta2, **run_kw
        )
        if stats:
            out2, stat2 = out2
            stat_rows = stat1 + stat2
        better2 = (out2[3] >= 0.0) & (~hit1 | (out2[0] < out1[0]))
        out = jnp.where(better2[None, :], out2, out1)
    else:
        seg_meta = _seg_reduce_chunked(tt.aabb, o, d, cap, **red_kw)
        out = _run_segments(
            tt, o, d, cap, None, None, seg_meta=seg_meta, **run_kw
        )
        if stats:
            out, stat_rows = out

    # NOTE (gather-unsort era): do NOT slice the any-hit output to one row
    # before a GATHER unsort — measured 3-6% SLOWER (occl sun 10.14→9.86,
    # mix 6.09→5.73 Mray/s): the [4, N] gather amortizes its index work
    # across rows. The VARIADIC unsort below prices per operand instead, so
    # hit_only there carries one row legitimately.
    if (
        hit_only and order is not None and sort_chunk == 1
        and not nearest_first and not stats
    ):
        # Any-hit caller reads only the occlusion bit: un-sort just the
        # prim-id row (one [N] relayout copy ≪ three extra sort operands).
        restored = jax.lax.sort(
            (order, out[3]), dimension=0, num_keys=1
        )
        prim_id = restored[1][:n].astype(jnp.int32)
        found = prim_id >= 0
        return intersect.Hit(
            t=jnp.where(found, 0.0, _BG),
            uv=jnp.zeros((n, 2), jnp.float32),
            prim_id=prim_id,
            hit=found,
        )
    if order is not None:
        if sort_chunk > 1:
            g = sort_chunk
            off = jnp.arange(g, dtype=cperm.dtype)[None, :]
            inv = (jnp.argsort(cperm)[:, None] * g + off).reshape(-1)
            out = out[:, inv]
        else:
            # Un-sort through a second variadic sort keyed by the carried
            # iota (a permutation — exact original positions): ~170 ms at
            # 16.7M vs 294 ms for inverse-argsort + [4,N] gather.
            rows = tuple(out[i] for i in range(out.shape[0]))
            restored = jax.lax.sort(
                (order,) + rows, dimension=0, num_keys=1
            )
            out = jnp.stack(restored[1:], axis=0)
    out = out[:, :n]
    prim_id = out[3].astype(jnp.int32)
    found = prim_id >= 0
    hit = intersect.Hit(
        t=jnp.where(found, out[0], _BG),
        uv=jnp.stack([out[1], out[2]], axis=-1),
        prim_id=prim_id,
        hit=found,
    )
    if stats:
        return hit, stat_rows
    return hit


def _bits_to_words(bits):
    """[N, W*32] bool → [N, W] int32 packed."""
    n, kw = bits.shape
    w = kw // 32
    shifts = jnp.arange(32, dtype=jnp.int32)
    return jnp.sum(
        bits.reshape(n, w, 32).astype(jnp.int32) << shifts[None, None, :],
        axis=-1,
        dtype=jnp.int32,
    )


def _words_to_bits(words, k):
    n, w = words.shape
    shifts = jnp.arange(32, dtype=jnp.int32)
    bits = (words[:, :, None] >> shifts[None, None, :]) & 1
    return bits.reshape(n, w * 32)[:, :k].astype(jnp.bool_)


def treelet_intersect_rounds(
    tt: TreeletTables,
    origins: jax.Array,
    directions: jax.Array,
    t_min: float = 1e-4,
    t_max=_BG,
    any_hit: bool = False,
    interpret: bool = False,
    sublanes: int = 64,
    max_rounds: int | None = None,
) -> intersect.Hit:
    """Per-ray nearest-first ROUNDS variant: each round every live ray picks
    its nearest untried candidate treelet that still beats its best hit, rays
    re-sort by (chosen treelet, entry Morton) into treelet-pure segments, and
    one segment pass traces them. Optimal per-ray ordering/culling — the
    single-pass grid instead visits per-SEGMENT candidate unions, wasting
    active-group lanes on incoherent rays (measured 1.9 vs 9.3 Mray/s
    coherent, docs/ROADMAP.md) — traded against one argsort + pack gather
    per round."""
    n = origins.shape[0]
    k = tt.num_treelets
    p = sublanes * 128
    n_pad = ((n + p - 1) // p) * p
    kw = ((k + 31) // 32) * 32

    t_cap = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    o = jnp.pad(origins, ((0, n_pad - n), (0, 0)), constant_values=1e30)
    d = jnp.pad(directions, ((0, n_pad - n), (0, 0)), constant_values=1.0)
    cap0 = jnp.pad(t_cap, (0, n_pad - n))
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
    pad_cols = jnp.zeros((n_pad, kw - k), jnp.bool_)

    _, want0 = _treelet_slabs(tt.aabb, o, inv_d, t_min, cap0)
    lo = tt.aabb[:, 0:3].min(axis=0)
    hi = tt.aabb[:, 3:6].max(axis=0)
    kcols = jax.lax.broadcasted_iota(jnp.int32, (n_pad, k), 1)

    state = dict(
        pending=_bits_to_words(jnp.concatenate([want0, pad_cols], axis=1)),
        best_t=cap0,
        best_u=jnp.zeros((n_pad,), jnp.float32),
        best_v=jnp.zeros((n_pad,), jnp.float32),
        best_id=jnp.full((n_pad,), -1, jnp.int32),
        rounds=jnp.int32(0),
        go=jnp.any(want0),
    )

    def cond(st):
        return st["go"] & (st["rounds"] < (max_rounds or k))

    def body(st):
        pend = _words_to_bits(st["pending"], k)
        capr = st["best_t"]
        if any_hit:
            capr = jnp.where(st["best_id"] >= 0, 0.0, capr)  # blocked → done
        tn, shit = _treelet_slabs(tt.aabb, o, inv_d, t_min, capr)
        cand = pend & shit
        tn_m = jnp.where(cand, tn, jnp.inf)
        near = jnp.min(tn_m, axis=1)
        has = jnp.isfinite(near)
        tid = jnp.where(
            has, jnp.argmin(tn_m, axis=1).astype(jnp.int32), k
        )
        # A candidate pruned by the shrinking cap stays pruned.
        pending = _bits_to_words(
            jnp.concatenate([cand & (kcols != tid[:, None]), pad_cols], 1)
        )

        entry = jnp.where(
            has[:, None], o + jnp.maximum(near, 0.0)[:, None] * d, 1e30
        )
        key = (tid << 18) | _morton6(entry, lo, hi)
        order = jnp.argsort(key)
        packed = jnp.concatenate(
            [o, d, capr[:, None], tid.astype(jnp.float32)[:, None]], axis=1
        )[order]
        o_s, d_s, cap_s = packed[:, 0:3], packed[:, 3:6], packed[:, 6]
        tid_s = packed[:, 7].astype(jnp.int32)
        want_s = tid_s[:, None] == kcols  # treelet-PURE one-hot
        # Entry distances recomputed densely on sorted rays (gathering the
        # [N, K] matrix through the permutation costs 10× more).
        inv_s = 1.0 / jnp.where(jnp.abs(d_s) < 1e-12, 1e-12, d_s)
        tn2, _ = _treelet_slabs(tt.aabb, o_s, inv_s, t_min, cap_s)
        tn_s = jnp.where(want_s, tn2, jnp.inf)

        out = _run_segments(
            tt, o_s, d_s, cap_s, want_s, tn_s,
            t_min=t_min, any_hit=any_hit, interpret=interpret,
            sublanes=sublanes,
        )  # [4, Np] in sorted order
        out = out[:, jnp.argsort(order)]

        new_id = out[3].astype(jnp.int32)
        improved = has & (new_id >= 0)
        return dict(
            pending=pending,
            best_t=jnp.where(improved, out[0], st["best_t"]),
            best_u=jnp.where(improved, out[1], st["best_u"]),
            best_v=jnp.where(improved, out[2], st["best_v"]),
            best_id=jnp.where(improved, new_id, st["best_id"]),
            rounds=st["rounds"] + 1,
            go=jnp.any(has),
        )

    st = jax.lax.while_loop(cond, body, state)
    found = st["best_id"][:n] >= 0
    return intersect.Hit(
        t=jnp.where(found, st["best_t"][:n], _BG),
        uv=jnp.stack([st["best_u"][:n], st["best_v"][:n]], axis=-1),
        prim_id=st["best_id"][:n],
        hit=found,
    )


def treelet_layout_stats(
    tt: TreeletTables, origins, directions, t_cap, sublanes: int = 64
):
    """Driver-side diagnostics (no kernel): per-ray candidate counts and
    per-segment union sizes for a given ray population — the quantities that
    govern the segment-grid's step count (docs/TREELETS.md)."""
    n = origins.shape[0]
    k = tt.num_treelets
    p = sublanes * 128
    n_pad = ((n + p - 1) // p) * p
    s_count = n_pad // p
    o = jnp.pad(origins, ((0, n_pad - n), (0, 0)), constant_values=1e30)
    d = jnp.pad(directions, ((0, n_pad - n), (0, 0)), constant_values=1.0)
    cap = jnp.pad(
        jnp.broadcast_to(jnp.asarray(t_cap, jnp.float32), (n,)),
        (0, n_pad - n),
    )
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
    tn, want = _treelet_slabs(tt.aabb, o, inv_d, 1e-4, cap)
    tn_m = jnp.where(want, tn, jnp.inf)
    near = jnp.min(tn_m, axis=1)
    tid0 = jnp.where(
        jnp.isfinite(near), jnp.argmin(tn_m, axis=1).astype(jnp.int32), k
    )
    octant = (
        (d[:, 0] >= 0).astype(jnp.int32)
        + 2 * (d[:, 1] >= 0).astype(jnp.int32)
        + 4 * (d[:, 2] >= 0).astype(jnp.int32)
    )
    entry = jnp.where(
        jnp.isfinite(near)[:, None],
        o + jnp.maximum(near, 0.0)[:, None] * d, 1e30,
    )
    lo = tt.aabb[:, 0:3].min(axis=0)
    hi = tt.aabb[:, 3:6].max(axis=0)
    key = (tid0 << 21) | (octant << 18) | _morton6(entry, lo, hi)
    order = jnp.argsort(key)
    want_s = want[order].reshape(s_count, p, k)
    union = jnp.sum(jnp.any(want_s, axis=1), axis=1)  # [S]
    cand = jnp.sum(want, axis=1)
    # jnp scalars (jit-friendly: eager per-op dispatch on a tunneled TPU
    # costs seconds per op; callers jit this fn and pull the dict leaves).
    return {
        "rays": n,
        "segments": s_count,
        "cand_mean": jnp.mean(cand[:n].astype(jnp.float32)),
        "cand_max": jnp.max(cand[:n]),
        "union_mean": jnp.mean(union.astype(jnp.float32)),
        "union_max": jnp.max(union),
        "steps": jnp.sum(union),
    }


def treelet_backend(
    scene=None,
    leaf_size: int = 24,
    width: int = 16,
    max_tris: int = 98304,
    sublanes: int = 512,
    interpret: bool = False,
    host_tris=None,
    shadow_chunk: int = 1,
    primary_presorted: bool = True,
    half_leaf: bool = True,
    div_free: bool = False,
    rank_push="bounce",
    partition: str = "sah",
    cluster_mode: str = "sah",
    split_budget: float = 0.0,
    step_cull: bool = True,
    tables_hbm: bool = False,
    vmem_limit: int | None = 64_000_000,
    vmem_budget: float | None = None,
    bit_loop="auto",
    max_groups: int = 128,
    sublanes_sorted: int | None = None,
    bw_leaf: bool = False,
):
    """TraceBackend over the treelet segment grid; tables travel as jit
    arguments (ops/backend.py). Configs that would overflow VMEM are
    auto-fit (see the loop below): sublanes halve first, then max_tris.

    Defaults are the round-3 same-process A/B winners (docs/ROADMAP.md,
    2026-08-18 probes on the 300k-tri bench scene at 2M rays):
    - max_tris 98304 / leaf_size 24: beats 32k/leaf12 on EVERY population
      (primary +13%, bounce +11%, sun occl +4%, mixed occl +7%) — the 3×
      fewer grid steps of big treelets only pay with the 256-lane leaf-24
      row packing (98k/leaf12 LOSES everywhere: 2.4× node rows + 8192
      cluster rows pressure the VMEM windows).
    - step_cull True: per-step t-culling, bounce +6.5%, others flat.
    - rank_push "bounce": rank-select child pushes only on the sorted
      bounce paths (isect/capped) where node pops dominate (+6.7% bounce);
      the Batcher network stays for primaries (−2% under rank_push) and
      any-hit occlusion (−4%).
    - bit_loop "auto" + max_groups 64: bit-loop pops (scalar cost =
      popcount of the activation mask) with 8-row groups on the sorted
      bounce/occlusion/capped paths — bounce +16%, occl mix +19%
      (2026-08-19 same-process A/B); presorted primaries keep the
      per-group lax.cond path (−6% under bit_loop: activations are dense,
      loop overhead beats the saved branches).
    - sublanes_sorted 1024 (+ max_groups 128 → four mask words): the
      sorted bounce/occlusion/capped paths run 1024-sublane segments with
      8-row bit-loop groups — bounce +4-6%, occl flat (same-process A/B at
      ×8 density, 2026-08-19); scalar costs amortize over 2× rays while
      granularity stays at the 8-row VPU floor. Presorted primaries KEEP
      512 sublanes: their dense activations make 32-row granularity
      catastrophic (5.5 vs 34.9 Mray/s) and the cond path caps at 32
      groups.
    - cluster_mode "sah": binned-SAH split placement for triangle clusters
      (native rt3_build_clusters_sah) — total cluster surface area 1.81×
      lower than the median bisection on the 300k atrium, so leaf pops
      activate far less often. Same-process A/B at prod flags (2026-08-19,
      2M rays): bounce 3.18 → 4.28 Mray/s (+35%), occl mix 8.21 → 10.31
      (+26%), primary 31.6 → 37.6 (+19%) for +12% table bytes.

    shadow_chunk: sort_chunk granularity for occlusion traces — leave at 1
    (chunked sorting measured negative everywhere, see treelet_intersect).
    primary_presorted: skip the driver sort on the primary trace (tile-
    swizzled primaries are already packet-coherent, render/wavefront.py;
    measured 27.4 vs 20.6 Mray/s at 2M rays).
    half_leaf: 8-row subgroup leaf predication (measured +5-14% on every
    population at 512 sublanes; tools/probe_r3.py --what halfleaf).
    rank_push: True/False force rank-select pushes everywhere/nowhere;
    "bounce" (default) applies them per-population as above.
    vmem_limit: Mosaic scoped-VMEM budget (CompilerParams.vmem_limit_bytes).
    The production default raises Mosaic's ~16 MB default to 32 MB (v5e has
    128 MB physical): the measured-best 98k/leaf24 tables at 512 sublanes
    need ~18.5 MB once Pallas revolves the rays+out blocks 2× — the 16 MB
    ceiling OOM'ed the first bench run of that config. The auto-fit budget
    below scales with the limit. None = Mosaic default."""
    from raytracer3_tpu.ops.backend import TraceBackend

    if vmem_budget is None:
        # Leave ~2.5 MB of the scoped budget for stacks/scratch/semaphores.
        vmem_budget = (16e6 if vmem_limit is None else float(vmem_limit)) - 2.5e6

    if host_tris is not None:
        v0, v1, v2 = host_tris
    else:
        v0, v1, v2 = scene.tri_vertices()
    tt = build_treelets_host(
        v0, v1, v2, leaf_size, width=width, max_tris=max_tris,
        partition=partition, bw_leaf=bw_leaf, cluster_mode=cluster_mode,
        split_budget=split_budget,
    )
    # VMEM auto-fit: the segment kernel keeps 2× (node+cluster) table
    # blocks (revolving DMA window) + 2× the rays [8,S,128] / out [4,S,128]
    # blocks resident. If the requested config cannot fit, first shrink the
    # segment (sublanes, if the tables alone leave room for a minimal one),
    # then the treelets (max_tris) — a raw Mosaic VMEM error names none of
    # these knobs. The budget leaves ~2.5 MB of the scoped limit for
    # stacks/scratch/semaphores. CPU-measured block sizes for the 300k-tri
    # bench scene are tabled in docs/ROADMAP.md.
    # Rays + out blocks ALSO revolve 2× across grid steps (measured: the
    # first 98k/leaf24 bench compile allocated 18.46 M where a 1× count
    # predicted ~15.4 M) — count both copies or the fit check lies.
    min_rays_out = 2 * (8 + 4) * 128 * 128 * 4
    table_copies = 1 if tables_hbm else 2
    # sublanes_sorted None = auto: production-size segments (sublanes >=
    # 512) take 1024-sublane sorted segments; smaller explicit sublanes
    # (tests, interpret-mode dryruns) keep the caller's size. Without
    # bit-loop pops the group cap is 32 lax.cond branches, so big segments
    # would coarsen to 32-row groups (measured catastrophic) — only take
    # the bigger sorted segment when the sorted paths run bit_loop.
    if sublanes_sorted is None:
        sublanes_sorted = 1024 if sublanes >= 512 else sublanes
    sl_sorted = (
        max(sublanes_sorted, sublanes)
        if bit_loop in (True, "auto")
        else sublanes
    )
    while True:
        k = max(1, tt.num_treelets)
        tables = (
            table_copies
            * (tt.node_tables.nbytes + tt.cluster_tables.nbytes) / k
        )
        rays_out = 2 * (8 + 4) * max(sublanes, sl_sorted) * 128 * 4
        if tables + rays_out <= vmem_budget:
            break
        if sl_sorted > sublanes:
            sl_sorted = max(sublanes, sl_sorted // 2)
            continue
        if sublanes > 128 and tables + min_rays_out <= vmem_budget:
            sublanes //= 2
            sl_sorted = min(sl_sorted, sublanes)
            continue
        if max_tris <= 256:
            break  # give up: let Mosaic report the real limit
        max_tris //= 2
        tt = build_treelets_host(
            v0, v1, v2, leaf_size, width=width, max_tris=max_tris,
            partition=partition, bw_leaf=bw_leaf, cluster_mode=cluster_mode,
            split_budget=split_budget,
        )
    meta = tt._replace(node_tables=None, cluster_tables=None, aabb=None)
    arrays = {
        "nodes": tt.node_tables,
        "clusters": tt.cluster_tables,
        "aabb": tt.aabb,
    }

    def _rebind(arrays):
        return meta._replace(
            node_tables=arrays["nodes"],
            cluster_tables=arrays["clusters"],
            aabb=arrays["aabb"],
        )

    # Per-population rank-select pushes (see docstring): the sorted bounce
    # paths take them, the coherent primary and any-hit occlusion keep the
    # Batcher network / unordered pushes.
    rp_bounce = rank_push in (True, "bounce")
    rp_other = rank_push is True
    # Per-population bit-loop pops (2026-08-19 same-process A/B, 2M rays,
    # 98k/leaf24/512 sublanes): bit_loop + max_groups=64 wins bounce +16%
    # and occl mix +19% (scalar cost = popcount, 8-row group granularity),
    # but LOSES 6% on presorted primaries (dense activations → loop
    # overhead beats the saved branches) — primaries keep the cond path.
    bl_sorted = bit_loop in (True, "auto")
    bl_primary = bit_loop is True
    mg_sorted = max_groups if bl_sorted else 32
    mg_primary = max_groups if bl_primary else 32

    def isect_fn(arrays, o, d):
        return treelet_intersect(
            _rebind(arrays), o, d, interpret=interpret, sublanes=sl_sorted,
            half_leaf=half_leaf, div_free=div_free, rank_push=rp_bounce,
            step_cull=step_cull, tables_hbm=tables_hbm, vmem_limit=vmem_limit,
            bit_loop=bl_sorted, max_groups=mg_sorted,
        )

    def occl_fn(arrays, o, d, tmax):
        return treelet_intersect(
            _rebind(arrays), o, d, t_max=tmax, any_hit=True,
            interpret=interpret, sublanes=sl_sorted, sort_chunk=shadow_chunk,
            half_leaf=half_leaf, div_free=div_free, rank_push=rp_other,
            step_cull=step_cull, tables_hbm=tables_hbm, vmem_limit=vmem_limit,
            bit_loop=bl_sorted, max_groups=mg_sorted, hit_only=True,
        ).hit

    def capped_fn(arrays, o, d, tmax, anyhit=None):
        # Fused shadow+bounce launches (ops/backend.py capped_fn): closest
        # hit with per-ray caps — shadow lanes (cap = light distance) read
        # Hit.hit as the occlusion bit, bounce lanes carry cap = BG. The
        # per-lane ``anyhit`` flags give shadow lanes first-hit retirement
        # inside the closest-hit traversal (kernel mixed_hit). Gains one
        # driver sort + 2× ray density per launch; A/B via
        # RenderSettings.fuse_shadow.
        return treelet_intersect(
            _rebind(arrays), o, d, t_max=tmax, interpret=interpret,
            sublanes=sl_sorted, half_leaf=half_leaf, div_free=div_free,
            rank_push=rp_bounce, anyhit_mask=anyhit, step_cull=step_cull,
            tables_hbm=tables_hbm, vmem_limit=vmem_limit,
            bit_loop=bl_sorted, max_groups=mg_sorted,
        )

    def primary_fn(arrays, o, d):
        return treelet_intersect(
            _rebind(arrays), o, d, interpret=interpret, sublanes=sublanes,
            presorted=primary_presorted, half_leaf=half_leaf,
            div_free=div_free, rank_push=rp_other, step_cull=step_cull,
            tables_hbm=tables_hbm, vmem_limit=vmem_limit,
            bit_loop=bl_primary, max_groups=mg_primary,
        )

    return TraceBackend(
        arrays, isect_fn, occl_fn, meta=tt, self_sorting=True,
        primary_fn=primary_fn if primary_presorted else None,
        capped_fn=capped_fn,
    )
