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

PACKET_SUBLANES = 512  # default sublane rows per packet (512 × 128 = 65536
# rays; measured on v5e: bigger packets amortize the scalar per-node overhead,
# and group-bit work skipping keeps the vector cost proportional to the rays
# that actually want each subtree. 512 sublanes (32 groups × 16 rows) beat
# 256 and 1024 on every ray population; beyond that group granularity is too
# coarse and the union cost wins. 64 groups × 8 rows (two mask words)
# measured a 15% REGRESSION on every population at 2M rays — the extra 32
# lax.cond scalar branches per node/leaf pop cost more than the finer skip
# granularity saves (probe_g64 vs probe_rev_base, 2026-08-17).
STACK = 64
GROUP_ROWS = 8  # sublane rows per work-skipping group (one native VPU tile)
_BG = mathx.BACKGROUND_DEPTH


def _i32(mask: int) -> int:
    """Python uint32 literal → int32 two's-complement value."""
    return mask - (1 << 32) if mask >= (1 << 31) else mask


def _ctz_pow2(b):
    """Count trailing zeros of a scalar int32 with exactly ONE bit set
    (isolated via b = m & -m). Five mask tests — no clz dependence."""
    g = jnp.int32(0)
    for k, m in (
        (1, 0xAAAAAAAA),
        (2, 0xCCCCCCCC),
        (4, 0xF0F0F0F0),
        (8, 0xFF00FF00),
        (16, 0xFFFF0000),
    ):
        g = g + jnp.where((b & jnp.int32(_i32(m))) != 0, jnp.int32(k), 0)
    return g


def _bit_iter(words, body_fn, extra_init):
    """Iterate body_fn(bit_index, extra) over the SET bits of N scalar int32
    mask words (bit_index counts across words: word w bit i → 32*w + i).
    The loop length equals the popcount — the point: per-pop scalar cost
    proportional to ACTIVE groups instead of one lax.cond per group (32
    unconditional branches measured ~10-15% of bounce time, and 64 of them
    a 15% regression — docs/ROADMAP.md). Word selection is a first-nonzero
    chain (~3 scalar ops per extra word per iteration)."""
    nw = len(words)
    assert nw >= 1, nw

    def cond(c):
        m = c[0]
        for i in range(1, nw):
            m = m | c[i]
        return m != 0

    def body(c):
        ws = list(c[:nw])
        extra = c[nw:]
        if nw == 1:
            b = ws[0] & -ws[0]
            g = _ctz_pow2(b)
            ws[0] = ws[0] & (ws[0] - 1)
        else:
            # First nonzero word wins (low to high).
            wsel = ws[nw - 1]
            base = jnp.int32(32 * (nw - 1))
            for i in range(nw - 2, -1, -1):
                nz = ws[i] != 0
                wsel = jnp.where(nz, ws[i], wsel)
                base = jnp.where(nz, jnp.int32(32 * i), base)
            b = wsel & -wsel
            g = _ctz_pow2(b) + base
            cleared = wsel & (wsel - 1)
            for i in range(nw):
                ws[i] = jnp.where(base == jnp.int32(32 * i), cleared, ws[i])
        extra = body_fn(g, tuple(extra))
        return tuple(ws) + tuple(extra)

    out = jax.lax.while_loop(cond, body, tuple(words) + tuple(extra_init))
    return out[nw:]


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
    # Two-level (TLAS/BLAS) extras — None/0 for single-level tables.
    inst_table: jax.Array | None = None  # [I, 32] f32 (ops/tlas.py layout)
    tlas_nodes: int = 0
    # Cluster rows carry the cluster AABB in lanes [10L, 10L+6). Reserved
    # layout: a kernel-side per-half leaf slab cull over these measured a
    # 25-35% REGRESSION (see handle_leaf note) and was removed; the lanes
    # stay so a layout-compatible retry needs no table rebuild.
    leaf_aabb: bool = False
    # bw_leaf: cluster rows hold Baldwin–Weber precomputed constants
    # (n|d0|n1|d1|n2|d2 = 12 floats/tri at [12j, 12j+12), ids at [12L, 13L),
    # AABB at [13L, 13L+6)) instead of (v0|e1|e2). The leaf loop then skips
    # both cross products: t from the plane equation, u/v from two
    # precomputed projection rows (~38 VPU ops/tri vs ~49 for Möller).
    bw_leaf: bool = False


def pack_two_level(tl) -> PacketTables:
    """ops/tlas.TwoLevelTables → kernel tables (cluster rows already packed
    in kernel layout by build_mesh_blas)."""
    return PacketTables(
        node_table=jnp.asarray(tl.node_table),
        cluster_table=jnp.asarray(tl.cluster_table),
        leaf_size=tl.leaf_size,
        num_nodes=tl.num_nodes,
        num_clusters=tl.num_clusters,
        width=tl.width,
        depth=tl.depth,
        inst_table=jnp.asarray(tl.inst_table),
        tlas_nodes=tl.tlas_nodes,
        leaf_aabb=True,  # BLAS rows come from pack_tables_host
    )


def pack_tables_host(cb: cb_mod.ClusterBVH, bw_leaf: bool = False) -> PacketTables:
    """Repack ClusterBVH for the kernel: cluster rows append triangle ids.
    Row length is the lane-multiple that fits 9·L floats + L ids (13·L + 6
    when bw_leaf packs Baldwin–Weber constants instead — see PacketTables).

    Tables stay HOST numpy — per-treelet builders (ops/treelets.py) repack
    dozens of these, and a device upload + readback per part costs seconds
    each through the tunneled TPU runtime."""
    ls = cb.leaf_size
    per_tri = 12 if bw_leaf else 9
    row_len = ((per_tri * ls + ls + 6 + 127) // 128) * 128
    ct = np.asarray(jax.device_get(cb.cluster_table))
    tids = np.asarray(jax.device_get(cb.tri_id)).astype(np.float32)
    rows = np.zeros((ct.shape[0], row_len), np.float32)
    tri = ct[:, : 9 * ls].reshape(ct.shape[0], ls, 9)
    v0 = tri[:, :, 0:3]
    e1 = tri[:, :, 3:6]
    e2 = tri[:, :, 6:9]
    if bw_leaf:
        # Baldwin–Weber constants: plane (n, d0) with n = e1×e2, and the
        # barycentric projection rows n1 = (e2×n)/|n|², n2 = (n×e1)/|n|²
        # (n1·e1 = 1, n1·e2 = 0 and vice versa). Degenerate/padding tris get
        # n = 0 → nd = 0 → rejected in-kernel; tid -1 kills them regardless.
        n = np.cross(e1, e2)
        n2len = np.einsum("cld,cld->cl", n, n)
        ok = n2len > 1e-30
        inv = np.where(ok, 1.0 / np.maximum(n2len, 1e-30), 0.0)[:, :, None]
        n = np.where(ok[:, :, None], n, 0.0)
        n1 = np.cross(e2, n) * inv
        n2v = np.cross(n, e1) * inv
        d0 = -np.einsum("cld,cld->cl", n, v0)
        d1 = -np.einsum("cld,cld->cl", n1, v0)
        d2 = -np.einsum("cld,cld->cl", n2v, v0)
        bw = np.concatenate(
            [n, d0[:, :, None], n1, d1[:, :, None], n2v, d2[:, :, None]],
            axis=2,
        ).astype(np.float32)  # [C, L, 12]
        rows[:, : 12 * ls] = bw.reshape(ct.shape[0], 12 * ls)
    else:
        rows[:, : 9 * ls] = ct[:, : 9 * ls]
    rows[:, per_tri * ls : per_tri * ls + ls] = tids
    # Cluster AABB over valid tris (v0, v0+e1, v0+e2), padded by an epsilon
    # so fp rounding can't cull a marginal hit. Lanes [(pt+1)L, (pt+1)L+6).
    p1 = v0 + e1
    p2 = v0 + e2
    valid = (tids >= 0)[:, :, None]
    big = np.float32(1e30)
    pts_lo = np.minimum(np.minimum(
        np.where(valid, v0, big), np.where(valid, p1, big)),
        np.where(valid, p2, big)).min(axis=1)
    pts_hi = np.maximum(np.maximum(
        np.where(valid, v0, -big), np.where(valid, p1, -big)),
        np.where(valid, p2, -big)).max(axis=1)
    eps = 1e-4 * (np.linalg.norm(pts_hi - pts_lo, axis=1, keepdims=True) + 1e-3)
    ab0 = (per_tri + 1) * ls
    rows[:, ab0 : ab0 + 3] = pts_lo - eps
    rows[:, ab0 + 3 : ab0 + 6] = pts_hi + eps
    return PacketTables(
        node_table=np.asarray(jax.device_get(cb.node_table)),
        cluster_table=rows,
        leaf_size=ls,
        num_nodes=cb.num_nodes,
        num_clusters=cb.num_clusters,
        width=cb.width,
        depth=cb.depth,
        leaf_aabb=True,
        bw_leaf=bw_leaf,
    )


def pack_tables(cb: cb_mod.ClusterBVH) -> PacketTables:
    """pack_tables_host + one device upload of the two tables."""
    pt = pack_tables_host(cb)
    return pt._replace(
        node_table=jnp.asarray(pt.node_table),
        cluster_table=jnp.asarray(pt.cluster_table),
    )


def _kernel(
    *refs,  # see unpacking below
    leaf_size: int,
    any_hit: bool,
    t_min: float,
    width: int = 8,
    stack: int = STACK,
    stats: bool = False,
    clusters_hbm: bool = False,
    two_level: bool = False,
    tlas_nodes: int = 0,
    num_clusters: int = 0,
    seg: bool = False,
    half_leaf: bool = False,
    div_free: bool = False,
    rank_push: bool = False,
    mixed_hit: bool = False,
    seg_cull: bool = False,
    tables_hbm: bool = False,
    bit_loop: bool = False,
    max_groups: int = 32,
    bw_leaf: bool = False,
):
    """Packet traversal body. Two invocation shapes:

    - whole-tree (seg=False): (rays, nodes, clusters, [inst], out, [stats]);
      rays block [1, 8, S, 128], tables whole-array refs.
    - segment grid (seg=True): (seg_gmask, rays, nodes, clusters, out) over
      grid (segments, E); seg_gmask [S, E, n_words] SMEM scalar-prefetch
      carries the sublane-group activation bit words of the e-th candidate
      treelet of segment s (all-zero = skip step); tables are per-treelet
      blocks [1, Mt, row_len].
      The out block stays resident across e, so best-t accumulates and
      later (farther) treelets are t-culled (ops/treelets.py driver).

    mixed_hit=True (with any_hit=False) reads rays row 7 — otherwise a
    redundant copy of the row-6 t_cap — as a per-LANE any-hit flag: flagged
    lanes retire on their first accepted hit (best-t driven to 0, so every
    later box test fails for them) while unflagged lanes keep exact
    closest-hit semantics. This is the fused shadow+bounce launch shape
    (render/wavefront.py fused_fn): shadow lanes get any-hit-grade culling
    inside a closest-hit traversal.
    """
    if seg:
        # slist_ref drives the BlockSpec index_maps only (table DMA);
        # sentry_ref carries each candidate step's min entry distance
        # (per-step t-cull, see below).
        (
            slist_ref, sentry_ref, sgm_ref,
            rays_ref, nodes_ref, clusters_ref, out_ref, *m,
        ) = refs
        if not tables_hbm:
            # slist drives the BlockSpec index_maps only; with tables_hbm
            # it is read below to pick the manual whole-table DMA source.
            del slist_ref
        inst_ref = None
        stats_ref = m[0] if stats else None
    elif two_level:
        rays_ref, nodes_ref, clusters_ref, inst_ref, out_ref, *m = refs
        stats_ref = m[0] if stats else None
    else:
        rays_ref, nodes_ref, clusters_ref, out_ref, *m = refs
        inst_ref = None
        stats_ref = m[0] if stats else None
    sublanes = rays_ref.shape[2]
    # Work-skipping groups: capped at 32 (one int32 mask word) by default.
    # 64×8-row groups under per-group lax.conds measured a 15% regression on
    # every population (the extra 32 scalar branches beat the finer skip
    # granularity), but under bit_loop the scalar cost is proportional to the
    # POPCOUNT, so max_groups=64 becomes viable (A/B via tools/probe_r3.py).
    n_groups = max(1, min(max_groups, sublanes // GROUP_ROWS))
    rows = sublanes // n_groups
    n_words = (n_groups + 31) // 32
    # half_leaf: stack entries additionally carry per-SUBGROUP bits (8-row
    # granularity; rows//8 subgroups per group) consulted ONLY at leaf pops
    # via nested scalar pl.when — node expansion stays at ≤32 group
    # lax.conds (64 conds there measured a 15% regression; see header). The
    # subgroup bits come free from the same box-test vectors (min over 8
    # rows at a time). Measured: +5-14% on every population at 512
    # sublanes (probe_hl vs probe_rev_verify, 2026-08-17).
    n_half = rows // GROUP_ROWS if (half_leaf and rows % GROUP_ROWS == 0) else 1
    if n_half < 2:
        n_half = 1
    hw_words = (n_half * n_groups + 31) // 32 if n_half > 1 else 0
    gs_per_word = 32 // n_half if n_half > 1 else 32  # groups per half-word

    def _spread_bits(x, k, n):
        """Spread the low k bits of x so bit i lands at bit n*i (each
        followed by n-1 zeros), via shift-mask doubling."""
        masks = {
            2: (0x0000FFFF, 0x00FF00FF, 0x0F0F0F0F, 0x33333333, 0x55555555),
            4: (0x000000FF, 0x000F000F, 0x03030303, 0x11111111),
        }[n]
        shifts = {2: (8, 4, 2, 1), 4: (12, 6, 3)}[n]
        x = x & ((1 << k) - 1)
        x = x & masks[0]
        for m, s in zip(masks[1:], shifts):
            x = (x | (x << s)) & m
        return x

    def _expand_halves(gwords):
        """Group bit-words → subgroup bit-words with ALL subgroups of every
        active group set (conservative root/instance-push expansion)."""
        out = []
        for w in range(hw_words):
            gw = gwords[(w * gs_per_word) // 32]
            part = (gw >> (gs_per_word * (w % (32 // gs_per_word)))) & (
                (1 << gs_per_word) - 1
            )
            sp = _spread_bits(part, gs_per_word, n_half)
            full = sp
            for h in range(1, n_half):
                full = full | (sp << h)
            out.append(full)
        return out

    def _word_full(w):
        g_in = min(n_groups - 32 * w, 32)
        return -1 if g_in >= 32 else (1 << g_in) - 1

    all_bits = [_word_full(w) for w in range(n_words)]
    out_ch = 5 if two_level else 4
    pid = pl.program_id(0) if stats else None
    if seg:
        # Grid position + this step's group-mask words, read OUTSIDE
        # run_scoped (program_id is unavailable inside the scoped discharge).
        seg_e = pl.program_id(1)
        # gmask travels flattened [S, E*W]: SMEM pads the LAST dim to 128
        # lanes, so a [S, E, 1] layout would burn 128x the SMEM (measured:
        # 1 MB -> scalar-prefetch OOM at 128 segments / 8.4M rays).
        seg_gm = [
            sgm_ref[pl.program_id(0), seg_e * n_words + w]
            for w in range(n_words)
        ]
        seg_entry_v = (
            sentry_ref[pl.program_id(0), seg_e] if seg_cull else None
        )
        seg_t = (
            slist_ref[pl.program_id(0), seg_e] if tables_hbm else None
        )
        seg_srow = jax.lax.rem(pl.program_id(0), 8) if stats else None

    def scoped(*scratch):
        it = iter(scratch)
        stack_ref = next(it)
        gbits_refs = [next(it) for _ in range(n_words)]
        hbits_refs = [next(it) for _ in range(hw_words)]
        cbuf_ref = next(it) if clusters_hbm else None
        csem_ref = next(it) if clusters_hbm else None
        tray_ref = next(it) if two_level else None
        nbuf_ref = next(it) if tables_hbm else None
        nsem_ref = next(it) if tables_hbm else None
        tbuf_ref = next(it) if tables_hbm else None
        tsem_ref = next(it) if tables_hbm else None
        iray_ref = next(it) if (bit_loop and not two_level) else None
        ox = rays_ref[0, 0]
        oy = rays_ref[0, 1]
        oz = rays_ref[0, 2]
        dx = rays_ref[0, 3]
        dy = rays_ref[0, 4]
        dz = rays_ref[0, 5]
        t_cap = rays_ref[0, 6]

        eps = 1e-12

        def inv3(a, b, c):
            return (
                1.0 / jnp.where(jnp.abs(a) < eps, eps, a),
                1.0 / jnp.where(jnp.abs(b) < eps, eps, b),
                1.0 / jnp.where(jnp.abs(c) < eps, eps, c),
            )

        ix, iy, iz = inv3(dx, dy, dz)
        world_rays = (ox, oy, oz, dx, dy, dz, ix, iy, iz)
        if iray_ref is not None:
            iray_ref[0] = ix
            iray_ref[1] = iy
            iray_ref[2] = iz

        if two_level:
            # Traversal reads rays from the tray scratch: object-space while
            # inside a BLAS (rays mapped through the instance's inverse
            # transform; the hit parameter t is affine-invariant so best_t
            # needs no conversion), world-space at the TLAS.
            for k in range(9):
                tray_ref[k] = world_rays[k]

            def ray_slice(k, start, size):
                return tray_ref[k, pl.ds(start, size)]
        elif bit_loop:
            # Traced (bit-loop) starts: Mosaic cannot dynamic-slice VALUES,
            # only refs — o/d come straight from the rays ref; the computed
            # inverses live in a small scratch filled once below (iray_ref,
            # allocated at the end of this function's shapes list).

            def ray_slice(k, start, size):
                if k < 6:
                    return rays_ref[0, k, pl.ds(start, size)]
                return iray_ref[k - 6, pl.ds(start, size)]
        else:

            def ray_slice(k, start, size):
                return world_rays[k][start : start + size]

        def _aligned(start):
            # pl.multiple_of only accepts traced values; static starts are
            # already exact.
            if isinstance(start, int):
                return start
            return pl.multiple_of(start, GROUP_ROWS)

        # Hit state lives in the output ref so leaf groups can update their
        # own [rows, 128] slab without touching the rest of the packet.
        def init_out():
            out_ref[0, 0] = t_cap  # best_t
            out_ref[0, 1] = jnp.zeros_like(ox)  # u
            out_ref[0, 2] = jnp.zeros_like(ox)  # v
            out_ref[0, 3] = jnp.full_like(ox, -1.0)  # prim id (float)
            if two_level:
                out_ref[0, 4] = jnp.full_like(ox, -1.0)  # instance id

        if seg:
            # Grid step (s, e): init hit state only on the segment's first
            # step; skip the whole traversal when the e-th candidate slot is
            # empty (gmask 0) or — any-hit — every lane already resolved.
            @pl.when(seg_e == 0)
            def _():
                init_out()
                if stats:
                    # Stats block covers 8 segments ([8, 128] tile rule);
                    # zero only this segment's row.
                    stats_ref[seg_srow] = jnp.zeros((128,), jnp.int32)

            go = functools.reduce(
                lambda a, b: a | b, seg_gm, jnp.int32(0)
            ) != 0
            if any_hit:
                resolved = (out_ref[0, 3] >= 0.0) | (t_cap <= t_min)
                go = go & jnp.logical_not(jnp.all(resolved))
            if seg_cull:
                # Per-step t-cull: skip the whole candidate step once every
                # lane's best-t is at or below the step's min entry distance
                # — ONE max-reduce per live step (~E per segment), not per
                # pop (round-2's per-pop variant cost 10-25% and culled
                # nothing because BG-pinned lanes kept the bound infinite;
                # scene-exit caps + any-hit retirement make the max finite
                # now). Step 0 is the nearest candidate — never cullable,
                # and out_ref was only just initialized there.
                bt_max = jax.lax.cond(
                    go & (seg_e > 0),
                    lambda: jnp.max(out_ref[0, 0]),
                    lambda: jnp.float32(3e38),
                )
                go = go & (bt_max > seg_entry_v)
            if tables_hbm:
                # Tables live in HBM; copy THIS step's treelet tables into
                # single-buffered VMEM scratch (vs the BlockSpec path's
                # revolving 2× window — the point: half the table VMEM, so
                # treelets ~2× bigger fit). The copy (~5-10 µs for MBs over
                # HBM) is trivially hidden by the step's ms-scale traversal;
                # dead steps skip it.
                @pl.when(go)
                def _():
                    nd = pltpu.make_async_copy(
                        nodes_ref.at[pl.ds(seg_t, 1)], nbuf_ref, nsem_ref
                    )
                    td = pltpu.make_async_copy(
                        clusters_ref.at[pl.ds(seg_t, 1)], tbuf_ref, tsem_ref
                    )
                    nd.start()
                    td.start()
                    nd.wait()
                    td.wait()
            root_bits = seg_gm
            sp0 = jnp.where(go, jnp.int32(1), jnp.int32(0))
        else:
            init_out()
            root_bits = [jnp.int32(b) for b in all_bits]
            sp0 = jnp.int32(1)

        stack_ref[0] = 0  # root
        for w in range(n_words):
            gbits_refs[w][0] = root_bits[w]
        if n_half > 1:
            for w, hb in enumerate(_expand_halves(root_bits)):
                hbits_refs[w][0] = hb

        # The stack pointer travels in the while carry, NOT in SMEM: a loop
        # condition reading a mutated ref never terminates in interpret mode,
        # and a carried scalar also spares Mosaic one SMEM round-trip per
        # iteration. The carry is a dict: sp (+ cur instance when two_level,
        # + prefetch state when clusters live in HBM, + stat counters).
        def cond(carry):
            return carry["sp"] > 0

        def body(carry):
            sp = carry["sp"] - 1
            entry = stack_ref[sp]
            mbits_w = [gbits_refs[w][sp] for w in range(n_words)]
            hbits_w = [hbits_refs[w][sp] for w in range(hw_words)]

            def g_active(g):
                return ((mbits_w[g // 32] >> (g % 32)) & 1) == 1

            def h_active(g, h):
                b = n_half * g + h
                return ((hbits_w[b // 32] >> (b % 32)) & 1) == 1

            def handle_node(sp):
                # Expand an internal node: per active sublane-group AABB
                # tests (inactive groups skipped entirely), order children
                # near-first, push every taken child (leaf codes and internal
                # ids share the stack; leaves are handled at pop).
                if seg and tables_hbm:
                    row = nbuf_ref[0, entry]
                elif seg:
                    row = nodes_ref[0, entry]
                else:
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
                    """Min-tn per (child slot, row-half) over group g's rays
                    ([width, n_half, 128]; inf where the slot's box was
                    missed). The half split is free: the same stacked
                    reduction folds rows//n_half instead of rows. g may be
                    traced (bit_loop) — every access is a GROUP_ROWS-aligned
                    dynamic slice."""
                    start = _aligned(g * rows)
                    gox, goy, goz = (
                        ray_slice(0, start, rows),
                        ray_slice(1, start, rows),
                        ray_slice(2, start, rows),
                    )
                    gix, giy, giz = (
                        ray_slice(6, start, rows),
                        ray_slice(7, start, rows),
                        ray_slice(8, start, rows),
                    )
                    bt = out_ref[0, 0, pl.ds(start, rows)]
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
                    # Fold the row axis in fused reductions over stacked
                    # [width, rows(/2), 128] blocks — one per half when
                    # half_leaf (Mosaic rejects multi-trailing-dim
                    # reductions, so halves stay separate 2D arrays).
                    stackd = jnp.stack(masked)  # [width, rows, 128]
                    if n_half == 1:
                        return (jnp.min(stackd, axis=1),)
                    hr = rows // n_half
                    return tuple(
                        jnp.min(stackd[:, h * hr : (h + 1) * hr], axis=1)
                        for h in range(n_half)
                    )

                if bit_loop:
                    # Iterate only the SET group bits: per-pop scalar cost is
                    # the popcount (~4-6 on bounces) instead of n_groups
                    # branches. Box tests, finish bits, and the near-first
                    # merge accumulate through the while carry.
                    def nbody(g, extra):
                        merged = extra[0]
                        bw = list(extra[1 : 1 + n_words])
                        hw = list(extra[1 + n_words :])
                        gv = group_keys(g)
                        merged = jnp.minimum(
                            merged, functools.reduce(jnp.minimum, gv)
                        )
                        hfin = [
                            jnp.min(gv[h], axis=1) < jnp.inf
                            for h in range(n_half)
                        ]
                        gfin = functools.reduce(jnp.logical_or, hfin)
                        sh = jnp.left_shift(jnp.int32(1), g & 31)
                        if n_words == 1:
                            bw[0] = bw[0] | jnp.where(gfin, sh, 0)
                        else:
                            gw = jax.lax.shift_right_logical(g, 5)
                            for w in range(n_words):
                                bw[w] = bw[w] | jnp.where(
                                    gfin & (gw == w), sh, 0
                                )
                        for h in range(n_half):
                            b = n_half * g + h
                            shh = jnp.left_shift(jnp.int32(1), b & 31)
                            if hw_words == 1:
                                hw[0] = hw[0] | jnp.where(hfin[h], shh, 0)
                            elif hw_words > 1:
                                bwd = jax.lax.shift_right_logical(b, 5)
                                for w in range(hw_words):
                                    hw[w] = hw[w] | jnp.where(
                                        hfin[h] & (bwd == w), shh, 0
                                    )
                        if n_half == 1:
                            hw = []
                        return (merged, *bw, *hw)

                    outs = _bit_iter(
                        list(mbits_w),
                        nbody,
                        (jnp.full((width, 128), jnp.inf, jnp.float32),)
                        + tuple(
                            jnp.zeros((width,), jnp.int32)
                            for _ in range(n_words + hw_words)
                        ),
                    )
                    merged = outs[0]
                    bits_words = list(outs[1 : 1 + n_words])
                    half_words = list(outs[1 + n_words :])
                    keys_vec = jnp.min(merged, axis=1)  # [width]
                else:
                    gvecs = []
                    for g in range(n_groups):
                        gvecs.append(
                            jax.lax.cond(
                                g_active(g),
                                functools.partial(group_keys, g),
                                lambda: tuple(
                                    jnp.full(
                                        (width, 128), jnp.inf, jnp.float32
                                    )
                                    for _ in range(n_half)
                                ),
                            )
                        )
                    merged = functools.reduce(
                        jnp.minimum,
                        [functools.reduce(jnp.minimum, gv) for gv in gvecs],
                    )  # [width, 128]
                    keys_vec = jnp.min(merged, axis=1)  # [width]
                    bits_words = [
                        jnp.zeros((width,), jnp.int32) for _ in range(n_words)
                    ]
                    half_words = [
                        jnp.zeros((width,), jnp.int32)
                        for _ in range(hw_words)
                    ]
                    for g in range(n_groups):
                        hfin = [
                            jnp.min(gvecs[g][h], axis=1) < jnp.inf  # [width]
                            for h in range(n_half)
                        ]
                        gfin = functools.reduce(jnp.logical_or, hfin)
                        bits_words[g // 32] = bits_words[g // 32] | jnp.where(
                            gfin,
                            jnp.left_shift(jnp.int32(1), jnp.int32(g % 32)),
                            0,
                        )
                        if n_half > 1:
                            for h in range(n_half):
                                b = n_half * g + h
                                half_words[b // 32] = half_words[b // 32] | (
                                    jnp.where(
                                        hfin[h],
                                        jnp.left_shift(
                                            jnp.int32(1), jnp.int32(b % 32)
                                        ),
                                        0,
                                    )
                                )

                keys = [keys_vec[s] for s in range(width)]
                bits = [
                    [bits_words[w][s] for w in range(n_words)]
                    for s in range(width)
                ]
                hbits = [
                    [half_words[w][s] for w in range(hw_words)]
                    for s in range(width)
                ]
                codes_l = list(slot_codes)
                takes = [
                    (keys[s] < jnp.inf) & slot_real[s] for s in range(width)
                ]

                if rank_push:
                    # Vectorized rank-select ordering: each taken slot's push
                    # position is sp + its rank in descending-key order
                    # (far-first, so the nearest child still pops first) —
                    # one [width, width] comparison matrix + a column sum
                    # replaces the Batcher network's ~63×12 serialized scalar
                    # selects at width 16. Any-hit ranks by slot index (no
                    # ordering needed, matching the sort-skipping path).
                    codes_vec = row[6 * width : 7 * width]
                    real_vec = jnp.abs(codes_vec + 1.0) > 0.25
                    take_vec = (keys_vec < jnp.inf) & real_vec
                    idx_lt = (
                        jax.lax.broadcasted_iota(jnp.int32, (width, width), 0)
                        < jax.lax.broadcasted_iota(
                            jnp.int32, (width, width), 1
                        )
                    )  # j (row) precedes s (col)
                    if any_hit:
                        before = idx_lt
                    else:
                        kc = keys_vec[:, None]
                        kr = keys_vec[None, :]
                        before = (kc > kr) | ((kc == kr) & idx_lt)
                    m = take_vec[:, None] & before
                    rank = jnp.sum(m.astype(jnp.int32), axis=0)  # [width]
                    pushed = jnp.sum(take_vec.astype(jnp.int32))
                    for s in range(width):
                        pos = jnp.minimum(sp + rank[s], stack - 1)

                        @pl.when(takes[s])
                        def _(s=s, pos=pos):
                            stack_ref[pos] = slot_codes[s].astype(jnp.int32)
                            for w in range(n_words):
                                gbits_refs[w][pos] = bits[s][w]
                            for w in range(hw_words):
                                hbits_refs[w][pos] = hbits[s][w]

                    return jnp.minimum(sp + pushed, stack)

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
                        for w in range(n_words):
                            bits[a][w], bits[b][w] = pick(
                                bits[a][w], bits[b][w]
                            )
                        for w in range(hw_words):
                            hbits[a][w], hbits[b][w] = pick(
                                hbits[a][w], hbits[b][w]
                            )

                # Compacted branch-free pushes: slot s lands at
                # sp + (#takes before s), clamped to the (build-sized) stack.
                pushed = jnp.int32(0)
                for s in range(width):
                    code = codes_l[s]
                    take = takes[s]
                    bit = bits[s]
                    hbit = hbits[s]
                    pos = jnp.minimum(sp + pushed, stack - 1)

                    @pl.when(take)
                    def _(code=code, bit=bit, hbit=hbit, pos=pos):
                        stack_ref[pos] = code.astype(jnp.int32)
                        for w in range(n_words):
                            gbits_refs[w][pos] = bit[w]
                        for w in range(hw_words):
                            hbits_refs[w][pos] = hbit[w]

                    pushed = pushed + take.astype(jnp.int32)

                return jnp.minimum(sp + pushed, stack)

            def handle_leaf(sp, cur_inst=None):
                cl = -entry - 2  # int32 leaf code
                if clusters_hbm:
                    # Cluster table lives in HBM (Sponza-scale scenes exceed
                    # VMEM); DMA the row in at pop time. The whole packet
                    # shares one row, so the fetch amortizes over up to
                    # sublanes×128 rays. (A double-buffered stack-peek
                    # prefetch measured NEUTRAL on v5e — the row DMA hides
                    # behind the previous leaf's vector work already.)
                    dma = pltpu.make_async_copy(
                        clusters_ref.at[pl.ds(cl, 1)], cbuf_ref, csem_ref
                    )
                    dma.start()
                    dma.wait()
                    crow = cbuf_ref[0]
                elif seg and tables_hbm:
                    crow = tbuf_ref[0, cl]  # [row_len]
                elif seg:
                    crow = clusters_ref[0, cl]  # [row_len]
                else:
                    crow = clusters_ref[cl]  # [row_len]

                def extract_tris():
                    # Triangle scalars extracted once; broadcast inside each
                    # active block's predicated body.
                    per_tri = 12 if bw_leaf else 9
                    tris = []
                    for j in range(leaf_size):
                        b = j * per_tri
                        tris.append(
                            tuple(crow[b + i] for i in range(per_tri))
                            + (crow[per_tri * leaf_size + j],)
                        )
                    return tris

                def moller_block(tris, start, blk):
                    start = _aligned(start)
                    sl = pl.ds(start, blk)
                    gox, goy, goz = (
                        ray_slice(0, start, blk),
                        ray_slice(1, start, blk),
                        ray_slice(2, start, blk),
                    )
                    gdx, gdy, gdz = (
                        ray_slice(3, start, blk),
                        ray_slice(4, start, blk),
                        ray_slice(5, start, blk),
                    )
                    if mixed_hit:
                        # Per-lane any-hit flag (rays row 7; world-invariant
                        # so read from rays_ref even under two_level's tray).
                        ah = rays_ref[0, 7, sl] > 0.5
                    bt = out_ref[0, 0, sl]
                    bu = out_ref[0, 1, sl]
                    bv = out_ref[0, 2, sl]
                    bid = out_ref[0, 3, sl]
                    if two_level:
                        binst = out_ref[0, 4, sl]
                        hit_any = jnp.zeros_like(bt, dtype=jnp.bool_)
                    if bw_leaf:
                        # Baldwin–Weber: t from the precomputed plane, u/v
                        # from the two projection rows — no cross products in
                        # the hot loop (~38 ops/tri vs Möller's ~49).
                        for (
                            nx, ny, nz, d0c,
                            n1x, n1y, n1z, d1c,
                            n2x, n2y, n2z, d2c, tid,
                        ) in tris:
                            nd = nx * gdx + ny * gdy + nz * gdz
                            no = nx * gox + ny * goy + nz * goz + d0c
                            inv = jnp.where(
                                jnp.abs(nd) > 1e-12, 1.0 / nd, 0.0
                            )
                            tt = -no * inv
                            uu = (
                                n1x * gox + n1y * goy + n1z * goz + d1c
                            ) + tt * (n1x * gdx + n1y * gdy + n1z * gdz)
                            vv = (
                                n2x * gox + n2y * goy + n2z * goz + d2c
                            ) + tt * (n2x * gdx + n2y * gdy + n2z * gdz)
                            ok = (
                                (jnp.abs(nd) > 1e-12)
                                & (uu >= 0.0)
                                & (vv >= 0.0)
                                & (uu + vv <= 1.0)
                                & (tt > t_min)
                                & (tt < bt)
                                & (tid >= 0.0)
                            )
                            if any_hit:
                                t_new = jnp.zeros_like(tt)
                            elif mixed_hit:
                                t_new = jnp.where(ah, 0.0, tt)
                            else:
                                t_new = tt
                            bt = jnp.where(ok, t_new, bt)
                            bu = jnp.where(ok, uu, bu)
                            bv = jnp.where(ok, vv, bv)
                            bid = jnp.where(ok, tid, bid)
                            if two_level:
                                hit_any = hit_any | ok
                    elif div_free:
                        # Division-free Möller: track the block-best hit as
                        # a (numerator, |det|) pair — sign-corrected so all
                        # comparisons are cross-multiplications — and divide
                        # ONCE per block instead of once per triangle (the
                        # VPU divide is the most expensive op in the loop).
                        # Entry best t folds in as the pair (bt, 1).
                        bnum = bt
                        bden = jnp.ones_like(bt)
                        bu2 = bu
                        bv2 = bv
                        changed = jnp.zeros_like(bt, dtype=jnp.bool_)
                        for (
                            v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z, tid
                        ) in tris:
                            px_ = gdy * e2z - gdz * e2y
                            py_ = gdz * e2x - gdx * e2z
                            pz_ = gdx * e2y - gdy * e2x
                            det = e1x * px_ + e1y * py_ + e1z * pz_
                            sd = jnp.where(det < 0.0, -1.0, 1.0)
                            adet = det * sd
                            tx = gox - v0x
                            ty = goy - v0y
                            tz = goz - v0z
                            u2 = (tx * px_ + ty * py_ + tz * pz_) * sd
                            qx = ty * e1z - tz * e1y
                            qy = tz * e1x - tx * e1z
                            qz = tx * e1y - ty * e1x
                            v2 = (gdx * qx + gdy * qy + gdz * qz) * sd
                            t2 = (e2x * qx + e2y * qy + e2z * qz) * sd
                            ok = (
                                (adet > 1e-9)
                                & (u2 >= 0.0)
                                & (v2 >= 0.0)
                                & (u2 + v2 <= adet)
                                & (t2 > t_min * adet)
                                & (t2 * bden < bnum * adet)
                                & (tid >= 0.0)
                            )
                            # Any-hit: retire blocked lanes by driving their
                            # best-t to 0 — every later box test then fails
                            # (tf <= 0 < t_min <= tn), so group masks shrink
                            # as blockage accumulates. Callers read only the
                            # hit boolean in any-hit mode (t is unordered).
                            # mixed_hit applies the same per flagged LANE.
                            if any_hit:
                                t_new = jnp.zeros_like(t2)
                            elif mixed_hit:
                                t_new = jnp.where(ah, 0.0, t2)
                            else:
                                t_new = t2
                            bnum = jnp.where(ok, t_new, bnum)
                            bden = jnp.where(ok, adet, bden)
                            bu2 = jnp.where(ok, u2, bu2)
                            bv2 = jnp.where(ok, v2, bv2)
                            bid = jnp.where(ok, tid, bid)
                            changed = changed | ok
                        inv = 1.0 / bden
                        bt = jnp.where(changed, bnum * inv, bt)
                        bu = jnp.where(changed, bu2 * inv, bu)
                        bv = jnp.where(changed, bv2 * inv, bv)
                        if two_level:
                            hit_any = changed
                    else:
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
                            # Any-hit: best-t 0 retires the lane from every
                            # later box test (see div_free branch note);
                            # mixed_hit retires only flagged lanes.
                            if any_hit:
                                t_new = jnp.zeros_like(tt)
                            elif mixed_hit:
                                t_new = jnp.where(ah, 0.0, tt)
                            else:
                                t_new = tt
                            bt = jnp.where(ok, t_new, bt)
                            bu = jnp.where(ok, uu, bu)
                            bv = jnp.where(ok, vv, bv)
                            bid = jnp.where(ok, tid, bid)
                            if two_level:
                                hit_any = hit_any | ok
                    out_ref[0, 0, sl] = bt
                    out_ref[0, 1, sl] = bu
                    out_ref[0, 2, sl] = bv
                    out_ref[0, 3, sl] = bid
                    if two_level:
                        out_ref[0, 4, sl] = jnp.where(
                            hit_any, cur_inst.astype(jnp.float32), binst
                        )

                # (Round-3 negative result, measured at 2M rays: per-half
                # cluster-AABB slab culling — lax.cond per active group
                # computing an [8,128] slab + jnp.any, pl.when per 8-row half
                # around moller_block — regressed EVERY population 25-35%
                # (bounce 2.75 → 2.10, presorted primary 27.4 → 22.3 Mray/s).
                # Each vector→scalar reduction forces a VPU pipeline drain
                # before the scalar branch; ~7 drains per leaf pop cost more
                # than the skipped Möller work saved. Same failure mode as
                # round 2's any-hit blocked-skip. Cluster AABBs remain packed
                # in row lanes [10L, 10L+6) for layout-compatible retries.)
                tris = extract_tris()
                if bit_loop:
                    # Iterate only the SET activation bits (finest available
                    # granularity: half bits when n_half > 1, group bits
                    # otherwise) — scalar cost per pop = popcount, and the
                    # Möller slab start is a traced, GROUP_ROWS-aligned
                    # dynamic offset.
                    if n_half > 1:
                        hr = rows // n_half

                        def lbody(b, extra):
                            moller_block(tris, b * hr, hr)
                            return extra

                        _bit_iter(list(hbits_w), lbody, ())
                    else:

                        def lbody(g, extra):
                            moller_block(tris, g * rows, rows)
                            return extra

                        _bit_iter(list(mbits_w), lbody, ())
                else:
                    for g in range(n_groups):
                        # (An extra any-hit per-group "all blocked" skip
                        # measured a 2.4x REGRESSION here: n_groups
                        # unconditional [8,128] reductions per leaf pop cost
                        # more than skipped groups save. Group bits alone
                        # carry the work skipping.)
                        @pl.when(g_active(g))
                        def _(g=g):
                            if n_half == 1:
                                moller_block(tris, g * rows, rows)
                            else:
                                # Half-group predication: the bits were
                                # computed at push time (free vector split),
                                # so this is a pure scalar SMEM test — no
                                # VPU drain.
                                hr = rows // n_half
                                for h in range(n_half):
                                    @pl.when(h_active(g, h))
                                    def _(g=g, h=h):
                                        moller_block(
                                            tris, g * rows + h * hr, hr
                                        )

                return sp

            # (Pop culling — per-entry min-tn keys vs per-group shrinking
            # best_t bounds — measured ZERO culls on real workloads: one
            # never-hitting ray per 1024-ray group pins its bound at
            # BACKGROUND_DEPTH, and the per-pop scalar threshold loop cost
            # 10-25%. Removed; see docs/ROADMAP.md.)
            cur_inst = carry.get("inst", jnp.int32(-1))

            def dispatch(args):
                sp, cur_inst = args
                if not two_level:
                    return (
                        jax.lax.cond(entry >= 0, handle_node, handle_leaf, sp),
                        cur_inst,
                    )

                def on_node(args):
                    sp, cur_inst = args
                    is_tlas = entry < tlas_nodes

                    # Popping back out to the TLAS: restore world-space rays
                    # (a pushed BLAS subtree always pops contiguously, so the
                    # tray is only ever stale when a TLAS entry pops).
                    @pl.when(is_tlas & (cur_inst >= 0))
                    def _():
                        for k in range(9):
                            tray_ref[k] = world_rays[k]

                    cur_inst = jnp.where(is_tlas, jnp.int32(-1), cur_inst)
                    return handle_node(sp), cur_inst

                def on_neg(args):
                    sp, cur_inst = args
                    cl = -entry - 2

                    def on_cluster(args):
                        sp, cur_inst = args
                        return handle_leaf(sp, cur_inst), cur_inst

                    def on_instance(args):
                        # TLAS leaf: map rays into the instance's object
                        # space and descend into its BLAS (raytracing.rs
                        # TLAS→BLAS hop; t is affine-invariant).
                        sp = args[0]
                        inst = cl - num_clusters
                        irow = inst_ref[inst]
                        m = [irow[k] for k in range(12)]  # inv M rows [R|t]
                        tox = m[0] * ox + m[1] * oy + m[2] * oz + m[3]
                        toy = m[4] * ox + m[5] * oy + m[6] * oz + m[7]
                        toz = m[8] * ox + m[9] * oy + m[10] * oz + m[11]
                        tdx = m[0] * dx + m[1] * dy + m[2] * dz
                        tdy = m[4] * dx + m[5] * dy + m[6] * dz
                        tdz = m[8] * dx + m[9] * dy + m[10] * dz
                        tix, tiy, tiz = inv3(tdx, tdy, tdz)
                        for k, v in enumerate(
                            (tox, toy, toz, tdx, tdy, tdz, tix, tiy, tiz)
                        ):
                            tray_ref[k] = v
                        pos = jnp.minimum(sp, stack - 1)
                        stack_ref[pos] = irow[12].astype(jnp.int32)  # blas root
                        for w in range(n_words):
                            gbits_refs[w][pos] = mbits_w[w]
                        for w in range(hw_words):
                            hbits_refs[w][pos] = hbits_w[w]
                        return jnp.minimum(sp + 1, stack), inst

                    return jax.lax.cond(
                        cl < num_clusters, on_cluster, on_instance,
                        (sp, cur_inst),
                    )

                return jax.lax.cond(
                    entry >= 0, on_node, on_neg, (sp, cur_inst)
                )

            sp, cur_inst = dispatch((sp, cur_inst))
            if any_hit:
                # Terminate the packet when every live ray is blocked
                # (padding rays carry t_cap <= t_min and count as done).
                done = (out_ref[0, 3] >= 0.0) | (t_cap <= t_min)
                sp = jnp.where(jnp.all(done), 0, sp)

            out = {"sp": sp}
            if two_level:
                out["inst"] = cur_inst
            if stats:
                is_node = (entry >= 0).astype(jnp.int32)
                pc = jnp.int32(0)
                for g in range(n_groups):
                    pc = pc + ((mbits_w[g // 32] >> (g % 32)) & 1)
                st = carry["st"]
                out["st"] = (
                    st[0] + is_node,
                    st[1] + (1 - is_node),
                    st[2] + is_node * pc,
                    st[3] + (1 - is_node) * pc,
                )
            return out

        init = {"sp": sp0}
        if two_level:
            init["inst"] = jnp.int32(-1)  # world space
        if stats:
            init["st"] = (jnp.int32(0),) * 4
        final = jax.lax.while_loop(cond, body, init)
        if stats and seg:
            st = final["st"]
            # Accumulate across the segment's candidate steps; lane 4 counts
            # steps that actually traversed (gmask ≠ 0 → sp0 = 1). VMEM
            # rejects scalar stores — build a [128] delta vector instead.
            lanes = jax.lax.broadcasted_iota(jnp.int32, (128,), 0)
            delta = jnp.zeros((128,), jnp.int32)
            for k, v in enumerate((st[0], st[1], st[2], st[3], sp0)):
                delta = delta + jnp.where(lanes == k, v, 0)
            stats_ref[seg_srow] = stats_ref[seg_srow] + delta
        elif stats:
            st = final["st"]
            stats_ref[pid, 0] = st[0]  # node pops
            stats_ref[pid, 1] = st[1]  # leaf pops
            stats_ref[pid, 2] = st[2]  # node group activations
            stats_ref[pid, 3] = st[3]  # leaf group activations

    shapes = [pltpu.SMEM((stack,), jnp.int32)] + [
        pltpu.SMEM((stack,), jnp.int32) for _ in range(n_words + hw_words)
    ]
    if clusters_hbm:
        shapes.append(pltpu.VMEM((1, clusters_ref.shape[1]), jnp.float32))
        shapes.append(pltpu.SemaphoreType.DMA(()))
    if two_level:
        shapes.append(pltpu.VMEM((9, sublanes, 128), jnp.float32))
    if tables_hbm:
        shapes.append(pltpu.VMEM((1,) + nodes_ref.shape[1:], jnp.float32))
        shapes.append(pltpu.SemaphoreType.DMA(()))
        shapes.append(pltpu.VMEM((1,) + clusters_ref.shape[1:], jnp.float32))
        shapes.append(pltpu.SemaphoreType.DMA(()))
    if bit_loop and not two_level:
        shapes.append(pltpu.VMEM((3, sublanes, 128), jnp.float32))
    pl.run_scoped(scoped, *shapes)


def packet_intersect(
    pt: PacketTables,
    origins: jax.Array,
    directions: jax.Array,
    t_min: float = 1e-4,
    t_max=_BG,
    any_hit: bool = False,
    interpret: bool = False,
    sublanes: int = PACKET_SUBLANES,
    stats: bool = False,
    clusters_hbm: bool = False,
    half_leaf: bool = False,
    div_free: bool = False,
    rank_push: bool = False,
    bit_loop: bool = False,
    max_groups: int = 32,
) -> intersect.Hit:
    """Trace rays [N, 3] through the packet kernel. N is padded to a multiple
    of PACKET; callers should order rays coherently (tiles / sorted queues).

    stats=True additionally returns per-packet counters [G, 8] int32:
    (node pops, leaf pops, node group activations, leaf group activations)."""
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

    # Worst case ≤ (width-1) siblings left per level + the entry in flight
    # (+1 per TLAS→BLAS hop, covered by the summed two-level depth).
    stack = max(STACK, (pt.width - 1) * pt.depth + 1 + pt.depth)
    two_level = pt.inst_table is not None
    out_ch = 5 if two_level else 4
    kernel = functools.partial(
        _kernel, leaf_size=pt.leaf_size, any_hit=any_hit, t_min=t_min,
        width=pt.width, stack=stack, stats=stats, clusters_hbm=clusters_hbm,
        two_level=two_level, tlas_nodes=pt.tlas_nodes,
        num_clusters=pt.num_clusters, half_leaf=half_leaf,
        div_free=div_free, rank_push=rank_push, bit_loop=bit_loop,
        max_groups=max_groups, bw_leaf=pt.bw_leaf,
    )
    # Explicit HBM (not ANY): the compiler may otherwise place wide cluster
    # tables in VMEM, where 1-row DMA slices hit sublane-tiling limits.
    cluster_space = pltpu.HBM if clusters_hbm else pltpu.VMEM
    if clusters_hbm and pt.cluster_table.shape[1] != 128:
        # Mosaic rejects 1-row DMA slices of multi-lane-tile rows
        # ("Slice shape along dimension 0 must be aligned to tiling (8)"),
        # so HBM mode requires single-tile cluster rows (leaf_size ≤ 12).
        raise ValueError(
            "clusters_hbm requires 128-lane cluster rows (leaf_size <= 12); "
            f"got row length {pt.cluster_table.shape[1]}"
        )
    in_specs = [
        pl.BlockSpec((1, 8, sublanes, 128), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=cluster_space),
    ]
    inputs = [rays, pt.node_table, pt.cluster_table]
    if two_level:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        inputs.append(pt.inst_table)
    out_specs = pl.BlockSpec(
        (1, out_ch, sublanes, 128), lambda i: (i, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((g, out_ch, sublanes, 128), jnp.float32)
    if stats:
        out_specs = (
            out_specs,
            pl.BlockSpec(memory_space=pltpu.SMEM),  # whole array, per-packet rows
        )
        out_shape = (out_shape, jax.ShapeDtypeStruct((g, 8), jnp.int32))
    out = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*inputs)

    if stats:
        out, stat_rows = out
    out = out.transpose(1, 0, 2, 3).reshape(out_ch, g * packet)[:, :n]
    best_t, u, v, fid = out[0], out[1], out[2], out[3]
    prim_id = fid.astype(jnp.int32)
    found = prim_id >= 0
    hit = intersect.Hit(
        t=jnp.where(found, best_t, _BG),
        uv=jnp.stack([u, v], axis=-1),
        prim_id=prim_id,
        hit=found,
        inst=out[4].astype(jnp.int32) if two_level else None,
    )
    if stats:
        return hit, stat_rows
    return hit


def packet_intersect_segments(
    tt,
    seg_list: jax.Array,  # [S, E] int32 treelet id per candidate slot (DMA)
    seg_entry: jax.Array,  # [S, E] f32 min entry distance (per-step t-cull)
    seg_gmask: jax.Array,  # [S, E, W] int32 group-activation words (0 = skip)
    origins: jax.Array,  # [S*p, 3] rays already in segment order
    directions: jax.Array,  # [S*p, 3]
    t_cap: jax.Array,  # [S*p] per-ray cap (0 parks a lane)
    t_min: float = 1e-4,
    any_hit: bool = False,
    interpret: bool = False,
    sublanes: int = 64,
    stats: bool = False,
    half_leaf: bool = False,
    div_free: bool = False,
    rank_push: bool = False,
    anyhit_row: jax.Array | None = None,  # [S*p] f32 >0.5 = any-hit lane
    step_cull: bool = False,
    tables_hbm: bool = False,
    vmem_limit: int | None = None,
    bit_loop: bool = False,
    max_groups: int = 32,
) -> jax.Array:
    """Segment-grid packet traversal over per-treelet tables (see
    ops/treelets.py driver + _kernel docstring). Returns [4, S*p] rows
    (t, u, v, prim-id-as-float) in the caller's ray order.

    anyhit_row: per-LANE any-hit flags for mixed shadow+bounce launches
    (rides the otherwise-redundant rays row 7; see _kernel mixed_hit).
    stats=True additionally returns per-segment [S, 8] int32 counters
    (node pops, leaf pops, node activations, leaf activations, live steps)
    accumulated over the segment's candidate steps.
    vmem_limit: raise Mosaic's scoped-VMEM budget (default ~16 MB) toward
    the chip's physical VMEM (128 MB on v5e) — unlocks bigger treelets /
    segments than the default budget admits."""
    s_count = seg_list.shape[0]
    e_count = seg_list.shape[1]
    p = sublanes * 128
    n = origins.shape[0]
    assert n == s_count * p, (n, s_count, p)
    # Flatten [S, E, W] -> [S, E*W]: SMEM pads the last dim to 128 lanes,
    # so the 3D layout costs 128x the SMEM with W=1 (OOM at ~128 segments).
    seg_gmask = seg_gmask.reshape(s_count, -1)

    o, d = origins, directions
    row7 = t_cap if anyhit_row is None else anyhit_row
    rays = jnp.stack(
        [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], t_cap, row7],
        axis=0,
    ).reshape(8, s_count, sublanes, 128).transpose(1, 0, 2, 3)

    stack = max(STACK, (tt.width - 1) * tt.depth + 1 + tt.depth)
    kernel = functools.partial(
        _kernel, leaf_size=tt.leaf_size, any_hit=any_hit, t_min=t_min,
        width=tt.width, stack=stack, seg=True, stats=stats,
        half_leaf=half_leaf, div_free=div_free, rank_push=rank_push,
        mixed_hit=anyhit_row is not None, seg_cull=step_cull,
        tables_hbm=tables_hbm, bit_loop=bit_loop, max_groups=max_groups,
        bw_leaf=getattr(tt, "bw_leaf", False),
    )
    row_len = tt.node_tables.shape[2]
    lane = tt.cluster_tables.shape[2]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(s_count, e_count),
        in_specs=[
            pl.BlockSpec(
                (1, 8, sublanes, 128), lambda s, e, sl, se, sg: (s, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + (
            [
                # tables_hbm: whole tables stay in HBM; the kernel DMAs the
                # live step's treelet into single-buffered VMEM scratch
                # (half the table VMEM of the revolving BlockSpec window →
                # ~2× bigger treelets fit).
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ]
            if tables_hbm
            else [
                pl.BlockSpec(
                    (1, tt.max_nodes, row_len),
                    lambda s, e, sl, se, sg: (sl[s, e], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, tt.max_clusters, lane),
                    lambda s, e, sl, se, sg: (sl[s, e], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ]
        ),
        out_specs=pl.BlockSpec(
            (1, 4, sublanes, 128), lambda s, e, sl, se, sg: (s, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        if not stats
        else (
            pl.BlockSpec(
                (1, 4, sublanes, 128), lambda s, e, sl, se, sg: (s, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # [8, 128] tile covering 8 segments (block-shape rule); each
            # segment owns row s % 8, counters in lanes 0..4.
            pl.BlockSpec(
                (8, 128), lambda s, e, sl, se, sg: (s // 8, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
    )
    out_shape = jax.ShapeDtypeStruct((s_count, 4, sublanes, 128), jnp.float32)
    if stats:
        s_pad8 = ((s_count + 7) // 8) * 8
        out_shape = (
            out_shape, jax.ShapeDtypeStruct((s_pad8, 128), jnp.int32)
        )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=(
            None
            if vmem_limit is None
            else pltpu.CompilerParams(vmem_limit_bytes=int(vmem_limit))
        ),
    )(seg_list, seg_entry, seg_gmask, rays, tt.node_tables, tt.cluster_tables)
    if stats:
        out, stat_rows = out
        return (
            out.transpose(1, 0, 2, 3).reshape(4, n),
            stat_rows[:s_count, :8],
        )
    return out.transpose(1, 0, 2, 3).reshape(4, n)


# Cluster tables beyond this VMEM share spill to HBM with per-leaf DMA
# (VMEM is ~16 MiB/core; rays/out/nodes need several MiB of it).
CLUSTERS_VMEM_LIMIT = 6 * 1024 * 1024


def packet_backend(
    scene=None, leaf_size: int = 12, interpret: bool = False,
    sublanes: int = PACKET_SUBLANES, width: int = 16,
    host_tris=None, clusters_hbm: bool | None = None,
    treelet_sublanes: int = 512, cluster_mode: str = "sah",
    force_treelets: bool = False,
):
    """Build a TraceBackend whose tables travel as jit arguments (see
    ops/backend.py for why closures over device tables are forbidden).

    Scenes whose cluster table doesn't fit VMEM alongside the rays route to
    the treelet segment-grid backend (ops/treelets.py) — the production
    large-scene path. Pass clusters_hbm=True to force the legacy per-leaf
    HBM-DMA mode instead (kept for comparison and tests)."""
    from raytracer3_tpu.ops.backend import TraceBackend

    if host_tris is not None:
        v0, v1, v2 = host_tris
    else:
        v0, v1, v2 = scene.tri_vertices()
    row_len = ((9 * leaf_size + leaf_size + 6 + 127) // 128) * 128
    est_clusters = -(-v0.shape[0] // leaf_size) * 1.35  # SAH underfill slack
    if force_treelets or (
        clusters_hbm is None
        and est_clusters * row_len * 4 > CLUSTERS_VMEM_LIMIT
    ):
        from raytracer3_tpu.ops import treelets

        # Treelet-path defaults (98k/leaf24, measured best — see
        # treelet_backend docstring) override this function's small-scene
        # leaf_size: the two paths want different leaf packings.
        return treelets.treelet_backend(
            host_tris=(v0, v1, v2), width=width,
            sublanes=treelet_sublanes, interpret=interpret,
        )
    cb = cb_mod.build_cluster_bvh_host(
        v0, v1, v2, leaf_size, width=width, cluster_mode=cluster_mode
    )
    pt = pack_tables(cb)
    if clusters_hbm is None:
        clusters_hbm = (
            pt.cluster_table.size * 4 > CLUSTERS_VMEM_LIMIT
        )
    meta = pt._replace(node_table=None, cluster_table=None)
    arrays = {"nodes": pt.node_table, "clusters": pt.cluster_table}

    # Small-scene kernel flags (same-process sweep, 19k-tri atrium,
    # tools/probe_packet_flags.py 2026-08-19): half_leaf +7-10% on
    # bounce/occlusion, bit_loop +11% on tiled primaries, rank_push/BL64
    # neutral — half_leaf + bit_loop go on everywhere. (The treelet backend
    # was also tried for the small scene and LOSES: 5.37 vs 8.64 Mray/s
    # headline — segment-grid driver overhead without the VMEM pressure
    # that justifies it; sample batching doesn't help the small scene
    # either, tools/probe_headline_treelet.py.)
    def isect_fn(arrays, o, d):
        pt2 = meta._replace(
            node_table=arrays["nodes"], cluster_table=arrays["clusters"]
        )
        return packet_intersect(
            pt2, o, d, interpret=interpret, sublanes=sublanes,
            clusters_hbm=clusters_hbm, half_leaf=True, bit_loop=True,
        )

    def occl_fn(arrays, o, d, tmax):
        pt2 = meta._replace(
            node_table=arrays["nodes"], cluster_table=arrays["clusters"]
        )
        return packet_intersect(
            pt2, o, d, t_max=tmax, any_hit=True, interpret=interpret,
            sublanes=sublanes, clusters_hbm=clusters_hbm, half_leaf=True,
            bit_loop=True,
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
