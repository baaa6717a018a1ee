"""Two-level acceleration structure: per-mesh BLAS + instance TLAS.

TPU-native counterpart of the reference's TLAS/BLAS split
(src/renderer/vulkan/raytracing.rs:88-148 builds per-mesh BLASes and one TLAS
over InstanceInfo transforms; src/renderer/world/mod.rs:32-43,137-154 keeps
instances as GPU data and rebuilds only the TLAS on edits). Round 1 baked
instances into world space at pool flatten — a transform edit re-flattened
every vertex and rebuilt the whole BVH. Here:

- every mesh gets a cluster BVH ONCE, in object space
  (ops/cluster_bvh.build_cluster_bvh_host);
- all BLAS node tables concatenate behind the TLAS nodes in one table
  (node ids globally offset; cluster leaf codes globally offset);
- the TLAS is a small wide BVH over instance world AABBs whose leaf codes
  encode instance ids (code = -(C_total + instance) - 2);
- the instance table carries the world→object transform (rays are mapped
  into object space at TLAS-leaf pop; the hit parameter t is affine-invariant
  so world-space best_t needs no rescaling) and the object→world normal
  matrix for shading.

A transform edit rebuilds ONLY the TLAS rows + instance table (O(instances),
host numpy) — array shapes are unchanged so no recompile, and no vertex is
touched. See ops/pallas/traverse_kernel.py for the traversal side.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from raytracer3_tpu.ops import cluster_bvh as cb_mod

INST_ROW = 32  # instance-table lanes: invM(12) | blas_root(1) | pad


class TwoLevelTables(NamedTuple):
    """Packed two-level tables (host numpy until upload)."""

    node_table: np.ndarray  # [Mt + Mb, row_len] f32 — TLAS rows first
    cluster_table: np.ndarray  # [C_total, 128] f32 (kernel layout, tri ids mesh-global)
    inst_table: np.ndarray  # [I, INST_ROW] f32
    normal_mats: np.ndarray  # [I, 9] f32 object→world normal matrices
    leaf_size: int
    width: int
    depth: int  # tlas depth + max blas depth (stack sizing)
    num_clusters: int  # C_total: codes ≥ this are instance leaves
    num_nodes: int
    tlas_nodes: int
    mesh_of_instance: np.ndarray  # [I] int32


class _MeshBLAS(NamedTuple):
    nodes: np.ndarray  # local node table [m, row_len]
    clusters: np.ndarray  # packed kernel cluster rows [c, 128]
    root_min: np.ndarray  # [3]
    root_max: np.ndarray  # [3]
    depth: int
    tri_count: int


def build_mesh_blas(v0, v1, v2, leaf_size: int = 12, width: int = 16) -> _MeshBLAS:
    """Object-space BLAS for one mesh (build once per mesh, raytracing.rs:88)."""
    from raytracer3_tpu.ops.pallas import traverse_kernel as tk

    cb = cb_mod.build_cluster_bvh_host(v0, v1, v2, leaf_size, width=width)
    pt = tk.pack_tables_host(cb)  # host tables: no per-mesh tunnel round-trip
    nodes = np.asarray(pt.node_table)
    lo = np.minimum(np.minimum(v0.min(0), v1.min(0)), v2.min(0))
    hi = np.maximum(np.maximum(v0.max(0), v1.max(0)), v2.max(0))
    return _MeshBLAS(
        nodes=nodes,
        clusters=np.asarray(pt.cluster_table),
        root_min=lo.astype(np.float32),
        root_max=hi.astype(np.float32),
        depth=pt.depth,
        tri_count=int(v0.shape[0]),
    )


def _remap_codes(codes: np.ndarray, node_base: int, cluster_base: int):
    """Shift a BLAS row's child codes into the global id spaces."""
    out = codes.copy()
    internal = codes >= 0
    leaf = codes < -1
    out[internal] = codes[internal] + node_base
    out[leaf] = -((-codes[leaf] - 2) + cluster_base) - 2
    return out


def _instance_world_aabb(blas: _MeshBLAS, transform: np.ndarray):
    """World AABB of an instance: transform the 8 BLAS root corners."""
    lo, hi = blas.root_min, blas.root_max
    cs = np.array(
        [
            [x, y, z]
            for x in (lo[0], hi[0])
            for y in (lo[1], hi[1])
            for z in (lo[2], hi[2])
        ],
        np.float32,
    )
    r = transform[:3, :3]
    t = transform[:3, 3]
    wc = cs @ r.T + t
    return wc.min(0), wc.max(0)


def _build_tlas_rows(
    inst_min: np.ndarray,  # [I, 3]
    inst_max: np.ndarray,  # [I, 3]
    width: int,
    row_len: int,
    num_clusters: int,
    blas_node_base_of_inst: np.ndarray,  # unused here; kept for clarity
):
    """Wide TLAS over instance AABBs. Leaf code = -(C_total + inst) - 2.

    Returns (rows [Mt, row_len], depth). BLAS child node ids in TLAS rows are
    patched by the caller (internal TLAS codes reference TLAS rows only)."""
    i_count = inst_min.shape[0]
    big = np.float32(1e30)

    def make_row(children):
        """children: list of (cmin, cmax, code)."""
        row = np.zeros(row_len, np.float32)
        for s in range(width):
            if s < len(children):
                cmin, cmax, code = children[s]
            else:
                cmin, cmax, code = (
                    np.full(3, big), np.full(3, -big), -1.0
                )
            row[s * 3 : s * 3 + 3] = np.clip(cmin, -big, big)
            row[3 * width + s * 3 : 3 * width + s * 3 + 3] = np.clip(cmax, -big, big)
            row[6 * width + s] = code
        return row

    if i_count <= width:
        children = [
            (inst_min[i], inst_max[i], -(num_clusters + i) - 2.0)
            for i in range(i_count)
        ]
        return np.stack([make_row(children)]), 1

    # Median-split wide build over instance centroids (host, I is small).
    cent = (inst_min + inst_max) * 0.5
    rows = []

    def build(ids, my_id):
        # split ids into `width` groups along the longest axis recursively
        groups = [ids]
        while len(groups) < width:
            # split the largest group
            gi = max(range(len(groups)), key=lambda k: len(groups[k]))
            g = groups[gi]
            if len(g) <= 1:
                break
            lo = cent[g].min(0)
            hi = cent[g].max(0)
            ax = int(np.argmax(hi - lo))
            order = g[np.argsort(cent[g, ax], kind="stable")]
            half = len(order) // 2
            groups[gi : gi + 1] = [order[:half], order[half:]]
        children = []
        pending = []
        for g in groups:
            if len(g) == 0:
                continue
            gmin = inst_min[g].min(0)
            gmax = inst_max[g].max(0)
            if len(g) == 1:
                children.append((gmin, gmax, -(num_clusters + int(g[0])) - 2.0))
            else:
                child_id = len(rows) + len(pending) + 1  # assigned below
                pending.append(g)
                children.append((gmin, gmax, float(0)))  # patched
        return children, pending

    # Iterative BFS build with explicit id assignment.
    rows_children = []
    queue = [np.arange(i_count)]
    while queue:
        ids = queue.pop(0)
        children, pending = build(ids, len(rows_children))
        rows_children.append(children)
        queue.extend(pending)
    # Assign internal child ids in BFS order.
    next_id = 1
    final_rows = []
    depth = 1
    for children in rows_children:
        fixed = []
        for cmin, cmax, code in children:
            if code == 0.0 and not (cmin[0] > cmax[0]):
                fixed.append((cmin, cmax, float(next_id)))
                next_id += 1
            else:
                fixed.append((cmin, cmax, code))
        final_rows.append(make_row(fixed))
    rows = np.stack(final_rows)
    depth = cb_mod._host_tree_depth(
        rows[:, 6 * width : 7 * width].reshape(len(rows), width)
    )
    return rows, depth


def build_two_level(
    meshes: list,  # list of dicts with positions/indices (object space)
    instances: list,  # list of (mesh_index, transform [4,4])
    leaf_size: int = 12,
    width: int = 16,
    blas_cache: dict | None = None,
) -> TwoLevelTables:
    """Full two-level build. ``blas_cache`` (mesh_index → _MeshBLAS) lets
    transform-only edits skip every BLAS build (raytracing.rs TLAS refit)."""
    blas_cache = blas_cache if blas_cache is not None else {}
    blases = []
    for mi, m in enumerate(meshes):
        if mi not in blas_cache:
            pos, idx = m["positions"], m["indices"]
            v0, v1, v2 = pos[idx[:, 0]], pos[idx[:, 1]], pos[idx[:, 2]]
            blas_cache[mi] = build_mesh_blas(v0, v1, v2, leaf_size, width)
        blases.append(blas_cache[mi])

    row_len = blases[0].nodes.shape[1]

    # Concatenate cluster tables, remapping kernel-row triangle ids to the
    # mesh-global id space (shading tables are mesh-concatenated).
    cluster_tables = []
    cluster_base = []
    tri_base = []
    cbase = 0
    tbase = 0
    ls = leaf_size
    for b in blases:
        ct = b.clusters.copy()
        tids = ct[:, 9 * ls : 10 * ls]
        ct[:, 9 * ls : 10 * ls] = np.where(tids >= 0, tids + tbase, tids)
        cluster_tables.append(ct)
        cluster_base.append(cbase)
        tri_base.append(tbase)
        cbase += ct.shape[0]
        tbase += b.tri_count
    cluster_table = np.concatenate(cluster_tables)
    num_clusters = cbase

    # Instance table + world AABBs.
    i_count = len(instances)
    inst_table = np.zeros((i_count, INST_ROW), np.float32)
    normal_mats = np.zeros((i_count, 9), np.float32)
    inst_min = np.zeros((i_count, 3), np.float32)
    inst_max = np.zeros((i_count, 3), np.float32)
    mesh_of_instance = np.zeros(i_count, np.int32)

    # BLAS node tables go after the TLAS; TLAS row count must be known first.
    # TLAS internal structure depends only on instance AABBs.
    for k, (mi, transform) in enumerate(instances):
        b = blases[mi]
        mesh_of_instance[k] = mi
        lo, hi = _instance_world_aabb(b, transform)
        inst_min[k], inst_max[k] = lo, hi
        inv = np.linalg.inv(transform)
        inst_table[k, 0:12] = inv[:3, :].reshape(-1)  # rows: [R | t]
        r = transform[:3, :3]
        nmat = np.linalg.inv(r).T if abs(np.linalg.det(r)) > 1e-12 else r
        normal_mats[k] = nmat.reshape(-1)

    tlas_rows, tlas_depth = _build_tlas_rows(
        inst_min, inst_max, width, row_len, num_clusters, None
    )
    mt = tlas_rows.shape[0]

    # Remap + concatenate BLAS node tables.
    node_parts = [tlas_rows]
    node_base_of_mesh = {}
    nbase = mt
    for mi, b in enumerate(blases):
        node_base_of_mesh[mi] = nbase
        nt = b.nodes.copy()
        codes = nt[:, 6 * width : 7 * width]
        nt[:, 6 * width : 7 * width] = _remap_codes(
            codes, nbase, cluster_base[mi]
        )
        node_parts.append(nt)
        nbase += nt.shape[0]
    node_table = np.concatenate(node_parts)

    for k, (mi, _t) in enumerate(instances):
        inst_table[k, 12] = float(node_base_of_mesh[mi])  # blas root id

    depth = int(tlas_depth + max(b.depth for b in blases))
    return TwoLevelTables(
        node_table=node_table.astype(np.float32),
        cluster_table=cluster_table.astype(np.float32),
        inst_table=inst_table,
        normal_mats=normal_mats,
        leaf_size=leaf_size,
        width=width,
        depth=depth,
        num_clusters=num_clusters,
        num_nodes=node_table.shape[0],
        tlas_nodes=mt,
        mesh_of_instance=mesh_of_instance,
    )


def two_level_backend(
    meshes: list,
    instances: list,
    leaf_size: int = 12,
    width: int = 16,
    sublanes: int | None = None,
    interpret: bool = False,
    blas_cache: dict | None = None,
    clusters_hbm: bool | None = None,
):
    """TraceBackend over the two-level (TLAS/BLAS) packet traversal.

    Tables travel as jit arguments (ops/backend.py). Rebinding with a new
    TLAS (transform edits) reuses ``blas_cache`` and produces same-shaped
    arrays → no recompile."""
    from raytracer3_tpu.ops.backend import TraceBackend
    from raytracer3_tpu.ops.pallas import traverse_kernel as tk

    if sublanes is None:
        sublanes = tk.PACKET_SUBLANES
    tl = build_two_level(
        meshes, instances, leaf_size=leaf_size, width=width,
        blas_cache=blas_cache,
    )
    pt = tk.pack_two_level(tl)
    # Transform-only rebinds reuse the device cluster table (it can be tens
    # of MB; only TLAS/instance/node tables change — raytracing.rs refit).
    if blas_cache is not None:
        cached = blas_cache.get("__device_clusters__")
        if cached is not None and cached.shape == pt.cluster_table.shape:
            pt = pt._replace(cluster_table=cached)
        else:
            blas_cache["__device_clusters__"] = pt.cluster_table
    if clusters_hbm is None:
        clusters_hbm = pt.cluster_table.size * 4 > tk.CLUSTERS_VMEM_LIMIT
    meta = pt._replace(node_table=None, cluster_table=None, inst_table=None)
    arrays = {
        "nodes": pt.node_table,
        "clusters": pt.cluster_table,
        "insts": pt.inst_table,
    }

    def _rebind(arrays):
        return meta._replace(
            node_table=arrays["nodes"],
            cluster_table=arrays["clusters"],
            inst_table=arrays["insts"],
        )

    def isect_fn(arrays, o, d):
        return tk.packet_intersect(
            _rebind(arrays), o, d, interpret=interpret, sublanes=sublanes,
            clusters_hbm=clusters_hbm,
        )

    def occl_fn(arrays, o, d, tmax):
        return tk.packet_intersect(
            _rebind(arrays), o, d, t_max=tmax, any_hit=True,
            interpret=interpret, sublanes=sublanes, clusters_hbm=clusters_hbm,
        ).hit

    return TraceBackend(arrays, isect_fn, occl_fn, meta=(pt, tl))
