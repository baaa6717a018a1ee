"""Scene data model: SoA geometry + material arrays addressed by integer ids.

This is the TPU-native analog of the reference's *bindless* resource model
(src/renderer/bindless/mod.rs + shaders/include/bindless.slang): where the
reference puts every buffer/texture into global descriptor tables and lets
shaders index them with 32-bit handles, here the whole scene is one pytree of
dense device arrays and "handles" are plain integer indices into them —
``geo_id`` plays the role of the bindless GeometryInfo handle
(datatypes.slang:11-19), gathers play the role of descriptor loads.

Also implements the ``hit_info`` shading fetch (shaders/include/
hit_logic.slang:5-39): barycentric interpolation of normals/uvs/vertex colors
plus material/texture lookup, as one batched gather.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from raytracer3_tpu.ops import mathx, packing

# hit_logic.slang:35 multiplies material emission by 12.0.
EMISSION_SCALE = 12.0


class Materials(NamedTuple):
    """SoA material table — the GeometryInfo analog (datatypes.slang:11-19).
    The reference stores these f16-quantized in the asset cache
    (assets/mod.rs:45-59); on device f32 is free (VPU) so we widen."""

    base_color: jax.Array  # [G, 4] rgba factor
    emission: jax.Array  # [G, 3] raw emission factor (scaled at hit time)
    metallic: jax.Array  # [G]
    roughness: jax.Array  # [G]
    base_color_texture: jax.Array  # [G] int32 index into texture array, -1 = none


class EmissiveTable(NamedTuple):
    """Precomputed emissive-triangle list for next-event estimation.

    The reference samples lights only implicitly (BRDF sampling hits emissive
    geometry, old/refrence_mode.slang:52); NEE/MIS is the wavefront tracer's
    upgrade (SURVEY.md §7 step 6)."""

    tri_ids: jax.Array  # [L] int32 triangle indices (padded with -1)
    areas: jax.Array  # [L] world-space area
    cdf: jax.Array  # [L] normalized cumulative area (for proportional pick)
    total_area: jax.Array  # [] sum of areas
    count: jax.Array  # [] int32 number of valid entries
    # Denormalized per-light row for single-gather NEE:
    # v0(3) e1(3) e2(3) emission·12(3) valid(1) pad(3). XLA per-lane gathers
    # cost ~4.5 ms per [N]-row fetch on v5e regardless of table size, so the
    # light fetch must be ONE row gather, not 7 (positions/indices/material).
    light_table: Optional[jax.Array] = None  # [L, 16] f32


class Scene(NamedTuple):
    """Complete device scene. All arrays static-shaped; grow via scene/pools."""

    positions: jax.Array  # [V, 3]
    normals: jax.Array  # [V, 3]
    uvs: jax.Array  # [V, 2]
    indices: jax.Array  # [T, 3] int32
    geo_id: jax.Array  # [T] int32 material/geometry id per triangle
    materials: Materials
    # Single fixed-size texture array (the bindless texture table analog);
    # textures resampled to a common resolution at ingest. [K, TH, TW, 3].
    textures: Optional[jax.Array]
    env_map: Optional[jax.Array]  # [He, We, 3] equirect HDR (postprocess.slang:104)
    emissive: EmissiveTable
    # Denormalized per-triangle shading row (single-gather hit_info):
    # n0(3) n1(3) n2(3) uv0(2) uv1(2) uv2(2) geo_id(1) = 16 lanes.
    shade_table: Optional[jax.Array] = None  # [T, 16] f32
    # Material row table for one-hot MXU fetch (G is small):
    # base_color(3) emission·12(3) metallic(1) roughness(1) tex_id(1) pad(3).
    mat_table: Optional[jax.Array] = None  # [G, 12] f32
    # Instanced (TLAS) scenes: geometry above is OBJECT space per mesh;
    # shading rotates normals by the hit instance's object→world normal
    # matrix (row-major 3×3). None for flattened scenes.
    inst_normal_mats: Optional[jax.Array] = None  # [I, 9] f32
    # Environment importance sampling (alias method over luminance·sinθ —
    # an upgrade over the reference, which only picks the env up on miss):
    # per-texel row: prob(1) alias(1) pdf_self(1) rgb_self(3) pdf_alias(1)
    # rgb_alias(3) pad(6) — the alias branch's pdf/radiance are denormalized
    # into the row so ONE [N,16] gather samples a direction; env_rgbp
    # [He,We,4] = (r,g,b,pdf) gives the MIS pdf of BRDF-sampled escapes in
    # the same gather as the radiance.
    env_sample_table: Optional[jax.Array] = None  # [He*We, 16] f32
    env_rgbp: Optional[jax.Array] = None  # [He, We, 4] f32
    # Native-resolution mip-atlas textures (scene/textures.py): preferred
    # over the fixed-resolution `textures` array when present. The bindless
    # sampled-image table + immutable samplers analog
    # (src/renderer/bindless/mod.rs:340-360).
    tex_atlas: Optional[jax.Array] = None  # [Ha, Wa, 3] f32
    tex_meta: Optional[jax.Array] = None  # [K, 16] f32
    # Per-INSTANCE material override rows (TLAS scenes): same 12-lane layout
    # as mat_table, lane 11 = 1.0 activates the override for every hit on
    # that instance (whole-entity tint/material swap — beyond the reference,
    # whose instances always shade with their mesh materials). Fetched with
    # the same one-hot MXU matmul as the base row.
    inst_mat_table: Optional[jax.Array] = None  # [I, 12] f32
    # Per-vertex COLOR_0 (hit_logic.slang:5-39 interpolates it into albedo).
    # Only set when the asset carries colors; the fast path instead widens
    # shade_table to 32 lanes (lanes 16:25 = c0,c1,c2) — same single row
    # gather (2-axis gathers lane-pad to 128 regardless of width), zero hot-
    # path cost for color-less scenes.
    vertex_colors: Optional[jax.Array] = None  # [V, 3] f32

    @property
    def num_triangles(self) -> int:
        return self.indices.shape[0]

    def tri_vertices(self):
        """Gather per-triangle vertex positions → (v0, v1, v2) each [T, 3]."""
        i = self.indices
        return (
            self.positions[i[:, 0]],
            self.positions[i[:, 1]],
            self.positions[i[:, 2]],
        )


class SurfaceInfo(NamedTuple):
    """Shaded-hit surface attributes — the GbufferData analog
    (gbuffer_helpers.slang:5-12)."""

    albedo: jax.Array  # [N, 3]
    emissive: jax.Array  # [N, 3]
    normal: jax.Array  # [N, 3]
    roughness: jax.Array  # [N]
    metalness: jax.Array  # [N]


def _sample_texture_bilinear(tex: jax.Array, uv: jax.Array) -> jax.Array:
    """Bilinear wrap sample of one texture [TH, TW, 3] at uv [N, 2]."""
    th, tw = tex.shape[0], tex.shape[1]
    x = uv[:, 0] * tw - 0.5
    y = uv[:, 1] * th - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    x0i = jnp.mod(x0.astype(jnp.int32), tw)
    y0i = jnp.mod(y0.astype(jnp.int32), th)
    x1i = jnp.mod(x0i + 1, tw)
    y1i = jnp.mod(y0i + 1, th)
    # rgb9e5-packed taps: ONE u32 gather per tap instead of tex[y, x] row
    # gathers, whose [N, 3] outputs materialize in tiled T(8,128) layout on
    # TPU (42.7× padded HBM — measured 7.97 GB at 16.7M lanes on the env
    # path, render/pathtracer._sample_env). Per-channel 1-D gathers fix the
    # padding but triple the gather count (~4.5 ms per gather at 2M lanes);
    # the shared-exponent pack keeps the count AND kills the padding, at
    # ≤0.5% color rounding (≥ the 8-bit precision of PNG sources). The pack
    # of the texel table is loop-invariant VPU work.
    packed = packing.pack_rgb9e5(tex.reshape(-1, tex.shape[2]))
    c00 = packing.unpack_rgb9e5(packed[y0i * tw + x0i])
    c10 = packing.unpack_rgb9e5(packed[y0i * tw + x1i])
    c01 = packing.unpack_rgb9e5(packed[y1i * tw + x0i])
    c11 = packing.unpack_rgb9e5(packed[y1i * tw + x1i])
    return (
        c00 * (1 - fx) * (1 - fy)
        + c10 * fx * (1 - fy)
        + c01 * (1 - fx) * fy
        + c11 * fx * fy
    )


def sample_texture_array(textures: jax.Array, tex_id: jax.Array, uv: jax.Array) -> jax.Array:
    """Sample texture `tex_id` per lane from the texture array [K, TH, TW, 3].

    tex_id < 0 → white (no texture), mirroring hit_logic.slang:30-32."""
    safe_id = jnp.maximum(tex_id, 0)
    th, tw = textures.shape[1], textures.shape[2]
    x = uv[:, 0] * tw - 0.5
    y = uv[:, 1] * th - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    x0i = jnp.mod(x0.astype(jnp.int32), tw)
    y0i = jnp.mod(y0.astype(jnp.int32), th)
    x1i = jnp.mod(x0i + 1, tw)
    y1i = jnp.mod(y0i + 1, th)
    # rgb9e5-packed taps via flat indices (see _sample_texture_bilinear).
    packed = packing.pack_rgb9e5(textures.reshape(-1, textures.shape[3]))
    base = (safe_id * th + y0i) * tw
    base1 = (safe_id * th + y1i) * tw
    c00 = packing.unpack_rgb9e5(packed[base + x0i])
    c10 = packing.unpack_rgb9e5(packed[base + x1i])
    c01 = packing.unpack_rgb9e5(packed[base1 + x0i])
    c11 = packing.unpack_rgb9e5(packed[base1 + x1i])
    c = (
        c00 * (1 - fx) * (1 - fy)
        + c10 * fx * (1 - fy)
        + c01 * (1 - fx) * fy
        + c11 * fx * fy
    )
    return jnp.where(tex_id[:, None] < 0, 1.0, c)


def _onehot_rows(table: jax.Array, ids: jax.Array) -> jax.Array:
    """rows = one_hot(ids) @ table — MXU fetch for small tables (gathers cost
    ~4.5 ms per [N] fetch on v5e; a [N, G] one-hot matmul is ~free for small
    G). f32-exact."""
    m = table.shape[0]
    onehot = (
        ids[:, None] == jnp.arange(m, dtype=jnp.int32)[None, :]
    ).astype(jnp.float32)
    return jax.lax.dot(
        onehot, table, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def hit_surface_info(
    scene: Scene, prim_id: jax.Array, uv: jax.Array, inst=None,
    footprint_log2=None,
) -> SurfaceInfo:
    """Batched ``hit_info`` (hit_logic.slang:5-39): fetch triangle, interpolate
    attributes with barycentrics, apply material + base-color texture.

    prim_id: [N] triangle ids (clamped gather; callers mask misses).
    uv: [N, 2] barycentric (u, v).
    footprint_log2: [N] log2 of the ray-cone footprint in world units
    (textures.ray_cone_lod without the density term); the per-material
    texel density (mat_table lane 9) completes the mip level. None → mip 0.

    Fast path (shade_table present): ONE [N, 16] row gather + a one-hot
    material matmul replace ~10 separate per-lane gathers.
    """
    pid = jnp.clip(prim_id, 0, scene.num_triangles - 1)
    if scene.shade_table is not None and scene.mat_table is not None:
        # ONE [N, 16] row gather, interpolated inside bounded chunks so the
        # lane-padded [chunk, 128] buffer never exceeds ~1 GB at any lane
        # count (mathx.map_row_gather; 2-axis gathers pad 16 → 128 lanes).
        wide = scene.shade_table.shape[1] > 16  # vertex-color rows

        def _shade(row, uvc):
            w0 = (1.0 - uvc[:, 0] - uvc[:, 1])[:, None]
            w1 = uvc[:, 0:1]
            w2 = uvc[:, 1:2]
            nrm = row[:, 0:3] * w0 + row[:, 3:6] * w1 + row[:, 6:9] * w2
            tuv = (
                row[:, 9:11] * w0 + row[:, 11:13] * w1 + row[:, 13:15] * w2
            )
            if wide:
                # COLOR_0 barycentric interpolation (hit_logic.slang:5-39).
                vc = (
                    row[:, 16:19] * w0
                    + row[:, 19:22] * w1
                    + row[:, 22:25] * w2
                )
            else:
                vc = None
            return nrm, tuv, row[:, 15].astype(jnp.int32), vc

        normal, tex_uv, g, vtx_color = mathx.map_row_gather(
            scene.shade_table, pid, _shade, extras=(uv,)
        )
        if inst is not None and scene.inst_normal_mats is not None:
            # Object→world normal rotation per hit instance (TLAS scenes).
            nm = _onehot_rows(
                scene.inst_normal_mats, jnp.maximum(inst, 0)
            )  # [N, 9]
            normal = jnp.stack(
                [
                    nm[:, 0] * normal[:, 0] + nm[:, 1] * normal[:, 1] + nm[:, 2] * normal[:, 2],
                    nm[:, 3] * normal[:, 0] + nm[:, 4] * normal[:, 1] + nm[:, 5] * normal[:, 2],
                    nm[:, 6] * normal[:, 0] + nm[:, 7] * normal[:, 1] + nm[:, 8] * normal[:, 2],
                ],
                axis=-1,
            )
        normal = mathx.normalize(normal)
        mat = _onehot_rows(scene.mat_table, g)  # [N, 12]
        if inst is not None and scene.inst_mat_table is not None:
            # Per-instance override row (lane 11 gates; misses are masked by
            # callers, same convention as inst_normal_mats).
            imat = _onehot_rows(scene.inst_mat_table, jnp.maximum(inst, 0))
            mat = jnp.where(imat[:, 11:12] > 0.5, imat, mat)
        color = mat[:, 0:3]
        if vtx_color is not None:
            color = color * vtx_color
        if scene.tex_atlas is not None:
            from raytracer3_tpu.scene import textures as tex_mod

            tex_id = mat[:, 8].astype(jnp.int32)
            lod = None
            if footprint_log2 is not None:
                lod = footprint_log2 + mat[:, 9]  # + log2 texel density
            color = color * tex_mod.sample_atlas(
                scene.tex_atlas, scene.tex_meta, tex_id, tex_uv, lod
            )
        elif scene.textures is not None:
            tex_id = mat[:, 8].astype(jnp.int32)
            color = color * sample_texture_array(scene.textures, tex_id, tex_uv)
        return SurfaceInfo(
            albedo=color,
            emissive=mat[:, 3:6],
            normal=normal,
            roughness=mat[:, 7],
            metalness=mat[:, 6],
        )
    tri = scene.indices[pid]  # [N, 3]
    w = jnp.stack([1.0 - uv[:, 0] - uv[:, 1], uv[:, 0], uv[:, 1]], axis=-1)  # [N, 3]

    n0, n1, n2 = (scene.normals[tri[:, k]] for k in range(3))
    normal = mathx.normalize(
        n0 * w[:, 0:1] + n1 * w[:, 1:2] + n2 * w[:, 2:3]
    )
    t0, t1, t2 = (scene.uvs[tri[:, k]] for k in range(3))
    tex_uv = t0 * w[:, 0:1] + t1 * w[:, 1:2] + t2 * w[:, 2:3]

    g = scene.geo_id[pid]
    mat = scene.materials
    color = mat.base_color[g, :3]
    if scene.vertex_colors is not None:
        c0, c1, c2 = (scene.vertex_colors[tri[:, k]] for k in range(3))
        color = color * (
            c0 * w[:, 0:1] + c1 * w[:, 1:2] + c2 * w[:, 2:3]
        )
    if scene.tex_atlas is not None:
        from raytracer3_tpu.scene import textures as tex_mod

        tex_id = mat.base_color_texture[g]
        color = color * tex_mod.sample_atlas(
            scene.tex_atlas, scene.tex_meta, tex_id, tex_uv, footprint_log2
        )
    elif scene.textures is not None:
        tex_id = mat.base_color_texture[g]
        color = color * sample_texture_array(scene.textures, tex_id, tex_uv)

    return SurfaceInfo(
        albedo=color,
        emissive=mat.emission[g] * EMISSION_SCALE,
        normal=normal,
        roughness=mat.roughness[g],
        metalness=mat.metallic[g],
    )


def geometric_normals(scene: Scene, prim_id: jax.Array) -> jax.Array:
    """Face normals for offset/backface logic, [N, 3]."""
    pid = jnp.clip(prim_id, 0, scene.num_triangles - 1)
    tri = scene.indices[pid]
    v0 = scene.positions[tri[:, 0]]
    v1 = scene.positions[tri[:, 1]]
    v2 = scene.positions[tri[:, 2]]
    return mathx.normalize(jnp.cross(v1 - v0, v2 - v0))


# ---------------------------------------------------------------------------
# Host-side scene construction helpers
# ---------------------------------------------------------------------------


def build_emissive_table(
    positions: np.ndarray,
    indices: np.ndarray,
    geo_id: np.ndarray,
    emission: np.ndarray,
    pad_to: int | None = None,
) -> EmissiveTable:
    """Precompute the NEE light list (host side, at scene build)."""
    em_per_tri = emission[geo_id]  # [T, 3]
    is_emissive = em_per_tri.max(axis=-1) > 0.0
    ids = np.nonzero(is_emissive)[0].astype(np.int32)
    v0 = positions[indices[ids, 0]]
    v1 = positions[indices[ids, 1]]
    v2 = positions[indices[ids, 2]]
    areas = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=-1)
    total = float(areas.sum()) if len(ids) else 0.0
    n = len(ids)
    size = pad_to or max(1, n)
    pad = size - n
    ids_p = np.pad(ids, (0, pad), constant_values=-1)
    areas_p = np.pad(areas, (0, pad))
    cdf = np.cumsum(areas_p)
    cdf = cdf / max(cdf[-1], 1e-30)
    # Denormalized light rows (see EmissiveTable.light_table): one gather
    # replaces indices+positions+material fetches during NEE.
    lt = np.zeros((size, 16), np.float32)
    if n:
        em_rows = emission[geo_id[ids]] * EMISSION_SCALE
        lt[:n, 0:3] = v0
        lt[:n, 3:6] = v1 - v0
        lt[:n, 6:9] = v2 - v0
        lt[:n, 9:12] = em_rows
        lt[:n, 12] = 1.0  # valid
    return EmissiveTable(
        tri_ids=jnp.asarray(ids_p, jnp.int32),
        areas=jnp.asarray(areas_p, jnp.float32),
        cdf=jnp.asarray(cdf, jnp.float32),
        total_area=jnp.asarray(total, jnp.float32),
        count=jnp.asarray(n, jnp.int32),
        light_table=jnp.asarray(lt),
    )


def build_emissive_table_instanced(
    meshes: list,
    instances: list,
    emission: np.ndarray,
    pad_to: int | None = None,
    emission_overrides: dict | None = None,
) -> EmissiveTable:
    """NEE light list for instanced (TLAS) scenes: emissive triangles of
    every instance transformed to world space. Rebuilt on transform edits
    (O(emissive tris), host) — geometry pools are untouched.

    meshes: list of dicts (positions/indices/geo_id, object space);
    instances: list of (mesh_index, transform[4,4]);
    emission_overrides: {instance position → [3] emission} — a per-instance
    material override (Scene.inst_mat_table) replaces EVERY geo's emission,
    so the whole instance enters/leaves the light list consistently with
    what hit_surface_info will shade."""
    v0s, v1s, v2s, ems = [], [], [], []
    ids = []
    tbase = 0
    tri_base = []
    for m in meshes:
        tri_base.append(tbase)
        tbase += len(m["indices"])
    for ii, (mi, t) in enumerate(instances):
        m = meshes[mi]
        em_per_tri = emission[m["geo_id"]]
        if emission_overrides and ii in emission_overrides:
            em_per_tri = np.broadcast_to(
                np.asarray(emission_overrides[ii], np.float32),
                em_per_tri.shape,
            )
        mask = em_per_tri.max(axis=-1) > 0.0
        if not mask.any():
            continue
        idx = m["indices"][mask]
        pos = m["positions"] @ t[:3, :3].T + t[:3, 3]
        v0s.append(pos[idx[:, 0]])
        v1s.append(pos[idx[:, 1]])
        v2s.append(pos[idx[:, 2]])
        ems.append(em_per_tri[mask])
        ids.append(np.nonzero(mask)[0].astype(np.int32) + tri_base[mi])
    if not v0s:
        return EmissiveTable(
            tri_ids=jnp.full((0,), -1, jnp.int32),
            areas=jnp.zeros((0,), jnp.float32),
            cdf=jnp.zeros((0,), jnp.float32),
            total_area=jnp.asarray(0.0, jnp.float32),
            count=jnp.asarray(0, jnp.int32),
            light_table=jnp.zeros((1, 16), jnp.float32),
        )
    v0 = np.concatenate(v0s).astype(np.float32)
    v1 = np.concatenate(v1s).astype(np.float32)
    v2 = np.concatenate(v2s).astype(np.float32)
    em = np.concatenate(ems).astype(np.float32)
    ids = np.concatenate(ids)
    areas = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=-1)
    n = len(ids)
    size = pad_to or max(1, _next_pow2_int(n))
    pad = size - n
    lt = np.zeros((size, 16), np.float32)
    lt[:n, 0:3] = v0
    lt[:n, 3:6] = v1 - v0
    lt[:n, 6:9] = v2 - v0
    lt[:n, 9:12] = em * EMISSION_SCALE
    lt[:n, 12] = 1.0
    areas_p = np.pad(areas, (0, pad))
    cdf = np.cumsum(areas_p)
    cdf = cdf / max(cdf[-1], 1e-30)
    return EmissiveTable(
        tri_ids=jnp.asarray(np.pad(ids, (0, pad), constant_values=-1)),
        areas=jnp.asarray(areas_p, jnp.float32),
        cdf=jnp.asarray(cdf, jnp.float32),
        total_area=jnp.asarray(float(areas.sum()), jnp.float32),
        count=jnp.asarray(n, jnp.int32),
        light_table=jnp.asarray(lt),
    )


def _next_pow2_int(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _vose_alias(p: np.ndarray):
    """Vose's alias method: O(1) sampling of a discrete distribution.
    p must sum to 1. Returns (prob [N], alias [N] int32)."""
    n = len(p)
    scaled = p * n
    prob = np.zeros(n, np.float32)
    alias = np.zeros(n, np.int32)
    small = [i for i in range(n) if scaled[i] < 1.0]
    large = [i for i in range(n) if scaled[i] >= 1.0]
    scaled = scaled.copy()
    while small and large:
        s = small.pop()
        l_ = large.pop()
        prob[s] = scaled[s]
        alias[s] = l_
        scaled[l_] = (scaled[l_] + scaled[s]) - 1.0
        if scaled[l_] < 1.0:
            small.append(l_)
        else:
            large.append(l_)
    for i in large + small:
        prob[i] = 1.0
        alias[i] = i
    return prob, alias


def build_env_tables(env_map: np.ndarray):
    """Luminance·sinθ-weighted alias table + solid-angle pdf map for an
    equirect HDR environment. Returns (sample_table [He*We, 8],
    rgbp [He, We, 4]) — see Scene.env_sample_table."""
    env = np.asarray(env_map, np.float32)
    he, we = env.shape[0], env.shape[1]
    lum = 0.2126 * env[..., 0] + 0.7152 * env[..., 1] + 0.0722 * env[..., 2]
    theta = (np.arange(he, dtype=np.float64) + 0.5) / he * np.pi
    sin_t = np.sin(theta)[:, None]
    w = np.maximum(lum, 0.0) * sin_t
    total = w.sum()
    if total <= 0.0:
        w = np.ones_like(w) * sin_t
        total = w.sum()
    p = (w / total).reshape(-1)
    prob, alias = _vose_alias(p)
    # Solid angle of texel (y, x): dΩ = (2π/We)(π/He) sinθ_y.
    d_omega = (2.0 * np.pi / we) * (np.pi / he) * np.maximum(sin_t, 1e-8)
    pdf = (p.reshape(he, we) / d_omega).astype(np.float32)
    pdf_flat = pdf.reshape(-1)
    rgb_flat = env.reshape(-1, 3)
    table = np.zeros((he * we, 16), np.float32)
    table[:, 0] = prob
    table[:, 1] = alias.astype(np.float32)
    table[:, 2] = pdf_flat
    table[:, 3:6] = rgb_flat
    table[:, 6] = pdf_flat[alias]
    table[:, 7:10] = rgb_flat[alias]
    rgbp = np.concatenate([env, pdf[..., None]], axis=-1).astype(np.float32)
    return table, rgbp


def make_scene(
    positions: np.ndarray,
    normals: np.ndarray,
    uvs: np.ndarray,
    indices: np.ndarray,
    geo_id: np.ndarray,
    base_color: np.ndarray,
    emission: np.ndarray,
    metallic: np.ndarray,
    roughness: np.ndarray,
    base_color_texture: np.ndarray | None = None,
    textures: np.ndarray | None = None,
    env_map: np.ndarray | None = None,
    tex_images: list | None = None,
    colors: np.ndarray | None = None,
) -> Scene:
    """Assemble a device Scene from host numpy arrays.

    tex_images: list of native-resolution [H, W, 3] images → packed into a
    mip atlas (scene/textures.py), taking precedence over `textures` (the
    legacy common-resolution array).
    colors: optional [V, 3] per-vertex COLOR_0 — widens the shade table to
    32 lanes so hit shading interpolates it into albedo
    (hit_logic.slang:5-39); color-less scenes keep the 16-lane rows."""
    g = len(base_color)
    if base_color_texture is None:
        base_color_texture = np.full(g, -1, np.int32)

    positions = np.asarray(positions, np.float32)
    normals = np.asarray(normals, np.float32)
    uvs = np.asarray(uvs, np.float32)
    indices = np.asarray(indices, np.int32)
    geo_id = np.asarray(geo_id, np.int32)

    # Denormalized per-triangle shading rows (host-side; one gather at hit).
    # Vertex colors (when present) widen the row 16 → 32 lanes — the gather
    # prices by row count, not width (2-axis gathers lane-pad to 128), so
    # the extra lanes only cost table HBM.
    use_colors = colors is not None and not np.allclose(
        np.asarray(colors, np.float32), 1.0
    )
    t = indices.shape[0]
    st = np.zeros((t, 32 if use_colors else 16), np.float32)
    st[:, 0:3] = normals[indices[:, 0]]
    st[:, 3:6] = normals[indices[:, 1]]
    st[:, 6:9] = normals[indices[:, 2]]
    st[:, 9:11] = uvs[indices[:, 0]]
    st[:, 11:13] = uvs[indices[:, 1]]
    st[:, 13:15] = uvs[indices[:, 2]]
    st[:, 15] = geo_id.astype(np.float32)
    if use_colors:
        colors = np.asarray(colors, np.float32)
        st[:, 16:19] = colors[indices[:, 0]]
        st[:, 19:22] = colors[indices[:, 1]]
        st[:, 22:25] = colors[indices[:, 2]]

    mt = np.zeros((g, 12), np.float32)
    mt[:, 0:3] = np.asarray(base_color, np.float32)[:, :3]
    mt[:, 3:6] = np.asarray(emission, np.float32) * EMISSION_SCALE
    mt[:, 6] = np.asarray(metallic, np.float32)
    mt[:, 7] = np.asarray(roughness, np.float32)
    mt[:, 8] = np.asarray(base_color_texture, np.float32)

    tex_kw = {}
    if tex_images is not None and len(tex_images) > 0:
        from raytracer3_tpu.scene import textures as tex_mod

        atlas, meta = tex_mod.build_texture_atlas(tex_images)
        # Per-material log2 texel density (area-weighted mean over its
        # triangles) completes the ray-cone mip level at shading time.
        v0 = positions[indices[:, 0]]
        v1 = positions[indices[:, 1]]
        v2 = positions[indices[:, 2]]
        u0 = uvs[indices[:, 0]]
        u1 = uvs[indices[:, 1]]
        u2 = uvs[indices[:, 2]]
        tex_of_tri = np.asarray(base_color_texture)[geo_id]
        for gi in range(g):
            ti = int(np.asarray(base_color_texture)[gi])
            if ti < 0:
                continue
            sel = (geo_id == gi) & (tex_of_tri >= 0)
            if not sel.any():
                continue
            d = tex_mod.texel_density_log2(
                v0[sel], v1[sel], v2[sel], u0[sel], u1[sel], u2[sel],
                float(meta[ti, 2]), float(meta[ti, 3]),
            )
            mt[gi, 9] = float(np.mean(d))
        tex_kw = dict(
            tex_atlas=jnp.asarray(atlas), tex_meta=jnp.asarray(meta)
        )
        textures = None  # atlas supersedes the legacy array

    env_kw = {}
    if env_map is not None:
        st_env, rgbp = build_env_tables(env_map)
        env_kw = dict(
            env_sample_table=jnp.asarray(st_env),
            env_rgbp=jnp.asarray(rgbp),
        )

    return Scene(
        positions=jnp.asarray(positions, jnp.float32),
        normals=jnp.asarray(normals, jnp.float32),
        uvs=jnp.asarray(uvs, jnp.float32),
        indices=jnp.asarray(indices, jnp.int32),
        geo_id=jnp.asarray(geo_id, jnp.int32),
        materials=Materials(
            base_color=jnp.asarray(base_color, jnp.float32),
            emission=jnp.asarray(emission, jnp.float32),
            metallic=jnp.asarray(metallic, jnp.float32),
            roughness=jnp.asarray(roughness, jnp.float32),
            base_color_texture=jnp.asarray(base_color_texture, jnp.int32),
        ),
        textures=None if textures is None else jnp.asarray(textures, jnp.float32),
        env_map=None if env_map is None else jnp.asarray(env_map, jnp.float32),
        emissive=build_emissive_table(positions, indices, geo_id, emission),
        shade_table=jnp.asarray(st),
        mat_table=jnp.asarray(mt),
        vertex_colors=(jnp.asarray(colors) if use_colors else None),
        **env_kw,
        **tex_kw,
    )
