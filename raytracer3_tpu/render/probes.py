"""Screen-space octahedral radiance-probe GI pipeline.

TPU-native counterpart of the reference's probe stack (``shaders/old/``):

1. **Structured importance sampling** (structured_importance_sampling.slang):
   per 16×16-pixel probe, a pdf over the probe's 8×8 octahedral directions is
   built from the tile's G-buffer normals; low-pdf directions donate their ray
   budget to high-pdf directions, which are retraced at a finer octahedral mip
   (15-bit direction index + 1 mip bit — same encoding, trace_probes.slang:
   40-46). The reference's groupshared bitonic sort (math.slang:125-160)
   becomes a batched ``jnp.sort`` / top-k over the direction axis, and the
   per-direction pdf is one einsum on the MXU.
2. **Probe tracing** (trace_probes.slang): one ray per probe texel from the
   probe anchor's world position; radiance (secondary-surface emissive + NEE
   direct light — an upgrade over the reference's emissive-only shading) and
   hit depth land in the probe atlas with temporal blending.
3. **SH3 projection** (spherical_harmonic_conversion.slang): the 8×8 atlas
   tile projects onto 9 SH coefficients per color — the WaveActiveSum
   reduction becomes one einsum over the direction axis.
4. **Probe interpolation** (interpolate_probes.slang): per pixel, the 4
   surrounding probes blend with edge-aware weights (relative-depth and
   normal-agreement^8), the cosine-lobe SH irradiance is evaluated at the
   pixel normal, modulated by albedo/π, plus emissive. Interpolation failure
   renders debug red, like the reference.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from raytracer3_tpu.ops import mathx, packing, rng, sh
from raytracer3_tpu.render import pathtracer
from raytracer3_tpu.scene import types as scene_types
from raytracer3_tpu.utils.config import RenderSettings


class ProbeState(NamedTuple):
    """Temporal probe buffers (the prev_probe_atlas double buffer)."""

    atlas: jax.Array  # [Py*R, Px*R, 3] radiance
    depth: jax.Array  # [Py*R, Px*R] hit distance
    sh_coeffs: jax.Array  # [Py, Px, 3, 9]

    @staticmethod
    def create(settings: RenderSettings) -> "ProbeState":
        px, py = settings.probe_grid
        r = settings.probe_res
        return ProbeState(
            atlas=jnp.zeros((py * r, px * r, 3), jnp.float32),
            depth=jnp.zeros((py * r, px * r), jnp.float32),
            sh_coeffs=jnp.zeros((py, px, 3, 9), jnp.float32),
        )


def octa_direction_grid(res: int) -> jax.Array:
    """[res, res, 3] unit directions at octahedral texel centers
    (trace_probes.slang octa_decode((i+0.5)/res))."""
    u = (jnp.arange(res, dtype=jnp.float32) + 0.5) / res
    uu, vv = jnp.meshgrid(u, u, indexing="xy")
    return packing.octa_decode(jnp.stack([uu, vv], axis=-1))


def structured_importance_sampling(
    gbuf_normal: jax.Array,  # [H, W, 3]
    settings: RenderSettings,
    budget_fraction: float = 1.0 / 3.0,
):
    """Per-probe ray budgeting (structured_importance_sampling.slang:19-70).

    Returns (dir_index [Py, Px, R*R] int32, mip [Py, Px, R*R] int32):
    direction index into the (possibly finer) octahedral grid, and the mip
    bit (0 = base res R, 1 = res 2R), mirroring the 15+1-bit encoding.
    """
    px, py = settings.probe_grid
    r = settings.probe_res
    sp = settings.probe_spacing
    ndirs = r * r

    # Tile normals [Py, Px, sp*sp, 3] — the groupshared normal cache.
    h_use = py * sp
    w_use = px * sp
    tiles = gbuf_normal[:h_use, :w_use].reshape(py, sp, px, sp, 3)
    tiles = tiles.transpose(0, 2, 1, 3, 4).reshape(py, px, sp * sp, 3)

    dirs = octa_direction_grid(r).reshape(ndirs, 3)  # [64, 3]
    # pdf[p, d] = mean_i max(dot(n_i, dir_d), 0) — einsum → MXU.
    pdf = jnp.maximum(jnp.einsum("yxnc,dc->yxd", tiles, dirs), 0.0) / (sp * sp)

    # Sort pdfs ascending per probe (the bitonic sort analog).
    order = jnp.argsort(pdf, axis=-1)  # ascending: first = most cullable
    ranks = jnp.argsort(order, axis=-1)  # rank of each direction

    # Cull the lowest `budget_fraction` of directions; each culled ray is
    # re-pointed at one of the top directions, traced at the finer mip.
    n_cull = int(ndirs * budget_fraction)
    culled = ranks < n_cull  # [Py, Px, D] bool
    # Top directions (descending pdf): winner k gets the k-th culled ray.
    top = jnp.flip(order, axis=-1)  # [Py, Px, D] best-first

    base_idx = jnp.broadcast_to(
        jnp.arange(ndirs, dtype=jnp.int32), pdf.shape
    )
    # For culled slot with cull-rank q (q-th smallest), retarget to top[q],
    # upsampled to the 2R grid (direction index scaling: (x,y) → 2x,2y base
    # texel, matching the `direction * 4` reindex in the reference's
    # 8→16 grid jump, structured_importance_sampling.slang:60-66).
    cull_rank = ranks  # for culled ones rank < n_cull is the q
    target = jnp.take_along_axis(top, jnp.clip(cull_rank, 0, ndirs - 1), axis=-1)
    tx = target % r
    ty = target // r
    fine_idx = (ty * 2) * (2 * r) + (tx * 2)

    dir_index = jnp.where(culled, fine_idx, base_idx).astype(jnp.int32)
    mip = culled.astype(jnp.int32)
    return dir_index, mip


def trace_probes(
    scene: scene_types.Scene,
    intersect_fn: pathtracer.IntersectFn,
    gbuf_depth: jax.Array,  # [H, W]
    gbuf_normal: jax.Array,  # [H, W, 3]
    origins: jax.Array,  # [H, W, 3] primary ray origins (camera pos)
    view_dirs: jax.Array,  # [H, W, 3] primary ray directions
    dir_index: jax.Array,  # [Py, Px, R*R]
    mip: jax.Array,  # [Py, Px, R*R]
    prev: ProbeState,
    settings: RenderSettings,
    frame_index,
    blendfactor,
    occluded_fn: Optional[pathtracer.OccludedFn] = None,
    include_direct: bool = True,
) -> ProbeState:
    """Trace one ray per probe texel and temporally blend into the atlas
    (trace_probes.slang:14-77).

    include_direct=False drops the terms a per-pixel direct pass already
    covers — emissive surfaces and env misses seen by the probe ray — so the
    atlas carries BOUNCED light only (the hybrid probes+PT split; the
    reference's probe mode has no such split and folds everything in).
    blendfactor may be a traced scalar (camera-cut invalidation passes 1.0
    on reset frames to drop stale history in one frame).

    settings.probe_texel_splits = k > 1 traces only the texels t with
    t ≡ frame (mod k) this frame (utils/config.py knob): probe-trace +
    probe-NEE cost drops ~k× while untraced texels hold their previous
    atlas value (their temporal blend runs at 1/k rate)."""
    px, py = settings.probe_grid
    r = settings.probe_res
    sp = settings.probe_spacing
    rr = r * r
    k = max(1, int(settings.probe_texel_splits))
    if rr % k:
        raise ValueError(
            f"probe_texel_splits {k} must divide probe_res^2 = {rr}"
        )
    rr_eff = rr // k
    n = py * px * rr_eff

    # Probe anchors: pixel (x*sp, y*sp) — trace_probes.slang:24.
    ax = jnp.arange(px, dtype=jnp.int32) * sp
    ay = jnp.arange(py, dtype=jnp.int32) * sp
    axx, ayy = jnp.meshgrid(ax, ay, indexing="xy")  # [Py, Px]
    anchor_depth = gbuf_depth[ayy, axx]  # [Py, Px]
    anchor_pos = (
        origins[ayy, axx] + view_dirs[ayy, axx] * anchor_depth[..., None]
    )  # world_pos_from_depth (gbuffer_helpers.slang:86-88)
    probe_valid = anchor_depth < mathx.BACKGROUND_DEPTH

    # Per-texel jittered octahedral direction at base or fine mip.
    ids3 = jnp.arange(py * px * rr, dtype=jnp.uint32).reshape(py, px, rr)
    di = dir_index.reshape(py, px, rr)
    mp = mip.reshape(py, px, rr)
    if k > 1:
        # Round-robin texel subset: [.., rr] → [.., rr/k, k], slice class
        # m = frame mod k (texel t = j·k + m). Sampler ids stay the FULL
        # atlas ids so each texel's jitter sequence is split-invariant.
        m_idx = (jnp.asarray(frame_index, jnp.uint32) % k).astype(jnp.int32)

        def _sel(a):
            return jax.lax.dynamic_slice_in_dim(
                a.reshape(py, px, rr_eff, k), m_idx, 1, axis=3
            ).squeeze(3)

        di, mp, ids3 = _sel(di), _sel(mp), _sel(ids3)
    sampler = rng.Sampler.from_ids(ids3.reshape(-1), frame_index)
    uj, sampler = sampler.next2()
    size = jnp.where(mp == 1, 2 * r, r).astype(jnp.float32)  # [Py, Px, D]
    dx = (di % (2 * r)).astype(jnp.float32)
    dy = (di // (2 * r)).astype(jnp.float32)
    # Base-mip indices address the R-grid; fine-mip address the 2R grid.
    dx = jnp.where(mp == 1, dx, (di % r).astype(jnp.float32))
    dy = jnp.where(mp == 1, dy, (di // r).astype(jnp.float32))
    uvj = (
        jnp.stack([dx, dy], axis=-1) + uj.reshape(py, px, rr_eff, 2)
    ) / size[..., None]
    ray_dir = packing.octa_decode(uvj).reshape(n, 3)

    ray_org = jnp.broadcast_to(
        anchor_pos[:, :, None, :], (py, px, rr_eff, 3)
    ).reshape(n, 3)
    # Anchor normals face-forwarded toward the camera so the self-offset
    # always pushes into open space regardless of mesh winding.
    anchor_nrm = pathtracer._face_forward(
        gbuf_normal[ayy, axx], -view_dirs[ayy, axx]
    )
    nrm = jnp.broadcast_to(
        anchor_nrm[:, :, None, :], (py, px, rr_eff, 3)
    ).reshape(n, 3)
    ray_org = ray_org + nrm * 5e-4  # TMin analog (trace_probes.slang:55)

    h = intersect_fn(ray_org, ray_dir)
    surface = scene_types.hit_surface_info(scene, h.prim_id, h.uv, h.inst)

    # Shade the secondary surface: emissive + (upgrade) one-sample NEE direct
    # light, so probes carry real single-bounce GI.
    radiance = (
        surface.emissive
        if include_direct
        else jnp.zeros_like(surface.emissive)
    )
    hit_pos = ray_org + h.t[:, None] * ray_dir
    s_nrm = pathtracer._face_forward(surface.normal, -ray_dir)
    if occluded_fn is not None and int(scene.emissive.tri_ids.shape[0]) > 0:
        u3, sampler = sampler.next3()
        li, sampler = pathtracer._nee_contribution(
            scene, occluded_fn, hit_pos, s_nrm, -ray_dir, surface, u3,
            sampler, settings, alive_mask=h.hit,
        )
        radiance = radiance + li
    if settings.probe_bounces > 1:
        # One cosine-sampled diffuse bounce at the probe hit: its emissive /
        # env / NEE terms are all >=1-bounce light AT THE ANCHOR, so they
        # belong in the atlas under both include_direct modes (the hybrid
        # split only excludes light arriving at the anchor directly).
        from raytracer3_tpu.ops import brdf

        u2, sampler = sampler.next2()
        s2 = brdf.diffuse_sample(surface.albedo, u2)
        onb = mathx.build_orthonormal_basis(s_nrm)
        d2w = mathx.to_world(onb, s2.wi)
        o2 = hit_pos + s_nrm * 5e-4
        alive2 = h.hit & s2.valid
        w2 = 1.0
        k2 = max(1, int(settings.probe_bounce2_splits))
        if k2 > 1:
            # Stochastic second-bounce amortization: each texel traces its
            # second bounce with probability 1/k2 this frame, weighted k2×
            # — an unbiased RR-style estimator whose extra variance the
            # temporal blend absorbs. Unselected lanes park (cost ≈ 0 in
            # the sorted traversal), so the second-bounce launch pays ~1/k2
            # of its full kernel time.
            u_sel, sampler = sampler.next1()
            alive2 = alive2 & (u_sel < (1.0 / k2))
            w2 = float(k2)
        o2 = jnp.where(alive2[:, None], o2, 1e30)  # park dead probe paths
        h2 = intersect_fn(o2, d2w)
        surface2 = scene_types.hit_surface_info(scene, h2.prim_id, h2.uv, h2.inst)
        b_rad = surface2.emissive
        if occluded_fn is not None and int(scene.emissive.tri_ids.shape[0]) > 0:
            hp2 = o2 + h2.t[:, None] * d2w
            n2 = pathtracer._face_forward(surface2.normal, -d2w)
            u3b, sampler = sampler.next3()
            li2, sampler = pathtracer._nee_contribution(
                scene, occluded_fn, hp2, n2, -d2w, surface2, u3b,
                sampler, settings, alive_mask=alive2 & h2.hit,
            )
            b_rad = b_rad + li2
        env2 = pathtracer._sample_env(scene, d2w)
        b_rad = jnp.where(h2.hit[:, None], b_rad, env2)
        radiance = radiance + jnp.where(
            alive2[:, None], w2 * s2.value_over_pdf * b_rad, 0.0
        )
    if include_direct:
        env = pathtracer._sample_env(scene, ray_dir)
        radiance = jnp.where(h.hit[:, None], radiance, env)
    else:
        radiance = jnp.where(h.hit[:, None], radiance, 0.0)

    # Write texel (dir_2d scaled back to the base grid for culled rays —
    # trace_probes.slang:74 writes at (direction_2d / size) * R).
    tex_x = jnp.clip((dx / size * r), 0, r - 1).astype(jnp.int32)
    tex_y = jnp.clip((dy / size * r), 0, r - 1).astype(jnp.int32)
    pyy, pxx, _ = jnp.meshgrid(
        jnp.arange(py), jnp.arange(px), jnp.arange(rr_eff), indexing="ij"
    )
    row = pyy * r + tex_y.reshape(py, px, rr_eff)
    col = pxx * r + tex_x.reshape(py, px, rr_eff)

    new_atlas = jnp.zeros_like(prev.atlas)
    new_depth = jnp.zeros_like(prev.depth)
    rad3 = radiance.reshape(py, px, rr_eff, 3)
    dep = h.t.reshape(py, px, rr_eff)
    new_atlas = new_atlas.at[row, col].set(rad3)
    new_depth = new_depth.at[row, col].set(dep)

    # Temporal blend (trace_probes.slang:74 lerp w/ blendfactor); invalid
    # probes (sky anchors) store zero radiance + BACKGROUND depth.
    #
    # Only texels actually WRITTEN this frame lerp toward their new value —
    # the reference's compute pass touches exactly the texels it traces.
    # Blending every texel toward the (zero-initialized) scratch atlas,
    # as rounds 2-4 did, decayed the SIS-culled third of each probe's
    # directions to ~0 radiance permanently — a measured piece of the
    # probe-GI energy deficit (docs/QUALITY.md). Unwritten texels keep
    # their previous value on normal frames; on a camera-cut reset frame
    # (blendfactor >= 1) they zero instead, so stale history cannot
    # persist at the permanently-culled slots of a static view.
    written = (
        jnp.zeros(prev.depth.shape, jnp.float32).at[row, col].set(1.0) > 0.0
    )
    keep = jnp.where(jnp.asarray(blendfactor, jnp.float32) >= 1.0, 0.0, 1.0)
    pv = jnp.repeat(jnp.repeat(probe_valid, r, axis=0), r, axis=1)
    blended = jnp.where(
        written[..., None],
        prev.atlas + (new_atlas - prev.atlas) * blendfactor,
        prev.atlas * keep,
    )
    new_depth_eff = jnp.where(written, new_depth, prev.depth * keep)
    atlas = jnp.where(pv[..., None], blended, 0.0)
    depth = jnp.where(pv, new_depth_eff, mathx.BACKGROUND_DEPTH)
    return ProbeState(atlas=atlas, depth=depth, sh_coeffs=prev.sh_coeffs)


def project_sh(state: ProbeState, settings: RenderSettings) -> ProbeState:
    """Probe atlas → SH3 coefficients (spherical_harmonic_conversion.slang:
    9-33): coeff = Σ_d Y(dir_d)·L_d × 4π/(R·R), one einsum per color.

    Hole filling (settings.probe_sh_fill): SIS permanently culls ~1/3 of
    each probe's directions — their texels are never written after a reset
    and would enter the quadrature as ZERO radiance, deflating the DC term
    by the culled directions' share of incident light (a measured piece of
    the probe-GI energy deficit, docs/QUALITY.md). Texels with depth == 0
    (never traced since reset; every traced texel stores hit-t or
    BACKGROUND) are filled with their probe's mean written radiance — the
    DC-consistent estimate — before projecting."""
    px, py = settings.probe_grid
    r = settings.probe_res
    atlas = state.atlas.reshape(py, r, px, r, 3).transpose(0, 2, 1, 3, 4)
    atlas = atlas.reshape(py, px, r * r, 3)
    if settings.probe_sh_fill:
        dep = state.depth.reshape(py, r, px, r).transpose(0, 2, 1, 3)
        written = (dep.reshape(py, px, r * r) > 0.0)[..., None]
        wsum = jnp.sum(written, axis=2, keepdims=True).astype(jnp.float32)
        mean = jnp.sum(
            jnp.where(written, atlas, 0.0), axis=2, keepdims=True
        ) / jnp.maximum(wsum, 1.0)
        atlas = jnp.where(written, atlas, mean)
    basis = sh.sh3_evaluate(octa_direction_grid(r).reshape(r * r, 3))  # [D, 9]
    coeffs = jnp.einsum("yxdc,dk->yxck", atlas, basis) * (
        4.0 * jnp.pi / (r * r)
    )
    return state._replace(sh_coeffs=coeffs)


def _interpolate_probes_cells(
    gbuf_depth, gbuf_normal, albedo, emissive, state, settings
):
    """Cell-structured fast path of interpolate_probes for exact-multiple
    frames (H == Py·sp, W == Px·sp — every production resolution): all sp×sp
    pixels of one cell share the same 4 neighbor probes, so the generic
    path's per-pixel probe-table GATHERS (4× [H,W,3,9] SH-coefficient rows
    + 4× anchor depth/normal rows ≈ 0.9 GB of row-gather traffic at 1080p,
    the dominant interpolate cost on-chip) become edge-padded SLICES
    broadcast over the cell — pure streaming VPU work. Same weights, clamp
    and accumulation order as the generic path; the cos-lobe basis is
    evaluated once per pixel instead of once per neighbor (identical
    values). Edge padding replicates the last probe row/col — exactly the
    generic path's index clip."""
    h, w = gbuf_depth.shape
    px, py = settings.probe_grid
    sp = settings.probe_spacing

    adep = jnp.pad(gbuf_depth[::sp, ::sp], ((0, 1), (0, 1)), mode="edge")
    anrm = jnp.pad(
        gbuf_normal[::sp, ::sp], ((0, 1), (0, 1), (0, 0)), mode="edge"
    )
    acoef = jnp.pad(
        state.sh_coeffs, ((0, 1), (0, 1), (0, 0), (0, 0)), mode="edge"
    )

    dep_c = gbuf_depth.reshape(py, sp, px, sp)
    nrm_c = gbuf_normal.reshape(py, sp, px, sp, 3)
    basis = sh.sh3_transform_cos_lobe(nrm_c)  # [py, sp, px, sp, 9]

    f = jnp.arange(sp, dtype=jnp.float32) / sp
    fy = f[None, :, None, None]
    fx = f[None, None, None, :]

    contribs = []
    weights = []
    for oy in (0, 1):
        for ox in (0, 1):
            pdep = adep[oy : oy + py, ox : ox + px][:, None, :, None]
            pnrm = anrm[oy : oy + py, ox : ox + px][:, None, :, None, :]
            valid = pdep < mathx.BACKGROUND_DEPTH
            w_bil = (fx if ox else (1.0 - fx)) * (fy if oy else (1.0 - fy))
            wgt = jnp.clip(
                1.0 - jnp.abs(pdep - dep_c) / jnp.maximum(dep_c, 1e-6),
                0.0, 1.0,
            )
            wgt = wgt * jnp.maximum(jnp.sum(nrm_c * pnrm, -1), 0.0)
            wgt = jnp.where(valid, (w_bil + 1e-3) * wgt**8, 0.0)

            coeffs = acoef[oy : oy + py, ox : ox + px][:, None, :, None]
            irr = jnp.sum(coeffs * basis[..., None, :], axis=-1)
            contribs.append(jnp.maximum(irr, 0.0))
            weights.append(jnp.broadcast_to(wgt, (py, sp, px, sp)))

    wstack = jnp.stack(weights)  # [4, py, sp, px, sp]
    wsum = jnp.sum(wstack, axis=0)
    failed = wsum <= 1e-8
    wnorm = wstack / jnp.maximum(wsum, 1e-8)
    irr = sum(c * wn[..., None] for c, wn in zip(contribs, wnorm))

    light = (
        irr * albedo.reshape(py, sp, px, sp, 3) * mathx.INV_PI
        + emissive.reshape(py, sp, px, sp, 3)
    )
    red = jnp.zeros_like(light).at[..., 0].set(1.0)
    light = jnp.where(failed[..., None], red, light)
    sky = dep_c >= mathx.BACKGROUND_DEPTH
    return jnp.where(sky[..., None], 0.0, light).reshape(h, w, 3)


def interpolate_probes(
    gbuf_depth: jax.Array,  # [H, W]
    gbuf_normal: jax.Array,  # [H, W, 3]
    albedo: jax.Array,  # [H, W, 3]
    emissive: jax.Array,  # [H, W, 3]
    state: ProbeState,
    settings: RenderSettings,
) -> jax.Array:
    """Per-pixel 4-probe edge-aware blend → irradiance × albedo/π + emissive
    (interpolate_probes.slang:11-110). Returns light [H, W, 3]; failed
    interpolation renders debug red like the reference."""
    h, w = gbuf_depth.shape
    px, py = settings.probe_grid
    sp = settings.probe_spacing
    if h == py * sp and w == px * sp:
        return _interpolate_probes_cells(
            gbuf_depth, gbuf_normal, albedo, emissive, state, settings
        )

    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    p0x = jnp.clip(xs // sp, 0, px - 1)
    p0y = jnp.clip(ys // sp, 0, py - 1)
    # Bilinear position inside the probe cell — the reference blends the 4
    # neighbor probes bilinearly AND edge-aware (interpolate_probes.slang:
    # 11-110); edge-aware-only weighting lets a probe up to a full cell away
    # dominate whenever its depth matches slightly better, which reads as
    # light bleeding across the probe grid (round-2 64×64 golden).
    fx = (xs - p0x * sp).astype(jnp.float32) / sp
    fy = (ys - p0y * sp).astype(jnp.float32) / sp

    light = jnp.zeros((h, w, 3), jnp.float32)
    wsum = jnp.zeros((h, w), jnp.float32)

    pix_depth = gbuf_depth
    contribs = []
    weights = []
    for oy in (0, 1):
        for ox in (0, 1):
            pxc = jnp.clip(p0x + ox, 0, px - 1)
            pyc = jnp.clip(p0y + oy, 0, py - 1)
            a_x = pxc * sp
            a_y = pyc * sp
            probe_depth = gbuf_depth[a_y, a_x]
            probe_normal = gbuf_normal[a_y, a_x]
            valid = probe_depth < mathx.BACKGROUND_DEPTH
            w_bil = (fx if ox else (1.0 - fx)) * (fy if oy else (1.0 - fy))
            # Edge-aware weight (interpolate_probes.slang:65-70):
            wgt = jnp.clip(
                1.0 - jnp.abs(probe_depth - pix_depth) / jnp.maximum(pix_depth, 1e-6),
                0.0, 1.0,
            )
            wgt = wgt * jnp.maximum(
                jnp.sum(gbuf_normal * probe_normal, -1), 0.0
            )
            wgt = jnp.where(valid, (w_bil + 1e-3) * wgt**8, 0.0)

            coeffs = state.sh_coeffs[pyc, pxc]  # [H, W, 3, 9]
            irr = sh.sh3_unproject_cos_lobe(coeffs, gbuf_normal)  # [H, W, 3]
            contribs.append(jnp.maximum(irr, 0.0))
            weights.append(wgt)

    wstack = jnp.stack(weights)  # [4, H, W]
    wsum = jnp.sum(wstack, axis=0)
    failed = wsum <= 1e-8
    wnorm = wstack / jnp.maximum(wsum, 1e-8)
    irr = sum(c * wn[..., None] for c, wn in zip(contribs, wnorm))

    light = irr * albedo * mathx.INV_PI + emissive
    red = jnp.zeros_like(light).at[..., 0].set(1.0)
    light = jnp.where(failed[..., None], red, light)
    # Sky pixels contribute nothing here (postprocess fills them).
    sky = pix_depth >= mathx.BACKGROUND_DEPTH
    return jnp.where(sky[..., None], 0.0, light)


def trace_packed_gbuffer(
    scene: scene_types.Scene,
    intersect_fn: pathtracer.IntersectFn,
    cam,
    settings: RenderSettings,
    primary_fn: Optional[pathtracer.IntersectFn] = None,
):
    """Primary rays → PACKED G-buffer [H, W] (old/gbuffer.slang:8-20 writes
    the uint4-packed form; the probe passes re-read it from HBM).

    primary_fn: a sort-skipping primary trace (TraceBackend.primary_fn).
    When given, primaries go out in tile-swizzled order (wavefront.py
    tiled_pixel_order — consecutive rays form screen tiles, so fixed-size
    traversal packets get tight frusta) and the G-buffer un-swizzles with
    pure reshapes; the presorted path measured 37.6 vs 20.6 Mray/s over the
    generic sorted trace at 2M rays (docs/ROADMAP.md)."""
    from raytracer3_tpu.render import camera as camera_mod
    from raytracer3_tpu.render import gbuffer as gbuffer_mod
    from raytracer3_tpu.render import wavefront as wavefront_mod

    w, h = settings.width, settings.height
    tile = wavefront_mod.pick_tile(w, h) if primary_fn is not None else None
    if tile is not None:
        tw_, th_ = tile
        pix = wavefront_mod.tiled_pixel_order(w, h, tile_w=tw_, tile_h=th_)
        o, d = camera_mod.primary_rays(cam, w, h, pixel_xy=pix)
        gbuf = pathtracer.trace_gbuffer(scene, primary_fn, o, d)

        def unswizzle(a):
            rest = a.shape[1:]
            return (
                a.reshape((h // th_, w // tw_, th_, tw_) + rest)
                .transpose((0, 2, 1, 3) + tuple(4 + i for i in range(len(rest))))
                .reshape((h, w) + rest)
            )

        surface2 = jax.tree.map(unswizzle, gbuf.surface)
        packed = gbuffer_mod.pack_surface(surface2, unswizzle(gbuf.depth))
        return packed, unswizzle(gbuf.hit)
    pix = camera_mod.pixel_grid(w, h)
    o, d = camera_mod.primary_rays(cam, w, h, pixel_xy=pix)
    gbuf = pathtracer.trace_gbuffer(scene, intersect_fn, o, d)
    surface2 = jax.tree.map(
        lambda a: a.reshape((h, w) + a.shape[1:]), gbuf.surface
    )
    packed = gbuffer_mod.pack_surface(surface2, gbuf.depth.reshape(h, w))
    return packed, gbuf.hit.reshape(h, w)


def probe_gi_from_gbuffer(
    scene: scene_types.Scene,
    intersect_fn: pathtracer.IntersectFn,
    cam,
    packed,  # gbuffer.PackedGBuffer with [H, W] layout
    prev: ProbeState,
    settings: RenderSettings,
    frame_index,
    blendfactor=0.15,
    occluded_fn: Optional[pathtracer.OccludedFn] = None,
):
    """SIS → trace probes → SH project → interpolate, reading the packed
    G-buffer (the 16 B/pixel HBM round-trip the reference makes:
    gbuffer_helpers.slang:13-70 unpack in interpolate_probes/SIS)."""
    from raytracer3_tpu.render import camera as camera_mod
    from raytracer3_tpu.render import gbuffer as gbuffer_mod

    w, h = settings.width, settings.height
    surface = gbuffer_mod.unpack_surface(packed)
    depth2 = packed.depth
    normal2 = surface.normal
    pix = camera_mod.pixel_grid(w, h)
    o, d = camera_mod.primary_rays(cam, w, h, pixel_xy=pix)
    o2 = o.reshape(h, w, 3)
    d2 = d.reshape(h, w, 3)

    dir_index, mip = structured_importance_sampling(normal2, settings)
    state = trace_probes(
        scene, intersect_fn, depth2, normal2, o2, d2, dir_index, mip,
        prev, settings, frame_index, blendfactor, occluded_fn,
    )
    state = project_sh(state, settings)
    light = interpolate_probes(
        depth2, normal2, surface.albedo, surface.emissive, state, settings
    )
    aux = dict(depth=depth2, view_dirs=d2)
    return light, state, aux


def hybrid_gi_from_gbuffer(
    scene: scene_types.Scene,
    intersect_fn: pathtracer.IntersectFn,
    cam,
    packed,  # gbuffer.PackedGBuffer with [H, W] layout
    prev: ProbeState,
    settings: RenderSettings,
    frame_index,
    blendfactor=0.15,
    occluded_fn: Optional[pathtracer.OccludedFn] = None,
):
    """Hybrid probes+PT frame: per-pixel DIRECT lighting (one NEE shadow ray
    per pixel over the area-light/env mixture — sharp shadows the probe grid
    cannot resolve) + probe-interpolated INDIRECT diffuse from an atlas
    traced with include_direct=False (bounced light only, so the two terms
    partition incident radiance without double counting). The reference's
    probe mode (shaders/old/interpolate_probes.slang) folds direct light into
    the probes and has neither per-pixel shadows nor the split."""
    from raytracer3_tpu.render import camera as camera_mod
    from raytracer3_tpu.render import gbuffer as gbuffer_mod

    w, h = settings.width, settings.height
    surface = gbuffer_mod.unpack_surface(packed)
    depth2 = packed.depth
    normal2 = surface.normal
    pix = camera_mod.pixel_grid(w, h)
    o, d = camera_mod.primary_rays(cam, w, h, pixel_xy=pix)
    o2 = o.reshape(h, w, 3)
    d2 = d.reshape(h, w, 3)

    # Indirect-only probe update.
    dir_index, mip = structured_importance_sampling(normal2, settings)
    state = trace_probes(
        scene, intersect_fn, depth2, normal2, o2, d2, dir_index, mip,
        prev, settings, frame_index, blendfactor, occluded_fn,
        include_direct=False,
    )
    state = project_sh(state, settings)
    indirect = interpolate_probes(
        depth2, normal2, surface.albedo, jnp.zeros_like(surface.emissive),
        state, settings,
    )

    # Per-pixel direct NEE at the primary surface.
    hitmask = (depth2 < mathx.BACKGROUND_DEPTH).reshape(-1)
    flat_surface = jax.tree.map(
        lambda a: a.reshape((-1,) + a.shape[2:]), surface
    )
    nrm = pathtracer._face_forward(
        flat_surface.normal, -d2.reshape(-1, 3)
    )
    hit_pos = o2.reshape(-1, 3) + depth2.reshape(-1, 1) * d2.reshape(-1, 3)
    direct = jnp.zeros((h * w, 3), jnp.float32)
    if occluded_fn is not None:
        ids = jnp.arange(h * w, dtype=jnp.uint32)
        sampler = rng.Sampler.from_ids(ids, jnp.uint32(frame_index) + 77777)
        u3, sampler = sampler.next3()
        li, sampler = pathtracer._nee_contribution(
            scene, occluded_fn, hit_pos, nrm, -d2.reshape(-1, 3),
            flat_surface, u3, sampler, settings, alive_mask=hitmask,
        )
        direct = jnp.where(hitmask[:, None], li, 0.0)
    direct = direct.reshape(h, w, 3)

    sky = depth2 >= mathx.BACKGROUND_DEPTH
    indirect = jnp.where(sky[..., None], 0.0, indirect)
    light = indirect + direct + surface.emissive
    light = jnp.where(sky[..., None], 0.0, light)
    # aux carries the indirect-only term so callers can temporally filter
    # the (noisy, 1-sample) direct remainder separately.
    aux = dict(depth=depth2, view_dirs=d2, indirect=indirect)
    return light, state, aux


def probe_gi_frame(
    scene: scene_types.Scene,
    intersect_fn: pathtracer.IntersectFn,
    cam,
    prev: ProbeState,
    settings: RenderSettings,
    frame_index,
    blendfactor=0.15,
    occluded_fn: Optional[pathtracer.OccludedFn] = None,
):
    """Full probe-GI frame (the legacy pipeline of SURVEY.md §3.5): packed
    G-buffer → SIS → trace probes → SH project → interpolate. Returns
    (light [H,W,3], new ProbeState, gbuffer aux dict)."""
    packed, hit2 = trace_packed_gbuffer(scene, intersect_fn, cam, settings)
    light, state, aux = probe_gi_from_gbuffer(
        scene, intersect_fn, cam, packed, prev, settings, frame_index,
        blendfactor, occluded_fn,
    )
    aux["hit"] = hit2
    return light, state, aux
