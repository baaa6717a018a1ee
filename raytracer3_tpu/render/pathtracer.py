"""Reference-mode path tracer: per-pixel samples × bounces progressive PT.

TPU-native counterpart of ``shaders/old/refrence_mode.slang:14-66`` (the
ground-truth progressive path tracer) plus the G-buffer primary pass
(``shaders/old/gbuffer.slang:8-20``). Where the reference runs one divergent
SIMT thread per pixel, here every bounce is one dense batched step over the
whole ray wavefront ``[N]``; dead lanes are masked, not branched. Bounce and
sample counts are static (unrolled by XLA), matching the reference's runtime
GConst knobs (renderer/mod.rs:56-58) at trace time.

The intersection backend is injected (``intersect_fn``) so the same tracer
runs against brute-force (analytic scenes / oracle tests) or the BVH
(ops/traverse.py).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from raytracer3_tpu.ops import brdf, intersect, mathx, packing, rng
from raytracer3_tpu.render import camera as camera_mod
from raytracer3_tpu.scene import types as scene_types
from raytracer3_tpu.utils.config import RenderSettings

IntersectFn = Callable[[jax.Array, jax.Array], intersect.Hit]
OccludedFn = Callable[[jax.Array, jax.Array, jax.Array], jax.Array]


class GBuffer(NamedTuple):
    """Primary-visibility buffers — the packed-G-buffer analog
    (old/gbuffer.slang:8-20). Kept unpacked as SoA arrays; packing to uint32
    planes (ops/packing.py) is applied when a pass round-trips through HBM."""

    depth: jax.Array  # [N] BACKGROUND_DEPTH on miss
    surface: scene_types.SurfaceInfo  # [N, ...]
    prim_id: jax.Array  # [N]
    hit: jax.Array  # [N] bool


def trace_gbuffer(
    scene: scene_types.Scene,
    intersect_fn: IntersectFn,
    origins: jax.Array,
    directions: jax.Array,
) -> GBuffer:
    """Primary rays → G-buffer (gbuffer.slang:8-20)."""
    h = intersect_fn(origins, directions)
    surface = scene_types.hit_surface_info(scene, h.prim_id, h.uv, h.inst)
    return GBuffer(depth=h.t, surface=surface, prim_id=h.prim_id, hit=h.hit)


def _sample_env(scene: scene_types.Scene, directions: jax.Array) -> jax.Array:
    """Equirect skybox lookup (postprocess.slang:104; math.slang:6-12)."""
    if scene.env_map is None:
        return jnp.zeros(directions.shape[:-1] + (3,), jnp.float32)
    uv = mathx.direction_to_equirect_uv(directions)
    he, we = scene.env_map.shape[0], scene.env_map.shape[1]
    x = jnp.clip((uv[..., 0] * we).astype(jnp.int32), 0, we - 1)
    y = jnp.clip((uv[..., 1] * he).astype(jnp.int32), 0, he - 1)
    # ONE rgb9e5-packed [N] u32 gather, not env_map[y, x]: the 2-axis
    # gather's [N, 3] output materializes in tiled T(8,128) layout on TPU —
    # 3 lanes pad to 128, a 42.7× expansion (7.97 GB at 16.7M lanes, twice:
    # gather + a scan-carry copy inheriting the layout) that OOM'ed the
    # sponza1080 samples=8 bench. Per-CHANNEL 1-D gathers fix the padding
    # but cost ~4.5 ms per gather per call at 2M lanes (A/B: headline frame
    # 417 → 511 ms) — XLA TPU gathers price by CALL, not by row width. The
    # shared-exponent pack keeps one gather, zero padding; the pack of the
    # 131k-texel map is loop-invariant VPU noise (~20 ops/texel).
    return packing.unpack_rgb9e5(
        packing.pack_rgb9e5(scene.env_map.reshape(-1, 3))[y * we + x]
    )


def _env_radiance_pdf(scene: scene_types.Scene, directions: jax.Array):
    """(radiance, solid-angle pdf) of the environment along `directions` in
    ONE gather (the env-MIS lookup for BRDF-sampled escapes)."""
    uv = mathx.direction_to_equirect_uv(directions)
    he, we = scene.env_rgbp.shape[0], scene.env_rgbp.shape[1]
    x = jnp.clip((uv[..., 0] * we).astype(jnp.int32), 0, we - 1)
    y = jnp.clip((uv[..., 1] * he).astype(jnp.int32), 0, he - 1)
    # ONE rgb9e5 gather (see _sample_env for why: [N, 4] row gathers pad
    # 32× in tiled layout; extra per-channel gathers cost ~4.5 ms each).
    # The pdf is RECOMPUTED from the unpacked radiance instead of gathered:
    # build_env_tables sets p(texel) = lum·sinθ / Σ(lum·sinθ) and
    # pdf = p / dΩ with dΩ = (2π/We)(π/He)·sinθ — the sinθ cancels, so
    # pdf = lum · We·He / (2π² · Σ lum·sinθ). The Σ term is a loop-invariant
    # reduction of the map. Using the 9-bit-mantissa lum here makes the MIS
    # balance weight consistent to ~0.2% with the table's f32 pdf — far
    # below the MC noise floor (and the radiance itself is exact MC-wise:
    # the same rounded value is what _sample_env returns on escape).
    rgb = packing.unpack_rgb9e5(
        packing.pack_rgb9e5(scene.env_rgbp[..., 0:3].reshape(-1, 3))[
            y * we + x
        ]
    )
    env = scene.env_rgbp[..., 0:3]
    lum_map = (
        0.2126 * env[..., 0] + 0.7152 * env[..., 1] + 0.0722 * env[..., 2]
    )
    theta = (jnp.arange(he, dtype=jnp.float32) + 0.5) / he * jnp.pi
    total = jnp.sum(
        jnp.maximum(lum_map, 0.0) * jnp.sin(theta)[:, None]
    )
    lum = 0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1] + 0.0722 * rgb[..., 2]
    k = we * he / (2.0 * jnp.pi * jnp.pi * jnp.maximum(total, 1e-12))
    return rgb, lum * k


def _env_row_consume(row, kc, u3c, he: int, we: int):
    """Alias-row → (direction, radiance, solid-angle pdf); runs INSIDE the
    chunked gather so the lane-padded [chunk, 16] buffer dies per chunk
    (mathx.map_row_gather — the 7.97 GB sponza1080 allocation)."""
    take_alias = (u3c[:, 1] >= row[:, 0])[:, None]
    idx = jnp.where(
        take_alias[:, 0], row[:, 1].astype(jnp.int32), kc
    )
    pdf = jnp.where(take_alias[:, 0], row[:, 6], row[:, 2])
    radiance = jnp.where(take_alias, row[:, 7:10], row[:, 3:6])
    y = idx // we
    x = idx % we
    # Jitter within the texel for a continuous direction (the pdf is
    # the texel's constant solid-angle pdf). jv reuses the alias-test
    # uniform, rescaled to its conditional range (uniform again by
    # construction — deriving it from u3[:, 0] would correlate it with
    # the texel choice).
    ju = u3c[:, 2]
    prob = row[:, 0]
    jv = jnp.where(
        take_alias[:, 0],
        (u3c[:, 1] - prob) / jnp.maximum(1.0 - prob, 1e-9),
        u3c[:, 1] / jnp.maximum(prob, 1e-9),
    )
    jv = jnp.clip(jv, 0.0, 0.999999)
    uv = jnp.stack(
        [
            (x.astype(jnp.float32) + ju) / we,
            (y.astype(jnp.float32) + jv) / he,
        ],
        axis=-1,
    )
    return mathx.equirect_uv_to_direction(uv), radiance, pdf


def _sample_env_light(scene: scene_types.Scene, u3: jax.Array):
    """Importance-sample the environment via the alias table: ONE [N, 8]
    gather → (direction, radiance, solid-angle pdf). An upgrade over the
    reference (which only picks the env up on BRDF miss,
    old/postprocess.slang:104)."""
    tab = scene.env_sample_table
    n_tex = tab.shape[0]
    he, we = scene.env_rgbp.shape[0], scene.env_rgbp.shape[1]
    k = jnp.clip((u3[:, 0] * n_tex).astype(jnp.int32), 0, n_tex - 1)

    return mathx.map_row_gather(
        tab,
        k,
        lambda row, kc, u3c: _env_row_consume(row, kc, u3c, he, we),
        extras=(k, u3),
    )


def _face_forward(normal: jax.Array, wo_world: jax.Array) -> jax.Array:
    """Flip shading normals facing away from the viewer (two-sided shading,
    matching the reference's no-cull RT pipelines)."""
    s = jnp.where(mathx.dot(normal, wo_world) < 0.0, -1.0, 1.0)
    return normal * s


def trace_radiance(
    scene: scene_types.Scene,
    intersect_fn: IntersectFn,
    origins: jax.Array,
    directions: jax.Array,
    gbuf: GBuffer,
    sampler: rng.Sampler,
    settings: RenderSettings,
    occluded_fn: Optional[OccludedFn] = None,
) -> jax.Array:
    """Estimate radiance for the primary rays. Mirrors the sample/bounce loop
    of refrence_mode.slang:28-59, restructured as masked wavefront steps.

    With ``occluded_fn`` given and the scene having emissive triangles,
    next-event estimation with MIS is enabled (the wavefront upgrade,
    SURVEY.md §7 step 6); otherwise pure BRDF-sampling like the reference.
    """
    n = origins.shape[0]
    radiance = jnp.zeros((n, 3), jnp.float32)
    q_env = _env_mix_q(scene)
    use_nee = occluded_fn is not None and (
        int(scene.emissive.tri_ids.shape[0]) > 0 or q_env > 0.0
    )

    for _ in range(settings.samples):
        ray_o = origins
        ray_d = directions
        throughput = jnp.ones((n, 3), jnp.float32)
        alive = gbuf.hit
        surface = gbuf.surface
        depth = gbuf.depth
        prev_pdf = jnp.full((n,), 1e8, jnp.float32)  # delta (camera) pdf
        sample_radiance = jnp.zeros((n, 3), jnp.float32)
        # Environment for primary misses is composited by postprocess
        # (postprocess.slang:100-105), not here — matching the reference.

        for b in range(settings.bounces):
            nrm = _face_forward(surface.normal, -ray_d)

            # Emissive pickup. Under NEE the BRDF-sampled emissive hit is
            # MIS-weighted against the light pdf (power heuristic reduces to
            # balance for one sample each).
            emit_w = jnp.ones((n,), jnp.float32)
            if use_nee and b > 0:
                # pdf of having sampled this point via NEE: area-measure →
                # solid angle: (1/total_area) * r^2 / cos_light.
                cos_l = jnp.abs(mathx.dot(nrm, -ray_d, keepdims=False))
                r2 = depth * depth
                pdf_light = (1.0 - q_env) * r2 / jnp.maximum(
                    cos_l * scene.emissive.total_area, 1e-20
                )
                is_emitter = jnp.max(surface.emissive, axis=-1) > 0.0
                w = prev_pdf / jnp.maximum(prev_pdf + pdf_light, 1e-20)
                emit_w = jnp.where(is_emitter, w, 1.0)
            sample_radiance = sample_radiance + jnp.where(
                alive[:, None], throughput * surface.emissive * emit_w[:, None], 0.0
            )

            onb = mathx.build_orthonormal_basis(nrm)
            hit_pos = ray_o + depth[:, None] * ray_d

            # --- Next-event estimation -----------------------------------
            if use_nee:
                u_l, sampler = sampler.next3()
                li, sampler = _nee_contribution(
                    scene, occluded_fn, hit_pos, nrm, -ray_d, surface, u_l,
                    sampler, settings, alive_mask=alive,
                    throughput=throughput,
                )
                sample_radiance = sample_radiance + jnp.where(
                    alive[:, None], throughput * li, 0.0
                )

            # --- BRDF sampling (refrence_mode.slang:41-47) -----------------
            if settings.diffuse_only:
                u2, sampler = sampler.next2()
                s = brdf.diffuse_sample(surface.albedo, u2)
            else:
                u3, sampler = sampler.next3()
                s = brdf.surface_sample(
                    surface.albedo, surface.roughness, surface.metalness,
                    mathx.to_local(onb, -ray_d), u3,
                )

            ray_o = hit_pos
            ray_d = mathx.to_world(onb, s.wi)
            throughput = throughput * s.value_over_pdf
            prev_pdf = jnp.maximum(s.pdf * jnp.abs(s.wi[..., 2]), 1e-8)
            alive = alive & s.valid & (jnp.max(throughput, -1) > 0.0)

            if b != settings.bounces - 1:
                h = intersect_fn(ray_o, ray_d)
                # Secondary miss → environment light then terminate (MIS-
                # weighted against env NEE when active).
                if use_nee and q_env > 0.0:
                    env, env_pdf = _env_radiance_pdf(scene, ray_d)
                    w_env = prev_pdf / jnp.maximum(
                        prev_pdf + q_env * env_pdf, 1e-20
                    )
                    env = env * w_env[:, None]
                else:
                    env = _sample_env(scene, ray_d)
                sample_radiance = sample_radiance + jnp.where(
                    (alive & ~h.hit)[:, None], throughput * env, 0.0
                )
                alive = alive & h.hit
                depth = h.t
                surface = scene_types.hit_surface_info(scene, h.prim_id, h.uv, h.inst)

        if settings.radiance_clamp > 0.0:
            sample_radiance = jnp.minimum(sample_radiance, settings.radiance_clamp)
        radiance = radiance + sample_radiance

    return radiance / float(settings.samples)


def _env_mix_q(scene: scene_types.Scene) -> float:
    """Probability of NEE picking the environment over the area-light set
    (a static trace-time constant; 0 disables env NEE entirely)."""
    if scene.env_sample_table is None:
        return 0.0
    if int(scene.emissive.tri_ids.shape[0]) == 0:
        return 1.0
    return 0.5


def _nee_prepare(
    scene: scene_types.Scene,
    hit_pos: jax.Array,
    normal: jax.Array,
    wo_world: jax.Array,
    surface: scene_types.SurfaceInfo,
    u3: jax.Array,
    sampler: rng.Sampler,
    settings: RenderSettings,
    alive_mask: jax.Array | None = None,
    throughput: jax.Array | None = None,
):
    """Everything of one-sample NEE except the shadow traversal: samples the
    light mixture (area lights by area CDF; alias-sampled env with mixture
    probability _env_mix_q), evaluates the BRDF toward it, and MIS-weights
    (balance heuristic) against BRDF sampling.

    Returns (shadow_o, shadow_d, t_shadow, pre_ok, contrib, sampler):
    ``contrib`` is the UNSHADOWED radiance — callers trace the shadow ray
    (separately, or fused into the bounce launch via a backend capped_fn)
    and keep ``contrib`` where ``pre_ok & ~blocked``. Lanes with invalid/
    backfacing samples have pre_ok False and shadow_o parked at 1e30."""
    em = scene.emissive
    has_area = int(em.tri_ids.shape[0]) > 0
    q_env_early = _env_mix_q(scene)
    if (
        has_area
        and q_env_early > 0.0
        and em.light_table is not None
        and scene.env_sample_table is not None
    ):
        # FUSED mixture: area-light row and env alias row fetched in ONE
        # row gather from a concatenated table. Row gathers price by row
        # count (~15 ns/row, tools/probe_driver.py) — at 33M lanes the
        # split path's two [N, 16] gathers cost ~1 s/bounce; the fused one
        # halves that. Each lane picks its source first (u_sel), then one
        # row is fetched and interpreted per-branch inside the chunk.
        u_env, sampler = sampler.next3()
        u_sel, sampler = sampler.next1()
        choose_env = u_sel < q_env_early
        li = jnp.clip(
            jnp.searchsorted(em.cdf, u3[:, 0:1]).reshape(-1),
            0,
            em.tri_ids.shape[0] - 1,
        )
        tab = scene.env_sample_table
        n_light = em.light_table.shape[0]
        n_tex = tab.shape[0]
        he, we = scene.env_rgbp.shape[0], scene.env_rgbp.shape[1]
        k_env = jnp.clip(
            (u_env[:, 0] * n_tex).astype(jnp.int32), 0, n_tex - 1
        )
        combined = jnp.concatenate([em.light_table, tab], axis=0)
        idx = jnp.where(choose_env, n_light + k_env, li)
        total_area = em.total_area
        q_env = q_env_early

        def consume_mix(row, hp, ce, ke, ue, u3c):
            # Area-light interpretation (v0 e1 e2 le valid):
            v0 = row[:, 0:3]
            e1 = row[:, 3:6]
            e2 = row[:, 6:9]
            le_a = row[:, 9:12]
            su = jnp.sqrt(jnp.maximum(u3c[:, 1:2], 0.0))
            b0 = 1.0 - su
            b1 = u3c[:, 2:3] * su
            b2 = 1.0 - b0 - b1
            p = v0 + e1 * b1 + e2 * b2
            to_l = p - hp
            dist2 = jnp.sum(to_l * to_l, axis=-1, keepdims=True)
            dist = jnp.sqrt(jnp.maximum(dist2, 1e-12))
            wi_a = to_l / dist
            l_nrm = mathx.normalize(jnp.cross(e1, e2))
            cos_l = jnp.abs(jnp.sum(l_nrm * -wi_a, axis=-1))
            pdf_a = dist2[:, 0] / jnp.maximum(cos_l * total_area, 1e-20)
            valid_a = (
                (row[:, 12] > 0.5) & (cos_l > 1e-6) & (pdf_a > 0.0)
            )
            t_a = dist[:, 0] * (1.0 - 1e-3)
            # Env alias interpretation (prob alias pdf rgb pdf' rgb'):
            wi_e, le_e, pdf_e = _env_row_consume(row, ke, ue, he, we)
            ce3 = ce[:, None]
            return (
                jnp.where(ce3, wi_e, wi_a),
                jnp.where(ce3, le_e, le_a),
                jnp.where(ce, q_env * pdf_e, (1.0 - q_env) * pdf_a),
                jnp.where(ce, pdf_e > 0.0, valid_a),
                jnp.where(ce, mathx.BACKGROUND_DEPTH * 0.9, t_a),
            )

        wi_world, le_sel, pdf_sel, valid_sel, t_shadow = (
            mathx.map_row_gather(
                combined,
                idx,
                consume_mix,
                extras=(hit_pos, choose_env, k_env, u_env, u3),
            )
        )
        return _nee_finish(
            scene, hit_pos, normal, wo_world, surface, settings,
            alive_mask, wi_world, le_sel, pdf_sel, valid_sel, t_shadow,
            sampler, throughput=throughput,
        )
    if has_area:
        # Pick a light triangle by area CDF.
        li = jnp.searchsorted(em.cdf, u3[:, 0:1]).reshape(-1)
        li = jnp.clip(li, 0, em.tri_ids.shape[0] - 1)
        if em.light_table is not None:
            # Single-gather light fetch (see EmissiveTable.light_table),
            # chunked so the lane-padded [chunk, 16] buffer stays bounded
            # (mathx.map_row_gather — this gather held 7.97 GB at 16.7M
            # lanes when XLA picked the row-major T(8,128) layout).
            v0, e1, e2, le, valid_light = mathx.map_row_gather(
                em.light_table,
                li,
                lambda row: (
                    row[:, 0:3], row[:, 3:6], row[:, 6:9], row[:, 9:12],
                    row[:, 12] > 0.5,
                ),
            )
            v1 = v0 + e1
            v2 = v0 + e2
        else:
            tri = em.tri_ids[li]
            valid_light = tri >= 0
            tid = jnp.clip(tri, 0, scene.num_triangles - 1)
            idx = scene.indices[tid]
            v0 = scene.positions[idx[:, 0]]
            v1 = scene.positions[idx[:, 1]]
            v2 = scene.positions[idx[:, 2]]
            g = scene.geo_id[tid]
            le = scene.materials.emission[g] * scene_types.EMISSION_SCALE
        # Uniform point on triangle.
        su = jnp.sqrt(jnp.maximum(u3[:, 1:2], 0.0))
        b0 = 1.0 - su
        b1 = u3[:, 2:3] * su
        p = v0 * b0 + v1 * b1 + v2 * (1.0 - b0 - b1)

        to_l = p - hit_pos
        dist2 = mathx.dot(to_l, to_l)
        dist = jnp.sqrt(jnp.maximum(dist2, 1e-12))
        wi_world = to_l / dist
        l_nrm = mathx.normalize(jnp.cross(v1 - v0, v2 - v0))
        cos_l = jnp.abs(mathx.dot(l_nrm, -wi_world, keepdims=False))

        # pdf in solid-angle measure; area pick pdf = 1/total_area.
        pdf_light = dist2[:, 0] / jnp.maximum(cos_l * em.total_area, 1e-20)
        valid_sel = valid_light & (cos_l > 1e-6) & (pdf_light > 0.0)
        pdf_sel = pdf_light
        t_shadow = dist[:, 0] * (1.0 - 1e-3)
        le_sel = le
    else:
        # Env-only scenes: the mixture below (q_env == 1) replaces all of
        # these placeholders per-lane.
        n = hit_pos.shape[0]
        wi_world = jnp.zeros((n, 3), jnp.float32).at[:, 1].set(1.0)
        pdf_light = jnp.zeros((n,), jnp.float32)
        valid_sel = jnp.zeros((n,), bool)
        pdf_sel = pdf_light
        t_shadow = jnp.zeros((n,), jnp.float32)
        le_sel = jnp.zeros((n, 3), jnp.float32)

    q_env = _env_mix_q(scene)
    if q_env > 0.0:
        # Mixture NEE: per lane, flip between the env (alias-sampled) and
        # the area set. Selection probability folds into the pdf so the
        # balance heuristic stays consistent with the BRDF-side pickups.
        u_env, sampler = sampler.next3()
        u_sel, sampler = sampler.next1()
        wi_env, le_env, pdf_env = _sample_env_light(scene, u_env)
        choose_env = u_sel < q_env
        ce3 = choose_env[:, None]
        wi_world = jnp.where(ce3, wi_env, wi_world)
        le_sel = jnp.where(ce3, le_env, le_sel)
        pdf_sel = jnp.where(
            choose_env, q_env * pdf_env, (1.0 - q_env) * pdf_light
        )
        valid_sel = jnp.where(
            choose_env, pdf_env > 0.0, valid_sel
        )
        t_shadow = jnp.where(
            choose_env, mathx.BACKGROUND_DEPTH * 0.9, t_shadow
        )

    return _nee_finish(
        scene, hit_pos, normal, wo_world, surface, settings, alive_mask,
        wi_world, le_sel, pdf_sel, valid_sel, t_shadow, sampler,
        throughput=throughput,
    )


def _nee_finish(
    scene, hit_pos, normal, wo_world, surface, settings, alive_mask,
    wi_world, le_sel, pdf_sel, valid_sel, t_shadow, sampler,
    throughput=None,
):
    """Shared NEE tail: BRDF evaluation toward the sampled light direction,
    balance-heuristic MIS weight, validity mask, and shadow-ray setup.

    With settings.nee_rr_threshold > 0 and `throughput` given, shadow rays
    whose unshadowed radiance increment is dim are Russian-rouletted
    (traced with p = lum/threshold, contrib scaled 1/p — unbiased): parked
    lanes cost ~nothing in the sorted any-hit launch, and shadow traversal
    is the single biggest slice of the sponza1080 frame."""
    cos_s = mathx.dot(normal, wi_world, keepdims=False)

    onb = mathx.build_orthonormal_basis(normal)
    wo_l = mathx.to_local(onb, wo_world)
    wi_l = mathx.to_local(onb, wi_world)
    if settings.diffuse_only:
        ev = brdf.diffuse_evaluate(surface.albedo, wi_l)
    else:
        ev = brdf.surface_evaluate(
            surface.albedo, surface.roughness, surface.metalness, wo_l, wi_l
        )
    # ev.pdf is projected-solid-angle; convert to solid angle for MIS.
    pdf_brdf = ev.pdf * jnp.maximum(wi_l[..., 2], 0.0)
    mis_w = pdf_sel / jnp.maximum(pdf_sel + pdf_brdf, 1e-20)

    # Lanes whose NEE sample is already invalid skip the shadow traversal
    # (parked outside the scene → immediate miss in packet traversal).
    pre_ok = valid_sel & (cos_s > 0.0)
    if alive_mask is not None:
        pre_ok = pre_ok & alive_mask
    contrib = (
        ev.value
        * le_sel
        * (cos_s * mis_w / jnp.maximum(pdf_sel, 1e-20))[:, None]
    )
    if settings.nee_rr_threshold > 0.0 and throughput is not None:
        # Contribution-proportional survival; p floored at 0.05 so the
        # 1/p amplification (and its variance) stays bounded ≤ 20× — the
        # radiance_clamp then caps any surviving outlier.
        inc = jnp.maximum(
            0.2126 * contrib[:, 0] * throughput[:, 0]
            + 0.7152 * contrib[:, 1] * throughput[:, 1]
            + 0.0722 * contrib[:, 2] * throughput[:, 2],
            0.0,
        )
        p = jnp.clip(inc / settings.nee_rr_threshold, 0.05, 1.0)
        u_rr, sampler = sampler.next1()
        pre_ok = pre_ok & (u_rr < p)
        contrib = contrib / p[:, None]
    shadow_o = jnp.where(pre_ok[:, None], hit_pos + normal * 1e-3, 1e30)
    return shadow_o, wi_world, t_shadow, pre_ok, contrib, sampler


def _nee_contribution(
    scene: scene_types.Scene,
    occluded_fn: OccludedFn,
    hit_pos: jax.Array,
    normal: jax.Array,
    wo_world: jax.Array,
    surface: scene_types.SurfaceInfo,
    u3: jax.Array,
    sampler: rng.Sampler,
    settings: RenderSettings,
    alive_mask: jax.Array | None = None,
    sort_shadow: bool = False,
    sort_bounds=None,
    return_count: bool = False,
    throughput: jax.Array | None = None,
):
    """_nee_prepare + the shadow traversal: one-sample NEE radiance.

    return_count=True additionally returns the number of lanes whose shadow
    ray actually traversed (pre_ok) — the honest shadow-ray meter; lanes
    with invalid/backfacing samples are parked and cost ~nothing."""
    shadow_o, wi_world, t_shadow, pre_ok, contrib, sampler = _nee_prepare(
        scene, hit_pos, normal, wo_world, surface, u3, sampler, settings,
        alive_mask=alive_mask, throughput=throughput,
    )
    # Lane diet (settings.lane_diet): contrib is the only [N,3] of this
    # function's own state live across the shadow launch — rgb9e5-pack it
    # (render/wavefront._diet_pack for the mechanism).
    from raytracer3_tpu.render import wavefront as _wf_diet

    shadow_o, diet_packed = _wf_diet._diet_pack(
        settings.lane_diet, shadow_o, contrib
    )
    if sort_shadow:
        # Coherence-sort the shadow batch into the traversal and scatter the
        # occlusion bits back — the queue itself stays in pixel order (see
        # wavefront.py: permuting whole queues costs ~4.5 ms per array).
        from raytracer3_tpu.render import wavefront as _wf

        perm = jnp.argsort(
            _wf.sort_key_pos_dir(shadow_o, wi_world, pre_ok, sort_bounds)
        )
        packed = jnp.concatenate(
            [shadow_o, wi_world, t_shadow[:, None]], axis=1
        )[perm]
        blocked_s = occluded_fn(packed[:, 0:3], packed[:, 3:6], packed[:, 6])
        # Inverse-permutation gather (TPU scatter costs ~20 ms at 522k).
        blocked = blocked_s[jnp.argsort(perm)]
    else:
        blocked = occluded_fn(shadow_o, wi_world, t_shadow)

    (contrib,) = _wf_diet._diet_unpack(
        settings.lane_diet, blocked, diet_packed
    )
    ok = pre_ok & ~blocked
    li_out = jnp.where(ok[:, None], contrib, 0.0)
    if return_count:
        return li_out, sampler, jnp.sum(pre_ok.astype(jnp.int32))
    return li_out, sampler


def render_image(
    scene: scene_types.Scene,
    cam: camera_mod.Camera,
    settings: RenderSettings,
    frame_index,
    intersect_fn: IntersectFn,
    occluded_fn: Optional[OccludedFn] = None,
) -> jax.Array:
    """One full frame of raw radiance [H, W, 3] (before postprocess):
    primary rays → G-buffer → bounce loop — the frame the reference's render
    graph assembles from gbuffer + refrence_mode passes (SURVEY.md §3.5)."""
    w, h = settings.width, settings.height
    pix = camera_mod.pixel_grid(w, h)
    sampler = rng.Sampler.from_pixels(pix, frame_index)
    uj, sampler = sampler.next2()
    o, d = camera_mod.primary_rays(cam, w, h, jitter=uj, pixel_xy=pix)
    gbuf = trace_gbuffer(scene, intersect_fn, o, d)
    radiance = trace_radiance(
        scene, intersect_fn, o, d, gbuf, sampler, settings, occluded_fn
    )
    # Primary miss → environment (composited here into raw radiance; AgX is
    # applied by render/postprocess.py like postprocess.slang:90-112).
    env = _sample_env(scene, d)
    radiance = jnp.where(gbuf.hit[:, None], radiance, env)
    return radiance.reshape(h, w, 3)
