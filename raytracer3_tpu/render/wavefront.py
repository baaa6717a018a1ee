"""Wavefront path tracer: the production renderer.

The TPU-native re-design of the reference's per-pixel megakernel
(``shaders/old/refrence_mode.slang``) prescribed by SURVEY.md §5
('long-context' analog) and BASELINE.json: rays live in flat ``[N]`` SoA
queues decoupled from pixels (``pixel_id`` indirection), the bounce loop is a
``lax.scan`` over masked wavefront steps, and between bounces the wavefront is
optionally **re-sorted for coherence** (alive-first compaction + direction-
octant / hit-locality keys — the ray-reordering technique from the
PAPERS.md literature) so BVH node gathers hit HBM coherently. Dead lanes are
masked, never branched; shapes stay static for XLA.

Extras over the reference's tracer: next-event estimation with MIS (balance
heuristic), environment-map contribution for secondary misses, Russian
roulette after a static prefix, firefly clamping.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from raytracer3_tpu.ops import brdf, intersect, mathx, rng
from raytracer3_tpu.render import camera as camera_mod
from raytracer3_tpu.render import pathtracer
from raytracer3_tpu.scene import types as scene_types
from raytracer3_tpu.utils.config import RenderSettings


class RayQueue(NamedTuple):
    """Flat wavefront state, SoA [N]."""

    origin: jax.Array  # [N, 3]
    direction: jax.Array  # [N, 3]
    throughput: jax.Array  # [N, 3]
    radiance: jax.Array  # [N, 3] accumulated
    pixel_id: jax.Array  # [N] int32 (indirection to the film)
    alive: jax.Array  # [N] bool
    prev_pdf: jax.Array  # [N] solid-angle pdf of the last BRDF sample (MIS)
    depth: jax.Array  # [N] t of the current hit
    prim_id: jax.Array  # [N]
    uv: jax.Array  # [N, 2]
    inst: jax.Array | None = None  # [N] hit instance (TLAS backends)


def sort_key_pos_dir(
    pos: jax.Array, d: jax.Array, alive: jax.Array, bounds=None
) -> jax.Array:
    """Coherence sort key: alive rays first, then direction octant, then a
    Morton code of the ray origin — packs spatially/directionally coherent
    rays into the same traversal packet (the ray-reordering technique).

    ``bounds=(lo, hi)``: pass the scene AABB (computed once per frame) to
    skip the two masked [N,3] reductions per key."""
    octant = (
        (d[:, 0] >= 0).astype(jnp.int32)
        + 2 * (d[:, 1] >= 0).astype(jnp.int32)
        + 4 * (d[:, 2] >= 0).astype(jnp.int32)
    )
    if bounds is not None:
        lo, hi = bounds
    else:
        # Bounds over *alive* lanes only: dead lanes are parked at 1e30 and
        # would swamp the scene extent, collapsing every live ray into one
        # Morton cell.
        alive3 = alive[:, None]
        lo = jnp.min(jnp.where(alive3, pos, jnp.inf), axis=0)
        hi = jnp.max(jnp.where(alive3, pos, -jnp.inf), axis=0)
        no_alive = ~jnp.isfinite(lo)
        lo = jnp.where(no_alive, 0.0, lo)
        hi = jnp.where(no_alive, 1.0, hi)
    norm = (pos - lo) / jnp.maximum(hi - lo, 1e-6)
    # 18-bit Morton (6 bits/axis) is plenty for packet grouping.
    qz = jnp.clip(norm * 63.0, 0, 63).astype(jnp.int32)
    morton = jnp.zeros(pos.shape[0], jnp.int32)
    for b in range(6):
        morton = (
            morton
            | (((qz[:, 0] >> b) & 1) << (3 * b + 2))
            | (((qz[:, 1] >> b) & 1) << (3 * b + 1))
            | (((qz[:, 2] >> b) & 1) << (3 * b))
        )
    dead_penalty = jnp.where(alive, 0, 1 << 30)
    # Direction-major, position-minor (measured marginally better than
    # position-major on bounce workloads: shared traversal ORDER matters as
    # much as leaf locality for packet unions).
    return dead_penalty + (octant << 18) + morton


def _sort_key(q: RayQueue) -> jax.Array:
    """Legacy queue key (kept for parallel/mesh + tests)."""
    p = q.origin + q.depth[:, None] * q.direction
    return sort_key_pos_dir(p, q.direction, q.alive)


def _permute(q: RayQueue, perm: jax.Array) -> RayQueue:
    return jax.tree.map(lambda a: a[perm], q)


def sorted_trace(
    intersect_fn, origins, directions, alive, bounds=None
) -> intersect.Hit:
    """Trace through the backend with coherence-sorted IO, results in the
    caller's ray order.

    The queue itself is never permuted: sorting packs exactly ONE [N, 6]
    ray gather in and one inverse-permutation gather out (prim_id travels
    bit-cast through the f32 pack)."""
    perm = jnp.argsort(sort_key_pos_dir(origins, directions, alive, bounds))
    packed = jnp.concatenate([origins, directions], axis=1)[perm]
    h = intersect_fn(packed[:, 0:3], packed[:, 3:6])
    cols = [
        h.t[:, None],
        h.uv,
        jax.lax.bitcast_convert_type(h.prim_id, jnp.float32)[:, None],
    ]
    if h.inst is not None:
        cols.append(jax.lax.bitcast_convert_type(h.inst, jnp.float32)[:, None])
    hp = jnp.concatenate(cols, axis=1)
    # Un-sort with an inverse-permutation GATHER: XLA's scatter on TPU costs
    # ~20 ms at 522k lanes while argsort(perm) + gather is ~2 ms (measured).
    inv = jnp.argsort(perm)
    hp = hp[inv]
    prim_id = jax.lax.bitcast_convert_type(hp[:, 3], jnp.int32)
    return intersect.Hit(
        t=hp[:, 0], uv=hp[:, 1:3], prim_id=prim_id, hit=prim_id >= 0,
        inst=(
            jax.lax.bitcast_convert_type(hp[:, 4], jnp.int32)
            if h.inst is not None else None
        ),
    )


def _diet_pack(diet: bool, launch_in, *cols):
    """Lane-state diet half 1 (settings.lane_diet): rgb9e5-pack non-negative
    color state so only 1 u32/lane per value stays live across the traversal
    launch (3 f32 would otherwise be held — ~12 B/lane each; the sponza720
    32-spp OOM was 593 MB of exactly such temps). The launch input is tied
    through an optimization_barrier so XLA cannot hoist the launch above the
    packs (which would keep the f32 versions alive anyway).

    Returns (launch_in, packed_cols)."""
    if not diet:
        return launch_in, cols
    from raytracer3_tpu.ops import packing

    packed = tuple(packing.pack_rgb9e5(c) for c in cols)
    tied = jax.lax.optimization_barrier((launch_in,) + packed)
    return tied[0], tied[1:]


def _diet_unpack(diet: bool, anchor, cols):
    """Half 2: unpack after the launch, anchored on a launch OUTPUT through
    an optimization_barrier so XLA cannot sink the unpacks above the launch
    (which would resurrect the f32 liveness the pack removed)."""
    if not diet:
        return cols
    from raytracer3_tpu.ops import packing

    tied = jax.lax.optimization_barrier(tuple(cols) + (anchor,))
    return tuple(packing.unpack_rgb9e5(c) for c in tied[:-1])


def trace_wavefront(
    scene: scene_types.Scene,
    intersect_fn: pathtracer.IntersectFn,
    q: RayQueue,
    sampler: rng.Sampler,
    settings: RenderSettings,
    occluded_fn: Optional[pathtracer.OccludedFn] = None,
    sort_rays: bool = False,
    rr_start: int = 3,
    fused_fn=None,
    tail_anyhit: bool = True,
) -> RayQueue:
    """Run the bounce loop on an initialized wavefront whose first hit is
    already recorded in (depth, prim_id, uv, alive). Returns the final queue
    with radiance accumulated (pixel order = q.pixel_id).

    fused_fn: optional per-ray-capped closest-hit trace ``(o, d, t_max[N])
    -> Hit`` (TraceBackend.bind_capped). When given (and NEE is active),
    each bounce traces its NEE shadow batch and its next-bounce rays in ONE
    2N-lane launch instead of two: one driver sort/gather set instead of
    two, and 2× the ray density per launch (denser populations sort into
    purer traversal packets — tools/probe_r3.py --what density). Shadow
    lanes carry cap = light distance and read Hit.hit as the occlusion bit
    (nearest-vs-any is irrelevant for a boolean); the trade is losing the
    any-hit resolved-segment early-skip. Radiance is bit-compatible with the
    split path (same sampler draws, same occlusion booleans).

    tail_anyhit: the LAST bounce's closest-hit launch only feeds the
    escape/env test (its hit surface is never shaded — the loop ends), so
    an any-hit traversal answers it ~3× cheaper (sponza bounce 3.0 s vs
    occl 1.0 s per 16.7M-lane launch); the final NEE shadow batch rides the
    same launch (both are pure any-hit), halving the tail's sort-driver
    cost (~0.55 s per sorted launch at 16.7M lanes, tools/probe_driver.py).
    Radiance is bit-compatible: the occlusion boolean equals the
    closest-hit's hit bit exactly, and the accumulation order is unchanged."""
    q_env = pathtracer._env_mix_q(scene)
    use_nee = occluded_fn is not None and (
        int(scene.emissive.tri_ids.shape[0]) > 0 or q_env > 0.0
    )
    # Scene AABB for Morton sort keys, computed once per frame.
    sort_bounds = (
        jnp.min(scene.positions, axis=0), jnp.max(scene.positions, axis=0)
    )

    def bounce(carry, b, last=False):
        q, sampler = carry
        n_shadow = jnp.int32(0)  # measured below (pre_ok lanes only)
        # Tail bounce: the traced hit only feeds the escape/env test, so
        # any-hit traversal replaces closest-hit (see docstring).
        tail_any = last and tail_anyhit and occluded_fn is not None

        fp_log2 = None
        if scene.tex_atlas is not None:
            # Ray-cone texture LOD: footprint ≈ t·cone/cosθ, cone widened
            # after each diffuse bounce (distance-based approximation of ray
            # differentials; density term added per material in the sampler).
            cone = settings.tex_cone_angle * (1.0 + 4.0 * b.astype(jnp.float32))
            cos_i = jnp.abs(
                mathx.dot(
                    scene_types.geometric_normals(scene, q.prim_id),
                    -q.direction, keepdims=False,
                )
            )
            fp_log2 = jnp.log2(
                jnp.maximum(q.depth * cone / jnp.maximum(cos_i, 0.05), 1e-12)
            )
        surface = scene_types.hit_surface_info(
            scene, q.prim_id, q.uv, q.inst, footprint_log2=fp_log2
        )
        nrm = pathtracer._face_forward(surface.normal, -q.direction)

        # Emissive pickup with MIS against NEE (first bounce unweighted —
        # primary hits of lights must be full-strength).
        emit_w = jnp.ones(q.alive.shape, jnp.float32)
        if use_nee:
            cos_l = jnp.abs(mathx.dot(nrm, -q.direction, keepdims=False))
            pdf_light = (1.0 - q_env) * (q.depth * q.depth) / jnp.maximum(
                cos_l * scene.emissive.total_area, 1e-20
            )
            is_emitter = jnp.max(surface.emissive, axis=-1) > 0.0
            w = q.prev_pdf / jnp.maximum(q.prev_pdf + pdf_light, 1e-20)
            emit_w = jnp.where(is_emitter & (b > 0), w, 1.0)
        radiance = q.radiance + jnp.where(
            q.alive[:, None], q.throughput * surface.emissive * emit_w[:, None], 0.0
        )

        onb = mathx.build_orthonormal_basis(nrm)
        hit_pos = q.origin + q.depth[:, None] * q.direction

        fuse = fused_fn is not None and use_nee and not tail_any
        shadow = None
        if use_nee:
            u_l, sampler = sampler.next3()
            if tail_any:
                # Defer the shadow traversal: it rides the tail any-hit
                # launch below (same sampler draws as the split path).
                sh_o, sh_d, sh_t, pre_ok, contrib, sampler = (
                    pathtracer._nee_prepare(
                        scene, hit_pos, nrm, -q.direction, surface, u_l,
                        sampler, settings, alive_mask=q.alive,
                        throughput=q.throughput,
                    )
                )
                shadow = (sh_o, sh_d, sh_t, pre_ok, contrib)
                n_shadow = jnp.sum(pre_ok.astype(jnp.int32))
            elif fuse:
                # Defer the shadow traversal: it rides the next-bounce launch
                # below (same sampler draws as the split path).
                sh_o, sh_d, sh_t, pre_ok, contrib, sampler = (
                    pathtracer._nee_prepare(
                        scene, hit_pos, nrm, -q.direction, surface, u_l,
                        sampler, settings, alive_mask=q.alive,
                        throughput=q.throughput,
                    )
                )
                shadow = (sh_o, sh_d, sh_t, pre_ok, contrib)
                n_shadow = jnp.sum(pre_ok.astype(jnp.int32))
            else:
                # Lane diet around the shadow launch inside _nee_contribution
                # (which also packs its own contrib): anchor the unpack on
                # li so XLA cannot resurrect the f32 state mid-launch. The
                # barrier-tied hit_pos feeds the launch (shadow origins), so
                # the packs are ordered BEFORE the launch — discarding the
                # tied value would let XLA schedule the packs after it.
                hit_pos_t, packed = _diet_pack(
                    settings.lane_diet, hit_pos, radiance, q.throughput
                )
                li, sampler, n_shadow = pathtracer._nee_contribution(
                    scene, occluded_fn, hit_pos_t, nrm, -q.direction, surface,
                    u_l, sampler, settings, alive_mask=q.alive,
                    sort_shadow=sort_rays, sort_bounds=sort_bounds,
                    return_count=True, throughput=q.throughput,
                )
                radiance, q_throughput = _diet_unpack(
                    settings.lane_diet, li, packed
                )
                radiance = radiance + jnp.where(
                    q.alive[:, None], q_throughput * li, 0.0
                )

        # BRDF sample.
        if settings.diffuse_only:
            u2, sampler = sampler.next2()
            s = brdf.diffuse_sample(surface.albedo, u2)
        else:
            u3, sampler = sampler.next3()
            s = brdf.surface_sample(
                surface.albedo, surface.roughness, surface.metalness,
                mathx.to_local(onb, -q.direction), u3,
            )

        new_dir = mathx.to_world(onb, s.wi)
        throughput = q.throughput * s.value_over_pdf
        prev_pdf = jnp.maximum(s.pdf * jnp.abs(s.wi[..., 2]), 1e-8)
        alive = q.alive & s.valid & (jnp.max(throughput, -1) > 0.0)

        # Russian roulette (static start; probability = max throughput).
        u_rr, sampler = sampler.next1()
        p_cont = jnp.clip(jnp.max(throughput, -1), 0.05, 1.0)
        do_rr = b >= rr_start
        survive = jnp.where(do_rr, u_rr < p_cont, True)
        throughput = jnp.where(
            (do_rr & survive)[:, None],
            throughput / jnp.maximum(p_cont, 1e-6)[:, None],
            throughput,
        )
        alive = alive & survive

        # Next hit. Dead lanes are parked far outside the scene so their
        # packets fail the root AABB test immediately — with alive-first
        # sorting, fully-dead packets cost one traversal iteration.
        alive_at_trace = alive
        diet = settings.lane_diet
        park = jnp.where(alive[:, None], hit_pos, 1e30)
        if tail_any:
            # ONE any-hit launch: [final NEE shadow batch ; escape probes].
            # The escape half caps at BG — "any hit at all" is exactly the
            # closest-hit's hit bit, which is all the env pickup needs.
            m = park.shape[0]
            bg = jnp.full((m,), mathx.BACKGROUND_DEPTH, jnp.float32)
            if use_nee:
                sh_o, sh_d, sh_t, pre_ok, contrib = shadow
                o2 = jnp.concatenate([sh_o, park], axis=0)
                d2 = jnp.concatenate([sh_d, new_dir], axis=0)
                cap2 = jnp.concatenate([sh_t, bg])
                o2, packed = _diet_pack(
                    diet, o2, radiance, q.throughput, contrib, throughput
                )
                blocked2 = occluded_fn(o2, d2, cap2)
                radiance, q_throughput, contrib, throughput = _diet_unpack(
                    diet, blocked2, packed
                )
                ok = pre_ok & ~blocked2[:m]
                radiance = radiance + jnp.where(
                    (q.alive & ok)[:, None], q_throughput * contrib, 0.0
                )
                hit_bit = blocked2[m:]
            else:
                park, packed = _diet_pack(diet, park, radiance, throughput)
                hit_bit = occluded_fn(park, new_dir, bg)
                radiance, throughput = _diet_unpack(
                    diet, hit_bit, packed
                )
            h = intersect.Hit(
                t=bg,
                uv=jnp.zeros((m, 2), jnp.float32),
                prim_id=jnp.where(hit_bit, 0, -1).astype(jnp.int32),
                hit=hit_bit,
                inst=(
                    jnp.zeros((m,), jnp.int32) if q.inst is not None else None
                ),
            )
        elif fuse:
            # ONE launch: [shadow batch ; bounce rays]. Shadow lanes cap at
            # the light distance (Hit.hit == occluded), bounce lanes at BG.
            sh_o, sh_d, sh_t, pre_ok, contrib = shadow
            m = park.shape[0]
            o2 = jnp.concatenate([sh_o, park], axis=0)
            d2 = jnp.concatenate([sh_d, new_dir], axis=0)
            cap2 = jnp.concatenate(
                [sh_t, jnp.full((m,), mathx.BACKGROUND_DEPTH, jnp.float32)]
            )
            # Shadow lanes may retire on their first accepted hit (per-lane
            # any-hit flags, kernel mixed_hit); bounce lanes stay exact.
            ah2 = jnp.concatenate(
                [jnp.ones((m,), bool), jnp.zeros((m,), bool)]
            )
            o2, packed = _diet_pack(
                diet, o2, radiance, q.throughput, contrib, throughput
            )
            h2 = fused_fn(o2, d2, cap2, ah2)
            radiance, q_throughput, contrib, throughput = _diet_unpack(
                diet, h2.t, packed
            )
            blocked = h2.hit[:m]
            h = jax.tree.map(lambda a: a[m:], h2)
            ok = pre_ok & ~blocked
            radiance = radiance + jnp.where(
                (q.alive & ok)[:, None], q_throughput * contrib, 0.0
            )
        elif sort_rays:
            park, packed = _diet_pack(diet, park, radiance, throughput)
            h = sorted_trace(intersect_fn, park, new_dir, alive, sort_bounds)
            radiance, throughput = _diet_unpack(diet, h.t, packed)
        else:
            park, packed = _diet_pack(diet, park, radiance, throughput)
            h = intersect_fn(park, new_dir)
            radiance, throughput = _diet_unpack(diet, h.t, packed)
        if use_nee and q_env > 0.0:
            # BRDF-sampled env escape, MIS-weighted against env NEE.
            env, env_pdf = pathtracer._env_radiance_pdf(scene, new_dir)
            w_env = prev_pdf / jnp.maximum(prev_pdf + q_env * env_pdf, 1e-20)
            env = env * w_env[:, None]
        else:
            env = pathtracer._sample_env(scene, new_dir)
        radiance = radiance + jnp.where(
            (alive & ~h.hit)[:, None], throughput * env, 0.0
        )
        alive = alive & h.hit

        q = RayQueue(
            origin=hit_pos,
            direction=new_dir,
            throughput=throughput,
            radiance=radiance,
            pixel_id=q.pixel_id,
            alive=alive,
            prev_pdf=prev_pdf,
            depth=h.t,
            prim_id=h.prim_id,
            uv=h.uv,
            inst=h.inst,
        )
        # Honest ray metering: lanes alive entering the closest-hit trace +
        # shadow lanes that actually traversed (pre_ok inside NEE — invalid/
        # backfacing samples are parked and cost ~nothing). Parked lanes are
        # skipped by the sort + group machinery, so nominal 2·bounces/pixel
        # overcounts.
        n_closest = jnp.sum(alive_at_trace.astype(jnp.int32))
        return (q, sampler), n_closest + n_shadow

    nb = int(settings.bounces)
    if nb > 1:
        (q, sampler), traced = jax.lax.scan(
            bounce, (q, sampler), jnp.arange(nb - 1), unroll=1
        )
        traced = jnp.sum(traced)
    else:
        traced = jnp.int32(0)
    # Last bounce unrolled: its traced hit is only consumed by the
    # escape/env test, so it can run as an any-hit launch (tail_anyhit).
    (q, _), traced_tail = bounce((q, sampler), jnp.int32(nb - 1), last=True)
    return q, traced + traced_tail


TILE_W, TILE_H = 128, 64  # traversal-packet screen tiles (one 8192-ray packet)


def pick_tile(width: int, height: int):
    """Largest packet-friendly tile dims dividing the image (None if none)."""
    tw = next((t for t in (128, 64, 32) if width % t == 0), None)
    th = next((t for t in (64, 32, 16, 8) if height % t == 0), None)
    return (tw, th) if (tw and th) else None


def tiled_pixel_order(width: int, height: int, tile_w: int = TILE_W, tile_h: int = TILE_H) -> jax.Array:
    """Pixel coords [N, 2] in tile-swizzled order: consecutive rays form
    tile_w×tile_h screen tiles, so each fixed-size traversal packet gets a
    tight primary-ray frustum instead of a thin full-width strip.

    Computed host-side (numpy) at trace time — it's a compile-time constant."""
    import numpy as np

    txs = -(-width // tile_w)
    ys, xs = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    x = xs.ravel()
    y = ys.ravel()
    tile = (y // tile_h) * txs + (x // tile_w)
    within = (y % tile_h) * tile_w + (x % tile_w)
    order = np.argsort(tile * (tile_w * tile_h) + within, kind="stable")
    return jnp.asarray(np.stack([x[order], y[order]], axis=-1), jnp.int32)


def render_frame(
    scene: scene_types.Scene,
    cam: camera_mod.Camera,
    settings: RenderSettings,
    frame_index,
    intersect_fn: pathtracer.IntersectFn,
    occluded_fn: Optional[pathtracer.OccludedFn] = None,
    sort_rays: bool = False,
    blue_noise: Optional[jax.Array] = None,
    tile_primaries: bool = True,
    return_stats: bool = False,
    primary_fn: Optional[pathtracer.IntersectFn] = None,
    return_gbuffer: bool = False,
    fused_fn=None,
    tail_anyhit: bool = True,
) -> jax.Array:
    """One frame: primary rays → wavefront bounce loop → scatter to film
    [H, W, 3] raw radiance. Samples loop on the outside (decorrelated).

    return_stats=True additionally returns the measured traced-ray count
    (primaries + alive closest-hit lanes + alive NEE shadow lanes) — the
    honest denominator for Mray/s (nominal 2·bounces/pixel overcounts
    Russian-roulette-killed and escaped lanes).
    return_gbuffer=True additionally returns (depth [H,W], normal [H,W,3])
    of sample 0's primary hits — the denoiser's edge-stopping inputs; costs
    one extra [N] row gather, no extra rays."""
    w, h = settings.width, settings.height
    n = w * h
    tile = pick_tile(w, h) if tile_primaries else None
    if tile is not None:
        tw_, th_ = tile
        pix = tiled_pixel_order(w, h, tile_w=tw_, tile_h=th_)
    else:
        pix = camera_mod.pixel_grid(w, h)

    def sample_rays(s_i):
        """Primary rays + sampler for sample index s_i (jitter decorrelated
        per sample via the scrambled frame index)."""
        fi = jnp.uint32(frame_index) * jnp.uint32(settings.samples) + jnp.uint32(s_i)
        sampler = rng.Sampler.from_pixels(pix, fi)
        if blue_noise is None:
            uj, sampler = sampler.next2()
        else:
            # Blue-noise subpixel jitter (the resources/bluenoise.png role):
            # tile the texture, Cranley-Patterson rotate per frame.
            bw = blue_noise.shape[0]
            bx = jnp.mod(pix[:, 0], bw)
            by = jnp.mod(pix[:, 1], bw)
            b0 = rng.animate_blue_noise(blue_noise[by, bx], fi)
            b1 = rng.animate_blue_noise(blue_noise[bx, by], fi + jnp.uint32(7919))
            uj = jnp.stack([b0, b1], axis=-1)
        o, d = camera_mod.primary_rays(cam, w, h, jitter=uj, pixel_xy=pix)
        return o, d, sampler

    def run_wavefront(o, d, sampler, m):
        """Trace one wavefront of m = n·k lanes; returns per-lane radiance
        (incl. primary-miss env), the traced-ray meter, and the primary
        hit."""
        # Tile-swizzled primaries are already packet-coherent; backends may
        # supply a sort-skipping primary trace (TraceBackend.primary_fn).
        hit0 = (primary_fn or intersect_fn)(o, d)
        q = RayQueue(
            origin=o,
            direction=d,
            throughput=jnp.ones((m, 3), jnp.float32),
            radiance=jnp.zeros((m, 3), jnp.float32),
            pixel_id=jnp.tile(
                (pix[:, 1] * w + pix[:, 0]).astype(jnp.int32), m // n
            ),
            alive=hit0.hit,
            prev_pdf=jnp.full((m,), 1e8, jnp.float32),
            depth=hit0.t,
            prim_id=hit0.prim_id,
            uv=hit0.uv,
            inst=hit0.inst,
        )
        q, traced = trace_wavefront(
            scene, intersect_fn, q, sampler, settings, occluded_fn, sort_rays,
            fused_fn=fused_fn, tail_anyhit=tail_anyhit,
        )
        radiance = q.radiance
        if settings.radiance_clamp > 0.0:
            radiance = jnp.minimum(radiance, settings.radiance_clamp)
        env = pathtracer._sample_env(scene, d)
        radiance = radiance + jnp.where(~hit0.hit[:, None], env, 0.0)
        return radiance, traced + jnp.int32(m), hit0  # + primaries

    if settings.sample_batch and settings.samples > 1:
        # ONE wavefront of samples·n lanes: denser ray populations sort
        # into purer traversal packets (+28% bounce Mray/s at 4× density,
        # tools/probe_r3.py --what density) and the per-launch driver cost
        # amortizes. Queue memory scales with samples.
        parts = [sample_rays(s_i) for s_i in range(settings.samples)]
        o = jnp.concatenate([p[0] for p in parts], axis=0)
        d = jnp.concatenate([p[1] for p in parts], axis=0)
        sampler = rng.Sampler(
            seed=jnp.concatenate([p[2].seed for p in parts], axis=0),
            index=parts[0][2].index,
        )
        radiance, traced_total, hit0 = run_wavefront(
            o, d, sampler, n * settings.samples
        )
        total = jnp.sum(radiance.reshape(settings.samples, n, 3), axis=0)
    else:
        total = jnp.zeros((n, 3), jnp.float32)
        traced_total = jnp.int32(0)
        hit0 = None
        for s_i in range(settings.samples):
            o, d, sampler = sample_rays(s_i)
            radiance, traced, h0 = run_wavefront(o, d, sampler, n)
            if hit0 is None:
                hit0 = h0
            # The queue is never permuted (sorting happens inside
            # sorted_trace / the shadow batch), so radiance is already in
            # fixed pixel order — accumulate element-wise; no film scatter.
            total = total + radiance
            traced_total = traced_total + traced

    total = total / float(settings.samples)
    if tile is not None:
        # Undo the tile-swizzled ray order with pure reshapes (a scatter by
        # pixel_id would be a real HBM scatter; this is free).
        tw_, th_ = tile
        total = (
            total.reshape(h // th_, w // tw_, th_, tw_, 3)
            .transpose(0, 2, 1, 3, 4)
            .reshape(h, w, 3)
        )
    else:
        total = total.reshape(h, w, 3)
    outs = [total]
    if return_stats:
        outs.append(traced_total)
    if return_gbuffer:
        # Sample 0's primary hits, un-swizzled the same way as the film.
        depth_l = hit0.t[:n]
        nrm_l = jnp.where(
            hit0.hit[:n, None],
            scene_types.geometric_normals(scene, hit0.prim_id[:n]),
            0.0,
        )
        gb = jnp.concatenate([depth_l[:, None], nrm_l], axis=1)
        if tile is not None:
            tw_, th_ = tile
            gb = (
                gb.reshape(h // th_, w // tw_, th_, tw_, 4)
                .transpose(0, 2, 1, 3, 4)
                .reshape(h, w, 4)
            )
        else:
            gb = gb.reshape(h, w, 4)
        outs.append((gb[..., 0], gb[..., 1:4]))
    if len(outs) == 1:
        return total
    return tuple(outs)
