"""Prebuilt frame pipelines: the per-frame pass assembly the reference
declares in its `commands` system (src/renderer/mod.rs:65-106) and the legacy
probe pipeline (SURVEY.md §3.5), expressed through the frame graph.

Each factory returns ``(step, init_state)`` where
``step(state, cam, frame_index) -> (display, state)`` is one jitted frame.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raytracer3_tpu.graph import FrameGraph
from raytracer3_tpu.ops import rng as rng_mod
from raytracer3_tpu.render import camera as camera_mod
from raytracer3_tpu.render import film as film_mod
from raytracer3_tpu.render import pathtracer, postprocess, probes, wavefront
from raytracer3_tpu.utils.config import RenderSettings


def _resolve_backend(backend, intersect_fn, occluded_fn, bindings):
    """(isect, occl) for a pass body: TraceBackend arrays rebound from the
    per-call bindings (the jit-argument path), else the legacy closures."""
    if backend is not None:
        return backend.bind(bindings["bvh"])
    return intersect_fn, occluded_fn


def wavefront_pipeline(
    scene, settings: RenderSettings, intersect_fn=None, occluded_fn=None,
    sort_rays: bool = True, backend=None, blue_noise=None,
    denoise: bool = False,
):
    """Production progressive path tracing: wavefront PT → film blend → AgX.

    Graph form of the reference's active `commands` declaration: a "trace"
    pass writing radiance, a "blend" pass folding it into the temporal film,
    and a "post" pass producing the display image (the swapchain writer).

    denoise=True adds an edge-aware à-trous filter on the film whose
    strength fades as accumulation deepens (render/denoise.py) — shallow
    frames (right after a camera move resets the film) display smooth while
    Monte-Carlo convergence takes over. The reference has no denoiser.

    Prefer ``backend=`` (a TraceBackend): the scene and BVH tables then cross
    the jit boundary as arguments (bindings), which tunneled-TPU dispatch
    requires (ops/backend.py). ``intersect_fn``/``occluded_fn`` closures
    remain supported for tests/CPU."""
    w, h = settings.width, settings.height
    g = FrameGraph()
    g.image("radiance", (h, w, 3))
    g.temporal("film", (h, w, 3))
    g.temporal("frame_count", ())
    g.image("display", (h, w, 3))
    if denoise:
        g.image("gbuf_depth", (h, w))
        g.image("gbuf_normal", (h, w, 3))

    def trace(r, cam, frame_index, bindings):
        isect, occl = _resolve_backend(
            backend, intersect_fn, occluded_fn, bindings
        )
        fused = (
            backend.bind_capped(bindings["bvh"])
            if (settings.fuse_shadow and backend is not None)
            else None
        )
        out = wavefront.render_frame(
            bindings["scene"], cam, settings, frame_index, isect, occl,
            sort_rays=sort_rays, blue_noise=bindings.get("blue_noise"),
            return_gbuffer=denoise,
            primary_fn=(
                backend.bind_primary(bindings["bvh"])
                if backend is not None else None
            ),
            fused_fn=fused,
        )
        if denoise:
            rad, (gd, gn) = out
            return {"radiance": rad, "gbuf_depth": gd, "gbuf_normal": gn}
        return {"radiance": out}

    def blend(r, cam, frame_index):
        n = r["frame_count@prev"]
        t = 1.0 / (n + 1.0)
        return {
            "film": r["film@prev"] + (r["radiance"] - r["film@prev"]) * t,
            "frame_count": n + 1.0,
        }

    def post(r, cam, frame_index):
        film = r["film"]
        if denoise:
            from raytracer3_tpu.render import denoise as dn

            filt = dn.atrous_filter(film, r["gbuf_depth"], r["gbuf_normal"])
            s = dn.denoise_strength(r["frame_count"])
            film = film + (filt - film) * s
        return {"display": postprocess.postprocess(film)}

    g.add_pass(
        "trace", trace,
        writes=["radiance"]
        + (["gbuf_depth", "gbuf_normal"] if denoise else []),
    )
    g.add_pass(
        "blend", blend,
        reads=["radiance", "film@prev", "frame_count@prev"],
        writes=["film", "frame_count"],
    )
    g.add_pass(
        "post", post,
        reads=["film", "frame_count"]
        + (["gbuf_depth", "gbuf_normal"] if denoise else []),
        writes=["display"],
    )
    bindings = {
        "scene": scene,
        "bvh": None if backend is None else backend.arrays,
        "blue_noise": blue_noise,
    }
    step = g.compile(output="display", bindings=bindings)
    return step, g.init_state


def probe_gi_pipeline(scene, settings: RenderSettings, intersect_fn=None, occluded_fn=None, blendfactor: float = 0.15, backend=None):
    """The legacy probe pipeline (SURVEY.md §3.5): G-buffer → SIS →
    trace_probes → SH conversion → interpolate → postprocess, with the probe
    atlas as the temporal resource (prev_probe_atlas analog)."""
    w, h = settings.width, settings.height
    px, py = settings.probe_grid
    r_ = settings.probe_res
    g = FrameGraph()
    # The G-buffer crosses passes PACKED (uint4 + planar depth), exactly the
    # reference's layout and bandwidth trade (old/gbuffer.slang:8-20 writes
    # packed; SIS/interpolate unpack: gbuffer_helpers.slang:13-70).
    g.image("gbuf_data", (h, w, 4), dtype=jnp.uint32)
    g.image("gbuf_depth", (h, w))
    g.temporal("probe_atlas", (py * r_, px * r_, 3))
    g.temporal("probe_depth", (py * r_, px * r_))
    g.image("light", (h, w, 3))
    g.image("display", (h, w, 3))
    g.image("sh", (py, px, 3, 9))

    def gbuf(r, cam, frame_index, bindings):
        isect, _ = _resolve_backend(backend, intersect_fn, occluded_fn, bindings)
        packed, _hit = probes.trace_packed_gbuffer(
            bindings["scene"], isect, cam, settings,
            primary_fn=(
                backend.bind_primary(bindings["bvh"])
                if backend is not None else None
            ),
        )
        return {"gbuf_data": packed.data, "gbuf_depth": packed.depth}

    def gi(r, cam, frame_index, bindings):
        from raytracer3_tpu.render import gbuffer as gbuffer_mod

        isect, occl = _resolve_backend(
            backend, intersect_fn, occluded_fn, bindings
        )
        prev = probes.ProbeState(
            atlas=r["probe_atlas@prev"],
            depth=r["probe_depth@prev"],
            sh_coeffs=jnp.zeros((py, px, 3, 9), jnp.float32),
        )
        packed = gbuffer_mod.PackedGBuffer(
            data=r["gbuf_data"], depth=r["gbuf_depth"]
        )
        # Camera-cut history invalidation: frame 0 (the viewer resets the
        # frame counter on camera motion) blends with factor 1.0 so stale
        # probe history vanishes in one frame instead of decaying over
        # ~1/blendfactor frames of ghosting.
        bf = jnp.where(
            jnp.asarray(frame_index, jnp.uint32) == 0, 1.0, blendfactor
        )
        light, state, aux = probes.probe_gi_from_gbuffer(
            bindings["scene"], isect, cam, packed, prev, settings,
            frame_index, blendfactor=bf, occluded_fn=occl,
        )
        return {
            "light": light,
            "probe_atlas": state.atlas,
            "probe_depth": state.depth,
            "sh": state.sh_coeffs,
        }

    def post(r, cam, frame_index):
        return {"display": postprocess.postprocess(r["light"])}

    g.add_pass(
        "gbuffer", gbuf, writes=["gbuf_data", "gbuf_depth"]
    )
    g.add_pass(
        "probe_gi", gi,
        reads=["gbuf_data", "gbuf_depth", "probe_atlas@prev", "probe_depth@prev"],
        writes=["light", "probe_atlas", "probe_depth", "sh"],
    )
    g.add_pass("post", post, reads=["light"], writes=["display"])
    step = g.compile(
        output="display",
        bindings={
            "scene": scene,
            "bvh": None if backend is None else backend.arrays,
        },
    )
    return step, g.init_state


def hybrid_gi_pipeline(
    scene, settings: RenderSettings, intersect_fn=None, occluded_fn=None,
    blendfactor: float = 0.15, backend=None,
):
    """Hybrid probes+PT (probes.hybrid_gi_from_gbuffer): per-pixel direct
    NEE + indirect-only probe atlas, assembled through the same graph shape
    as probe_gi_pipeline. Goes beyond the reference's probe mode (which has
    no per-pixel shadows); the temporal resources and camera-cut
    invalidation behave identically."""
    w, h = settings.width, settings.height
    px, py = settings.probe_grid
    r_ = settings.probe_res
    g = FrameGraph()
    g.image("gbuf_data", (h, w, 4), dtype=jnp.uint32)
    g.image("gbuf_depth", (h, w))
    g.temporal("probe_atlas", (py * r_, px * r_, 3))
    g.temporal("probe_depth", (py * r_, px * r_))
    g.temporal("direct_hist", (h, w, 3))
    g.image("light", (h, w, 3))
    g.image("display", (h, w, 3))
    g.image("sh", (py, px, 3, 9))

    def gbuf(r, cam, frame_index, bindings):
        isect, _ = _resolve_backend(backend, intersect_fn, occluded_fn, bindings)
        packed, _hit = probes.trace_packed_gbuffer(
            bindings["scene"], isect, cam, settings,
            primary_fn=(
                backend.bind_primary(bindings["bvh"])
                if backend is not None else None
            ),
        )
        return {"gbuf_data": packed.data, "gbuf_depth": packed.depth}

    def gi(r, cam, frame_index, bindings):
        from raytracer3_tpu.render import gbuffer as gbuffer_mod

        isect, occl = _resolve_backend(
            backend, intersect_fn, occluded_fn, bindings
        )
        prev = probes.ProbeState(
            atlas=r["probe_atlas@prev"],
            depth=r["probe_depth@prev"],
            sh_coeffs=jnp.zeros((py, px, 3, 9), jnp.float32),
        )
        packed = gbuffer_mod.PackedGBuffer(
            data=r["gbuf_data"], depth=r["gbuf_depth"]
        )
        bf = jnp.where(
            jnp.asarray(frame_index, jnp.uint32) == 0, 1.0, blendfactor
        )
        light, state, aux = probes.hybrid_gi_from_gbuffer(
            bindings["scene"], isect, cam, packed, prev, settings,
            frame_index, blendfactor=bf, occluded_fn=occl,
        )
        # The per-pixel direct term is one NEE sample/frame — temporally
        # blend it with the probe history's own factor and invalidation so
        # sharp shadows converge while camera cuts drop stale history (the
        # indirect term is already smoothed inside the probe atlas).
        direct = light - aux["indirect"]
        direct = r["direct_hist@prev"] + (direct - r["direct_hist@prev"]) * bf
        return {
            "light": aux["indirect"] + direct,
            "direct_hist": direct,
            "probe_atlas": state.atlas,
            "probe_depth": state.depth,
            "sh": state.sh_coeffs,
        }

    def post(r, cam, frame_index):
        return {"display": postprocess.postprocess(r["light"])}

    g.add_pass("gbuffer", gbuf, writes=["gbuf_data", "gbuf_depth"])
    g.add_pass(
        "hybrid_gi", gi,
        reads=[
            "gbuf_data", "gbuf_depth", "probe_atlas@prev",
            "probe_depth@prev", "direct_hist@prev",
        ],
        writes=["light", "direct_hist", "probe_atlas", "probe_depth", "sh"],
    )
    g.add_pass("post", post, reads=["light"], writes=["display"])
    step = g.compile(
        output="display",
        bindings={
            "scene": scene,
            "bvh": None if backend is None else backend.arrays,
        },
    )
    return step, g.init_state


def reference_pipeline(scene, settings: RenderSettings, intersect_fn=None, occluded_fn=None, backend=None):
    """Reference-mode ground-truth pipeline (old/refrence_mode.slang):
    G-buffer → samples×bounces PT → progressive blend → AgX."""
    w, h = settings.width, settings.height
    g = FrameGraph()
    g.image("radiance", (h, w, 3))
    g.temporal("film", (h, w, 3))
    g.temporal("frame_count", ())
    g.image("display", (h, w, 3))

    def trace(r, cam, frame_index, bindings):
        isect, occl = _resolve_backend(
            backend, intersect_fn, occluded_fn, bindings
        )
        rad = pathtracer.render_image(
            bindings["scene"], cam, settings, frame_index, isect, occl
        )
        return {"radiance": rad}

    def blend(r, cam, frame_index):
        n = r["frame_count@prev"]
        t = 1.0 / (n + 1.0)
        return {
            "film": r["film@prev"] + (r["radiance"] - r["film@prev"]) * t,
            "frame_count": n + 1.0,
        }

    def post(r, cam, frame_index):
        return {"display": postprocess.postprocess(r["film"])}

    g.add_pass("trace", trace, writes=["radiance"])
    g.add_pass(
        "blend", blend,
        reads=["radiance", "film@prev", "frame_count@prev"],
        writes=["film", "frame_count"],
    )
    g.add_pass("post", post, reads=["film"], writes=["display"])
    step = g.compile(
        output="display",
        bindings={
            "scene": scene,
            "bvh": None if backend is None else backend.arrays,
        },
    )
    return step, g.init_state
