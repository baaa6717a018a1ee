"""Probe-GI 1080p attribution + A/B (VERDICT r4 item 2).

Times the probe pipeline's pieces on the real chip at the north-star scene
(300k-tri atrium, 1920x1088): G-buffer pass, probe update (SIS + trace +
SH), interpolate (cells fast path vs the generic gather path), and the full
pipeline step. Honest scalar-pull timing; run on a quiet machine.

  python tools/probe_gi1080.py [--width 1920 --height 1088] [--half]
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse, time
import numpy as np
import jax
import jax.numpy as jnp

from raytracer3_tpu.utils import runtime
from raytracer3_tpu.utils.config import RenderSettings

runtime.init_compilation_cache()


def pull(x, what="pull"):
    return float(runtime.pull_guarded(jnp.sum(x), timeout=2400.0, what=what))


def timeit(fn, *args, iters=3, what="cfg"):
    out = fn(*args)
    pull(out[0] if isinstance(out, tuple) else out, what=f"{what} compile")
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        pull(out[0] if isinstance(out, tuple) else out, what=what)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1088)
    ap.add_argument("--detail", type=int, default=8)
    ap.add_argument("--what", default="full,gbuf,update,interp,pipe")
    ap.add_argument("--splits", type=int, default=1)
    ap.add_argument("--probe-bounces", type=int, default=1)
    ap.add_argument("--bounce2-splits", type=int, default=1)
    args = ap.parse_args()
    w, h = args.width, args.height

    import bench
    from raytracer3_tpu.ops.pallas import traverse_kernel as tk
    from raytracer3_tpu.render import gbuffer as gbuffer_mod
    from raytracer3_tpu.render import pipelines, probes
    from raytracer3_tpu.scene import procedural

    scene, tris = bench.sponza_world_scene(detail=args.detail)
    cam = procedural.atrium_camera(aspect=w / h)
    backend = tk.packet_backend(host_tris=tris)
    settings = RenderSettings(
        width=w, height=h, bounces=1, samples=1,
        probe_texel_splits=args.splits,
        probe_bounces=args.probe_bounces,
        probe_bounce2_splits=args.bounce2_splits,
    )
    what = set(args.what.split(","))
    print(f"{w}x{h} tris={tris[0].shape[0]}", flush=True)

    # --- shared stage inputs ---
    @jax.jit
    def gbuf_pass(scene_, bvh):
        isect, _ = backend.bind(bvh)
        packed, _ = probes.trace_packed_gbuffer(scene_, isect, cam, settings)
        return packed.data, packed.depth

    data, depth = gbuf_pass(scene, backend.arrays)
    pull(depth, "gbuf warm")

    if "gbuf" in what:
        t = timeit(gbuf_pass, scene, backend.arrays, what="gbuf")
        print(f"  gbuffer pass            : {t:8.1f} ms", flush=True)

    prev = probes.ProbeState.create(settings)

    @jax.jit
    def update_pass(scene_, bvh, data_, depth_, prev_):
        from raytracer3_tpu.render import camera as camera_mod

        isect, occl = backend.bind(bvh)
        packed = gbuffer_mod.PackedGBuffer(data=data_, depth=depth_)
        surface = gbuffer_mod.unpack_surface(packed)
        pix = camera_mod.pixel_grid(w, h)
        o, d = camera_mod.primary_rays(cam, w, h, pixel_xy=pix)
        dir_index, mip = probes.structured_importance_sampling(
            surface.normal, settings
        )
        state = probes.trace_probes(
            scene_, isect, packed.depth, surface.normal,
            o.reshape(h, w, 3), d.reshape(h, w, 3), dir_index, mip,
            prev_, settings, jnp.uint32(1), 0.15, occl,
        )
        state = probes.project_sh(state, settings)
        return state

    if "update" in what:
        state = update_pass(scene, backend.arrays, data, depth, prev)
        pull(state.atlas, "update warm")
        t = timeit(
            lambda *a: update_pass(*a).atlas,
            scene, backend.arrays, data, depth, prev, what="update",
        )
        print(f"  probe update (SIS+trace+SH): {t:5.1f} ms", flush=True)
    else:
        state = update_pass(scene, backend.arrays, data, depth, prev)

    if "interp" in what:
        @jax.jit
        def interp_fast(data_, depth_, st):
            packed = gbuffer_mod.PackedGBuffer(data=data_, depth=depth_)
            surface = gbuffer_mod.unpack_surface(packed)
            return probes._interpolate_probes_cells(
                packed.depth, surface.normal, surface.albedo,
                surface.emissive, st, settings,
            )

        @jax.jit
        def interp_generic(data_, depth_, st):
            packed = gbuffer_mod.PackedGBuffer(data=data_, depth=depth_)
            surface = gbuffer_mod.unpack_surface(packed)
            # Generic gather path, inlined from interpolate_probes pre-r5.
            gbuf_depth, gbuf_normal = packed.depth, surface.normal
            albedo, emissive = surface.albedo, surface.emissive
            from raytracer3_tpu.ops import mathx, sh

            px, py = settings.probe_grid
            sp = settings.probe_spacing
            ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
            p0x = jnp.clip(xs // sp, 0, px - 1)
            p0y = jnp.clip(ys // sp, 0, py - 1)
            fx = (xs - p0x * sp).astype(jnp.float32) / sp
            fy = (ys - p0y * sp).astype(jnp.float32) / sp
            contribs, weights = [], []
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
                    wgt = jnp.clip(
                        1.0 - jnp.abs(probe_depth - gbuf_depth)
                        / jnp.maximum(gbuf_depth, 1e-6), 0.0, 1.0)
                    wgt = wgt * jnp.maximum(
                        jnp.sum(gbuf_normal * probe_normal, -1), 0.0)
                    wgt = jnp.where(valid, (w_bil + 1e-3) * wgt**8, 0.0)
                    coeffs = st.sh_coeffs[pyc, pxc]
                    irr = sh.sh3_unproject_cos_lobe(coeffs, gbuf_normal)
                    contribs.append(jnp.maximum(irr, 0.0))
                    weights.append(wgt)
            wstack = jnp.stack(weights)
            wsum = jnp.sum(wstack, axis=0)
            failed = wsum <= 1e-8
            wnorm = wstack / jnp.maximum(wsum, 1e-8)
            irr = sum(c * wn[..., None] for c, wn in zip(contribs, wnorm))
            light = irr * albedo * mathx.INV_PI + emissive
            red = jnp.zeros_like(light).at[..., 0].set(1.0)
            light = jnp.where(failed[..., None], red, light)
            sky = gbuf_depth >= mathx.BACKGROUND_DEPTH
            return jnp.where(sky[..., None], 0.0, light)

        lf = interp_fast(data, depth, state)
        lg = interp_generic(data, depth, state)
        df = float(jnp.max(jnp.abs(lf - lg)))
        print(f"  interp fast-vs-generic max|d|: {df:.2e}", flush=True)
        t = timeit(interp_fast, data, depth, state, what="interp fast")
        print(f"  interpolate (cells)     : {t:8.1f} ms", flush=True)
        t = timeit(interp_generic, data, depth, state, what="interp generic")
        print(f"  interpolate (generic)   : {t:8.1f} ms", flush=True)

    if "pipe" in what:
        step, init_state = pipelines.probe_gi_pipeline(
            scene, settings, backend=backend
        )
        st = init_state()
        disp, st = step(st, cam=cam, frame_index=jnp.uint32(0))
        pull(disp, "pipe compile")
        t0 = time.perf_counter()
        for i in range(1, 4):
            disp, st = step(st, cam=cam, frame_index=jnp.uint32(i))
            pull(disp, "pipe frame")
        t = (time.perf_counter() - t0) / 3 * 1e3
        print(f"  FULL probe_gi step      : {t:8.1f} ms ({1e3 / t:.2f} fps)",
              flush=True)


if __name__ == "__main__":
    main()
