"""Full-frame variant timings on the real chip: isolates NEE shadow cost,
sorting benefit, per-bounce scaling, and — via --stub — everything-but-
traversal (driver/frame-side) cost for the production wavefront path.

Uses the same backend construction as bench.py (tk.packet_backend, which
auto-routes VMEM-oversized scenes to the treelet segment grid), the same
sample batching, and the same arrays-as-arguments jit discipline, so
real − stub is a direct attribution of the bench configs.

    python tools/frame_probe.py --width 1920 --height 1088 --detail 8 \
        --samples 4 [--stub]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stub", action="store_true",
                    help="replace the intersector with constant hits "
                         "(measures everything-but-traversal)")
    ap.add_argument("--detail", type=int, default=2,
                    help="atrium detail (2 = 19k tris headline, 8 = 300k sponza-scale)")
    ap.add_argument("--samples", type=int, default=1,
                    help=">1 batches samples into one wavefront (bench parity)")
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=544)
    ap.add_argument("--fuse", action="store_true",
                    help="fused shadow+bounce launches (RenderSettings.fuse_shadow)")
    args = ap.parse_args()

    from raytracer3_tpu.ops import rng as rng_mod
    from raytracer3_tpu.ops.pallas import traverse_kernel as tk
    from raytracer3_tpu.render import film as film_mod
    from raytracer3_tpu.render import wavefront
    from raytracer3_tpu.scene import procedural
    from raytracer3_tpu.utils import runtime
    from raytracer3_tpu.utils.config import RenderSettings

    runtime.init_compilation_cache()
    scene, host_tris = procedural.atrium_scene(
        detail=args.detail, return_host=True
    )
    cam = procedural.atrium_camera(aspect=args.width / args.height)
    backend = tk.packet_backend(host_tris=host_tris)
    blue_noise = jnp.asarray(rng_mod.generate_blue_noise(64))

    def run(tag, bounces, nee, sort):
        settings = RenderSettings(
            width=args.width, height=args.height, bounces=bounces,
            samples=args.samples, sample_batch=args.samples > 1,
            radiance_clamp=50.0, fuse_shadow=args.fuse,
        )

        @jax.jit
        def frame(scene_, bvh, bn, film, fi):
            if args.stub:
                from raytracer3_tpu.ops import intersect as isect_mod

                def isect(o, d):
                    t = jnp.abs(o[:, 0]) * 0.01 + 1.0
                    return isect_mod.Hit(
                        t=t, uv=jnp.abs(d[:, :2]) * 0.3,
                        prim_id=(o[:, 1] * 7).astype(jnp.int32) % 1000,
                        hit=o[:, 0] < 1e20,
                    )

                def occl(o, d, tmax):
                    return (o[:, 0] + d[:, 0]) * 0.0 > 1.0

                primary_fn = None
                fused_fn = None
                sort_lanes = sort
            else:
                isect, occl = backend.bind(bvh)
                primary_fn = backend.bind_primary(bvh)
                fused_fn = (
                    backend.bind_capped(bvh) if settings.fuse_shadow else None
                )
                # treelet backends sort internally; honor --no-sort only
                # for the stub (driver-side) measurement.
                sort_lanes = sort and not backend.self_sorting
            radiance, traced = wavefront.render_frame(
                scene_, cam, settings, fi, isect,
                occl if nee else None, sort_rays=sort_lanes,
                blue_noise=bn, return_stats=True, primary_fn=primary_fn,
                fused_fn=fused_fn,
            )
            return film_mod.accumulate_progressive(film, radiance), traced

        bvh = backend.arrays  # unused under --stub (XLA drops dead args)
        film = film_mod.Film.create(args.height, args.width)
        film, traced = frame(scene, bvh, blue_noise, film, jnp.uint32(0))
        runtime.pull_guarded(traced, timeout=2400.0, what=f"{tag} compile")
        t0 = time.perf_counter()
        reps = 3
        measured = 0
        for i in range(1, reps + 1):
            film, traced = frame(scene, bvh, blue_noise, film, jnp.uint32(i))
            measured += int(
                runtime.pull_guarded(traced, timeout=900.0, what=f"{tag} rep")
            )
        dt = (time.perf_counter() - t0) / reps
        n = args.width * args.height * args.samples
        nominal = n * (1 + (bounces - 1) + (bounces if nee else 0))
        mrays = measured / reps / dt / 1e6
        print(
            f"{tag:26s}: {dt*1e3:8.1f} ms  {mrays:7.2f} Mray/s measured "
            f"({nominal/dt/1e6:7.2f} nominal)",
            flush=True,
        )

    run("full (4b, nee, sort)", 4, True, True)
    run("no nee", 4, False, True)
    run("bounces=1", 1, True, True)
    run("bounces=2", 2, True, True)
    if args.stub:
        run("stub no sort", 4, True, False)


if __name__ == "__main__":
    main()
