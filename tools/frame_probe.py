"""Full-frame variant timings on the real chip: isolates NEE shadow cost,
sorting benefit, and per-bounce scaling for the production wavefront path.

    python tools/frame_probe.py [--sublanes 256]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stub", action="store_true",
                    help="replace the intersector with a constant hit (measures everything-but-traversal)")
    ap.add_argument("--sublanes", type=int, default=512)
    ap.add_argument("--detail", type=int, default=2)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=544)
    args = ap.parse_args()

    from raytracer3_tpu.ops.pallas import traverse_kernel as tk
    from raytracer3_tpu.render import film as film_mod
    from raytracer3_tpu.render import wavefront
    from raytracer3_tpu.scene import procedural
    from raytracer3_tpu.utils import runtime
    from raytracer3_tpu.utils.config import RenderSettings

    runtime.init_compilation_cache()
    scene, host_tris = procedural.atrium_scene(detail=args.detail, return_host=True)
    cam = procedural.atrium_camera(aspect=args.width / args.height)
    _, _, pt = tk.make_packet_backend(
        scene, host_tris=host_tris, sublanes=args.sublanes
    )
    nt, ct = pt.node_table, pt.cluster_table

    def run(tag, bounces, nee, sort):
        settings = RenderSettings(
            width=args.width, height=args.height, bounces=bounces, samples=1,
            radiance_clamp=50.0,
        )

        @jax.jit
        def frame(scene_, nt_, ct_, film, fi):
            pt2 = pt._replace(node_table=nt_, cluster_table=ct_)

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
            else:
                def isect(o, d):
                    return tk.packet_intersect(pt2, o, d, sublanes=args.sublanes)

                def occl(o, d, tmax):
                    return tk.packet_intersect(
                        pt2, o, d, t_max=tmax, any_hit=True,
                        sublanes=args.sublanes,
                    ).hit

            radiance = wavefront.render_frame(
                scene_, cam, settings, fi, isect,
                occl if nee else None, sort_rays=sort,
            )
            return film_mod.accumulate_progressive(film, radiance)

        film = film_mod.Film.create(args.height, args.width)
        film = frame(scene, nt, ct, film, jnp.uint32(0))
        jax.block_until_ready(film.accum)
        t0 = time.perf_counter()
        reps = 3
        for i in range(1, reps + 1):
            film = frame(scene, nt, ct, film, jnp.uint32(i))
        jax.block_until_ready(film.accum)
        dt = (time.perf_counter() - t0) / reps
        n = args.width * args.height
        rays = n * (1 + (bounces - 1) + (bounces if nee else 0))
        print(f"{tag:26s}: {dt*1e3:8.1f} ms  {rays/dt/1e6:7.2f} Mray/s")

    run("full (4b, nee, sort)", 4, True, True)
    run("no sort", 4, True, False)
    run("no nee", 4, False, True)
    run("bounces=1", 1, True, True)
    run("bounces=2", 2, True, True)


if __name__ == "__main__":
    main()
