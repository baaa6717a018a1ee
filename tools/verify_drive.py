"""Verify-skill drive: render the flagship atrium through the production
backend (incl. the new TraceBackend.primary_fn presorted-primary path) on
the real TPU and write a PNG for inspection."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from raytracer3_tpu.ops.pallas import traverse_kernel as tk
from raytracer3_tpu.render import camera as camera_mod
from raytracer3_tpu.render import film as film_mod
from raytracer3_tpu.render import postprocess, wavefront
from raytracer3_tpu.scene import procedural
from raytracer3_tpu.utils import image as image_mod
from raytracer3_tpu.utils import runtime
from raytracer3_tpu.utils.config import RenderSettings


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--detail", type=int, default=2)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--out", default="/tmp/verify_r3.png")
    args = ap.parse_args()

    runtime.init_compilation_cache()
    w = h = args.size
    frames = args.frames
    scene, host = procedural.atrium_scene(detail=args.detail, return_host=True)
    cam = procedural.atrium_camera(aspect=w / h)
    # packet_backend auto-routes: VMEM whole-tree for small scenes,
    # treelet segment grid for Sponza-scale (detail >= ~6).
    backend = tk.packet_backend(scene, host_tris=host)
    settings = RenderSettings(width=w, height=h, bounces=4)
    isect, occl = backend.bind(backend.arrays)
    primary = backend.bind_primary(backend.arrays)

    @jax.jit
    def step(scene_, film, fi):
        radiance, traced = wavefront.render_frame(
            scene_, cam, settings, fi, isect, occl,
            sort_rays=not backend.self_sorting,
            return_stats=True, primary_fn=primary,
        )
        return film_mod.accumulate_progressive(film, radiance), traced

    film = film_mod.Film.create(h, w)
    t0 = time.perf_counter()
    for fi in range(frames):
        film, traced = step(scene, film, jnp.uint32(fi))
        n = int(traced)  # scalar pull forces the frame
        print(f"frame {fi}: traced {n} rays "
              f"({time.perf_counter()-t0:.1f}s cum)", flush=True)
    img = postprocess.postprocess(film.accum)
    image_mod.write_png(args.out, img)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
