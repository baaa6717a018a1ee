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
    runtime.init_compilation_cache()
    w = h = 512
    frames = 8
    scene, host = procedural.atrium_scene(detail=2, return_host=True)
    cam = procedural.atrium_camera(aspect=w / h)
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
    image_mod.write_png("/tmp/verify_r3.png", img)
    print("wrote /tmp/verify_r3.png", flush=True)


if __name__ == "__main__":
    main()
