"""Headline benchmark: Mrays/s/chip for progressive path tracing.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline derivation (BASELINE.md): the reference publishes no numbers; the
north-star target is Sponza 1080p, 4-bounce path tracing, ≥30 progressive fps
on a v5e-8. That requires 1920*1088*(1 primary + 4 bounce rays)*30 fps / 8
chips ≈ 39.2 Mrays/s/chip of closest-hit throughput, which we use as the
vs_baseline denominator. Shadow (NEE) rays count as rays too.

Stage (BASELINE.json configs): currently config 1 — analytic Cornell box,
brute-force intersection, diffuse wavefront PT — at production resolution.
Later rounds move this to Sponza + LBVH (configs 2-4).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BASELINE_MRAYS_PER_CHIP = 1920 * 1088 * 5 * 30 / 8 / 1e6  # ≈ 39.17


def main() -> None:
    from raytracer3_tpu.ops import intersect
    from raytracer3_tpu.render import film as film_mod
    from raytracer3_tpu.render import pathtracer
    from raytracer3_tpu.scene import analytic
    from raytracer3_tpu.utils.config import RenderSettings

    width, height, bounces, samples = 512, 512, 4, 1

    scene = analytic.cornell_box()
    cam = analytic.default_camera()
    v0, v1, v2 = scene.tri_vertices()

    def isect(o, d):
        return intersect.intersect_bruteforce(o, d, v0, v1, v2)

    def occl(o, d, tmax):
        return intersect.occluded_bruteforce(o, d, v0, v1, v2, t_max=tmax)

    settings = RenderSettings(
        width=width, height=height, bounces=bounces, samples=samples,
        diffuse_only=True,
    )

    @jax.jit
    def frame(film, fi):
        radiance = pathtracer.render_image(scene, cam, settings, fi, isect, occl)
        return film_mod.accumulate_progressive(film, radiance)

    film = film_mod.Film.create(height, width)
    # Warmup / compile.
    film = frame(film, jnp.uint32(0))
    jax.block_until_ready(film.accum)

    n_frames = 10
    t0 = time.perf_counter()
    for i in range(1, n_frames + 1):
        film = frame(film, jnp.uint32(i))
    jax.block_until_ready(film.accum)
    dt = time.perf_counter() - t0

    # Rays per frame: 1 primary + per sample ((bounces-1) secondary closest-hit
    # + bounces NEE shadow rays).
    rays_per_pixel = 1 + samples * ((bounces - 1) + bounces)
    total_rays = width * height * rays_per_pixel * n_frames
    mrays = total_rays / dt / 1e6

    print(
        json.dumps(
            {
                "metric": "mrays_per_s_per_chip",
                "value": round(mrays, 3),
                "unit": "Mray/s",
                "vs_baseline": round(mrays / BASELINE_MRAYS_PER_CHIP, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
