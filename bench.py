"""Headline benchmark: Mrays/s/chip for progressive path tracing.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline derivation (BASELINE.md): the reference publishes no numbers; the
north-star target is Sponza 1080p, 4-bounce path tracing, ≥30 progressive fps
on a v5e-8 → 1920*1088*(1 primary + 4 bounce)*30 / 8 chips ≈ 39.2
Mrays/s/chip of closest-hit throughput (NEE shadow rays also count as rays).

Workload (BASELINE.json config 3 stage): the procedural atrium (Sponza
stand-in, ~19k tris) + HDR sky, 4-bounce wavefront PT with NEE + Russian
roulette, 960×544, traced through the Pallas packet-traversal kernel over the
SAH cluster BVH.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BASELINE_MRAYS_PER_CHIP = 1920 * 1088 * 5 * 30 / 8 / 1e6  # ≈ 39.17

WIDTH, HEIGHT, BOUNCES, SAMPLES = 960, 544, 4, 1
N_FRAMES = 4


def main() -> None:
    from raytracer3_tpu.ops.pallas import traverse_kernel as tk
    from raytracer3_tpu.utils import runtime

    runtime.init_compilation_cache()
    from raytracer3_tpu.render import film as film_mod
    from raytracer3_tpu.render import wavefront
    from raytracer3_tpu.scene import procedural
    from raytracer3_tpu.utils.config import RenderSettings

    scene, host_tris = procedural.atrium_scene(detail=2, return_host=True)
    cam = procedural.atrium_camera(aspect=WIDTH / HEIGHT)
    backend = tk.packet_backend(host_tris=host_tris)

    settings = RenderSettings(
        width=WIDTH, height=HEIGHT, bounces=BOUNCES, samples=SAMPLES,
        radiance_clamp=50.0,
    )

    # Scene + BVH tables cross the jit boundary as ARGUMENTS — jit-closures
    # over device arrays cost a host round-trip per dispatch on tunneled
    # TPU runtimes (ops/backend.py).
    @jax.jit
    def frame(scene_, bvh, film, fi):
        isect, occl = backend.bind(bvh)
        radiance = wavefront.render_frame(
            scene_, cam, settings, fi, isect, occl, sort_rays=True
        )
        return film_mod.accumulate_progressive(film, radiance)

    film = film_mod.Film.create(HEIGHT, WIDTH)
    film = frame(scene, backend.arrays, film, jnp.uint32(0))
    jax.block_until_ready(film.accum)

    t0 = time.perf_counter()
    for i in range(1, N_FRAMES + 1):
        film = frame(scene, backend.arrays, film, jnp.uint32(i))
    jax.block_until_ready(film.accum)
    dt = time.perf_counter() - t0

    # Rays per pixel: 1 primary + per sample ((bounces-1 secondary closest-hit
    # after the primary) + bounces NEE shadow rays + RR-surviving tail).
    rays_per_pixel = 1 + SAMPLES * ((BOUNCES - 1) + BOUNCES)
    total_rays = WIDTH * HEIGHT * rays_per_pixel * N_FRAMES
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
