"""Headline benchmark: Mrays/s/chip for progressive path tracing.

Prints ONE JSON line on stdout: {"metric", "value", "unit", "vs_baseline"}
for the headline workload, and writes every configuration's numbers to
BENCH_DETAILS.json (also echoed to stderr).

Baseline derivation (BASELINE.md): the reference publishes no numbers; the
north-star target is Sponza 1080p, 4-bounce path tracing, >=30 progressive
fps on a v5e-8 -> 1920*1088*(1 primary + 4 bounce)*30 / 8 chips ~= 39.2
Mrays/s/chip of closest-hit throughput (NEE shadow rays also count as rays).

Configs (BASELINE.json staging):
- headline  : procedural atrium (19k tris) + HDR sky, 4-bounce wavefront PT
              with NEE + RR + blue noise, 960x544 (round-1-comparable).
- sponza720 : Sponza-scale atrium (~300k tris, cluster table in HBM with
              per-leaf DMA) + HDR sky, blue noise, 2 bounces, 1280x720
              (BASELINE config 3; the EXR skybox blob is stripped from the
              reference snapshot, so the procedural sky plays its role).
- sponza1080: same scene, 4 bounces, 1920x1088 (BASELINE config 4 at the
              reference's exact 1920x1088 window, main.rs:61).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_MRAYS_PER_CHIP = 1920 * 1088 * 5 * 30 / 8 / 1e6  # ~= 39.17


def run_config(tag, scene, host_tris, cam, width, height, bounces, n_frames=3):
    from raytracer3_tpu.ops.pallas import traverse_kernel as tk
    from raytracer3_tpu.ops import rng as rng_mod
    from raytracer3_tpu.render import film as film_mod
    from raytracer3_tpu.render import wavefront
    from raytracer3_tpu.utils.config import RenderSettings

    backend = tk.packet_backend(host_tris=host_tris)
    settings = RenderSettings(
        width=width, height=height, bounces=bounces, samples=1,
        radiance_clamp=50.0,
    )
    blue_noise = jnp.asarray(rng_mod.generate_blue_noise(64))

    # Scene + BVH tables cross the jit boundary as ARGUMENTS - jit-closures
    # over device arrays pay a host round-trip per dispatch on tunneled TPU
    # runtimes (ops/backend.py).
    @jax.jit
    def frame(scene_, bvh, bn, film, fi):
        isect, occl = backend.bind(bvh)
        radiance = wavefront.render_frame(
            scene_, cam, settings, fi, isect, occl, sort_rays=True,
            blue_noise=bn,
        )
        return film_mod.accumulate_progressive(film, radiance)

    film = film_mod.Film.create(height, width)
    film = frame(scene, backend.arrays, blue_noise, film, jnp.uint32(0))
    jax.block_until_ready(film.accum)

    t0 = time.perf_counter()
    for i in range(1, n_frames + 1):
        film = frame(scene, backend.arrays, blue_noise, film, jnp.uint32(i))
    jax.block_until_ready(film.accum)
    dt = (time.perf_counter() - t0) / n_frames

    # Rays per pixel: 1 primary + (bounces-1) secondary closest-hit +
    # bounces NEE shadow rays.
    rays_per_pixel = 1 + (bounces - 1) + bounces
    mrays = width * height * rays_per_pixel / dt / 1e6
    return {
        "config": tag,
        "width": width,
        "height": height,
        "bounces": bounces,
        "tris": int(host_tris[0].shape[0]),
        "frame_ms": round(dt * 1e3, 1),
        "fps": round(1.0 / dt, 2),
        "mrays_per_s_per_chip": round(mrays, 3),
        "vs_baseline": round(mrays / BASELINE_MRAYS_PER_CHIP, 4),
    }


def main() -> None:
    from raytracer3_tpu.scene import procedural
    from raytracer3_tpu.utils import runtime

    runtime.init_compilation_cache()

    results = []
    scene, tris = procedural.atrium_scene(detail=2, return_host=True)
    cam = procedural.atrium_camera(aspect=960 / 544)
    results.append(run_config("headline", scene, tris, cam, 960, 544, 4))

    big_scene, big_tris = procedural.atrium_scene(detail=8, return_host=True)
    cam720 = procedural.atrium_camera(aspect=1280 / 720)
    results.append(
        run_config("sponza720", big_scene, big_tris, cam720, 1280, 720, 2)
    )
    cam1080 = procedural.atrium_camera(aspect=1920 / 1088)
    results.append(
        run_config("sponza1080", big_scene, big_tris, cam1080, 1920, 1088, 4)
    )

    with open("BENCH_DETAILS.json", "w") as f:
        json.dump(results, f, indent=1)
    for r_ in results:
        print(json.dumps(r_), file=sys.stderr)

    head = results[0]
    print(
        json.dumps(
            {
                "metric": "mrays_per_s_per_chip",
                "value": head["mrays_per_s_per_chip"],
                "unit": "Mray/s",
                "vs_baseline": head["vs_baseline"],
            }
        )
    )


if __name__ == "__main__":
    main()
