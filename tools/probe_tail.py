"""Same-process A/B of the tail any-hit bounce (wavefront.tail_anyhit):
the last bounce's closest-hit launch only feeds the escape/env test, so an
any-hit launch (fused with the final NEE shadow batch) should replace it.
Expected: ~(bounce_ms - occl_ms) - one driver sort saved, per frame.

    python tools/probe_tail.py --detail 8 --width 1920 --height 1088 --samples 8
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from perf_probe import _time  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--detail", type=int, default=8)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1088)
    ap.add_argument("--samples", type=int, default=8)
    ap.add_argument("--bounces", type=int, default=4)
    args = ap.parse_args()

    from raytracer3_tpu.ops import treelets
    from raytracer3_tpu.render import film as film_mod
    from raytracer3_tpu.render import wavefront
    from raytracer3_tpu.scene import procedural
    from raytracer3_tpu.utils import runtime
    from raytracer3_tpu.utils.config import RenderSettings

    runtime.init_compilation_cache()
    w, h = args.width, args.height
    scene, host = procedural.atrium_scene(detail=args.detail, return_host=True)
    cam = procedural.atrium_camera(aspect=w / h)
    print(f"tris={host[0].shape[0]} rays/bounce={w*h*args.samples}", flush=True)

    backend = treelets.treelet_backend(host_tris=host)
    settings = RenderSettings(
        width=w, height=h, bounces=args.bounces, samples=args.samples,
        sample_batch=args.samples > 1, radiance_clamp=50.0,
    )

    def frame_fn(tail):
        @jax.jit
        def frame(scene_, bvh, film, fi):
            isect, occl = backend.bind(bvh)
            radiance, traced = wavefront.render_frame(
                scene_, cam, settings, fi, isect, occl,
                sort_rays=False, return_stats=True,
                primary_fn=backend.bind_primary(bvh), tail_anyhit=tail,
            )
            return film_mod.accumulate_progressive(film, radiance), traced

        def call(fi):
            film = film_mod.Film.create(h, w)
            out, traced = frame(scene, backend.arrays, film, jnp.uint32(fi))
            return traced

        return call

    for tag, tail in [("tail OFF", False), ("tail ON ", True)]:
        f = frame_fn(tail)
        dt = _time(f, 0, reps=2)
        print(f"frame {tag}: {dt*1e3:9.1f} ms", flush=True)


if __name__ == "__main__":
    main()
