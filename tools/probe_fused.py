"""On-chip A/B: fused shadow+bounce launches vs split launches.

fuse_shadow (render/wavefront.py fused_fn) trades the any-hit
resolved-segment early-skip for one driver sort instead of two and 2× ray
density per launch. Frame-level A/B on the north-star configs; prints one
JSON line per run (same fields as bench.run_config).

Usage: python tools/probe_fused.py [--detail 8] [--frames 3]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--detail", type=int, default=8)
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--samples", type=int, default=4)
    ap.add_argument("--config", default="both", choices=["both", "sponza1080", "sponza720"])
    args = ap.parse_args()

    from bench import run_config, sponza_world_scene
    from raytracer3_tpu.scene import procedural
    from raytracer3_tpu.utils import runtime

    runtime.init_compilation_cache()
    scene, tris = sponza_world_scene(detail=args.detail)
    cam1080 = procedural.atrium_camera(aspect=1920 / 1088)
    cam720 = procedural.atrium_camera(aspect=1280 / 720)
    configs = [
        ("sponza1080", cam1080, 1920, 1088, 4),
        ("sponza720", cam720, 1280, 720, 2),
    ]
    if args.config != "both":
        configs = [c for c in configs if c[0] == args.config]
    for tag, cam, w, h, b in configs:
        for fuse in (False, True):
            r = run_config(
                f"{tag}_fuse{int(fuse)}", scene, tris, cam, w, h, b,
                n_frames=args.frames, samples=args.samples, fuse_shadow=fuse,
            )
            print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
