"""Sample-batch density A/B through bench.run_config (the real bench path).

The density curve keeps paying under SAH clusters (bounce x8 5.55 -> x16
5.95 Mray/s, occl +13%; docs/ROADMAP.md 2026-08-19). OUTCOME of the first
ladder run (2026-08-20): sponza720 @ 32 spp (29.5M lanes) OOMs HBM at
compile — 16.33 G of 15.75 G, a long tail of ~112 MB fp32 [29.5M]-lane
temps (variadic sort operands, brdf fusions), NOT one fixable giant; the
ladder ends at 16 spp pending a lane-state diet (bf16/packed carries).
Compares spp_per_s, the honest convergence-rate metric.

    python tools/probe_spp.py --config sponza720 --samples 16 32
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="sponza720",
                    choices=["sponza720", "sponza1080"])
    ap.add_argument("--samples", type=int, nargs="+", default=[16, 32])
    ap.add_argument("--frames", type=int, default=2)
    args = ap.parse_args()

    from raytracer3_tpu.scene import procedural
    from raytracer3_tpu.utils import runtime

    runtime.init_compilation_cache()
    scene, tris = bench.sponza_world_scene(detail=8)
    if args.config == "sponza720":
        w, h, bounces = 1280, 720, 2
    else:
        w, h, bounces = 1920, 1088, 4
    cam = procedural.atrium_camera(aspect=w / h)
    for s in args.samples:
        r = bench.run_config(
            f"{args.config}@{s}spp", scene, tris, cam, w, h, bounces,
            n_frames=args.frames, samples=s,
        )
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
