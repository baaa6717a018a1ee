#!/usr/bin/env python3
"""Generate the stored visual ground-truth artifacts (the
``resources/refrence.png`` role — the reference ships a 1.3 MB saved render
as its visual oracle; the exact scene is unreproducible since the snapshot
strips the Sponza/EXR blobs, so the artifacts are OUR north-star scene).

Two artifacts, both rendered by the REFERENCE-MODE path tracer
(render/pathtracer.render_image — the ground-truth integrator ported from
shaders/old/refrence_mode.slang, a code path independent of the production
wavefront renderer):

- resources/ground_truth_atrium_720.png — the showcase: 300k-tri atrium
  (detail=8) at 1280x720, high spp, AgX-tonemapped. For eyeballing and
  release notes, like refrence.png.
- resources/oracle_atrium_192x108.npz — the TEST oracle: 19k-tri atrium
  (detail=2) at 192x108, raw float radiance at high spp. Small enough that
  the slow CPU test tier can re-render the same scene through the
  *production* pipelines (wavefront / probe / hybrid) and perceptual-diff
  against it (tests/test_ground_truth.py).

Run on the TPU (hours of CPU otherwise):
  python tools/make_ground_truth.py --spp 512          # both artifacts
  python tools/make_ground_truth.py --skip-720         # oracle only
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RES_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "resources"
)


def render_reference(scene, tris, cam, width, height, bounces, spp,
                     batch=8, seed0=0, cpu=False):
    """Accumulate `spp` reference-mode samples (render_image loops `samples`
    inside one jit; frames decorrelate via the frame index).

    cpu=True forces the CPU platform + the device-LBVH backend instead of
    the Pallas packet kernel — the oracle-sized config is CPU-feasible,
    keeping artifact generation independent of the (sometimes wedged)
    tunnel."""
    import jax
    import jax.numpy as jnp

    from raytracer3_tpu.render import pathtracer
    from raytracer3_tpu.utils import runtime
    from raytracer3_tpu.utils.config import RenderSettings

    settings = RenderSettings(
        width=width, height=height, bounces=bounces, samples=batch,
        radiance_clamp=50.0,
    )
    if cpu:
        from raytracer3_tpu.ops import traverse

        isect_c, occl_c, _ = traverse.make_bvh_backend(scene)

        @jax.jit
        def frame_cpu(scene_, fi):
            return pathtracer.render_image(
                scene_, cam, settings, fi, isect_c, occl_c
            )

        def run(fi):
            return frame_cpu(scene, fi)
    else:
        from raytracer3_tpu.ops.pallas import traverse_kernel as tk

        backend = tk.packet_backend(host_tris=tris)

        @jax.jit
        def frame_tpu(scene_, bvh, fi):
            isect, occl = backend.bind(bvh)
            return pathtracer.render_image(
                scene_, cam, settings, fi, isect, occl
            )

        def run(fi):
            return frame_tpu(scene, backend.arrays, fi)

    total = np.zeros((height, width, 3), np.float64)
    n_frames = max(1, spp // batch)
    for i in range(n_frames):
        img = run(jnp.uint32(seed0 + i))
        total += np.asarray(
            runtime.pull_guarded(img, timeout=2400.0, what=f"gt frame {i}")
        )
        if (i + 1) % 8 == 0 or i + 1 == n_frames:
            print(f"  frame {i + 1}/{n_frames}", file=sys.stderr, flush=True)
    return (total / n_frames).astype(np.float32)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--spp", type=int, default=512)
    ap.add_argument("--skip-720", action="store_true")
    ap.add_argument("--skip-oracle", action="store_true")
    ap.add_argument(
        "--v2", action="store_true",
        help="generate the round-5 v2 oracles instead: 384x216 (4x the v1 "
        "pixel count, so view-dependent GGX/texture-LOD errors stop "
        "vanishing into 4x4 blocks) + the GGX-stress camera view "
        "(procedural.atrium_camera_ggx - metal props + grazing floor)",
    )
    ap.add_argument(
        "--cpu", action="store_true",
        help="force the CPU platform + LBVH backend (oracle only; the 720p "
        "showcase stays TPU-tier)",
    )
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import bench

    os.makedirs(RES_DIR, exist_ok=True)

    from raytracer3_tpu.scene import procedural
    from raytracer3_tpu.utils import runtime

    runtime.init_compilation_cache()

    if args.v2:
        from raytracer3_tpu.scene import procedural as proc

        scene, tris = proc.atrium_scene(detail=2, return_host=True)
        for tag, cam_fn in (
            ("", proc.atrium_camera),
            ("ggx_", proc.atrium_camera_ggx),
        ):
            w2, h2 = 384, 216
            print(f"oracle v2: atrium(detail=2) {tag or 'default '}"
                  f"{w2}x{h2} reference mode", file=sys.stderr)
            img = render_reference(
                scene, tris, cam_fn(aspect=w2 / h2), w2, h2, bounces=4,
                spp=args.spp, cpu=args.cpu,
            )
            np.savez_compressed(
                os.path.join(RES_DIR, f"oracle_atrium_{tag}384x216.npz"),
                radiance=img.astype(np.float32),
                spp=np.int32(args.spp),
                bounces=np.int32(4),
                detail=np.int32(2),
                camera=tag or "default",
            )
            print(f"wrote resources/oracle_atrium_{tag}384x216.npz",
                  file=sys.stderr)
        return 0

    if not args.skip_oracle:
        print("oracle: atrium(detail=2) 192x108 reference mode", file=sys.stderr)
        scene, tris = procedural.atrium_scene(detail=2, return_host=True)
        cam = procedural.atrium_camera(aspect=192 / 108)
        img = render_reference(
            scene, tris, cam, 192, 108, bounces=4, spp=args.spp,
            cpu=args.cpu,
        )
        np.savez_compressed(
            os.path.join(RES_DIR, "oracle_atrium_192x108.npz"),
            radiance=img.astype(np.float32),
            spp=np.int32(args.spp),
            bounces=np.int32(4),
            detail=np.int32(2),
        )
        print("wrote resources/oracle_atrium_192x108.npz", file=sys.stderr)

    if not args.skip_720:
        print("showcase: atrium(detail=8) 1280x720 reference mode",
              file=sys.stderr)
        big_scene, big_tris = bench.sponza_world_scene(detail=8)
        cam = procedural.atrium_camera(aspect=1280 / 720)
        img = render_reference(
            big_scene, big_tris, cam, 1280, 720, bounces=4,
            spp=max(64, args.spp // 4), batch=4,
        )
        from raytracer3_tpu.render import postprocess
        from raytracer3_tpu.utils import image as im

        out = np.asarray(postprocess.postprocess(img))
        im.write_png(
            os.path.join(RES_DIR, "ground_truth_atrium_720.png"), out
        )
        print("wrote resources/ground_truth_atrium_720.png", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
