"""Same-process sublanes A/B at prod flags (SAH clusters, bit-loop, 8-row
groups): 512 sublanes/64 groups vs 1024 sublanes/128 groups. Bigger
segments halve per-pop scalar amortization but coarsen candidate unions;
the 4-word-mask generalization (2026-08-19) makes 128 groups expressible.

    python tools/probe_sublanes.py [--detail 8] [--vmem-limit 64e6]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from perf_probe import _pull, _time  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--detail", type=int, default=8)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1088)
    ap.add_argument("--max-tris", type=int, default=98304)
    ap.add_argument("--leaf-size", type=int, default=24)
    ap.add_argument("--vmem-limit", type=float, default=64e6)
    ap.add_argument("--sublanes", default="512,1024")
    ap.add_argument("--density", type=int, default=1,
                    help="ray multiplier (bench runs x16)")
    args = ap.parse_args()
    vmem_limit = int(args.vmem_limit) or None

    from raytracer3_tpu.ops import treelets
    from raytracer3_tpu.render import camera as camera_mod
    from raytracer3_tpu.render import wavefront
    from raytracer3_tpu.scene import procedural
    from raytracer3_tpu.utils import runtime

    runtime.init_compilation_cache()
    w, h = args.width, args.height
    n = w * h * args.density
    scene, host = procedural.atrium_scene(detail=args.detail, return_host=True)
    cam = procedural.atrium_camera(aspect=w / h)
    tt = treelets.build_treelets_host(
        host[0], host[1], host[2], leaf_size=args.leaf_size,
        width=16, max_tris=args.max_tris, cluster_mode="sah",
    )
    nodes, clus, ab = tt.node_tables, tt.cluster_tables, tt.aabb
    print(f"tris={host[0].shape[0]} n={n} K={tt.num_treelets}", flush=True)

    # Host-built populations (device gathers pad 42x on this runtime).
    nprng = np.random.default_rng(23)
    lo = host[0].min(0)
    hi = host[0].max(0)
    o_h = nprng.uniform(lo, hi, (n, 3)).astype(np.float32)
    d_h = nprng.normal(size=(n, 3)).astype(np.float32)
    d_h /= np.linalg.norm(d_h, axis=1, keepdims=True)
    o_rand, d_rand = jnp.asarray(o_h), jnp.asarray(d_h)
    sun = np.array([0.3, 0.8, 0.5], np.float32)
    sun /= np.linalg.norm(sun)
    lights = nprng.uniform(lo, hi, (4, 3)).astype(np.float32)
    to_l = lights[nprng.integers(0, 4, n)] - o_h
    dist = np.linalg.norm(to_l, axis=1, keepdims=True)
    sun_m = nprng.random(n) < 0.5
    d_mix = jnp.asarray(
        np.where(sun_m[:, None], sun[None], to_l / np.maximum(dist, 1e-6))
    )
    t_mix = jnp.asarray(np.where(sun_m, 100.0, dist[:, 0] * 0.999), jnp.float32)
    BG = 100000.0
    tm_bg = jnp.full((n,), BG, jnp.float32)
    tile_pix = wavefront.tiled_pixel_order(w, h)
    o_tile, d_tile = camera_mod.primary_rays(cam, w, h, pixel_xy=tile_pix)

    for sl in [int(x) for x in args.sublanes.split(",")]:
        mg = max(32, sl // treelets.GROUP_ROWS)

        def isect_fn(presorted=False, any_hit=False, rank_push=False,
                     sl=sl, mg=mg):
            @jax.jit
            def f(nt, ct, ab_, o_, d_, tm):
                tt2 = tt._replace(node_tables=nt, cluster_tables=ct, aabb=ab_)
                hh = treelets.treelet_intersect(
                    tt2, o_, d_, t_max=tm, any_hit=any_hit, sublanes=sl,
                    presorted=presorted, half_leaf=True, rank_push=rank_push,
                    step_cull=True, vmem_limit=vmem_limit,
                    bit_loop=not presorted, max_groups=mg if not presorted
                    else 32,
                )
                return jnp.sum(hh.t) + jnp.sum(hh.prim_id)

            return f

        cases = [
            ("bounce", isect_fn(rank_push=True), o_rand, d_rand, tm_bg),
            ("occl mix", isect_fn(any_hit=True), o_rand, d_mix, t_mix),
            ("primary", isect_fn(presorted=True), o_tile, d_tile,
             jnp.full((w * h,), BG, jnp.float32)),
        ]
        for tag, f, o_, d_, tm in cases:
            try:
                dt = _time(f, nodes, clus, ab, o_, d_, tm, reps=3)
                nn = o_.shape[0]
                print(f"  sl{sl} {tag:10s}: {dt*1e3:8.1f} ms "
                      f"{nn/dt/1e6:6.2f} Mray/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  sl{sl} {tag:10s}: FAILED {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
