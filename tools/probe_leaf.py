"""Leaf-size ladder at production treelet config (98k, SAH, 512 sublanes).

leaf24 beat leaf12 on every population at 98k (docs/ROADMAP.md 2026-08-18):
bigger leaves trade node pops for wider Möller activations, and the leaf
vector work is half-predicated at 8-row granularity. This probes whether the
ladder keeps paying at 32/48 (rows grow to 384/512 lanes; cluster bytes stay
~flat because the row count halves). Same-process A/B: all configs in one
run, bounce + mixed-occlusion + primary populations.

    python tools/probe_leaf.py [--leaves 24,32,48] [--max-tris 98304]
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
    ap.add_argument("--sublanes", type=int, default=512)
    ap.add_argument("--max-tris", type=int, default=98304)
    ap.add_argument("--bvh-width", type=int, default=16)
    # NOTE: the native cluster builder median-bisects until <= leaf_size, so
    # cluster counts are powers of two — at 98304-tri treelets leaf 32 yields
    # the SAME 4096x24 clustering as leaf 24 (rows padded to 32 for nothing).
    # The real ladder is 24 -> 48 -> 96.
    ap.add_argument("--leaves", default="24,48")
    ap.add_argument("--vmem-limit", type=float, default=32e6)
    ap.add_argument("--bw", action="store_true",
                    help="Baldwin–Weber cluster rows (precomputed plane + "
                         "projection constants; ~38 vs ~49 VPU ops/tri)")
    ap.add_argument("--bit-loop", action="store_true")
    ap.add_argument("--max-groups", type=int, default=32)
    ap.add_argument("--cluster-mode", default="median",
                    help="median | sah (SAH-split clusters: 1.8x lower "
                         "cluster SA on the 300k atrium)")
    ap.add_argument("--split-budget", type=float, default=0.0,
                    help="SBVH spatial-split fragment budget (fraction of "
                         "extra fragments, e.g. 0.3)")
    args = ap.parse_args()
    vmem_limit = int(args.vmem_limit) or None

    from raytracer3_tpu.ops import treelets
    from raytracer3_tpu.render import camera as camera_mod
    from raytracer3_tpu.render import wavefront
    from raytracer3_tpu.scene import procedural
    from raytracer3_tpu.utils import runtime

    runtime.init_compilation_cache()
    w, h = args.width, args.height
    n = w * h
    scene, host = procedural.atrium_scene(detail=args.detail, return_host=True)
    cam = procedural.atrium_camera(aspect=w / h)

    key = jax.random.PRNGKey(0)
    kp = jax.random.split(key, 6)
    tile_pix = wavefront.tiled_pixel_order(w, h)
    o_tile, d_tile = camera_mod.primary_rays(cam, w, h, pixel_xy=tile_pix)
    lo = np.asarray(jnp.min(scene.positions, axis=0))
    hi = np.asarray(jnp.max(scene.positions, axis=0))
    o_rand = jax.random.uniform(
        kp[0], (n, 3), minval=jnp.asarray(lo), maxval=jnp.asarray(hi)
    )
    d_rand = jax.random.normal(kp[1], (n, 3))
    d_rand = d_rand / jnp.linalg.norm(d_rand, axis=1, keepdims=True)
    sun = jnp.asarray([0.3, 0.8, 0.5])
    sun = sun / jnp.linalg.norm(sun)
    d_sun = jnp.broadcast_to(sun, (n, 3))
    lights = jax.random.uniform(
        kp[2], (4, 3), minval=jnp.asarray(lo), maxval=jnp.asarray(hi)
    )
    pick = jax.random.randint(kp[3], (n,), 0, 4)
    to_l = lights[pick] - o_rand
    dist = jnp.linalg.norm(to_l, axis=1, keepdims=True)
    d_point = to_l / jnp.maximum(dist, 1e-6)
    use_sun = jax.random.uniform(kp[4], (n,)) < 0.5
    d_mix = jnp.where(use_sun[:, None], d_sun, d_point)
    t_mix = jnp.where(use_sun, 100.0, dist[:, 0] * 0.999)
    BG = 100000.0
    tm_bg = jnp.full((n,), BG, jnp.float32)

    cases_cfg = [
        (ls, cm)
        for ls in [int(x) for x in args.leaves.split(",")]
        for cm in args.cluster_mode.split(",")
    ]
    for ls, cmode in cases_cfg:
        t0 = time.perf_counter()
        tt = treelets.build_treelets_host(
            host[0], host[1], host[2], leaf_size=ls,
            width=args.bvh_width, max_tris=args.max_tris, bw_leaf=args.bw,
            cluster_mode=cmode, split_budget=args.split_budget,
        )
        tbytes = (tt.node_tables.nbytes + tt.cluster_tables.nbytes) / 1e6
        print(
            f"-- leaf {ls} {cmode}: K={tt.num_treelets} mt={tt.max_nodes} "
            f"ct={tt.max_clusters} tables={tbytes:.1f}MB "
            f"build={time.perf_counter()-t0:.1f}s",
            flush=True,
        )
        nodes, clus, ab = tt.node_tables, tt.cluster_tables, tt.aabb

        def isect_fn(presorted=False, any_hit=False, rank_push=False,
                     tt=tt):
            @jax.jit
            def f(nt, ct, ab_, o_, d_, tm):
                tt2 = tt._replace(
                    node_tables=nt, cluster_tables=ct, aabb=ab_
                )
                hh = treelets.treelet_intersect(
                    tt2, o_, d_, t_max=tm, any_hit=any_hit,
                    sublanes=args.sublanes, presorted=presorted,
                    half_leaf=True, rank_push=rank_push, step_cull=True,
                    vmem_limit=vmem_limit, bit_loop=args.bit_loop,
                    max_groups=args.max_groups,
                )
                return jnp.sum(hh.t) + jnp.sum(hh.prim_id)

            return f

        cases = [
            ("bounce", isect_fn(rank_push=True), o_rand, d_rand, tm_bg),
            ("occl mix", isect_fn(any_hit=True), o_rand, d_mix, t_mix),
            ("primary", isect_fn(presorted=True), o_tile, d_tile, tm_bg),
        ]
        for tag, f, o_, d_, tm in cases:
            try:
                dt = _time(f, nodes, clus, ab, o_, d_, tm, reps=3)
                print(
                    f"  leaf{ls} {tag:10s}: {dt*1e3:8.1f} ms "
                    f"{n/dt/1e6:6.2f} Mray/s",
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001 — VMEM OOM etc
                print(f"  leaf{ls} {tag:10s}: FAILED {str(e)[:200]}",
                      flush=True)


if __name__ == "__main__":
    main()
