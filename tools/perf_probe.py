"""Traversal micro-benchmark: times packet_intersect alone on the atrium
scene for three ray populations (coherent primaries, sorted bounce-like
secondaries, shadow any-hit), so kernel changes can be measured without
paying a full-frame compile. Run on the real chip:

    python tools/perf_probe.py [--detail 2] [--sublanes 64] [--width 16]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--detail", type=int, default=2)
    ap.add_argument("--sublanes", type=int, default=64)
    ap.add_argument("--width", type=int, default=16)
    ap.add_argument("--leaf", type=int, default=12)
    ap.add_argument("--n", type=int, default=960 * 544)
    ap.add_argument("--stats", action="store_true")
    ap.add_argument("--hbm", action="store_true")
    args = ap.parse_args()

    from raytracer3_tpu.ops.pallas import traverse_kernel as tk
    from raytracer3_tpu.render import camera as camera_mod
    from raytracer3_tpu.render import wavefront
    from raytracer3_tpu.scene import procedural
    from raytracer3_tpu.utils import runtime

    runtime.init_compilation_cache()
    scene, (v0, v1, v2) = procedural.atrium_scene(
        detail=args.detail, return_host=True
    )
    print(f"tris={v0.shape[0]}")
    from raytracer3_tpu.ops import cluster_bvh as cb_mod

    t0 = time.perf_counter()
    cb = cb_mod.build_cluster_bvh_host(v0, v1, v2, args.leaf, width=args.width)
    pt = tk.pack_tables(cb)
    print(
        f"build={time.perf_counter()-t0:.2f}s nodes={pt.num_nodes} "
        f"clusters={pt.num_clusters} depth={pt.depth}"
    )

    cam = procedural.atrium_camera(aspect=960 / 544)
    w = 960
    h = args.n // w
    pix = wavefront.tiled_pixel_order(w, h) if (w % 128 == 0 and h % 64 == 0) else camera_mod.pixel_grid(w, h)
    o, d = camera_mod.primary_rays(
        cam, w, h, jitter=jnp.full((pix.shape[0], 2), 0.5), pixel_xy=pix
    )

    # Tables travel as jit ARGUMENTS: jit-closures over device arrays run
    # ~600x slower per dispatch on tunneled TPUs and degrade the whole
    # process (measured — see docs/ROADMAP.md).
    @jax.jit
    def isect(nt, ct, o_, d_):
        pt2 = pt._replace(node_table=nt, cluster_table=ct)
        return tk.packet_intersect(pt2, o_, d_, sublanes=args.sublanes, clusters_hbm=args.hbm)

    @jax.jit
    def occl_f(nt, ct, o_, d_, tm):
        pt2 = pt._replace(node_table=nt, cluster_table=ct)
        return tk.packet_intersect(
            pt2, o_, d_, t_max=tm, any_hit=True, sublanes=args.sublanes,
            clusters_hbm=args.hbm,
        ).hit

    nt, ct = pt.node_table, pt.cluster_table
    isect = functools.partial(isect, nt, ct)
    occl = functools.partial(occl_f, nt, ct)

    n = o.shape[0]
    dt = _time(isect, o, d)
    print(f"primary   : {dt*1e3:8.2f} ms  {n/dt/1e6:7.2f} Mray/s")

    # Bounce-like: random directions from the primary hits, coherence-sorted
    # by the wavefront key (the production path between bounces). All device
    # math — device→host pulls through the tunnel can cost minutes.
    hit = isect(o, d)
    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    alive = hit.hit
    hp = o + hit.t[:, None] * d
    origins2 = jnp.where(alive[:, None], hp, 1e30)

    q = wavefront.RayQueue(
        origin=origins2,
        direction=jnp.asarray(dirs),
        throughput=jnp.ones((n, 3)),
        radiance=jnp.zeros((n, 3)),
        pixel_id=jnp.arange(n, dtype=jnp.int32),
        alive=alive,
        prev_pdf=jnp.ones((n,)),
        depth=hit.t,
        prim_id=hit.prim_id,
        uv=hit.uv,
    )

    @jax.jit
    def sorted_trace(nt_, ct_, q_):
        pt2 = pt._replace(node_table=nt_, cluster_table=ct_)
        perm = jnp.argsort(wavefront._sort_key(q_))
        return tk.packet_intersect(
            pt2, q_.origin[perm], q_.direction[perm], sublanes=args.sublanes,
            clusters_hbm=args.hbm,
        )

    @jax.jit
    def unsorted_trace(nt_, ct_, q_):
        pt2 = pt._replace(node_table=nt_, cluster_table=ct_)
        return tk.packet_intersect(
            pt2, q_.origin, q_.direction, sublanes=args.sublanes,
            clusters_hbm=args.hbm,
        )

    dt = _time(sorted_trace, nt, ct, q)
    print(f"bounce+sort: {dt*1e3:7.2f} ms  {n/dt/1e6:7.2f} Mray/s")
    dt = _time(unsorted_trace, nt, ct, q)
    print(f"bounce raw : {dt*1e3:7.2f} ms  {n/dt/1e6:7.2f} Mray/s")

    # Shadow rays toward a fixed point light-ish target (any-hit).
    target = jnp.asarray([0.0, 8.0, 0.0])
    to_l = target[None, :] - hp
    dist = jnp.linalg.norm(to_l, axis=-1, keepdims=True)
    sd = to_l / jnp.maximum(dist, 1e-6)

    @jax.jit
    def shadow(nt_, ct_, q_, sd_, dist_):
        pt2 = pt._replace(node_table=nt_, cluster_table=ct_)
        perm = jnp.argsort(wavefront._sort_key(q_))
        return tk.packet_intersect(
            pt2, q_.origin[perm], sd_[perm], t_max=dist_[perm, 0] * 0.999,
            any_hit=True, sublanes=args.sublanes, clusters_hbm=args.hbm,
        ).hit

    dt = _time(shadow, nt, ct, q, sd, dist)
    print(f"shadow+sort: {dt*1e3:7.2f} ms  {n/dt/1e6:7.2f} Mray/s")

    if args.stats:
        n_groups = max(1, args.sublanes // tk.GROUP_ROWS)

        @jax.jit
        def st_primary(nt_, ct_, o_, d_):
            pt2 = pt._replace(node_table=nt_, cluster_table=ct_)
            return tk.packet_intersect(
                pt2, o_, d_, sublanes=args.sublanes, stats=True, clusters_hbm=args.hbm
            )[1]

        @jax.jit
        def st_bounce(nt_, ct_, q_):
            pt2 = pt._replace(node_table=nt_, cluster_table=ct_)
            perm = jnp.argsort(wavefront._sort_key(q_))
            return tk.packet_intersect(
                pt2, q_.origin[perm], q_.direction[perm],
                sublanes=args.sublanes, stats=True, clusters_hbm=args.hbm,
            )[1]

        @jax.jit
        def st_shadow(nt_, ct_, q_, sd_, dist_):
            pt2 = pt._replace(node_table=nt_, cluster_table=ct_)
            perm = jnp.argsort(wavefront._sort_key(q_))
            return tk.packet_intersect(
                pt2, q_.origin[perm], sd_[perm],
                t_max=dist_[perm, 0] * 0.999, any_hit=True,
                sublanes=args.sublanes, stats=True, clusters_hbm=args.hbm,
            )[1]

        import numpy as _np

        for tag, s in (
            ("primary", st_primary(nt, ct, o, d)),
            ("bounce+sort", st_bounce(nt, ct, q)),
            ("shadow+sort", st_shadow(nt, ct, q, sd, dist)),
        ):
            s = _np.asarray(jax.device_get(s)).astype(_np.float64)
            node_p, leaf_p, node_ga, leaf_ga = (
                s[:, 0], s[:, 1], s[:, 2], s[:, 3]
            )
            print(
                f"  stats {tag:11s}: node pops {node_p.mean():7.0f} "
                f"(act {node_ga.mean()/_np.maximum(node_p.mean(),1):5.2f}/{n_groups}) "
                f"leaf pops {leaf_p.mean():7.0f} "
                f"(act {leaf_ga.mean()/_np.maximum(leaf_p.mean(),1):5.2f}/{n_groups}) "
                f"of {pt.num_nodes}n/{pt.num_clusters}c"
            )


if __name__ == "__main__":
    main()
