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


def _pull(out):
    """Force execution with a SCALAR device→host pull. block_until_ready on
    axon can return before the computation has even been dispatched (measured:
    a 78 s first execution 'blocked' in 3 ms), so every timing must end in a
    value pull; a scalar keeps the tunnel transfer negligible."""
    import jax.numpy as jnp
    import numpy as np

    leaf = jax.tree.leaves(out)[0]
    return np.asarray(jnp.sum(leaf))


def _time(fn, *args, reps=5):
    _pull(fn(*args))  # warmup: compile + first real execution
    t0 = time.perf_counter()
    for _ in range(reps):
        _pull(fn(*args))  # per-rep pull: dispatch itself can defer on axon
    return (time.perf_counter() - t0) / reps


def run_treelet(args, v0, v1, v2):
    """Treelet segment-grid path (ops/treelets.py): primary / sorted-bounce /
    shadow timings on the real chip."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from raytracer3_tpu.ops import treelets
    from raytracer3_tpu.render import camera as camera_mod
    from raytracer3_tpu.render import wavefront
    from raytracer3_tpu.scene import procedural

    t0 = time.perf_counter()
    tt = treelets.build_treelets_host(
        v0, v1, v2, args.leaf, width=args.width, max_tris=args.max_tris
    )
    print(
        f"build={time.perf_counter()-t0:.2f}s K={tt.num_treelets} "
        f"mt={tt.max_nodes} ct={tt.max_clusters} depth={tt.depth}"
    )
    meta = tt._replace(node_tables=None, cluster_tables=None, aabb=None)
    arrs = (tt.node_tables, tt.cluster_tables, tt.aabb)
    k = tt.num_treelets

    cam = procedural.atrium_camera(aspect=960 / 544)
    w = 960
    h = args.n // w
    pix = (
        wavefront.tiled_pixel_order(w, h)
        if (w % 128 == 0 and h % 64 == 0)
        else camera_mod.pixel_grid(w, h)
    )
    o, d = camera_mod.primary_rays(
        cam, w, h, jitter=jnp.full((pix.shape[0], 2), 0.5), pixel_xy=pix
    )

    # TWO compiled programs serve every measurement (compiles cost minutes
    # through this runtime): closest-hit with per-ray t_max + TRACED e_cap,
    # and the any-hit twin.
    @jax.jit
    def isect(nt, ct, ab, o_, d_, tm, ecap):
        tt2 = meta._replace(node_tables=nt, cluster_tables=ct, aabb=ab)
        return treelets.treelet_intersect(
            tt2, o_, d_, t_max=tm, sublanes=args.sublanes, e_cap=ecap
        )

    @jax.jit
    def occl(nt, ct, ab, o_, d_, tm, ecap):
        tt2 = meta._replace(node_tables=nt, cluster_tables=ct, aabb=ab)
        return treelets.treelet_intersect(
            tt2, o_, d_, t_max=tm, any_hit=True, sublanes=args.sublanes,
            e_cap=ecap,
        ).hit

    if args.rounds:
        @jax.jit
        def isect_r(nt, ct, ab, o_, d_, tm):
            tt2 = meta._replace(node_tables=nt, cluster_tables=ct, aabb=ab)
            return treelets.treelet_intersect_rounds(
                tt2, o_, d_, t_max=tm, sublanes=args.sublanes
            )

        @jax.jit
        def occl_r(nt, ct, ab, o_, d_, tm):
            tt2 = meta._replace(node_tables=nt, cluster_tables=ct, aabb=ab)
            return treelets.treelet_intersect_rounds(
                tt2, o_, d_, t_max=tm, any_hit=True, sublanes=args.sublanes
            ).hit

    n = o.shape[0]
    full = jnp.int32(k)
    pcap = jnp.full((n,), 1e5, jnp.float32)
    if args.rounds:
        dt = _time(functools.partial(isect_r, *arrs), o, d, pcap)
        print(f"primary  R: {dt*1e3:8.2f} ms  {n/dt/1e6:7.2f} Mray/s", flush=True)
        hit = isect_r(*arrs, o, d, pcap)
        rng = np.random.default_rng(0)
        dirs = rng.normal(size=(n, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        alive = hit.hit
        hp = o + hit.t[:, None] * d
        origins2 = jnp.where(alive[:, None], hp, 1e30)
        dirs = jnp.asarray(dirs)
        cap = jnp.where(alive, 1e5, 0.0)
        dt = _time(functools.partial(isect_r, *arrs), origins2, dirs, cap)
        print(f"bounce   R: {dt*1e3:8.2f} ms  {n/dt/1e6:7.2f} Mray/s", flush=True)
        target = jnp.asarray([0.0, 8.0, 0.0])
        to_l = target[None, :] - hp
        dist = jnp.linalg.norm(to_l, axis=-1, keepdims=True)
        sd = to_l / jnp.maximum(dist, 1e-6)
        scap = jnp.where(alive, dist[:, 0] * 0.999, 0.0)
        dt = _time(functools.partial(occl_r, *arrs), origins2, sd, scap)
        print(f"shadow   R: {dt*1e3:8.2f} ms  {n/dt/1e6:7.2f} Mray/s", flush=True)
        return

    dt = _time(functools.partial(isect, *arrs), o, d, pcap, full)
    print(f"primary   : {dt*1e3:8.2f} ms  {n/dt/1e6:7.2f} Mray/s", flush=True)

    hit = isect(*arrs, o, d, pcap, full)
    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    alive = hit.hit
    hp = o + hit.t[:, None] * d
    origins2 = jnp.where(alive[:, None], hp, 1e30)
    dirs = jnp.asarray(dirs)
    # Dead lanes park via t_max=0 (the wavefront convention).
    cap = jnp.where(alive, 1e5, 0.0)

    dt = _time(functools.partial(isect, *arrs), origins2, dirs, cap, full)
    print(f"bounce    : {dt*1e3:8.2f} ms  {n/dt/1e6:7.2f} Mray/s", flush=True)

    target = jnp.asarray([0.0, 8.0, 0.0])
    to_l = target[None, :] - hp
    dist = jnp.linalg.norm(to_l, axis=-1, keepdims=True)
    sd = to_l / jnp.maximum(dist, 1e-6)
    scap = jnp.where(alive, dist[:, 0] * 0.999, 0.0)
    dt = _time(functools.partial(occl, *arrs), origins2, sd, scap, full)
    print(f"shadow    : {dt*1e3:8.2f} ms  {n/dt/1e6:7.2f} Mray/s", flush=True)

    # e_cap sweep on the SAME compiled program: cap 0 = pure grid/driver
    # overhead (every step skipped), rising caps show how time tracks the
    # candidate-union depth. (Hits drop below the true union — diagnostic.)
    for cap_i in (0, 1, 2, 4, 8, 16):
        if cap_i >= k:
            break
        dt = _time(
            functools.partial(isect, *arrs), origins2, dirs, cap,
            jnp.int32(cap_i), reps=3,
        )
        print(f"  bounce e_cap={cap_i:2d}: {dt*1e3:8.2f} ms", flush=True)

    if args.stats:
        @jax.jit
        def stats_fn(nt, ct, ab, oo, dd, cc):
            tt2 = meta._replace(node_tables=nt, cluster_tables=ct, aabb=ab)
            _, srows = treelets.treelet_intersect(
                tt2, oo, dd, t_max=cc, sublanes=args.sublanes, stats=True
            )
            return jnp.sum(srows, axis=0)

        for tag, oo, dd, cc in (
            ("primary", o, d, pcap),
            ("bounce", origins2, dirs, cap),
        ):
            s = np.asarray(stats_fn(*arrs, oo, dd, cc)).astype(np.float64)
            segs = (n + args.sublanes * 128 - 1) // (args.sublanes * 128)
            print(
                f"  stats {tag:8s}: /seg node pops {s[0]/segs:7.0f} "
                f"(act {s[2]/max(s[0],1):5.2f}) leaf pops {s[1]/segs:7.0f} "
                f"(act {s[3]/max(s[1],1):5.2f}) live steps {s[4]/segs:5.1f}",
                flush=True,
            )

        @jax.jit
        def layout_fn(ab, oo, dd, cc):
            return treelets.treelet_layout_stats(
                tt._replace(aabb=ab), oo, dd, cc, sublanes=args.sublanes
            )

        for tag, oo, dd, cc in (
            ("primary", o, d, pcap),
            ("bounce", origins2, dirs, cap),
            ("shadow", origins2, sd, scap),
        ):
            st = {
                k_: np.asarray(v)
                for k_, v in layout_fn(tt.aabb, oo, dd, cc).items()
            }
            print(
                f"  layout {tag:8s}: cand {st['cand_mean']:.2f}/{st['cand_max']} "
                f"union {st['union_mean']:.2f}/{st['union_max']} "
                f"steps {st['steps']} segs {st['segments']}",
                flush=True,
            )

    if args.sweep:
        for mtris in (32768, 65536):
            t0 = time.perf_counter()
            tt2 = treelets.build_treelets_host(
                v0, v1, v2, args.leaf, width=args.width, max_tris=mtris
            )
            meta2 = tt2._replace(
                node_tables=None, cluster_tables=None, aabb=None
            )
            arrs2 = (tt2.node_tables, tt2.cluster_tables, tt2.aabb)
            print(
                f"-- max_tris={mtris}: build={time.perf_counter()-t0:.1f}s "
                f"K={tt2.num_treelets} ct={tt2.max_clusters}"
            )

            @jax.jit
            def bounce2(nt, ct, ab, o_, d_, tm):
                tt3 = meta2._replace(
                    node_tables=nt, cluster_tables=ct, aabb=ab
                )
                return treelets.treelet_intersect(
                    tt3, o_, d_, t_max=tm, sublanes=args.sublanes
                )

            @jax.jit
            def occl2(nt, ct, ab, o_, d_, tm):
                tt3 = meta2._replace(
                    node_tables=nt, cluster_tables=ct, aabb=ab
                )
                return treelets.treelet_intersect(
                    tt3, o_, d_, t_max=tm, any_hit=True,
                    sublanes=args.sublanes,
                ).hit

            dt = _time(
                functools.partial(bounce2, *arrs2), origins2, dirs, cap
            )
            print(f"bounce    : {dt*1e3:8.2f} ms  {n/dt/1e6:7.2f} Mray/s")
            dt = _time(
                functools.partial(occl2, *arrs2), origins2, sd, scap
            )
            print(f"shadow    : {dt*1e3:8.2f} ms  {n/dt/1e6:7.2f} Mray/s")


def main():
    import faulthandler

    # Periodic stack dumps: device waits on this runtime can silently hang
    # for minutes; the dump shows *which* call is waiting.
    faulthandler.dump_traceback_later(180, repeat=True)
    ap = argparse.ArgumentParser()
    ap.add_argument("--detail", type=int, default=2)
    ap.add_argument("--sublanes", type=int, default=64)
    ap.add_argument("--width", type=int, default=16)
    ap.add_argument("--leaf", type=int, default=12)
    ap.add_argument("--n", type=int, default=960 * 544)
    ap.add_argument("--stats", action="store_true")
    ap.add_argument("--hbm", action="store_true")
    ap.add_argument("--treelet", action="store_true")
    ap.add_argument("--max-tris", type=int, default=32768)
    ap.add_argument("--sweep", action="store_true")
    ap.add_argument("--rounds", action="store_true")
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

    if args.treelet:
        return run_treelet(args, v0, v1, v2)

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
