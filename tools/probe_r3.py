"""Round-3 treelet driver/kernel experiments at full-frame ray counts
(2.09M). Measures, on the real chip:

  - presorted primaries (tile order, skip the driver sort)
  - chunked sorting (sort_chunk g) for shadow + bounce populations
  - any-hit on incoherent rays
  - kernel stats for the 2M bounce population
  - K=8 (65k-tri treelets) table variant

    python tools/probe_r3.py [--what drivers|stats|k8]
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
    ap.add_argument("--max-tris", type=int, default=32768)
    ap.add_argument("--partition", default="sah")
    ap.add_argument("--bvh-width", type=int, default=16)
    ap.add_argument("--leaf-size", type=int, default=12)
    ap.add_argument("--what", default="drivers")
    ap.add_argument("--tables-hbm", action="store_true",
                    help="single-buffered in-kernel table DMA (treelets "
                         "tables_hbm) — unlocks 2x treelet or segment size")
    ap.add_argument("--cluster-mode", default="median")
    ap.add_argument("--bit-loop", action="store_true",
                    help="bit-loop pops in the density probe cases")
    ap.add_argument("--max-groups", type=int, default=32)
    ap.add_argument("--vmem-limit", type=float, default=0,
                    help="Mosaic scoped-VMEM budget in bytes (0 = default "
                         "~16M); v5e has 128M physical — raising it admits "
                         "bigger treelets / segments")
    args = ap.parse_args()
    vmem_limit = int(args.vmem_limit) or None

    from raytracer3_tpu.ops import treelets
    from raytracer3_tpu.render import camera as camera_mod
    from raytracer3_tpu.render import wavefront
    from raytracer3_tpu.scene import procedural
    from raytracer3_tpu.utils import runtime
    from raytracer3_tpu.utils.config import RenderSettings

    runtime.init_compilation_cache()
    w, h = args.width, args.height
    n = w * h
    scene, host = procedural.atrium_scene(detail=args.detail, return_host=True)
    cam = procedural.atrium_camera(aspect=w / h)

    t0 = time.perf_counter()
    tt = treelets.build_treelets_host(
        host[0], host[1], host[2], leaf_size=args.leaf_size,
        width=args.bvh_width, max_tris=args.max_tris,
        partition=args.partition, cluster_mode=args.cluster_mode,
    )
    print(
        f"tris={host[0].shape[0]} n={n} K={tt.num_treelets} "
        f"mt={tt.max_nodes} ct={tt.max_clusters} build={time.perf_counter()-t0:.1f}s",
        flush=True,
    )
    nodes, clus, ab = tt.node_tables, tt.cluster_tables, tt.aabb

    # Ray populations.
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
    # Mixed shadow population: half toward the sun, half toward one of 4
    # random in-scene point lights (the NEE area/env mixture shape).
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

    def isect_fn(presorted=False, chunk=1, any_hit=False, per_ray_t=False,
                 half_leaf=False, div_free=False, rank_push=False,
                 step_cull=False, bit_loop=False, max_groups=32,
                 nearest_first=False):
        @jax.jit
        def f(nt, ct, ab_, o_, d_, tm):
            tt2 = tt._replace(node_tables=nt, cluster_tables=ct, aabb=ab_)
            hh = treelets.treelet_intersect(
                tt2, o_, d_, t_max=tm, any_hit=any_hit,
                sublanes=args.sublanes, presorted=presorted, sort_chunk=chunk,
                half_leaf=half_leaf, div_free=div_free, rank_push=rank_push,
                step_cull=step_cull, tables_hbm=args.tables_hbm,
                vmem_limit=vmem_limit, bit_loop=bit_loop,
                max_groups=max_groups, nearest_first=nearest_first,
            )
            return jnp.sum(hh.t) + jnp.sum(hh.prim_id)

        return f

    BG = 100000.0

    if args.what == "bounce":
        # Single-compile shape sweeps (--bvh-width / --leaf-size).
        f = isect_fn()
        tm_a = jnp.full((n,), BG, jnp.float32)
        dt = _time(f, nodes, clus, ab, o_rand, d_rand, tm_a, reps=3)
        print(f"{'bounce sorted':24s}: {dt*1e3:8.1f} ms  {n/dt/1e6:6.2f} Mray/s",
              flush=True)

    if args.what == "base":
        # The four production populations only (fresh-compile budget).
        cases = [
            ("primary presorted", isect_fn(presorted=True), o_tile, d_tile, BG),
            ("bounce sorted (base)", isect_fn(), o_rand, d_rand, BG),
            ("occl sun (base)", isect_fn(any_hit=True), o_rand, d_sun, 100.0),
            ("occl mix (base)", isect_fn(any_hit=True), o_rand, d_mix, t_mix),
        ]
        for tag, f, o_, d_, tm in cases:
            tm_a = jnp.broadcast_to(jnp.asarray(tm, jnp.float32), (n,))
            dt = _time(f, nodes, clus, ab, o_, d_, tm_a, reps=3)
            print(f"{tag:24s}: {dt*1e3:8.1f} ms  {n/dt/1e6:6.2f} Mray/s",
                  flush=True)

    if args.what == "halfleaf":
        # Half-group (8-row) leaf predication A/B on every population.
        cases = [
            ("primary presorted HL", isect_fn(presorted=True, half_leaf=True),
             o_tile, d_tile, BG),
            ("bounce sorted HL", isect_fn(half_leaf=True), o_rand, d_rand, BG),
            ("occl sun HL", isect_fn(any_hit=True, half_leaf=True),
             o_rand, d_sun, 100.0),
            ("occl mix HL", isect_fn(any_hit=True, half_leaf=True),
             o_rand, d_mix, t_mix),
        ]
        for tag, f, o_, d_, tm in cases:
            tm_a = jnp.broadcast_to(jnp.asarray(tm, jnp.float32), (n,))
            dt = _time(f, nodes, clus, ab, o_, d_, tm_a, reps=3)
            print(f"{tag:24s}: {dt*1e3:8.1f} ms  {n/dt/1e6:6.2f} Mray/s",
                  flush=True)

    if args.what == "divfree":
        # Division-free Möller (one divide per block, cross-multiplied
        # comparisons) A/B with half-leaf on — production candidate config.
        cases = [
            ("primary presorted DF",
             isect_fn(presorted=True, half_leaf=True, div_free=True),
             o_tile, d_tile, BG),
            ("bounce sorted DF", isect_fn(half_leaf=True, div_free=True),
             o_rand, d_rand, BG),
            ("occl sun DF", isect_fn(any_hit=True, half_leaf=True,
                                     div_free=True),
             o_rand, d_sun, 100.0),
            ("occl mix DF", isect_fn(any_hit=True, half_leaf=True,
                                     div_free=True),
             o_rand, d_mix, t_mix),
        ]
        for tag, f, o_, d_, tm in cases:
            tm_a = jnp.broadcast_to(jnp.asarray(tm, jnp.float32), (n,))
            dt = _time(f, nodes, clus, ab, o_, d_, tm_a, reps=3)
            print(f"{tag:24s}: {dt*1e3:8.1f} ms  {n/dt/1e6:6.2f} Mray/s",
                  flush=True)

    if args.what == "rankpush":
        # Vectorized rank-select child pushes vs the Batcher sort network
        # (A/B with half-leaf on — the production config).
        cases = [
            ("primary presorted RP",
             isect_fn(presorted=True, half_leaf=True, rank_push=True),
             o_tile, d_tile, BG),
            ("bounce sorted RP", isect_fn(half_leaf=True, rank_push=True),
             o_rand, d_rand, BG),
            ("occl sun RP", isect_fn(any_hit=True, half_leaf=True,
                                     rank_push=True),
             o_rand, d_sun, 100.0),
            ("occl mix RP", isect_fn(any_hit=True, half_leaf=True,
                                     rank_push=True),
             o_rand, d_mix, t_mix),
        ]
        for tag, f, o_, d_, tm in cases:
            tm_a = jnp.broadcast_to(jnp.asarray(tm, jnp.float32), (n,))
            dt = _time(f, nodes, clus, ab, o_, d_, tm_a, reps=3)
            print(f"{tag:24s}: {dt*1e3:8.1f} ms  {n/dt/1e6:6.2f} Mray/s",
                  flush=True)

    if args.what == "prod":
        # The four populations at PRODUCTION per-population flags
        # (treelet_backend defaults: half_leaf + step_cull everywhere,
        # rank_push on the sorted bounce path only) — the baseline for
        # config sweeps over --sublanes / --max-tris / --vmem-limit.
        cases = [
            ("primary presorted",
             isect_fn(presorted=True, half_leaf=True, step_cull=True),
             o_tile, d_tile, BG),
            ("bounce sorted",
             isect_fn(half_leaf=True, step_cull=True, rank_push=True),
             o_rand, d_rand, BG),
            ("occl sun",
             isect_fn(any_hit=True, half_leaf=True, step_cull=True),
             o_rand, d_sun, 100.0),
            ("occl mix",
             isect_fn(any_hit=True, half_leaf=True, step_cull=True),
             o_rand, d_mix, t_mix),
        ]
        for tag, f, o_, d_, tm in cases:
            tm_a = jnp.broadcast_to(jnp.asarray(tm, jnp.float32), (n,))
            dt = _time(f, nodes, clus, ab, o_, d_, tm_a, reps=3)
            print(f"{tag:24s}: {dt*1e3:8.1f} ms  {n/dt/1e6:6.2f} Mray/s",
                  flush=True)

    if args.what == "bitloop":
        # Bit-loop pops (iterate set mask bits; scalar cost = popcount) at
        # production flags, plus the BL64 variant (8-row groups, two words)
        # the lax.cond path could not afford. Run a same-process "prod"
        # baseline first (--what prod) for the A/B.
        cases = [
            ("primary presorted BL",
             isect_fn(presorted=True, half_leaf=True, step_cull=True,
                      bit_loop=True),
             o_tile, d_tile, BG),
            ("bounce sorted BL",
             isect_fn(half_leaf=True, step_cull=True, rank_push=True,
                      bit_loop=True),
             o_rand, d_rand, BG),
            ("occl sun BL",
             isect_fn(any_hit=True, half_leaf=True, step_cull=True,
                      bit_loop=True),
             o_rand, d_sun, 100.0),
            ("occl mix BL",
             isect_fn(any_hit=True, half_leaf=True, step_cull=True,
                      bit_loop=True),
             o_rand, d_mix, t_mix),
            ("bounce sorted BL64",
             isect_fn(step_cull=True, rank_push=True, bit_loop=True,
                      max_groups=64),
             o_rand, d_rand, BG),
            ("occl mix BL64",
             isect_fn(any_hit=True, step_cull=True, bit_loop=True,
                      max_groups=64),
             o_rand, d_mix, t_mix),
        ]
        for tag, f, o_, d_, tm in cases:
            tm_a = jnp.broadcast_to(jnp.asarray(tm, jnp.float32), (n,))
            dt = _time(f, nodes, clus, ab, o_, d_, tm_a, reps=3)
            print(f"{tag:24s}: {dt*1e3:8.1f} ms  {n/dt/1e6:6.2f} Mray/s",
                  flush=True)

    if args.what == "tcull":
        # Per-step t-cull + scene-exit caps A/B — self-contained: each
        # population runs step_cull OFF then ON (identical config
        # otherwise). Expected: bounce/primary win (near hits kill far
        # steps), occl neutral-to-win (any-hit retirement drives blocked
        # lanes' best-t to 0, shrinking the segment max).
        cases = []
        for cull in (False, True):
            sfx = "TC" if cull else "off"
            cases += [
                (f"primary presorted {sfx}",
                 isect_fn(presorted=True, half_leaf=True, step_cull=cull),
                 o_tile, d_tile, BG),
                (f"bounce sorted {sfx}",
                 isect_fn(half_leaf=True, step_cull=cull),
                 o_rand, d_rand, BG),
                (f"occl sun {sfx}",
                 isect_fn(any_hit=True, half_leaf=True, step_cull=cull),
                 o_rand, d_sun, 100.0),
                (f"occl mix {sfx}",
                 isect_fn(any_hit=True, half_leaf=True, step_cull=cull),
                 o_rand, d_mix, t_mix),
            ]
        for tag, f, o_, d_, tm in cases:
            tm_a = jnp.broadcast_to(jnp.asarray(tm, jnp.float32), (n,))
            dt = _time(f, nodes, clus, ab, o_, d_, tm_a, reps=3)
            print(f"{tag:24s}: {dt*1e3:8.1f} ms  {n/dt/1e6:6.2f} Mray/s",
                  flush=True)

    if args.what == "density":
        # Does bounce throughput rise with ray DENSITY? 2x/4x rays over the
        # same domain -> more rays per morton cell -> purer groups -> fewer
        # pops per ray. If it scales, sample-batched frames are a lever.
        f = isect_fn(half_leaf=True, step_cull=True, rank_push=True,
                     bit_loop=args.bit_loop, max_groups=args.max_groups)
        fo = isect_fn(any_hit=True, half_leaf=True, step_cull=True,
                      bit_loop=args.bit_loop, max_groups=args.max_groups)
        for mult in (4, 8, 16):
            nn = n * mult
            # Host-side population build (device pulls through the tunnel
            # cost minutes; eager device gathers pad 42x — see below).
            nprng = np.random.default_rng(17 + mult)
            o_h = nprng.uniform(lo, hi, (nn, 3)).astype(np.float32)
            d_h = nprng.normal(size=(nn, 3)).astype(np.float32)
            d_h /= np.linalg.norm(d_h, axis=1, keepdims=True)
            o_m = jnp.asarray(o_h)
            d_m = jnp.asarray(d_h)
            tm_a = jnp.full((nn,), BG, jnp.float32)
            dt = _time(f, nodes, clus, ab, o_m, d_m, tm_a, reps=3)
            print(f"bounce x{mult:<2d} ({nn/1e6:.1f}M)   : {dt*1e3:8.1f} ms  "
                  f"{nn/dt/1e6:6.2f} Mray/s", flush=True)
            # Mixed shadow population at the same density (sun/point 50:50),
            # built HOST-side: the eager device [N,3] row-gather pads 42x on
            # this runtime (a 33M-row x16 population OOM'ed HBM at 15.9G).
            lights_h = np.asarray(lights)
            to_lm = lights_h[nprng.integers(0, 4, nn)] - o_h
            dist_m = np.linalg.norm(to_lm, axis=1, keepdims=True)
            d_pm = to_lm / np.maximum(dist_m, 1e-6)
            sun_m = nprng.random(nn) < 0.5
            d_mixm = jnp.asarray(
                np.where(sun_m[:, None], np.asarray(sun)[None], d_pm),
                jnp.float32,
            )
            t_mixm = jnp.asarray(
                np.where(sun_m, 100.0, dist_m[:, 0] * 0.999), jnp.float32
            )
            dt = _time(fo, nodes, clus, ab, o_m, d_mixm, t_mixm, reps=3)
            print(f"occlmix x{mult:<2d} ({nn/1e6:.1f}M)  : {dt*1e3:8.1f} ms  "
                  f"{nn/dt/1e6:6.2f} Mray/s", flush=True)

    if args.what == "nf":
        # Nearest-first two-phase A/B at production flags, base then nf,
        # same-process, at 1x and 8x bounce density + the occl mix.
        prod = dict(half_leaf=True, step_cull=True,
                    bit_loop=args.bit_loop, max_groups=args.max_groups)
        f_b = isect_fn(rank_push=True, **prod)
        f_n = isect_fn(rank_push=True, nearest_first=True, **prod)
        fo_b = isect_fn(any_hit=True, **prod)
        fo_n = isect_fn(any_hit=True, nearest_first=True, **prod)
        tm_a = jnp.full((n,), BG, jnp.float32)
        for tag, f in (("bounce base", f_b), ("bounce NF", f_n)):
            dt = _time(f, nodes, clus, ab, o_rand, d_rand, tm_a, reps=3)
            print(f"{tag:24s}: {dt*1e3:8.1f} ms  {n/dt/1e6:6.2f} Mray/s",
                  flush=True)
        for tag, f in (("occl mix base", fo_b), ("occl mix NF", fo_n)):
            dt = _time(f, nodes, clus, ab, o_rand, d_mix, t_mix, reps=3)
            print(f"{tag:24s}: {dt*1e3:8.1f} ms  {n/dt/1e6:6.2f} Mray/s",
                  flush=True)
        nn = n * 8
        nprng = np.random.default_rng(25)
        o_h = nprng.uniform(lo, hi, (nn, 3)).astype(np.float32)
        d_h = nprng.normal(size=(nn, 3)).astype(np.float32)
        d_h /= np.linalg.norm(d_h, axis=1, keepdims=True)
        o_m, d_m = jnp.asarray(o_h), jnp.asarray(d_h)
        tm_m = jnp.full((nn,), BG, jnp.float32)
        for tag, f in (("bounce x8 base", f_b), ("bounce x8 NF", f_n)):
            dt = _time(f, nodes, clus, ab, o_m, d_m, tm_m, reps=3)
            print(f"{tag:24s}: {dt*1e3:8.1f} ms  {nn/dt/1e6:6.2f} Mray/s",
                  flush=True)

    if args.what == "shadowsplit":
        # One mixed any-hit call vs two calls with the other half parked
        # (t_cap = 0). Parked lanes sort to the segment tail with gmask 0,
        # so each split call should approach its pure population's speed.
        f = isect_fn(any_hit=True)
        tm_mix = jnp.asarray(t_mix, jnp.float32)
        dt = _time(f, nodes, clus, ab, o_rand, d_mix, tm_mix, reps=3)
        print(f"{'occl mix one-call':24s}: {dt*1e3:8.1f} ms  "
              f"{n/dt/1e6:6.2f} Mray/s", flush=True)

        tm_sun = jnp.where(use_sun, 100.0, 0.0).astype(jnp.float32)
        tm_pt = jnp.where(use_sun, 0.0, t_mix).astype(jnp.float32)

        @jax.jit
        def split(nt, ct, ab_, o_, dsun, dpt, tms, tmp):
            tt2 = tt._replace(node_tables=nt, cluster_tables=ct, aabb=ab_)
            h1 = treelets.treelet_intersect(
                tt2, o_, dsun, t_max=tms, any_hit=True,
                sublanes=args.sublanes,
            )
            h2 = treelets.treelet_intersect(
                tt2, o_, dpt, t_max=tmp, any_hit=True,
                sublanes=args.sublanes,
            )
            return jnp.sum(h1.t) + jnp.sum(h2.t)

        dt = _time(split, nodes, clus, ab, o_rand, d_sun, d_point,
                   tm_sun, tm_pt, reps=3)
        print(f"{'occl split two-call':24s}: {dt*1e3:8.1f} ms  "
              f"{n/dt/1e6:6.2f} Mray/s (live rays = n/2 each)", flush=True)

    if args.what in ("drivers", "all"):
        cases = [
            ("primary sorted (base)", isect_fn(), o_tile, d_tile, BG),
            ("primary presorted", isect_fn(presorted=True), o_tile, d_tile, BG),
            ("primary chunk128", isect_fn(chunk=128), o_tile, d_tile, BG),
            ("bounce sorted (base)", isect_fn(), o_rand, d_rand, BG),
            ("bounce chunk8", isect_fn(chunk=8), o_rand, d_rand, BG),
            ("bounce chunk32", isect_fn(chunk=32), o_rand, d_rand, BG),
            ("occl sun (base)", isect_fn(any_hit=True), o_rand, d_sun, 100.0),
            ("occl sun chunk128", isect_fn(any_hit=True, chunk=128),
             o_rand, d_sun, 100.0),
            ("occl mix (base)", isect_fn(any_hit=True), o_rand, d_mix, t_mix),
            ("occl mix chunk32", isect_fn(any_hit=True, chunk=32),
             o_rand, d_mix, t_mix),
            ("occl mix chunk128", isect_fn(any_hit=True, chunk=128),
             o_rand, d_mix, t_mix),
            ("occl bounce-rand", isect_fn(any_hit=True), o_rand, d_rand, BG),
        ]
        for tag, f, o_, d_, tm in cases:
            tm_a = jnp.broadcast_to(jnp.asarray(tm, jnp.float32), (n,))
            dt = _time(f, nodes, clus, ab, o_, d_, tm_a, reps=3)
            print(f"{tag:24s}: {dt*1e3:8.1f} ms  {n/dt/1e6:6.2f} Mray/s",
                  flush=True)

    if args.what in ("keys", "all"):
        # Sort-KEY experiments for incoherent bounce rays: sun shadows
        # (spread origins, one direction) run 9.6 Mray/s while random-dir
        # bounces run 2.7 — direction coherence shrinks packet unions more
        # than origin coherence. Test direction-heavier keys by pre-sorting
        # outside and tracing presorted.
        def _morton(q, bits):
            m = jnp.zeros(q.shape[0], jnp.int32)
            for b in range(bits):
                m = (
                    m
                    | (((q[:, 0] >> b) & 1) << (3 * b + 2))
                    | (((q[:, 1] >> b) & 1) << (3 * b + 1))
                    | (((q[:, 2] >> b) & 1) << (3 * b))
                )
            return m

        @jax.jit
        def key_parts(ab_, o_, d_):
            inv_d = 1.0 / jnp.where(jnp.abs(d_) < 1e-12, 1e-12, d_)
            cap = jnp.full((o_.shape[0],), BG, jnp.float32)
            tn, want = treelets._treelet_slabs(ab_, o_, inv_d, 1e-4, cap)
            tn_m = jnp.where(want, tn, jnp.inf)
            near = jnp.min(tn_m, axis=1)
            tid0 = jnp.argmin(tn_m, axis=1).astype(jnp.int32)
            tid0 = jnp.where(jnp.isfinite(near), tid0, tt.num_treelets)
            entry = o_ + jnp.maximum(near, 0.0)[:, None] * d_
            lo_ = ab_[:, 0:3].min(axis=0)
            hi_ = ab_[:, 3:6].max(axis=0)
            pq = jnp.clip(
                (entry - lo_) / jnp.maximum(hi_ - lo_, 1e-6) * 63.0, 0, 63
            ).astype(jnp.int32)
            dq = jnp.clip((d_ * 0.5 + 0.5) * 7.999, 0, 7).astype(jnp.int32)
            return tid0, pq, dq

        tid0, pq, dq = key_parts(ab, o_rand, d_rand)
        pm18 = _morton(pq, 6)
        pm9 = _morton(pq >> 3, 3)
        dm9 = _morton(dq, 3)
        dm6 = _morton(dq >> 1, 2)
        octant = (
            (dq[:, 0] >> 2) + 2 * (dq[:, 1] >> 2) + 4 * (dq[:, 2] >> 2)
        )
        # 6D interleave: alternate pos (6b) and dir (9b) morton bits.
        six = jnp.zeros_like(pm18)
        for b in range(9):
            six = six | (((dm9 >> b) & 1) << (2 * b + 1))
            six = six | (((pm9 >> b) & 1) << (2 * b))
        # LOCAL morton: quantize the entry point inside the nearest
        # treelet's own AABB (one-hot MXU matmul selects the row) — global
        # 6-bit quantization only resolves ~2 bits/axis inside one treelet.
        @jax.jit
        def local_p18(ab_, o_, d_, tid0_):
            oh = jax.nn.one_hot(jnp.clip(tid0_, 0, tt.num_treelets - 1),
                                tt.num_treelets, dtype=jnp.float32)
            ab_sel = oh @ ab_  # [N, 8] via MXU
            lo_l, hi_l = ab_sel[:, 0:3], ab_sel[:, 3:6]
            inv = 1.0 / jnp.where(jnp.abs(d_) < 1e-12, 1e-12, d_)
            tnl, wantl = treelets._treelet_slabs(
                ab_, o_, inv, 1e-4, jnp.full((o_.shape[0],), BG, jnp.float32)
            )
            nearl = jnp.min(jnp.where(wantl, tnl, jnp.inf), axis=1)
            entry_l = o_ + jnp.maximum(nearl, 0.0)[:, None] * d_
            pq_l = jnp.clip(
                (entry_l - lo_l) / jnp.maximum(hi_l - lo_l, 1e-6) * 63.0, 0, 63
            ).astype(jnp.int32)
            return _morton(pq_l, 6)

        pl18 = local_p18(ab, o_rand, d_rand, tid0)
        keys = {
            "key base t|o3|p18": (tid0 << 21) | (octant << 18) | pm18,
            "key t|o3|LOCALp18": (tid0 << 21) | (octant << 18) | pl18,
            "key t|LOCALp18": (tid0 << 18) | pl18,
            "key t|d9|p17": (tid0 << 26) | (dm9 << 17) | (pm18 >> 1),
            "key t|d6|p18": (tid0 << 24) | (dm6 << 18) | pm18,
            "key t|p9|d9": (tid0 << 26) | (pm9 << 17) | (dm9 << 8),
            "key t|6Dpd": (tid0 << 26) | (six << 8),
        }
        f_pre = isect_fn(presorted=True)
        tm_a = jnp.full((n,), BG, jnp.float32)

        @jax.jit
        def apply_order(k, o_, d_):
            perm = jnp.argsort(k)
            pk = jnp.concatenate([o_, d_], axis=1)[perm]
            return pk[:, 0:3], pk[:, 3:6]

        for tag, k in keys.items():
            o_s, d_s = apply_order(k, o_rand, d_rand)
            dt = _time(f_pre, nodes, clus, ab, o_s, d_s, tm_a, reps=3)
            print(f"{tag:24s}: {dt*1e3:8.1f} ms  {n/dt/1e6:6.2f} Mray/s",
                  flush=True)

    if args.what in ("stats", "all"):
        @jax.jit
        def stats_fn(nt, ct, ab_, o_, d_):
            tt2 = tt._replace(node_tables=nt, cluster_tables=ct, aabb=ab_)
            hh, st = treelets.treelet_intersect(
                tt2, o_, d_, sublanes=args.sublanes, stats=True
            )
            return st

        st = np.asarray(stats_fn(nodes, clus, ab, o_rand, d_rand))
        segs = st.shape[0]
        print(f"bounce 2M stats over {segs} segments "
              f"(sublanes={args.sublanes}):", flush=True)
        tot = st.sum(0)
        print(
            f"  node pops/seg {tot[0]/segs:8.0f}  act {tot[2]/max(tot[0],1):.2f}/32\n"
            f"  leaf pops/seg {tot[1]/segs:8.0f}  act {tot[3]/max(tot[1],1):.2f}/32\n"
            f"  live steps/seg {tot[4]/segs:6.1f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
