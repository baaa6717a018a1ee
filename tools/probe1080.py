"""Sponza-1080p frame breakdown on the real chip (verdict item 2: attribute
the non-traversal frame cost). Times, per stage, with scalar-pull forcing:

  - full frame (treelet backend, 4-bounce NEE)   -> the bench number
  - stub-intersector frame                       -> everything-but-traversal
  - treelet driver floor (e_cap=0) at 2.09M rays -> sort+gathers+grid cost
  - bare argsort / pack-gather / inverse at 2.09M-> sort primitives
  - isolated primary / shadow / bounce traces    -> per-population traversal

    python tools/probe1080.py [--detail 8] [--width 1920 --height 1088]
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

from perf_probe import _pull, _time  # noqa: E402  (tools/ sibling import)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--detail", type=int, default=8)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1088)
    ap.add_argument("--sublanes", type=int, default=512)
    ap.add_argument("--skip-frames", action="store_true")
    ap.add_argument("--skip-micro", action="store_true")
    ap.add_argument("--samples", type=int, default=1,
                    help="sample-batched wavefront density (frame cases run "
                         "at samples*n lanes; attribute the samples=8 bench "
                         "regression: driver sorts scale with lanes)")
    ap.add_argument("--fuse-shadow", action="store_true",
                    help="fused shadow+bounce launches in the frame cases")
    args = ap.parse_args()

    from raytracer3_tpu.ops import treelets
    from raytracer3_tpu.ops import intersect as isect_mod
    from raytracer3_tpu.render import camera as camera_mod
    from raytracer3_tpu.render import film as film_mod
    from raytracer3_tpu.render import wavefront
    from raytracer3_tpu.scene import procedural
    from raytracer3_tpu.utils import runtime
    from raytracer3_tpu.utils.config import RenderSettings

    runtime.init_compilation_cache()
    w, h = args.width, args.height
    n = w * h
    scene, host = procedural.atrium_scene(detail=args.detail, return_host=True)
    cam = procedural.atrium_camera(aspect=w / h)
    print(f"tris={host[0].shape[0]} rays/bounce={n}", flush=True)

    backend = treelets.treelet_backend(
        host_tris=host, sublanes=args.sublanes
    )
    tt = backend.meta

    settings = RenderSettings(
        width=w, height=h, bounces=4, samples=args.samples,
        sample_batch=args.samples > 1, radiance_clamp=50.0,
    )

    def frame_fn(stub=False, nee=True, bounces=4):
        import dataclasses

        st = dataclasses.replace(settings, bounces=bounces)

        @jax.jit
        def frame(scene_, bvh, film, fi):
            if stub:
                def isect(o, d):
                    t = jnp.abs(o[:, 0]) * 0.01 + 1.0
                    return isect_mod.Hit(
                        t=t, uv=jnp.abs(d[:, :2]) * 0.3,
                        prim_id=(o[:, 1] * 7).astype(jnp.int32) % 1000,
                        hit=o[:, 0] < 1e20,
                    )

                def occl(o, d, tmax):
                    return (o[:, 0] + d[:, 0]) * 0.0 > 1.0
            else:
                isect, occl = backend.bind(bvh)
            radiance, traced = wavefront.render_frame(
                scene_, cam, st, fi, isect, occl if nee else None,
                sort_rays=False, return_stats=True,
                primary_fn=None if stub else backend.bind_primary(bvh),
                fused_fn=(
                    backend.bind_capped(bvh)
                    if (args.fuse_shadow and not stub) else None
                ),
            )
            return film_mod.accumulate_progressive(film, radiance), traced

        def call(fi):
            film = film_mod.Film.create(h, w)
            out, traced = frame(scene, backend.arrays, film, jnp.uint32(fi))
            return traced

        return call

    if not args.skip_frames:
        for tag, kw in [
            ("frame full 4b nee", dict()),
            ("frame stub 4b nee", dict(stub=True)),
            ("frame full 4b NO-nee", dict(nee=False)),
            ("frame full 1b nee", dict(bounces=1)),
        ]:
            f = frame_fn(**kw)
            dt = _time(f, 0, reps=2)
            print(f"{tag:24s}: {dt*1e3:8.1f} ms", flush=True)

    # --- isolated traversal populations at full-frame ray count ------------
    key = jax.random.PRNGKey(0)
    o_prim, d_prim = camera_mod.primary_rays(cam, w, h)
    lo = np.asarray(jnp.min(scene.positions, axis=0))
    hi = np.asarray(jnp.max(scene.positions, axis=0))
    kp = jax.random.split(key, 4)
    o_rand = jax.random.uniform(
        kp[0], (n, 3), minval=jnp.asarray(lo), maxval=jnp.asarray(hi)
    )
    d_rand = o_rand - jnp.mean(o_rand, 0)  # placeholder; replaced below
    d_rand = jax.random.normal(kp[1], (n, 3))
    d_rand = d_rand / jnp.linalg.norm(d_rand, axis=1, keepdims=True)
    # Shadow-like: from surface points toward one sun direction.
    sun = jnp.asarray([0.3, 0.8, 0.5])
    sun = sun / jnp.linalg.norm(sun)
    d_sun = jnp.broadcast_to(sun, (n, 3))

    @jax.jit
    def isect_ecap(nt, ct, ab, o_, d_, ecap):
        tt2 = tt._replace(node_tables=nt, cluster_tables=ct, aabb=ab)
        hh = treelets.treelet_intersect(
            tt2, o_, d_, sublanes=args.sublanes, e_cap=ecap
        )
        return jnp.sum(hh.t)

    @jax.jit
    def occl_f(nt, ct, ab, o_, d_):
        tt2 = tt._replace(node_tables=nt, cluster_tables=ct, aabb=ab)
        hh = treelets.treelet_intersect(
            tt2, o_, d_, t_max=100.0, any_hit=True, sublanes=args.sublanes
        )
        return jnp.sum(hh.t)

    a = backend.arrays
    for tag, o_, d_, cap in [
        ("isect primary", o_prim, d_prim, None),
        ("isect bounce-rand", o_rand, d_rand, None),
    ]:
        dt = _time(isect_ecap, a["nodes"], a["clusters"], a["aabb"], o_, d_,
                   jnp.int32(99), reps=3)
        print(f"{tag:24s}: {dt*1e3:8.1f} ms  {n/dt/1e6:6.2f} Mray/s", flush=True)
    dt = _time(isect_ecap, a["nodes"], a["clusters"], a["aabb"], o_rand,
               d_rand, jnp.int32(0), reps=3)
    print(f"{'driver floor (e_cap=0)':24s}: {dt*1e3:8.1f} ms", flush=True)
    dt = _time(occl_f, a["nodes"], a["clusters"], a["aabb"], o_rand, d_sun,
               reps=3)
    print(f"{'occl sun-shadow':24s}: {dt*1e3:8.1f} ms  {n/dt/1e6:6.2f} Mray/s",
          flush=True)

    if not args.skip_micro:
        # --- sort primitives at 2.09M ---------------------------------------
        keys = jax.random.randint(kp[2], (n,), 0, 1 << 24, dtype=jnp.int32)
        payload = jax.random.normal(kp[3], (n, 7))

        @jax.jit
        def f_argsort(k):
            return jnp.sum(jnp.argsort(k))

        @jax.jit
        def f_sort_gather(k, p):
            perm = jnp.argsort(k)
            return jnp.sum(p[perm])

        @jax.jit
        def f_sort_both(k, p):
            perm = jnp.argsort(k)
            x = jnp.sum(p[perm])
            inv = jnp.argsort(perm)
            return x + jnp.sum(p[inv, :4])

        print(f"{'argsort 2M':24s}: {_time(f_argsort, keys, reps=3)*1e3:8.1f} ms",
              flush=True)
        print(f"{'argsort+gather7':24s}: "
              f"{_time(f_sort_gather, keys, payload, reps=3)*1e3:8.1f} ms",
              flush=True)
        print(f"{'argsort+g7+inv+g4':24s}: "
              f"{_time(f_sort_both, keys, payload, reps=3)*1e3:8.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
