"""Measure the shard_map wrapper's overhead on ONE real chip (VERDICT r4
item 7): the same wavefront frame through parallel/mesh.render_wavefront_tiled
on a 1-device Mesh vs the identical computation called directly (no
shard_map). The delta is the wrapper cost a multi-chip deployment pays per
chip; ICI collective cost at 8 chips remains unmeasurable on this host (one
chip) and is NOT covered — ideal_v5e8_fps stays an upper bound.

  python tools/probe_shard_overhead.py [--iters 3]
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse, time

import jax
import jax.numpy as jnp

from raytracer3_tpu.utils import runtime

runtime.init_compilation_cache()


def pull(x, what):
    return float(runtime.pull_guarded(jnp.sum(x), timeout=2400.0, what=what))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=544)
    ap.add_argument("--bounces", type=int, default=4)
    args = ap.parse_args()
    w, h = args.width, args.height

    from raytracer3_tpu.ops.pallas import traverse_kernel as tk
    from raytracer3_tpu.parallel import mesh as mesh_mod
    from raytracer3_tpu.scene import procedural
    from raytracer3_tpu.utils.config import RenderSettings

    scene, tris = procedural.atrium_scene(detail=2, return_host=True)
    cam = procedural.atrium_camera(aspect=w / h)
    backend = tk.packet_backend(host_tris=tris)
    settings = RenderSettings(
        width=w, height=h, bounces=args.bounces, samples=1,
        radiance_clamp=50.0,
    )
    isect = backend.intersect_fn
    occl = backend.occluded_fn
    mesh = mesh_mod.make_render_mesh(jax.devices()[:1])

    @jax.jit
    def sharded(scene_, arrays, fi):
        return mesh_mod.render_wavefront_tiled(
            scene_, cam, settings, fi, arrays, isect, occl,
            mesh=mesh, sort_rays=True,
        )

    @jax.jit
    def direct(scene_, arrays, fi):
        # The same computation render_wavefront_tiled runs per shard, with
        # the full image as the one shard — no shard_map wrapper.
        from raytracer3_tpu.ops import rng
        from raytracer3_tpu.render import camera as camera_mod
        from raytracer3_tpu.render import pathtracer, wavefront

        pix = camera_mod.pixel_grid(w, h).reshape(h, w, 2)
        p = pix.reshape(-1, 2)
        n = p.shape[0]
        i_fn = lambda o, d: isect(arrays, o, d)
        o_fn = lambda o, d, t: occl(arrays, o, d, t)
        sampler = rng.Sampler.from_pixels(p, fi)
        uj, sampler = sampler.next2()
        o, d = camera_mod.primary_rays(cam, w, h, jitter=uj, pixel_xy=p)
        hit0 = i_fn(o, d)
        q = wavefront.RayQueue(
            origin=o, direction=d,
            throughput=jnp.ones((n, 3), jnp.float32),
            radiance=jnp.zeros((n, 3), jnp.float32),
            pixel_id=(p[:, 1] * w + p[:, 0]).astype(jnp.int32),
            alive=hit0.hit,
            prev_pdf=jnp.full((n,), 1e8, jnp.float32),
            depth=hit0.t, prim_id=hit0.prim_id, uv=hit0.uv, inst=hit0.inst,
        )
        q, _ = wavefront.trace_wavefront(
            scene_, i_fn, q, sampler, settings, o_fn, True
        )
        radiance = jnp.minimum(q.radiance, settings.radiance_clamp)
        env = pathtracer._sample_env(scene_, d)
        radiance = radiance + jnp.where(~hit0.hit[:, None], env, 0.0)
        return radiance.reshape(h, w, 3)

    out = {}
    for name, fn in (("direct", direct), ("shard_map_1dev", sharded)):
        img = fn(scene, backend.arrays, jnp.uint32(0))
        pull(img, f"{name} compile")
        t0 = time.perf_counter()
        for i in range(1, args.iters + 1):
            img = fn(scene, backend.arrays, jnp.uint32(i))
            pull(img, f"{name} frame")
        out[name] = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"  {name:16s}: {out[name]:8.1f} ms", flush=True)
    ov = out["shard_map_1dev"] / out["direct"] - 1.0
    print(f"  shard_map overhead: {ov * 100:+.1f}%", flush=True)


if __name__ == "__main__":
    main()
