"""Small-scene packet-path flag sweep (headline atrium 19k tris): the
treelet path won bit-loop pops / half-leaf predication / rank-select pushes
in round 3, but packet_backend never passes them. Same-process A/B over
flag combos on the three populations.

    python tools/probe_packet_flags.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

from perf_probe import _pull, _time  # noqa: E402


def main():
    from raytracer3_tpu.ops import cluster_bvh as cb_mod
    from raytracer3_tpu.ops.pallas import traverse_kernel as tk
    from raytracer3_tpu.render import camera as camera_mod
    from raytracer3_tpu.render import wavefront
    from raytracer3_tpu.scene import procedural
    from raytracer3_tpu.utils import runtime

    runtime.init_compilation_cache()
    w, h = 960, 544
    n = w * h
    scene, host = procedural.atrium_scene(detail=2, return_host=True)
    cam = procedural.atrium_camera(aspect=w / h)
    cb = cb_mod.build_cluster_bvh_host(
        host[0], host[1], host[2], 12, width=16, cluster_mode="sah"
    )
    pt = tk.pack_tables(cb)
    meta = pt._replace(node_table=None, cluster_table=None)
    nt, ct = pt.node_table, pt.cluster_table
    print(f"tris={host[0].shape[0]} nodes={pt.num_nodes} "
          f"clusters={pt.num_clusters}", flush=True)

    nprng = np.random.default_rng(5)
    lo, hi = host[0].min(0), host[0].max(0)
    o_h = nprng.uniform(lo, hi, (n, 3)).astype(np.float32)
    d_h = nprng.normal(size=(n, 3)).astype(np.float32)
    d_h /= np.linalg.norm(d_h, axis=1, keepdims=True)
    o_rand, d_rand = jnp.asarray(o_h), jnp.asarray(d_h)
    tile_pix = wavefront.tiled_pixel_order(w, h)
    o_tile, d_tile = camera_mod.primary_rays(cam, w, h, pixel_xy=tile_pix)
    sun = np.array([0.3, 0.8, 0.5], np.float32); sun /= np.linalg.norm(sun)
    d_sun = jnp.asarray(np.broadcast_to(sun, (n, 3)))

    def isect_fn(any_hit=False, **kw):
        @jax.jit
        def f(nt_, ct_, o_, d_):
            pt2 = meta._replace(node_table=nt_, cluster_table=ct_)
            hh = tk.packet_intersect(
                pt2, o_, d_, any_hit=any_hit,
                t_max=100.0 if any_hit else 100000.0, **kw
            )
            if any_hit:
                return jnp.sum(hh.t)
            return jnp.sum(hh.t) + jnp.sum(hh.prim_id)

        return f

    combos = [
        ("base", {}),
        ("hl", dict(half_leaf=True)),
        ("hl+bl", dict(half_leaf=True, bit_loop=True)),
        ("hl+bl64", dict(half_leaf=True, bit_loop=True, max_groups=64)),
        ("hl+bl64+rp", dict(half_leaf=True, bit_loop=True, max_groups=64,
                            rank_push=True)),
    ]
    for tag, kw in combos:
        for pop, o_, d_, ah in (
            ("bounce", o_rand, d_rand, False),
            ("occl sun", o_rand, d_sun, True),
            ("primary", o_tile, d_tile, False),
        ):
            try:
                f = isect_fn(any_hit=ah, **kw)
                dt = _time(f, nt, ct, o_, d_, reps=3)
                print(f"  {tag:12s} {pop:9s}: {dt*1e3:8.1f} ms "
                      f"{n/dt/1e6:6.2f} Mray/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  {tag:12s} {pop:9s}: FAILED {str(e)[:120]}",
                      flush=True)


if __name__ == "__main__":
    main()
