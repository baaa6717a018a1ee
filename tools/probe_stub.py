#!/usr/bin/env python3
"""Frame-side (non-traversal) cost attribution at wavefront scale.

ROADMAP 'Frame-side': the stub-intersector sponza1080 frame costs
~0.34-0.54 s/spp — shading/NEE/RNG/film with traversal stubbed out — and
round 3 never attributed it. This probe times each stub-frame STAGE in
isolation at a given lane count, on-chip, with honest scalar-pull timing:

  surface   hit_surface_info: chunked [N,16] shade-row gather + one-hot
            material matmul + mip-atlas sampling
  neeprep   _nee_prepare: light-CDF searchsorted + light/env-alias row
            gathers + BRDF evaluate + MIS weight
  brdf      surface_sample (GGX+Lambert mix, VNDF)
  envpdf    _env_radiance_pdf: rgb9e5 gather + luminance pdf recompute
  rng       sampler draws per bounce (3x next3 + next1)
  sortkey   sort_key_pos_dir + argsort + inverse argsort (driver's sort
            half; gathers are probe_driver territory)
  film      radiance accumulate + where-masks + reshape

Usage (real chip, quiet machine):
  python tools/probe_stub.py --lanes 2088960 --iters 4
  python tools/probe_stub.py --lanes 33423360 --iters 2   # 1080p@16spp
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _pull(x, what):
    from raytracer3_tpu.utils import runtime

    return runtime.pull_guarded(x, timeout=1200.0, what=what)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--lanes", type=int, default=2088960)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--detail", type=int, default=8)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    import bench
    from raytracer3_tpu.ops import brdf, mathx, rng
    from raytracer3_tpu.render import pathtracer, wavefront
    from raytracer3_tpu.scene import types as scene_types
    from raytracer3_tpu.utils import runtime
    from raytracer3_tpu.utils.config import RenderSettings

    runtime.init_compilation_cache()
    scene, tris = bench.sponza_world_scene(detail=args.detail)
    n = args.lanes
    settings = RenderSettings(width=1920, height=1088, bounces=4, samples=1)

    # Synthetic wavefront state (host-built; upload once).
    rs = np.random.default_rng(0)
    pid = jnp.asarray(
        rs.integers(0, int(scene.num_triangles), n), jnp.int32
    )
    uv = jnp.asarray(rs.random((n, 2), np.float32) * 0.5)
    pos = jnp.asarray(rs.random((n, 3), np.float32) * 20.0 - 10.0)
    d = mathx.normalize(jnp.asarray(rs.random((n, 3), np.float32) - 0.5))
    alive = jnp.asarray(rs.random(n) < 0.7)
    sampler = rng.Sampler.from_pixels(
        jnp.zeros((n, 2), jnp.int32).at[:, 0].set(jnp.arange(n) % 1920),
        jnp.uint32(1),
    )
    u3 = jnp.asarray(rs.random((n, 3), np.float32))

    stages = {}

    def bench_stage(name, fn, *a):
        jfn = jax.jit(fn)
        out = jfn(*a)
        _pull(jax.tree.leaves(out)[0].ravel()[0], f"{name} compile")
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = jfn(*a)
            _pull(jax.tree.leaves(out)[0].ravel()[0], name)
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        stages[name] = dt
        print(f"  {name:<9} {dt:9.1f} ms", flush=True)

    print(f"lanes={n} tris={int(scene.num_triangles)}", flush=True)

    def f_surface(scene_, pid_, uv_):
        s = scene_types.hit_surface_info(scene_, pid_, uv_)
        return s.albedo.sum() + s.normal.sum() + s.roughness.sum()

    bench_stage("surface", f_surface, scene, pid, uv)

    def f_neeprep(scene_, pos_, d_, u3_, s_seed):
        s = scene_types.hit_surface_info(scene_, pid, uv)
        nrm = pathtracer._face_forward(s.normal, -d_)
        smp = rng.Sampler(seed=s_seed, index=jnp.uint32(3))
        sh_o, sh_d, sh_t, pre_ok, contrib, smp = pathtracer._nee_prepare(
            scene_, pos_, nrm, -d_, s, u3_, smp, settings, alive_mask=alive
        )
        return sh_o.sum() + contrib.sum() + sh_t.sum()

    bench_stage("neeprep", f_neeprep, scene, pos, d, u3, sampler.seed)

    def f_brdf(scene_, d_, u3_):
        s = scene_types.hit_surface_info(scene_, pid, uv)
        nrm = pathtracer._face_forward(s.normal, -d_)
        onb = mathx.build_orthonormal_basis(nrm)
        smp = brdf.surface_sample(
            s.albedo, s.roughness, s.metalness,
            mathx.to_local(onb, -d_), u3_,
        )
        return smp.wi.sum() + smp.value_over_pdf.sum()

    bench_stage("brdf", f_brdf, scene, d, u3)

    def f_envpdf(scene_, d_):
        env, pdf = pathtracer._env_radiance_pdf(scene_, d_)
        return env.sum() + pdf.sum()

    bench_stage("envpdf", f_envpdf, scene, d)

    def f_rng(seed):
        smp = rng.Sampler(seed=seed, index=jnp.uint32(0))
        tot = jnp.float32(0)
        for _ in range(3):
            u, smp = smp.next3()
            tot = tot + u.sum()
        u1, smp = smp.next1()
        return tot + u1.sum()

    bench_stage("rng", f_rng, sampler.seed)

    def f_sortkey(pos_, d_, alive_):
        key = wavefront.sort_key_pos_dir(
            pos_, d_, alive_, (jnp.zeros(3), jnp.ones(3) * 20.0)
        )
        perm = jnp.argsort(key)
        inv = jnp.argsort(perm)
        return perm.sum() + inv.sum()

    bench_stage("sortkey", f_sortkey, pos, d, alive)

    def f_film(pos_, alive_):
        r = jnp.where(alive_[:, None], pos_ * 0.1, 0.0)
        r = jnp.minimum(r + pos_ * 0.01, 50.0)
        return r.sum()

    bench_stage("film", f_film, pos, alive)

    total = sum(stages.values())
    print(f"  {'SUM':<9} {total:9.1f} ms (per bounce-ish; surface counted "
          "once per stage that refetches it)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
