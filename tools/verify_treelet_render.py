"""Verify-skill drive for the treelet production path: render the
Sponza-scale atrium (300k tris) through treelet_backend — exercising the
bit-loop/BL64 pop defaults — on the real TPU, write a PNG for inspection."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
from raytracer3_tpu.scene import procedural
from raytracer3_tpu.ops.pallas import traverse_kernel as tk
from raytracer3_tpu.ops import rng as rng_mod
from raytracer3_tpu.render import film as film_mod, wavefront, postprocess
from raytracer3_tpu.utils import runtime, image as image_io
from raytracer3_tpu.utils.config import RenderSettings

runtime.init_compilation_cache()
scene, tris = procedural.atrium_scene(detail=8, return_host=True)
print(f"tris={tris[0].shape[0]}", flush=True)
cam = procedural.atrium_camera(aspect=960 / 544)
t0 = time.perf_counter()
backend = tk.packet_backend(host_tris=tris)  # routes to treelet_backend
print(f"backend build {time.perf_counter()-t0:.1f}s", flush=True)
settings = RenderSettings(width=960, height=544, bounces=2, samples=1,
                          radiance_clamp=50.0)
bn = jnp.asarray(rng_mod.generate_blue_noise(64))

@jax.jit
def frame(scene_, bvh, bn_, film, fi):
    isect, occl = backend.bind(bvh)
    rad, traced = wavefront.render_frame(
        scene_, cam, settings, fi, isect, occl,
        sort_rays=not backend.self_sorting, blue_noise=bn_,
        return_stats=True, primary_fn=backend.bind_primary(bvh))
    return film_mod.accumulate_progressive(film, rad), traced

film = film_mod.Film.create(544, 960)
t0 = time.perf_counter()
for i in range(4):
    film, traced = frame(scene, backend.arrays, bn, film, jnp.uint32(i))
    tv = int(runtime.pull_guarded(traced, timeout=2400.0, what=f"frame {i}"))
    print(f"frame {i}: {time.perf_counter()-t0:.1f}s traced={tv}", flush=True)
    t0 = time.perf_counter()
disp = np.asarray(postprocess.postprocess(film.accum))
image_io.write_png("/tmp/verify_treelet_r3.png", disp)
print("wrote /tmp/verify_treelet_r3.png", disp.shape, disp.dtype, flush=True)
