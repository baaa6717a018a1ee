"""Flagship atrium render on the real TPU — the verify-skill drive recipe
as a script: 8 progressive frames through packet_backend + wavefront PT,
honest per-frame forcing via the traced-ray scalar, PNG to /tmp."""
import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
from raytracer3_tpu.scene import procedural
from raytracer3_tpu.ops.pallas import traverse_kernel as tk
from raytracer3_tpu.ops import rng as rng_mod
from raytracer3_tpu.render import film as film_mod, wavefront, postprocess
from raytracer3_tpu.utils import runtime, image as image_io
from raytracer3_tpu.utils.config import RenderSettings

runtime.init_compilation_cache()
scene, tris = procedural.atrium_scene(detail=2, return_host=True)
cam = procedural.atrium_camera(aspect=960/544)
backend = tk.packet_backend(host_tris=tris)
settings = RenderSettings(width=960, height=544, bounces=4, samples=1, radiance_clamp=50.0)
bn = jnp.asarray(rng_mod.generate_blue_noise(64))

@jax.jit
def frame(scene_, bvh, bn_, film, fi):
    isect, occl = backend.bind(bvh)
    rad, traced = wavefront.render_frame(
        scene_, cam, settings, fi, isect, occl, sort_rays=True,
        blue_noise=bn_, return_stats=True)
    return film_mod.accumulate_progressive(film, rad), traced

film = film_mod.Film.create(544, 960)
t0 = time.perf_counter()
traced_first = None
for i in range(8):
    film, traced = frame(scene, backend.arrays, bn, film, jnp.uint32(i))
    tv = int(traced)  # scalar pull forces each frame
    if traced_first is None:
        traced_first = tv
        print(f"first frame {time.perf_counter()-t0:.1f}s traced={tv} "
              f"(nominal={960*544*7})", flush=True)
t0 = time.perf_counter()
disp = np.asarray(postprocess.postprocess(film.accum))
print(f"pull display {time.perf_counter()-t0:.1f}s", flush=True)
image_io.write_png("/tmp/verify_atrium_r3.png", disp)
print("wrote /tmp/verify_atrium_r3.png", disp.shape, disp.dtype, flush=True)
