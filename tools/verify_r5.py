"""Verify-skill drive for round-5 changes: render the 300k-tri atrium
through treelet_backend with SEG_LAUNCH_CHUNK patched small so the launch
takes the RAGGED chunk path (5 segments, chunk 3 → sizes [3, 2]), and the
wavefront on the split-NEE lane-diet path (occluded_fn, no fused_fn,
lane_diet=True) — the two code paths edited this round. Writes a PNG."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
from raytracer3_tpu.scene import procedural
from raytracer3_tpu.ops.pallas import traverse_kernel as tk
from raytracer3_tpu.ops import treelets, rng as rng_mod
from raytracer3_tpu.render import film as film_mod, wavefront, postprocess
from raytracer3_tpu.utils import runtime, image as image_io
from raytracer3_tpu.utils.config import RenderSettings

runtime.init_compilation_cache()
# 1024x640 = 655360 lanes = exactly 5 segments at 1024 sublanes; chunk 3
# forces the ragged split [3, 2] on every sorted launch.
treelets.SEG_LAUNCH_CHUNK = 3
scene, tris = procedural.atrium_scene(detail=8, return_host=True)
print(f"tris={tris[0].shape[0]}", flush=True)
cam = procedural.atrium_camera(aspect=1024 / 640)
t0 = time.perf_counter()
backend = tk.packet_backend(host_tris=tris)  # routes to treelet_backend
print(f"backend build {time.perf_counter()-t0:.1f}s", flush=True)
settings = RenderSettings(width=1024, height=640, bounces=2, samples=1,
                          radiance_clamp=50.0, lane_diet=True)
bn = jnp.asarray(rng_mod.generate_blue_noise(64))

@jax.jit
def frame(scene_, bvh, bn_, film, fi):
    isect, occl = backend.bind(bvh)
    rad, traced = wavefront.render_frame(
        scene_, cam, settings, fi, isect, occl,
        sort_rays=not backend.self_sorting, blue_noise=bn_,
        return_stats=True, primary_fn=backend.bind_primary(bvh))
    # No fused_fn: the split _nee_contribution path (wavefront.py:287).
    return film_mod.accumulate_progressive(film, rad), traced

film = film_mod.Film.create(640, 1024)
t0 = time.perf_counter()
for i in range(4):
    film, traced = frame(scene, backend.arrays, bn, film, jnp.uint32(i))
    tv = int(runtime.pull_guarded(traced, timeout=2400.0, what=f"frame {i}"))
    print(f"frame {i}: {time.perf_counter()-t0:.1f}s traced={tv}", flush=True)
    t0 = time.perf_counter()
disp = np.asarray(postprocess.postprocess(film.accum))
image_io.write_png("/tmp/verify_r5.png", disp)
print("wrote /tmp/verify_r5.png", disp.shape, disp.dtype, flush=True)
