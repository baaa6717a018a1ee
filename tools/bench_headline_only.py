"""Headline-config-only bench (atrium 19k, 960x544, 4-bounce NEE) — for
fast same-day A/Bs of frame-level changes without the Sponza compiles."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import bench
from raytracer3_tpu.scene import procedural
from raytracer3_tpu.utils import runtime

runtime.init_compilation_cache()
scene, tris = procedural.atrium_scene(detail=2, return_host=True)
cam = procedural.atrium_camera(aspect=960 / 544)
r = bench.run_config("headline", scene, tris, cam, 960, 544, 4, n_frames=6)
print(json.dumps(r))
