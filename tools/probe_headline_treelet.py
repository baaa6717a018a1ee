"""Headline A/B: small-scene packet path vs the treelet backend (which
carries every round-3 kernel win: SAH leaf-24 clusters, bit-loop pops,
half-leaf predication, rank-select pushes, step t-cull, 1024-sublane
sorted segments). Same process, full 4-bounce NEE frames."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import bench
from raytracer3_tpu.ops.pallas import traverse_kernel as tk
from raytracer3_tpu.scene import procedural
from raytracer3_tpu.utils import runtime

runtime.init_compilation_cache()
scene, tris = procedural.atrium_scene(detail=2, return_host=True)
cam = procedural.atrium_camera(aspect=960 / 544)
r = bench.run_config("headline_packet", scene, tris, cam, 960, 544, 4,
                     n_frames=6)
print(json.dumps(r), flush=True)
bt = tk.packet_backend(host_tris=tris, force_treelets=True)
r = bench.run_config("headline_treelet", scene, tris, cam, 960, 544, 4,
                     n_frames=6, backend=bt)
print(json.dumps(r), flush=True)
# Density: the headline at 4 spp through the treelet path (sample batching
# is a measured lever on the big scenes; the small scene may batch too).
r = bench.run_config("headline_treelet_s4", scene, tris, cam, 960, 544, 4,
                     n_frames=6, samples=4, backend=bt)
print(json.dumps(r), flush=True)
