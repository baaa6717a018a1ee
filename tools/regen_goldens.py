"""Regenerate golden images (tests/golden/*.npy) — run on CPU only:

    JAX_PLATFORMS=cpu python tools/regen_goldens.py

Goldens pin bit-stable CPU renders (SURVEY.md §4, the resources/refrence.png
workflow). Regenerate ONLY when the renderer changes intentionally; review
the diff images before committing.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden",
)


def cornell_reference():
    from raytracer3_tpu.ops import intersect
    from raytracer3_tpu.render import pathtracer
    from raytracer3_tpu.scene import analytic
    from raytracer3_tpu.utils.config import RenderSettings

    scene = analytic.cornell_box()
    cam = analytic.default_camera()
    v0, v1, v2 = scene.tri_vertices()
    isect = lambda o, d: intersect.intersect_bruteforce(o, d, v0, v1, v2)  # noqa: E731
    occl = lambda o, d, t: intersect.occluded_bruteforce(o, d, v0, v1, v2, t_max=t)  # noqa: E731
    s = RenderSettings(width=64, height=64, bounces=3, samples=1, diffuse_only=True)
    frame = jax.jit(lambda fi: pathtracer.render_image(scene, cam, s, fi, isect, occl))
    acc = np.zeros((64, 64, 3), np.float32)
    for i in range(16):
        acc += np.asarray(frame(jnp.uint32(i)))
    return acc / 16


def atrium_packet():
    """Atrium traced through the PRODUCTION packet kernel (interpret mode):
    pins the cluster-BVH build + Pallas traversal end-to-end."""
    from raytracer3_tpu.ops.pallas import traverse_kernel as tk
    from raytracer3_tpu.render import wavefront
    from raytracer3_tpu.scene import procedural
    from raytracer3_tpu.utils.config import RenderSettings

    scene, host_tris = procedural.atrium_scene(detail=1, return_host=True)
    cam = procedural.atrium_camera(aspect=1.0)
    backend = tk.packet_backend(
        host_tris=host_tris, interpret=True, sublanes=8
    )
    s = RenderSettings(width=48, height=48, bounces=2, samples=1, radiance_clamp=50.0)
    isect, occl = backend.bind(backend.arrays)
    frame = jax.jit(
        lambda fi: wavefront.render_frame(
            scene, cam, s, fi, isect, occl, sort_rays=True
        )
    )
    acc = np.zeros((48, 48, 3), np.float32)
    for i in range(4):
        acc += np.asarray(frame(jnp.uint32(i)))
    return acc / 4


def probe_display(res: int = 64, frames: int = 4):
    """Probe-GI pipeline display output (packed G-buffer → SIS → probes →
    SH → interpolate → AgX) on Cornell."""
    from raytracer3_tpu.ops import intersect
    from raytracer3_tpu.render import camera as camera_mod
    from raytracer3_tpu.render import pipelines
    from raytracer3_tpu.scene import analytic
    from raytracer3_tpu.utils.config import RenderSettings

    scene = analytic.cornell_box()
    cam = analytic.default_camera()
    backend = intersect.brute_backend(scene=scene)
    s = RenderSettings(width=res, height=res, bounces=1, samples=1)
    step, init_state = pipelines.probe_gi_pipeline(scene, s, backend=backend)
    state = init_state()
    disp = None
    for i in range(frames):
        disp, state = step(state, cam=cam, frame_index=jnp.uint32(i))
    return np.asarray(disp)


def textured():
    """Textured quad (checker texture through the bindless texture array):
    pins uv interpolation + bilinear sampling + material modulation."""
    from raytracer3_tpu.ops import intersect
    from raytracer3_tpu.render import camera as camera_mod
    from raytracer3_tpu.render import pathtracer
    from raytracer3_tpu.scene import types as scene_types
    from raytracer3_tpu.utils.config import RenderSettings

    # A floor quad + a small emissive quad above it.
    positions = np.asarray(
        [
            [-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1],  # floor
            [-0.4, 1.5, -0.4], [0.4, 1.5, -0.4], [0.4, 1.5, 0.4], [-0.4, 1.5, 0.4],
        ],
        np.float32,
    )
    normals = np.asarray(
        [[0, 1, 0]] * 4 + [[0, -1, 0]] * 4, np.float32
    )
    uvs = np.asarray(
        [[0, 0], [4, 0], [4, 4], [0, 4], [0, 0], [1, 0], [1, 1], [0, 1]],
        np.float32,
    )
    indices = np.asarray(
        [[0, 1, 2], [0, 2, 3], [4, 6, 5], [4, 7, 6]], np.int32
    )
    geo_id = np.asarray([0, 0, 1, 1], np.int32)
    cx, cy = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    checker = ((cx // 2 + cy // 2) % 2).astype(np.float32)
    tex = np.stack([checker, 0.3 + 0.4 * checker, 1.0 - checker], axis=-1)
    scene = scene_types.make_scene(
        positions=positions, normals=normals, uvs=uvs, indices=indices,
        geo_id=geo_id,
        base_color=np.asarray([[1, 1, 1, 1], [1, 1, 1, 1]], np.float32),
        emission=np.asarray([[0, 0, 0], [1.0, 0.95, 0.9]], np.float32),
        metallic=np.asarray([0, 0], np.float32),
        roughness=np.asarray([0.9, 1.0], np.float32),
        base_color_texture=np.asarray([0, -1], np.int32),
        textures=tex[None],
    )
    from raytracer3_tpu.render.camera import Camera

    cam = Camera.create(
        position=(0.0, 1.2, -2.6), direction=(0.0, -0.3, 1.0),
        fov_y_deg=55.0, aspect=1.0,
    )
    backend = intersect.brute_backend(scene=scene)
    isect, occl = backend.bind(backend.arrays)
    s = RenderSettings(width=64, height=64, bounces=2, samples=1)
    frame = jax.jit(
        lambda fi: pathtracer.render_image(scene, cam, s, fi, isect, occl)
    )
    acc = np.zeros((64, 64, 3), np.float32)
    for i in range(8):
        acc += np.asarray(frame(jnp.uint32(i)))
    return acc / 8


def textured_mip():
    """Checker floor through the MIP ATLAS path (scene/textures.py): native-
    res texture + ray-cone LOD in the wavefront renderer — pins atlas
    packing, trilinear sampling, and the footprint plumbing."""
    from raytracer3_tpu.ops import intersect
    from raytracer3_tpu.render import wavefront
    from raytracer3_tpu.render.camera import Camera
    from raytracer3_tpu.scene import types as scene_types
    from raytracer3_tpu.utils.config import RenderSettings

    positions = np.asarray(
        [
            [-8, 0, -8], [8, 0, -8], [8, 0, 8], [-8, 0, 8],
            [-0.4, 1.5, -0.4], [0.4, 1.5, -0.4], [0.4, 1.5, 0.4], [-0.4, 1.5, 0.4],
        ],
        np.float32,
    )
    normals = np.asarray([[0, 1, 0]] * 4 + [[0, -1, 0]] * 4, np.float32)
    uvs = np.asarray(
        [[0, 0], [32, 0], [32, 32], [0, 32], [0, 0], [1, 0], [1, 1], [0, 1]],
        np.float32,
    )
    indices = np.asarray(
        [[0, 1, 2], [0, 2, 3], [4, 6, 5], [4, 7, 6]], np.int32
    )
    geo_id = np.asarray([0, 0, 1, 1], np.int32)
    cx, cy = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    checker = ((cx // 4 + cy // 4) % 2).astype(np.float32)
    tex = np.stack([checker, 0.3 + 0.4 * checker, 1.0 - checker], axis=-1)
    scene = scene_types.make_scene(
        positions=positions, normals=normals, uvs=uvs, indices=indices,
        geo_id=geo_id,
        base_color=np.asarray([[1, 1, 1, 1], [1, 1, 1, 1]], np.float32),
        emission=np.asarray([[0, 0, 0], [2.0, 1.9, 1.8]], np.float32),
        metallic=np.asarray([0, 0], np.float32),
        roughness=np.asarray([0.9, 1.0], np.float32),
        base_color_texture=np.asarray([0, -1], np.int32),
        tex_images=[tex],
    )
    cam = Camera.create(
        position=(0.0, 0.6, -7.5), direction=(0.0, -0.12, 1.0),
        fov_y_deg=55.0, aspect=1.0,
    )
    backend = intersect.brute_backend(scene=scene)
    isect, occl = backend.bind(backend.arrays)
    s = RenderSettings(
        width=64, height=64, bounces=2, samples=1, tex_cone_angle=0.015,
    )
    frame = jax.jit(
        lambda fi: wavefront.render_frame(scene, cam, s, fi, isect, occl)
    )
    acc = np.zeros((64, 64, 3), np.float32)
    for i in range(8):
        acc += np.asarray(frame(jnp.uint32(i)))
    return acc / 8


GOLDENS = {
    "cornell_64_16f.npy": cornell_reference,
    "atrium_packet_48_4f.npy": atrium_packet,
    "probe_display_64_4f.npy": probe_display,
    "probe_display_128_8f.npy": lambda: probe_display(res=128, frames=8),
    "textured_mip_64_8f.npy": textured_mip,
    "textured_64_8f.npy": textured,
}


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    only = sys.argv[1:] or list(GOLDENS)
    for name in only:
        img = GOLDENS[name]()
        path = os.path.join(GOLDEN_DIR, name)
        np.save(path, img)
        print(f"{name}: shape={img.shape} mean={img.mean():.4f} -> {path}")


if __name__ == "__main__":
    main()
