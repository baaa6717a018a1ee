"""Analytic test scenes (no asset files needed).

The Cornell box is the rebuild's first end-to-end target and golden-test
fixture (SURVEY.md §7 step 3; BASELINE.json config 1) — the role
``resources/refrence.png`` + box.glb play for the reference (main.rs:77,
resources listing)."""

from __future__ import annotations

import numpy as np

from raytracer3_tpu.scene import types as scene_types


def _quad(p0, p1, p2, p3):
    """Two triangles for the quad p0-p1-p2-p3, wound so the geometric normal
    is -cross(p1-p0, p2-p0) — inward for the CCW-listed Cornell walls."""
    verts = np.asarray([p0, p1, p2, p3], np.float32)
    idx = np.asarray([[0, 2, 1], [0, 3, 2]], np.int32)
    n = -np.cross(verts[1] - verts[0], verts[2] - verts[0])
    n = n / np.linalg.norm(n)
    normals = np.tile(n, (4, 1)).astype(np.float32)
    uvs = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    return verts, normals, uvs, idx


def _box(center, size, yaw=0.0):
    """Axis-aligned box rotated by yaw around +y; returns quads list."""
    cx, cy, cz = center
    sx, sy, sz = size[0] / 2, size[1] / 2, size[2] / 2
    c, s = np.cos(yaw), np.sin(yaw)

    def rot(p):
        x, y, z = p
        return (cx + c * x + s * z, cy + y, cz - s * x + c * z)

    # 8 corners
    corners = {}
    for i, (dx, dy, dz) in enumerate(
        [(-1, -1, -1), (1, -1, -1), (1, -1, 1), (-1, -1, 1),
         (-1, 1, -1), (1, 1, -1), (1, 1, 1), (-1, 1, 1)]
    ):
        corners[i] = rot((dx * sx, dy * sy, dz * sz))
    quads = [
        (corners[4], corners[5], corners[6], corners[7]),  # top (+y)
        (corners[3], corners[2], corners[1], corners[0]),  # bottom
        (corners[0], corners[1], corners[5], corners[4]),  # -z
        (corners[2], corners[3], corners[7], corners[6]),  # +z
        (corners[1], corners[2], corners[6], corners[5]),  # +x
        (corners[3], corners[0], corners[4], corners[7]),  # -x
    ]
    return quads


def cornell_box(light_scale: float = 1.0) -> scene_types.Scene:
    """Classic Cornell box in a y-up, right-handed frame.

    Box spans [-1,1]×[0,2]×[-1,1]; camera looks in +z from z≈-3.4.
    Materials: white walls/floor/ceiling, red left (+x? no: left from the
    camera = -x) wall, green right wall, one area light, two boxes.
    Emission is pre-divided by scene_types.EMISSION_SCALE so shaded emissive
    matches the analytic value after the reference's ×12 (hit_logic.slang:35).
    """
    geoms = []  # (quads, material id)

    white = 0
    red = 1
    green = 2
    light = 3

    # Walls (normals point inward).
    geoms.append((_quad((-1, 0, -1), (1, 0, -1), (1, 0, 1), (-1, 0, 1)), white))  # floor (+y)
    geoms.append((_quad((-1, 2, 1), (1, 2, 1), (1, 2, -1), (-1, 2, -1)), white))  # ceiling (-y)
    geoms.append((_quad((1, 0, 1), (1, 2, 1), (-1, 2, 1), (-1, 0, 1)), white))  # back (-z)

    # Screen-right is -x with the Vulkan-style basis (camera looks +z, up +y,
    # right = fwd×up = -x), so the classic "red on the viewer's left" wall
    # sits at x=+1.
    geoms.append((_quad((-1, 0, 1), (-1, 2, 1), (-1, 2, -1), (-1, 0, -1)), green))  # x=-1 (+x normal)
    geoms.append((_quad((1, 0, -1), (1, 2, -1), (1, 2, 1), (1, 0, 1)), red))  # x=+1 (-x normal)

    # Area light slightly below ceiling, facing down.
    e = 0.35
    geoms.append((_quad((-e, 1.98, e), (e, 1.98, e), (e, 1.98, -e), (-e, 1.98, -e)), light))

    # Two boxes.
    for q in _box((-0.38, 0.6, 0.35), (0.55, 1.2, 0.55), yaw=np.deg2rad(18)):
        geoms.append((_quad(*q), white))
    for q in _box((0.42, 0.3, -0.25), (0.55, 0.6, 0.55), yaw=np.deg2rad(-17)):
        geoms.append((_quad(*q), white))

    positions, normals, uvs, indices, geo_id = [], [], [], [], []
    voff = 0
    for (verts, norms, uv, idx), mid in geoms:
        positions.append(verts)
        normals.append(norms)
        uvs.append(uv)
        indices.append(idx + voff)
        geo_id.extend([mid] * len(idx))
        voff += len(verts)

    base_color = np.asarray(
        [
            [0.73, 0.73, 0.73, 1.0],
            [0.65, 0.05, 0.05, 1.0],
            [0.12, 0.45, 0.15, 1.0],
            [0.78, 0.78, 0.78, 1.0],
        ],
        np.float32,
    )
    emission = np.zeros((4, 3), np.float32)
    emission[3] = (15.0 * light_scale) / scene_types.EMISSION_SCALE
    metallic = np.zeros(4, np.float32)
    roughness = np.ones(4, np.float32)

    return scene_types.make_scene(
        positions=np.concatenate(positions),
        normals=np.concatenate(normals),
        uvs=np.concatenate(uvs),
        indices=np.concatenate(indices),
        geo_id=np.asarray(geo_id, np.int32),
        base_color=base_color,
        emission=emission,
        metallic=metallic,
        roughness=roughness,
    )


def default_camera():
    """Camera framing the Cornell box."""
    from raytracer3_tpu.render.camera import Camera

    return Camera.create(
        position=(0.0, 1.0, -3.4),
        direction=(0.0, 0.0, 1.0),
        fov_y_deg=40.0,
        aspect=1.0,
    )
