"""Independent-exporter GLB fixtures (VERDICT r4 item 4).

Every GLB here is hand-constructed at BYTE level (struct + json + numpy
buffers) — none of it touches scene.gltf.write_glb — replicating the
layouts real exporters emit and the reference ingests through the gltf
crate (src/assets/mod.rs:224-244):

- interleaved vertex buffers (one bufferView, byteStride 32, accessors at
  byteOffset 0/12/24 — Blender's default layout),
- u16 indices,
- multi-primitive meshes with per-primitive materials,
- TRS-node → matrix-node hierarchies (column-major matrix),
- normalized-u8 VEC4 COLOR_0,
- 4-byte chunk alignment with space/zero padding (per the GLB spec).
"""

import json
import struct

import numpy as np
import pytest

from raytracer3_tpu.scene import gltf


def _pad4(b: bytes, fill: bytes) -> bytes:
    return b + fill * (-len(b) % 4)


def make_glb(gltf_json: dict, bin_blob: bytes) -> bytes:
    """Assemble a GLB container by hand (spec 4.4: 12-byte header, JSON
    chunk padded with 0x20, BIN chunk padded with zeros)."""
    js = _pad4(json.dumps(gltf_json).encode(), b" ")
    bb = _pad4(bin_blob, b"\x00")
    total = 12 + 8 + len(js) + 8 + len(bb)
    out = struct.pack("<III", 0x46546C67, 2, total)
    out += struct.pack("<II", len(js), 0x4E4F534A) + js
    out += struct.pack("<II", len(bb), 0x004E4942) + bb
    return out


# Quad in the XY plane, CCW; per-vertex normal +Z, uv = xy.
_POS = np.array(
    [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
)
_NRM = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
_UV = _POS[:, :2].copy()
_IDX_U16 = np.array([0, 1, 2, 0, 2, 3], np.uint16)


def _interleaved_quad_glb(nodes, scenes, extra=None):
    """GLB with mesh 0 = two primitives:
    prim A: interleaved pos/normal/uv (stride 32) + u16 indices, material 0
    prim B: tightly-packed pos + normalized-u8 VEC4 COLOR_0, NON-indexed,
            material 1 (one triangle, shifted +4 in x so it's distinct).
    """
    # --- binary layout, hand-packed ---
    inter = np.zeros((4, 8), np.float32)  # pos(3) nrm(3) uv(2), stride 32
    inter[:, 0:3] = _POS
    inter[:, 3:6] = _NRM
    inter[:, 6:8] = _UV
    blob = inter.tobytes()  # bufferView 0: interleaved, 128 B
    off_idx = len(blob)
    blob += _IDX_U16.tobytes()  # bufferView 1: u16 indices, 12 B
    blob = _pad4(blob, b"\x00")
    off_posb = len(blob)
    pos_b = _POS[:3].copy()
    pos_b[:, 0] += 4.0
    blob += pos_b.tobytes()  # bufferView 2: prim B positions
    off_col = len(blob)
    col_u8 = np.array(
        [[255, 0, 0, 255], [0, 255, 0, 255], [0, 0, 255, 255]], np.uint8
    )
    blob += col_u8.tobytes()  # bufferView 3: normalized u8 VEC4 COLOR_0

    g = {
        "asset": {"version": "2.0", "generator": "hand-packed fixture"},
        "buffers": [{"byteLength": len(blob)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 128, "byteStride": 32},
            {"buffer": 0, "byteOffset": off_idx, "byteLength": 12},
            {"buffer": 0, "byteOffset": off_posb, "byteLength": 36},
            {"buffer": 0, "byteOffset": off_col, "byteLength": 12},
        ],
        "accessors": [
            # 0/1/2: POSITION / NORMAL / TEXCOORD_0 into the interleaved view
            {"bufferView": 0, "byteOffset": 0, "componentType": 5126,
             "count": 4, "type": "VEC3", "min": [0, 0, 0], "max": [1, 1, 0]},
            {"bufferView": 0, "byteOffset": 12, "componentType": 5126,
             "count": 4, "type": "VEC3"},
            {"bufferView": 0, "byteOffset": 24, "componentType": 5126,
             "count": 4, "type": "VEC2"},
            # 3: u16 indices
            {"bufferView": 1, "componentType": 5123, "count": 6,
             "type": "SCALAR"},
            # 4: prim B positions (tight)
            {"bufferView": 2, "componentType": 5126, "count": 3,
             "type": "VEC3"},
            # 5: COLOR_0 normalized u8 VEC4
            {"bufferView": 3, "componentType": 5121, "count": 3,
             "type": "VEC4", "normalized": True},
        ],
        "materials": [
            {"pbrMetallicRoughness": {
                "baseColorFactor": [0.8, 0.1, 0.1, 1.0],
                "metallicFactor": 0.0, "roughnessFactor": 0.5}},
            {"pbrMetallicRoughness": {
                "baseColorFactor": [0.1, 0.8, 0.1, 1.0]},
             "emissiveFactor": [1.0, 2.0, 3.0]},
        ],
        "meshes": [{"primitives": [
            {"attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
             "indices": 3, "material": 0},
            {"attributes": {"POSITION": 4, "COLOR_0": 5}, "material": 1},
        ]}],
        "nodes": nodes,
        "scenes": scenes,
        "scene": 0,
    }
    if extra:
        g.update(extra)
    return make_glb(g, blob)


def test_interleaved_u16_multiprim_identity():
    """Interleaved accessors, u16 indices, two primitives, identity node."""
    data = _interleaved_quad_glb(
        nodes=[{"mesh": 0}], scenes=[{"nodes": [0]}]
    )
    md = gltf.load_glb(data)
    # prim A: 4 verts, 2 tris; prim B: 3 verts, 1 tri (non-indexed).
    assert md.positions.shape == (7, 3)
    assert md.indices.shape == (3, 3)
    np.testing.assert_allclose(md.positions[:4], _POS, atol=0)
    np.testing.assert_allclose(md.normals[:4], _NRM, atol=1e-6)
    np.testing.assert_allclose(md.uvs[:4], _UV, atol=0)
    np.testing.assert_array_equal(
        md.indices[:2], _IDX_U16.reshape(2, 3).astype(np.int32)
    )
    # prim B triangles index past prim A's vertices, material 1.
    np.testing.assert_array_equal(md.indices[2], [4, 5, 6])
    np.testing.assert_array_equal(md.geo_id, [0, 0, 1])
    assert md.positions[4, 0] == pytest.approx(4.0)
    # materials
    np.testing.assert_allclose(md.base_color[0], [0.8, 0.1, 0.1, 1.0])
    assert md.roughness[0] == pytest.approx(0.5)
    np.testing.assert_allclose(md.emission[1], [1.0, 2.0, 3.0])
    # COLOR_0: u8-normalized, alpha dropped; prim A lanes default to 1.
    assert md.colors is not None
    np.testing.assert_allclose(md.colors[:4], 1.0)
    np.testing.assert_allclose(
        md.colors[4:], np.eye(3, dtype=np.float32), atol=1e-6
    )


def test_trs_then_matrix_hierarchy():
    """Root node with TRS (T=[1,2,3], R=90° about Z, S=2) and a child with a
    column-major matrix translating +1 in z — the world transform must be
    T·R·S · M(child), matching glTF's composition order."""
    q = [0.0, 0.0, np.sin(np.pi / 4), np.cos(np.pi / 4)]  # 90° about Z
    child_matrix = [  # column-major: identity + translation (0, 0, 1)
        1, 0, 0, 0,
        0, 1, 0, 0,
        0, 0, 1, 0,
        0, 0, 1, 1,
    ]
    data = _interleaved_quad_glb(
        nodes=[
            {"translation": [1, 2, 3], "rotation": q, "scale": [2, 2, 2],
             "children": [1]},
            {"matrix": child_matrix, "mesh": 0},
        ],
        scenes=[{"nodes": [0]}],
    )
    md = gltf.load_glb(data)
    # Expected: independent composition with exact 90° rotation.
    rot = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    child = np.eye(4, dtype=np.float32)
    child[:3, 3] = [0, 0, 1]
    world = np.eye(4, dtype=np.float32)
    world[:3, :3] = rot * 2.0
    world[:3, 3] = [1, 2, 3]
    world = world @ child
    exp = _POS @ world[:3, :3].T + world[:3, 3]
    np.testing.assert_allclose(md.positions[:4], exp, atol=1e-5)
    # Normals rotate (inverse-transpose kills the uniform scale) and stay
    # unit length: +Z → +Z under a Z rotation.
    np.testing.assert_allclose(md.normals[:4], _NRM, atol=1e-5)


def test_shared_mesh_two_instances():
    """Two nodes referencing the SAME mesh (real exporters emit this for
    instanced placement) — geometry must be emitted once per node with its
    own transform."""
    data = _interleaved_quad_glb(
        nodes=[
            {"mesh": 0},
            {"mesh": 0, "translation": [10, 0, 0]},
        ],
        scenes=[{"nodes": [0, 1]}],
    )
    md = gltf.load_glb(data)
    assert md.positions.shape == (14, 3)
    assert md.indices.shape == (6, 3)
    np.testing.assert_allclose(
        md.positions[7:11], _POS + np.array([10, 0, 0], np.float32)
    )
    # Second instance's triangles index into its own vertex block.
    assert md.indices[3:].min() >= 7
    np.testing.assert_array_equal(md.geo_id, [0, 0, 1, 0, 0, 1])


def test_chunk_padding_and_trailing_junk_tolerance():
    """JSON chunk space-padded and BIN zero-padded to 4 bytes (the spec;
    exporters rely on it). Also: accessors whose bufferView sits at a
    non-zero byteOffset after padding must land exactly."""
    # _interleaved_quad_glb already pads both chunks; force odd JSON length
    # by a generator string that isn't 4-aligned.
    data = _interleaved_quad_glb(
        nodes=[{"mesh": 0}], scenes=[{"nodes": [0]}],
        extra={"asset": {"version": "2.0", "generator": "x"}},
    )
    md = gltf.load_glb(data)
    np.testing.assert_allclose(md.positions[:4], _POS)


def test_mesh_to_scene_roundtrip_external():
    """The hand-packed GLB flows through make_scene (pools, materials,
    vertex colors) without the writer ever being involved."""
    data = _interleaved_quad_glb(nodes=[{"mesh": 0}], scenes=[{"nodes": [0]}])
    md = gltf.load_glb(data)
    scene = gltf.mesh_to_scene(md)
    assert int(scene.indices.shape[0]) == 3
    # Emissive table picked up material 1's emissiveFactor.
    assert scene.emissive.tri_ids.shape[0] >= 1
