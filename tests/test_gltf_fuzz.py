"""Robustness tests for the GLB parser: malformed containers must raise clean
ValueErrors, never crash or hang (the asset pipeline is the framework's main
untrusted-input surface)."""

import struct

import numpy as np
import pytest

from raytracer3_tpu.scene import gltf


def valid_glb_bytes():
    pos = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.asarray([[0, 1, 2]], np.int32)
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.glb")
        gltf.write_glb(p, pos, idx)
        return open(p, "rb").read()


class TestGLBFuzz:
    def test_truncated_header(self):
        with pytest.raises(Exception):
            gltf.load_glb(b"glTF")

    def test_wrong_version(self):
        data = bytearray(valid_glb_bytes())
        struct.pack_into("<I", data, 4, 1)  # version 1
        with pytest.raises(ValueError, match="version"):
            gltf.load_glb(bytes(data))

    def test_missing_json_chunk(self):
        raw = struct.pack("<III", 0x46546C67, 2, 12)
        with pytest.raises(ValueError, match="JSON"):
            gltf.load_glb(raw)

    def test_corrupt_json(self):
        data = bytearray(valid_glb_bytes())
        # JSON chunk starts at 20; stomp its first bytes.
        data[20:24] = b"\xff\xff\xff\xff"
        with pytest.raises(Exception):
            gltf.load_glb(bytes(data))

    def test_truncated_bin_chunk(self):
        data = valid_glb_bytes()
        with pytest.raises(Exception):
            gltf.load_glb(data[: len(data) - 8])

    def test_no_geometry(self):
        import json

        js = json.dumps({"asset": {"version": "2.0"}, "meshes": []}).encode()
        js += b" " * ((-len(js)) % 4)
        raw = struct.pack("<III", 0x46546C67, 2, 12 + 8 + len(js))
        raw += struct.pack("<II", len(js), 0x4E4F534A) + js
        with pytest.raises(ValueError, match="no triangle geometry"):
            gltf.load_glb(raw)

    def test_random_bitflips_never_hang(self):
        base = valid_glb_bytes()
        rng = np.random.default_rng(0)
        for _ in range(50):
            data = bytearray(base)
            for _ in range(3):
                i = rng.integers(12, len(data))
                data[i] = rng.integers(0, 256)
            try:
                gltf.load_glb(bytes(data))
            except Exception:
                pass  # any clean exception is acceptable


class TestWriteGlbMulti:
    def test_roundtrip_atrium_through_ingest(self):
        from raytracer3_tpu.scene import gltf as gltf_mod
        from raytracer3_tpu.scene import procedural

        kw = procedural.atrium(detail=1)
        blob = gltf_mod.write_glb_multi(
            None,
            kw["positions"], kw["normals"], kw["uvs"], kw["indices"],
            kw["geo_id"], kw["base_color"], kw["emission"],
            kw["metallic"], kw["roughness"],
        )
        md = gltf_mod.load_glb(blob)
        assert md.indices.shape[0] == kw["indices"].shape[0]
        # Per-material triangle counts survive the primitive grouping.
        import collections

        a = collections.Counter(kw["geo_id"].tolist())
        b = collections.Counter(md.geo_id.tolist())
        assert a == b
        np.testing.assert_allclose(
            md.base_color[:, :3],
            np.asarray(kw["base_color"])[:, :3], atol=1e-6,
        )
        np.testing.assert_allclose(md.emission, kw["emission"], rtol=1e-5)
        # Triangle SETS match per material (order may differ).
        va = np.sort(kw["positions"][kw["indices"]].reshape(-1, 9), axis=0)
        vb = np.sort(md.positions[md.indices].reshape(-1, 9), axis=0)
        np.testing.assert_allclose(va, vb, atol=1e-6)
