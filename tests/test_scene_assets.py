"""Tests for glTF ingest (scene/gltf.py), the processed-asset cache
(scene/assets.py), procedural scenes, and EXR IO — the asset-pipeline layer
(reference src/assets/mod.rs behavior)."""

import os

import numpy as np
import pytest

from raytracer3_tpu.scene import assets, gltf, procedural
from raytracer3_tpu.utils import image as im


def make_test_glb(path, **kw):
    # Unit quad, 2 triangles.
    pos = np.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    idx = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    nrm = np.tile(np.asarray([0, 0, 1], np.float32), (4, 1))
    uv = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    gltf.write_glb(path, pos, idx, normals=nrm, uvs=uv, **kw)


class TestGLB:
    def test_roundtrip(self, tmp_path):
        p = str(tmp_path / "quad.glb")
        make_test_glb(
            p, base_color=(0.2, 0.4, 0.6, 1.0), metallic=0.3, roughness=0.5,
            emissive=(1.0, 2.0, 3.0),
        )
        md = gltf.load_glb(p)
        assert md.positions.shape == (4, 3)
        assert md.indices.shape == (2, 3)
        np.testing.assert_allclose(md.base_color[0], [0.2, 0.4, 0.6, 1.0], atol=1e-6)
        assert md.metallic[0] == pytest.approx(0.3)
        assert md.roughness[0] == pytest.approx(0.5)
        np.testing.assert_allclose(md.emission[0], [1, 2, 3], atol=1e-6)
        np.testing.assert_allclose(md.normals, [[0, 0, 1]] * 4, atol=1e-6)

    def test_missing_normals_generates_face_normals(self, tmp_path):
        p = str(tmp_path / "flat.glb")
        pos = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        idx = np.asarray([[0, 1, 2]], np.int32)
        gltf.write_glb(p, pos, idx)
        md = gltf.load_glb(p)
        np.testing.assert_allclose(md.normals, [[0, 0, 1]] * 3, atol=1e-5)

    def test_to_device_scene(self, tmp_path):
        p = str(tmp_path / "quad.glb")
        make_test_glb(p, emissive=(0.5, 0.5, 0.5))
        scene = gltf.mesh_to_scene(gltf.load_glb(p))
        assert scene.num_triangles == 2
        assert int(scene.emissive.count) == 2  # emissive quad

    def test_bad_magic_rejected(self, tmp_path):
        p = tmp_path / "bad.glb"
        p.write_bytes(b"nope" + b"\0" * 100)
        with pytest.raises(ValueError, match="not a GLB"):
            gltf.load_glb(str(p))


class TestAssetCache:
    def test_cache_hit_and_invalidation(self, tmp_path):
        src = str(tmp_path / "m.glb")
        cache = str(tmp_path / "cache")
        make_test_glb(src)
        md1 = assets.load_glb_cached(src, cache_dir=cache)
        files1 = set(os.listdir(cache))
        assert any(f.endswith(".npz") for f in files1)
        # Second load: cache hit, same content.
        md2 = assets.load_glb_cached(src, cache_dir=cache)
        np.testing.assert_array_equal(md1.positions, md2.positions)
        assert set(os.listdir(cache)) == files1
        # Modify source → new cache entry (hash invalidation).
        make_test_glb(src, base_color=(1.0, 0.0, 0.0, 1.0))
        md3 = assets.load_glb_cached(src, cache_dir=cache)
        assert len(os.listdir(cache)) == len(files1) + 1
        np.testing.assert_allclose(md3.base_color[0], [1, 0, 0, 1], atol=1e-6)

    def test_blue_noise_cache(self, tmp_path):
        bn1 = assets.blue_noise_cached(size=16, cache_dir=str(tmp_path))
        bn2 = assets.blue_noise_cached(size=16, cache_dir=str(tmp_path))
        np.testing.assert_array_equal(bn1, bn2)
        assert bn1.shape == (16, 16)


class TestProcedural:
    def test_atrium_geometry_valid(self):
        kw = procedural.atrium(detail=1)
        t = kw["indices"]
        assert t.shape[0] > 5000
        assert t.min() >= 0 and t.max() < len(kw["positions"])
        assert np.isfinite(kw["positions"]).all()
        n = np.linalg.norm(kw["normals"], axis=-1)
        np.testing.assert_allclose(n, 1.0, atol=1e-4)
        # Has an emissive material (the skylight).
        assert kw["emission"].max() > 0

    def test_detail_scaling(self):
        t1 = procedural.atrium(detail=1)["indices"].shape[0]
        t2 = procedural.atrium(detail=2)["indices"].shape[0]
        assert t2 > 2.5 * t1

    def test_sky_hdr(self):
        sky = procedural.sky_equirect(32, 64)
        assert sky.shape == (32, 64, 3)
        assert np.isfinite(sky).all() and (sky >= 0).all()
        assert sky.max() > 100.0  # sun disc is HDR-bright
        # Upper half (sky) brighter blue than ground.
        assert sky[:12, :, 2].mean() > sky[-8:, :, 2].mean()


class TestEXR:
    def test_roundtrip_uncompressed(self, tmp_path):
        p = str(tmp_path / "t.exr")
        img = np.random.rand(9, 13, 3).astype(np.float32) * 50
        im.write_exr(p, img)
        back = im.read_exr(p)
        np.testing.assert_array_equal(back, img)

    def test_rejects_garbage(self, tmp_path):
        p = tmp_path / "g.exr"
        p.write_bytes(b"\x00" * 64)
        with pytest.raises(ValueError):
            im.read_exr(str(p))


class TestAsyncPipeline:
    def test_background_load_and_world_integration(self, tmp_path):
        """Async asset processing (reference: bevy multi_threaded asset
        threads + the loaded_assets upload system, world/mod.rs:83-101)."""
        import time

        from raytracer3_tpu.app import world as world_mod

        paths = []
        for k in range(3):
            p = str(tmp_path / f"m{k}.glb")
            make_test_glb(p)
            paths.append(p)

        w = world_mod.World()
        tickets = [
            w.load_glb_async(p, name=f"m{k}") for k, p in enumerate(paths)
        ]
        assert len(set(tickets)) == 3
        # Pump update() like a frame loop until everything lands.
        deadline = time.time() + 30.0
        spawned = []
        while len(spawned) < 3 and time.time() < deadline:
            spawned.extend(w.update())
            time.sleep(0.01)
        assert len(spawned) == 3
        assert w.pool.instance_count == 3
        assert {e.name for e in spawned} == {"m0", "m1", "m2"}
        # The scene builds from the async-loaded meshes.
        scene = w.scene()
        assert int(scene.num_triangles) >= 3

    def test_worker_exception_surfaces_in_poll(self, tmp_path):
        from raytracer3_tpu.scene import assets as assets_mod
        import pytest
        import time

        p = str(tmp_path / "broken.glb")
        with open(p, "wb") as f:
            f.write(b"not a glb at all")
        pipe = assets_mod.AsyncAssetPipeline()
        pipe.load(p)
        deadline = time.time() + 30.0
        with pytest.raises(ValueError):
            while time.time() < deadline:
                pipe.poll()
                time.sleep(0.01)
