"""Tests for the viewer loop (camera controls + accumulation reset), the
checkpoint/resume subsystem, the profiling helpers, and the mesh encoder CLI."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from raytracer3_tpu.app import viewer as viewer_mod
from raytracer3_tpu.ops import intersect
from raytracer3_tpu.render import camera as camera_mod
from raytracer3_tpu.render import film as film_mod
from raytracer3_tpu.scene import analytic, gltf
from raytracer3_tpu.utils import checkpoint, profiling
from raytracer3_tpu.utils.config import RenderSettings


def tiny_setup():
    scene = analytic.cornell_box()
    cam = analytic.default_camera()
    v0, v1, v2 = scene.tri_vertices()
    isect = lambda o, d: intersect.intersect_bruteforce(o, d, v0, v1, v2)
    settings = RenderSettings(width=8, height=8, bounces=1, samples=1, diffuse_only=True)
    return scene, cam, settings, isect


class TestViewer:
    def test_progressive_accumulates(self):
        scene, cam, settings, isect = tiny_setup()
        frame = viewer_mod.make_default_frame_fn(scene, settings, isect, None)
        v = viewer_mod.Viewer(frame, cam, settings)
        for _ in range(3):
            v.step()
        v.drain()
        assert int(v.film.frame_index) == 3
        assert np.isfinite(np.asarray(v.film.accum)).all()

    def test_camera_move_resets_accumulation(self):
        scene, cam, settings, isect = tiny_setup()
        frame = viewer_mod.make_default_frame_fn(scene, settings, isect, None)
        v = viewer_mod.Viewer(frame, cam, settings)
        v.step()
        v.step()
        assert int(v.film.frame_index) == 2
        v.controls.move_z = 1.0  # W held
        v.step()
        v.controls.move_z = 0.0
        # reset happened before the new frame: count restarted at 1
        assert int(v.film.frame_index) == 1
        # camera actually moved
        assert float(jnp.linalg.norm(v.cam.position - cam.position)) > 0.01

    def test_orbit_look(self):
        cam = analytic.default_camera()
        cam2 = camera_mod.orbit_camera(
            cam, jnp.asarray(0.3), jnp.asarray(0.1),
            jnp.zeros(3), jnp.asarray(1 / 60),
        )
        assert float(jnp.linalg.norm(cam2.direction - cam.direction)) > 0.01
        np.testing.assert_allclose(float(jnp.linalg.norm(cam2.direction)), 1.0, atol=1e-5)


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        from raytracer3_tpu.render import probes as probes_mod

        settings = RenderSettings(width=32, height=32)
        film = film_mod.Film(
            accum=jnp.arange(32 * 32 * 3, dtype=jnp.float32).reshape(32, 32, 3),
            frame_index=jnp.asarray(17, jnp.int32),
        )
        cam = analytic.default_camera()
        ps = probes_mod.ProbeState.create(settings)
        p = str(tmp_path / "ckpt.npz")
        checkpoint.save(p, film, cam, ps, extra={"spp": np.asarray(17)})
        film2, cam2, ps2, extra = checkpoint.load(p)
        np.testing.assert_array_equal(np.asarray(film.accum), np.asarray(film2.accum))
        assert int(film2.frame_index) == 17
        np.testing.assert_allclose(np.asarray(cam.position), np.asarray(cam2.position))
        assert ps2 is not None and ps2.atlas.shape == ps.atlas.shape
        assert int(extra["spp"]) == 17

    def test_version_guard(self, tmp_path):
        p = str(tmp_path / "bad.npz")
        np.savez(p, **{"__version__": np.asarray(999)})
        try:
            checkpoint.load(p)
            assert False, "should raise"
        except ValueError:
            pass


class TestProfiling:
    def test_frame_timer(self):
        t = profiling.FrameTimer()
        x = jnp.ones(16)
        for _ in range(3):
            t.begin()
            y = x * 2
            t.end(y)
        assert t.mean_ms >= 0.0
        assert "fps" in t.report()

    def test_pass_scope_composes_with_jit(self):
        @jax.jit
        def f(x):
            with profiling.pass_scope("test_pass"):
                return x * 2

        np.testing.assert_allclose(np.asarray(f(jnp.ones(4))), 2.0)


class TestMeshEncoderCLI:
    def test_roundtrip(self, tmp_path):
        import mesh_encoder

        glb = str(tmp_path / "m.glb")
        pos = np.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
        idx = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
        nrm = np.tile(np.asarray([0, 0, 1], np.float32), (4, 1))
        uv = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
        gltf.write_glb(glb, pos, idx, normals=nrm, uvs=uv, base_color=(0.5, 0.5, 0.5, 1))
        md = gltf.load_glb(glb)
        blob = mesh_encoder.encode(md)
        md2 = mesh_encoder.decode(blob)
        assert md2.indices.shape == (2, 3)
        # quantization error bounded
        assert np.abs(np.sort(md2.positions, 0) - np.sort(md.positions, 0)).max() < 1e-3
        dots = np.sum(md2.normals * md.normals, axis=-1)
        assert dots.min() > 0.99

    def test_cli_analyze(self, tmp_path, capsys):
        import mesh_encoder

        glb = str(tmp_path / "m.glb")
        pos = np.random.default_rng(0).normal(size=(64, 3)).astype(np.float32)
        idx = np.random.default_rng(1).integers(0, 64, (100, 3)).astype(np.int32)
        gltf.write_glb(glb, pos, idx)
        assert mesh_encoder.main([glb, "--analyze"]) == 0
        out = capsys.readouterr().out
        assert "ACMR" in out
