"""Multi-chip rendering tests on the virtual 8-device CPU mesh (conftest):
tile sharding must be bit-compatible with single-device rendering, sample
parallelism must equal the mean over decorrelated seeds, and the donated
progressive step must preserve the film sharding (SURVEY.md §2.3 distributed
row; the dryrun counterpart lives in __graft_entry__.dryrun_multichip)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer3_tpu.ops import intersect, rng
from raytracer3_tpu.parallel import mesh as pmesh
from raytracer3_tpu.render import camera as camera_mod
from raytracer3_tpu.render import pathtracer
from raytracer3_tpu.scene import analytic
from raytracer3_tpu.utils.config import RenderSettings


@pytest.fixture(scope="module")
def setup():
    scene = analytic.cornell_box()
    cam = analytic.default_camera()
    v0, v1, v2 = scene.tri_vertices()

    def isect(o, d):
        return intersect.intersect_bruteforce(o, d, v0, v1, v2)

    def occl(o, d, tmax):
        return intersect.occluded_bruteforce(o, d, v0, v1, v2, t_max=tmax)

    settings = RenderSettings(
        width=16, height=32, bounces=2, samples=1, diffuse_only=True
    )
    return scene, cam, settings, isect, occl


def _reference_frame(scene, cam, settings, frame_index, isect, occl):
    """Single-device computation identical to render_tiled's shard body."""
    w, h = settings.width, settings.height
    pix = camera_mod.pixel_grid(w, h)
    sampler = rng.Sampler.from_pixels(pix, frame_index)
    uj, sampler = sampler.next2()
    o, d = camera_mod.primary_rays(cam, w, h, jitter=uj, pixel_xy=pix)
    gbuf = pathtracer.trace_gbuffer(scene, isect, o, d)
    radiance = pathtracer.trace_radiance(
        scene, isect, o, d, gbuf, sampler, settings, occl
    )
    env = pathtracer._sample_env(scene, d)
    return jnp.where(gbuf.hit[:, None], radiance, env).reshape(h, w, 3)


@pytest.mark.slow  # ~3-6 min each on the shared core (8-device mesh renders)
class TestRenderTiled:
    def test_matches_single_device(self, setup):
        scene, cam, settings, isect, occl = setup
        mesh = pmesh.make_render_mesh(jax.devices())
        tiled = pmesh.render_tiled(
            scene, cam, settings, jnp.uint32(0), isect, occl, mesh=mesh
        )
        ref = _reference_frame(scene, cam, settings, jnp.uint32(0), isect, occl)
        # Per-pixel RNG is keyed on global pixel coords, so sharding the rows
        # must not change a single sample.
        np.testing.assert_allclose(
            np.asarray(tiled), np.asarray(ref), rtol=1e-6, atol=1e-6
        )

    def test_output_is_row_sharded(self, setup):
        scene, cam, settings, isect, occl = setup
        mesh = pmesh.make_render_mesh(jax.devices())
        tiled = pmesh.render_tiled(
            scene, cam, settings, jnp.uint32(0), isect, occl, mesh=mesh
        )
        shards = tiled.addressable_shards
        assert len(shards) == len(jax.devices())
        assert shards[0].data.shape[0] == settings.height // len(jax.devices())


@pytest.mark.slow  # ~3-6 min each on the shared core (8-device mesh renders)
class TestSampleParallel:
    def test_equals_seed_mean(self, setup):
        scene, cam, settings, isect, occl = setup
        devices = jax.devices()
        mesh = pmesh.make_render_mesh(devices)
        img = pmesh.render_sample_parallel(
            scene, cam, settings, 3, isect, occl, mesh=mesh
        )
        n = len(devices)
        frames = [
            pathtracer.render_image(
                scene, cam, settings,
                jnp.uint32(3) * jnp.uint32(n) + jnp.uint32(i), isect, occl,
            )
            for i in range(n)
        ]
        ref = jnp.mean(jnp.stack(frames), axis=0)
        np.testing.assert_allclose(
            np.asarray(img), np.asarray(ref), rtol=1e-4, atol=1e-5
        )


@pytest.mark.slow  # ~3-6 min each on the shared core (8-device mesh renders)
class TestProgressiveStepTiled:
    def test_sharding_preserved_and_mean_correct(self, setup):
        scene, cam, settings, isect, occl = setup
        mesh = pmesh.make_render_mesh(jax.devices())
        step, init_film = pmesh.progressive_step_tiled(
            scene, cam, settings, isect, occl, mesh=mesh
        )
        film = init_film()
        sharding0 = film.accum.sharding
        film = step(film, jnp.uint32(0))
        film = step(film, jnp.uint32(1))
        assert film.accum.sharding.is_equivalent_to(sharding0, film.accum.ndim)
        assert int(film.frame_index) == 2

        f0 = pmesh.render_tiled(
            scene, cam, settings, jnp.uint32(0), isect, occl, mesh=mesh
        )
        f1 = pmesh.render_tiled(
            scene, cam, settings, jnp.uint32(1), isect, occl, mesh=mesh
        )
        np.testing.assert_allclose(
            np.asarray(film.accum),
            np.asarray((f0 + f1) * 0.5),
            rtol=1e-5, atol=1e-6,
        )


@pytest.mark.slow
class TestWavefrontShardedPacket:
    """VERDICT round-2 item 3: the PRODUCTION traversal paths (packet
    kernel, TLAS) must run under shard_map — interpret mode on the 8-device
    CPU mesh — and match the single-device render."""

    def test_packet_backend_sharded_matches_single(self):
        from raytracer3_tpu.ops.pallas import traverse_kernel as tk

        scene = analytic.cornell_box()
        cam = analytic.default_camera()
        v0, v1, v2 = (np.asarray(a) for a in scene.tri_vertices())
        backend = tk.packet_backend(
            host_tris=(v0, v1, v2), leaf_size=4, width=8, sublanes=8,
            interpret=True,
        )
        settings = RenderSettings(
            width=16, height=8, bounces=1, samples=1, diffuse_only=True
        )
        mesh8 = pmesh.make_render_mesh(jax.devices())
        img8 = pmesh.render_wavefront_tiled(
            scene, cam, settings, jnp.uint32(3), backend.arrays,
            backend.intersect_fn, backend.occluded_fn, mesh=mesh8,
        )
        mesh1 = pmesh.make_render_mesh(jax.devices()[:1])
        img1 = pmesh.render_wavefront_tiled(
            scene, cam, settings, jnp.uint32(3), backend.arrays,
            backend.intersect_fn, backend.occluded_fn, mesh=mesh1,
        )
        assert np.isfinite(np.asarray(img8)).all()
        # Same per-pixel RNG + per-ray traversal: sharding must not change
        # radiance (packet regrouping can reorder FP reductions only through
        # traversal visit order; identical hits → tight tolerance).
        np.testing.assert_allclose(
            np.asarray(img8), np.asarray(img1), rtol=1e-4, atol=1e-5
        )

    def test_treelet_backend_sharded(self):
        from raytracer3_tpu.ops import treelets

        scene = analytic.cornell_box()
        cam = analytic.default_camera()
        v0, v1, v2 = (np.asarray(a) for a in scene.tri_vertices())
        backend = treelets.treelet_backend(
            host_tris=(v0, v1, v2), leaf_size=4, width=8, max_tris=16,
            sublanes=8, interpret=True,
        )
        assert backend.meta.num_treelets > 1
        settings = RenderSettings(
            width=16, height=8, bounces=1, samples=1, diffuse_only=True
        )
        mesh8 = pmesh.make_render_mesh(jax.devices())
        img8 = pmesh.render_wavefront_tiled(
            scene, cam, settings, jnp.uint32(1), backend.arrays,
            backend.intersect_fn, backend.occluded_fn, mesh=mesh8,
        )
        mesh1 = pmesh.make_render_mesh(jax.devices()[:1])
        img1 = pmesh.render_wavefront_tiled(
            scene, cam, settings, jnp.uint32(1), backend.arrays,
            backend.intersect_fn, backend.occluded_fn, mesh=mesh1,
        )
        np.testing.assert_allclose(
            np.asarray(img8), np.asarray(img1), rtol=1e-4, atol=1e-5
        )


@pytest.mark.slow
def test_multihost_dryrun():
    """Two-process (DCN-analog) mesh: the production wavefront sharded over
    2 processes x 4 CPU devices with Gloo collectives must match the
    single-process render bit-for-bit (tools/dryrun_multihost.py)."""
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "dryrun_multihost.py")],
        capture_output=True, text=True, timeout=900,
        env={k: v for k, v in os.environ.items() if k != "XLA_FLAGS"},
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert "MULTIHOST ok" in res.stdout
