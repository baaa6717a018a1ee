"""Tests for the prebuilt frame pipelines (graph-composed pass assemblies)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer3_tpu.ops import intersect
from raytracer3_tpu.render import pipelines
from raytracer3_tpu.scene import analytic
from raytracer3_tpu.utils.config import RenderSettings


@pytest.fixture(scope="module")
def setup():
    scene = analytic.cornell_box()
    cam = analytic.default_camera()
    v0, v1, v2 = scene.tri_vertices()
    isect = lambda o, d: intersect.intersect_bruteforce(o, d, v0, v1, v2)  # noqa: E731
    occl = lambda o, d, t: intersect.occluded_bruteforce(o, d, v0, v1, v2, t_max=t)  # noqa: E731
    return scene, cam, isect, occl


class TestWavefrontPipeline:
    def test_progressive_frames(self, setup):
        scene, cam, isect, occl = setup
        s = RenderSettings(width=16, height=16, bounces=2, samples=1, diffuse_only=True)
        step, init = pipelines.wavefront_pipeline(scene, s, isect, occl)
        state = init()
        for i in range(3):
            display, state = step(state, cam=cam, frame_index=jnp.uint32(i))
        assert float(state["frame_count"]) == 3.0
        d = np.asarray(display)
        assert np.isfinite(d).all() and 0.0 <= d.min() and d.max() <= 1.3
        # Film actually averaged (not last-frame only): two frames differ.
        r0, s2 = step(init(), cam=cam, frame_index=jnp.uint32(0))
        assert not np.allclose(np.asarray(r0), d)


class TestReferencePipeline:
    def test_matches_direct_renderer(self, setup):
        from raytracer3_tpu.render import pathtracer, postprocess
        from raytracer3_tpu.render import film as film_mod

        scene, cam, isect, occl = setup
        s = RenderSettings(width=16, height=16, bounces=2, samples=1, diffuse_only=True)
        step, init = pipelines.reference_pipeline(scene, s, isect, occl)
        state = init()
        for i in range(2):
            display, state = step(state, cam=cam, frame_index=jnp.uint32(i))
        # Direct composition of the same passes.
        f = film_mod.Film.create(16, 16)
        for i in range(2):
            rad = pathtracer.render_image(scene, cam, s, jnp.uint32(i), isect, occl)
            f = film_mod.accumulate_progressive(f, rad)
        want = postprocess.postprocess(f.accum)
        np.testing.assert_allclose(np.asarray(display), np.asarray(want), atol=1e-5)


class TestProbePipeline:
    def test_runs_and_accumulates(self, setup):
        scene, cam, isect, occl = setup
        s = RenderSettings(width=32, height=32, probe_spacing=16, probe_res=8, diffuse_only=True)
        step, init = pipelines.probe_gi_pipeline(scene, s, isect, occl, blendfactor=0.5)
        state = init()
        for i in range(2):
            display, state = step(state, cam=cam, frame_index=jnp.uint32(i))
        assert np.isfinite(np.asarray(display)).all()
        assert float(jnp.max(state["probe_atlas"])) > 0.0
