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


class TestPipelineKnobs:
    def test_probe_pipeline_proberng_debug(self, setup):
        """The proberng debug view (GConst.proberng parity) must produce a
        finite display through the same compiled step."""
        import dataclasses

        scene, cam, isect, occl = setup
        s = RenderSettings(
            width=16, height=16, bounces=1, samples=1,
            probe_spacing=8, probe_res=4, proberng=True,
        )
        step, init = pipelines.probe_gi_pipeline(
            scene, s, intersect_fn=isect, occluded_fn=occl
        )
        disp, _ = step(init(), cam=cam, frame_index=jnp.uint32(0))
        d = np.asarray(disp)
        assert np.isfinite(d).all()

    def test_wavefront_pipeline_full_brdf_and_clamp(self, setup):
        """Non-diffuse shading + firefly clamp through the pipeline step."""
        scene, cam, isect, occl = setup
        s = RenderSettings(
            width=16, height=16, bounces=2, samples=1,
            diffuse_only=False, radiance_clamp=10.0,
        )
        step, init = pipelines.wavefront_pipeline(scene, s, isect, occl)
        state = init()
        for i in range(2):
            disp, state = step(state, cam=cam, frame_index=jnp.uint32(i))
        d = np.asarray(disp)
        assert np.isfinite(d).all() and d.max() <= 1.3

    def test_hybrid_pipeline_state_advances(self, setup):
        scene, cam, isect, occl = setup
        s = RenderSettings(
            width=16, height=16, bounces=1, samples=1,
            probe_spacing=8, probe_res=4,
        )
        step, init = pipelines.hybrid_gi_pipeline(
            scene, s, intersect_fn=isect, occluded_fn=occl
        )
        state = init()
        d0, state = step(state, cam=cam, frame_index=jnp.uint32(0))
        d1, state = step(state, cam=cam, frame_index=jnp.uint32(1))
        assert np.isfinite(np.asarray(d1)).all()
        # Temporal accumulation: successive frames differ (new samples).
        assert not np.array_equal(np.asarray(d0), np.asarray(d1))
