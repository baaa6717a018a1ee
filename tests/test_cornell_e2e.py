"""End-to-end Cornell-box golden tests (SURVEY.md §7 step 3;
BASELINE.json config 1): the minimum slice — analytic scene, jitted
samples×bounces wavefront loop, diffuse BRDF, AgX postprocess."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer3_tpu.ops import intersect
from raytracer3_tpu.render import film as film_mod
from raytracer3_tpu.render import pathtracer, postprocess
from raytracer3_tpu.scene import analytic
from raytracer3_tpu.utils.config import RenderSettings

RES = 32


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
        width=RES, height=RES, bounces=2, samples=1, diffuse_only=True
    )
    frame = jax.jit(
        lambda fi: pathtracer.render_image(scene, cam, settings, fi, isect, occl)
    )
    return scene, cam, settings, frame


class TestScene:
    def test_emissive_table(self, setup):
        scene = setup[0]
        assert int(scene.emissive.count) == 2  # light quad = 2 triangles
        assert float(scene.emissive.total_area) > 0.0

    def test_triangle_count(self, setup):
        # 5 walls + light (6 quads) + 2 boxes (12 quads) = 18 quads = 36 tris
        assert setup[0].num_triangles == 36


class TestRender:
    def test_deterministic(self, setup):
        frame = setup[3]
        a = np.asarray(frame(jnp.uint32(3)))
        b = np.asarray(frame(jnp.uint32(3)))
        np.testing.assert_array_equal(a, b)

    def test_frames_decorrelated(self, setup):
        frame = setup[3]
        a = np.asarray(frame(jnp.uint32(0)))
        b = np.asarray(frame(jnp.uint32(1)))
        assert not np.array_equal(a, b)

    def test_image_statistics(self, setup):
        frame = setup[3]
        img = np.asarray(frame(jnp.uint32(0)))
        assert np.isfinite(img).all()
        assert img.min() >= 0.0
        assert 0.01 < img.mean() < 5.0
        # Light source pixels are the brightest region.
        assert img.max() > 5.0

    def test_color_bleeding(self, setup):
        # Average several frames; red wall on screen-left, green on right.
        frame = setup[3]
        acc = np.zeros((RES, RES, 3), np.float32)
        n = 6
        for i in range(n):
            acc += np.asarray(frame(jnp.uint32(i)))
        acc /= n
        left = acc[RES // 4 : -RES // 4, : RES // 6].mean(axis=(0, 1))
        right = acc[RES // 4 : -RES // 4, -RES // 6 :].mean(axis=(0, 1))
        assert left[0] > 1.5 * left[1]  # red dominant on left wall
        assert right[1] > 1.5 * right[0]  # green dominant on right wall

    def test_postprocess_in_display_range(self, setup):
        frame = setup[3]
        img = frame(jnp.uint32(0))
        out = np.asarray(postprocess.postprocess(img))
        assert out.min() > -0.05 and out.max() < 1.25


class TestFilm:
    def test_progressive_accumulation_mean(self, setup):
        frame = setup[3]
        f = film_mod.Film.create(RES, RES)
        imgs = []
        for i in range(4):
            img = frame(jnp.uint32(i))
            imgs.append(np.asarray(img))
            f = film_mod.accumulate_progressive(f, img)
        np.testing.assert_allclose(
            np.asarray(f.accum), np.mean(imgs, axis=0), rtol=1e-4, atol=1e-5
        )
        assert int(f.frame_index) == 4

    def test_blend_replace_mode(self, setup):
        # blendfactor >= 1 replaces (refrence_mode.slang:61-62).
        f = film_mod.Film.create(4, 4)
        f = film_mod.blend(f._replace(accum=jnp.ones((4, 4, 3))), jnp.zeros((4, 4, 3)), jnp.asarray(1.0))
        assert float(jnp.abs(f.accum).max()) == 0.0

    def test_reset(self):
        f = film_mod.Film(accum=jnp.ones((2, 2, 3)), frame_index=jnp.asarray(5, jnp.int32))
        f = film_mod.reset(f)
        assert float(f.accum.max()) == 0.0 and int(f.frame_index) == 0


class TestNEEConsistency:
    def test_nee_matches_brdf_only(self, setup):
        # Same scene rendered with and without NEE must agree in expectation.
        scene, cam, _, _ = setup
        v0, v1, v2 = scene.tri_vertices()

        def isect(o, d):
            return intersect.intersect_bruteforce(o, d, v0, v1, v2)

        def occl(o, d, tmax):
            return intersect.occluded_bruteforce(o, d, v0, v1, v2, t_max=tmax)

        s = RenderSettings(width=16, height=16, bounces=3, samples=4, diffuse_only=True)
        f_nee = jax.jit(
            lambda fi: pathtracer.render_image(scene, cam, s, fi, isect, occl)
        )
        f_brdf = jax.jit(
            lambda fi: pathtracer.render_image(scene, cam, s, fi, isect, None)
        )
        n = 24
        a = np.mean([np.asarray(f_nee(jnp.uint32(i))) for i in range(n)], axis=0)
        b = np.mean([np.asarray(f_brdf(jnp.uint32(i))) for i in range(n)], axis=0)
        # Compare darker (indirect) regions where both estimators converge.
        mask = (b.max(axis=-1) < 2.0) & (a.max(axis=-1) < 2.0)
        assert mask.sum() > 50
        ma, mb = a[mask].mean(), b[mask].mean()
        assert abs(ma - mb) / mb < 0.15
