"""Wavefront path tracer tests: agreement with the reference-mode tracer,
sorting invariance, Russian-roulette unbiasedness, BVH backend integration
(BASELINE.json config 4 building blocks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer3_tpu.ops import intersect, traverse
from raytracer3_tpu.render import camera as camera_mod
from raytracer3_tpu.render import pathtracer, wavefront


def camera_mod_primary(cam, res):
    """Centered primary rays for a res×res grid (test helper)."""
    pix = camera_mod.pixel_grid(res, res)
    return camera_mod.primary_rays(
        cam, res, res, jitter=jnp.full((res * res, 2), 0.5), pixel_xy=pix
    )
from raytracer3_tpu.scene import analytic
from raytracer3_tpu.utils.config import RenderSettings

RES = 16


@pytest.fixture(scope="module")
def setup():
    scene = analytic.cornell_box()
    cam = analytic.default_camera()
    v0, v1, v2 = scene.tri_vertices()

    def isect(o, d):
        return intersect.intersect_bruteforce(o, d, v0, v1, v2)

    def occl(o, d, tmax):
        return intersect.occluded_bruteforce(o, d, v0, v1, v2, t_max=tmax)

    return scene, cam, isect, occl


def render_mean(fn, n_frames):
    return np.mean([np.asarray(fn(jnp.uint32(i))) for i in range(n_frames)], axis=0)


class TestWavefront:
    def test_matches_megakernel_estimator(self, setup):
        # Same scene/settings, no RR: wavefront and reference-mode converge to
        # the same mean.
        scene, cam, isect, occl = setup
        s = RenderSettings(width=RES, height=RES, bounces=3, samples=2, diffuse_only=True)
        f_wave = jax.jit(
            lambda fi: wavefront.render_frame(
                scene, cam, s, fi, isect, occl, sort_rays=False
            )
        )
        f_mega = jax.jit(
            lambda fi: pathtracer.render_image(scene, cam, s, fi, isect, occl)
        )
        a = render_mean(f_wave, 20)
        b = render_mean(f_mega, 20)
        mask = (a.max(-1) < 3) & (b.max(-1) < 3)
        assert mask.sum() > 100
        assert abs(a[mask].mean() - b[mask].mean()) / b[mask].mean() < 0.12

    def test_sort_rays_preserves_image(self, setup):
        # Sorting permutes lanes + their RNG streams together, so the result
        # is bit-identical to unsorted.
        scene, cam, isect, occl = setup
        s = RenderSettings(width=RES, height=RES, bounces=3, samples=1, diffuse_only=True)
        a = np.asarray(
            wavefront.render_frame(scene, cam, s, 5, isect, occl, sort_rays=False)
        )
        b = np.asarray(
            wavefront.render_frame(scene, cam, s, 5, isect, occl, sort_rays=True)
        )
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_sort_rays_with_primary_env_misses(self):
        # Regression (ADVICE r1, high): with sort_rays=True the queue's
        # pixel_id is permuted; primary-miss env light must still land on the
        # *original* pixels. A floating quad in front of an equirect gradient
        # gives plenty of primary misses.
        from raytracer3_tpu.scene import types as scene_types
        from raytracer3_tpu.render.camera import Camera

        pos = np.array(
            [[-0.6, 0.4, 2.0], [0.6, 0.4, 2.0], [0.6, 1.6, 2.0], [-0.6, 1.6, 2.0]],
            np.float32,
        )
        nrm = np.tile(np.array([[0.0, 0.0, -1.0]], np.float32), (4, 1))
        uv = np.zeros((4, 2), np.float32)
        idx = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        env = (
            np.linspace(0.0, 1.0, 16 * 32 * 3, dtype=np.float32)
            .reshape(16, 32, 3)
        )
        scene = scene_types.make_scene(
            pos, nrm, uv, idx, np.zeros(2, np.int32),
            base_color=np.array([[0.6, 0.5, 0.4]], np.float32),
            emission=np.zeros((1, 3), np.float32),
            metallic=np.zeros(1, np.float32),
            roughness=np.ones(1, np.float32),
            env_map=env,
        )
        cam = Camera.create(position=(0.0, 1.0, -1.0), aspect=1.0)
        v0, v1, v2 = scene.tri_vertices()

        def isect(o, d):
            return intersect.intersect_bruteforce(o, d, v0, v1, v2)

        s = RenderSettings(width=RES, height=RES, bounces=2, samples=1, diffuse_only=True)
        a = np.asarray(wavefront.render_frame(scene, cam, s, 5, isect, sort_rays=False))
        b = np.asarray(wavefront.render_frame(scene, cam, s, 5, isect, sort_rays=True))
        # Sanity: the scene actually produces primary misses AND hits.
        h0 = intersect.intersect_bruteforce(
            *camera_mod_primary(cam, RES), v0, v1, v2
        ).hit
        n_miss = int((~np.asarray(h0)).sum())
        assert 0 < n_miss < RES * RES
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_russian_roulette_unbiased(self, setup):
        # 5-bounce render with RR active from bounce 3 must agree in
        # expectation with the RR-free reference-mode tracer.
        scene, cam, isect, occl = setup
        s = RenderSettings(width=RES, height=RES, bounces=5, samples=2, diffuse_only=True)
        f_rr = jax.jit(
            lambda fi: wavefront.render_frame(scene, cam, s, fi, isect, occl)
        )
        f_ref = jax.jit(
            lambda fi: pathtracer.render_image(scene, cam, s, fi, isect, occl)
        )
        a = render_mean(f_rr, 30)
        c = render_mean(f_ref, 30)
        mask = (a.max(-1) < 3) & (c.max(-1) < 3)
        assert mask.sum() > 100
        assert abs(a[mask].mean() - c[mask].mean()) / c[mask].mean() < 0.12

    def test_bvh_backend_end_to_end(self, setup):
        scene, cam, _, _ = setup
        isect, occl, bvh = traverse.make_bvh_backend(scene)
        s = RenderSettings(width=RES, height=RES, bounces=2, samples=1, diffuse_only=True)
        img = np.asarray(
            jax.jit(
                lambda fi: wavefront.render_frame(scene, cam, s, fi, isect, occl)
            )(jnp.uint32(0))
        )
        assert np.isfinite(img).all() and img.max() > 0

    def test_full_brdf_mode(self, setup):
        # Metallic-roughness surface shading path (non-diffuse).
        scene, cam, isect, occl = setup
        s = RenderSettings(width=RES, height=RES, bounces=3, samples=1, diffuse_only=False)
        img = np.asarray(
            jax.jit(
                lambda fi: wavefront.render_frame(scene, cam, s, fi, isect, occl)
            )(jnp.uint32(0))
        )
        assert np.isfinite(img).all() and img.max() > 0

    def test_blue_noise_jitter(self, setup):
        scene, cam, isect, occl = setup
        from raytracer3_tpu.scene import assets

        bn = jnp.asarray(assets.blue_noise_cached(size=16))
        s = RenderSettings(width=RES, height=RES, bounces=2, samples=1, diffuse_only=True)
        img = np.asarray(
            wavefront.render_frame(scene, cam, s, 0, isect, occl, blue_noise=bn)
        )
        assert np.isfinite(img).all() and img.max() > 0


class TestTileSwizzle:
    """The tile-swizzled ray order is undone by pure reshapes; per-pixel RNG
    is keyed by pixel coords, so tiled and raster ray orders must produce
    bit-identical images (a wrong un-swizzle scrambles silently)."""

    def _render(self, w, h, tiled):
        import jax

        from raytracer3_tpu.ops import intersect as isect_mod
        from raytracer3_tpu.render import wavefront
        from raytracer3_tpu.scene import analytic
        from raytracer3_tpu.utils.config import RenderSettings

        scene = analytic.cornell_box()
        cam = analytic.default_camera()
        backend = isect_mod.brute_backend(scene=scene)
        isect, occl = backend.bind(backend.arrays)
        s = RenderSettings(width=w, height=h, bounces=1, samples=1, diffuse_only=True)
        return np.asarray(
            jax.jit(
                lambda fi: wavefront.render_frame(
                    scene, cam, s, fi, isect, occl, sort_rays=tiled,
                    tile_primaries=tiled,
                )
            )(jnp.uint32(3))
        )

    def test_tile_64_rows(self):
        a = self._render(128, 64, True)
        b = self._render(128, 64, False)
        np.testing.assert_array_equal(a, b)

    def test_adaptive_tile_16_rows(self):
        # 48 % 64 != 0 → pick_tile falls to 16-row tiles (the 720p case).
        from raytracer3_tpu.render import wavefront

        assert wavefront.pick_tile(128, 48) == (128, 16)
        a = self._render(128, 48, True)
        b = self._render(128, 48, False)
        np.testing.assert_array_equal(a, b)

    def test_raster_fallback(self):
        # 100 columns: no tile divides → raster order (identity un-swizzle).
        from raytracer3_tpu.render import wavefront

        assert wavefront.pick_tile(100, 64) is None
        a = self._render(100, 64, True)
        b = self._render(100, 64, False)
        np.testing.assert_array_equal(a, b)


class TestFusedShadow:
    """fuse_shadow merges each bounce's NEE shadow batch into the next-bounce
    launch (one capped closest-hit trace, ops/backend.py capped_fn). Sampler
    draws and occlusion booleans are unchanged, so the image must match the
    split path bit-for-bit (up to trace-order float ties)."""

    def _ab(self, scene, cam, bounces=3):
        import dataclasses

        from raytracer3_tpu.ops import intersect as isect_mod
        from raytracer3_tpu.utils.config import RenderSettings

        backend = isect_mod.brute_backend(scene=scene)
        isect, occl = backend.bind(backend.arrays)
        fused = backend.bind_capped(backend.arrays)
        assert fused is not None
        s = RenderSettings(
            width=RES, height=RES, bounces=bounces, samples=1,
            diffuse_only=True,
        )
        a = np.asarray(
            wavefront.render_frame(scene, cam, s, 7, isect, occl)
        )
        s_f = dataclasses.replace(s, fuse_shadow=True)
        b = np.asarray(
            wavefront.render_frame(
                scene, cam, s_f, 7, isect, occl, fused_fn=fused
            )
        )
        return a, b

    def test_area_lights_match_split_path(self):
        scene = analytic.cornell_box()
        a, b = self._ab(scene, analytic.default_camera())
        assert b.max() > 0
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)

    def test_env_mixture_matches_split_path(self):
        # Env NEE lanes carry cap ≈ BACKGROUND_DEPTH — the fused launch must
        # treat a miss within that cap as unoccluded.
        from raytracer3_tpu.scene import procedural

        scene, _ = procedural.atrium_scene(detail=1, return_host=True)
        cam = procedural.atrium_camera(aspect=1.0)
        a, b = self._ab(scene, cam, bounces=2)
        assert b.max() > 0
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


class TestSampleBatch:
    def test_batched_samples_match_sequential_loop(self):
        # sample_batch concatenates all samples into ONE wavefront; per-lane
        # math is identical (same per-sample seeds), so the result must be
        # exactly the sequential per-sample loop's. (The knob exists because
        # denser ray populations sort into purer traversal packets — +28%
        # bounce Mray/s at 4x density on Sponza-scale, docs/ROADMAP.md.)
        import dataclasses

        import jax.numpy as jnp

        from raytracer3_tpu.ops import intersect as isect_mod
        from raytracer3_tpu.render import wavefront
        from raytracer3_tpu.scene import analytic
        from raytracer3_tpu.utils.config import RenderSettings

        scene = analytic.cornell_box()
        cam = analytic.default_camera()
        backend = isect_mod.brute_backend(scene=scene)
        isect, occl = backend.bind(backend.arrays)
        s_loop = RenderSettings(
            width=32, height=32, bounces=3, samples=2, diffuse_only=True
        )
        s_batch = dataclasses.replace(s_loop, sample_batch=True)
        a, ta = wavefront.render_frame(
            scene, cam, s_loop, jnp.uint32(3), isect, occl, return_stats=True
        )
        b, tb = wavefront.render_frame(
            scene, cam, s_batch, jnp.uint32(3), isect, occl, return_stats=True
        )
        assert int(ta) == int(tb)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        )


class TestLaneDiet:
    """settings.lane_diet: rgb9e5-packed color state across traversal
    launches — must match the default path to shared-exponent rounding
    (≤0.5% per crossing; NOT bit-compatible by design)."""

    @pytest.mark.parametrize("sort_rays", [False, True])
    def test_matches_default_within_rounding(self, setup, sort_rays):
        import dataclasses

        scene, cam, isect, occl = setup
        s = RenderSettings(
            width=RES, height=RES, bounces=3, samples=1, diffuse_only=True
        )
        a = np.asarray(
            wavefront.render_frame(
                scene, cam, s, 5, isect, occl, sort_rays=sort_rays
            )
        )
        b = np.asarray(
            wavefront.render_frame(
                scene, cam, dataclasses.replace(s, lane_diet=True), 5,
                isect, occl, sort_rays=sort_rays,
            )
        )
        # Same sampler draws, same occlusion bits; only color rounding
        # differs (a few crossings × 2^-9 shared-exponent steps).
        np.testing.assert_allclose(a, b, rtol=0.02, atol=2e-3)
        assert np.abs(a - b).max() > 0.0 or a.max() == 0.0  # diet is active

    def test_fused_and_tail_paths(self, setup):
        import dataclasses

        scene, cam, isect, occl = setup
        backend = intersect.brute_backend(scene=scene)

        def capped(o, d, t, anyhit=None):
            return backend.capped_fn(backend.arrays, o, d, t, anyhit)

        s = RenderSettings(
            width=RES, height=RES, bounces=3, samples=1, diffuse_only=True,
            fuse_shadow=True,
        )
        a = np.asarray(
            wavefront.render_frame(
                scene, cam, s, 3, isect, occl, fused_fn=capped
            )
        )
        b = np.asarray(
            wavefront.render_frame(
                scene, cam, dataclasses.replace(s, lane_diet=True), 3,
                isect, occl, fused_fn=capped,
            )
        )
        np.testing.assert_allclose(a, b, rtol=0.02, atol=2e-3)


class TestNeeShadowRR:
    """settings.nee_rr_threshold: contribution-proportional Russian
    roulette on NEE shadow rays — unbiased (survivors scale 1/p), so the
    mean image must match the default path statistically while tracing
    fewer shadow lanes."""

    def test_unbiased_and_traces_fewer(self, setup):
        import dataclasses

        scene, cam, isect, occl = setup
        s0 = RenderSettings(
            width=RES, height=RES, bounces=3, samples=2, diffuse_only=True,
            radiance_clamp=50.0,
        )
        s1 = dataclasses.replace(s0, nee_rr_threshold=0.05)

        def run(s):
            f = jax.jit(
                lambda fi: wavefront.render_frame(
                    scene, cam, s, fi, isect, occl, return_stats=True
                )
            )
            imgs, rays = [], 0
            for i in range(30):
                img, traced = f(jnp.uint32(i))
                imgs.append(np.asarray(img))
                rays += int(traced)
            return np.mean(imgs, axis=0), rays

        a, rays_a = run(s0)
        b, rays_b = run(s1)
        # Fewer lanes actually traverse (dim shadow rays parked).
        assert rays_b < rays_a * 0.98, (rays_b, rays_a)
        # Unbiased: means agree within MC tolerance on stable pixels.
        mask = (a.max(-1) < 3) & (b.max(-1) < 3)
        assert mask.sum() > 100
        assert abs(a[mask].mean() - b[mask].mean()) / a[mask].mean() < 0.05
