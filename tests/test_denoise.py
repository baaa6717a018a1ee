"""Edge-aware à-trous denoiser (render/denoise.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracer3_tpu.ops import mathx
from raytracer3_tpu.render import denoise


def _flat_gbuf(h, w, depth=5.0):
    d = jnp.full((h, w), depth)
    n = jnp.zeros((h, w, 3)).at[..., 2].set(1.0)
    return d, n


class TestAtrous:
    def test_constant_image_unchanged(self):
        d, n = _flat_gbuf(32, 32)
        img = jnp.full((32, 32, 3), 0.7)
        out = denoise.atrous_filter(img, d, n)
        np.testing.assert_allclose(np.asarray(out), 0.7, atol=1e-5)

    def test_variance_reduction_on_flat_geometry(self):
        d, n = _flat_gbuf(64, 64)
        key = jax.random.PRNGKey(0)
        img = 0.5 + 0.4 * jax.random.uniform(key, (64, 64, 3))
        out = denoise.atrous_filter(img, d, n)
        v_in = float(jnp.var(img))
        v_out = float(jnp.var(out))
        assert v_out < 0.25 * v_in
        # Energy approximately preserved (kernel is normalized).
        assert abs(float(jnp.mean(out)) - float(jnp.mean(img))) < 0.02

    def test_depth_edge_preserved(self):
        h, w = 64, 64
        d = jnp.full((h, w), 2.0).at[:, 32:].set(20.0)
        n = jnp.zeros((h, w, 3)).at[..., 2].set(1.0)
        key = jax.random.PRNGKey(1)
        img = jnp.where(
            (jnp.arange(w) < 32)[None, :, None], 0.1, 0.9
        ) + 0.05 * jax.random.normal(key, (h, w, 3))
        out = np.asarray(denoise.atrous_filter(img, d, n))
        # Region means survive: no bleed across the depth edge.
        assert abs(out[:, :28].mean() - 0.1) < 0.03
        assert abs(out[:, 36:].mean() - 0.9) < 0.03

    def test_sky_untouched(self):
        h, w = 32, 32
        d = jnp.full((h, w), mathx.BACKGROUND_DEPTH)
        n = jnp.zeros((h, w, 3))
        img = jax.random.uniform(jax.random.PRNGKey(2), (h, w, 3))
        out = denoise.atrous_filter(img, d, n)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img))

    def test_strength_ramp(self):
        s0 = float(denoise.denoise_strength(0))
        s4 = float(denoise.denoise_strength(4))
        s64 = float(denoise.denoise_strength(64))
        s200 = float(denoise.denoise_strength(200))
        assert s0 == 1.0 and s4 == 1.0
        assert s64 == 0.0 and s200 == 0.0


class TestPipeline:
    def test_wavefront_pipeline_denoised(self):
        from raytracer3_tpu.ops import intersect
        from raytracer3_tpu.render import pipelines
        from raytracer3_tpu.scene import analytic
        from raytracer3_tpu.utils.config import RenderSettings

        scene = analytic.cornell_box()
        cam = analytic.default_camera()
        v0, v1, v2 = scene.tri_vertices()
        isect = lambda o, d: intersect.intersect_bruteforce(o, d, v0, v1, v2)
        occl = lambda o, d, t: intersect.occluded_bruteforce(
            o, d, v0, v1, v2, t_max=t
        )
        s = RenderSettings(width=32, height=32, bounces=2, samples=1,
                           diffuse_only=True)
        step, init_state = pipelines.wavefront_pipeline(
            scene, s, intersect_fn=isect, occluded_fn=occl, denoise=True
        )
        st = init_state()
        d1, st = step(st, cam=cam, frame_index=jnp.uint32(0))
        d2, st = step(st, cam=cam, frame_index=jnp.uint32(1))
        assert d2.shape == (32, 32, 3)
        assert np.isfinite(np.asarray(d2)).all()
        # Denoised early frame is smoother than the raw pipeline's.
        step_raw, init_raw = pipelines.wavefront_pipeline(
            scene, s, intersect_fn=isect, occluded_fn=occl, denoise=False
        )
        sr = init_raw()
        r1, sr = step_raw(sr, cam=cam, frame_index=jnp.uint32(0))
        lum = lambda x: np.asarray(x).mean(-1)
        tv = lambda x: np.abs(np.diff(lum(x), axis=0)).mean()
        assert tv(d1) < tv(r1)
