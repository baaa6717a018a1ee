"""Property tests for BRDFs (energy conservation, white furnace, pdf
consistency), SH projection, and AgX tonemapping — the test strategy SURVEY.md
§4 prescribes for the rebuild."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracer3_tpu.ops import brdf, mathx, sh, tonemap


def rand_dirs_upper(key, n):
    u = jax.random.uniform(key, (n, 2))
    return mathx.uniform_sample_hemisphere(u)


class TestDiffuse:
    def test_sample_value_pdf_consistency(self):
        u = jax.random.uniform(jax.random.PRNGKey(0), (256, 2))
        albedo = jnp.full((256, 3), 0.7)
        s = brdf.diffuse_sample(albedo, u)
        np.testing.assert_allclose(
            s.value, s.value_over_pdf * s.pdf[..., None], atol=1e-6
        )
        np.testing.assert_allclose(s.value_over_pdf, albedo, atol=1e-6)

    def test_primary_sample_space_roundtrip(self):
        u = jax.random.uniform(jax.random.PRNGKey(1), (256, 2), minval=0.01, maxval=0.99)
        s = brdf.diffuse_sample(jnp.ones((256, 3)), u)
        u2 = brdf.diffuse_wi_to_primary_sample_space(s.wi)
        np.testing.assert_allclose(u2, u, atol=1e-4)

    def test_white_furnace(self):
        # Integral of brdf*cos over hemisphere == albedo for Lambert.
        n = 100_000
        u = jax.random.uniform(jax.random.PRNGKey(2), (n, 2))
        wi = mathx.uniform_sample_hemisphere(u)
        val = brdf.diffuse_evaluate(jnp.ones((n, 3)), wi).value
        # uniform hemisphere pdf = 1/(2pi); estimator = value*cos/(pdf)
        est = jnp.mean(val[:, 0] * wi[:, 2] * 2.0 * jnp.pi)
        assert abs(float(est) - 1.0) < 0.02


class TestSpecular:
    def test_vndf_half_vectors_unit(self):
        n = 512
        wo = rand_dirs_upper(jax.random.PRNGKey(0), n)
        u = jax.random.uniform(jax.random.PRNGKey(1), (n, 2))
        h = brdf.sample_vndf(0.3, wo, u)
        np.testing.assert_allclose(jnp.linalg.norm(h, axis=-1), 1.0, atol=1e-5)
        assert (h[:, 2] >= 0).all()

    def test_sample_eval_agree(self):
        # evaluate() at a sampled wi must reproduce the sample's value/pdf.
        n = 512
        wo = rand_dirs_upper(jax.random.PRNGKey(2), n)
        u = jax.random.uniform(jax.random.PRNGKey(3), (n, 2))
        f0 = jnp.full((n, 3), 0.9)
        s = brdf.specular_sample(0.4, f0, wo, u)
        e = brdf.specular_evaluate(0.4, f0, wo, s.wi)
        m = np.asarray(s.valid)
        np.testing.assert_allclose(
            np.asarray(e.pdf)[m], np.asarray(s.pdf)[m], rtol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(e.value)[m], np.asarray(s.value)[m], rtol=2e-3, atol=1e-5
        )

    def test_weak_white_furnace(self):
        # With F0=1 the VNDF estimator integrates G/G1 ≲ 1; energy must not
        # exceed 1 (passivity) and should be close to 1 for low roughness.
        n = 200_000
        wo = jnp.tile(jnp.array([0.3, 0.0, jnp.sqrt(1 - 0.09)]), (n, 1))
        u = jax.random.uniform(jax.random.PRNGKey(4), (n, 2))
        s = brdf.specular_sample(0.1, jnp.ones((n, 3)), wo, u)
        energy = float(jnp.mean(jnp.where(s.valid, s.value_over_pdf[:, 0], 0.0)))
        assert energy <= 1.0 + 1e-3
        assert energy > 0.9

    def test_pdf_normalization(self):
        # The pdf is w.r.t. the projected-solid-angle metric (the reference's
        # convention, brdf.slang:33 comment), so ∫_hemi pdf·cosθ dω ≤ 1, with
        # the deficit being VNDF mass reflected below the horizon (clamped to
        # zero by evaluate, brdf.slang:270-272). MC with uniform hemisphere
        # sampling (pdf_u = 1/2π).
        n = 200_000
        wo = jnp.tile(jnp.array([0.4, 0.2, jnp.sqrt(1 - 0.2)]), (n, 1))
        wi = mathx.uniform_sample_hemisphere(
            jax.random.uniform(jax.random.PRNGKey(5), (n, 2))
        )
        e = brdf.specular_evaluate(0.5, jnp.ones((n, 3)), wo, wi)
        est = float(jnp.mean(e.pdf * wi[:, 2]) * 2.0 * jnp.pi)
        assert 0.6 < est <= 1.02

    def test_dominant_direction(self):
        nrm = jnp.array([0.0, 0.0, 1.0])
        v = mathx.normalize(jnp.array([0.5, 0.0, 0.7]))
        # roughness 0 → mirror reflection
        d0 = brdf.specular_dominant_direction(nrm, v, 0.0)
        np.testing.assert_allclose(d0, mathx.reflect(-v, nrm), atol=1e-5)
        # roughness 1 → normal
        d1 = brdf.specular_dominant_direction(nrm, v, 1.0)
        np.testing.assert_allclose(d1, nrm, atol=1e-5)


class TestCombinedSurface:
    def test_metal_has_no_diffuse(self):
        n = 4096
        wo = rand_dirs_upper(jax.random.PRNGKey(0), n)
        u3 = jax.random.uniform(jax.random.PRNGKey(1), (n, 3))
        albedo = jnp.full((n, 3), 0.8)
        s = brdf.surface_sample(albedo, jnp.full(n, 0.3), jnp.ones(n), wo, u3)
        e = brdf.diffuse_evaluate(jnp.zeros((n, 3)), s.wi)
        # diffuse lobe killed by metalness=1: combined value equals pure spec
        f0 = albedo
        sv = brdf.specular_evaluate(jnp.full(n, 0.3), f0, wo, s.wi)
        m = np.asarray(s.valid)
        np.testing.assert_allclose(
            np.asarray(s.value)[m], np.asarray(sv.value)[m], rtol=1e-4, atol=1e-6
        )

    def test_energy_passivity(self):
        n = 100_000
        wo = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (n, 1))
        u3 = jax.random.uniform(jax.random.PRNGKey(2), (n, 3))
        s = brdf.surface_sample(
            jnp.full((n, 3), 1.0), jnp.full(n, 0.5), jnp.zeros(n), wo, u3
        )
        energy = float(jnp.mean(jnp.where(s.valid, s.value_over_pdf[:, 0], 0.0)))
        assert energy <= 1.1  # one-sample MIS has some variance but must not blow up


class TestSH:
    def test_orthonormality(self):
        # MC integral of Yi*Yj over sphere = delta_ij.
        n = 400_000
        u = jax.random.uniform(jax.random.PRNGKey(0), (n, 2))
        d = mathx.uniform_sample_sphere(u)
        y = sh.sh3_evaluate(d)  # [n, 9]
        gram = (y.T @ y) * (4.0 * jnp.pi / n)
        np.testing.assert_allclose(gram, np.eye(9), atol=0.03)

    def test_project_reconstruct_constant(self):
        # Projecting a constant radiance field reconstructs it.
        n = 4096
        d = mathx.uniform_sample_sphere(jax.random.uniform(jax.random.PRNGKey(1), (n, 2)))
        vals = jnp.ones((n, 3)) * 2.5
        coeffs = sh.sh3_project_batch(d, vals)  # [3, 9]
        out = sh.sh3_unproject(coeffs[0], jnp.array([0.0, 0.0, 1.0]))
        assert abs(float(out) - 2.5) < 0.1

    def test_cos_lobe_irradiance_of_uniform_field(self):
        # Uniform unit radiance → irradiance = pi in any direction.
        n = 8192
        d = mathx.uniform_sample_sphere(jax.random.uniform(jax.random.PRNGKey(2), (n, 2)))
        coeffs = sh.sh3_project_batch(d, jnp.ones((n, 1)))  # [1, 9]
        coeffs_rgb = jnp.tile(coeffs, (3, 1))
        irr = sh.sh3_unproject_cos_lobe(coeffs_rgb, jnp.array([0.0, 1.0, 0.0]))
        np.testing.assert_allclose(np.asarray(irr), np.pi, rtol=0.05)

    def test_sh2_consistent_with_sh3(self):
        d = mathx.uniform_sample_sphere(jax.random.uniform(jax.random.PRNGKey(3), (16, 2)))
        np.testing.assert_allclose(sh.sh2_evaluate(d), sh.sh3_evaluate(d)[..., :4], atol=1e-6)


class TestAgX:
    def test_monotone_in_exposure(self):
        g = jnp.linspace(0.001, 100.0, 64)[:, None] * jnp.ones((1, 3))
        out = tonemap.agx_tonemap(g)
        lum = np.asarray(mathx.luminance(out))
        assert (np.diff(lum) > -1e-4).all()

    def test_output_range(self):
        c = jax.random.uniform(jax.random.PRNGKey(0), (1024, 3)) * 1000.0
        out = tonemap.agx_tonemap(c)
        assert np.asarray(out).min() > -0.2
        assert np.asarray(out).max() < 1.3

    def test_black_maps_near_zero(self):
        out = tonemap.agx_tonemap(jnp.zeros((1, 3)))
        assert float(jnp.abs(out).max()) < 0.02

    def test_mid_grey(self):
        # AgX maps 18% grey near the display mid range.
        out = tonemap.agx_tonemap(jnp.full((1, 3), 0.18), look="default")
        assert 0.3 < float(out.mean()) < 0.6
