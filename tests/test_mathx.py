"""Property tests for the core math library (ops/mathx.py), mirroring the
behavior of shaders/include/math.slang."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer3_tpu.ops import mathx


def rand_dirs(key, n):
    v = jax.random.normal(key, (n, 3))
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


class TestONB:
    def test_orthonormal(self):
        n = rand_dirs(jax.random.PRNGKey(0), 256)
        m = mathx.build_orthonormal_basis(n)
        eye = jnp.einsum("...ij,...ik->...jk", m, m)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)

    def test_z_maps_to_normal(self):
        n = rand_dirs(jax.random.PRNGKey(1), 64)
        m = mathx.build_orthonormal_basis(n)
        z = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (64, 1))
        np.testing.assert_allclose(mathx.to_world(m, z), n, atol=1e-6)

    def test_right_handed(self):
        n = rand_dirs(jax.random.PRNGKey(2), 64)
        m = mathx.build_orthonormal_basis(n)
        b1, b2 = m[..., 0], m[..., 1]
        np.testing.assert_allclose(jnp.cross(b1, b2), n, atol=1e-5)

    def test_matches_reference_branches(self):
        # Reference math.slang:29-50 has explicit n.z<0 / n.z>=0 branches;
        # check both against the branchless form's defining identities.
        for nz in (0.9, -0.9):
            n = jnp.array([[0.1, 0.2, nz]])
            n = n / jnp.linalg.norm(n)
            m = mathx.build_orthonormal_basis(n)
            eye = jnp.einsum("...ij,...ik->...jk", m, m)
            np.testing.assert_allclose(eye[0], np.eye(3), atol=1e-6)

    def test_local_world_roundtrip(self):
        key = jax.random.PRNGKey(3)
        n = rand_dirs(key, 32)
        v = jax.random.normal(jax.random.PRNGKey(4), (32, 3))
        m = mathx.build_orthonormal_basis(n)
        np.testing.assert_allclose(
            mathx.to_local(m, mathx.to_world(m, v)), v, atol=1e-5
        )


class TestSampling:
    def test_hemisphere_above_horizon(self):
        u = jax.random.uniform(jax.random.PRNGKey(0), (512, 2))
        for fn in (mathx.uniform_sample_hemisphere, mathx.cosine_sample_hemisphere):
            d = fn(u)
            assert (d[..., 2] >= -1e-6).all()
            np.testing.assert_allclose(jnp.linalg.norm(d, axis=-1), 1.0, atol=1e-5)

    def test_sphere_unit(self):
        u = jax.random.uniform(jax.random.PRNGKey(1), (512, 2))
        d = mathx.uniform_sample_sphere(u)
        np.testing.assert_allclose(jnp.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
        # Mean should be near zero for uniform sphere.
        assert float(jnp.abs(jnp.mean(d[..., 2]))) < 0.1

    def test_cone_within_angle(self):
        u = jax.random.uniform(jax.random.PRNGKey(2), (512, 2))
        cos_max = 0.8
        d = mathx.uniform_sample_cone(u, cos_max)
        assert (d[..., 2] >= cos_max - 1e-5).all()

    def test_cosine_hemisphere_mean(self):
        # E[cos theta] under pdf cos/pi is 2/3.
        u = jax.random.uniform(jax.random.PRNGKey(3), (200_000, 2))
        d = mathx.cosine_sample_hemisphere(u)
        assert abs(float(jnp.mean(d[..., 2])) - 2.0 / 3.0) < 5e-3


class TestEquirect:
    def test_roundtrip(self):
        d = rand_dirs(jax.random.PRNGKey(0), 256)
        uv = mathx.direction_to_equirect_uv(d)
        assert (uv >= 0).all() and (uv <= 1).all()
        d2 = mathx.equirect_uv_to_direction(uv)
        np.testing.assert_allclose(d2, d, atol=1e-4)

    def test_axes(self):
        # +x axis maps to u=0.5 (atan2(0,1)=0), y=0 -> v=0.5
        uv = mathx.direction_to_equirect_uv(jnp.array([1.0, 0.0, 0.0]))
        np.testing.assert_allclose(uv, [0.5, 0.5], atol=1e-6)
        # +y (up) maps to v=0
        uv = mathx.direction_to_equirect_uv(jnp.array([0.0, 1.0, 0.0]))
        np.testing.assert_allclose(uv[1], 0.0, atol=1e-6)


class TestMorton:
    def test_zcurve_small(self):
        # interleave: (x=1,y=0)->1, (0,1)->2, (1,1)->3, (2,3)->14
        xy = jnp.array([[1, 0], [0, 1], [1, 1], [2, 3]], dtype=jnp.uint32)
        z = mathx.zcurve_index(xy)
        np.testing.assert_array_equal(np.asarray(z), [1, 2, 3, 14])

    def test_zcurve_bijective_on_tile(self):
        xs, ys = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
        xy = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1), dtype=jnp.uint32)
        z = np.asarray(mathx.zcurve_index(xy))
        assert len(np.unique(z)) == 256
        assert z.max() == 255

    def test_morton3d_ordering(self):
        # Points sorted by morton should roughly cluster spatially: check
        # determinism + range.
        p = jnp.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])
        m = mathx.morton3d(p)
        assert int(m[0]) == 0
        assert int(m[1]) == (1 << 30) - 1


class TestMisc:
    def test_prelerp_identity(self):
        # lerp(a, d.rgb, d.a) == lerp(lerp(a, b.rgb, b.a), c.rgb, c.a)
        key = jax.random.PRNGKey(0)
        a = jax.random.uniform(key, (64, 3))
        b = jax.random.uniform(jax.random.PRNGKey(1), (64, 4))
        c = jax.random.uniform(jax.random.PRNGKey(2), (64, 4))
        d = mathx.prelerp(b, c)
        lhs = a + (d[..., :3] - a) * d[..., 3:4]
        inner = a + (b[..., :3] - a) * b[..., 3:4]
        rhs = inner + (c[..., :3] - inner) * c[..., 3:4]
        np.testing.assert_allclose(lhs, rhs, atol=1e-5)

    def test_squish_roundtrip(self):
        x = jnp.array([0.01, 0.1, 1.0, 5.0])
        s = mathx.exponential_squish(x, 2.0)
        np.testing.assert_allclose(mathx.exponential_unsquish(s, 2.0), x, rtol=1e-4)

    def test_luminance(self):
        np.testing.assert_allclose(
            float(mathx.luminance(jnp.array([1.0, 1.0, 1.0]))), 1.0, atol=1e-6
        )

    def test_reflect(self):
        v = jnp.array([1.0, -1.0, 0.0]) / np.sqrt(2)
        n = jnp.array([0.0, 1.0, 0.0])
        r = mathx.reflect(v, n)
        np.testing.assert_allclose(r, jnp.array([1.0, 1.0, 0.0]) / np.sqrt(2), atol=1e-6)


class TestMapRowGather:
    def test_chunked_matches_direct(self):
        import numpy as np

        rng = np.random.default_rng(11)
        tab = jnp.asarray(rng.standard_normal((64, 16), dtype=np.float32))
        idx = jnp.asarray(rng.integers(0, 64, 4096).astype(np.int32))
        u = jnp.asarray(rng.random((4096, 3), dtype=np.float32))

        def fn(rows, uc):
            a = rows[:, 0] * uc[:, 0]
            b = jnp.where((uc[:, 1] > 0.5)[:, None], rows[:, 3:6], rows[:, 7:10])
            return a, b

        direct = fn(tab[idx], u)
        chunked = mathx.map_row_gather(tab, idx, fn, extras=(u,), max_chunk=512)
        for d, c in zip(direct, chunked):
            np.testing.assert_array_equal(np.asarray(d), np.asarray(c))

    def test_ragged_n_picks_divisor(self):
        import numpy as np

        tab = jnp.asarray(np.arange(40, dtype=np.float32).reshape(10, 4))
        idx = jnp.asarray((np.arange(4100) % 10).astype(np.int32))
        out = mathx.map_row_gather(
            tab, idx, lambda r: r[:, 1] + 1.0, max_chunk=1000
        )
        np.testing.assert_array_equal(
            np.asarray(out), np.asarray(tab[idx][:, 1] + 1.0)
        )
