"""Tests for ops/rng.py (counter-based RNG, LDS sequences) and ops/packing.py
(G-buffer codecs), mirroring shaders/include/random.slang and packing.slang."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracer3_tpu.ops import packing, rng


class TestHashes:
    def test_jenkins_reference_values(self):
        # Reference implementation (random.slang:5-15) computed by hand in
        # numpy uint32 arithmetic.
        def ref(a):
            a = np.uint32(a)
            with np.errstate(over="ignore"):
                a = np.uint32((a + np.uint32(0x7ED55D16)) + np.uint32(a << np.uint32(12)))
                a = np.uint32((a ^ np.uint32(0xC761C23C)) ^ (a >> np.uint32(19)))
                a = np.uint32((a + np.uint32(0x165667B1)) + np.uint32(a << np.uint32(5)))
                a = np.uint32((a + np.uint32(0xD3A2646C)) ^ np.uint32(a << np.uint32(9)))
                a = np.uint32((a + np.uint32(0xFD7046C5)) + np.uint32(a << np.uint32(3)))
                a = np.uint32((a ^ np.uint32(0xB55A4F09)) ^ (a >> np.uint32(16)))
            return a

        xs = np.array([0, 1, 2, 12345, 0xFFFFFFFF], dtype=np.uint32)
        got = np.asarray(rng.jenkins_hash(jnp.asarray(xs)))
        want = np.array([ref(x) for x in xs], dtype=np.uint32)
        np.testing.assert_array_equal(got, want)

    def test_uniform_float_range(self):
        s = rng.Sampler.from_ids(jnp.arange(4096, dtype=jnp.uint32), 7)
        u, s = s.next1()
        assert (u >= 0.0).all() and (u < 1.0).all()
        # Should look uniform.
        assert abs(float(jnp.mean(u)) - 0.5) < 0.02

    def test_sequential_draws_differ(self):
        s = rng.Sampler.from_ids(jnp.arange(16, dtype=jnp.uint32), 0)
        u1, s = s.next1()
        u2, s = s.next1()
        assert not np.allclose(np.asarray(u1), np.asarray(u2))

    def test_frames_decorrelated(self):
        ids = jnp.arange(64, dtype=jnp.uint32)
        u_a, _ = rng.Sampler.from_ids(ids, 0).next1()
        u_b, _ = rng.Sampler.from_ids(ids, 1).next1()
        assert not np.allclose(np.asarray(u_a), np.asarray(u_b))


class TestLDS:
    def test_radical_inverse(self):
        # radical_inverse(1) = 0.5, (2) = 0.25, (3) = 0.75
        got = rng.radical_inverse_vdc(jnp.array([1, 2, 3], dtype=jnp.uint32))
        np.testing.assert_allclose(got, [0.5, 0.25, 0.75], atol=1e-7)

    def test_hammersley_in_unit_square(self):
        pts = rng.hammersley(jnp.arange(64, dtype=jnp.uint32), 64)
        assert (pts > 0).all() and (pts <= 1.0).all()

    def test_r2_low_discrepancy(self):
        pts = np.asarray(rng.r2_sequence(jnp.arange(1024, dtype=jnp.uint32)))
        assert (pts >= 0).all() and (pts < 1.0).all()
        # Star-discrepancy proxy: mean close to 0.5 in each dim.
        np.testing.assert_allclose(pts.mean(axis=0), [0.5, 0.5], atol=0.01)


class TestBlueNoise:
    def test_generate_small(self):
        bn = rng.generate_blue_noise(size=16)
        assert bn.shape == (16, 16)
        # A rank texture is a permutation: all values distinct, uniform.
        assert len(np.unique(bn)) == 256
        assert 0.0 < bn.min() < bn.max() < 1.0

    def test_spectrum_is_blue(self):
        # High-frequency energy should dominate low-frequency energy.
        bn = rng.generate_blue_noise(size=32)
        f = np.abs(np.fft.fft2(bn - bn.mean()))
        fx = np.fft.fftfreq(32)
        r = np.sqrt(fx[:, None] ** 2 + fx[None, :] ** 2)
        low = f[(r > 0) & (r < 0.15)].mean()
        high = f[r > 0.35].mean()
        assert high > 2.0 * low


class TestPacking:
    def test_unorm_roundtrip(self):
        v = jnp.linspace(0, 1, 33)
        for bits in (8, 10, 11):
            got = packing.unpack_unorm(packing.pack_unorm(v, bits), bits)
            np.testing.assert_allclose(got, v, atol=1.0 / ((1 << bits) - 1))

    def test_normal_roundtrip(self):
        v = jax.random.normal(jax.random.PRNGKey(0), (256, 3))
        n = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        got = packing.unpack_normal_11_10_11(packing.pack_normal_11_10_11(n))
        dots = jnp.sum(got * n, axis=-1)
        assert (dots > 0.9999).all()

    def test_color888_roundtrip(self):
        c = jax.random.uniform(jax.random.PRNGKey(1), (128, 3))
        got = packing.unpack_color_888(packing.pack_color_888(c))
        np.testing.assert_allclose(got, c, atol=0.01)

    def test_octa_roundtrip(self):
        v = jax.random.normal(jax.random.PRNGKey(2), (512, 3))
        n = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        got = packing.octa_decode(packing.octa_encode(n))
        np.testing.assert_allclose(got, n, atol=1e-5)

    def test_octa_lower_hemisphere(self):
        n = jnp.array([[0.0, 0.0, -1.0], [0.3, -0.4, -0.866]])
        n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
        got = packing.octa_decode(packing.octa_encode(n))
        np.testing.assert_allclose(got, n, atol=1e-5)

    def test_2xf16_roundtrip(self):
        f = jnp.array([[0.5, -1.25], [1024.0, 1e-4], [0.0, 65504.0]])
        got = packing.unpack_2xf16(packing.pack_2xf16(f))
        np.testing.assert_allclose(got, f, rtol=1e-3)

    def test_rgb9e5_roundtrip(self):
        c = np.array(
            [[0.5, 0.25, 0.125], [100.0, 3.0, 0.01], [0.0, 0.0, 0.0], [1e4, 1e4, 1e4]],
            np.float32,
        )
        got = np.asarray(packing.unpack_rgb9e5(packing.pack_rgb9e5(jnp.asarray(c))))
        want = np.clip(c, 0, packing.MAX_RGB9E5)
        # Shared exponent: absolute error bounded by the row max's ulp
        # (9-bit mantissa ⇒ step = rowmax / 2^8 at worst).
        atol = np.maximum(want.max(axis=-1, keepdims=True), 1e-6) / 256.0
        assert (np.abs(got - want) <= atol + 1e-7).all()

    def test_rgb9e5_shared_exponent_precision(self):
        # Small channel next to a big one loses precision but stays bounded.
        c = jnp.array([[512.0, 0.4, 0.0]])
        got = packing.unpack_rgb9e5(packing.pack_rgb9e5(c))
        assert abs(float(got[0, 0]) - 512.0) < 1.0
        assert abs(float(got[0, 1]) - 0.4) <= 1.0  # quantized to ~1ulp of 512
