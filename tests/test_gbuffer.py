"""Packed G-buffer roundtrip tests (GbufferDataPacked parity)."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracer3_tpu.render import gbuffer
from raytracer3_tpu.scene.types import SurfaceInfo


def random_surface(n=256):
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 5)
    nrm = jax.random.normal(ks[0], (n, 3))
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    return SurfaceInfo(
        albedo=jax.random.uniform(ks[1], (n, 3)),
        emissive=jax.random.uniform(ks[2], (n, 3)) * 30.0,
        normal=nrm,
        roughness=jax.random.uniform(ks[3], (n,)),
        metalness=jax.random.uniform(ks[4], (n,)),
    )


class TestPackedGBuffer:
    def test_roundtrip_precision(self):
        s = random_surface()
        depth = jnp.linspace(0.1, 100.0, 256)
        g = gbuffer.pack_surface(s, depth)
        assert g.data.dtype == jnp.uint32 and g.data.shape == (256, 4)
        out = gbuffer.unpack_surface(g)
        np.testing.assert_allclose(np.asarray(out.albedo), np.asarray(s.albedo), atol=0.01)
        dots = np.sum(np.asarray(out.normal) * np.asarray(s.normal), -1)
        assert dots.min() > 0.9999
        np.testing.assert_allclose(np.asarray(out.roughness), np.asarray(s.roughness), atol=5e-3)
        np.testing.assert_allclose(np.asarray(out.metalness), np.asarray(s.metalness), atol=1e-3)
        em, want = np.asarray(out.emissive), np.asarray(s.emissive)
        atol = np.maximum(want.max(-1, keepdims=True), 1e-6) / 256.0
        assert (np.abs(em - want) <= atol + 1e-6).all()
        np.testing.assert_array_equal(np.asarray(g.depth), np.asarray(depth))

    def test_unpack_normal_fast_path(self):
        s = random_surface(64)
        g = gbuffer.pack_surface(s, jnp.zeros(64))
        n1 = gbuffer.unpack_normal(g)
        n2 = gbuffer.unpack_surface(g).normal
        np.testing.assert_allclose(np.asarray(n1), np.asarray(n2), atol=1e-7)

    def test_perceptual_roughness_roundtrip(self):
        r = jnp.linspace(0, 1, 17)
        np.testing.assert_allclose(
            np.asarray(gbuffer.perceptual_to_roughness(gbuffer.roughness_to_perceptual(r))),
            np.asarray(r),
            atol=1e-6,
        )


class TestPackedGBufferEdges:
    """Boundary behavior of the packed layout (gbuffer_helpers.slang:5-70):
    the pack must be total over the renderer's value ranges, bit-stable,
    and jit-boundary-safe (uint32 planes round-trip HBM exactly)."""

    def test_extreme_values(self):
        n = 7
        s = SurfaceInfo(
            albedo=jnp.asarray(
                [[0, 0, 0], [1, 1, 1], [1, 0, 0], [0, 1, 0], [0, 0, 1],
                 [0.5, 0.25, 0.125], [1e-4, 1e-4, 1e-4]], jnp.float32
            ),
            emissive=jnp.asarray(
                [[0, 0, 0], [1e4, 1e4, 1e4], [3e4, 0, 0], [0, 1e-6, 0],
                 [12, 12, 12], [0.1, 100, 0.1], [5e3, 5e3, 5e3]],
                jnp.float32,
            ),
            # Octahedral seams: axis-aligned and diagonal unit normals.
            normal=jnp.asarray(
                [[0, 0, 1], [0, 0, -1], [1, 0, 0], [0, -1, 0],
                 [0.70710678, 0.70710678, 0],
                 [-0.57735, -0.57735, -0.57735], [0, 1, 0]],
                jnp.float32,
            ),
            roughness=jnp.asarray([0, 1, 0.5, 0, 1, 0.25, 0.75], jnp.float32),
            metalness=jnp.asarray([0, 1, 1, 0, 0.5, 0.1, 0.9], jnp.float32),
        )
        depth = jnp.asarray([0.1, 1e5, 3.0, 7.0, 11.0, 0.5, 2.0], jnp.float32)
        g = gbuffer.pack_surface(s, depth)
        out = gbuffer.unpack_surface(g)
        np.testing.assert_allclose(
            np.asarray(out.albedo), np.asarray(s.albedo), atol=0.01
        )
        dots = np.sum(np.asarray(out.normal) * np.asarray(s.normal), -1)
        assert dots.min() > 0.999
        np.testing.assert_allclose(
            np.asarray(out.roughness), np.asarray(s.roughness), atol=5e-3
        )
        # rgb9e5 emissive: relative error bounded by the 9-bit mantissa.
        em, want = np.asarray(out.emissive), np.asarray(s.emissive)
        tol = np.maximum(want.max(-1, keepdims=True), 1e-6) / 256.0
        assert (np.abs(em - want) <= tol + 1e-6).all()

    def test_pack_bit_stable_and_jit_safe(self):
        s = random_surface(128)
        depth = jnp.linspace(0.1, 50.0, 128)
        g1 = gbuffer.pack_surface(s, depth)
        g2 = jax.jit(gbuffer.pack_surface)(s, depth)
        np.testing.assert_array_equal(np.asarray(g1.data), np.asarray(g2.data))
        out1 = gbuffer.unpack_surface(g1)
        out2 = jax.jit(gbuffer.unpack_surface)(g2)
        # Integer planes are bit-equal; the float decode may differ by
        # ulps between eager and jit (XLA op fusion/contraction).
        np.testing.assert_allclose(
            np.asarray(out1.albedo), np.asarray(out2.albedo), atol=1e-6
        )
