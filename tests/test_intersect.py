"""Tests for ray-primitive intersection (ops/intersect.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracer3_tpu.ops import intersect, mathx


class TestRayTriangle:
    def test_hit_center(self):
        o = jnp.array([[0.0, 0.0, -1.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        v0 = jnp.array([[-1.0, -1.0, 0.0]])
        v1 = jnp.array([[1.0, -1.0, 0.0]])
        v2 = jnp.array([[0.0, 1.0, 0.0]])
        t, u, v, hit = intersect.ray_triangle(o, d, v0, v1, v2)
        assert bool(hit[0])
        np.testing.assert_allclose(float(t[0]), 1.0, atol=1e-6)

    def test_miss_outside(self):
        o = jnp.array([[2.0, 2.0, -1.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        v0 = jnp.array([[-1.0, -1.0, 0.0]])
        v1 = jnp.array([[1.0, -1.0, 0.0]])
        v2 = jnp.array([[0.0, 1.0, 0.0]])
        _, _, _, hit = intersect.ray_triangle(o, d, v0, v1, v2)
        assert not bool(hit[0])

    def test_backface_hits(self):
        # Two-sided: hit from behind also reported (reference RT has no cull).
        o = jnp.array([[0.0, 0.0, 1.0]])
        d = jnp.array([[0.0, 0.0, -1.0]])
        v0 = jnp.array([[-1.0, -1.0, 0.0]])
        v1 = jnp.array([[1.0, -1.0, 0.0]])
        v2 = jnp.array([[0.0, 1.0, 0.0]])
        _, _, _, hit = intersect.ray_triangle(o, d, v0, v1, v2)
        assert bool(hit[0])

    def test_barycentric_interpolation(self):
        o = jnp.array([[0.25, 0.25, -5.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        v0 = jnp.array([[0.0, 0.0, 0.0]])
        v1 = jnp.array([[1.0, 0.0, 0.0]])
        v2 = jnp.array([[0.0, 1.0, 0.0]])
        t, u, v, hit = intersect.ray_triangle(o, d, v0, v1, v2)
        # p = v0 + u*(v1-v0) + v*(v2-v0) → u=0.25, v=0.25
        np.testing.assert_allclose([float(u[0]), float(v[0])], [0.25, 0.25], atol=1e-6)

    def test_tmin_respected(self):
        o = jnp.array([[0.0, 0.0, -0.00005]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        v0 = jnp.array([[-1.0, -1.0, 0.0]])
        v1 = jnp.array([[1.0, -1.0, 0.0]])
        v2 = jnp.array([[0.0, 1.0, 0.0]])
        _, _, _, hit = intersect.ray_triangle(o, d, v0, v1, v2, t_min=1e-3)
        assert not bool(hit[0])


class TestRaySphere:
    def test_outside_hit(self):
        t, hit = intersect.ray_sphere(
            jnp.array([[0.0, 0.0, -3.0]]),
            jnp.array([[0.0, 0.0, 1.0]]),
            jnp.array([0.0, 0.0, 0.0]),
            1.0,
        )
        assert bool(hit[0])
        np.testing.assert_allclose(float(t[0]), 2.0, atol=1e-5)

    def test_inside_hit(self):
        t, hit = intersect.ray_sphere(
            jnp.array([[0.0, 0.0, 0.0]]),
            jnp.array([[0.0, 0.0, 1.0]]),
            jnp.array([0.0, 0.0, 0.0]),
            1.0,
        )
        assert bool(hit[0])
        np.testing.assert_allclose(float(t[0]), 1.0, atol=1e-5)


class TestRayAABB:
    def test_hit_and_miss(self):
        o = jnp.array([[0.0, 0.0, -5.0], [3.0, 0.0, -5.0]])
        d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
        inv_d = 1.0 / d
        bmin = jnp.array([-1.0, -1.0, -1.0])
        bmax = jnp.array([1.0, 1.0, 1.0])
        tn, hits = intersect.ray_aabb(o, inv_d, bmin, bmax)
        assert bool(hits[0]) and not bool(hits[1])
        np.testing.assert_allclose(float(tn[0]), 4.0, atol=1e-5)

    def test_ray_inside_box(self):
        o = jnp.array([[0.0, 0.0, 0.0]])
        inv_d = 1.0 / jnp.array([[0.0, 0.0, 1.0]]).clip(1e-30)
        tn, hits = intersect.ray_aabb(
            o, inv_d, jnp.array([-1.0, -1.0, -1.0]), jnp.array([1.0, 1.0, 1.0])
        )
        assert bool(hits[0])


class TestBruteForce:
    def _tris(self):
        # Two parallel quads (4 triangles) at z=1 and z=2.
        v = []
        for z in (1.0, 2.0):
            v += [
                [[-1, -1, z], [1, -1, z], [1, 1, z]],
                [[-1, -1, z], [1, 1, z], [-1, 1, z]],
            ]
        tv = jnp.asarray(v, jnp.float32)
        return tv[:, 0], tv[:, 1], tv[:, 2]

    def test_closest_hit_selected(self):
        v0, v1, v2 = self._tris()
        o = jnp.array([[0.1, 0.1, 0.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        h = intersect.intersect_bruteforce(o, d, v0, v1, v2)
        assert bool(h.hit[0])
        np.testing.assert_allclose(float(h.t[0]), 1.0, atol=1e-5)
        assert int(h.prim_id[0]) in (0, 1)

    def test_miss_returns_background(self):
        v0, v1, v2 = self._tris()
        o = jnp.array([[0.0, 0.0, 0.0]])
        d = jnp.array([[0.0, 0.0, -1.0]])
        h = intersect.intersect_bruteforce(o, d, v0, v1, v2)
        assert not bool(h.hit[0])
        assert float(h.t[0]) == mathx.BACKGROUND_DEPTH
        assert int(h.prim_id[0]) == -1

    def test_occlusion_segment(self):
        v0, v1, v2 = self._tris()
        o = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
        d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
        occ_far = intersect.occluded_bruteforce(o, d, v0, v1, v2, t_max=3.0)
        occ_near = intersect.occluded_bruteforce(o, d, v0, v1, v2, t_max=0.5)
        assert bool(occ_far[0]) and not bool(occ_near[0])

    def test_matches_single_triangle_path(self):
        key = jax.random.PRNGKey(0)
        v0 = jax.random.normal(key, (32, 3))
        v1 = v0 + jax.random.normal(jax.random.PRNGKey(1), (32, 3)) * 0.5
        v2 = v0 + jax.random.normal(jax.random.PRNGKey(2), (32, 3)) * 0.5
        o = jax.random.normal(jax.random.PRNGKey(3), (64, 3)) * 3.0
        d = o * 0  # placeholder
        d = jax.random.normal(jax.random.PRNGKey(4), (64, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        h = intersect.intersect_bruteforce(o, d, v0, v1, v2)
        # Validate each reported hit by recomputing the hit point.
        hits = np.asarray(h.hit)
        if hits.any():
            i = np.nonzero(hits)[0]
            pid = np.asarray(h.prim_id)[i]
            t = np.asarray(h.t)[i]
            u = np.asarray(h.uv)[i, 0]
            v = np.asarray(h.uv)[i, 1]
            p_ray = np.asarray(o)[i] + t[:, None] * np.asarray(d)[i]
            p_tri = (
                np.asarray(v0)[pid] * (1 - u - v)[:, None]
                + np.asarray(v1)[pid] * u[:, None]
                + np.asarray(v2)[pid] * v[:, None]
            )
            np.testing.assert_allclose(p_ray, p_tri, atol=1e-3)
