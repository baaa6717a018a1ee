"""LBVH build + traversal tests: structural validation and agreement with the
brute-force oracle (SURVEY.md §7 step 5: 'validate against brute-force
intersection on small meshes')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer3_tpu.ops import bvh as bvh_mod
from raytracer3_tpu.ops import intersect, traverse
from raytracer3_tpu.scene import analytic


def random_tris(key, t, spread=2.0):
    k1, k2, k3 = jax.random.split(key, 3)
    base = jax.random.uniform(k1, (t, 3), minval=-spread, maxval=spread)
    e1 = jax.random.normal(k2, (t, 3)) * 0.3
    e2 = jax.random.normal(k3, (t, 3)) * 0.3
    return base, base + e1, base + e2


def random_rays(key, n, spread=4.0):
    k1, k2 = jax.random.split(key)
    o = jax.random.uniform(k1, (n, 3), minval=-spread, maxval=spread)
    d = jax.random.normal(k2, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


class TestBuild:
    @pytest.mark.parametrize("t", [2, 3, 17, 128])
    def test_structure_valid(self, t):
        v0, v1, v2 = random_tris(jax.random.PRNGKey(t), t)
        bvh = bvh_mod.build_lbvh(v0, v1, v2)
        bvh_mod.validate_bvh_host(bvh)

    def test_duplicate_positions(self):
        # All triangles at the same location → identical morton codes; the
        # index tiebreak must still give a valid tree.
        v0 = jnp.zeros((16, 3))
        v1 = jnp.tile(jnp.array([0.1, 0.0, 0.0]), (16, 1))
        v2 = jnp.tile(jnp.array([0.0, 0.1, 0.0]), (16, 1))
        bvh = bvh_mod.build_lbvh(v0, v1, v2)
        bvh_mod.validate_bvh_host(bvh)

    def test_root_covers_scene(self):
        v0, v1, v2 = random_tris(jax.random.PRNGKey(0), 64)
        bvh = bvh_mod.build_lbvh(v0, v1, v2)
        smin = np.minimum(np.minimum(np.asarray(v0), np.asarray(v1)), np.asarray(v2)).min(0)
        smax = np.maximum(np.maximum(np.asarray(v0), np.asarray(v1)), np.asarray(v2)).max(0)
        np.testing.assert_allclose(np.asarray(bvh.node_min[0]), smin, atol=1e-5)
        np.testing.assert_allclose(np.asarray(bvh.node_max[0]), smax, atol=1e-5)

    def test_build_jits(self):
        v0, v1, v2 = random_tris(jax.random.PRNGKey(1), 32)
        bvh = jax.jit(bvh_mod.build_lbvh)(v0, v1, v2)
        bvh_mod.validate_bvh_host(jax.tree.map(np.asarray, bvh))


class TestTraversal:
    @pytest.mark.parametrize("t,n", [(8, 64), (128, 128)])
    def test_matches_bruteforce(self, t, n):
        v0, v1, v2 = random_tris(jax.random.PRNGKey(t + n), t)
        o, d = random_rays(jax.random.PRNGKey(t * n), n)
        bvh = bvh_mod.build_lbvh(v0, v1, v2)
        hb = intersect.intersect_bruteforce(o, d, v0, v1, v2)
        ht = traverse.bvh_intersect(bvh, v0, v1, v2, o, d)
        np.testing.assert_array_equal(np.asarray(hb.hit), np.asarray(ht.hit))
        m = np.asarray(hb.hit)
        np.testing.assert_allclose(
            np.asarray(hb.t)[m], np.asarray(ht.t)[m], rtol=1e-5
        )
        if m.any():
            # Same triangle unless two tris are coincident at identical t.
            same = np.asarray(hb.prim_id)[m] == np.asarray(ht.prim_id)[m]
            assert same.mean() > 0.95

    def test_cornell_scene(self):
        scene = analytic.cornell_box()
        v0, v1, v2 = scene.tri_vertices()
        bvh = bvh_mod.build_lbvh(v0, v1, v2)
        o, d = random_rays(jax.random.PRNGKey(9), 256, spread=0.9)
        hb = intersect.intersect_bruteforce(o, d, v0, v1, v2)
        ht = traverse.bvh_intersect(bvh, v0, v1, v2, o, d)
        np.testing.assert_array_equal(np.asarray(hb.hit), np.asarray(ht.hit))
        m = np.asarray(hb.hit)
        np.testing.assert_allclose(np.asarray(hb.t)[m], np.asarray(ht.t)[m], rtol=1e-5)

    def test_occlusion_matches_bruteforce(self):
        v0, v1, v2 = random_tris(jax.random.PRNGKey(2), 64)
        o, d = random_rays(jax.random.PRNGKey(3), 128)
        bvh = bvh_mod.build_lbvh(v0, v1, v2)
        for tmax in (0.5, 3.0, 100.0):
            ob = intersect.occluded_bruteforce(o, d, v0, v1, v2, t_max=tmax)
            ot = traverse.bvh_occluded(bvh, v0, v1, v2, o, d, t_max=tmax)
            np.testing.assert_array_equal(np.asarray(ob), np.asarray(ot))

    def test_per_ray_tmax(self):
        v0, v1, v2 = random_tris(jax.random.PRNGKey(4), 32)
        o, d = random_rays(jax.random.PRNGKey(5), 64)
        tmax = jax.random.uniform(jax.random.PRNGKey(6), (64,), minval=0.1, maxval=5.0)
        bvh = bvh_mod.build_lbvh(v0, v1, v2)
        ob = intersect.occluded_bruteforce(o, d, v0, v1, v2, t_max=tmax)
        ot = traverse.bvh_occluded(bvh, v0, v1, v2, o, d, t_max=tmax)
        np.testing.assert_array_equal(np.asarray(ob), np.asarray(ot))

    def test_traversal_jits(self):
        v0, v1, v2 = random_tris(jax.random.PRNGKey(7), 16)
        o, d = random_rays(jax.random.PRNGKey(8), 32)
        bvh = bvh_mod.build_lbvh(v0, v1, v2)
        f = jax.jit(lambda o, d: traverse.bvh_intersect(bvh, v0, v1, v2, o, d))
        h1 = f(o, d)
        h2 = traverse.bvh_intersect(bvh, v0, v1, v2, o, d)
        np.testing.assert_array_equal(np.asarray(h1.hit), np.asarray(h2.hit))
