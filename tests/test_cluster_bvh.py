"""Gather-free cluster-BVH tests vs the brute-force oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer3_tpu.ops import cluster_bvh, intersect
from raytracer3_tpu.scene import analytic, procedural
from raytracer3_tpu.scene import types as scene_types

from tests.test_bvh import random_rays, random_tris


def check_match(v0, v1, v2, o, d, cb, rtol=1e-4):
    hb = intersect.intersect_bruteforce(o, d, v0, v1, v2)
    ht = cluster_bvh.cbvh_intersect(cb, o, d)
    np.testing.assert_array_equal(np.asarray(hb.hit), np.asarray(ht.hit))
    m = np.asarray(hb.hit)
    np.testing.assert_allclose(np.asarray(hb.t)[m], np.asarray(ht.t)[m], rtol=rtol)


class TestBuild:
    @pytest.mark.parametrize("t,ls", [(5, 8), (16, 4), (100, 8), (300, 16)])
    def test_all_triangles_in_clusters(self, t, ls):
        v0, v1, v2 = random_tris(jax.random.PRNGKey(t), t)
        cb = cluster_bvh.build_cluster_bvh(v0, v1, v2, leaf_size=ls)
        ids = np.asarray(cb.tri_id).ravel()
        real = ids[ids >= 0]
        assert len(real) == t and len(np.unique(real)) == t

    def test_leaf_codes_reference_every_cluster(self):
        t = 200
        v0, v1, v2 = random_tris(jax.random.PRNGKey(1), t)
        cb = cluster_bvh.build_cluster_bvh(v0, v1, v2, leaf_size=8)
        codes = np.asarray(cb.node_table[:, 48:56])
        leaves = codes[codes < -1.5]
        clusters = (-(leaves) - 2).astype(int)
        assert set(clusters) == set(range(cb.num_clusters))


class TestTraversal:
    @pytest.mark.parametrize("t,n,ls", [(5, 32, 8), (64, 64, 4), (333, 128, 8)])
    def test_matches_bruteforce(self, t, n, ls):
        v0, v1, v2 = random_tris(jax.random.PRNGKey(t + n), t)
        o, d = random_rays(jax.random.PRNGKey(t * n + 5), n)
        cb = cluster_bvh.build_cluster_bvh(v0, v1, v2, leaf_size=ls)
        check_match(v0, v1, v2, o, d, cb)

    def test_cornell(self):
        scene = analytic.cornell_box()
        v0, v1, v2 = scene.tri_vertices()
        cb = cluster_bvh.build_cluster_bvh(v0, v1, v2, leaf_size=8)
        o, d = random_rays(jax.random.PRNGKey(2), 256, spread=0.9)
        check_match(v0, v1, v2, o, d, cb)

    def test_atrium(self):
        kw = procedural.atrium(detail=1)
        scene = scene_types.make_scene(**kw)
        v0, v1, v2 = scene.tri_vertices()
        cb = cluster_bvh.build_cluster_bvh(v0, v1, v2, leaf_size=8)
        o, d = random_rays(jax.random.PRNGKey(3), 128, spread=6.0)
        check_match(v0, v1, v2, o, d, cb)

    def test_occlusion(self):
        v0, v1, v2 = random_tris(jax.random.PRNGKey(4), 100)
        o, d = random_rays(jax.random.PRNGKey(5), 128)
        cb = cluster_bvh.build_cluster_bvh(v0, v1, v2, leaf_size=8)
        for tmax in (0.5, 5.0):
            ob = intersect.occluded_bruteforce(o, d, v0, v1, v2, t_max=tmax)
            ot = cluster_bvh.cbvh_intersect(cb, o, d, t_max=tmax, any_hit=True).hit
            np.testing.assert_array_equal(np.asarray(ob), np.asarray(ot))

    def test_jits(self):
        v0, v1, v2 = random_tris(jax.random.PRNGKey(6), 64)
        o, d = random_rays(jax.random.PRNGKey(7), 64)
        cb = cluster_bvh.build_cluster_bvh(v0, v1, v2, leaf_size=8)
        f = jax.jit(lambda o, d: cluster_bvh.cbvh_intersect(cb, o, d))
        h1 = f(o, d)
        h2 = cluster_bvh.cbvh_intersect(cb, o, d)
        np.testing.assert_array_equal(np.asarray(h1.hit), np.asarray(h2.hit))
