"""8-wide BVH collapse + traversal tests vs the brute-force oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer3_tpu.ops import bvh as bvh_mod
from raytracer3_tpu.ops import intersect, wide_bvh
from raytracer3_tpu.scene import analytic, procedural
from raytracer3_tpu.scene import types as scene_types

from tests.test_bvh import random_rays, random_tris


class TestCollapse:
    @pytest.mark.parametrize("t,leaf", [(2, 1), (9, 2), (64, 4), (257, 4)])
    def test_all_triangles_reachable(self, t, leaf):
        v0, v1, v2 = random_tris(jax.random.PRNGKey(t), t)
        wb = wide_bvh.build_wide(v0, v1, v2, leaf_size=leaf)
        # Walk the wide tree host-side, collect leaf ranges.
        codes = np.asarray(wb.child_code)
        seen = np.zeros(t, int)
        stack = [0]
        while stack:
            w = stack.pop()
            for c in codes[w]:
                if c == -1:
                    continue
                if c >= 0:
                    stack.append(int(c))
                else:
                    bits = -(int(c) + 2)
                    start = bits >> 4
                    count = bits & 15
                    assert 1 <= count <= leaf
                    seen[start : start + count] += 1
        assert (seen == 1).all()

    def test_child_boxes_contain_triangles(self):
        t = 64
        v0, v1, v2 = random_tris(jax.random.PRNGKey(1), t)
        wb = wide_bvh.build_wide(v0, v1, v2, leaf_size=4)
        codes = np.asarray(wb.child_code)
        cmin = np.asarray(wb.child_min)
        cmax = np.asarray(wb.child_max)
        tv = [np.asarray(wb.tri_v0), np.asarray(wb.tri_v1), np.asarray(wb.tri_v2)]
        for w in range(codes.shape[0]):
            for s in range(8):
                c = codes[w, s]
                if c >= -1:
                    continue
                bits = -(int(c) + 2)
                start, count = bits >> 4, bits & 15
                for k in range(start, start + count):
                    for v in tv:
                        assert (v[k] >= cmin[w, s] - 1e-4).all()
                        assert (v[k] <= cmax[w, s] + 1e-4).all()


class TestWideTraversal:
    @pytest.mark.parametrize("t,n", [(16, 64), (200, 128)])
    def test_matches_bruteforce(self, t, n):
        v0, v1, v2 = random_tris(jax.random.PRNGKey(t + n), t)
        o, d = random_rays(jax.random.PRNGKey(t * n + 1), n)
        wb = wide_bvh.build_wide(v0, v1, v2, leaf_size=4)
        hb = intersect.intersect_bruteforce(o, d, v0, v1, v2)
        ht = wide_bvh.wbvh_intersect(wb, o, d)
        np.testing.assert_array_equal(np.asarray(hb.hit), np.asarray(ht.hit))
        m = np.asarray(hb.hit)
        np.testing.assert_allclose(np.asarray(hb.t)[m], np.asarray(ht.t)[m], rtol=1e-5)

    def test_cornell(self):
        scene = analytic.cornell_box()
        v0, v1, v2 = scene.tri_vertices()
        wb = wide_bvh.build_wide(v0, v1, v2, leaf_size=4)
        o, d = random_rays(jax.random.PRNGKey(3), 256, spread=0.9)
        hb = intersect.intersect_bruteforce(o, d, v0, v1, v2)
        ht = wide_bvh.wbvh_intersect(wb, o, d)
        np.testing.assert_array_equal(np.asarray(hb.hit), np.asarray(ht.hit))
        m = np.asarray(hb.hit)
        np.testing.assert_allclose(np.asarray(hb.t)[m], np.asarray(ht.t)[m], rtol=1e-5)

    def test_atrium_subset(self):
        kw = procedural.atrium(detail=1)
        scene = scene_types.make_scene(**kw)
        v0, v1, v2 = scene.tri_vertices()
        wb = wide_bvh.build_wide(v0, v1, v2, leaf_size=4)
        o, d = random_rays(jax.random.PRNGKey(4), 128, spread=6.0)
        hb = intersect.intersect_bruteforce(o, d, v0, v1, v2)
        ht = wide_bvh.wbvh_intersect(wb, o, d)
        np.testing.assert_array_equal(np.asarray(hb.hit), np.asarray(ht.hit))
        m = np.asarray(hb.hit)
        np.testing.assert_allclose(np.asarray(hb.t)[m], np.asarray(ht.t)[m], rtol=1e-4)

    def test_occlusion(self):
        v0, v1, v2 = random_tris(jax.random.PRNGKey(5), 64)
        o, d = random_rays(jax.random.PRNGKey(6), 128)
        wb = wide_bvh.build_wide(v0, v1, v2, leaf_size=4)
        for tmax in (0.5, 5.0):
            ob = intersect.occluded_bruteforce(o, d, v0, v1, v2, t_max=tmax)
            ot = wide_bvh.wbvh_intersect(wb, o, d, t_max=tmax, any_hit=True).hit
            np.testing.assert_array_equal(np.asarray(ob), np.asarray(ot))
