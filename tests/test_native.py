"""Tests for the native C++ asset-pipeline library (native/rt3native.cpp) and
its ctypes bindings (raytracer3_tpu/native.py) — the meshopt/encoder analog
(reference assets/mod.rs:253-267, meshopt/encoder.rs, meshopt/meshopt.rs)."""

import numpy as np
import pytest

from raytracer3_tpu import native
from raytracer3_tpu.ops import bvh as bvh_mod


@pytest.fixture(scope="module")
def lib_ok():
    ok = native.available()
    if not ok:
        pytest.skip("native toolchain unavailable")
    return ok


def make_grid_mesh(n=16):
    """Shared-vertex grid: (n+1)^2 verts, 2n^2 tris."""
    xs, ys = np.meshgrid(np.arange(n + 1), np.arange(n + 1), indexing="ij")
    verts = np.stack([xs.ravel(), ys.ravel(), np.zeros((n + 1) ** 2)], -1).astype(np.float32)
    tris = []
    for i in range(n):
        for j in range(n):
            a = i * (n + 1) + j
            b = a + 1
            c = a + (n + 1)
            d = c + 1
            tris += [[a, b, d], [a, d, c]]
    return verts, np.asarray(tris, np.int32)


class TestWeld:
    def test_dedup(self, lib_ok):
        attrs = np.asarray(
            [[0, 0, 0], [1, 1, 1], [0, 0, 0], [2, 2, 2], [1, 1, 1]], np.float32
        )
        remap, n = native.weld_vertices(attrs)
        assert n == 3
        np.testing.assert_array_equal(remap, [0, 1, 0, 2, 1])


class TestCacheOptim:
    def test_improves_acmr_on_shuffled_grid(self, lib_ok):
        verts, tris = make_grid_mesh(24)
        rng = np.random.default_rng(0)
        shuffled = tris[rng.permutation(len(tris))]
        acmr_before, _ = native.analyze_cache(shuffled, len(verts), 16)
        opt = native.optimize_vertex_cache(shuffled, len(verts))
        acmr_after, _ = native.analyze_cache(opt, len(verts), 16)
        # Same triangles, better locality.
        assert sorted(map(tuple, np.sort(opt, axis=1).tolist())) == sorted(
            map(tuple, np.sort(tris, axis=1).tolist())
        )
        assert acmr_after < acmr_before * 0.75

    def test_fetch_reorder_is_permutation(self, lib_ok):
        verts, tris = make_grid_mesh(8)
        new_idx, remap = native.optimize_vertex_fetch(tris, len(verts))
        assert sorted(remap.tolist()) == list(range(len(verts)))
        # remapped indices reference the same vertices
        np.testing.assert_array_equal(remap[tris], new_idx)


class TestCodecs:
    def test_position_roundtrip(self, lib_ok):
        pos = np.random.default_rng(1).uniform(-10, 30, (1000, 3)).astype(np.float32)
        q, sb = native.quantize_positions(pos)
        back = native.dequantize_positions(q, sb)
        # 14-bit over a 40-unit range → step ≈ 2.4e-3
        assert np.abs(back - pos).max() < 40.0 / 16383.0

    def test_normal_roundtrip(self, lib_ok):
        v = np.random.default_rng(2).normal(size=(1000, 3)).astype(np.float32)
        n = v / np.linalg.norm(v, axis=-1, keepdims=True)
        enc = native.encode_normals(n)
        back = native.decode_normals(enc)
        dots = np.sum(back * n, axis=-1)
        assert dots.min() > 0.99  # ~1° error at 8 bits/component


class TestSAH:
    def test_structure_and_quality(self, lib_ok):
        rng = np.random.default_rng(3)
        c = rng.uniform(-5, 5, (500, 3)).astype(np.float32)
        h = rng.uniform(0.01, 0.3, (500, 3)).astype(np.float32)
        bmin, bmax = c - h, c + h
        bvh = native.build_sah_bvh(bmin, bmax)
        assert bvh is not None
        bvh_mod.validate_bvh_host(bvh)

    def test_sah_traversal_matches_bruteforce(self, lib_ok):
        import jax

        from raytracer3_tpu.ops import intersect, traverse
        from tests.test_bvh import random_rays, random_tris

        v0, v1, v2 = random_tris(jax.random.PRNGKey(0), 200)
        bmin = np.minimum(np.minimum(v0, v1), v2)
        bmax = np.maximum(np.maximum(v0, v1), v2)
        bvh = native.build_sah_bvh(np.asarray(bmin), np.asarray(bmax))
        o, d = random_rays(jax.random.PRNGKey(1), 128)
        hb = intersect.intersect_bruteforce(o, d, v0, v1, v2)
        ht = traverse.bvh_intersect(bvh, v0, v1, v2, o, d)
        np.testing.assert_array_equal(np.asarray(hb.hit), np.asarray(ht.hit))
        m = np.asarray(hb.hit)
        np.testing.assert_allclose(np.asarray(hb.t)[m], np.asarray(ht.t)[m], rtol=1e-5)


class TestClusters:
    def test_partition_complete(self, lib_ok):
        rng = np.random.default_rng(4)
        c = rng.uniform(-5, 5, (777, 3)).astype(np.float32)
        bmin, bmax = c - 0.1, c + 0.1
        out = native.build_clusters(bmin, bmax, 8)
        assert out is not None
        cluster_of, cnt = out
        assert cluster_of.min() >= 0 and cluster_of.max() == cnt - 1
        sizes = np.bincount(cluster_of)
        assert sizes.max() <= 8


class TestSimplify:
    """Quadric edge-collapse simplification (meshopt.rs:559-700 role)."""

    def test_grid_halves_with_zero_planar_error(self, lib_ok):
        verts, tris = make_grid_mesh(16)
        out, err = native.simplify(verts, tris, target_ratio=0.5)
        assert len(out) <= len(tris) * 0.5 + 2
        assert err < 1e-4  # collapses on a plane are error-free
        # Valid mesh: in-range indices, no degenerates.
        assert out.min() >= 0 and out.max() < len(verts)
        assert (out[:, 0] != out[:, 1]).all()
        assert (out[:, 1] != out[:, 2]).all()
        assert (out[:, 0] != out[:, 2]).all()
        # Area-preserving on a planar patch.
        v0, v1, v2 = verts[out[:, 0]], verts[out[:, 1]], verts[out[:, 2]]
        area = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=-1).sum()
        assert area == pytest.approx(16.0 * 16.0, rel=1e-5)

    def test_border_vertices_locked(self, lib_ok):
        verts, tris = make_grid_mesh(8)
        out, _ = native.simplify(verts, tris, target_ratio=0.2)
        used = set(np.unique(out).tolist())
        n = 8
        for corner in (0, n, (n + 1) * n, (n + 1) * (n + 1) - 1):
            assert corner in used, f"border corner {corner} eroded"

    def test_max_error_budget_stops_early(self, lib_ok):
        # A cube-ish box mesh: collapsing across edges has real error, so a
        # tiny budget must refuse most collapses.
        verts, tris = make_grid_mesh(8)
        bumpy = verts.copy()
        # Doubly-curved sheet: every interior collapse has real error (a
        # single-axis wave leaves error-free collapses along the other axis).
        bumpy[:, 2] = np.sin(bumpy[:, 0]) * np.sin(bumpy[:, 1]) * 2.0
        out_tight, _ = native.simplify(bumpy, tris, 0.05, max_error=1e-8)
        out_loose, _ = native.simplify(bumpy, tris, 0.05, max_error=0.0)
        assert len(out_tight) > len(out_loose)
