"""Oracle tests for the production Pallas packet-traversal kernel
(ops/pallas/traverse_kernel.py) in interpret mode: closest-hit, any-hit
early-out, per-ray masks, padded lanes, and multi-packet grids all checked
against brute-force intersection (the same oracle test_cluster_bvh uses)."""

import jax.numpy as jnp
import numpy as np
import pytest

from raytracer3_tpu.ops import cluster_bvh as cb_mod
from raytracer3_tpu.ops import intersect
from raytracer3_tpu.ops.pallas import traverse_kernel as tk
from raytracer3_tpu.render import camera as camera_mod
from raytracer3_tpu.scene import analytic

SUBLANES = 8  # 1024-ray packets keep interpret-mode runtime reasonable


@pytest.fixture(scope="module")
def cornell():
    scene = analytic.cornell_box()
    cam = analytic.default_camera()
    v0, v1, v2 = scene.tri_vertices()
    return cam, np.asarray(v0), np.asarray(v1), np.asarray(v2)


def _primary_rays(cam, n):
    """n primary rays (n need not be a packet multiple)."""
    side = int(np.ceil(np.sqrt(n)))
    pix = camera_mod.pixel_grid(side, side)[:n]
    o, d = camera_mod.primary_rays(
        cam, side, side, jitter=jnp.full((n, 2), 0.5), pixel_xy=pix
    )
    return o, d


def _tables(v0, v1, v2, leaf_size=4, width=8):
    cb = cb_mod.build_cluster_bvh(v0, v1, v2, leaf_size=leaf_size, width=width)
    return tk.pack_tables(cb)


def _check_against_bruteforce(pt, o, d, v0, v1, v2, **kw):
    hit = tk.packet_intersect(pt, o, d, interpret=True, sublanes=SUBLANES, **kw)
    ref = intersect.intersect_bruteforce(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2)
    )
    h = np.asarray(hit.hit)
    rh = np.asarray(ref.hit)
    n = h.shape[0]
    # Rays grazing a triangle edge may flip hit/miss between the two MT
    # formulations (precomputed edges vs raw vertices); everything else must
    # agree exactly.
    assert (h != rh).sum() <= max(2, n // 500), (
        f"{(h != rh).sum()} / {n} hit-mask mismatches"
    )
    m = h & rh
    np.testing.assert_allclose(
        np.asarray(hit.t)[m], np.asarray(ref.t)[m], rtol=1e-4, atol=1e-5
    )
    # Shared-edge / coplanar ties give equal t with different prim ids —
    # matching t above already proves the traversal found a true nearest hit.
    # Where ids DO agree, the barycentrics must too.
    same = m & (np.asarray(hit.prim_id) == np.asarray(ref.prim_id))
    assert same.sum() > 0.9 * m.sum()
    np.testing.assert_allclose(
        np.asarray(hit.uv)[same], np.asarray(ref.uv)[same], rtol=1e-3, atol=1e-4
    )


class TestClosestHit:
    def test_cornell_single_packet(self, cornell):
        cam, v0, v1, v2 = cornell
        pt = _tables(v0, v1, v2)
        o, d = _primary_rays(cam, SUBLANES * 128)
        _check_against_bruteforce(pt, o, d, v0, v1, v2)

    def test_padded_lanes_and_multi_packet_grid(self, cornell):
        # 1300 rays: grid of 2 packets with 748 padded lanes in the second.
        cam, v0, v1, v2 = cornell
        pt = _tables(v0, v1, v2)
        o, d = _primary_rays(cam, 1300)
        _check_against_bruteforce(pt, o, d, v0, v1, v2)

    def test_wide16_nodes(self, cornell):
        cam, v0, v1, v2 = cornell
        pt = _tables(v0, v1, v2, leaf_size=8, width=16)
        o, d = _primary_rays(cam, SUBLANES * 128)
        _check_against_bruteforce(pt, o, d, v0, v1, v2)

    def test_group_bits_single_group_matches(self, cornell):
        # Group-skipping must be exact: a wider packet (more groups, so the
        # group bitmask actually prunes slabs) agrees with a 1-row-group
        # packet on the same rays.
        cam, v0, v1, v2 = cornell
        pt = _tables(v0, v1, v2)
        o, d = _primary_rays(cam, 16 * 128)
        a = tk.packet_intersect(pt, o, d, interpret=True, sublanes=16)
        b = tk.packet_intersect(pt, o, d, interpret=True, sublanes=8)
        np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
        np.testing.assert_array_equal(np.asarray(a.prim_id), np.asarray(b.prim_id))
        np.testing.assert_allclose(np.asarray(a.t), np.asarray(b.t), rtol=1e-6)

    def test_secondary_rays_from_random_origins(self, cornell):
        # Incoherent rays (bounce-like): random origins inside the box,
        # random directions.
        _, v0, v1, v2 = cornell
        pt = _tables(v0, v1, v2)
        r = np.random.default_rng(7)
        n = SUBLANES * 128
        o = r.uniform(-0.8, 0.8, (n, 3)).astype(np.float32) + [0, 1, 0]
        d = r.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        _check_against_bruteforce(pt, jnp.asarray(o), jnp.asarray(d), v0, v1, v2)


class TestAnyHit:
    def test_occlusion_matches_bruteforce(self, cornell):
        cam, v0, v1, v2 = cornell
        pt = _tables(v0, v1, v2)
        o, d = _primary_rays(cam, SUBLANES * 128)
        t_ref = intersect.intersect_bruteforce(
            o, d, jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2)
        ).t
        # Cap just beyond/short of the closest hit: beyond → blocked,
        # short → clear.
        for scale, expect_hit in ((1.05, True), (0.95, False)):
            tmax = jnp.where(t_ref < 1e4, t_ref * scale, 1e-3)
            got = tk.packet_intersect(
                pt, o, d, t_max=tmax, any_hit=True,
                interpret=True, sublanes=SUBLANES,
            ).hit
            ref_mask = np.asarray(t_ref) < 1e4
            if expect_hit:
                assert np.asarray(got)[ref_mask].all()
            else:
                assert not np.asarray(got)[ref_mask].any()

    def test_parked_rays_never_hit(self, cornell):
        # Dead-ray parking (wavefront.py): origin 1e30 + zero t_cap must
        # terminate immediately with no hit.
        _, v0, v1, v2 = cornell
        pt = _tables(v0, v1, v2)
        n = SUBLANES * 128
        o = jnp.full((n, 3), 1e30)
        d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
        got = tk.packet_intersect(
            pt, o, d, interpret=True, sublanes=SUBLANES, any_hit=True
        )
        assert not np.asarray(got.hit).any()


class TestHalfLeaf:
    @pytest.mark.slow
    def test_half_leaf_matches_base_at_512_sublanes(self):
        # n_half = rows // 8 only exceeds 1 at >=512 sublanes (32 groups x
        # 16 rows); the subgroup leaf predication must be bit-identical to
        # the plain path — it may only SKIP Moller blocks whose 8-row
        # subgroup missed every pushed box, never change results.
        rng = np.random.default_rng(0)
        n_tri = 120
        c = rng.uniform(-3, 3, (n_tri, 3)).astype(np.float32)
        v0 = c
        v1 = c + rng.normal(0, 0.5, (n_tri, 3)).astype(np.float32)
        v2 = c + rng.normal(0, 0.5, (n_tri, 3)).astype(np.float32)
        pt = _tables(v0, v1, v2)
        n = 512 * 128
        o = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o, d = jnp.asarray(o), jnp.asarray(d)
        a = tk.packet_intersect(
            pt, o, d, interpret=True, sublanes=512, half_leaf=True
        )
        b = tk.packet_intersect(
            pt, o, d, interpret=True, sublanes=512, half_leaf=False
        )
        np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
        np.testing.assert_array_equal(
            np.asarray(a.prim_id), np.asarray(b.prim_id)
        )
        np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))

    def test_bit_loop_matches_cond_path_packet(self):
        # The packet backend runs half_leaf + bit_loop in production
        # (packet_backend isect/occl); the bit-iterated pops must be
        # bit-identical to the lax.cond path, closest-hit AND any-hit.
        rng = np.random.default_rng(1)
        n_tri = 96
        c = rng.uniform(-3, 3, (n_tri, 3)).astype(np.float32)
        v0 = c
        v1 = c + rng.normal(0, 0.5, (n_tri, 3)).astype(np.float32)
        v2 = c + rng.normal(0, 0.5, (n_tri, 3)).astype(np.float32)
        pt = _tables(v0, v1, v2)
        n = 16 * 128
        o = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o, d = jnp.asarray(o), jnp.asarray(d)
        a = tk.packet_intersect(
            pt, o, d, interpret=True, sublanes=16,
            half_leaf=True, bit_loop=True,
        )
        b = tk.packet_intersect(pt, o, d, interpret=True, sublanes=16)
        np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
        np.testing.assert_array_equal(
            np.asarray(a.prim_id), np.asarray(b.prim_id)
        )
        np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
        cap = jnp.full((n,), 1e4, jnp.float32)
        ah_a = tk.packet_intersect(
            pt, o, d, t_max=cap, any_hit=True, interpret=True, sublanes=16,
            half_leaf=True, bit_loop=True,
        ).hit
        ah_b = tk.packet_intersect(
            pt, o, d, t_max=cap, any_hit=True, interpret=True, sublanes=16
        ).hit
        np.testing.assert_array_equal(np.asarray(ah_a), np.asarray(ah_b))


class TestHbmClusters:
    def test_hbm_mode_matches_vmem(self, cornell):
        # Sponza-scale scenes keep the cluster table in HBM with per-leaf
        # DMA; results must be bit-identical to the VMEM path.
        cam, v0, v1, v2 = cornell
        pt = _tables(v0, v1, v2)
        o, d = _primary_rays(cam, SUBLANES * 128)
        a = tk.packet_intersect(pt, o, d, interpret=True, sublanes=SUBLANES)
        b = tk.packet_intersect(
            pt, o, d, interpret=True, sublanes=SUBLANES, clusters_hbm=True
        )
        np.testing.assert_array_equal(np.asarray(a.prim_id), np.asarray(b.prim_id))
        np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))

    def test_stats_counters(self, cornell):
        cam, v0, v1, v2 = cornell
        pt = _tables(v0, v1, v2)
        o, d = _primary_rays(cam, SUBLANES * 128)
        plain = tk.packet_intersect(pt, o, d, interpret=True, sublanes=SUBLANES)
        h, s = tk.packet_intersect(
            pt, o, d, interpret=True, sublanes=SUBLANES, stats=True
        )
        np.testing.assert_array_equal(np.asarray(h.prim_id), np.asarray(plain.prim_id))
        s = np.asarray(s)[:, :4]
        assert (s[:, 0] >= 1).all()  # visited at least the root
        assert (s[:, 1] >= 1).all()  # visited at least one leaf
        # group activations bounded by pops * n_groups
        n_groups = max(1, SUBLANES // tk.GROUP_ROWS)
        assert (s[:, 2] <= s[:, 0] * n_groups).all()
        assert (s[:, 3] <= s[:, 1] * n_groups).all()
