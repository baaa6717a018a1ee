"""Treelet-binned traversal (ops/treelets.py): correctness vs brute force.

The segment-grid kernel runs in interpret mode on the CPU conftest platform;
the builder and driver paths (partition, candidate selection, segment layout,
sentinel handling, per-ray t_max) are exercised end-to-end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from raytracer3_tpu.ops import intersect, mathx, treelets

pytestmark = pytest.mark.slow  # interpret-mode Pallas kernels


def _soup(n, seed=0, spread=10.0, size=0.6):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    e1 = rng.normal(0, size, (n, 3)).astype(np.float32)
    e2 = rng.normal(0, size, (n, 3)).astype(np.float32)
    return c, c + e1, c + e2


def _rays(n, seed=1, spread=12.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.fixture(scope="module")
def soup_tt():
    v0, v1, v2 = _soup(900)
    tt = treelets.build_treelets_host(
        v0, v1, v2, leaf_size=4, width=8, max_tris=128
    )
    return (v0, v1, v2), tt


def test_partition_is_exact_cover():
    v0, v1, v2 = _soup(500, seed=3)
    cent = (v0 + v1 + v2) / 3.0
    parts = treelets._median_partition(cent, 64)
    allidx = np.sort(np.concatenate(parts))
    np.testing.assert_array_equal(allidx, np.arange(500))
    assert all(p.size <= 64 for p in parts)


def test_closest_hit_matches_bruteforce(soup_tt):
    (v0, v1, v2), tt = soup_tt
    assert tt.num_treelets > 1
    n = 8 * 128 * 3 + 17  # deliberately not a segment multiple
    o, d = _rays(n)
    hit = treelets.treelet_intersect(tt, o, d, interpret=True, sublanes=8)
    hb = intersect.intersect_bruteforce(
        o, d, jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2)
    )
    np.testing.assert_array_equal(np.asarray(hit.hit), np.asarray(hb.hit))
    m = np.asarray(hb.hit)
    np.testing.assert_allclose(
        np.asarray(hit.t)[m], np.asarray(hb.t)[m], rtol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(hit.prim_id)[m], np.asarray(hb.prim_id)[m]
    )


def test_any_hit_per_ray_tmax(soup_tt):
    (v0, v1, v2), tt = soup_tt
    n = 8 * 128 * 2
    o, d = _rays(n, seed=7)
    rng = np.random.default_rng(11)
    tmax = rng.uniform(1.0, 30.0, (n,)).astype(np.float32)
    occ = treelets.treelet_intersect(
        tt, o, d, t_max=jnp.asarray(tmax), any_hit=True,
        interpret=True, sublanes=8,
    )
    hb = intersect.intersect_bruteforce(
        o, d, jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2)
    )
    expected = np.asarray(hb.hit) & (np.asarray(hb.t) < tmax)
    np.testing.assert_array_equal(np.asarray(occ.hit), expected)


def test_step_cull_matches_bruteforce(soup_tt):
    # step_cull=True (scene-exit caps + per-step t-cull) is conservative:
    # identical hits/ids vs the oracle, closest-hit AND any-hit. Rays start
    # outside the scene AABB too (spread 12 > soup spread 10), so the
    # escape/miss cap clamp paths are exercised.
    (v0, v1, v2), tt = soup_tt
    n = 8 * 128 * 3 + 17
    o, d = _rays(n, seed=21)
    hit = treelets.treelet_intersect(
        tt, o, d, interpret=True, sublanes=8, step_cull=True, half_leaf=True
    )
    hb = intersect.intersect_bruteforce(
        o, d, jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2)
    )
    np.testing.assert_array_equal(np.asarray(hit.hit), np.asarray(hb.hit))
    m = np.asarray(hb.hit)
    np.testing.assert_allclose(
        np.asarray(hit.t)[m], np.asarray(hb.t)[m], rtol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(hit.prim_id)[m], np.asarray(hb.prim_id)[m]
    )
    rng = np.random.default_rng(23)
    tmax = rng.uniform(1.0, 30.0, (n,)).astype(np.float32)
    occ = treelets.treelet_intersect(
        tt, o, d, t_max=jnp.asarray(tmax), any_hit=True,
        interpret=True, sublanes=8, step_cull=True,
    )
    expected = np.asarray(hb.hit) & (np.asarray(hb.t) < tmax)
    np.testing.assert_array_equal(np.asarray(occ.hit), expected)


def test_zero_tmax_parks_lane(soup_tt):
    (v0, v1, v2), tt = soup_tt
    n = 8 * 128
    o, d = _rays(n, seed=13)
    cap = np.zeros((n,), np.float32)
    cap[: n // 2] = 1e5
    hit = treelets.treelet_intersect(
        tt, o, d, t_max=jnp.asarray(cap), interpret=True, sublanes=8
    )
    assert not np.asarray(hit.hit)[n // 2 :].any()
    hb = intersect.intersect_bruteforce(
        o, d, jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2)
    )
    np.testing.assert_array_equal(
        np.asarray(hit.hit)[: n // 2], np.asarray(hb.hit)[: n // 2]
    )


def test_capped_fn_mixed_population(soup_tt):
    # The fused shadow+bounce launch (ops/backend.py capped_fn): half the
    # lanes are "shadow" rays with finite caps, half are "bounce" rays with
    # cap BG — one capped closest-hit must serve both: Hit.hit == occluded
    # for the shadow half, full nearest hits for the bounce half.
    (v0, v1, v2), tt = soup_tt
    n = 8 * 128 * 2
    o, d = _rays(n, seed=21)
    rng = np.random.default_rng(23)
    cap = np.full((n,), mathx.BACKGROUND_DEPTH, np.float32)
    cap[: n // 2] = rng.uniform(1.0, 30.0, (n // 2,)).astype(np.float32)
    hb = intersect.intersect_bruteforce(
        o, d, jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2)
    )
    expected_sh = np.asarray(hb.hit)[: n // 2] & (
        np.asarray(hb.t)[: n // 2] < cap[: n // 2]
    )
    # With and without per-lane any-hit retirement flags on the shadow half
    # (kernel mixed_hit), and with per-step t-culling stacked on top (the
    # fused + step_cull production candidate): booleans identical, bounce
    # half stays exact.
    ah = np.zeros((n,), bool)
    ah[: n // 2] = True
    cases = [(None, False), (jnp.asarray(ah), False), (jnp.asarray(ah), True)]
    for mask, cull in cases:
        b = treelets.treelet_backend(
            host_tris=(v0, v1, v2), leaf_size=6, width=8, max_tris=2048,
            sublanes=8, interpret=True, step_cull=cull,
        )
        fused = b.bind_capped(b.arrays)
        hit = fused(o, d, jnp.asarray(cap), mask)
        np.testing.assert_array_equal(
            np.asarray(hit.hit)[: n // 2], expected_sh
        )
        m = np.asarray(hb.hit)[n // 2 :]
        np.testing.assert_array_equal(
            np.asarray(hit.hit)[n // 2 :], np.asarray(hb.hit)[n // 2 :]
        )
        np.testing.assert_array_equal(
            np.asarray(hit.prim_id)[n // 2 :][m],
            np.asarray(hb.prim_id)[n // 2 :][m],
        )
        mt = np.asarray(hit.hit)[n // 2 :]
        np.testing.assert_allclose(
            np.asarray(hit.t)[n // 2 :][mt],
            np.asarray(hb.t)[n // 2 :][mt],
            rtol=1e-4,
        )


def test_tables_hbm_matches_bruteforce(soup_tt):
    # tables_hbm: tables stay in HBM, each live step DMAs its treelet into
    # single-buffered VMEM scratch. Must be bit-compatible with the
    # BlockSpec path — alone and stacked with half_leaf + step_cull.
    (v0, v1, v2), tt = soup_tt
    n = 8 * 128 * 3 + 17
    o, d = _rays(n, seed=41)
    hb = intersect.intersect_bruteforce(
        o, d, jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2)
    )
    m = np.asarray(hb.hit)
    for kw in (
        dict(tables_hbm=True),
        dict(tables_hbm=True, half_leaf=True, step_cull=True),
    ):
        hit = treelets.treelet_intersect(
            tt, o, d, interpret=True, sublanes=8, **kw
        )
        np.testing.assert_array_equal(np.asarray(hit.hit), m)
        np.testing.assert_allclose(
            np.asarray(hit.t)[m], np.asarray(hb.t)[m], rtol=1e-4
        )
        np.testing.assert_array_equal(
            np.asarray(hit.prim_id)[m], np.asarray(hb.prim_id)[m]
        )
    rng = np.random.default_rng(43)
    tmax = rng.uniform(1.0, 30.0, (n,)).astype(np.float32)
    occ = treelets.treelet_intersect(
        tt, o, d, t_max=jnp.asarray(tmax), any_hit=True,
        interpret=True, sublanes=8, tables_hbm=True,
    )
    expected = m & (np.asarray(hb.t) < tmax)
    np.testing.assert_array_equal(np.asarray(occ.hit), expected)


def test_sublanes_1024_multiword_masks(soup_tt):
    # sublanes=1024 → 32 groups of 32 rows → 4 half-word subgroup masks
    # (the probe config tables_hbm unlocks). Exercises the multi-word
    # machinery beyond the 2-word 512 case.
    (v0, v1, v2), tt = soup_tt
    n = 1024 * 128
    o, d = _rays(n, seed=51)
    hit = treelets.treelet_intersect(
        tt, o, d, interpret=True, sublanes=1024, half_leaf=True,
        tables_hbm=True, step_cull=True,
    )
    hb = intersect.intersect_bruteforce(
        o, d, jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2)
    )
    np.testing.assert_array_equal(np.asarray(hit.hit), np.asarray(hb.hit))
    m = np.asarray(hb.hit)
    np.testing.assert_array_equal(
        np.asarray(hit.prim_id)[m], np.asarray(hb.prim_id)[m]
    )


def test_vmem_autofit_shrinks_and_stays_correct():
    # A config whose table blocks exceed the (tiny, test-sized) VMEM budget
    # must auto-shrink max_tris — more, smaller treelets — and still trace
    # exactly. Production budget default leaves ~3.5 MB headroom (treelets.
    # treelet_backend docstring).
    v0, v1, v2 = _soup(900)
    big = treelets.treelet_backend(
        host_tris=(v0, v1, v2), leaf_size=4, width=8, max_tris=1024,
        sublanes=8, interpret=True,
    )
    small = treelets.treelet_backend(
        host_tris=(v0, v1, v2), leaf_size=4, width=8, max_tris=1024,
        sublanes=8, interpret=True, vmem_budget=150_000.0,
    )
    assert (
        small.arrays["clusters"].shape[0] > big.arrays["clusters"].shape[0]
    ), "tiny budget must split into more treelets"
    n = 8 * 128
    o, d = _rays(n, seed=31)
    isect = small.bind(small.arrays)[0]
    hit = isect(o, d)
    hb = intersect.intersect_bruteforce(
        o, d, jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2)
    )
    np.testing.assert_array_equal(np.asarray(hit.hit), np.asarray(hb.hit))
    m = np.asarray(hb.hit)
    np.testing.assert_array_equal(
        np.asarray(hit.prim_id)[m], np.asarray(hb.prim_id)[m]
    )


def test_backend_and_single_treelet():
    v0, v1, v2 = _soup(60, seed=5, spread=2.0)
    b = treelets.treelet_backend(
        host_tris=(v0, v1, v2), leaf_size=4, width=8, max_tris=4096,
        sublanes=8, interpret=True,
    )
    assert b.meta.num_treelets == 1  # everything fits one treelet
    n = 8 * 128
    o, d = _rays(n, seed=2, spread=3.0)
    hit = b.intersect(o, d)
    hb = intersect.intersect_bruteforce(
        o, d, jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2)
    )
    np.testing.assert_array_equal(np.asarray(hit.hit), np.asarray(hb.hit))
    occ = b.occluded(o, d, jnp.full((n,), 50.0))
    assert np.asarray(occ).sum() == np.asarray(hb.hit).sum()


def test_layout_stats_shape():
    v0, v1, v2 = _soup(900)
    tt = treelets.build_treelets_host(
        v0, v1, v2, leaf_size=4, width=8, max_tris=128
    )
    o, d = _rays(8 * 128)
    st = treelets.treelet_layout_stats(tt, o, d, 1e5, sublanes=8)
    assert st["cand_max"] <= tt.num_treelets
    assert st["union_max"] <= tt.num_treelets
    assert st["steps"] >= st["segments"] * 0  # well-formed


def test_rank_push_matches_sort_network(soup_tt):
    """Vectorized rank-select child pushes must reproduce the Batcher
    network's traversal exactly (same far-first order, same hits) for both
    query types, and larger leaves must agree with the leaf-12 layout."""
    _, tt = soup_tt
    o, d = _rays(16 * 128)
    base = treelets.treelet_intersect(
        tt, o, d, interpret=True, sublanes=16, half_leaf=True
    )
    rp = treelets.treelet_intersect(
        tt, o, d, interpret=True, sublanes=16, half_leaf=True, rank_push=True
    )
    np.testing.assert_array_equal(
        np.asarray(base.prim_id), np.asarray(rp.prim_id)
    )
    np.testing.assert_allclose(np.asarray(base.t), np.asarray(rp.t), atol=1e-5)

    occ_b = treelets.treelet_intersect(
        tt, o, d, t_max=8.0, any_hit=True, interpret=True, sublanes=16
    )
    occ_r = treelets.treelet_intersect(
        tt, o, d, t_max=8.0, any_hit=True, interpret=True, sublanes=16,
        rank_push=True,
    )
    np.testing.assert_array_equal(np.asarray(occ_b.hit), np.asarray(occ_r.hit))


def test_leaf_sizes_agree(soup_tt):
    """Treelet tables are VMEM-resident blocks, so multi-lane-tile cluster
    rows (leaf_size > 12) are legal — unlike the per-leaf HBM-DMA mode.
    Traversal results must be layout-independent."""
    (v0, v1, v2), _ = soup_tt
    o, d = _rays(16 * 128)
    ref = None
    for ls in (4, 16):
        tt = treelets.build_treelets_host(
            v0, v1, v2, leaf_size=ls, width=8, max_tris=256
        )
        h = treelets.treelet_intersect(
            tt, o, d, interpret=True, sublanes=16, half_leaf=True
        )
        if ref is None:
            ref = h
        else:
            np.testing.assert_array_equal(
                np.asarray(ref.prim_id), np.asarray(h.prim_id)
            )
            np.testing.assert_allclose(
                np.asarray(ref.t), np.asarray(h.t), atol=1e-5
            )


def test_bit_loop_matches_cond_path(soup_tt):
    """bit_loop iterates only the set activation bits (dynamic-offset Möller
    slabs + while-carried push bits) — must be bit-identical to the per-group
    lax.cond path for closest-hit (with half_leaf + rank_push + step_cull),
    any-hit, and the 8-row BL64 grouping (max_groups=64)."""
    _, tt = soup_tt
    o, d = _rays(16 * 128)
    base = treelets.treelet_intersect(
        tt, o, d, interpret=True, sublanes=16, half_leaf=True,
        rank_push=True, step_cull=True,
    )
    bl = treelets.treelet_intersect(
        tt, o, d, interpret=True, sublanes=16, half_leaf=True,
        rank_push=True, step_cull=True, bit_loop=True,
    )
    np.testing.assert_array_equal(
        np.asarray(base.prim_id), np.asarray(bl.prim_id)
    )
    np.testing.assert_allclose(np.asarray(base.t), np.asarray(bl.t), atol=1e-5)

    # BL64: 8-row groups, two mask words, no half split (rows == GROUP_ROWS).
    bl64 = treelets.treelet_intersect(
        tt, o, d, interpret=True, sublanes=16, half_leaf=True,
        bit_loop=True, max_groups=64,
    )
    np.testing.assert_array_equal(
        np.asarray(base.prim_id), np.asarray(bl64.prim_id)
    )
    np.testing.assert_allclose(
        np.asarray(base.t), np.asarray(bl64.t), atol=1e-5
    )

    occ_b = treelets.treelet_intersect(
        tt, o, d, t_max=8.0, any_hit=True, interpret=True, sublanes=16
    )
    occ_l = treelets.treelet_intersect(
        tt, o, d, t_max=8.0, any_hit=True, interpret=True, sublanes=16,
        bit_loop=True,
    )
    np.testing.assert_array_equal(np.asarray(occ_b.hit), np.asarray(occ_l.hit))


def test_bit_loop_two_word_masks(soup_tt):
    """BL64 at production sublanes: 512 sublanes / 8-row groups → 64 groups
    → TWO mask words — exercises _bit_iter's cross-word bit selection."""
    _, tt = soup_tt
    o, d = _rays(512 * 128)
    base = treelets.treelet_intersect(
        tt, o, d, interpret=True, sublanes=512, half_leaf=True
    )
    bl64 = treelets.treelet_intersect(
        tt, o, d, interpret=True, sublanes=512, bit_loop=True, max_groups=64,
    )
    np.testing.assert_array_equal(
        np.asarray(base.prim_id), np.asarray(bl64.prim_id)
    )
    np.testing.assert_allclose(
        np.asarray(base.t), np.asarray(bl64.t), atol=1e-5
    )


def test_bw_leaf_matches_bruteforce():
    """Baldwin–Weber cluster rows (precomputed plane + projection constants)
    must reproduce bruteforce Möller hits. t/u/v come from a different
    formula, so values get a tolerance; ids must agree wherever the hit is
    not razor-edge ambiguous (fixed seed — deterministic)."""
    v0, v1, v2 = _soup(900)
    tt = treelets.build_treelets_host(
        v0, v1, v2, leaf_size=4, width=8, max_tris=128, bw_leaf=True
    )
    assert tt.bw_leaf and tt.num_treelets > 1
    o, d = _rays(8 * 128 * 2 + 11)
    hit = treelets.treelet_intersect(tt, o, d, interpret=True, sublanes=8)
    hb = intersect.intersect_bruteforce(
        o, d, jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2)
    )
    np.testing.assert_array_equal(np.asarray(hit.hit), np.asarray(hb.hit))
    m = np.asarray(hb.hit)
    np.testing.assert_allclose(
        np.asarray(hit.t)[m], np.asarray(hb.t)[m], rtol=2e-4, atol=1e-5
    )
    same = np.asarray(hit.prim_id)[m] == np.asarray(hb.prim_id)[m]
    assert same.mean() > 0.999, f"prim_id mismatch rate {1 - same.mean():.4f}"

    # any-hit occlusion booleans through the same rows
    occ = treelets.treelet_intersect(
        tt, o, d, t_max=8.0, any_hit=True, interpret=True, sublanes=8
    )
    ob = intersect.occluded_bruteforce(
        o, d, jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2), t_max=8.0
    )
    np.testing.assert_array_equal(np.asarray(occ.hit), np.asarray(ob))


def test_sah_cluster_mode_matches_bruteforce():
    """cluster_mode="sah" (binned-SAH split placement, native
    rt3_build_clusters_sah) produces underfull clusters with tighter AABBs
    — same hits as brute force. Proxy on the 300k atrium: total cluster SA
    4337 -> 2391 (1.81x) for ~the same cluster count."""
    v0, v1, v2 = _soup(900, seed=5)
    tt = treelets.build_treelets_host(
        v0, v1, v2, leaf_size=4, width=8, max_tris=128, cluster_mode="sah"
    )
    assert tt.num_treelets > 1
    o, d = _rays(8 * 128 * 2 + 11)
    hit = treelets.treelet_intersect(
        tt, o, d, interpret=True, sublanes=8, half_leaf=True, bit_loop=True
    )
    hb = intersect.intersect_bruteforce(
        o, d, jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2)
    )
    np.testing.assert_array_equal(
        np.asarray(hit.prim_id), np.asarray(hb.prim_id)
    )
    np.testing.assert_allclose(np.asarray(hit.t), np.asarray(hb.t), atol=1e-5)


def test_spatial_splits_match_bruteforce():
    """split_budget > 0 dices the largest triangles into clipped fragments
    (native rt3_split_fragments); clusters then carry duplicated originals
    with tighter boxes. Hits must be identical to brute force — closest-hit
    resolves duplicates through the min, any-hit through the OR."""
    v0, v1, v2 = _soup(900, seed=9)
    # Giant floor/wall triangles: the case spatial splits exist for.
    big = np.array(
        [
            [[-30, -12, -30], [30, -12, -30], [0, -12, 30]],
            [[-30, -12, -30], [-30, 12, -30], [-30, 0, 30]],
        ],
        np.float32,
    )
    v0 = np.concatenate([v0, big[:, 0]])
    v1 = np.concatenate([v1, big[:, 1]])
    v2 = np.concatenate([v2, big[:, 2]])
    tt = treelets.build_treelets_host(
        v0, v1, v2, leaf_size=4, width=8, max_tris=128,
        cluster_mode="sah", split_budget=0.5,
    )
    o, d = _rays(8 * 128 * 2 + 11)
    hit = treelets.treelet_intersect(
        tt, o, d, interpret=True, sublanes=8, half_leaf=True, bit_loop=True,
        step_cull=True,
    )
    hb = intersect.intersect_bruteforce(
        o, d, jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2)
    )
    np.testing.assert_array_equal(
        np.asarray(hit.prim_id), np.asarray(hb.prim_id)
    )
    np.testing.assert_allclose(np.asarray(hit.t), np.asarray(hb.t), atol=1e-5)
    occ = treelets.treelet_intersect(
        tt, o, d, t_max=8.0, any_hit=True, interpret=True, sublanes=8
    )
    ob = intersect.occluded_bruteforce(
        o, d, jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2), t_max=8.0
    )
    np.testing.assert_array_equal(np.asarray(occ.hit), np.asarray(ob))


def test_bit_loop_four_word_masks():
    """128 groups of 8 rows (sublanes=1024 under bit_loop) → FOUR mask
    words: exercises the generalized _bit_iter first-nonzero-word chain and
    the per-word push-bit accumulation (both were hardwired to ≤2 words
    until 2026-08-19). t gets a tolerance: one-in-100k fp association
    deltas vs brute force (~2e-4 relative) with identical prim ids."""
    v0, v1, v2 = _soup(3000, seed=7, spread=4.0, size=0.3)
    tt = treelets.build_treelets_host(
        v0, v1, v2, leaf_size=8, width=8, max_tris=1024, cluster_mode="sah"
    )
    o, d = _rays(1024 * 128, spread=5.0)
    hit = treelets.treelet_intersect(
        tt, o, d, interpret=True, sublanes=1024, half_leaf=True,
        bit_loop=True, max_groups=128,
    )
    hb = intersect.intersect_bruteforce(
        o, d, jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2)
    )
    np.testing.assert_array_equal(
        np.asarray(hit.prim_id), np.asarray(hb.prim_id)
    )
    np.testing.assert_allclose(
        np.asarray(hit.t), np.asarray(hb.t), rtol=2e-4, atol=1e-5
    )
    occ = treelets.treelet_intersect(
        tt, o, d, t_max=6.0, any_hit=True, interpret=True, sublanes=1024,
        bit_loop=True, max_groups=128,
    )
    ob = intersect.occluded_bruteforce(
        o, d, jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2), t_max=6.0
    )
    np.testing.assert_array_equal(np.asarray(occ.hit), np.asarray(ob))


def test_nearest_first_matches_bruteforce(soup_tt):
    """nearest_first (two-phase: nearest-treelet pure pass, then the
    remaining candidates with per-ray caps tightened to phase-1 best-t)
    must reproduce the oracle exactly: closest-hit with production flags,
    any-hit with per-ray shadow caps, and rays starting outside the AABB."""
    (v0, v1, v2), tt = soup_tt
    n = 8 * 128 * 3 + 17
    o, d = _rays(n, seed=33)
    hit = treelets.treelet_intersect(
        tt, o, d, interpret=True, sublanes=8, nearest_first=True,
        half_leaf=True, step_cull=True, bit_loop=True,
    )
    hb = intersect.intersect_bruteforce(
        o, d, jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2)
    )
    np.testing.assert_array_equal(np.asarray(hit.hit), np.asarray(hb.hit))
    m = np.asarray(hb.hit)
    np.testing.assert_allclose(
        np.asarray(hit.t)[m], np.asarray(hb.t)[m], rtol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(hit.prim_id)[m], np.asarray(hb.prim_id)[m]
    )

    rng = np.random.default_rng(35)
    tmax = rng.uniform(1.0, 30.0, (n,)).astype(np.float32)
    occ = treelets.treelet_intersect(
        tt, o, d, t_max=jnp.asarray(tmax), any_hit=True,
        interpret=True, sublanes=8, nearest_first=True, step_cull=True,
    )
    expected = np.asarray(hb.hit) & (np.asarray(hb.t) < tmax)
    np.testing.assert_array_equal(np.asarray(occ.hit), expected)


def test_seg_launch_chunking_bit_equal(soup_tt, monkeypatch):
    """SEG_LAUNCH_CHUNK splits one segment-grid launch into several
    pallas_calls over segment slices (the SMEM scalar-prefetch ceiling fix,
    sponza1080@32spp). Segments are independent grid rows, so the chunked
    launch must be BIT-equal to the single launch."""
    (v0, v1, v2), tt = soup_tt
    n = 8 * 128 * 6  # 6 segments at sublanes=8
    o, d = _rays(n, seed=7)
    ref = treelets.treelet_intersect(
        tt, o, d, interpret=True, sublanes=8, step_cull=True, half_leaf=True
    )
    monkeypatch.setattr(treelets, "SEG_LAUNCH_CHUNK", 2)  # 3 launches
    chunked = treelets.treelet_intersect(
        tt, o, d, interpret=True, sublanes=8, step_cull=True, half_leaf=True
    )
    np.testing.assert_array_equal(np.asarray(ref.t), np.asarray(chunked.t))
    np.testing.assert_array_equal(
        np.asarray(ref.prim_id), np.asarray(chunked.prim_id)
    )
    # Any-hit path too (per-ray caps).
    cap = jnp.full((n,), 20.0)
    occ_ref = treelets.treelet_intersect(
        tt, o, d, t_max=cap, any_hit=True, interpret=True, sublanes=8
    )
    monkeypatch.setattr(treelets, "SEG_LAUNCH_CHUNK", 3)
    occ_chunked = treelets.treelet_intersect(
        tt, o, d, t_max=cap, any_hit=True, interpret=True, sublanes=8
    )
    np.testing.assert_array_equal(
        np.asarray(occ_ref.hit), np.asarray(occ_chunked.hit)
    )


def test_seg_launch_chunking_ragged_tail(soup_tt, monkeypatch):
    """Segment counts that don't divide into equal chunks take fixed-size
    chunks with a ragged tail (5 segments at chunk 2 → sizes [2, 2, 1]) —
    the old exact-divisor search degenerated to one launch per segment on
    prime-ish counts. Must stay bit-equal to the single launch."""
    (v0, v1, v2), tt = soup_tt
    n = 8 * 128 * 5  # 5 segments at sublanes=8 (prime; 5 % ceil(5/2)=3 != 0)
    o, d = _rays(n, seed=11)
    ref = treelets.treelet_intersect(
        tt, o, d, interpret=True, sublanes=8, step_cull=True, half_leaf=True
    )
    monkeypatch.setattr(treelets, "SEG_LAUNCH_CHUNK", 2)
    chunked = treelets.treelet_intersect(
        tt, o, d, interpret=True, sublanes=8, step_cull=True, half_leaf=True
    )
    np.testing.assert_array_equal(np.asarray(ref.t), np.asarray(chunked.t))
    np.testing.assert_array_equal(
        np.asarray(ref.prim_id), np.asarray(chunked.prim_id)
    )


def test_seg_launch_chunking_stats(soup_tt, monkeypatch):
    """The stats path chunks too (per-segment [S, 8] counters concatenate
    along the segment axis) — a stats probe at >SEG_LAUNCH_CHUNK segments
    used to skip chunking and re-hit the SMEM compile failure."""
    (v0, v1, v2), tt = soup_tt
    n = 8 * 128 * 5
    o, d = _rays(n, seed=12)
    ref, st_ref = treelets.treelet_intersect(
        tt, o, d, interpret=True, sublanes=8, stats=True
    )
    monkeypatch.setattr(treelets, "SEG_LAUNCH_CHUNK", 2)
    chunked, st_chunked = treelets.treelet_intersect(
        tt, o, d, interpret=True, sublanes=8, stats=True
    )
    np.testing.assert_array_equal(np.asarray(ref.t), np.asarray(chunked.t))
    assert np.asarray(st_ref).shape == np.asarray(st_chunked).shape
    np.testing.assert_array_equal(np.asarray(st_ref), np.asarray(st_chunked))


def test_hit_only_unsort_matches_full(soup_tt):
    """hit_only=True (the occl_fn fast un-sort: one payload row through the
    variadic sort) must produce the same occlusion bits as the full-row
    path in the caller's original ray order."""
    (v0, v1, v2), tt = soup_tt
    n = 8 * 128 * 3 + 41  # not a segment multiple
    o, d = _rays(n, seed=21)
    rng = np.random.default_rng(22)
    cap = jnp.asarray(rng.uniform(0.5, 40.0, (n,)).astype(np.float32))
    full = treelets.treelet_intersect(
        tt, o, d, t_max=cap, any_hit=True, interpret=True, sublanes=8
    )
    fast = treelets.treelet_intersect(
        tt, o, d, t_max=cap, any_hit=True, interpret=True, sublanes=8,
        hit_only=True,
    )
    np.testing.assert_array_equal(np.asarray(full.hit), np.asarray(fast.hit))
    np.testing.assert_array_equal(
        np.asarray(full.prim_id >= 0), np.asarray(fast.prim_id >= 0)
    )
