"""Mip-atlas textures (scene/textures.py): packing, sampling, LOD."""

import numpy as np

import jax.numpy as jnp

from raytracer3_tpu.scene import textures


def _checker(h, w, a=0.0, b=1.0):
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    c = ((xx + yy) % 2).astype(np.float32)
    img = np.where(c[:, :, None] > 0.5, b, a)
    return np.broadcast_to(img, (h, w, 3)).astype(np.float32)


def test_atlas_packing_meta():
    imgs = [_checker(64, 64), np.full((32, 16, 3), 0.25, np.float32)]
    atlas, meta = textures.build_texture_atlas(imgs)
    assert atlas.shape[1] == 64 + 16
    assert meta.shape == (2, 16)
    assert meta[0, 2] == 64 and meta[0, 3] == 64
    assert meta[1, 2] == 16 and meta[1, 3] == 32
    # mip 0 of texture 1 sits at x=64
    assert meta[1, 0] == 64
    # base level content preserved exactly
    np.testing.assert_array_equal(atlas[:64, :64], imgs[0])


def test_mip_chain_averages_to_mean():
    img = _checker(64, 64)
    mips = textures._mip_chain(img)
    assert mips[-1].shape[:2] == (1, 1)
    # checkerboard averages to 0.5 at every level ≥ 1
    np.testing.assert_allclose(mips[1], 0.5)
    np.testing.assert_allclose(mips[-1], 0.5)


def test_sample_level0_matches_texel():
    img = np.arange(16 * 16 * 3, dtype=np.float32).reshape(16, 16, 3) / 768.0
    atlas, meta = textures.build_texture_atlas([img], nearest=[True])
    n = 16 * 16
    yy, xx = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    uv = np.stack(
        [(xx.ravel() + 0.5) / 16.0, (yy.ravel() + 0.5) / 16.0], axis=-1
    ).astype(np.float32)
    out = textures.sample_atlas(
        jnp.asarray(atlas), jnp.asarray(meta),
        jnp.zeros(n, jnp.int32), jnp.asarray(uv),
        lod=jnp.zeros(n), trilinear=False,
    )
    # Taps are rgb9e5-packed (one u32 gather per tap — scene/textures.py
    # layout note): agreement is bounded by the shared-exponent 9-bit
    # mantissa — absolute error ≤ max_channel · 2^-10 per texel.
    ref = img.reshape(-1, 3)
    atol = ref.max(axis=1, keepdims=True) * 2.0 ** -9 + 1e-7
    assert (np.abs(np.asarray(out) - ref) <= atol).all()


def test_high_lod_converges_to_mean():
    img = _checker(64, 64)
    atlas, meta = textures.build_texture_atlas([img])
    n = 32
    rng = np.random.default_rng(0)
    uv = rng.uniform(0, 1, (n, 2)).astype(np.float32)
    out = textures.sample_atlas(
        jnp.asarray(atlas), jnp.asarray(meta),
        jnp.zeros(n, jnp.int32), jnp.asarray(uv),
        lod=jnp.full((n,), 10.0),
    )
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-3)


def test_negative_id_is_white():
    atlas, meta = textures.build_texture_atlas([_checker(8, 8)])
    out = textures.sample_atlas(
        jnp.asarray(atlas), jnp.asarray(meta),
        jnp.full((4,), -1, jnp.int32),
        jnp.full((4, 2), 0.3), lod=jnp.zeros(4),
    )
    np.testing.assert_array_equal(np.asarray(out), 1.0)


def test_ray_cone_lod_monotonic_in_distance():
    t = jnp.asarray([0.1, 1.0, 10.0, 100.0])
    lod = textures.ray_cone_lod(
        t, jnp.full((4,), 1.0), 1e-3, jnp.full((4,), 6.0)
    )
    a = np.asarray(lod)
    assert (np.diff(a) > 0).all()


def test_texel_density_scale_invariance():
    # A unit quad with a 64×64 texture mapped once → density 64 texels/unit.
    v0 = np.array([[0, 0, 0]], np.float32)
    v1 = np.array([[1, 0, 0]], np.float32)
    v2 = np.array([[0, 1, 0]], np.float32)
    uv0 = np.array([[0, 0]], np.float32)
    uv1 = np.array([[1, 0]], np.float32)
    uv2 = np.array([[0, 1]], np.float32)
    d = textures.texel_density_log2(v0, v1, v2, uv0, uv1, uv2, 64, 64)
    np.testing.assert_allclose(d, 6.0, atol=1e-5)


def test_hit_surface_info_mip_path():
    """Scene-level: checkerboard quad shaded through the atlas; distant /
    grazing footprints converge to the checker mean (anti-aliasing), near
    footprints stay binary (VERDICT round-2 item 6 done-bar)."""
    from raytracer3_tpu.scene import types as scene_types

    quad_pos = np.array(
        [[0, 0, 0], [10, 0, 0], [10, 0, 10], [0, 0, 10]], np.float32
    )
    quad_n = np.tile(np.array([[0, 1, 0]], np.float32), (4, 1))
    quad_uv = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], np.float32)
    idx = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    # 8-texel-period checker: bilinear leaves most near samples binary.
    checker = np.kron(
        _checker(8, 8)[:, :, 0], np.ones((8, 8), np.float32)
    )[:, :, None].repeat(3, axis=2)
    scene = scene_types.make_scene(
        positions=quad_pos, normals=quad_n, uvs=quad_uv,
        indices=idx, geo_id=np.zeros(2, np.int32),
        base_color=np.ones((1, 4), np.float32),
        emission=np.zeros((1, 3), np.float32),
        metallic=np.zeros(1, np.float32), roughness=np.ones(1, np.float32),
        base_color_texture=np.zeros(1, np.int32),
        tex_images=[checker],
    )
    assert scene.tex_atlas is not None and scene.textures is None
    n = 64
    prim = np.zeros(n, np.int32)
    rng = np.random.default_rng(0)
    uv = rng.uniform(0.05, 0.45, (n, 2)).astype(np.float32)
    near = scene_types.hit_surface_info(
        scene, jnp.asarray(prim), jnp.asarray(uv),
        footprint_log2=jnp.full((n,), -12.0),
    )
    far = scene_types.hit_surface_info(
        scene, jnp.asarray(prim), jnp.asarray(uv),
        footprint_log2=jnp.full((n,), 4.0),
    )
    a_near = np.asarray(near.albedo)[:, 0]
    a_far = np.asarray(far.albedo)[:, 0]
    # Near footprints see the raw checker (high contrast between samples);
    # far footprints read deep mips → flat checker mean (anti-aliased).
    assert a_near.std() > 0.2
    assert a_far.std() < 0.02
    np.testing.assert_allclose(a_far, 0.5, atol=0.05)
