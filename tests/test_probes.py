"""Probe-GI pipeline tests (SIS, probe tracing, SH conversion, interpolation
— the shaders/old/ pipeline, SURVEY.md §3.5)."""

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer3_tpu.ops import intersect, mathx, sh
from raytracer3_tpu.render import probes
from raytracer3_tpu.scene import analytic
from raytracer3_tpu.utils.config import RenderSettings

SET = RenderSettings(width=64, height=64, probe_spacing=16, probe_res=8, diffuse_only=True)


@pytest.fixture(scope="module")
def setup():
    scene = analytic.cornell_box()
    cam = analytic.default_camera()
    v0, v1, v2 = scene.tri_vertices()

    def isect(o, d):
        return intersect.intersect_bruteforce(o, d, v0, v1, v2)

    def occl(o, d, tmax):
        return intersect.occluded_bruteforce(o, d, v0, v1, v2, t_max=tmax)

    return scene, cam, isect, occl


class TestSIS:
    def test_budget_reallocation(self):
        # Normals all +z → directions facing +z get high pdf; culled rays
        # (low pdf) must be retargeted to fine-mip indices of top directions.
        n = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (64, 64, 1))
        di, mip = probes.structured_importance_sampling(n, SET)
        assert di.shape == (4, 4, 64)
        frac = float(jnp.mean(mip))
        assert 0.2 < frac < 0.45  # ~1/3 culled
        # Culled rays (mip=1) index the fine 16-grid: even coords.
        fine = np.asarray(di)[np.asarray(mip) == 1]
        assert ((fine % 2) == 0).all()
        # Retargeted dirs should favor +z: decode and check mean z.
        dirs = probes.octa_direction_grid(16).reshape(-1, 3)
        mean_z = float(jnp.mean(dirs[fine // 16 * 16 + fine % 16][:, 2]))
        assert mean_z > 0.2

    def test_uniform_when_mixed_normals(self):
        key = jax.random.PRNGKey(0)
        v = jax.random.normal(key, (64, 64, 3))
        n = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        di, mip = probes.structured_importance_sampling(n, SET)
        assert np.isfinite(np.asarray(di)).all()


class TestOctaGrid:
    def test_unit_directions(self):
        g = probes.octa_direction_grid(8)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(g), axis=-1), 1.0, atol=1e-5)

    def test_covers_sphere(self):
        g = np.asarray(probes.octa_direction_grid(8)).reshape(-1, 3)
        assert g[:, 2].max() > 0.8 and g[:, 2].min() < -0.8


class TestPipeline:
    def test_full_frame(self, setup):
        scene, cam, isect, occl = setup
        prev = probes.ProbeState.create(SET)
        light, state, aux = probes.probe_gi_frame(
            scene, isect, cam, prev, SET, frame_index=0, occluded_fn=occl
        )
        assert light.shape == (64, 64, 3)
        assert np.isfinite(np.asarray(light)).all()
        assert np.isfinite(np.asarray(state.atlas)).all()
        assert np.isfinite(np.asarray(state.sh_coeffs)).all()
        # Probes see the emissive panel → some indirect light lands somewhere.
        assert float(jnp.max(state.atlas)) > 0.0

    def test_temporal_blend_converges(self, setup):
        scene, cam, isect, occl = setup
        state = probes.ProbeState.create(SET)
        frame = jax.jit(
            lambda st, fi: probes.probe_gi_frame(
                scene, isect, cam, st, SET, frame_index=fi, blendfactor=0.5,
                occluded_fn=occl,
            )[:2]
        )
        atl_prev = None
        for i in range(4):
            light, state = frame(state, jnp.uint32(i))
            atl = np.asarray(state.atlas)
            if atl_prev is not None:
                delta = np.abs(atl - atl_prev).mean()
            atl_prev = atl
        assert np.isfinite(atl).all()

    def test_sh_projection_of_atlas(self):
        # Fill the atlas with a constant → SH reconstruction ≈ constant.
        state = probes.ProbeState.create(SET)
        # depth > 0 marks texels as written (probe_sh_fill treats depth 0 as
        # never-traced and fills from the probe mean — all-zero depth would
        # fill the whole synthetic atlas from an empty mean).
        state = state._replace(
            atlas=jnp.ones_like(state.atlas) * 2.0,
            depth=jnp.ones_like(state.depth),
        )
        state = probes.project_sh(state, SET)
        irr = sh.sh3_unproject(state.sh_coeffs[0, 0, 0], jnp.array([0.0, 0.0, 1.0]))
        # DC of constant 2: reconstruction ≈ 2 (octa grid is not perfectly
        # uniform → loose tolerance).
        assert 1.0 < float(irr) < 3.0

    def test_interpolation_failure_is_red(self):
        # All probes invalid (sky) but a pixel with valid depth → red.
        gd = jnp.full((64, 64), mathx.BACKGROUND_DEPTH)
        gd = gd.at[33, 33].set(5.0)  # valid pixel, but probe anchors are sky
        gn = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (64, 64, 1))
        alb = jnp.ones((64, 64, 3)) * 0.5
        em = jnp.zeros((64, 64, 3))
        state = probes.ProbeState.create(SET)
        state = state._replace(depth=jnp.full_like(state.depth, mathx.BACKGROUND_DEPTH))
        light = probes.interpolate_probes(gd, gn, alb, em, state, SET)
        np.testing.assert_allclose(np.asarray(light[33, 33]), [1.0, 0.0, 0.0])
        # Sky pixels black.
        np.testing.assert_allclose(np.asarray(light[0, 0]), [0.0, 0.0, 0.0])


class TestHybrid:
    def test_indirect_only_atlas_is_bounded_by_full(self, setup):
        """include_direct=False only removes terms (emissive at probe hits,
        env at misses), so with blendfactor 1 every atlas texel is <= the
        full trace's texel."""
        scene, cam, isect, occl = setup
        from raytracer3_tpu.render import camera as camera_mod

        prev = probes.ProbeState.create(SET)
        packed, _ = probes.trace_packed_gbuffer(scene, isect, cam, SET)
        from raytracer3_tpu.render import gbuffer as gbuffer_mod

        surface = gbuffer_mod.unpack_surface(packed)
        pix = camera_mod.pixel_grid(64, 64)
        o, d = camera_mod.primary_rays(cam, 64, 64, pixel_xy=pix)
        o2, d2 = o.reshape(64, 64, 3), d.reshape(64, 64, 3)
        di, mip = probes.structured_importance_sampling(surface.normal, SET)
        kw = dict(
            gbuf_depth=packed.depth, gbuf_normal=surface.normal,
            origins=o2, view_dirs=d2, dir_index=di, mip=mip, prev=prev,
            settings=SET, frame_index=0, blendfactor=1.0, occluded_fn=occl,
        )
        full = probes.trace_probes(scene, isect, **kw)
        ind = probes.trace_probes(scene, isect, include_direct=False, **kw)
        assert np.all(np.asarray(ind.atlas) <= np.asarray(full.atlas) + 1e-6)
        assert float(jnp.max(ind.atlas)) > 0.0  # bounced light exists

    def test_hybrid_frame_and_pipeline(self, setup):
        """Hybrid = direct + indirect partition: finite, non-negative, and
        lit regions carry direct light the probe-only image lacks."""
        scene, cam, isect, occl = setup
        from raytracer3_tpu.render import pipelines

        step, init_state = pipelines.hybrid_gi_pipeline(
            scene, SET, intersect_fn=isect, occluded_fn=occl
        )
        state = init_state()
        disp, state = step(state, cam=cam, frame_index=0)
        disp, state = step(state, cam=cam, frame_index=1)
        assert disp.shape == (64, 64, 3)
        assert np.isfinite(np.asarray(disp)).all()
        assert float(jnp.max(disp)) > 0.0

    def test_camera_cut_invalidation(self, setup):
        """frame_index 0 must blend with factor 1.0: polluted probe history
        may not leak into the frame-0 atlas."""
        scene, cam, isect, occl = setup
        from raytracer3_tpu.render import pipelines

        step, init_state = pipelines.probe_gi_pipeline(
            scene, SET, intersect_fn=isect, occluded_fn=occl
        )
        clean = init_state()
        # Fresh state per call: step donates its state pytree, so sharing
        # buffers between the two calls would pass deleted arrays.
        dirty = dict(init_state())
        dirty["probe_atlas"] = jnp.full_like(dirty["probe_atlas"], 123.0)
        _, s_clean = step(clean, cam=cam, frame_index=0)
        _, s_dirty = step(dirty, cam=cam, frame_index=0)
        np.testing.assert_allclose(
            np.asarray(s_clean["probe_atlas"]),
            np.asarray(s_dirty["probe_atlas"]), atol=1e-5,
        )


def test_probe_second_bounce_adds_energy(setup):
    """probe_bounces=2 traces one diffuse bounce at the probe hit; in a
    closed emissive box it can only ADD energy to the atlas (all second-
    bounce terms are non-negative), and must stay finite."""
    scene, cam, isect, occl = setup
    from raytracer3_tpu.render import camera as camera_mod

    prev = probes.ProbeState.create(SET)
    packed, _ = probes.trace_packed_gbuffer(scene, isect, cam, SET)
    from raytracer3_tpu.render import gbuffer as gbuffer_mod

    surface = gbuffer_mod.unpack_surface(packed)
    pix = camera_mod.pixel_grid(64, 64)
    o, d = camera_mod.primary_rays(cam, 64, 64, pixel_xy=pix)
    o2, d2 = o.reshape(64, 64, 3), d.reshape(64, 64, 3)
    di, mip = probes.structured_importance_sampling(surface.normal, SET)
    kw = dict(
        gbuf_depth=packed.depth, gbuf_normal=surface.normal,
        origins=o2, view_dirs=d2, dir_index=di, mip=mip, prev=prev,
        frame_index=0, blendfactor=1.0, occluded_fn=occl,
    )
    one = probes.trace_probes(scene, isect, settings=SET, **kw)
    two = probes.trace_probes(
        scene, isect, settings=dataclasses.replace(SET, probe_bounces=2), **kw
    )
    a1, a2 = np.asarray(one.atlas), np.asarray(two.atlas)
    assert np.isfinite(a2).all()
    assert np.all(a2 >= a1 - 1e-6)
    assert float(a2.sum()) > float(a1.sum())  # bounce light actually lands


def test_interpolate_cells_matches_generic():
    """The cell-structured fast path (exact-multiple frames) must match the
    generic gather path — same weights, clamps and blend — to float
    tolerance. Exercised with a non-trivial SH field, mixed normals, a sky
    probe (anchor at BACKGROUND) and an invalid-probe region."""
    rng = np.random.default_rng(5)
    h = w = 64
    sp = SET.probe_spacing
    px, py = SET.probe_grid
    gd = jnp.asarray(rng.uniform(1.0, 10.0, (h, w)).astype(np.float32))
    # A sky strip (anchors at BACKGROUND → invalid probes there).
    gd = gd.at[:8, :].set(mathx.BACKGROUND_DEPTH)
    n = rng.standard_normal((h, w, 3)).astype(np.float32)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-6)
    gn = jnp.asarray(n)
    alb = jnp.asarray(rng.uniform(0, 1, (h, w, 3)).astype(np.float32))
    em = jnp.asarray(rng.uniform(0, 0.2, (h, w, 3)).astype(np.float32))
    state = probes.ProbeState.create(SET)
    state = state._replace(
        sh_coeffs=jnp.asarray(
            rng.standard_normal((py, px, 3, 9)).astype(np.float32)
        )
    )
    light_fast = np.asarray(
        probes._interpolate_probes_cells(gd, gn, alb, em, state, SET)
    )
    # Inline generic reference (the pre-fast-path implementation, kept in
    # interpolate_probes for non-multiple frames).
    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    p0x = jnp.clip(xs // sp, 0, px - 1)
    p0y = jnp.clip(ys // sp, 0, py - 1)
    fx = (xs - p0x * sp).astype(jnp.float32) / sp
    fy = (ys - p0y * sp).astype(jnp.float32) / sp
    contribs, weights = [], []
    for oy in (0, 1):
        for ox in (0, 1):
            pxc = jnp.clip(p0x + ox, 0, px - 1)
            pyc = jnp.clip(p0y + oy, 0, py - 1)
            a_x = pxc * sp
            a_y = pyc * sp
            probe_depth = gd[a_y, a_x]
            probe_normal = gn[a_y, a_x]
            valid = probe_depth < mathx.BACKGROUND_DEPTH
            w_bil = (fx if ox else (1.0 - fx)) * (fy if oy else (1.0 - fy))
            wgt = jnp.clip(
                1.0 - jnp.abs(probe_depth - gd) / jnp.maximum(gd, 1e-6),
                0.0, 1.0,
            )
            wgt = wgt * jnp.maximum(jnp.sum(gn * probe_normal, -1), 0.0)
            wgt = jnp.where(valid, (w_bil + 1e-3) * wgt**8, 0.0)
            coeffs = state.sh_coeffs[pyc, pxc]
            irr = sh.sh3_unproject_cos_lobe(coeffs, gn)
            contribs.append(jnp.maximum(irr, 0.0))
            weights.append(wgt)
    wstack = jnp.stack(weights)
    wsum = jnp.sum(wstack, axis=0)
    failed = wsum <= 1e-8
    wnorm = wstack / jnp.maximum(wsum, 1e-8)
    irr = sum(c * wn[..., None] for c, wn in zip(contribs, wnorm))
    light = irr * alb * mathx.INV_PI + em
    red = jnp.zeros_like(light).at[..., 0].set(1.0)
    light = jnp.where(failed[..., None], red, light)
    sky = gd >= mathx.BACKGROUND_DEPTH
    ref = np.asarray(jnp.where(sky[..., None], 0.0, light))
    np.testing.assert_allclose(light_fast, ref, atol=1e-5, rtol=1e-5)


class TestTexelSplits:
    """probe_texel_splits (temporal probe-texel amortization)."""

    def _trace(self, setup, settings, prev, fi, bf=1.0, identity_dirs=False):
        scene, cam, isect, occl = setup
        from raytracer3_tpu.render import camera as camera_mod

        w, h = settings.width, settings.height
        packed, _ = probes.trace_packed_gbuffer(scene, isect, cam, settings)
        from raytracer3_tpu.render import gbuffer as gbuffer_mod

        surface = gbuffer_mod.unpack_surface(packed)
        pix = camera_mod.pixel_grid(w, h)
        o, d = camera_mod.primary_rays(cam, w, h, pixel_xy=pix)
        if identity_dirs:
            # No SIS retargeting: texel t traces direction t and writes at
            # atlas slot t — makes the texel↔atlas-location map exact
            # (culled rays otherwise write at their TARGET's base texel,
            # colliding across texel classes).
            pxg, pyg = settings.probe_grid
            rr = settings.probe_res**2
            dir_index = jnp.broadcast_to(
                jnp.arange(rr, dtype=jnp.int32), (pyg, pxg, rr)
            )
            mip = jnp.zeros((pyg, pxg, rr), jnp.int32)
        else:
            dir_index, mip = probes.structured_importance_sampling(
                surface.normal, settings
            )
        return probes.trace_probes(
            scene, isect, packed.depth, surface.normal,
            o.reshape(h, w, 3), d.reshape(h, w, 3), dir_index, mip,
            prev, settings, jnp.uint32(fi), bf, occl,
        )

    def test_split_frame_matches_full_on_its_texels(self, setup):
        """k=2 at frame fi must write EXACTLY the full trace's values on the
        texel class fi%2 (sampler ids are split-invariant) and keep prev on
        the other class."""
        prev = probes.ProbeState.create(SET)
        prev = prev._replace(atlas=jnp.full_like(prev.atlas, 7.0))
        full = self._trace(setup, SET, prev, fi=3, bf=0.5, identity_dirs=True)
        s2 = dataclasses.replace(SET, probe_texel_splits=2)
        half = self._trace(setup, s2, prev, fi=3, bf=0.5, identity_dirs=True)
        a_full = np.asarray(full.atlas)
        a_half = np.asarray(half.atlas)
        # Texel class 3%2=1 within each probe's 8x8 block: t = y*8+x odd.
        r = SET.probe_res
        ty, tx = np.meshgrid(np.arange(r), np.arange(r), indexing="ij")
        odd = ((ty * r + tx) % 2) == 1
        cls = np.tile(odd, (a_full.shape[0] // r, a_full.shape[1] // r))
        # Valid probes only (invalid are zeroed identically in both).
        valid = np.asarray(full.depth) != np.float32(mathx.BACKGROUND_DEPTH)
        same = np.asarray(half.depth) != np.float32(mathx.BACKGROUND_DEPTH)
        m = cls & valid & same
        np.testing.assert_array_equal(a_half[m], a_full[m])
        # Untraced class keeps prev (7.0) on valid probes.
        keep = (~cls) & valid & same
        if keep.any():
            np.testing.assert_array_equal(a_half[keep], 7.0)

    def test_split_covers_all_texels_over_k_frames(self, setup):
        """Over k consecutive frames every texel of a valid probe gets
        (re)written — no texel starves (identity dirs: SIS-culled slots are
        never written by design and keep history instead)."""
        s2 = dataclasses.replace(SET, probe_texel_splits=2)
        st = probes.ProbeState.create(s2)
        st = st._replace(depth=jnp.full_like(st.depth, -1.0))  # sentinel
        for fi in range(2):
            st = self._trace(setup, s2, st, fi=fi, bf=0.5, identity_dirs=True)
        # All texels of valid probes have a real traced depth (> 0) or the
        # probe is invalid (BACKGROUND); the -1 sentinel must be gone.
        d = np.asarray(st.depth)
        assert not (d == -1.0).any()

    def test_unwritten_texels_keep_history_and_reset_clears(self, setup):
        """The written-mask blend: SIS-culled slots keep prev on normal
        frames (the r2-r4 decay-to-zero energy leak is gone) and zero on a
        reset frame (bf=1) so stale history cannot persist a camera cut."""
        prev = probes.ProbeState.create(SET)
        prev = prev._replace(atlas=jnp.full_like(prev.atlas, 7.0))
        # Real SIS (1/3 of slots culled → unwritten).
        out = self._trace(setup, SET, prev, fi=2, bf=0.25)
        a = np.asarray(out.atlas)
        valid = np.asarray(out.depth) != np.float32(mathx.BACKGROUND_DEPTH)
        # Some valid-probe slots kept exactly 7.0 (culled, unwritten).
        assert (a[valid] == 7.0).any()
        # Reset frame: nothing keeps 7.0 anywhere.
        out0 = self._trace(setup, SET, prev, fi=0, bf=1.0)
        assert not (np.asarray(out0.atlas) == 7.0).any()


def test_bounce2_splits_unbiased(setup):
    """probe_bounce2_splits=k traces the second bounce for ~1/k of texels
    with k× weight — an unbiased estimator: averaged over frames, the
    second-bounce energy must match the every-frame version."""
    scene, cam, isect, occl = setup
    from raytracer3_tpu.render import camera as camera_mod
    from raytracer3_tpu.render import gbuffer as gbuffer_mod

    packed, _ = probes.trace_packed_gbuffer(scene, isect, cam, SET)
    surface = gbuffer_mod.unpack_surface(packed)
    pix = camera_mod.pixel_grid(64, 64)
    o, d = camera_mod.primary_rays(cam, 64, 64, pixel_xy=pix)
    o2, d2 = o.reshape(64, 64, 3), d.reshape(64, 64, 3)
    di, mip = probes.structured_importance_sampling(surface.normal, SET)

    def mean_atlas(settings, frames=10):
        zero = probes.ProbeState.create(settings)
        acc = 0.0
        fn = jax.jit(
            lambda fi: probes.trace_probes(
                scene, isect, packed.depth, surface.normal, o2, d2, di, mip,
                zero, settings, fi, 1.0, occl,
            ).atlas
        )
        for fi in range(frames):
            acc = acc + np.asarray(fn(jnp.uint32(fi)), np.float64)
        return acc / frames

    s1 = dataclasses.replace(SET, probe_bounces=1)
    s2 = dataclasses.replace(SET, probe_bounces=2)
    s2k = dataclasses.replace(SET, probe_bounces=2, probe_bounce2_splits=4)
    m1 = mean_atlas(s1).mean()
    m2 = mean_atlas(s2).mean()
    m2k = mean_atlas(s2k).mean()
    full = m2 - m1  # the second-bounce energy
    amort = m2k - m1
    assert full > 0.0
    # 10 frames × 16k texels at 1/4 selection → the mean is tight enough
    # for a 30% band around the unbiased target.
    assert abs(amort - full) < 0.3 * full, (m1, m2, m2k)
