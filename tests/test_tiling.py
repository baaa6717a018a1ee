"""Tile-swizzled primary ray ordering: permutation validity and image
equivalence with row-major ordering."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracer3_tpu.ops import intersect
from raytracer3_tpu.render import wavefront
from raytracer3_tpu.scene import analytic
from raytracer3_tpu.utils.config import RenderSettings


class TestTiledOrder:
    def test_is_permutation(self):
        pix = np.asarray(wavefront.tiled_pixel_order(256, 128))
        flat = pix[:, 1] * 256 + pix[:, 0]
        assert len(np.unique(flat)) == 256 * 128

    def test_first_packet_is_one_tile(self):
        pix = np.asarray(wavefront.tiled_pixel_order(256, 128))
        first = pix[: 128 * 64]
        assert first[:, 0].max() < 128 and first[:, 1].max() < 64

    def test_image_identical_to_untiled(self):
        scene = analytic.cornell_box()
        cam = analytic.default_camera()
        v0, v1, v2 = scene.tri_vertices()
        isect = lambda o, d: intersect.intersect_bruteforce(o, d, v0, v1, v2)  # noqa: E731
        s = RenderSettings(width=128, height=64, bounces=1, samples=1, diffuse_only=True)
        # bounces=1 with fixed frame: tiled and untiled must produce the same
        # pixels (same per-pixel RNG seeds, scatter restores order).
        a = np.asarray(
            wavefront.render_frame(scene, cam, s, 3, isect, None, tile_primaries=False)
        )
        b = np.asarray(
            wavefront.render_frame(scene, cam, s, 3, isect, None, tile_primaries=True)
        )
        np.testing.assert_allclose(a, b, atol=1e-5)


class TestTileFallbacks:
    def test_non_divisible_sizes_fall_back(self):
        from raytracer3_tpu.render import wavefront

        # Prime-ish dims: no tile divides → pick_tile None → raster order.
        assert wavefront.pick_tile(17, 13) is None
        # Mixed: width divides, height doesn't.
        assert wavefront.pick_tile(128, 13) is None
        assert wavefront.pick_tile(17, 64) is None

    def test_tile_order_covers_every_pixel_odd_aspect(self):
        import numpy as np

        from raytracer3_tpu.render import wavefront

        w, h = 192, 32  # extreme aspect; 64-wide tiles don't divide 192? 192/64=3 ok
        tile = wavefront.pick_tile(w, h)
        assert tile is not None
        pix = np.asarray(wavefront.tiled_pixel_order(w, h, *tile))
        flat = pix[:, 1] * w + pix[:, 0]
        assert np.array_equal(np.sort(flat), np.arange(w * h))
