"""Golden-image regression tests — the resources/refrence.png workflow
(SURVEY.md §4): a stored reference render is compared against the current
renderer. The golden is the 16-frame average of the deterministic Cornell
reference-mode render at 64×64 (tests/golden/cornell_64_16f.npy, regenerate
with the snippet in its git history if the renderer changes intentionally).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from raytracer3_tpu.ops import intersect
from raytracer3_tpu.render import pathtracer, wavefront
from raytracer3_tpu.scene import analytic
from raytracer3_tpu.utils.config import RenderSettings

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "cornell_64_16f.npy")


def setup():
    scene = analytic.cornell_box()
    cam = analytic.default_camera()
    v0, v1, v2 = scene.tri_vertices()
    isect = lambda o, d: intersect.intersect_bruteforce(o, d, v0, v1, v2)  # noqa: E731
    occl = lambda o, d, t: intersect.occluded_bruteforce(o, d, v0, v1, v2, t_max=t)  # noqa: E731
    s = RenderSettings(width=64, height=64, bounces=3, samples=1, diffuse_only=True)
    return scene, cam, s, isect, occl


class TestGolden:
    def test_reference_mode_bitstable(self):
        # The exact 16-frame average must match the stored golden: any change
        # to RNG streams, BRDF math, NEE weights, or traversal is caught here.
        scene, cam, s, isect, occl = setup()
        frame = jax.jit(
            lambda fi: pathtracer.render_image(scene, cam, s, fi, isect, occl)
        )
        acc = np.zeros((64, 64, 3), np.float32)
        for i in range(16):
            acc += np.asarray(frame(jnp.uint32(i)))
        acc /= 16
        golden = np.load(GOLDEN)
        np.testing.assert_allclose(acc, golden, rtol=1e-5, atol=1e-5)

    def test_wavefront_statistically_matches_golden(self):
        # The wavefront tracer is a different estimator (RR etc.) but must
        # converge to the same image.
        scene, cam, s, isect, occl = setup()
        frame = jax.jit(
            lambda fi: wavefront.render_frame(scene, cam, s, fi, isect, occl)
        )
        acc = np.zeros((64, 64, 3), np.float32)
        n = 24
        for i in range(n):
            acc += np.asarray(frame(jnp.uint32(1000 + i)))
        acc /= n
        golden = np.load(GOLDEN)
        mask = (golden.max(-1) < 3.0) & (acc.max(-1) < 3.0)
        assert mask.sum() > 2000
        rel = abs(acc[mask].mean() - golden[mask].mean()) / golden[mask].mean()
        assert rel < 0.08


class TestGoldenBreadth:
    """Broader goldens (VERDICT r01 item 10): the production packet backend,
    the probe-GI display image, and a textured scene. Regenerate with
    tools/regen_goldens.py when the renderer changes intentionally."""

    def test_atrium_packet_backend_bitstable(self):
        from tools import regen_goldens

        img = regen_goldens.atrium_packet()
        golden = np.load(
            os.path.join(os.path.dirname(__file__), "golden", "atrium_packet_48_4f.npy")
        )
        np.testing.assert_allclose(img, golden, rtol=1e-5, atol=1e-5)

    def test_probe_display_bitstable(self):
        from tools import regen_goldens

        img = regen_goldens.probe_display()
        golden = np.load(
            os.path.join(os.path.dirname(__file__), "golden", "probe_display_64_4f.npy")
        )
        np.testing.assert_allclose(img, golden, rtol=1e-5, atol=1e-5)

    def test_textured_bitstable(self):
        from tools import regen_goldens

        img = regen_goldens.textured()
        golden = np.load(
            os.path.join(os.path.dirname(__file__), "golden", "textured_64_8f.npy")
        )
        np.testing.assert_allclose(img, golden, rtol=1e-5, atol=1e-5)

    def test_probe_display_128_bitstable(self):
        """Higher-res probe golden: the bilinear+edge-aware interpolation
        must stay clean at 128×128 (round-2 bleed regression guard)."""
        from tools import regen_goldens

        img = regen_goldens.probe_display(res=128, frames=8)
        golden = np.load(
            os.path.join(
                os.path.dirname(__file__), "golden",
                "probe_display_128_8f.npy",
            )
        )
        np.testing.assert_allclose(img, golden, rtol=1e-5, atol=1e-5)

    def test_textured_mip_bitstable(self):
        """Atlas + ray-cone LOD path (scene/textures.py): native-res checker
        floor must render bit-stably through the wavefront mip plumbing."""
        from tools import regen_goldens

        img = regen_goldens.textured_mip()
        golden = np.load(
            os.path.join(
                os.path.dirname(__file__), "golden", "textured_mip_64_8f.npy"
            )
        )
        np.testing.assert_allclose(img, golden, rtol=1e-5, atol=1e-5)
