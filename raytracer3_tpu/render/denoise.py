"""Edge-aware à-trous wavelet denoiser for low-sample progressive frames.

The reference's progressive modes display raw Monte-Carlo noise until the
film converges (shaders/old/refrence_mode.slang accumulates, nothing
filters); interactively every camera move resets accumulation to 1 spp.
This pass filters the radiance film with the à-trous wavelet scheme
(Dammertz et al., "Edge-Avoiding À-Trous Wavelet Transform for Fast Global
Illumination Filtering"): a 5×5 B3-spline kernel applied with doubling tap
spacing, weighted by G-buffer edge-stopping functions so lighting blurs but
geometry stays sharp.

TPU shape: each tap is a static jnp.roll of the whole [H, W] image — 25
shifted multiply-adds per iteration, pure VPU, no gathers; everything fuses
under jit. Cost is bandwidth-bound and independent of scene complexity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raytracer3_tpu.ops import mathx

# B3-spline 1D weights; the 5x5 kernel is the outer product.
_B3 = (1.0 / 16.0, 1.0 / 4.0, 3.0 / 8.0, 1.0 / 4.0, 1.0 / 16.0)


def atrous_filter(
    color: jax.Array,  # [H, W, 3] raw radiance
    depth: jax.Array,  # [H, W] primary-hit t (BACKGROUND_DEPTH for sky)
    normal: jax.Array,  # [H, W, 3] primary-hit normals
    iterations: int = 3,
    sigma_color: float = 0.25,
    sigma_normal: float = 64.0,
    sigma_depth: float = 0.05,
) -> jax.Array:
    """Edge-aware smoothing of ``color``; sky pixels pass through untouched.

    sigma_normal is the exponent on the clamped normal dot (higher = harder
    normal edges); sigma_depth is relative to the center depth (scale-free).
    """
    sky = depth >= mathx.BACKGROUND_DEPTH
    out = color
    for it in range(iterations):
        step = 1 << it
        lum_c = jnp.sum(out * jnp.asarray([0.2126, 0.7152, 0.0722]), axis=-1)
        acc = jnp.zeros_like(out)
        wsum = jnp.zeros(out.shape[:2], out.dtype)
        for dy in range(-2, 3):
            for dx in range(-2, 3):
                h = _B3[dy + 2] * _B3[dx + 2]
                sc = jnp.roll(out, (dy * step, dx * step), axis=(0, 1))
                sd = jnp.roll(depth, (dy * step, dx * step), axis=(0, 1))
                sn = jnp.roll(normal, (dy * step, dx * step), axis=(0, 1))
                sl = jnp.roll(lum_c, (dy * step, dx * step), axis=(0, 1))
                w_n = jnp.maximum(jnp.sum(normal * sn, -1), 0.0) ** sigma_normal
                w_d = jnp.exp(
                    -jnp.abs(depth - sd)
                    / (sigma_depth * jnp.maximum(depth, 1e-3))
                )
                w_l = jnp.exp(-jnp.abs(lum_c - sl) / sigma_color)
                # Never pull sky radiance onto geometry (or vice versa).
                s_sky = jnp.roll(sky, (dy * step, dx * step), axis=(0, 1))
                w = h * w_n * w_d * w_l * (~s_sky) * (~sky)
                acc = acc + sc * w[..., None]
                wsum = wsum + w
        filtered = acc / jnp.maximum(wsum, 1e-8)[..., None]
        out = jnp.where((wsum > 1e-8)[..., None], filtered, out)
    return jnp.where(sky[..., None], color, out)


def denoise_strength(frame_count, full_until: float = 4.0, off_at: float = 64.0):
    """Blend weight for the filtered film: 1.0 while accumulation is shallow,
    fading to 0 as Monte-Carlo convergence overtakes the filter (noise decays
    as 1/sqrt(n), so the ramp is logarithmic-ish in feel, linear in cost)."""
    n = jnp.asarray(frame_count, jnp.float32)
    t = (n - full_until) / jnp.maximum(off_at - full_until, 1e-6)
    return jnp.clip(1.0 - t, 0.0, 1.0)
