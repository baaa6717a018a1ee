"""Spherical harmonics (L2, 9 coefficients) for the radiance-probe GI pipeline.

TPU-native counterpart of ``shaders/include/spherical_harmonics.slang``. The
reference stores an SH3 as a float3x3; here an SH is a flat [..., 9] array
(index = row*3+col of the reference layout), which maps directly onto VPU
lanes and lets probe batches project via one einsum on the MXU.

Coefficient order (matching spherical_harmonics.slang:30-46):
  0: Y(0, 0)   1: Y(1,-1)  2: Y(1,0)  3: Y(1,1)
  4: Y(2,-2)   5: Y(2,-1)  6: Y(2,0)  7: Y(2,1)  8: Y(2,2)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_C0 = 0.28209479177387814347403972578039
_C1 = 0.48860251190291992158638462283836
_C2 = 1.09254843059207907054338570580268
_C3 = 0.31539156525252000603089369029571
_C4 = 0.54627421529603953527169285290134

PI = 3.14159265358979323846

# Cosine-lobe zonal-harmonic convolution factors per band (A0, A1, A2)
# (spherical_harmonics.slang:72-89).
_COS_LOBE = jnp.asarray(
    [PI, 2.0943951023931954923, 2.0943951023931954923, 2.0943951023931954923,
     0.7853981633974483096, 0.7853981633974483096, 0.7853981633974483096,
     0.7853981633974483096, 0.7853981633974483096],
    dtype=jnp.float32,
)


def sh2_evaluate(d: jax.Array) -> jax.Array:
    """First-order SH basis [..., 4] (spherical_harmonics.slang:19-28)."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    one = jnp.ones_like(x)
    return jnp.stack([_C0 * one, -_C1 * y, _C1 * z, -_C1 * x], axis=-1)


def sh3_evaluate(d: jax.Array) -> jax.Array:
    """Second-order SH basis [..., 9] (spherical_harmonics.slang:30-46)."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    one = jnp.ones_like(x)
    return jnp.stack(
        [
            _C0 * one,
            -_C1 * y,
            _C1 * z,
            -_C1 * x,
            _C2 * x * y,
            _C2 * y * z,
            _C3 * (3.0 * z * z - 1.0),
            _C2 * x * z,
            _C4 * (x * x - y * y),
        ],
        axis=-1,
    )


def sh_dot(a: jax.Array, b: jax.Array) -> jax.Array:
    """SH inner product (spherical_harmonics.slang:56-61, 106-109)."""
    return jnp.sum(a * b, axis=-1)


def sh3_unproject(coeffs: jax.Array, d: jax.Array) -> jax.Array:
    """Evaluate a projected function in direction d
    (spherical_harmonics.slang:63-67)."""
    return sh_dot(coeffs, sh3_evaluate(d))


def sh3_transform_cos_lobe(normal: jax.Array) -> jax.Array:
    """SH basis at `normal` convolved with the clamped-cosine lobe
    (spherical_harmonics.slang:72-89)."""
    return sh3_evaluate(normal) * _COS_LOBE


def sh3_unproject_cos_lobe(coeffs_rgb: jax.Array, normal: jax.Array) -> jax.Array:
    """Cosine-convolved irradiance lookup (spherical_harmonics.slang:102-110).

    coeffs_rgb: [..., 3, 9] (RGB × 9 coefficients) → [..., 3] irradiance.
    """
    basis = sh3_transform_cos_lobe(normal)  # [..., 9]
    return jnp.einsum("...ck,...k->...c", coeffs_rgb, basis)


def sh3_project_batch(directions: jax.Array, values: jax.Array, n_samples: int | None = None) -> jax.Array:
    """Project sampled radiance onto SH3: the TPU equivalent of the
    wave-reduction in old/spherical_harmonic_conversion.slang:9-33.

    directions: [..., N, 3] unit sample directions
    values:     [..., N, C] radiance per direction (C channels)
    Returns [..., C, 9] coefficients, scaled by 4π/N (uniform-sphere MC).
    """
    n = directions.shape[-2] if n_samples is None else n_samples
    basis = sh3_evaluate(directions)  # [..., N, 9]
    coeffs = jnp.einsum("...nk,...nc->...ck", basis, values)
    return coeffs * (4.0 * PI / n)
