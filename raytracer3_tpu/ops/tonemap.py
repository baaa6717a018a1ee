"""AgX tonemapping (input transform, log2 encoding, sigmoid approximation,
look, inverse transform).

TPU-native counterpart of the postprocess pass
(``shaders/old/postprocess.slang:10-88``). The matrices and sigmoid fit are
the standard published AgX constants (Troy Sobotka's AgX; the widely used
minimal approximation by Benjamin Wrensch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Row-major; applied as row-vector * matrix (the Slang mul(vec, mat)
# convention at postprocess.slang:37).
_AGX_MAT = jnp.asarray(
    [
        [0.842479062253094, 0.0423282422610123, 0.0423756549057051],
        [0.0784335999999992, 0.878468636469772, 0.0784336],
        [0.0792237451477643, 0.0791661274605434, 0.879142973793104],
    ],
    dtype=jnp.float32,
)

_AGX_MAT_INV = jnp.asarray(
    [
        [1.19687900512017, -0.0528968517574562, -0.0529716355144438],
        [-0.0980208811401368, 1.15190312990417, -0.0980434501171241],
        [-0.0990297440797205, -0.0989611768448433, 1.15107367264116],
    ],
    dtype=jnp.float32,
)

_MIN_EV = -12.47393
_MAX_EV = 4.026069


def agx_default_contrast_approx(x: jax.Array) -> jax.Array:
    """6th-order polynomial sigmoid fit (postprocess.slang:13-23)."""
    x2 = x * x
    x4 = x2 * x2
    return (
        15.5 * x4 * x2
        - 40.14 * x4 * x
        + 31.96 * x4
        - 6.868 * x2 * x
        + 0.4298 * x2
        + 0.1191 * x
        - 0.00232
    )


def agx(val: jax.Array) -> jax.Array:
    """AgX forward transform (postprocess.slang:25-47)."""
    val = jnp.einsum("...i,ij->...j", val, _AGX_MAT)
    val = jnp.clip(jnp.log2(jnp.maximum(val, 1e-10)), _MIN_EV, _MAX_EV)
    val = (val - _MIN_EV) / (_MAX_EV - _MIN_EV)
    return agx_default_contrast_approx(val)


def agx_eotf(val: jax.Array) -> jax.Array:
    """Undo the input transform (postprocess.slang:49-61)."""
    return jnp.einsum("...i,ij->...j", val, _AGX_MAT_INV)


def agx_look(val: jax.Array, look: str = "punchy") -> jax.Array:
    """ASC CDL grade (postprocess.slang:63-88). The reference compiles with
    AGX_LOOK == 2 ("punchy")."""
    lw = jnp.asarray([0.2126, 0.7152, 0.0722], dtype=val.dtype)
    luma = jnp.sum(val * lw, axis=-1, keepdims=True)
    if look == "golden":
        slope = jnp.asarray([1.0, 0.9, 0.5], val.dtype)
        power = jnp.asarray([0.8, 0.8, 0.8], val.dtype)
        sat = 0.8
    elif look == "punchy":
        slope = jnp.asarray([1.0, 1.0, 1.0], val.dtype)
        power = jnp.asarray([1.1, 1.1, 1.1], val.dtype)
        sat = 1.1
    else:  # default
        slope = jnp.ones(3, val.dtype)
        power = jnp.ones(3, val.dtype)
        sat = 1.0
    val = jnp.power(jnp.maximum(val * slope, 0.0), power)
    return luma + sat * (val - luma)


def agx_tonemap(color: jax.Array, look: str = "punchy") -> jax.Array:
    """Full AgX pipeline as applied per-pixel by the postprocess pass
    (postprocess.slang:107-109): agx → look → eotf."""
    return agx_eotf(agx_look(agx(color), look))
