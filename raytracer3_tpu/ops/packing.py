"""Bit-packing codecs for compact G-buffer / probe storage.

TPU-native counterpart of ``shaders/include/packing.slang``. All functions are
batched over leading axes; packed words are uint32 arrays. On TPU, keeping the
G-buffer as a few uint32 planes (instead of many f32 planes) halves HBM
traffic for the shading passes, exactly the trade the reference makes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_U32 = jnp.uint32


def _u32(x) -> jax.Array:
    return jnp.asarray(x, dtype=_U32)


def pack_unorm(val: jax.Array, bit_count: int) -> jax.Array:
    """Float [0,1] → unsigned normalized integer (packing.slang:7-10)."""
    max_val = (1 << bit_count) - 1
    return (jnp.clip(val, 0.0, 1.0) * max_val + 0.5).astype(_U32)


def unpack_unorm(pckd: jax.Array, bit_count: int) -> jax.Array:
    """Inverse of :func:`pack_unorm` (packing.slang:2-5)."""
    max_val = (1 << bit_count) - 1
    return (pckd.astype(_U32) & _u32(max_val)).astype(jnp.float32) / max_val


# ---------------------------------------------------------------------------
# Normals: 11-10-11 (packing.slang:12-43)
# ---------------------------------------------------------------------------


def pack_normal_11_10_11(n: jax.Array) -> jax.Array:
    p = pack_unorm(n[..., 0] * 0.5 + 0.5, 11)
    p = p + (pack_unorm(n[..., 1] * 0.5 + 0.5, 10) << 11)
    p = p + (pack_unorm(n[..., 2] * 0.5 + 0.5, 11) << 21)
    return p


def unpack_normal_11_10_11(p: jax.Array, do_normalize: bool = True) -> jax.Array:
    p = p.astype(_U32)
    n = (
        jnp.stack(
            [
                unpack_unorm(p, 11),
                unpack_unorm(p >> 11, 10),
                unpack_unorm(p >> 21, 11),
            ],
            axis=-1,
        )
        * 2.0
        - 1.0
    )
    if do_normalize:
        n = n * jax.lax.rsqrt(jnp.maximum(jnp.sum(n * n, -1, keepdims=True), 1e-20))
    return n


# ---------------------------------------------------------------------------
# Color 888 with sqrt "gamma" (packing.slang:46-62)
# ---------------------------------------------------------------------------


def pack_color_888(color: jax.Array) -> jax.Array:
    c = jnp.sqrt(jnp.maximum(color, 0.0))
    p = pack_unorm(c[..., 0], 8)
    p = p + (pack_unorm(c[..., 1], 8) << 8)
    p = p + (pack_unorm(c[..., 2], 8) << 16)
    return p


def unpack_color_888(p: jax.Array) -> jax.Array:
    p = p.astype(_U32)
    c = jnp.stack(
        [unpack_unorm(p, 8), unpack_unorm(p >> 8, 8), unpack_unorm(p >> 16, 8)],
        axis=-1,
    )
    return c * c


# ---------------------------------------------------------------------------
# Octahedral direction mapping (packing.slang:64-87)
# ---------------------------------------------------------------------------


def octa_encode(n: jax.Array) -> jax.Array:
    """Unit direction → octahedral UV in [0,1]^2 (packing.slang:68-75)."""
    denom = jnp.abs(n[..., 0]) + jnp.abs(n[..., 1]) + jnp.abs(n[..., 2])
    v = n / jnp.maximum(denom[..., None], 1e-20)
    xy = v[..., :2]
    sign_xy = jnp.where(xy >= 0.0, 1.0, -1.0)
    wrapped = (1.0 - jnp.abs(xy[..., ::-1])) * sign_xy
    xy = jnp.where(v[..., 2:3] < 0.0, wrapped, xy)
    return xy * 0.5 + 0.5


def octa_decode(f: jax.Array) -> jax.Array:
    """Octahedral UV in [0,1]^2 → unit direction (packing.slang:77-87)."""
    f = f * 2.0 - 1.0
    z = 1.0 - jnp.abs(f[..., 0]) - jnp.abs(f[..., 1])
    t = jnp.clip(-z, 0.0, 1.0)
    sign_xy = jnp.where(f >= 0.0, 1.0, -1.0)
    xy = f - sign_xy * t[..., None]
    n = jnp.concatenate([xy, z[..., None]], axis=-1)
    return n * jax.lax.rsqrt(jnp.maximum(jnp.sum(n * n, -1, keepdims=True), 1e-20))


# ---------------------------------------------------------------------------
# 2 × f16 in a u32 (packing.slang:89-98)
# ---------------------------------------------------------------------------


def pack_2xf16(f: jax.Array) -> jax.Array:
    h = f.astype(jnp.float16)
    bits = jax.lax.bitcast_convert_type(h, jnp.uint16).astype(_U32)
    return bits[..., 0] | (bits[..., 1] << 16)


def unpack_2xf16(u: jax.Array) -> jax.Array:
    u = u.astype(_U32)
    lo = (u & _u32(0xFFFF)).astype(jnp.uint16)
    hi = ((u >> 16) & _u32(0xFFFF)).astype(jnp.uint16)
    return jnp.stack(
        [
            jax.lax.bitcast_convert_type(lo, jnp.float16).astype(jnp.float32),
            jax.lax.bitcast_convert_type(hi, jnp.float16).astype(jnp.float32),
        ],
        axis=-1,
    )


# ---------------------------------------------------------------------------
# RGB9E5 shared-exponent HDR (packing.slang:100-166); spec:
# EXT_texture_shared_exponent.
# ---------------------------------------------------------------------------

_RGB9E5_EXP_BITS = 5
_RGB9E5_MANT_BITS = 9
_RGB9E5_EXP_BIAS = 15
_RGB9E5_MAX_EXP = 31 - _RGB9E5_EXP_BIAS
_RGB9E5_MANT_VALUES = 1 << _RGB9E5_MANT_BITS
_MAX_RGB9E5_MANT = _RGB9E5_MANT_VALUES - 1
MAX_RGB9E5 = float(_MAX_RGB9E5_MANT) / _RGB9E5_MANT_VALUES * (1 << _RGB9E5_MAX_EXP)


def _floor_log2(x: jax.Array) -> jax.Array:
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), _U32)
    return ((bits & _u32(0x7F800000)) >> 23).astype(jnp.int32) - 127


def pack_rgb9e5(rgb: jax.Array) -> jax.Array:
    c = jnp.clip(rgb, 0.0, MAX_RGB9E5)
    maxrgb = jnp.max(c, axis=-1)
    exp_shared = (
        jnp.maximum(-_RGB9E5_EXP_BIAS - 1, _floor_log2(maxrgb)) + 1 + _RGB9E5_EXP_BIAS
    )
    denom = jnp.exp2((exp_shared - _RGB9E5_EXP_BIAS - _RGB9E5_MANT_BITS).astype(jnp.float32))
    maxm = jnp.floor(maxrgb / denom + 0.5).astype(jnp.int32)
    bump = maxm == (_MAX_RGB9E5_MANT + 1)
    denom = jnp.where(bump, denom * 2.0, denom)
    exp_shared = jnp.where(bump, exp_shared + 1, exp_shared)
    m = jnp.floor(c / denom[..., None] + 0.5).astype(_U32)
    return (
        (m[..., 0] << (32 - 9))
        | (m[..., 1] << (32 - 18))
        | (m[..., 2] << (32 - 27))
        | exp_shared.astype(_U32)
    )


def unpack_rgb9e5(v: jax.Array) -> jax.Array:
    v = v.astype(_U32)
    exponent = (v & _u32(0x1F)).astype(jnp.int32) - _RGB9E5_EXP_BIAS - _RGB9E5_MANT_BITS
    scale = jnp.exp2(exponent.astype(jnp.float32))
    mask = _u32(_MAX_RGB9E5_MANT)
    return jnp.stack(
        [
            ((v >> (32 - 9)) & mask).astype(jnp.float32),
            ((v >> (32 - 18)) & mask).astype(jnp.float32),
            ((v >> (32 - 27)) & mask).astype(jnp.float32),
        ],
        axis=-1,
    ) * scale[..., None]


def prequant_shift_11_11_10(v: jax.Array) -> jax.Array:
    """Rounding shift before storing to an 11-11-10 float target
    (packing.slang:168-176)."""
    mant = jnp.asarray([6.0, 6.0, 5.0], dtype=v.dtype)
    exponent = jnp.ceil(jnp.log2(jnp.maximum(v, 1e-30)))
    return v + jnp.exp2(exponent - mant - 2.0)
