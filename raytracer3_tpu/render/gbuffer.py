"""Packed G-buffer: 4×uint32 per pixel, exactly the reference's layout.

TPU-native counterpart of ``GbufferData.pack``/``GbufferDataPacked.unpack``
(shaders/include/gbuffer_helpers.slang:5-70):

  word0: albedo as color888 (sqrt-gamma, packing.slang:46-62)
  word1: normal as 11-10-11 unorm (packing.slang:12-43)
  word2: (perceptual roughness, metalness) as 2×f16 (packing.slang:89-98)
  word3: emissive as rgb9e5 shared-exponent HDR (packing.slang:100-166)

Passes that round-trip surface attributes through HBM (probe GI reads the
G-buffer three times) use the packed form: 16 B/pixel instead of 44 B/pixel —
the same bandwidth trade the reference makes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from raytracer3_tpu.ops import packing
from raytracer3_tpu.scene import types as scene_types


class PackedGBuffer(NamedTuple):
    data: jax.Array  # [..., 4] uint32
    depth: jax.Array  # [...] f32 (depth stays planar, like the reference)


def roughness_to_perceptual(r: jax.Array) -> jax.Array:
    """gbuffer_helpers.slang:72-74."""
    return jnp.sqrt(jnp.maximum(r, 0.0))


def perceptual_to_roughness(r: jax.Array) -> jax.Array:
    """gbuffer_helpers.slang:76-78."""
    return r * r


def pack_surface(surface: scene_types.SurfaceInfo, depth: jax.Array) -> PackedGBuffer:
    w0 = packing.pack_color_888(surface.albedo)
    w1 = packing.pack_normal_11_10_11(surface.normal)
    rm = jnp.stack(
        [roughness_to_perceptual(surface.roughness), surface.metalness], axis=-1
    )
    w2 = packing.pack_2xf16(rm)
    w3 = packing.pack_rgb9e5(surface.emissive)
    return PackedGBuffer(
        data=jnp.stack([w0, w1, w2, w3], axis=-1).astype(jnp.uint32),
        depth=depth,
    )


def unpack_surface(g: PackedGBuffer) -> scene_types.SurfaceInfo:
    d = g.data
    rm = packing.unpack_2xf16(d[..., 2])
    return scene_types.SurfaceInfo(
        albedo=packing.unpack_color_888(d[..., 0]),
        normal=packing.unpack_normal_11_10_11(d[..., 1]),
        roughness=perceptual_to_roughness(rm[..., 0]),
        metalness=rm[..., 1],
        emissive=packing.unpack_rgb9e5(d[..., 3]),
    )


def unpack_normal(g: PackedGBuffer) -> jax.Array:
    """Fast path used by SIS which only needs normals
    (structured_importance_sampling.slang:27 unpack_normal)."""
    return packing.unpack_normal_11_10_11(g.data[..., 1])
