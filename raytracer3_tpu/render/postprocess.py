"""Postprocess pass: environment fill for background pixels + AgX tonemap.

TPU-native counterpart of ``shaders/old/postprocess.slang:90-112``."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raytracer3_tpu.ops import mathx, tonemap
from raytracer3_tpu.scene import types as scene_types


def postprocess(
    light: jax.Array,
    depth: jax.Array | None = None,
    view_dirs: jax.Array | None = None,
    env_map: jax.Array | None = None,
    look: str = "punchy",
) -> jax.Array:
    """light [H,W,3] (+ optional depth/env background fill) → display RGB.

    Where depth == BACKGROUND_DEPTH the color is the equirect skybox sample
    (postprocess.slang:99-105); everything is then AgX-tonemapped
    (postprocess.slang:107-109)."""
    color = light
    if depth is not None and view_dirs is not None and env_map is not None:
        uv = mathx.direction_to_equirect_uv(view_dirs)
        he, we = env_map.shape[0], env_map.shape[1]
        x = jnp.clip((uv[..., 0] * we).astype(jnp.int32), 0, we - 1)
        y = jnp.clip((uv[..., 1] * he).astype(jnp.int32), 0, he - 1)
        sky = env_map[y, x]
        bg = (depth >= mathx.BACKGROUND_DEPTH)[..., None]
        color = jnp.where(bg, sky, color)
    return tonemap.agx_tonemap(color, look=look)
