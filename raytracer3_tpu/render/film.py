"""Film: progressive accumulation of radiance across frames.

TPU-native counterpart of the reference's PrevLight/Light temporal blend
(``shaders/old/refrence_mode.slang:61-65``): blendfactor >= 1 replaces, else
``lerp(prev, radiance, blendfactor)``. The film buffer is donated between
frames (the double-buffer analog of the reference's two images)."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Film(NamedTuple):
    accum: jax.Array  # [H, W, 3] running radiance estimate
    frame_index: jax.Array  # [] int32 frames accumulated since reset

    @staticmethod
    def create(height: int, width: int) -> "Film":
        return Film(
            accum=jnp.zeros((height, width, 3), jnp.float32),
            frame_index=jnp.zeros((), jnp.int32),
        )


def blend(film: Film, radiance: jax.Array, blendfactor: jax.Array) -> Film:
    """refrence_mode.slang:61-65: replace when blendfactor>=1, else lerp."""
    out = jnp.where(
        blendfactor >= 1.0,
        radiance,
        film.accum + (radiance - film.accum) * blendfactor,
    )
    return Film(accum=out, frame_index=film.frame_index + 1)


def progressive_blendfactor(frame_index: jax.Array) -> jax.Array:
    """Equal-weight progressive average: 1/(n+1) — frame 0 replaces."""
    return 1.0 / (frame_index.astype(jnp.float32) + 1.0)


def accumulate_progressive(film: Film, radiance: jax.Array) -> Film:
    """Progressive mode: each frame contributes equally (unbiased mean)."""
    return blend(film, radiance, progressive_blendfactor(film.frame_index))


def reset(film: Film) -> Film:
    """Camera moved → restart the integral (the interactive-mode reset,
    BASELINE.json config 5)."""
    return Film(accum=jnp.zeros_like(film.accum), frame_index=jnp.zeros((), jnp.int32))
