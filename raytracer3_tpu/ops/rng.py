"""Counter-based random number generation and low-discrepancy sequences.

TPU-native counterpart of the reference's per-pixel RNG
(``shaders/include/random.slang``). The reference mutates a per-thread
``RandomSamplerState``; here the state is a pytree of arrays (one lane per
ray/pixel) and every draw is a pure function of (seed, counter) — a
counter-based RNG that vectorizes perfectly on the VPU and needs no
cross-lane state.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from raytracer3_tpu.ops import mathx

M_PLASTIC = 1.32471795724474602596

_U32 = jnp.uint32


def _u32(x) -> jax.Array:
    return jnp.asarray(x, dtype=_U32)


def jenkins_hash(a: jax.Array) -> jax.Array:
    """Bob Jenkins' 6-shift integer hash (random.slang:5-15)."""
    a = a.astype(_U32)
    a = (a + _u32(0x7ED55D16)) + (a << 12)
    a = (a ^ _u32(0xC761C23C)) ^ (a >> 19)
    a = (a + _u32(0x165667B1)) + (a << 5)
    a = (a + _u32(0xD3A2646C)) ^ (a << 9)
    a = (a + _u32(0xFD7046C5)) + (a << 3)
    a = (a ^ _u32(0xB55A4F09)) ^ (a >> 16)
    return a


def _rot32(x: jax.Array, y: int) -> jax.Array:
    return (x << y) | (x >> (32 - y))


def murmur3(seed: jax.Array, index: jax.Array) -> jax.Array:
    """One MurmurHash3 round + finalizer keyed on (seed, counter)
    (random.slang:52-81). Pure, counter-based."""
    seed = seed.astype(_U32)
    k = index.astype(_U32) * _u32(0xCC9E2D51)
    k = _rot32(k, 15)
    k = k * _u32(0x1B873593)
    h = seed ^ k
    h = _rot32(h, 13) * _u32(5) + _u32(0xE6546B64)
    h = h ^ _u32(4)
    h = h ^ (h >> 16)
    h = h * _u32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * _u32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def bits_to_unit_float(v: jax.Array) -> jax.Array:
    """Map uint32 bits → [0, 1) float via the mantissa trick
    (random.slang:83-90)."""
    mantissa = v.astype(_U32) & _u32((1 << 23) - 1)
    one_bits = _u32(0x3F800000)
    return jax.lax.bitcast_convert_type(mantissa | one_bits, jnp.float32) - 1.0


class Sampler(NamedTuple):
    """Per-lane RNG state: a seed array plus a (traced) scalar counter.

    Mirrors reference RandomSamplerState(pixelPos, frameIndex)
    (random.slang:37-49): seed = jenkins_hash(zcurve(pixel)) + frame.
    """

    seed: jax.Array  # uint32 [...]
    index: jax.Array  # uint32 scalar (or broadcastable)

    @staticmethod
    def from_pixels(pixel_xy: jax.Array, frame_index) -> "Sampler":
        z = mathx.zcurve_index(pixel_xy)
        seed = jenkins_hash(z) + _u32(frame_index)
        return Sampler(seed=seed, index=_u32(0))

    @staticmethod
    def from_ids(lane_ids: jax.Array, frame_index) -> "Sampler":
        seed = jenkins_hash(lane_ids.astype(_U32)) + _u32(frame_index)
        return Sampler(seed=seed, index=_u32(0))

    def next1(self) -> Tuple[jax.Array, "Sampler"]:
        u = bits_to_unit_float(murmur3(self.seed, jnp.broadcast_to(self.index, self.seed.shape)))
        return u, Sampler(self.seed, self.index + _u32(1))

    def next2(self) -> Tuple[jax.Array, "Sampler"]:
        u0, s = self.next1()
        u1, s = s.next1()
        return jnp.stack([u0, u1], axis=-1), s

    def next3(self) -> Tuple[jax.Array, "Sampler"]:
        u0, s = self.next1()
        u1, s = s.next1()
        u2, s = s.next1()
        return jnp.stack([u0, u1, u2], axis=-1), s


# ---------------------------------------------------------------------------
# Low-discrepancy sequences (random.slang:17-35)
# ---------------------------------------------------------------------------


def radical_inverse_vdc(bits: jax.Array) -> jax.Array:
    """Van der Corput radical inverse via bit reversal (random.slang:17-24)."""
    b = bits.astype(_U32)
    b = (b << 16) | (b >> 16)
    b = ((b & _u32(0x55555555)) << 1) | ((b & _u32(0xAAAAAAAA)) >> 1)
    b = ((b & _u32(0x33333333)) << 2) | ((b & _u32(0xCCCCCCCC)) >> 2)
    b = ((b & _u32(0x0F0F0F0F)) << 4) | ((b & _u32(0xF0F0F0F0)) >> 4)
    b = ((b & _u32(0x00FF00FF)) << 8) | ((b & _u32(0xFF00FF00)) >> 8)
    return b.astype(jnp.float32) * jnp.float32(2.3283064365386963e-10)


def hammersley(i: jax.Array, n) -> jax.Array:
    """Hammersley point set (random.slang:26-28)."""
    i = i.astype(_U32)
    x = (i + 1).astype(jnp.float32) / jnp.float32(n)
    y = radical_inverse_vdc(i + _u32(1))
    return jnp.stack([x, y], axis=-1)


def r2_sequence(i: jax.Array) -> jax.Array:
    """2D plastic-constant low-discrepancy sequence (random.slang:30-35)."""
    a = jnp.asarray([1.0 / M_PLASTIC, 1.0 / (M_PLASTIC * M_PLASTIC)], jnp.float32)
    v = a * i.astype(jnp.float32)[..., None] + 0.5
    return v - jnp.floor(v)


# ---------------------------------------------------------------------------
# Blue noise (replacement for the reference's resources/bluenoise.png asset):
# generated from scratch with the void-and-cluster method, cached on disk.
# ---------------------------------------------------------------------------


def generate_blue_noise(size: int = 64, sigma: float = 1.9, seed: int = 0):
    """Void-and-cluster blue-noise rank texture → float32 [size, size] in [0,1).

    Host-side (numpy) generation; run once and cached by scene/assets.py.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    n = size * size

    # Toroidal gaussian filter via FFT.
    ax = np.arange(size)
    d = np.minimum(ax, size - ax).astype(np.float64)
    dist2 = d[:, None] ** 2 + d[None, :] ** 2
    kernel = np.exp(-dist2 / (2.0 * sigma * sigma))
    kernel_ft = np.fft.rfft2(kernel)

    def energy(binary):
        return np.fft.irfft2(np.fft.rfft2(binary) * kernel_ft, s=(size, size))

    # Initial pattern: ~10% random ones, relaxed to a cluster-free state.
    ones = max(1, n // 10)
    binary = np.zeros((size, size))
    idx = rng.choice(n, ones, replace=False)
    binary.ravel()[idx] = 1.0
    for _ in range(4 * n):
        e = energy(binary)
        cluster = np.unravel_index(np.argmax(np.where(binary > 0, e, -np.inf)), e.shape)
        binary[cluster] = 0.0
        e = energy(binary)
        void = np.unravel_index(np.argmin(np.where(binary > 0, np.inf, e)), e.shape)
        if void == cluster:
            binary[cluster] = 1.0
            break
        binary[void] = 1.0

    rank = np.zeros((size, size), dtype=np.int64)
    # Phase 1: remove tightest clusters, rank down.
    work = binary.copy()
    for r in range(ones - 1, -1, -1):
        e = energy(work)
        cluster = np.unravel_index(np.argmax(np.where(work > 0, e, -np.inf)), e.shape)
        work[cluster] = 0.0
        rank[cluster] = r
    # Phase 2: fill largest voids, rank up.
    work = binary.copy()
    for r in range(ones, n):
        e = energy(work)
        void = np.unravel_index(np.argmin(np.where(work > 0, np.inf, e)), e.shape)
        work[void] = 1.0
        rank[void] = r

    return (rank.astype(np.float32) + 0.5) / float(n)


def animate_blue_noise(bn: jax.Array, frame_index) -> jax.Array:
    """Decorrelate a static blue-noise texture across frames by adding the
    golden-ratio sequence (standard Cranley-Patterson rotation)."""
    g = jnp.float32(0.6180339887498949)
    v = bn + g * jnp.asarray(frame_index, jnp.float32)
    return v - jnp.floor(v)
