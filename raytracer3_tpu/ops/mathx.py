"""Math and sampling primitives (batched, jit-friendly).

TPU-native counterpart of the reference shader math library
(``shaders/include/math.slang``). Everything here is written for arrays with
arbitrary leading batch dimensions; the last axis holds vector components.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

TAU = 6.283185307179586476925286766559
PI = 3.141592653589793238462643383279
INV_PI = 0.3183098861837906715377675267450
# Sentinel depth for "ray missed everything" (reference
# shaders/include/datatypes.slang:3 BACKGROUND_DEPTH).
BACKGROUND_DEPTH = 100000.0


def dot(a: jax.Array, b: jax.Array, keepdims: bool = True) -> jax.Array:
    """Batched dot product over the trailing axis."""
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def length(v: jax.Array, keepdims: bool = True) -> jax.Array:
    return jnp.sqrt(jnp.maximum(dot(v, v, keepdims=keepdims), 0.0))


def length_squared(v: jax.Array, keepdims: bool = True) -> jax.Array:
    return dot(v, v, keepdims=keepdims)


def normalize(v: jax.Array, eps: float = 1e-20) -> jax.Array:
    return v * jax.lax.rsqrt(jnp.maximum(dot(v, v), eps))


def cross(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.cross(a, b)


def gather_rows(table: jax.Array, idx: jax.Array) -> jax.Array:
    """Row gather ``table[idx]`` for [M, C] tables with SMALL C, built from
    C per-channel 1-D gathers — for SIGNED / non-color data only.

    The TPU gather layout trap (round-3 measurements): ``table[idx]`` /
    ``img[y, x]`` row gathers materialize [N, C] outputs in tiled T(8,128)
    layout, padding C lanes to 128 — 42.7× HBM at C=3 (7.97 GB for 16.7M
    lanes; OOM'ed the sponza1080 samples=8 bench). But gathers also price
    by CALL, not row width (~4.5 ms per gather at 2M lanes), so the C
    1-D gathers here cost C× the row gather's time (headline A/B:
    417 → 511 ms). For non-negative color data, prefer ONE u32 gather of
    an rgb9e5-packed table (ops/packing.py) — same call count as the row
    gather, zero padding; see render/pathtracer._sample_env. Use this
    helper only where packing can't represent the values."""
    return jnp.stack(
        [table[:, c][idx] for c in range(table.shape[1])], axis=-1
    )


def map_row_gather(table, idx, fn, extras=(), max_chunk: int = 1 << 21):
    """Consume ``table[idx]`` rows through ``fn`` in bounded chunks.

    The third face of the TPU gather layout trap (tools/probe_gather2.py,
    round 3): a 2-axis row gather ``table[idx]`` materializes its [N, C]
    output lane-padded to 128 — ~8.4 GB of HBM temp at 16.7M lanes
    REGARDLESS of C (C=3 u32 and C=16 f32 price identically), which is
    what OOM'ed sponza1080. Per-channel 1-D gathers avoid the padding but
    cost per CALL (4.4× slower). Gathers price by ROW COUNT, so chunking
    the same row gather through ``lax.map`` keeps the call pattern and
    total row count (≈ same speed) while capping the padded temp at
    ``max_chunk × 512 B``.

    ``fn(rows, *extra_chunks) -> pytree of [chunk]-leading arrays`` must
    consume the rows INSIDE the chunk (so the padded buffer dies before
    the next chunk). ``extras``: per-lane [N]-leading arrays chunked
    alongside ``idx``. N must divide evenly by the chosen chunk count;
    callers with ragged N should pad (wavefront lane counts are already
    multiples of the segment size). Falls back to a single direct call
    when N ≤ max_chunk."""
    n = idx.shape[0]
    if n <= max_chunk:
        return fn(table[idx], *extras)
    chunks = -(-n // max_chunk)
    while n % chunks:
        chunks += 1
    c = n // chunks

    # Everything crossing the lax.map boundary must be 2-D [chunks, c]:
    # a [chunks, c, 3] carry materializes T(8,128) with the 3-lane minor
    # padded to 128 — a 42.7× HBM expansion, ×4 under remat (measured
    # 31.9 G at 16.7M lanes). Split trailing dims into per-column 1-D
    # arrays around the map and re-stack inside/outside the chunk.
    def _split(a):
        if a.ndim == 1:
            return [a.reshape(chunks, c)]
        return [
            a[..., j].reshape(chunks, c) for j in range(a.shape[-1])
        ]

    ex_cols = [(_split(e), e.ndim) for e in extras]

    def body(args):
        i = args[0]
        rest = args[1:]
        ex = []
        pos = 0
        for cols, nd in ex_cols:
            k = len(cols)
            if nd == 1:
                ex.append(rest[pos])
            else:
                ex.append(jnp.stack(rest[pos:pos + k], axis=-1))
            pos += k
        out = fn(table[i], *ex)
        # Split ≥2-D outputs into 1-D columns for the same layout reason.
        leaves, treedef = jax.tree.flatten(out)
        flat = []
        meta = []
        for a in leaves:
            if a.ndim == 1:
                flat.append(a)
                meta.append(1)
            else:
                flat.extend(a[..., j] for j in range(a.shape[-1]))
                meta.append(a.shape[-1])
        body.meta = (treedef, meta)  # static across traces
        return tuple(flat)

    flat_in = (idx.reshape(chunks, c),) + tuple(
        col for cols, _ in ex_cols for col in cols
    )
    flat_out = jax.lax.map(body, flat_in)
    treedef, meta = body.meta
    leaves = []
    pos = 0
    for k in meta:
        if k == 1:
            leaves.append(flat_out[pos].reshape(n))
        else:
            leaves.append(
                jnp.stack(
                    [flat_out[pos + j].reshape(n) for j in range(k)],
                    axis=-1,
                )
            )
        pos += k
    return jax.tree.unflatten(treedef, leaves)


def saturate(x: jax.Array) -> jax.Array:
    return jnp.clip(x, 0.0, 1.0)


def lerp(a, b, t):
    return a + (b - a) * t


def inverse_lerp(minv, maxv, v):
    return (v - minv) / (maxv - minv)


def reflect(v: jax.Array, n: jax.Array) -> jax.Array:
    """HLSL-style reflect: v - 2*dot(v,n)*n (v points toward the surface)."""
    return v - 2.0 * dot(v, n) * n


def luminance(color: jax.Array) -> jax.Array:
    """BT.601 luma as used by the reference (math.slang:120-122)."""
    w = jnp.array([0.299, 0.587, 0.114], dtype=color.dtype)
    return jnp.sum(color * w, axis=-1)


def build_orthonormal_basis(n: jax.Array) -> jax.Array:
    """Branchless Duff et al. / Pixar ONB ("Building an Orthonormal Basis,
    Revisited", JCGT 2017). Returns M with shape [..., 3, 3] whose *columns*
    are (b1, b2, n): ``world = M @ local`` maps local +z onto n.

    Behavior-matches the two-branch version in the reference
    (shaders/include/math.slang:29-50).
    """
    x, y, z = n[..., 0], n[..., 1], n[..., 2]
    s = jnp.where(z >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + z)
    b = x * y * a
    b1 = jnp.stack([1.0 + s * x * x * a, s * b, -s * x], axis=-1)
    b2 = jnp.stack([b, s + y * y * a, -y], axis=-1)
    return jnp.stack([b1, b2, n], axis=-1)


def to_world(onb: jax.Array, v_local: jax.Array) -> jax.Array:
    """Transform a local-frame vector by an ONB from build_orthonormal_basis."""
    return jnp.einsum("...ij,...j->...i", onb, v_local)


def to_local(onb: jax.Array, v_world: jax.Array) -> jax.Array:
    """Inverse of :func:`to_world` (ONB is orthonormal → transpose)."""
    return jnp.einsum("...ji,...j->...i", onb, v_world)


# ---------------------------------------------------------------------------
# Direction sampling (math.slang:53-103)
# ---------------------------------------------------------------------------


def uniform_sample_cone(urand: jax.Array, cos_theta_max) -> jax.Array:
    """Uniform direction in a cone around +z (math.slang:53-58)."""
    u, v = urand[..., 0], urand[..., 1]
    cos_theta = (1.0 - u) + u * cos_theta_max
    sin_theta = jnp.sqrt(saturate(1.0 - cos_theta * cos_theta))
    phi = v * TAU
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def uniform_sample_hemisphere(urand: jax.Array) -> jax.Array:
    """Uniform direction on the +z hemisphere (math.slang:86-91)."""
    u, v = urand[..., 0], urand[..., 1]
    phi = v * TAU
    cos_theta = 1.0 - u
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    return jnp.stack(
        [jnp.cos(phi) * sin_theta, jnp.sin(phi) * sin_theta, cos_theta], axis=-1
    )


def uniform_sample_sphere(urand: jax.Array) -> jax.Array:
    """Uniform direction on the unit sphere (math.slang:93-99)."""
    u, v = urand[..., 0], urand[..., 1]
    z = 1.0 - 2.0 * u
    xy = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    sn, cs = jnp.sin(TAU * v), jnp.cos(TAU * v)
    return jnp.stack([cs * xy, sn * xy, z], axis=-1)


def cosine_sample_hemisphere(urand: jax.Array) -> jax.Array:
    """Cosine-weighted hemisphere direction around +z (the sampling used by
    the reference DiffuseBrdf, shaders/include/brdf.slang:57-63)."""
    u, v = urand[..., 0], urand[..., 1]
    phi = u * TAU
    cos_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - v))
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    return jnp.stack(
        [jnp.cos(phi) * sin_theta, jnp.sin(phi) * sin_theta, cos_theta], axis=-1
    )


# ---------------------------------------------------------------------------
# Equirect / compositing / squish (math.slang:6-12, 65-84)
# ---------------------------------------------------------------------------


def direction_to_equirect_uv(d: jax.Array) -> jax.Array:
    """Direction → equirectangular UV (math.slang:6-12). d must be normalized."""
    u = 0.5 + jnp.arctan2(d[..., 2], d[..., 0]) / TAU
    v = 0.5 - jnp.arcsin(jnp.clip(d[..., 1], -1.0, 1.0)) / PI
    return jnp.stack([u, v], axis=-1)


def equirect_uv_to_direction(uv: jax.Array) -> jax.Array:
    """Inverse of :func:`direction_to_equirect_uv`."""
    phi = (uv[..., 0] - 0.5) * TAU
    theta = (0.5 - uv[..., 1]) * PI  # = asin(y)
    cos_t = jnp.cos(theta)
    return jnp.stack(
        [cos_t * jnp.cos(phi), jnp.sin(theta), cos_t * jnp.sin(phi)], axis=-1
    )


def prelerp(b: jax.Array, c: jax.Array) -> jax.Array:
    """Alpha-compositing pre-combiner (math.slang:65-71): returns d such that
    lerp(a, d.rgb, d.a) == lerp(lerp(a, b.rgb, b.a), c.rgb, c.a)."""
    ba, ca = b[..., 3:4], c[..., 3:4]
    denom = ba + ca * (1.0 - ba)
    rgb = (b[..., :3] * (ba * (1.0 - ca)) + c[..., :3] * ca) / jnp.maximum(denom, 1e-30)
    alpha = 1.0 - (1.0 - ba) * (1.0 - ca)
    out = jnp.concatenate([rgb, alpha], axis=-1)
    return jnp.where(denom > 1e-5, out, 0.0)


def inverse_depth_relative_diff(primary_depth, secondary_depth):
    """Relative reciprocal-depth difference (math.slang:73-75)."""
    return jnp.abs(
        jnp.maximum(primary_depth, 1e-20) / jnp.maximum(secondary_depth, 1e-20) - 1.0
    )


def exponential_squish(length, squish_scale):
    """Encode a scalar into a space favoring small values (math.slang:78-80)."""
    return jnp.exp2(-jnp.clip(squish_scale * length, 0.0, 100.0))


def exponential_unsquish(length, squish_scale):
    """Inverse of :func:`exponential_squish` (math.slang:83-85)."""
    return jnp.maximum(0.0, -1.0 / squish_scale * jnp.log2(1e-30 + length))


# ---------------------------------------------------------------------------
# Morton / Z-curve (math.slang:105-117) — also used by the LBVH builder.
# ---------------------------------------------------------------------------


def integer_explode(x: jax.Array) -> jax.Array:
    """Spread the low 16 bits of x to even bit positions (math.slang:105-112)."""
    x = x.astype(jnp.uint32)
    x = (x | (x << 8)) & jnp.uint32(0x00FF00FF)
    x = (x | (x << 4)) & jnp.uint32(0x0F0F0F0F)
    x = (x | (x << 2)) & jnp.uint32(0x33333333)
    x = (x | (x << 1)) & jnp.uint32(0x55555555)
    return x


def zcurve_index(xy: jax.Array) -> jax.Array:
    """2D Morton code from integer pixel coords [..., 2] (math.slang:114-117)."""
    x = integer_explode(xy[..., 0].astype(jnp.uint32))
    y = integer_explode(xy[..., 1].astype(jnp.uint32))
    return x | (y << 1)


def integer_explode3(x: jax.Array) -> jax.Array:
    """Spread the low 10 bits of x to every 3rd bit (for 30-bit 3D Morton)."""
    x = x.astype(jnp.uint32) & jnp.uint32(0x3FF)
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def morton3d(p: jax.Array) -> jax.Array:
    """30-bit 3D Morton code from normalized [0,1)^3 points [..., 3].

    Device-side building block for the LBVH builder (the TPU replacement of
    the reference's hardware acceleration-structure build,
    src/renderer/vulkan/raytracing.rs:88-148)."""
    q = jnp.clip(p * 1024.0, 0.0, 1023.0).astype(jnp.uint32)
    return (
        (integer_explode3(q[..., 0]) << 2)
        | (integer_explode3(q[..., 1]) << 1)
        | integer_explode3(q[..., 2])
    )
