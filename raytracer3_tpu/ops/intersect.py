"""Ray-primitive intersection: Möller–Trumbore triangles, spheres, AABBs.

TPU-native replacement for the reference's hardware ray-tracing layer
(``src/renderer/vulkan/raytracing.rs``; ``cmd_trace_rays`` at
pipeline_cache/mod.rs:64-73): rays are dense ``[N, 3]`` arrays, and
intersection is expressed as batched arithmetic that XLA maps onto the VPU.
Brute-force all-pairs testing (used for small scenes and as the ground truth
for BVH-traversal tests) is a ``[N_rays, N_tris]`` broadcast; production
scenes go through the BVH in ops/bvh.py + ops/traverse.py.

Hit records mirror the reference ``RayPayload`` (datatypes.slang:45-49):
(t, barycentric u/v, primitive id), with ``t = BACKGROUND_DEPTH`` on miss.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from raytracer3_tpu.ops import mathx

BACKGROUND_DEPTH = mathx.BACKGROUND_DEPTH
_EPS = 1e-7


class Hit(NamedTuple):
    """Batched hit record (the RayPayload analog, datatypes.slang:45-49)."""

    t: jax.Array  # [N] distance, BACKGROUND_DEPTH on miss
    uv: jax.Array  # [N, 2] barycentric (u, v)
    prim_id: jax.Array  # [N] triangle index, -1 on miss
    hit: jax.Array  # [N] bool
    # Instance id for two-level (TLAS/BLAS) backends, -1/None otherwise
    # (the instanceId the reference's RayPayload carries implicitly via
    # gl_InstanceID in default_hit.slang).
    inst: jax.Array | None = None

    @staticmethod
    def miss(shape) -> "Hit":
        return Hit(
            t=jnp.full(shape, BACKGROUND_DEPTH, jnp.float32),
            uv=jnp.zeros(shape + (2,), jnp.float32),
            prim_id=jnp.full(shape, -1, jnp.int32),
            hit=jnp.zeros(shape, bool),
        )


def ray_triangle(
    origin: jax.Array,
    direction: jax.Array,
    v0: jax.Array,
    v1: jax.Array,
    v2: jax.Array,
    t_min=1e-4,
    t_max=BACKGROUND_DEPTH,
):
    """Möller–Trumbore, broadcast over any matching leading shape.

    Returns (t, u, v, hit_mask); t = t_max where there is no hit.
    Watertight enough for path tracing; both-sided (no backface cull), like
    the reference's RT pipelines (no CULL flags set).
    """
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = jnp.cross(direction, e2)
    det = mathx.dot(e1, pvec, keepdims=False)
    inv_det = jnp.where(jnp.abs(det) > _EPS, 1.0 / det, 0.0)
    tvec = origin - v0
    u = mathx.dot(tvec, pvec, keepdims=False) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = mathx.dot(direction, qvec, keepdims=False) * inv_det
    t = mathx.dot(e2, qvec, keepdims=False) * inv_det
    hit = (
        (jnp.abs(det) > _EPS)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t < t_max)
    )
    return jnp.where(hit, t, t_max), u, v, hit


def ray_sphere(origin, direction, center, radius, t_min=1e-4, t_max=BACKGROUND_DEPTH):
    """Analytic sphere intersection (nearest positive root)."""
    oc = origin - center
    b = mathx.dot(oc, direction, keepdims=False)
    c = mathx.dot(oc, oc, keepdims=False) - radius * radius
    disc = b * b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = -b - sq
    t1 = -b + sq
    t = jnp.where(t0 > t_min, t0, t1)
    hit = (disc > 0.0) & (t > t_min) & (t < t_max)
    return jnp.where(hit, t, t_max), hit


def ray_aabb(origin, inv_direction, box_min, box_max, t_min=0.0, t_max=BACKGROUND_DEPTH):
    """Slab test. inv_direction = 1/d with inf for zero components.

    Returns (t_near, intersects). Used by BVH traversal."""
    t0 = (box_min - origin) * inv_direction
    t1 = (box_max - origin) * inv_direction
    tsmall = jnp.minimum(t0, t1)
    tbig = jnp.maximum(t0, t1)
    t_near = jnp.maximum(jnp.max(tsmall, axis=-1), t_min)
    t_far = jnp.minimum(jnp.min(tbig, axis=-1), t_max)
    return t_near, t_near <= t_far


def intersect_bruteforce(
    origins: jax.Array,
    directions: jax.Array,
    tri_v0: jax.Array,
    tri_v1: jax.Array,
    tri_v2: jax.Array,
    t_min=1e-4,
    t_max=BACKGROUND_DEPTH,
) -> Hit:
    """All-pairs closest hit: rays [N,3] × triangles [T,3] → Hit [N].

    O(N·T) but fully dense — on TPU this is a big broadcast+argmin that the
    VPU eats; ideal for analytic scenes (Cornell box) and as the oracle for
    BVH tests (SURVEY.md §7 step 5 validation).
    """
    o = origins[:, None, :]
    d = directions[:, None, :]
    t, u, v, hit = ray_triangle(o, d, tri_v0[None], tri_v1[None], tri_v2[None], t_min, t_max)
    best = jnp.argmin(t, axis=1)
    n = jnp.arange(origins.shape[0])
    best_t = t[n, best]
    any_hit = hit[n, best] & (best_t < t_max)
    return Hit(
        t=jnp.where(any_hit, best_t, BACKGROUND_DEPTH),
        uv=jnp.stack([u[n, best], v[n, best]], axis=-1),
        prim_id=jnp.where(any_hit, best, -1).astype(jnp.int32),
        hit=any_hit,
    )


def occluded_bruteforce(
    origins: jax.Array,
    directions: jax.Array,
    tri_v0: jax.Array,
    tri_v1: jax.Array,
    tri_v2: jax.Array,
    t_min=1e-4,
    t_max=BACKGROUND_DEPTH,
) -> jax.Array:
    """Any-hit shadow query: True where the segment [t_min, t_max] is blocked.

    t_max may be scalar or per-ray [N]."""
    o = origins[:, None, :]
    d = directions[:, None, :]
    t_max = jnp.asarray(t_max)
    if t_max.ndim == 1:
        t_max = t_max[:, None]
    _, _, _, hit = ray_triangle(o, d, tri_v0[None], tri_v1[None], tri_v2[None], t_min, t_max)
    return jnp.any(hit, axis=1)


def brute_backend(scene=None, host_tris=None, tris=None):
    """Brute-force TraceBackend (CPU/tests): vertex arrays travel as jit
    arguments (ops/backend.py). Pass ``tris=(v0, v1, v2)`` (device or host)
    or a scene."""
    from raytracer3_tpu.ops.backend import TraceBackend

    if tris is None:
        tris = host_tris if host_tris is not None else scene.tri_vertices()
    v0, v1, v2 = (jnp.asarray(t, jnp.float32) for t in tris)

    def isect_fn(arrays, o, d):
        return intersect_bruteforce(o, d, arrays["v0"], arrays["v1"], arrays["v2"])

    def occl_fn(arrays, o, d, tmax):
        return occluded_bruteforce(
            o, d, arrays["v0"], arrays["v1"], arrays["v2"], t_max=tmax
        )

    def capped_fn(arrays, o, d, tmax, anyhit=None):
        # Per-ray-capped closest hit (fused shadow+bounce launches,
        # ops/backend.py capped_fn contract). ``anyhit`` flags are a pure
        # optimization hint — irrelevant for the dense all-pairs oracle.
        tm = jnp.asarray(tmax, jnp.float32)
        if tm.ndim == 1:
            tm = tm[:, None]
        ov = o[:, None, :]
        dv = d[:, None, :]
        t, u, v, hit = ray_triangle(
            ov, dv, arrays["v0"][None], arrays["v1"][None], arrays["v2"][None],
            1e-4, tm,
        )
        best = jnp.argmin(t, axis=1)
        n = jnp.arange(o.shape[0])
        best_t = t[n, best]
        found = hit[n, best]
        return Hit(
            t=jnp.where(found, best_t, BACKGROUND_DEPTH),
            uv=jnp.stack([u[n, best], v[n, best]], axis=-1),
            prim_id=jnp.where(found, best, -1).astype(jnp.int32),
            hit=found,
        )

    return TraceBackend(
        {"v0": v0, "v1": v1, "v2": v2}, isect_fn, occl_fn, capped_fn=capped_fn
    )
