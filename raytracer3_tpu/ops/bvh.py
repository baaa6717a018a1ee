"""Device-side LBVH build: Morton codes → radix sort → Karras hierarchy →
bottom-up AABB fit. Pure JAX (sort + gathers), fully jit-compatible.

This is the TPU replacement for the reference's hardware acceleration
structure build (``src/renderer/vulkan/raytracing.rs:88-148``
``create_acceleration_structure`` + TLAS ownership in world/mod.rs:137-154):
TPUs have no RT cores, so the BVH is plain arrays and traversal is software
(ops/traverse.py, ops/pallas/traverse_kernel.py).

Layout (SoA, static shapes; T triangles → T-1 internal nodes, T leaves):
  node_min/node_max: [2T-1, 3] AABBs, internal nodes first ([0, T-1)),
                     leaves at [T-1, 2T-1).
  node_left/node_right: [T-1] child pointers into the full node index space.
  leaf_tri: [T] triangle index per leaf (morton order).

Construction uses the Karras 2012 parallel topology (common-prefix ranges),
with the index-XOR tiebreak so duplicate Morton codes still give a valid
binary tree of bounded depth.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from raytracer3_tpu.ops import mathx


class BVH(NamedTuple):
    node_min: jax.Array  # [2T-1, 3]
    node_max: jax.Array  # [2T-1, 3]
    node_left: jax.Array  # [T-1] int32
    node_right: jax.Array  # [T-1] int32
    leaf_tri: jax.Array  # [T] int32 triangle id per leaf

    @property
    def num_tris(self) -> int:
        return self.leaf_tri.shape[0]

    @property
    def num_internal(self) -> int:
        return self.num_tris - 1

    @property
    def root(self) -> int:
        return 0


def _make_delta(codes_sorted: jax.Array):
    """Common-prefix length δ(i, j) over the conceptual 64-bit keys
    (morton_code << 32 | sorted_index) — Karras's duplicate-code tiebreak —
    computed from two uint32 halves (no x64 needed). Returns -1 when j is out
    of range."""
    n = codes_sorted.shape[0]

    def delta(i: jax.Array, j: jax.Array) -> jax.Array:
        valid = (j >= 0) & (j < n)
        j_safe = jnp.clip(j, 0, n - 1)
        cx = codes_sorted[i] ^ codes_sorted[j_safe]
        ix = i.astype(jnp.uint32) ^ j_safe.astype(jnp.uint32)
        d_code = jax.lax.clz(cx)
        d_idx = jnp.asarray(32, jnp.int32) + jax.lax.clz(ix)
        d = jnp.where(cx != 0, d_code, d_idx).astype(jnp.int32)
        return jnp.where(valid, d, -1)

    return delta


def build_lbvh(v0: jax.Array, v1: jax.Array, v2: jax.Array) -> BVH:
    """Build an LBVH over triangles given as three [T, 3] vertex arrays."""
    tri_min = jnp.minimum(jnp.minimum(v0, v1), v2)
    tri_max = jnp.maximum(jnp.maximum(v0, v1), v2)
    return build_lbvh_aabbs(tri_min, tri_max)


def build_lbvh_aabbs(tri_min: jax.Array, tri_max: jax.Array) -> BVH:
    """Build an LBVH over arbitrary primitives given by their AABBs
    ([P, 3] min / max). ``leaf_tri`` then holds primitive indices."""
    t = tri_min.shape[0]
    assert t >= 2, "LBVH needs at least 2 primitives"

    # --- Morton codes over normalized centroids ---------------------------
    centroid = (tri_min + tri_max) * 0.5
    scene_min = jnp.min(tri_min, axis=0)
    scene_max = jnp.max(tri_max, axis=0)
    extent = jnp.maximum(scene_max - scene_min, 1e-9)
    norm = (centroid - scene_min) / extent
    codes = mathx.morton3d(norm)  # [T] uint32

    order = jnp.argsort(codes).astype(jnp.int32)
    codes_sorted = codes[order]
    delta = _make_delta(codes_sorted)

    # --- Karras topology: for internal node i in [0, T-1) -----------------
    i = jnp.arange(t - 1, dtype=jnp.int32)

    d = jnp.where(delta(i, i + 1) > delta(i, i - 1), 1, -1).astype(jnp.int32)
    delta_min = delta(i, i - d)

    # Upper bound on range length: double lmax while δ(i, i+lmax·d) > δmin.
    def body_len(state):
        lmax, growing = state
        growing = growing & (delta(i, i + lmax * d) > delta_min)
        return jnp.where(growing, lmax * 2, lmax), growing

    lmax, _ = jax.lax.while_loop(
        lambda st: jnp.any(st[1]),
        body_len,
        (jnp.full(t - 1, 2, jnp.int32), jnp.ones(t - 1, bool)),
    )

    # Binary-descend the exact range length l < lmax (lmax is a power of 2).
    def body_find_l(state):
        l, step = state
        ok = delta(i, i + (l + step) * d) > delta_min
        return jnp.where(ok & (step >= 1), l + step, l), step // 2

    l, _ = jax.lax.while_loop(
        lambda st: jnp.any(st[1] >= 1),
        body_find_l,
        (jnp.zeros(t - 1, jnp.int32), lmax // 2),
    )
    j = i + l * d  # other end of the range

    # Split position: largest s with δ(i, i+(s+t)·d) > δ(i, j), t = ceil(l/2^k).
    delta_node = delta(i, j)

    def body_split(state):
        s, div, t_step = state
        ok = (t_step >= 1) & (delta(i, i + (s + t_step) * d) > delta_node)
        s = jnp.where(ok, s + t_step, s)
        div = div * 2
        nxt = (l + div - 1) // div
        nxt = jnp.where(t_step <= 1, 0, nxt)  # final t=1 probe done → stop
        return s, div, nxt

    s, _, _ = jax.lax.while_loop(
        lambda st: jnp.any(st[2] >= 1),
        body_split,
        (jnp.zeros(t - 1, jnp.int32), jnp.full(t - 1, 2, jnp.int32), (l + 1) // 2),
    )
    gamma = i + s * d + jnp.minimum(d, 0)

    rng_lo = jnp.minimum(i, j)
    rng_hi = jnp.maximum(i, j)
    # Children: leaf if the child range is a single element.
    # Leaves are indexed [T-1, 2T-1): leaf k ↔ node (T-1)+k.
    left_is_leaf = rng_lo == gamma
    right_is_leaf = rng_hi == gamma + 1
    left = jnp.where(left_is_leaf, gamma + (t - 1), gamma)
    right = jnp.where(right_is_leaf, gamma + 1 + (t - 1), gamma + 1)

    # --- Bottom-up AABB fit ------------------------------------------------
    leaf_min = tri_min[order]
    leaf_max = tri_max[order]
    node_min = jnp.concatenate([jnp.full((t - 1, 3), jnp.inf), leaf_min])
    node_max = jnp.concatenate([jnp.full((t - 1, 3), -jnp.inf), leaf_max])

    # Iteratively pull child boxes into parents. Depth of a Karras tree with
    # the index tiebreak is ≤ 64 (key length); converge with a while_loop on
    # "did anything change" is data-dependent, so run the static bound but
    # early-exit via while_loop on an epoch counter + change flag.
    def fit_body(state):
        nmin, nmax, _ = state
        lmin = nmin[left]
        lmax_ = nmax[left]
        rmin = nmin[right]
        rmax_ = nmax[right]
        new_min = jnp.minimum(lmin, rmin)
        new_max = jnp.maximum(lmax_, rmax_)
        changed = jnp.any(new_min != nmin[: t - 1]) | jnp.any(
            new_max != nmax[: t - 1]
        )
        nmin = nmin.at[: t - 1].set(new_min)
        nmax = nmax.at[: t - 1].set(new_max)
        return nmin, nmax, changed

    def fit_cond(state):
        return state[2]

    node_min, node_max, _ = jax.lax.while_loop(
        fit_cond, fit_body, (node_min, node_max, jnp.asarray(True))
    )

    return BVH(
        node_min=node_min,
        node_max=node_max,
        node_left=left,
        node_right=right,
        leaf_tri=order,
    )


def validate_bvh_host(bvh: BVH) -> None:
    """Host-side structural validation (tests): every leaf reachable exactly
    once, parent boxes contain children."""
    import numpy as np

    t = bvh.num_tris
    left = np.asarray(bvh.node_left)
    right = np.asarray(bvh.node_right)
    nmin = np.asarray(bvh.node_min)
    nmax = np.asarray(bvh.node_max)

    seen = np.zeros(t, dtype=int)
    stack = [0]
    visited_internal = set()
    while stack:
        node = stack.pop()
        if node >= t - 1:
            seen[node - (t - 1)] += 1
            continue
        assert node not in visited_internal, f"cycle at internal node {node}"
        visited_internal.add(node)
        for c in (left[node], right[node]):
            cmin, cmax = nmin[c], nmax[c]
            assert (nmin[node] <= cmin + 1e-6).all(), "parent min violated"
            assert (nmax[node] >= cmax - 1e-6).all(), "parent max violated"
            stack.append(int(c))
    assert (seen == 1).all(), f"leaves not covered exactly once: {seen}"
    assert len(np.unique(np.asarray(bvh.leaf_tri))) == t
