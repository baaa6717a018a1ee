"""ctypes bindings for the native asset-pipeline library (native/rt3native.cpp).

The library is compiled on demand with g++ (no pybind11 in the image; plain C
ABI + ctypes, as the environment prescribes). Every entry point has a numpy
fallback so the framework still works without a C++ toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO_ROOT, "native", "rt3native.cpp")
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "librt3native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB_PATH],
            check=True,
            capture_output=True,
            timeout=300,
        )
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        stale = (
            os.path.exists(_LIB_PATH)
            and os.path.exists(_SRC)
            and os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
        )
        if (not os.path.exists(_LIB_PATH) or stale) and os.path.exists(_SRC):
            _build()
        if not os.path.exists(_LIB_PATH):
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        c_int = ctypes.c_int
        c_float = ctypes.c_float
        ip = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        fp = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
        lib.rt3_weld_vertices.argtypes = [fp, c_int, c_int, ip]
        lib.rt3_weld_vertices.restype = c_int
        lib.rt3_optimize_vertex_cache.argtypes = [ip, c_int, c_int]
        lib.rt3_optimize_vertex_fetch.argtypes = [ip, c_int, c_int, ip]
        lib.rt3_optimize_vertex_fetch.restype = c_int
        lib.rt3_analyze_cache.argtypes = [
            ip, c_int, c_int, c_int,
            ctypes.POINTER(c_float), ctypes.POINTER(c_float),
        ]
        lib.rt3_quantize_positions_14.argtypes = [fp, c_int, u16p, fp]
        lib.rt3_dequantize_positions_14.argtypes = [u16p, c_int, fp, fp]
        lib.rt3_encode_normals_octa8.argtypes = [fp, c_int, u16p]
        lib.rt3_decode_normals_octa8.argtypes = [u16p, c_int, fp]
        lib.rt3_build_sah_bvh.argtypes = [fp, fp, c_int, ip, ip, fp, fp, ip]
        lib.rt3_build_sah_bvh.restype = c_int
        lib.rt3_build_clusters.argtypes = [fp, fp, c_int, c_int, ip]
        lib.rt3_build_clusters.restype = c_int
        lib.rt3_build_clusters_sah.argtypes = [fp, fp, c_int, c_int, ip]
        lib.rt3_build_clusters_sah.restype = c_int
        lib.rt3_split_fragments.argtypes = [fp, fp, fp, c_int, c_int, ip, fp, fp]
        lib.rt3_split_fragments.restype = c_int
        lib.rt3_simplify.argtypes = [
            fp, c_int, ip, c_int, c_int, c_float, ip, ctypes.POINTER(c_float),
        ]
        lib.rt3_simplify.restype = c_int
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


# ---------------------------------------------------------------------------
# High-level wrappers (numpy fallbacks where noted)
# ---------------------------------------------------------------------------


def weld_vertices(attrs: np.ndarray):
    """Dedup identical vertex rows. Returns (remap [V] old→new, new_count)."""
    attrs = np.ascontiguousarray(attrs, np.float32)
    lib = get_lib()
    if lib is not None:
        remap = np.zeros(len(attrs), np.int32)
        n = lib.rt3_weld_vertices(attrs, len(attrs), attrs.shape[1], remap)
        return remap, int(n)
    _, idx, inv = np.unique(attrs, axis=0, return_index=True, return_inverse=True)
    # preserve first-seen ordering
    order = np.argsort(idx)
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    return rank[inv].astype(np.int32), len(idx)


def optimize_vertex_cache(indices: np.ndarray, n_verts: int) -> np.ndarray:
    """Forsyth linear-speed vertex-cache optimization (meshopt
    optimize_vertex_cache role, assets/mod.rs:255). No-op without the lib."""
    lib = get_lib()
    idx = np.ascontiguousarray(indices.reshape(-1), np.int32).copy()
    if lib is not None and len(idx) >= 3:
        lib.rt3_optimize_vertex_cache(idx, len(idx) // 3, n_verts)
    return idx.reshape(-1, 3)


def optimize_vertex_fetch(indices: np.ndarray, n_verts: int):
    """Reorder vertices by first use. Returns (new_indices, remap old→new)."""
    lib = get_lib()
    idx = np.ascontiguousarray(indices.reshape(-1), np.int32).copy()
    remap = np.zeros(n_verts, np.int32)
    if lib is not None:
        lib.rt3_optimize_vertex_fetch(idx, len(idx) // 3, n_verts, remap)
    else:
        nxt = 0
        remap[:] = -1
        for i, v in enumerate(idx):
            if remap[v] < 0:
                remap[v] = nxt
                nxt += 1
            idx[i] = remap[v]
        remap[remap < 0] = np.arange(nxt, n_verts)[: (remap < 0).sum()]
    return idx.reshape(-1, 3), remap


def analyze_cache(indices: np.ndarray, n_verts: int, cache_size: int = 32):
    """(ACMR, ATVR) under a FIFO cache model (meshopt.rs:362-394 metrics)."""
    lib = get_lib()
    idx = np.ascontiguousarray(indices.reshape(-1), np.int32)
    if lib is not None:
        acmr = ctypes.c_float()
        atvr = ctypes.c_float()
        lib.rt3_analyze_cache(idx, len(idx) // 3, n_verts, cache_size,
                              ctypes.byref(acmr), ctypes.byref(atvr))
        return float(acmr.value), float(atvr.value)
    stamp = np.full(n_verts, -10**9)
    time = 0
    misses = 0
    for v in idx:
        if time - stamp[v] >= cache_size:
            misses += 1
            stamp[v] = time
            time += 1
    unique = len(np.unique(idx))
    return misses / max(len(idx) // 3, 1), misses / max(unique, 1)


def quantize_positions(pos: np.ndarray):
    """14-bit position quantization (encoder.rs:120-190 role).
    Returns (u16 [N,3], scale_bias [6])."""
    pos = np.ascontiguousarray(pos, np.float32)
    lib = get_lib()
    out = np.zeros_like(pos, dtype=np.uint16)
    sb = np.zeros(6, np.float32)
    if lib is not None:
        lib.rt3_quantize_positions_14(pos, len(pos), out, sb)
        return out, sb
    mn = pos.min(0)
    ext = np.maximum(pos.max(0) - mn, 1.0 * (pos.max(0) - mn <= 0) + (pos.max(0) - mn))
    ext = np.where(ext > 0, ext, 1.0)
    sb[:3] = mn
    sb[3:] = ext
    out = ((pos - mn) / ext * 16383.0 + 0.5).astype(np.uint16)
    return out, sb


def dequantize_positions(qpos: np.ndarray, scale_bias: np.ndarray) -> np.ndarray:
    lib = get_lib()
    q = np.ascontiguousarray(qpos, np.uint16)
    sb = np.ascontiguousarray(scale_bias, np.float32)
    if lib is not None:
        out = np.zeros((len(q), 3), np.float32)
        lib.rt3_dequantize_positions_14(q, len(q), sb, out)
        return out
    return sb[:3] + (q.astype(np.float32) / 16383.0) * sb[3:]


def encode_normals(nrm: np.ndarray) -> np.ndarray:
    """8+8-bit octahedral normal encoding."""
    lib = get_lib()
    n = np.ascontiguousarray(nrm, np.float32)
    out = np.zeros(len(n), np.uint16)
    if lib is not None:
        lib.rt3_encode_normals_octa8(n, len(n), out)
        return out
    from raytracer3_tpu.ops import packing
    import jax.numpy as jnp

    uv = np.asarray(packing.octa_encode(jnp.asarray(n)))
    q = np.clip(uv * 255.0 + 0.5, 0, 255).astype(np.uint16)
    return (q[:, 1] << 8) | q[:, 0]


def decode_normals(enc: np.ndarray) -> np.ndarray:
    lib = get_lib()
    e = np.ascontiguousarray(enc, np.uint16)
    if lib is not None:
        out = np.zeros((len(e), 3), np.float32)
        lib.rt3_decode_normals_octa8(e, len(e), out)
        return out
    from raytracer3_tpu.ops import packing
    import jax.numpy as jnp

    uv = np.stack([(e & 0xFF) / 255.0, ((e >> 8) & 0xFF) / 255.0], -1)
    return np.asarray(packing.octa_decode(jnp.asarray(uv, jnp.float32)))


def simplify(
    positions: np.ndarray,
    indices: np.ndarray,
    target_ratio: float = 0.5,
    max_error: float = 0.0,
):
    """Quadric edge-collapse simplification onto existing vertices (the
    meshopt demo's `simplify` exercise, src/meshopt/meshopt.rs:559-700;
    border-locked, normal-flip-guarded). Returns (new_indices [M, 3],
    max_collapse_error) — vertex buffer is reused unchanged. The error is
    sqrt(worst single-collapse quadric error), a MAX metric (not an RMS):
    tune ``max_error`` against the worst collapse you will accept.
    ``max_error`` > 0 stops early once the next collapse would exceed that
    quadric error. Returns the input unchanged (error 0.0) without the
    native lib."""
    idx = np.ascontiguousarray(indices.reshape(-1, 3), np.int32)
    lib = get_lib()
    if lib is None or len(idx) == 0:
        return idx, 0.0
    pos = np.ascontiguousarray(positions, np.float32).reshape(-1, 3)
    target = max(0, int(len(idx) * target_ratio))
    out = np.zeros_like(idx).reshape(-1)
    err = ctypes.c_float()
    m = lib.rt3_simplify(
        pos, len(pos), np.ascontiguousarray(idx.reshape(-1)), len(idx),
        target, float(max_error), out, ctypes.byref(err),
    )
    return out[: m * 3].reshape(-1, 3).copy(), float(err.value)


def build_sah_bvh(bmin: np.ndarray, bmax: np.ndarray):
    """Binned-SAH BVH (same layout as ops/bvh.BVH). None if lib missing."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(bmin)
    bmin = np.ascontiguousarray(bmin, np.float32)
    bmax = np.ascontiguousarray(bmax, np.float32)
    left = np.zeros(n - 1, np.int32)
    right = np.zeros(n - 1, np.int32)
    nmin = np.zeros((2 * n - 1, 3), np.float32)
    nmax = np.zeros((2 * n - 1, 3), np.float32)
    leaf = np.zeros(n, np.int32)
    cnt = lib.rt3_build_sah_bvh(bmin, bmax, n, left, right, nmin, nmax, leaf)
    assert cnt == n - 1, f"SAH builder emitted {cnt} internals, expected {n-1}"
    from raytracer3_tpu.ops import bvh as bvh_mod

    # HOST arrays on purpose: the only consumer is the host-side collapse
    # (cluster_bvh.build_cluster_bvh_host); returning device arrays made the
    # caller's jax.device_get pull 5 arrays back through the tunneled TPU
    # (~60 s measured, the round-2 "464 s BVH build").
    return bvh_mod.BVH(
        node_min=nmin,
        node_max=nmax,
        node_left=left,
        node_right=right,
        leaf_tri=leaf,
    )


def build_clusters(
    bmin: np.ndarray, bmax: np.ndarray, leaf_size: int, mode: str = "median"
):
    """Triangle clustering: cluster_of [N] int32 (None if lib missing).

    mode "median": recursive centroid-median bisection — balanced, every
    cluster full, counts are powers of two. mode "sah": binned-SAH split
    placement — tighter cluster AABBs (fewer leaf activations in the packet
    kernel) at the cost of underfull clusters (more rows)."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(bmin)
    out = np.zeros(n, np.int32)
    fn = (
        lib.rt3_build_clusters_sah if mode == "sah" else lib.rt3_build_clusters
    )
    cnt = fn(
        np.ascontiguousarray(bmin, np.float32),
        np.ascontiguousarray(bmax, np.float32),
        n, leaf_size, out,
    )
    return out, int(cnt)


def split_fragments(v0, v1, v2, budget: float = 1.3):
    """SBVH-style spatial splits: dice the largest triangles into
    axis-plane-clipped fragments (greedy on fragment-box surface area) up to
    ``budget``×N fragments. Returns (frag_tri [M] int32 — original triangle
    per fragment, frag_min/frag_max [M, 3] f32 — CLIPPED boxes), or None if
    the lib is missing. Fragments keep the original triangle's vertices for
    intersection, so hits (t/u/v/prim_id) are unchanged — only the
    clustering boxes tighten."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(v0)
    max_out = int(n * budget)
    frag_tri = np.zeros(max_out, np.int32)
    frag_min = np.zeros((max_out, 3), np.float32)
    frag_max = np.zeros((max_out, 3), np.float32)
    m = lib.rt3_split_fragments(
        np.ascontiguousarray(v0, np.float32),
        np.ascontiguousarray(v1, np.float32),
        np.ascontiguousarray(v2, np.float32),
        n, max_out, frag_tri, frag_min, frag_max,
    )
    return frag_tri[:m], frag_min[:m], frag_max[:m]
