"""TraceBackend: intersection backends as (device arrays + pure functions).

The reference binds its TLAS and geometry through the bindless descriptor
heap and passes 32-bit handles to shaders (src/renderer/bindless/mod.rs,
shaders/include/bindless.slang) — resources are *arguments* to pipelines,
never baked into them. The TPU analog turned out to matter for more than
aesthetics: a ``jit`` that closes over concrete device arrays makes every
dispatch pay a full host round-trip on tunneled TPU runtimes (~600× measured
slowdown per call), so acceleration-structure tables and the scene pytree
must travel through the jit boundary as arguments.

A TraceBackend separates the two halves:

- ``arrays``  — an arbitrary pytree of device arrays (the "descriptor heap").
- ``intersect_fn(arrays, o, d) -> Hit`` and
  ``occluded_fn(arrays, o, d, t_max) -> bool[N]`` — pure functions safe to
  trace with ``arrays`` as tracers.

``intersect``/``occluded`` convenience wrappers bind ``self.arrays`` for
eager/test use (do NOT call those inside a jit you care about — that is the
closure pattern again).
"""

from __future__ import annotations

from typing import Any, Callable


class TraceBackend:
    def __init__(
        self,
        arrays: Any,
        intersect_fn: Callable,
        occluded_fn: Callable,
        meta: Any = None,
        self_sorting: bool = False,
        primary_fn: Callable | None = None,
        capped_fn: Callable | None = None,
    ):
        self.arrays = arrays
        self.intersect_fn = intersect_fn
        self.occluded_fn = occluded_fn
        self.meta = meta  # backend-specific (e.g. PacketTables shape info)
        # True when the backend coherence-sorts rays internally (treelets):
        # callers should then pass sort_rays=False to the wavefront — an
        # outer sorted_trace would duplicate the sort + gathers.
        self.self_sorting = self_sorting
        # Optional cheaper trace for tile-ordered primary rays (already
        # packet-coherent: the internal driver sort can be skipped).
        self.primary_fn = primary_fn
        # Optional closest-hit trace with a PER-RAY t cap
        # ``(arrays, o, d, t_max[N]) -> Hit`` — lets the wavefront fuse the
        # NEE shadow batch and the next-bounce rays into ONE launch
        # (render/wavefront.py fused_fn): shadow lanes carry cap = light
        # distance (occluded == Hit.hit, nearest-vs-any is irrelevant for a
        # boolean), bounce lanes carry cap = BACKGROUND_DEPTH. Halves the
        # per-bounce driver overhead (sort + gathers) and doubles the ray
        # density per launch (denser populations sort into purer packets).
        self.capped_fn = capped_fn

    # Eager convenience (tests, interactive) — closure pattern, avoid in jit.
    def intersect(self, o, d):
        return self.intersect_fn(self.arrays, o, d)

    def occluded(self, o, d, t_max):
        return self.occluded_fn(self.arrays, o, d, t_max)

    def bind(self, arrays):
        """(isect, occl) closures over *tracer* arrays — for use inside a jit
        whose arguments include this backend's array pytree."""
        return (
            lambda o, d: self.intersect_fn(arrays, o, d),
            lambda o, d, t: self.occluded_fn(arrays, o, d, t),
        )

    def bind_primary(self, arrays):
        """Closure for the primary trace (falls back to intersect_fn)."""
        fn = self.primary_fn or self.intersect_fn
        return lambda o, d: fn(arrays, o, d)

    def bind_capped(self, arrays):
        """Closure for the per-ray-capped closest-hit trace, or None when the
        backend doesn't provide one (callers fall back to split launches).
        The optional ``anyhit`` ([N] bool) flags lanes that may retire on
        their first accepted hit (shadow lanes in fused launches)."""
        if self.capped_fn is None:
            return None
        return lambda o, d, t, anyhit=None: self.capped_fn(
            arrays, o, d, t, anyhit
        )
