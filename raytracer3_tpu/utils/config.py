"""Render settings — the GConst analog.

The reference streams a ``GConst`` uniform struct to every pass each frame
(src/renderer/mod.rs:47-63; shaders/include/datatypes.slang:28-43). Here the
same knobs live in a frozen dataclass whose fields are *static* under jit
(bounces/samples change → recompile, which XLA needs anyway for loop
unrolling), while per-frame dynamic values (frame_index, blendfactor, camera)
are traced arguments.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """Static per-pipeline knobs (GConst: renderer/mod.rs:47-63)."""

    width: int = 1920
    height: int = 1088
    bounces: int = 4
    samples: int = 1
    # Probe GI layout (old/trace_probes.slang:18-25): 1 probe / probe_spacing
    # px, probe_res × probe_res octahedral directions per probe.
    probe_spacing: int = 16
    probe_res: int = 8
    # Probe-ray path depth: 2 adds one cosine-sampled diffuse bounce at the
    # probe ray's hit (NEE-shaded), so probes carry 2-bounce GI — beyond the
    # reference's single-segment probe rays (trace_probes.slang:55-70).
    probe_bounces: int = 1
    # Stochastic second-bounce amortization (only with probe_bounces >= 2):
    # each probe texel traces its second bounce with probability 1/k per
    # frame, weighted k× — unbiased (RR-style), the temporal blend absorbs
    # the variance; the second-bounce launch pays ~1/k of its kernel time
    # (render/probes.py trace_probes).
    probe_bounce2_splits: int = 1
    # Temporal probe-texel splitting: trace 1/k of each probe's octahedral
    # texels per frame, round-robin by frame index (k must divide
    # probe_res²). Untraced texels keep their previous atlas value, so the
    # per-texel temporal blend runs at 1/k rate while the probe-trace +
    # probe-NEE cost drops ~k×. On a camera cut (blendfactor 1.0) the
    # untraced texels stay stale for k-1 frames — at real-time rates that
    # is <0.5 s of partial ghosting, the price of the amortization.
    probe_texel_splits: int = 1
    # SH-projection hole filling: texels never written since reset (SIS
    # permanently culls ~1/3 of directions) enter the quadrature at their
    # probe's mean written radiance instead of zero (render/probes.py
    # project_sh — the probe energy-deficit fix, docs/QUALITY.md).
    probe_sh_fill: bool = True
    # interpolate_probes.slang cell_size knob
    cell_size: float = 0.01
    proberng: bool = False
    # Reference "refrence_mode" uses pure-diffuse shading
    # (old/refrence_mode.slang:41); full mode uses metallic-roughness GGX.
    diffuse_only: bool = False
    # Firefly clamp for bounce radiance (0 = off).
    radiance_clamp: float = 0.0
    # Pixel angular size for ray-cone texture LOD (≈ vertical fov / height;
    # 65° at 1088 rows ≈ 0.00104). Only read when the scene carries a mip
    # atlas (scene/textures.py).
    tex_cone_angle: float = 0.00104
    # Trace all `samples` paths in ONE wavefront of samples·W·H lanes
    # instead of a sequential per-sample loop. Denser ray populations sort
    # into purer traversal packets — measured +28% bounce Mray/s at 4x
    # density on Sponza-scale (tools/probe_r3.py --what density) — at the
    # cost of samples× the queue memory. No effect when samples == 1.
    sample_batch: bool = False
    # Fuse each bounce's NEE shadow batch into the next-bounce launch (one
    # 2N-lane capped closest-hit trace instead of an any-hit + a closest-hit
    # launch). Needs a backend capped_fn (treelets/bruteforce provide one);
    # silently ignored otherwise. Radiance is bit-compatible either way.
    fuse_shadow: bool = False
    # NEE shadow-ray Russian roulette: shadow rays whose UNSHADOWED
    # radiance increment (throughput × contrib luminance) falls below this
    # threshold are traced with probability p = lum/threshold and their
    # contribution scaled 1/p — unbiased, trades bounded extra variance on
    # dim paths for skipped any-hit traversals (shadow traversal is ~38%
    # of the sponza1080 frame). 0 disables (default; goldens use 0).
    nee_rr_threshold: float = 0.0
    # Lane-state diet: rgb9e5-pack the non-negative color lane state
    # (radiance, throughput, NEE contrib) across each bounce's traversal
    # launches — 3 f32 → 1 u32 per value, ~24 B/lane less HBM live across
    # the long launch. Unlocks denser sample batches (sponza720@32spp OOMed
    # by 593 MB of exactly such temps, tools/probe_spp.py). ≤0.5% shared-
    # exponent rounding per crossing — far below MC noise, but NOT
    # bit-compatible with the default path (goldens use the default).
    lane_diet: bool = False

    @property
    def n_pixels(self) -> int:
        return self.width * self.height

    @property
    def probe_grid(self) -> tuple[int, int]:
        return (
            self.width // self.probe_spacing,
            self.height // self.probe_spacing,
        )
