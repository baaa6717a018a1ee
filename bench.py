"""Headline benchmark: Mrays/s/chip for progressive path tracing.

Prints the headline JSON line on stdout ({"metric", "value", "unit",
"vs_baseline"}) and writes every configuration's numbers to
BENCH_DETAILS.json (also echoed to stderr).

Driver-budget discipline (round-4 restructure): the whole bench fits a
wall-clock budget (``RT3_BENCH_BUDGET_S``, default 1500 s) so the driver's
timeout can never kill it without a recorded number again (round 3:
rc=124, parsed=null). Mechanics:

- configs run most-important-first: headline -> sponza720 -> sponza1080 ->
  probe_gi -> hybrid_gi;
- the headline stdout JSON line is flushed AS SOON as the headline config
  lands, then re-emitted (same metric/value, more detail fields) after each
  later config — whichever line a timeout leaves last is valid and
  consistent;
- BENCH_DETAILS.json is rewritten incrementally after every config;
- sponza configs auto-shrink (spp ladder 32/16/8/4, frame count) to the
  measured remaining budget, and every config is fail-isolated (an OOM or
  wedged-tunnel timeout records an error entry instead of killing the run);
- the persistent XLA compile cache (utils/runtime.init_compilation_cache)
  makes repeat runs cheap: a pre-warmed cache turns ~15 min of compiles
  into seconds.

Baseline derivation (BASELINE.md): the reference publishes no numbers; the
north-star target is Sponza 1080p, 4-bounce path tracing, >=30 progressive
fps on a v5e-8 -> 1920*1088*(1 primary + 4 bounce)*30 / 8 chips ~= 39.2
Mrays/s/chip of closest-hit throughput (NEE shadow rays also count as rays).

Configs (BASELINE.json staging):
- headline  : procedural atrium (19k tris) + HDR sky, 4-bounce wavefront PT
              with NEE + RR + blue noise, 960x544 (round-1-comparable).
- sponza720 : Sponza-scale atrium (~300k tris, cluster table in HBM with
              per-leaf DMA) + HDR sky, blue noise, 2 bounces, 1280x720
              (BASELINE config 3; the EXR skybox blob is stripped from the
              reference snapshot, so the procedural sky plays its role).
- sponza1080: same scene, 4 bounces, 1920x1088 (BASELINE config 4 at the
              reference's exact 1920x1088 window, main.rs:61).

Metric accounting (stable across rounds 3+): ``value`` is MEASURED Mray/s
(lanes that actually traverse; round 3 tightened this meter, deflating it
vs rounds 1-2). ``nominal_value`` and ``headline_frame_ms`` are the
accounting-stable cross-round comparators.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_MRAYS_PER_CHIP = 1920 * 1088 * 5 * 30 / 8 / 1e6  # ~= 39.17

BUDGET_S = float(os.environ.get("RT3_BENCH_BUDGET_S", "1500"))
_T0 = time.monotonic()


def _remaining() -> float:
    return BUDGET_S - (time.monotonic() - _T0)


def _with_deadline(fn, deadline_s: float, what: str):
    """Run fn() on a daemon worker thread with a hard deadline.

    pull_guarded only protects device→host PULLS — but on this runtime a
    wedged tunnel blocks *inside the dispatch/compile call itself* (round
    4: a jit dispatch sat 25 min in a futex with the watchdog never
    reached). Threading the whole config keeps the budget enforceable no
    matter where the runtime wedges; an abandoned thread cannot be killed,
    but the bench still exits in time with a parseable record."""
    import threading

    box = {}

    def work():
        try:
            box["out"] = fn()
        except BaseException as e:  # noqa: BLE001 — reraised on the caller
            box["err"] = e

    t = threading.Thread(target=work, daemon=True, name=f"bench-{what}")
    t.start()
    t.join(max(1.0, deadline_s))
    if t.is_alive():
        raise TimeoutError(
            f"{what} exceeded its {deadline_s:.0f}s deadline (runtime "
            "wedged in dispatch/compile, not just a slow pull)"
        )
    if "err" in box:
        raise box["err"]
    return box["out"]


def _device_alive(deadline_s: float = 240.0) -> bool:
    """Liveness pre-check: one trivial on-device reduction under a deadline.
    A wedged tunnel hangs even `jax.devices()` (observed 2026-08-20); when
    that happens every config would burn its deadline for nothing — bail
    out early with an honest error record instead."""
    def probe():
        return int(jnp.arange(8).sum())

    try:
        return _with_deadline(probe, deadline_s, "device liveness") == 28
    except Exception:
        return False


def run_config(tag, scene, host_tris, cam, width, height, bounces,
               n_frames=3, samples=1, fuse_shadow=False, backend=None,
               compile_timeout=None):
    from raytracer3_tpu.ops.pallas import traverse_kernel as tk
    from raytracer3_tpu.ops import rng as rng_mod
    from raytracer3_tpu.render import film as film_mod
    from raytracer3_tpu.render import wavefront
    from raytracer3_tpu.utils.config import RenderSettings

    if backend is None:
        backend = tk.packet_backend(host_tris=host_tris)
    # samples > 1 batches all paths into ONE wavefront of samples*W*H lanes
    # (render/wavefront.py sample_batch): denser populations sort into purer
    # packets (+28% bounce Mray/s at 4x density) and per-launch driver cost
    # amortizes. One frame then advances the film by `samples` spp.
    settings = RenderSettings(
        width=width, height=height, bounces=bounces, samples=samples,
        sample_batch=samples > 1, radiance_clamp=50.0,
        fuse_shadow=fuse_shadow,
        # Lane-state diet (rgb9e5-packed color state across launches):
        # default ON for sample-batched configs — it is what lets
        # sponza720 ride 32 spp (round-3 OOM'd by 593 MB; A/B 2026-08-20:
        # 16-spp overhead within run noise, 32 spp runs at 1.94 spp/s).
        lane_diet=os.environ.get(
            "RT3_LANE_DIET", "1" if samples > 1 else "0"
        ) == "1",
        # NEE shadow-ray Russian roulette (opt-in via env until A/B'd):
        # dim shadow rays are skipped probabilistically, unbiased.
        nee_rr_threshold=float(os.environ.get("RT3_NEE_RR", "0")),
    )
    blue_noise = jnp.asarray(rng_mod.generate_blue_noise(64))

    # Scene + BVH tables cross the jit boundary as ARGUMENTS - jit-closures
    # over device arrays pay a host round-trip per dispatch on tunneled TPU
    # runtimes (ops/backend.py).
    @jax.jit
    def frame(scene_, bvh, bn, film, fi):
        isect, occl = backend.bind(bvh)
        radiance, traced = wavefront.render_frame(
            scene_, cam, settings, fi, isect, occl,
            sort_rays=not backend.self_sorting,  # treelets sort internally
            blue_noise=bn, return_stats=True,
            primary_fn=backend.bind_primary(bvh),
            fused_fn=(
                backend.bind_capped(bvh) if settings.fuse_shadow else None
            ),
        )
        return film_mod.accumulate_progressive(film, radiance), traced

    from raytracer3_tpu.utils import runtime as runtime_mod

    film = film_mod.Film.create(height, width)
    film, traced = frame(scene, backend.arrays, blue_noise, film, jnp.uint32(0))
    # Scalar pull forces the frame (block_until_ready can lie on this
    # runtime); guarded so a wedged tunnel raises instead of hanging the
    # whole bench. First frame carries the compile — the timeout shrinks to
    # what the wall-clock budget still allows.
    if compile_timeout is None:
        compile_timeout = max(120.0, min(2400.0, _remaining() - 60.0))
    runtime_mod.pull_guarded(
        traced, timeout=compile_timeout, what=f"{tag} compile frame"
    )

    t0 = time.perf_counter()
    measured_rays = 0
    for i in range(1, n_frames + 1):
        film, traced = frame(scene, backend.arrays, blue_noise, film, jnp.uint32(i))
        measured_rays += int(
            runtime_mod.pull_guarded(traced, timeout=900.0, what=f"{tag} frame {i}")
        )
    dt = (time.perf_counter() - t0) / n_frames

    # Nominal rays/pixel: 1 primary + bounces closest-hit + bounces NEE
    # shadow. The *measured* count (alive lanes actually traced, from
    # render_frame's meter) is the honest Mray/s numerator — Russian
    # roulette and escaped lanes make it smaller.
    rays_per_pixel = (1 + bounces + bounces) * samples
    mrays_nominal = width * height * rays_per_pixel / dt / 1e6
    mrays = measured_rays / n_frames / dt / 1e6
    return {
        "config": tag,
        "width": width,
        "height": height,
        "bounces": bounces,
        "samples_per_frame": samples,
        "tris": int(host_tris[0].shape[0]),
        "frame_ms": round(dt * 1e3, 1),
        "fps": round(1.0 / dt, 2),
        # Progressive convergence rate: samples-per-pixel per second. The
        # honest cross-config speed measure once frames batch >1 spp.
        "spp_per_s": round(samples / dt, 2),
        "mrays_per_s_per_chip": round(mrays, 3),
        "nominal_mrays_per_s_per_chip": round(mrays_nominal, 3),
        "measured_rays_per_pixel": round(
            measured_rays / n_frames / (width * height), 2
        ),
        "vs_baseline": round(mrays / BASELINE_MRAYS_PER_CHIP, 4),
        # IDEAL 8-chip tile-parallel projection: single-chip fps × 8, an
        # UPPER BOUND assuming perfect linear scaling (parallel/mesh.py
        # shards image rows with replicated tables — the one inter-chip
        # collective is the final film psum). No real v5e-8 is reachable
        # here; dryrun_multichip proves the sharding compiles/executes, and
        # tools/probe_shard_overhead.py measures the shard_map wrapper's
        # single-chip overhead (recorded in docs/ROADMAP.md) — ICI
        # collective cost at 8 chips remains unmeasured by construction.
        "ideal_v5e8_fps": round(8.0 / dt, 2),
    }


def run_probe_config(tag, scene, host_tris, cam, width, height, n_frames=3,
                     hybrid=False, settings_kw=None):
    """Probe-GI pipeline cost on chip (the reference's flagship GI mode,
    shaders/old/trace_probes.slang): G-buffer → SIS → probe trace → SH →
    interpolate → AgX, one jitted step. hybrid=True benches the hybrid
    probes+PT pipeline (per-pixel direct NEE + indirect-only probes)."""
    import jax.numpy as jnp

    from raytracer3_tpu.ops.pallas import traverse_kernel as tk
    from raytracer3_tpu.render import pipelines
    from raytracer3_tpu.utils.config import RenderSettings

    backend = tk.packet_backend(host_tris=host_tris)
    settings = RenderSettings(
        width=width, height=height, bounces=1, samples=1,
        **(settings_kw or {}),
    )
    factory = (
        pipelines.hybrid_gi_pipeline if hybrid else pipelines.probe_gi_pipeline
    )
    step, init_state = factory(scene, settings, backend=backend)
    from raytracer3_tpu.utils import runtime as runtime_mod

    state = init_state()
    disp, state = step(state, cam=cam, frame_index=jnp.uint32(0))
    # Guarded scalar pull (block_until_ready lies here; wedged tunnel raises).
    runtime_mod.pull_guarded(
        jnp.sum(disp),
        timeout=max(120.0, min(2400.0, _remaining() - 60.0)),
        what="probe compile",
    )
    t0 = time.perf_counter()
    for i in range(1, n_frames + 1):
        disp, state = step(state, cam=cam, frame_index=jnp.uint32(i))
        runtime_mod.pull_guarded(jnp.sum(disp), timeout=900.0, what="probe frame")
    dt = (time.perf_counter() - t0) / n_frames
    return {
        "config": tag,
        "width": width,
        "height": height,
        "tris": int(host_tris[0].shape[0]),
        "frame_ms": round(dt * 1e3, 1),
        "fps": round(1.0 / dt, 2),
    }


def sponza_world_scene(detail: int = 8):
    """North-star scene through the REAL ingest path (BASELINE config 4 +
    reference src/assets/mod.rs:180-286 parity): procedural atrium → GLB
    blob → processed-asset cache → World pools → Scene + host tris."""
    import os

    from raytracer3_tpu.app import world as world_mod
    from raytracer3_tpu.scene import assets, procedural
    from raytracer3_tpu.scene import gltf as gltf_mod

    kw = procedural.atrium(detail=detail)
    path = os.path.join(
        assets._cache_dir(None), f"bench_atrium_d{detail}.glb"
    )
    if not os.path.exists(path):
        gltf_mod.write_glb_multi(
            path,
            kw["positions"], kw["normals"], kw["uvs"], kw["indices"],
            kw["geo_id"], kw["base_color"], kw["emission"],
            kw["metallic"], kw["roughness"],
        )
    md = assets.load_glb_cached(path)
    w = world_mod.World()
    w.spawn(w.add_mesh_data(md), name="atrium")
    w.env_map = procedural.sky_equirect(256, 512)
    scene = w.scene()
    return scene, w._host_tris()


class _Emitter:
    """Incremental result sink: rewrites BENCH_DETAILS.json and re-prints
    the stdout headline line after every config, so a driver timeout at ANY
    point past the headline still leaves a parseable, consistent record."""

    def __init__(self):
        self.results = []
        self.errors = []

    def add(self, r_):
        self.results.append(r_)
        print(json.dumps(r_), file=sys.stderr, flush=True)
        self.flush()

    def fail(self, tag, exc):
        err = {"config": tag, "error": f"{type(exc).__name__}: {exc}"[:500]}
        self.errors.append(err)
        print(json.dumps(err), file=sys.stderr, flush=True)
        self.flush()

    def _by(self, tag):
        for r_ in self.results:
            if r_["config"] == tag:
                return r_
        return None

    def headline_line(self):
        head = self._by("headline")
        if head is None:
            return None
        line = {
            "metric": "mrays_per_s_per_chip",
            "value": head["mrays_per_s_per_chip"],
            "unit": "Mray/s",
            "vs_baseline": head["vs_baseline"],
            # Same-accounting-across-rounds comparators: the measured
            # ray meter tightened in round 3 (shadow lanes that never
            # traverse no longer count), which deflates `value` vs
            # older rounds; nominal + frame_ms are stable yardsticks.
            "nominal_value": head["nominal_mrays_per_s_per_chip"],
            "headline_frame_ms": head["frame_ms"],
        }
        sponza = self._by("sponza1080")
        if sponza is not None:
            line.update(
                {
                    "sponza1080_mrays": sponza["mrays_per_s_per_chip"],
                    "sponza1080_frame_ms": sponza["frame_ms"],
                    "sponza1080_spp_per_s": sponza["spp_per_s"],
                }
            )
        s720 = self._by("sponza720")
        if s720 is not None:
            line["sponza720_spp_per_s"] = s720["spp_per_s"]
        pg = self._by("sponza720_probe_gi")
        if pg is not None:
            # The reference's real-time GI mode on the north-star scene.
            line["sponza720_probe_gi_fps"] = pg["fps"]
        pg1080 = self._by("sponza1080_probe_gi")
        if pg1080 is not None:
            line["sponza1080_probe_gi_fps"] = pg1080["fps"]
        return line

    def flush(self):
        detail = list(self.results) + self.errors
        with open("BENCH_DETAILS.json", "w") as f:
            json.dump(detail, f, indent=1)
        line = self.headline_line()
        if line is not None:
            print(json.dumps(line), flush=True)


def _pick_spp(ladder, per_spp_s, compile_s, n_frames, share):
    """Largest spp from `ladder` whose estimated cost (compile + n_frames
    frames at `per_spp_s` seconds/spp, assuming cost ~ linear in spp) fits
    `share` of the remaining budget."""
    for spp in ladder:
        est = compile_s + n_frames * per_spp_s * spp
        if est <= _remaining() * share:
            return spp
    return ladder[-1]


def main() -> None:
    from raytracer3_tpu.scene import procedural
    from raytracer3_tpu.utils import runtime

    runtime.init_compilation_cache()
    em = _Emitter()

    if not _device_alive(min(240.0, BUDGET_S * 0.2)):
        em.fail(
            "device",
            TimeoutError(
                "device liveness probe hung — tunnel/runtime wedged; no "
                "perf numbers can be measured this run"
            ),
        )
        _finish(em)
        return

    # --- headline (the official number) first ---
    scene, tris = procedural.atrium_scene(detail=2, return_host=True)
    cam = procedural.atrium_camera(aspect=960 / 544)
    try:
        em.add(
            _with_deadline(
                lambda: run_config("headline", scene, tris, cam, 960, 544, 4),
                min(_remaining() - 90.0, BUDGET_S * 0.5),
                "headline",
            )
        )
    except Exception as e:  # noqa: BLE001 — fail-isolated configs
        em.fail("headline", e)

    # --- sponza configs: the north-star scene, budget-adaptive spp ---
    # Ray density is a measured throughput lever (bounce x8 5.55 -> x16
    # 5.95, occl 16.47 -> 18.64 Mray/s; tools/probe_spp.py): denser
    # populations sort into purer packets and driver cost amortizes; the
    # ladder tops at what HBM fits (docs/ROADMAP.md density notes).
    try:
        big_scene, big_tris = sponza_world_scene(detail=8)
        cam720 = procedural.atrium_camera(aspect=1280 / 720)
        cam1080 = procedural.atrium_camera(aspect=1920 / 1088)
        # Cost model priors (measured round 3/4, cold-compile worst case;
        # warm cache makes compile ~free). ~0.55 s/spp at 720p, ~2.2 at
        # 1080p.
        # Ladder top is what HBM fits: 32 since the lane diet landed
        # (tools/probe_spp.py 2026-08-20: 16.5 s/frame, 1.94 spp/s).
        max720 = int(os.environ.get("RT3_BENCH_MAX_SPP720", "32"))
        spp720 = _pick_spp(
            [s for s in (32, 16, 8, 4) if s <= max720],
            per_spp_s=0.6, compile_s=400.0, n_frames=2, share=0.45,
        )
        if _remaining() > 180.0:
            try:
                em.add(
                    _with_deadline(
                        lambda: run_config(
                            "sponza720", big_scene, big_tris, cam720,
                            1280, 720, 2, samples=spp720, n_frames=2,
                        ),
                        _remaining() * 0.55,
                        "sponza720",
                    )
                )
            except Exception as e:  # noqa: BLE001
                em.fail("sponza720", e)
        spp1080 = _pick_spp(
            [16, 8, 4], per_spp_s=2.3, compile_s=500.0, n_frames=2,
            share=0.8,
        )
        if _remaining() > 180.0:
            try:
                em.add(
                    _with_deadline(
                        lambda: run_config(
                            "sponza1080", big_scene, big_tris, cam1080,
                            1920, 1088, 4, samples=spp1080, n_frames=2,
                        ),
                        _remaining() - 90.0,
                        "sponza1080",
                    )
                )
            except Exception as e:  # noqa: BLE001
                em.fail("sponza1080", e)
    except Exception as e:  # noqa: BLE001 — scene build itself failed
        em.fail("sponza_scene", e)

    # --- probe pipelines (cheap; skipped if the budget is spent). The
    # sponza720 probe-GI config is the reference's actual REAL-TIME mode
    # on the north-star scene: 314.9 ms/frame single-chip (3.18 fps;
    # ideal v5e-8 projection 25.4 fps — near the ≥30 fps north star),
    # 2026-08-20. Progressive PT stays the ground-truth mode.
    probe_runs = []
    try:
        probe_runs += [
            # The literal 1080p north-star real-time mode (VERDICT r4 #2).
            # probe_texel_splits=2 (1/2 the probe texels traced per frame,
            # round-robin) is the production real-time config: 214 ms vs
            # 308.6 at full rate (2026-08-20 on-chip), quality cost
            # quantified in docs/QUALITY.md (probe_gi_split2 row).
            ("sponza1080_probe_gi", big_scene, big_tris, cam1080, 1920, 1088,
             False, {"probe_texel_splits": 2}),
            ("sponza720_probe_gi", big_scene, big_tris, cam720, 1280, 720,
             False, None),
            ("sponza720_hybrid_gi", big_scene, big_tris, cam720, 1280, 720,
             True, None),
        ]
    except NameError:
        pass  # sponza scene build failed earlier; small-scene probes only
    probe_runs += [
        ("probe_gi", scene, tris, cam, 960, 544, False, None),
        ("hybrid_gi", scene, tris, cam, 960, 544, True, None),
    ]
    for tag, sc, tr, cm, w, h, hybrid, skw in probe_runs:
        if _remaining() < 120.0:
            em.fail(tag, TimeoutError("skipped: bench budget spent"))
            continue
        try:
            em.add(
                _with_deadline(
                    lambda: run_probe_config(
                        tag, sc, tr, cm, w, h, hybrid=hybrid, settings_kw=skw
                    ),
                    _remaining() - 60.0,
                    tag,
                )
            )
        except Exception as e:  # noqa: BLE001
            em.fail(tag, e)

    _finish(em)


def _finish(em: "_Emitter") -> None:
    em.flush()
    if em.headline_line() is None:
        # Headline failed — still leave a parseable record for the driver.
        print(
            json.dumps(
                {
                    "metric": "mrays_per_s_per_chip",
                    "value": 0.0,
                    "unit": "Mray/s",
                    "vs_baseline": 0.0,
                    "error": (em.errors[0]["error"] if em.errors else "unknown"),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    sys.stderr.flush()
    # Hard exit: abandoned deadline threads may sit wedged inside the
    # runtime, and jax's atexit finalizers would hang the interpreter on
    # them — the record is already flushed, so leave unconditionally.
    os._exit(0)
