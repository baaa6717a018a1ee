"""Interactive progressive viewer and offline render driver.

TPU-native counterpart of the reference application loop: the Bevy App with
camera controls (src/main.rs:92-132, src/components/camera.rs:90-191) and the
progressive accumulate/reset behavior of interactive path tracing
(BASELINE.json config 5). There is no local window on a TPU host, so the
"swapchain" is a PNG/stream sink; input events are fed programmatically (or
from a simple stdin protocol), and camera motion resets accumulation exactly
like the reference's blendfactor-driven restart.

Mirrors the reference's frames-in-flight pipelining (swapchain.rs:8,
render_graph/mod.rs:630-649): JAX's async dispatch queue plays the role of
the command-buffer queue — we submit up to `frames_in_flight` jitted steps
before blocking on the oldest result.
"""

from __future__ import annotations

import dataclasses
import time
from collections import deque
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from raytracer3_tpu.render import camera as camera_mod
from raytracer3_tpu.render import film as film_mod
from raytracer3_tpu.render import postprocess
from raytracer3_tpu.utils import image as image_io
from raytracer3_tpu.utils.config import RenderSettings

MOVE_SPEED = 10.0  # camera.rs:18 MOVE_SPEED
ROTATE_SPEED = 1.0  # camera.rs:19 (radians/sec of accumulated mouse)


@dataclasses.dataclass
class Controls:
    """Input state — the Controls resource analog (camera.rs:61-88)."""

    move_x: float = 0.0  # A/D
    move_y: float = 0.0  # Shift/Space
    move_z: float = 0.0  # S/W
    look_dx: float = 0.0  # mouse delta (RMB held)
    look_dy: float = 0.0

    def consume(self):
        d = (self.look_dx, self.look_dy)
        self.look_dx = 0.0
        self.look_dy = 0.0
        return d

    @property
    def moving(self) -> bool:
        return any(
            abs(v) > 1e-9
            for v in (self.move_x, self.move_y, self.move_z, self.look_dx, self.look_dy)
        )


class Viewer:
    """Progressive renderer with camera control and accumulation reset."""

    def __init__(
        self,
        frame_fn: Callable,  # (film, camera, frame_index) -> (film, display)
        cam: camera_mod.Camera,
        settings: RenderSettings,
        frames_in_flight: int = 3,
        preview=None,  # app.preview.PreviewServer (started) or None
    ):
        self.frame_fn = frame_fn
        self.cam = cam
        self.settings = settings
        self.controls = Controls()
        self.film = film_mod.Film.create(settings.height, settings.width)
        self.frame_index = 0
        self.frames_in_flight = frames_in_flight
        self.preview = preview
        self._inflight: deque = deque()
        self._timings: deque = deque(maxlen=60)
        self._last_display = None

    def update_camera(self, dt: float) -> bool:
        """editor_camera analog (camera.rs:127-178). Returns True if moved."""
        c = self.controls
        if not c.moving:
            return False
        yaw, pitch = c.consume()
        self.cam = camera_mod.orbit_camera(
            self.cam,
            jnp.asarray(-yaw * ROTATE_SPEED),
            jnp.asarray(-pitch * ROTATE_SPEED),
            jnp.asarray([c.move_x, c.move_y, c.move_z], jnp.float32),
            jnp.asarray(dt, jnp.float32),
        )
        return True

    def step(self, dt: float = 1 / 60):
        """One frame: input → (maybe) reset accumulation → async submit."""
        if self.update_camera(dt):
            # Moving camera restarts the integral (config 5 behavior).
            self.film = film_mod.reset(self.film)
        t0 = time.perf_counter()
        self.film, display = self.frame_fn(
            self.film, self.cam, jnp.uint32(self.frame_index)
        )
        self.frame_index += 1
        self._inflight.append((display, t0))
        # Keep at most frames_in_flight dispatches queued (async pipelining).
        while len(self._inflight) > self.frames_in_flight:
            disp, t_submit = self._inflight.popleft()
            jax.block_until_ready(disp)
            self._timings.append(time.perf_counter() - t_submit)
            self._last_display = disp
            self._maybe_publish(disp)
        return display

    def _maybe_publish(self, disp):
        """Push a completed frame to the MJPEG preview — only when a client
        is connected AND the rate limiter allows, so unattended renders never
        pay the device→host pull (it can cost ~1 s through the tunnel)."""
        if self.preview is not None and self.preview.wants_frame():
            from raytracer3_tpu.utils import runtime

            self.preview.publish(
                runtime.pull_guarded(disp, timeout=60.0, what="preview pull")
            )

    def drain(self):
        """Block on all in-flight frames; returns the newest display (the
        last drained, or the last previously completed one — a second drain
        with nothing in flight must not lose the frame for `save`)."""
        disp = None
        while self._inflight:
            disp, t_submit = self._inflight.popleft()
            jax.block_until_ready(disp)
            self._timings.append(time.perf_counter() - t_submit)
        if disp is not None:
            self._last_display = disp
            self._maybe_publish(disp)
        return self._last_display

    @property
    def fps(self) -> float:
        if not self._timings:
            return 0.0
        return 1.0 / (sum(self._timings) / len(self._timings))


def make_default_frame_fn(
    scene, settings: RenderSettings, intersect_fn=None, occluded_fn=None,
    backend=None, denoise: bool = False,
):
    """Standard progressive frame: wavefront PT + film blend + AgX display.

    denoise=True filters shallow-accumulation frames with the edge-aware
    à-trous pass (render/denoise.py) — the frames right after a camera move
    reset display smooth instead of raw 1-spp noise.

    Prefer ``backend=`` (TraceBackend): scene + BVH tables then cross the jit
    boundary as arguments (ops/backend.py)."""
    from raytracer3_tpu.render import wavefront

    @jax.jit
    def _frame(scene_, bvh, film, cam, fi):
        if backend is not None:
            isect, occl = backend.bind(bvh)
        else:
            isect, occl = intersect_fn, occluded_fn
        out = wavefront.render_frame(
            scene_, cam, settings, fi, isect, occl,
            sort_rays=backend is not None and not backend.self_sorting,
            return_gbuffer=denoise,
        )
        if denoise:
            from raytracer3_tpu.render import denoise as dn

            radiance, (gd, gn) = out
            film2 = film_mod.accumulate_progressive(film, radiance)
            filt = dn.atrous_filter(film2.accum, gd, gn)
            s = dn.denoise_strength(film2.frame_index)
            display = postprocess.postprocess(
                film2.accum + (filt - film2.accum) * s
            )
        else:
            film2 = film_mod.accumulate_progressive(film, out)
            display = postprocess.postprocess(film2.accum)
        return film2, display

    bvh = None if backend is None else backend.arrays

    def frame(film, cam, fi):
        return _frame(scene, bvh, film, cam, fi)

    return frame


class InteractiveSession:
    """Line-protocol interactive loop — the winit-event analog
    (src/components/camera.rs:90-125: RMB grab → mouse look, WASD keys).

    Commands (one per line on the input stream):

      move <x> <y> <z>     set continuous move state (A/D, Shift/Space, S/W)
      look <dx> <dy>       accumulate a mouse-look delta (radians-ish)
      stop                 zero the move state
      reset                reset film accumulation
      set <knob> <value>   change a RenderSettings knob via the tuner
                           (static knobs recompile, like the Constants Editor)
      save <path>          write the current display to a PNG
      stats                emit a JSON status line
      quit                 drain and exit

    Every frame emits nothing; `stats` (and exit) emit a JSON line
    {"frame": n, "fps": f, "spp": n_accum}. Run it:

      python -m raytracer3_tpu.app.viewer --width 960 --height 544
    """

    def __init__(self, viewer: Viewer, rebuild=None):
        self.viewer = viewer
        self.rebuild = rebuild  # optional: (settings) -> new frame_fn

    def status(self) -> dict:
        v = self.viewer
        return {
            "frame": v.frame_index,
            "fps": round(v.fps, 2),
            "spp": int(v.film.frame_index),
        }

    def handle(self, line: str) -> bool:
        """Apply one command; returns False on quit."""
        import json as json_mod

        v = self.viewer
        parts = line.strip().split()
        if not parts:
            return True
        cmd, args = parts[0], parts[1:]
        if cmd == "quit":
            return False
        elif cmd == "move":
            v.controls.move_x, v.controls.move_y, v.controls.move_z = (
                float(args[0]), float(args[1]), float(args[2])
            )
        elif cmd == "look":
            v.controls.look_dx += float(args[0])
            v.controls.look_dy += float(args[1])
        elif cmd == "stop":
            v.controls.move_x = v.controls.move_y = v.controls.move_z = 0.0
        elif cmd == "reset":
            v.film = film_mod.reset(v.film)
        elif cmd == "set" and self.rebuild is not None:
            from raytracer3_tpu.app import tuner as tuner_mod

            knobs = tuner_mod.SettingsTuner(v.settings)
            new_settings, _ = knobs.apply(" ".join(args))
            if knobs.consume_recompile_flag():
                v.settings = new_settings
                v.frame_fn = self.rebuild(v.settings)
                v.film = film_mod.Film.create(
                    v.settings.height, v.settings.width
                )
                v.frame_index = 0
        elif cmd == "preview":
            # Start (or report) the MJPEG-over-HTTP live sink.
            from raytracer3_tpu.app import preview as preview_mod

            if v.preview is None:
                port = int(args[0]) if args else 8787
                v.preview = preview_mod.PreviewServer(port=port).start()
            print(
                json_mod.dumps({"preview_port": v.preview.port}), flush=True
            )
        elif cmd == "save":
            disp = v.drain()
            if disp is not None:
                from raytracer3_tpu.utils import runtime

                image_io.write_png(
                    args[0],
                    runtime.pull_guarded(disp, what="save-display pull"),
                )
        elif cmd == "stats":
            print(json_mod.dumps(self.status()), flush=True)
        return True

    def run(self, stream=None, max_frames: Optional[int] = None):
        """Pump frames, applying commands as they arrive (non-blocking)."""
        import json as json_mod
        import select
        import sys

        stream = stream if stream is not None else sys.stdin
        last = time.perf_counter()
        while max_frames is None or self.viewer.frame_index < max_frames:
            # Drain pending commands without blocking the frame loop.
            while True:
                r, _, _ = select.select([stream], [], [], 0)
                if not r:
                    break
                line = stream.readline()
                if not line or not self.handle(line):
                    self.viewer.drain()
                    print(json_mod.dumps(self.status()), flush=True)
                    return
            now = time.perf_counter()
            self.viewer.step(dt=now - last)
            last = now
        self.viewer.drain()
        print(json_mod.dumps(self.status()), flush=True)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description="Interactive progressive viewer")
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=544)
    ap.add_argument("--bounces", type=int, default=4)
    ap.add_argument("--detail", type=int, default=2)
    ap.add_argument("--glb", type=str, default=None, help="render a GLB scene")
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--backend", type=str, default="auto")
    ap.add_argument(
        "--preview-port", type=int, default=None,
        help="serve a live MJPEG preview on this port (0 = auto-pick)",
    )
    ap.add_argument(
        "--denoise", action="store_true",
        help="edge-aware a-trous filter on shallow-accumulation frames",
    )
    args = ap.parse_args(argv)

    from raytracer3_tpu.app import world as world_mod
    from raytracer3_tpu.scene import procedural
    from raytracer3_tpu.utils import runtime

    runtime.init_compilation_cache()
    w = world_mod.World()
    if args.glb:
        from raytracer3_tpu.scene import assets

        md = assets.load_glb_cached(args.glb)
        w.spawn(w.add_mesh_data(md), name="glb")
    else:
        kw = procedural.atrium(detail=args.detail)
        import numpy as _np

        for i in range(len(kw["base_color"])):
            w.add_material(
                kw["base_color"][i], kw["emission"][i],
                kw["metallic"][i], kw["roughness"][i],
            )
        w.spawn(
            w.add_mesh(
                kw["positions"], kw["normals"], kw["uvs"], kw["indices"],
                kw["geo_id"],
            ),
            name="atrium",
        )
        w.env_map = procedural.sky_equirect(256, 512)
    scene = w.scene()
    backend = w.trace_backend(args.backend)
    cam = procedural.atrium_camera(aspect=args.width / args.height)

    settings = RenderSettings(
        width=args.width, height=args.height, bounces=args.bounces, samples=1,
        radiance_clamp=50.0,
    )

    def rebuild(s):
        return make_default_frame_fn(
            scene, s, backend=backend, denoise=args.denoise
        )

    preview = None
    if args.preview_port is not None:
        from raytracer3_tpu.app import preview as preview_mod

        preview = preview_mod.PreviewServer(port=args.preview_port).start()
        print(f'{{"preview_port": {preview.port}}}', flush=True)
    viewer = Viewer(rebuild(settings), cam, settings, preview=preview)
    InteractiveSession(viewer, rebuild=rebuild).run(max_frames=args.frames)


def render_offline(
    scene,
    cam: camera_mod.Camera,
    settings: RenderSettings,
    intersect_fn,
    occluded_fn=None,
    n_frames: int = 64,
    out_path: Optional[str] = None,
    camera_path: Optional[Callable[[int], camera_mod.Camera]] = None,
) -> np.ndarray:
    """Offline progressive render (optionally with an animated camera path
    that resets accumulation), returning the final display image."""
    frame = make_default_frame_fn(scene, settings, intersect_fn, occluded_fn)
    viewer = Viewer(frame, cam, settings)
    display = None
    for i in range(n_frames):
        if camera_path is not None:
            new_cam = camera_path(i)
            if new_cam is not None:
                viewer.cam = new_cam
                viewer.film = film_mod.reset(viewer.film)
        display = viewer.step()
    display = viewer.drain()
    img = np.asarray(display)
    if out_path:
        image_io.write_png(out_path, img)
    return img


if __name__ == "__main__":
    main()
