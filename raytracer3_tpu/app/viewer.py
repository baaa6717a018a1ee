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
    ):
        self.frame_fn = frame_fn
        self.cam = cam
        self.settings = settings
        self.controls = Controls()
        self.film = film_mod.Film.create(settings.height, settings.width)
        self.frame_index = 0
        self.frames_in_flight = frames_in_flight
        self._inflight: deque = deque()
        self._timings: deque = deque(maxlen=60)

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
        return display

    def drain(self):
        disp = None
        while self._inflight:
            disp, t_submit = self._inflight.popleft()
            jax.block_until_ready(disp)
            self._timings.append(time.perf_counter() - t_submit)
        return disp

    @property
    def fps(self) -> float:
        if not self._timings:
            return 0.0
        return 1.0 / (sum(self._timings) / len(self._timings))


def make_default_frame_fn(scene, settings: RenderSettings, intersect_fn, occluded_fn):
    """Standard progressive frame: wavefront PT + film blend + AgX display."""
    from raytracer3_tpu.render import wavefront

    @jax.jit
    def frame(film, cam, fi):
        radiance = wavefront.render_frame(
            scene, cam, settings, fi, intersect_fn, occluded_fn
        )
        film2 = film_mod.accumulate_progressive(film, radiance)
        display = postprocess.postprocess(film2.accum)
        return film2, display

    return frame


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
