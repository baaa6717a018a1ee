"""Camera: view/projection matrices and primary-ray generation.

TPU-native counterpart of the reference Camera component
(``src/components/camera.rs:23-58``: position/direction/fov/aspect/near/far,
look_at_rh view, perspective_rh projection) and of the shader-side primary-ray
setup (``shaders/include/gbuffer_helpers.slang:80-105``:
``view_dir``/``setupPrimaryRay`` reconstruct world rays through the inverse
clip→view→world chain).

The camera is a pytree; ray generation is one fused batched computation over
the whole pixel grid.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from raytracer3_tpu.ops import mathx


class Camera(NamedTuple):
    position: jax.Array  # [3]
    direction: jax.Array  # [3] unit forward
    fov_y: jax.Array  # scalar, radians (ref: 65° default, main.rs:70)
    aspect: jax.Array  # scalar, width/height
    near: jax.Array  # scalar (ref 0.1)
    far: jax.Array  # scalar (ref 1000.0)

    @staticmethod
    def create(
        position=(0.0, 0.0, -1.0),
        direction=(0.0, 0.0, 1.0),
        fov_y_deg=65.0,
        aspect=1920.0 / 1088.0,
        near=0.1,
        far=1000.0,
    ) -> "Camera":
        d = jnp.asarray(direction, jnp.float32)
        return Camera(
            position=jnp.asarray(position, jnp.float32),
            direction=d / jnp.linalg.norm(d),
            fov_y=jnp.asarray(jnp.deg2rad(fov_y_deg), jnp.float32),
            aspect=jnp.asarray(aspect, jnp.float32),
            near=jnp.asarray(near, jnp.float32),
            far=jnp.asarray(far, jnp.float32),
        )

    def basis(self) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Right-handed camera basis (right, up, forward), world up = +y
        (camera.rs:41 look_at uses Vec3::Y up)."""
        fwd = self.direction
        world_up = jnp.asarray([0.0, 1.0, 0.0], fwd.dtype)
        right = mathx.normalize(jnp.cross(fwd, world_up))
        up = jnp.cross(right, fwd)
        return right, up, fwd

    def view_matrix(self) -> jax.Array:
        """Right-handed look-at (camera.rs:38-44): world → view, camera looks
        down -z in view space."""
        right, up, fwd = self.basis()
        r = jnp.stack([right, up, -fwd])  # rows
        t = -r @ self.position
        m = jnp.eye(4, dtype=jnp.float32)
        m = m.at[:3, :3].set(r)
        m = m.at[:3, 3].set(t)
        return m

    def projection_matrix(self) -> jax.Array:
        """Right-handed perspective, depth 0..1 (camera.rs:46-57)."""
        f = 1.0 / jnp.tan(self.fov_y * 0.5)
        n, fa = self.near, self.far
        m = jnp.zeros((4, 4), jnp.float32)
        m = m.at[0, 0].set(f / self.aspect)
        m = m.at[1, 1].set(f)
        m = m.at[2, 2].set(fa / (n - fa))
        m = m.at[2, 3].set(n * fa / (n - fa))
        m = m.at[3, 2].set(-1.0)
        return m

    def matrices(self):
        """(proj, view, proj_inverse, view_inverse) — the four GConst matrices
        (renderer/mod.rs:47-63)."""
        view = self.view_matrix()
        proj = self.projection_matrix()
        return proj, view, jnp.linalg.inv(proj), jnp.linalg.inv(view)


def pixel_grid(width: int, height: int) -> jax.Array:
    """Integer pixel coords [H*W, 2] in x-fastest order."""
    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.int32),
        jnp.arange(width, dtype=jnp.int32),
        indexing="ij",
    )
    return jnp.stack([xs.ravel(), ys.ravel()], axis=-1)


def primary_rays(
    camera: Camera,
    width: int,
    height: int,
    jitter: jax.Array | None = None,
    pixel_xy: jax.Array | None = None,
):
    """Generate camera rays through pixel centers (+ optional subpixel
    jitter in [0,1)²) — the ``setupPrimaryRay`` analog
    (gbuffer_helpers.slang:93-105). Returns (origins [N,3], directions [N,3]).

    Instead of multiplying every pixel by the 4×4 inverse matrices (as the
    shader does per-thread), the ray direction is formed directly from the
    camera basis — same result, fewer flops, and XLA fuses it into the
    intersection kernel.
    """
    if pixel_xy is None:
        pixel_xy = pixel_grid(width, height)
    p = pixel_xy.astype(jnp.float32)
    offset = 0.5 if jitter is None else jitter
    uv = (p + offset) / jnp.asarray([width, height], jnp.float32)
    ndc = uv * 2.0 - 1.0

    right, up, fwd = camera.basis()
    tan_half = jnp.tan(camera.fov_y * 0.5)
    # NDC y points down in pixel space → flip.
    d = (
        fwd[None, :]
        + ndc[:, 0:1] * tan_half * camera.aspect * right[None, :]
        - ndc[:, 1:2] * tan_half * up[None, :]
    )
    d = mathx.normalize(d)
    o = jnp.broadcast_to(camera.position, d.shape)
    return o, d


def orbit_camera(camera: Camera, yaw_delta, pitch_delta, move_local, dt) -> Camera:
    """Editor camera update — the ``editor_camera`` analog
    (components/camera.rs:127-178): quaternion-free yaw/pitch orbit plus
    local-frame WASD movement at 10 u/s (camera.rs:18 MOVE_SPEED)."""
    move_speed = 10.0
    right, up, fwd = camera.basis()

    # Yaw around world +y, pitch around camera right.
    cy, sy = jnp.cos(yaw_delta), jnp.sin(yaw_delta)
    f1 = jnp.stack(
        [cy * fwd[0] + sy * fwd[2], fwd[1], -sy * fwd[0] + cy * fwd[2]]
    )
    right1 = mathx.normalize(jnp.cross(f1, jnp.asarray([0.0, 1.0, 0.0])))
    cp, sp = jnp.cos(pitch_delta), jnp.sin(pitch_delta)
    f2 = mathx.normalize(cp * f1 + sp * jnp.cross(right1, f1) * -1.0)
    # Clamp away from the poles.
    f2 = mathx.normalize(
        jnp.where(jnp.abs(f2[1]) > 0.99, f1, f2)
    )

    delta = (
        move_local[0] * right
        + move_local[1] * up
        + move_local[2] * fwd
    ) * (move_speed * dt)
    return camera._replace(position=camera.position + delta, direction=f2)
