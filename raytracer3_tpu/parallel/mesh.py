"""Device-mesh parallel rendering.

The reference is single-process/single-GPU (SURVEY.md §2.3); its only
"multi-lane" concurrency is three Vulkan queues. The TPU framework scales the
renderer across chips the JAX way:

- **Pixel/tile data parallelism**: the image rows are sharded over the mesh
  axis; every chip traces its own pixel block against a *replicated* scene
  (scene + BVH are read-only — the bindless-heap analog replicates cleanly).
- **Sample parallelism**: in progressive mode each chip can instead render the
  *whole* image with decorrelated sample seeds, psum-merging film buffers
  (used when per-chip pixel blocks get too small to saturate the VPU).
- Collectives ride ICI via `shard_map` + `jax.lax.psum`; nothing here talks
  NCCL/MPI — XLA inserts the transfers.

Tested on a virtual 8-device CPU mesh (tests/conftest.py) and dry-run by the
driver via __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from raytracer3_tpu.ops import rng
from raytracer3_tpu.render import camera as camera_mod
from raytracer3_tpu.render import film as film_mod
from raytracer3_tpu.render import pathtracer
from raytracer3_tpu.scene import types as scene_types
from raytracer3_tpu.utils.config import RenderSettings


def make_render_mesh(devices=None, axis: str = "tiles") -> Mesh:
    """1D render mesh over all (or given) devices."""
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis,))


def render_tiled(
    scene: scene_types.Scene,
    cam: camera_mod.Camera,
    settings: RenderSettings,
    frame_index,
    intersect_fn: pathtracer.IntersectFn,
    occluded_fn=None,
    mesh: Mesh | None = None,
    axis: str = "tiles",
) -> jax.Array:
    """Render one frame with image rows sharded over the mesh axis.

    Each shard generates its own primary rays from its global pixel coords
    (passed in sharded, so lanes know their true pixel ids and the per-pixel
    RNG matches the single-chip result bit-for-bit), traces independently
    against the replicated scene, and writes its slice of the film. No
    cross-chip traffic during tracing; the film gather happens only if the
    caller reassembles on one host.
    """
    mesh = mesh or make_render_mesh(axis=axis)
    w, h = settings.width, settings.height
    n_dev = mesh.shape[axis]
    assert h % n_dev == 0, f"height {h} must divide across {n_dev} devices"

    pix = camera_mod.pixel_grid(w, h).reshape(h, w, 2)

    def shard_fn(pix_rows):
        hs = pix_rows.shape[0]
        p = pix_rows.reshape(-1, 2)
        sampler = rng.Sampler.from_pixels(p, frame_index)
        uj, sampler = sampler.next2()
        o, d = camera_mod.primary_rays(cam, w, h, jitter=uj, pixel_xy=p)
        gbuf = pathtracer.trace_gbuffer(scene, intersect_fn, o, d)
        radiance = pathtracer.trace_radiance(
            scene, intersect_fn, o, d, gbuf, sampler, settings, occluded_fn
        )
        env = pathtracer._sample_env(scene, d)
        radiance = jnp.where(gbuf.hit[:, None], radiance, env)
        return radiance.reshape(hs, w, 3)

    shard = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=P(axis),
        out_specs=P(axis),
        check_vma=False,
    )
    return shard(pix)


def render_sample_parallel(
    scene: scene_types.Scene,
    cam: camera_mod.Camera,
    settings: RenderSettings,
    frame_index,
    intersect_fn: pathtracer.IntersectFn,
    occluded_fn=None,
    mesh: Mesh | None = None,
    axis: str = "tiles",
) -> jax.Array:
    """Progressive sample parallelism: every chip renders the full image with
    a decorrelated frame seed; psum over the mesh averages the estimates.
    Effective samples/frame = n_devices × settings.samples."""
    mesh = mesh or make_render_mesh(axis=axis)
    n_dev = mesh.shape[axis]

    def shard_fn(_token):
        shard_id = jax.lax.axis_index(axis).astype(jnp.uint32)
        fi = jnp.uint32(frame_index) * jnp.uint32(n_dev) + shard_id
        img = pathtracer.render_image(
            scene, cam, settings, fi, intersect_fn, occluded_fn
        )
        return jax.lax.psum(img, axis) / n_dev

    token = jnp.zeros((n_dev, 1), jnp.float32)
    shard = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=P(axis),
        out_specs=P(),
        check_vma=False,
    )
    return shard(token)


def progressive_step_tiled(
    scene: scene_types.Scene,
    cam: camera_mod.Camera,
    settings: RenderSettings,
    intersect_fn: pathtracer.IntersectFn,
    occluded_fn=None,
    mesh: Mesh | None = None,
    axis: str = "tiles",
) -> Callable:
    """Build the full per-frame *step* (render + film blend) with the film
    sharded row-wise and donated across frames — the multi-chip analog of the
    reference's per-frame graph execution + PrevLight blend (SURVEY.md §3.2,
    §3.5). Returns step(film, frame_index) -> film."""
    mesh = mesh or make_render_mesh(axis=axis)
    film_sharding = NamedSharding(mesh, P(axis))

    # Scene crosses the jit boundary as an ARGUMENT (ops/backend.py: jit
    # closures over device arrays pay a host round-trip per dispatch on
    # tunneled runtimes); film is donated across frames.
    @partial(jax.jit, donate_argnums=1)
    def _step(scene_, film: film_mod.Film, frame_index) -> film_mod.Film:
        radiance = render_tiled(
            scene_, cam, settings, frame_index, intersect_fn, occluded_fn,
            mesh=mesh, axis=axis,
        )
        return film_mod.accumulate_progressive(film, radiance)

    def step(film: film_mod.Film, frame_index) -> film_mod.Film:
        return _step(scene, film, frame_index)

    def init_film() -> film_mod.Film:
        f = film_mod.Film.create(settings.height, settings.width)
        accum = jax.device_put(f.accum, film_sharding)
        return film_mod.Film(accum=accum, frame_index=f.frame_index)

    return step, init_film


def render_wavefront_tiled(
    scene: scene_types.Scene,
    cam: camera_mod.Camera,
    settings: RenderSettings,
    frame_index,
    backend_arrays,
    intersect_fn,
    occluded_fn=None,
    mesh: Mesh | None = None,
    axis: str = "tiles",
    sort_rays: bool = False,
    capped_fn=None,
    return_stats: bool = False,
) -> jax.Array:
    """The PRODUCTION wavefront renderer sharded row-wise over the mesh:
    each chip owns an image-row block, builds its ray queue from global pixel
    ids (per-pixel RNG matches single-chip), and traces through the real
    traversal backend — packet kernel, treelets, or TLAS — whose tables ride
    along REPLICATED (in_specs P()), the bindless-heap analog. No cross-chip
    traffic during tracing.

    intersect_fn/occluded_fn follow the TraceBackend convention:
    fn(arrays, o, d[, t_max]) with `arrays` the backend's table pytree.
    capped_fn (TraceBackend.capped_fn) + settings.fuse_shadow enables the
    fused shadow+bounce launch per bounce (render/wavefront.py fused_fn).
    return_stats=True additionally returns the per-shard measured traced-ray
    counts [n_dev] — the load-balance evidence for the tile sharding
    (dryrun_multichip asserts the shards stay within a small spread).
    """
    from raytracer3_tpu.render import wavefront

    mesh = mesh or make_render_mesh(axis=axis)
    w, h = settings.width, settings.height
    n_dev = mesh.shape[axis]
    assert h % n_dev == 0, f"height {h} must divide across {n_dev} devices"

    pix = camera_mod.pixel_grid(w, h).reshape(h, w, 2)

    def shard_fn(pix_rows, arrays, scene_):
        hs = pix_rows.shape[0]
        p = pix_rows.reshape(-1, 2)
        n = p.shape[0]
        isect = lambda o, d: intersect_fn(arrays, o, d)
        occl = (
            None
            if occluded_fn is None
            else (lambda o, d, t: occluded_fn(arrays, o, d, t))
        )
        sampler = rng.Sampler.from_pixels(p, frame_index)
        uj, sampler = sampler.next2()
        o, d = camera_mod.primary_rays(cam, w, h, jitter=uj, pixel_xy=p)
        hit0 = isect(o, d)
        q = wavefront.RayQueue(
            origin=o,
            direction=d,
            throughput=jnp.ones((n, 3), jnp.float32),
            radiance=jnp.zeros((n, 3), jnp.float32),
            pixel_id=(p[:, 1] * w + p[:, 0]).astype(jnp.int32),
            alive=hit0.hit,
            prev_pdf=jnp.full((n,), 1e8, jnp.float32),
            depth=hit0.t,
            prim_id=hit0.prim_id,
            uv=hit0.uv,
            inst=hit0.inst,
        )
        fused = (
            (lambda o, d, t, anyhit=None: capped_fn(arrays, o, d, t, anyhit))
            if (capped_fn is not None and settings.fuse_shadow)
            else None
        )
        q, traced = wavefront.trace_wavefront(
            scene_, isect, q, sampler, settings, occl, sort_rays,
            fused_fn=fused,
        )
        radiance = q.radiance
        if settings.radiance_clamp > 0.0:
            radiance = jnp.minimum(radiance, settings.radiance_clamp)
        env = pathtracer._sample_env(scene_, d)
        radiance = radiance + jnp.where(~hit0.hit[:, None], env, 0.0)
        out = radiance.reshape(hs, w, 3)
        if return_stats:
            return out, (traced + jnp.int32(n))[None]  # + primaries
        return out

    shard = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis), P(), P()),
        out_specs=(P(axis), P(axis)) if return_stats else P(axis),
        check_vma=False,
    )
    return shard(pix, backend_arrays, scene)


def probe_gi_sample_parallel(
    scene: scene_types.Scene,
    settings: RenderSettings,
    cam: camera_mod.Camera,
    backend,
    n_frames: int = 2,
    mesh: Mesh | None = None,
    axis: str = "tiles",
    pipeline: str = "probe",
) -> jax.Array:
    """Probe-GI pipeline under sample parallelism: every chip runs the full
    probe pipeline with a decorrelated seed stream; the display estimates
    psum-average over the mesh. (The probe passes have cross-probe reads —
    interpolation touches 4 neighbors — so row-sharding would need halos;
    sample parallelism shards the Monte-Carlo axis instead.)

    pipeline: "probe" (legacy parity mode) or "hybrid" (probes+PT)."""
    from raytracer3_tpu.render import pipelines

    mesh = mesh or make_render_mesh(axis=axis)
    n_dev = mesh.shape[axis]
    factory = (
        pipelines.hybrid_gi_pipeline
        if pipeline == "hybrid"
        else pipelines.probe_gi_pipeline
    )

    def shard_fn(_token):
        shard_id = jax.lax.axis_index(axis).astype(jnp.uint32)
        step, init_state = factory(scene, settings, backend=backend)
        state = init_state()
        disp = None
        for i in range(n_frames):
            fi = jnp.uint32(i) * jnp.uint32(n_dev) + shard_id
            disp, state = step(state, cam=cam, frame_index=fi)
        return jax.lax.psum(disp, axis) / n_dev

    token = jnp.zeros((n_dev, 1), jnp.float32)
    shard = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=P(axis),
        out_specs=P(),
        check_vma=False,
    )
    return shard(token)
