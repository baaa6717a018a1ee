"""Multi-HOST (DCN) dry-run of the production render path.

The single-host dry-run (__graft_entry__.dryrun_multichip) shards over one
process's 8 virtual devices — pure ICI. This tool validates the OTHER half of
SURVEY.md §2.3's distributed row: a multi-process mesh where collectives and
film assembly cross a process boundary (the DCN analog), using JAX's
distributed runtime with Gloo CPU collectives.

    python tools/dryrun_multihost.py            # launch: spawn 2 workers,
                                                # compare vs single-process
    python tools/dryrun_multihost.py --pid N    # internal: worker process

Topology: 2 processes × 4 local CPU devices = one flat 8-device "tiles"
mesh. Image rows shard across ALL 8 devices, so rows 4..7 live on process 1
and the fully-addressable-array gather at the end is real cross-host traffic.
The traced path is the PRODUCTION one: treelet tables (interpret-mode Pallas
packet kernel) through render_wavefront_tiled — per-pixel RNG is derived from
global pixel ids, so the multi-host image must match a single-process render
bit-for-bit.

On real TPU pods the same code runs with jax.distributed.initialize() per
host and devices = jax.devices() (ICI within a slice, DCN across slices);
utils/runtime.init_distributed wires that entry point.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COORD = "127.0.0.1:9923"
NPROC = 2
LOCAL_DEVICES = 4
W, H = 64, 32
BOUNCES = 2


def _setup_jax(local_devices: int):
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={local_devices}"
    )
    return jax


def _build_case():
    """Tiny deterministic scene + settings shared by worker and reference."""
    import numpy as np

    from raytracer3_tpu.ops import treelets
    from raytracer3_tpu.scene import procedural
    from raytracer3_tpu.utils.config import RenderSettings

    scene, host = procedural.atrium_scene(
        detail=1, with_sky=True, return_host=True
    )
    tt = treelets.build_treelets_host(
        host[0].astype(np.float32), host[1].astype(np.float32),
        host[2].astype(np.float32), leaf_size=4, width=8, max_tris=1024,
    )
    backend = treelets.treelet_backend(
        host_tris=host, leaf_size=4, width=8, max_tris=1024,
        sublanes=8, interpret=True,
    )
    del tt
    settings = RenderSettings(
        width=W, height=H, bounces=BOUNCES, samples=1, radiance_clamp=20.0
    )
    cam = procedural.atrium_camera(aspect=W / H)
    return scene, backend, settings, cam


def run_worker(pid: int):
    jax = _setup_jax(LOCAL_DEVICES)
    jax.distributed.initialize(
        coordinator_address=COORD, num_processes=NPROC, process_id=pid
    )
    import numpy as np

    from raytracer3_tpu.parallel import mesh as pmesh

    assert len(jax.devices()) == NPROC * LOCAL_DEVICES
    scene, backend, settings, cam = _build_case()
    mesh = pmesh.make_render_mesh()  # all 8 global devices
    img = pmesh.render_wavefront_tiled(
        scene, cam, settings, 0, backend.arrays, backend.intersect_fn,
        occluded_fn=backend.occluded_fn, mesh=mesh,
    )
    # Cross-host gather: every process materializes the full film (rows
    # 4..7 live on process 1, so this is real cross-process traffic).
    from jax.experimental import multihost_utils

    full = np.asarray(multihost_utils.process_allgather(img, tiled=True))
    if pid == 0:
        np.save("/tmp/mh_img.npy", full.reshape(H, W, 3))
        print(f"[p0] saved multihost image {full.shape}", flush=True)
    print(f"[p{pid}] done", flush=True)


def run_reference():
    _setup_jax(1)
    import numpy as np

    from raytracer3_tpu.render import wavefront

    scene, backend, settings, cam = _build_case()
    isect, occl = backend.bind(backend.arrays)
    img = wavefront.render_frame(
        scene, cam, settings, 0, isect, occl, tile_primaries=False,
    )
    return np.asarray(img)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, default=None)
    args = ap.parse_args()
    if args.pid is not None:
        run_worker(args.pid)
        return

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--pid", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(NPROC)
    ]
    logs = [p.communicate()[0] for p in procs]
    for i, (p, lg) in enumerate(zip(procs, logs)):
        if p.returncode != 0:
            print(lg)
            raise SystemExit(f"worker {i} failed rc={p.returncode}")
    import numpy as np

    mh = np.load("/tmp/mh_img.npy")
    ref = run_reference()
    if not np.allclose(mh, ref, atol=1e-5):
        bad = np.abs(mh - ref).max()
        raise SystemExit(f"multihost image differs from single-process: {bad}")
    print(
        f"MULTIHOST ok: {NPROC} processes x {LOCAL_DEVICES} devices, "
        f"{W}x{H}x{BOUNCES}b wavefront bit-compatible with single-process"
    )


if __name__ == "__main__":
    main()
