"""Checkpoint / resume for renderer state.

The reference's only persistence is the processed-asset cache
(SURVEY.md §5 'Checkpoint / resume'); its progressive accumulation buffer is
an in-GPU-memory resume of the integral. The TPU framework adds real
save/restore: the film (accumulated radiance + frame count), probe state, and
camera serialize to a single .npz so a long progressive render (or a
preempted TPU job) can resume exactly where it stopped.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from raytracer3_tpu.render import camera as camera_mod
from raytracer3_tpu.render import film as film_mod

FORMAT_VERSION = 1


def save(path: str, film: film_mod.Film, cam: camera_mod.Camera, probe_state=None, extra: Optional[dict] = None):
    arrays = {
        "__version__": np.asarray(FORMAT_VERSION),
        "film.accum": np.asarray(film.accum),
        "film.frame_index": np.asarray(film.frame_index),
    }
    for i, field in enumerate(cam._fields):
        arrays[f"camera.{field}"] = np.asarray(cam[i])
    if probe_state is not None:
        for i, field in enumerate(probe_state._fields):
            arrays[f"probes.{field}"] = np.asarray(probe_state[i])
    for k, v in (extra or {}).items():
        arrays[f"extra.{k}"] = np.asarray(v)
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp, path)


def load(path: str):
    """Returns (film, camera, probe_state_or_None, extra_dict)."""
    z = np.load(path, allow_pickle=False)
    version = int(z["__version__"])
    if version != FORMAT_VERSION:
        raise ValueError(f"checkpoint version {version} != {FORMAT_VERSION}")
    film = film_mod.Film(
        accum=jnp.asarray(z["film.accum"]),
        frame_index=jnp.asarray(z["film.frame_index"]),
    )
    cam = camera_mod.Camera(
        *(jnp.asarray(z[f"camera.{f}"]) for f in camera_mod.Camera._fields)
    )
    probe_state = None
    if "probes.atlas" in z.files:
        from raytracer3_tpu.render import probes as probes_mod

        probe_state = probes_mod.ProbeState(
            *(jnp.asarray(z[f"probes.{f}"]) for f in probes_mod.ProbeState._fields)
        )
    extra = {
        k[len("extra."):]: z[k] for k in z.files if k.startswith("extra.")
    }
    return film, cam, probe_state, extra
