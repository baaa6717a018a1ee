"""Runtime/device layer helpers — the Vulkan Context analog
(src/renderer/vulkan/mod.rs:44-403) reduced to what a JAX process needs:
device discovery/reporting, the persistent XLA compilation cache (the
PipelineCache analog: pipeline_cache/mod.rs caches compiled pipelines keyed
by shader — XLA's disk cache does the same for jitted programs, which matters
here because renderer compiles take 30-100 s on TPU), and multi-host
initialization for DCN slices.
"""

from __future__ import annotations

import dataclasses
import os

import jax


@dataclasses.dataclass(frozen=True)
class DeviceInfo:
    platform: str
    device_kind: str
    num_devices: int
    num_hosts: int
    memory_per_device: int | None


def init_compilation_cache(cache_dir: str | None = None) -> str:
    """Enable the persistent XLA compilation cache (PipelineCache analog)."""
    d = cache_dir or os.environ.get(
        "RT3_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "raytracer3_tpu", "xla"),
    )
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return d


def init_distributed(coordinator: str | None = None, num_processes: int | None = None, process_id: int | None = None):
    """Multi-host (DCN) initialization — call once per host before device use
    (the first-class distributed backend the reference lacks, SURVEY.md §5)."""
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def device_info() -> DeviceInfo:
    devs = jax.devices()
    mem = None
    try:
        stats = devs[0].memory_stats()
        if stats:
            mem = stats.get("bytes_limit")
    except Exception:
        pass
    return DeviceInfo(
        platform=jax.default_backend(),
        device_kind=devs[0].device_kind if devs else "none",
        num_devices=len(devs),
        num_hosts=jax.process_count(),
        memory_per_device=mem,
    )


def describe() -> str:
    i = device_info()
    mem = f", {i.memory_per_device / 2**30:.1f} GiB/device" if i.memory_per_device else ""
    return (
        f"{i.platform} × {i.num_devices} ({i.device_kind}) on "
        f"{i.num_hosts} host(s){mem}"
    )


def pull_guarded(x, timeout: float = 180.0, what: str = "device pull"):
    """Device→host pull with a watchdog: np.asarray(x) in a worker thread,
    TimeoutError with a diagnostic if it exceeds ``timeout`` seconds.

    On the tunneled TPU runtime a hung transfer blocks silently for minutes
    (docs/ROADMAP.md measurement notes); the reference's only hang protection
    is its 1 s semaphore timeouts (render_graph/mod.rs:665). Interactive
    paths (viewer save/drain, bench pulls) should pull through this guard.
    The worker thread is daemonic — a truly wedged transfer doesn't block
    interpreter exit, but its memory is not reclaimed until process end.
    """
    import threading

    import numpy as np

    result: list = [None]
    error: list = [None]

    def work():
        try:
            result[0] = np.asarray(x)
        except Exception as e:  # noqa: BLE001 — reraised on the caller
            error[0] = e

    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(timeout)
    if t.is_alive():
        raise TimeoutError(
            f"{what} exceeded {timeout:.0f}s — the tunneled device link is "
            "likely wedged (transfer hung, not slow compute). Retry the "
            "pull, or restart the process to re-establish the tunnel."
        )
    if error[0] is not None:
        raise error[0]
    return result[0]
