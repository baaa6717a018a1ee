"""Runtime render-settings editor — the "Constants Editor" analog.

The reference ships an imgui integration whose only evidence of use is a
"Constants Editor" window for the GConst knobs (src/imgui/mod.rs, imgui.ini:
6-9; knobs in renderer/mod.rs:47-63). A TPU host has no GUI, so the editor is
a tiny text protocol usable from a REPL, a pipe, or programmatically:

    tuner = SettingsTuner(settings)
    tuner.apply("bounces=6 samples=2")     # returns new RenderSettings
    tuner.apply("blendfactor=0.2")         # dynamic knobs tracked separately

Static knobs (bounces/samples/resolution) force a recompile — the tuner
reports which; dynamic knobs (blendfactor, cell_size, proberng) are traced
values the caller feeds into the frame function without recompiling, exactly
mirroring the reference's split between pipeline state and GConst contents.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

from raytracer3_tpu.utils.config import RenderSettings

# Knobs that live in the jitted program's shape/unroll structure.
STATIC_KNOBS = {
    "width", "height", "bounces", "samples", "probe_spacing", "probe_res",
    "diffuse_only", "radiance_clamp",
}
# Knobs that are traced scalars (no recompile).
DYNAMIC_KNOBS = {"blendfactor", "cell_size", "proberng"}


@dataclasses.dataclass
class DynamicState:
    blendfactor: float = 0.0  # 0 → progressive 1/(n+1)
    cell_size: float = 0.01
    proberng: bool = False


class SettingsTuner:
    def __init__(self, settings: RenderSettings, dynamic: DynamicState | None = None):
        self.settings = settings
        self.dynamic = dynamic or DynamicState()
        self.recompile_needed = False

    def apply(self, command: str) -> Tuple[RenderSettings, DynamicState]:
        """Apply "key=value [key=value ...]"; returns (settings, dynamic)."""
        for tok in command.split():
            if "=" not in tok:
                raise ValueError(f"expected key=value, got {tok!r}")
            key, val = tok.split("=", 1)
            if key in STATIC_KNOBS:
                cur = getattr(self.settings, key)
                new = type(cur)(float(val)) if not isinstance(cur, bool) else val.lower() in ("1", "true", "on")
                if new != cur:
                    self.settings = dataclasses.replace(self.settings, **{key: new})
                    self.recompile_needed = True
            elif key in DYNAMIC_KNOBS:
                cur = getattr(self.dynamic, key)
                new = type(cur)(float(val)) if not isinstance(cur, bool) else val.lower() in ("1", "true", "on")
                setattr(self.dynamic, key, new)
            else:
                raise ValueError(
                    f"unknown knob {key!r}; static={sorted(STATIC_KNOBS)}, "
                    f"dynamic={sorted(DYNAMIC_KNOBS)}"
                )
        return self.settings, self.dynamic

    def consume_recompile_flag(self) -> bool:
        f = self.recompile_needed
        self.recompile_needed = False
        return f

    def dump(self) -> str:
        lines = ["# static (recompile on change)"]
        for k in sorted(STATIC_KNOBS):
            lines.append(f"{k}={getattr(self.settings, k)}")
        lines.append("# dynamic")
        for k in sorted(DYNAMIC_KNOBS):
            lines.append(f"{k}={getattr(self.dynamic, k)}")
        return "\n".join(lines)
