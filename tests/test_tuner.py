"""Tests for the runtime settings tuner (Constants-Editor analog)."""

import pytest

from raytracer3_tpu.app.tuner import DynamicState, SettingsTuner
from raytracer3_tpu.utils.config import RenderSettings


class TestTuner:
    def test_static_change_flags_recompile(self):
        t = SettingsTuner(RenderSettings(width=64, height=64, bounces=2))
        s, _ = t.apply("bounces=5")
        assert s.bounces == 5
        assert t.consume_recompile_flag()
        assert not t.consume_recompile_flag()

    def test_same_value_no_recompile(self):
        t = SettingsTuner(RenderSettings(bounces=4))
        t.apply("bounces=4")
        assert not t.consume_recompile_flag()

    def test_dynamic_change_no_recompile(self):
        t = SettingsTuner(RenderSettings())
        _, d = t.apply("blendfactor=0.25 cell_size=0.5")
        assert d.blendfactor == 0.25
        assert d.cell_size == 0.5
        assert not t.consume_recompile_flag()

    def test_bool_knob(self):
        t = SettingsTuner(RenderSettings())
        s, _ = t.apply("diffuse_only=true")
        assert s.diffuse_only is True
        _, d = t.apply("proberng=1")
        assert d.proberng is True

    def test_multiple_and_errors(self):
        t = SettingsTuner(RenderSettings())
        s, d = t.apply("samples=3 blendfactor=0.1")
        assert s.samples == 3 and d.blendfactor == 0.1
        with pytest.raises(ValueError, match="unknown knob"):
            t.apply("nonsense=1")
        with pytest.raises(ValueError, match="key=value"):
            t.apply("oops")

    def test_dump_lists_everything(self):
        t = SettingsTuner(RenderSettings())
        out = t.dump()
        assert "bounces=" in out and "blendfactor=" in out
