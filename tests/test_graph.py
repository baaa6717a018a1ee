"""Frame-graph tests: ordering, validation assertions (mirroring the
reference's builder panics, build.rs:53-55,96-107,195-198), temporal
ping-pong state, and end-to-end composition of render passes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer3_tpu.graph import FrameGraph, GraphError


class TestValidation:
    def test_duplicate_pass_name(self):
        g = FrameGraph()
        g.image("a", (4,))
        g.add_pass("p", lambda r: {"a": jnp.zeros(4)}, writes=["a"])
        with pytest.raises(GraphError, match="duplicate pass"):
            g.add_pass("p", lambda r: {}, writes=["a"])

    def test_duplicate_resource_edge(self):
        g = FrameGraph()
        g.image("a", (4,))
        with pytest.raises(GraphError, match="twice"):
            g.add_pass("p", lambda r: {}, reads=["a"], writes=["a"])

    def test_undeclared_resource(self):
        g = FrameGraph()
        with pytest.raises(GraphError, match="undeclared"):
            g.add_pass("p", lambda r: {}, writes=["ghost"])

    def test_read_from_nobody(self):
        g = FrameGraph()
        g.image("a", (4,))
        g.image("b", (4,))
        g.add_pass("p", lambda r: {"b": r["a"]}, reads=["a"], writes=["b"])
        with pytest.raises(GraphError, match="no pass writes"):
            g.compile(output="b")

    def test_two_writers_rejected(self):
        g = FrameGraph()
        g.image("a", (4,))
        g.add_pass("p1", lambda r: {"a": jnp.zeros(4)}, writes=["a"])
        g.add_pass("p2", lambda r: {"a": jnp.ones(4)}, writes=["a"])
        with pytest.raises(GraphError, match="written by both"):
            g.compile(output="a")

    def test_prev_requires_temporal(self):
        g = FrameGraph()
        g.image("a", (4,))
        with pytest.raises(GraphError, match="not temporal"):
            g.add_pass("p", lambda r: {"a": r["a@prev"]}, reads=["a@prev"], writes=["a"])

    def test_wrong_writes_returned(self):
        g = FrameGraph()
        g.image("a", (4,))
        g.add_pass("p", lambda r: {"zzz": jnp.zeros(4)}, writes=["a"])
        step = g.compile(output="a", jit=False)
        with pytest.raises(GraphError, match="declared"):
            step(g.init_state())


class TestExecution:
    def test_order_follows_dependencies(self):
        g = FrameGraph()
        g.image("a", (2,))
        g.image("b", (2,))
        g.image("c", (2,))
        trace = []

        g.add_pass("make_a", lambda r: (trace.append("a"), {"a": jnp.ones(2)})[1], writes=["a"])
        g.add_pass(
            "make_b", lambda r: (trace.append("b"), {"b": r["a"] * 2})[1],
            reads=["a"], writes=["b"],
        )
        g.add_pass(
            "make_c", lambda r: (trace.append("c"), {"c": r["b"] + r["a"]})[1],
            reads=["a", "b"], writes=["c"],
        )
        step = g.compile(output="c", jit=False)
        out, _ = step(g.init_state())
        assert trace == ["a", "b", "c"]
        np.testing.assert_allclose(out, [3.0, 3.0])

    def test_unreachable_passes_culled(self):
        g = FrameGraph()
        g.image("a", (2,))
        g.image("dead", (2,))
        trace = []
        g.add_pass("live", lambda r: (trace.append("live"), {"a": jnp.ones(2)})[1], writes=["a"])
        g.add_pass("dead", lambda r: (trace.append("dead"), {"dead": jnp.ones(2)})[1], writes=["dead"])
        step = g.compile(output="a", jit=False)
        step(g.init_state())
        assert trace == ["live"]

    def test_temporal_ping_pong(self):
        # light = light@prev + 1 per frame — the PrevLight blend pattern.
        g = FrameGraph()
        g.temporal("light", (3,))
        g.add_pass(
            "accum", lambda r: {"light": r["light@prev"] + 1.0},
            reads=["light@prev"], writes=["light"],
        )
        step = g.compile(output="light", jit=False)
        state = g.init_state()
        for i in range(3):
            out, state = step(state)
        np.testing.assert_allclose(out, [3.0, 3.0, 3.0])

    def test_jit_compiles_and_donates(self):
        g = FrameGraph()
        g.temporal("film", (8, 8, 3))
        g.image("radiance", (8, 8, 3))

        def render(r, frame_index=0):
            return {"radiance": jnp.full((8, 8, 3), 1.0 + frame_index)}

        def blend(r, frame_index=0):
            return {"film": r["film@prev"] * 0.5 + r["radiance"] * 0.5}

        g.add_pass("render", render, writes=["radiance"])
        g.add_pass("blend", blend, reads=["film@prev", "radiance"], writes=["film"])
        step = g.compile(output="film")
        state = g.init_state()
        out, state = step(state, frame_index=jnp.asarray(0.0))
        out, state = step(state, frame_index=jnp.asarray(1.0))
        assert np.isfinite(np.asarray(out)).all()
        np.testing.assert_allclose(np.asarray(out), 0.25 * 1.0 + 0.5 * 2.0)


class TestEndToEndRender:
    def test_cornell_through_graph(self):
        # Compose the real renderer passes through the graph: gbuffer →
        # shade → blend, like the reference's frame assembly (§3.2/§3.5).
        from raytracer3_tpu.ops import intersect
        from raytracer3_tpu.render import camera as camera_mod
        from raytracer3_tpu.render import pathtracer
        from raytracer3_tpu.scene import analytic
        from raytracer3_tpu.utils.config import RenderSettings
        from raytracer3_tpu.ops import rng as rng_mod

        scene = analytic.cornell_box()
        cam = analytic.default_camera()
        v0, v1, v2 = scene.tri_vertices()
        isect = lambda o, d: intersect.intersect_bruteforce(o, d, v0, v1, v2)
        s = RenderSettings(width=8, height=8, bounces=2, samples=1, diffuse_only=True)

        g = FrameGraph()
        g.image("radiance", (64, 3))
        g.temporal("film", (64, 3))

        def render_pass(r, frame_index):
            pix = camera_mod.pixel_grid(8, 8)
            sampler = rng_mod.Sampler.from_pixels(pix, frame_index)
            uj, sampler = sampler.next2()
            o, d = camera_mod.primary_rays(cam, 8, 8, jitter=uj, pixel_xy=pix)
            gbuf = pathtracer.trace_gbuffer(scene, isect, o, d)
            rad = pathtracer.trace_radiance(scene, isect, o, d, gbuf, sampler, s)
            return {"radiance": rad}

        def blend_pass(r, frame_index):
            t = 1.0 / (frame_index.astype(jnp.float32) + 1.0)
            return {"film": r["film@prev"] + (r["radiance"] - r["film@prev"]) * t}

        g.add_pass("pt", render_pass, writes=["radiance"])
        g.add_pass("blend", blend_pass, reads=["film@prev", "radiance"], writes=["film"])
        step = g.compile(output="film")
        state = g.init_state()
        for i in range(3):
            out, state = step(state, frame_index=jnp.uint32(i))
        assert np.isfinite(np.asarray(out)).all()
        assert np.asarray(out).max() > 0


class TestDeclarationValidation:
    """compile() validates written shapes/dtypes against declarations at
    trace time, erroring with the pass name (the reference materializes
    resources from declarations and panics at build, build.rs:53-107)."""

    def test_shape_mismatch_raises(self):
        import jax.numpy as jnp
        import pytest
        from raytracer3_tpu.graph import FrameGraph, GraphError

        g = FrameGraph()
        g.image("img", (4, 4))
        g.add_pass("bad", lambda r: {"img": jnp.zeros((2, 2))}, writes=["img"])
        step = g.compile(output="img", jit=False)
        with pytest.raises(GraphError, match="bad.*img.*\\(2, 2\\)"):
            step({})

    def test_dtype_mismatch_raises(self):
        import jax.numpy as jnp
        import pytest
        from raytracer3_tpu.graph import FrameGraph, GraphError

        g = FrameGraph()
        g.image("img", (4, 4), dtype=jnp.uint32)
        g.add_pass("bad", lambda r: {"img": jnp.zeros((4, 4))}, writes=["img"])
        step = g.compile(output="img", jit=False)
        with pytest.raises(GraphError, match="bad.*dtype"):
            step({})

    def test_bindings_forwarded_to_passes_that_declare_them(self):
        import jax.numpy as jnp
        from raytracer3_tpu.graph import FrameGraph

        g = FrameGraph()
        g.image("img", (2, 2))

        def p(r, bindings):
            return {"img": jnp.full((2, 2), bindings["k"])}

        g.add_pass("p", p, writes=["img"])
        step = g.compile(output="img", jit=False, bindings={"k": jnp.float32(3.0)})
        out, _ = step({})
        assert float(out[0, 0]) == 3.0
