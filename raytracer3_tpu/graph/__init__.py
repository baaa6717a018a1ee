"""Declarative frame/pass graph — the render-graph analog
(src/renderer/render_graph/)."""

from raytracer3_tpu.graph.graph import FrameGraph, GraphError
