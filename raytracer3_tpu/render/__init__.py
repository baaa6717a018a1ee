"""Rendering layers: camera, film, G-buffer, path tracers, probe GI,
postprocess — the TPU equivalents of the reference's shader passes
(``shaders/passes/``, ``shaders/old/``) and frame assembly
(``src/renderer/mod.rs``)."""
