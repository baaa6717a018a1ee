"""raytracer3_tpu — a TPU-native real-time path-tracing framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the Vulkan/Rust
renderer ``DerEchteKarsten/RayTracer3`` (see SURVEY.md):

- ``ops``       — math / sampling / packing / SH / BRDF / tonemap / intersection /
                  BVH build + traversal (Pallas kernels for the hot paths)
- ``scene``     — scene resource model (the bindless-heap analog), glTF ingest,
                  processed-asset cache, geometry pools, analytic test scenes
- ``render``    — camera, film (progressive accumulation), G-buffer, the
                  reference-mode path tracer, the wavefront path tracer,
                  probe GI, postprocess (AgX)
- ``graph``     — declarative pass-graph that composes passes into one jitted
                  frame function (the render-graph analog)
- ``parallel``  — device-mesh sharding of the pixel grid / ray wavefront
- ``utils``     — image IO (PNG/EXR), config, profiling helpers
"""

__version__ = "0.1.0"
