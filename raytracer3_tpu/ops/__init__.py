"""Core device-side ops: math, sampling, packing, SH, BRDFs, tonemapping,
ray-primitive intersection, BVH build + traversal.

TPU-native counterpart of the reference's shader include library
(``shaders/include/*.slang``) and ray-tracing layer
(``src/renderer/vulkan/raytracing.rs``)."""

from raytracer3_tpu.ops import mathx as mathx
from raytracer3_tpu.ops import rng as rng
from raytracer3_tpu.ops import packing as packing
from raytracer3_tpu.ops import sh as sh
from raytracer3_tpu.ops import brdf as brdf
from raytracer3_tpu.ops import tonemap as tonemap
