"""BRDF sampling and evaluation: Lambert diffuse + GGX specular with VNDF
sampling and Smith height-correlated masking.

TPU-native counterpart of ``shaders/include/brdf.slang``. All functions
operate in the local tangent frame (+z = surface normal), batched over leading
axes, and return (value_over_pdf, value, pdf, wi) as plain arrays — a
branch-free formulation: invalid samples are masked to zero instead of early
returns, which is exactly what the VPU wants.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from raytracer3_tpu.ops import mathx

BRDF_SAMPLING_MIN_COS = 1e-5
TAU = mathx.TAU
INV_PI = mathx.INV_PI


class BrdfSample(NamedTuple):
    """Result of sampling a BRDF (brdf.slang:15-50), as a pytree of arrays."""

    wi: jax.Array  # [..., 3] sampled incident direction (local frame)
    value_over_pdf: jax.Array  # [..., 3]
    value: jax.Array  # [..., 3]
    pdf: jax.Array  # [...]
    valid: jax.Array  # [...] bool
    approx_roughness: jax.Array  # [...]


class BrdfValue(NamedTuple):
    """Result of evaluating a BRDF for a given wi (brdf.slang:15-31)."""

    value_over_pdf: jax.Array
    value: jax.Array
    pdf: jax.Array


# ---------------------------------------------------------------------------
# Fresnel (brdf.slang:95-97)
# ---------------------------------------------------------------------------


def fresnel_schlick(f0: jax.Array, f90, cos_theta: jax.Array) -> jax.Array:
    m = jnp.maximum(0.0, 1.0 - cos_theta)
    m5 = m * m * m * m * m
    return f0 + (f90 - f0) * m5[..., None] if f0.ndim > cos_theta.ndim else f0 + (f90 - f0) * m5


def fresnel_schlick_rgb(f0: jax.Array, cos_theta: jax.Array) -> jax.Array:
    """RGB f0, scalar f90 = 1 (brdf.slang sample/evaluate usage)."""
    m = jnp.maximum(0.0, 1.0 - cos_theta)
    m5 = m * m * m * m * m
    return f0 + (1.0 - f0) * m5[..., None]


# ---------------------------------------------------------------------------
# Smith shadowing-masking (brdf.slang:104-139)
# ---------------------------------------------------------------------------


def g_smith_ggx_correlated(ndotv, ndotl, a2):
    lambda_v = ndotl * jnp.sqrt((-ndotv * a2 + ndotv) * ndotv + a2)
    lambda_l = ndotv * jnp.sqrt((-ndotl * a2 + ndotl) * ndotl + a2)
    return 2.0 * ndotl * ndotv / jnp.maximum(lambda_v + lambda_l, 1e-20)


def g_smith_ggx1(ndotv, a2):
    nv2 = jnp.maximum(ndotv * ndotv, 1e-20)
    tan2_v = (1.0 - nv2) / nv2
    return 2.0 / (1.0 + jnp.sqrt(1.0 + a2 * tan2_v))


# ---------------------------------------------------------------------------
# GGX NDF + pdfs (brdf.slang:146-170)
# ---------------------------------------------------------------------------


def ggx_ndf(a2, cos_theta):
    denom_sqrt = cos_theta * cos_theta * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(jnp.pi * denom_sqrt * denom_sqrt, 1e-20)


def pdf_ggx(a2, cos_theta):
    return ggx_ndf(a2, cos_theta) * cos_theta


def pdf_ggx_vn(a2, wo, h):
    """Visible-normal pdf (brdf.slang:166-170)."""
    g1 = g_smith_ggx1(wo[..., 2], a2)
    d = ggx_ndf(a2, h[..., 2])
    return g1 * d * jnp.maximum(0.0, mathx.dot(wo, h, keepdims=False)) / jnp.maximum(
        wo[..., 2], 1e-20
    )


def sample_vndf(alpha, wo: jax.Array, urand: jax.Array) -> jax.Array:
    """Sample the GGX distribution of visible normals (Heitz, JCGT 2018;
    brdf.slang:185-215). Returns the half-vector h in the local frame."""
    alpha = jnp.broadcast_to(jnp.asarray(alpha), wo.shape[:-1])
    vh = mathx.normalize(
        jnp.stack([alpha * wo[..., 0], alpha * wo[..., 1], wo[..., 2]], axis=-1)
    )
    # ONB around vh
    up = jnp.zeros_like(vh).at[..., 2].set(1.0)
    t1 = jnp.where(
        (vh[..., 2:3] < 0.9999),
        mathx.normalize(jnp.cross(up, vh)),
        jnp.zeros_like(vh).at[..., 0].set(1.0),
    )
    t2 = jnp.cross(vh, t1)
    r = jnp.sqrt(urand[..., 0])
    phi = TAU * urand[..., 1]
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) + s * p2
    nh = (
        p1[..., None] * t1
        + p2[..., None] * t2
        + jnp.sqrt(jnp.maximum(0.0, 1.0 - p1 * p1 - p2 * p2))[..., None] * vh
    )
    h = mathx.normalize(
        jnp.stack(
            [alpha * nh[..., 0], alpha * nh[..., 1], jnp.maximum(0.0, nh[..., 2])],
            axis=-1,
        )
    )
    return h


# ---------------------------------------------------------------------------
# Diffuse (Lambert) BRDF (brdf.slang:52-94)
# ---------------------------------------------------------------------------


def diffuse_sample(albedo: jax.Array, urand: jax.Array) -> BrdfSample:
    """Cosine-hemisphere sample (brdf.slang:56-73). wo is irrelevant for
    Lambert; kept out of the signature."""
    wi = mathx.cosine_sample_hemisphere(urand)
    pdf = jnp.full(wi.shape[:-1], INV_PI, dtype=wi.dtype)
    vop = jnp.broadcast_to(albedo, wi.shape[:-1] + (3,))
    return BrdfSample(
        wi=wi,
        value_over_pdf=vop,
        value=vop * pdf[..., None],
        pdf=pdf,
        valid=wi[..., 2] > 1e-6,
        approx_roughness=jnp.ones(wi.shape[:-1], wi.dtype),
    )


def diffuse_evaluate(albedo: jax.Array, wi: jax.Array) -> BrdfValue:
    """brdf.slang:76-83."""
    up = wi[..., 2] > 0.0
    pdf = jnp.where(up, INV_PI, 0.0)
    vop = jnp.where(up[..., None], albedo, 0.0)
    return BrdfValue(value_over_pdf=vop, value=vop * pdf[..., None], pdf=pdf)


def diffuse_wi_to_primary_sample_space(wi: jax.Array) -> jax.Array:
    """Invert cosine-hemisphere sampling (brdf.slang:85-93)."""
    cos_theta = wi[..., 2]
    y = jnp.clip(1.0 - cos_theta * cos_theta, 0.0, 1.0)
    x = jnp.arctan2(wi[..., 1], wi[..., 0]) / TAU
    x = x - jnp.floor(x)
    return jnp.stack([x, y], axis=-1)


# ---------------------------------------------------------------------------
# Specular GGX BRDF (brdf.slang:142-303). VNDF sampling + correlated Smith,
# the reference's compiled-in configuration (brdf.slang:10-11).
# ---------------------------------------------------------------------------


def specular_sample(roughness, f0_albedo: jax.Array, wo: jax.Array, urand: jax.Array) -> BrdfSample:
    """brdf.slang:217-267 with USE_GGX_VNDF_SAMPLING=1."""
    roughness = jnp.broadcast_to(jnp.asarray(roughness, wo.dtype), wo.shape[:-1])
    a2 = roughness * roughness
    h = sample_vndf(roughness, wo, urand)
    ndf_pdf = pdf_ggx_vn(a2, wo, h)
    wi = mathx.reflect(-wo, h)

    valid = (
        (h[..., 2] > BRDF_SAMPLING_MIN_COS)
        & (wi[..., 2] > BRDF_SAMPLING_MIN_COS)
        & (wo[..., 2] > BRDF_SAMPLING_MIN_COS)
    )

    jacobian = 1.0 / jnp.maximum(4.0 * mathx.dot(wi, h, keepdims=False), 1e-20)
    fresnel = fresnel_schlick_rgb(f0_albedo, mathx.dot(h, wi, keepdims=False))
    g = g_smith_ggx_correlated(wo[..., 2], wi[..., 2], a2)
    g_over_g1_wo = g / jnp.maximum(g_smith_ggx1(wo[..., 2], a2), 1e-20)

    pdf = ndf_pdf * jacobian / jnp.maximum(wi[..., 2], 1e-20)
    value_over_pdf = fresnel * g_over_g1_wo[..., None]
    value = (
        fresnel
        * (g * ggx_ndf(a2, h[..., 2]) / jnp.maximum(4.0 * wo[..., 2] * wi[..., 2], 1e-20))[
            ..., None
        ]
    )

    z = jnp.zeros_like(value)
    return BrdfSample(
        wi=jnp.where(valid[..., None], wi, jnp.zeros_like(wi).at[..., 2].set(-1.0)),
        value_over_pdf=jnp.where(valid[..., None], value_over_pdf, z),
        value=jnp.where(valid[..., None], value, z),
        pdf=jnp.where(valid, pdf, 0.0),
        valid=valid,
        approx_roughness=roughness,
    )


def specular_evaluate(roughness, f0_albedo: jax.Array, wo: jax.Array, wi: jax.Array) -> BrdfValue:
    """brdf.slang:269-303 with VNDF pdf."""
    roughness = jnp.broadcast_to(jnp.asarray(roughness, wo.dtype), wo.shape[:-1])
    a2 = roughness * roughness
    valid = (wi[..., 2] > 0.0) & (wo[..., 2] > 0.0)
    m = mathx.normalize(wo + wi)
    pdf_h = pdf_ggx_vn(a2, wo, m)
    jacobian = 1.0 / jnp.maximum(4.0 * mathx.dot(wi, m, keepdims=False), 1e-20)
    fresnel = fresnel_schlick_rgb(f0_albedo, mathx.dot(m, wi, keepdims=False))
    g = g_smith_ggx_correlated(wo[..., 2], wi[..., 2], a2)
    g_over_g1_wo = g / jnp.maximum(g_smith_ggx1(wo[..., 2], a2), 1e-20)

    pdf = pdf_h * jacobian / jnp.maximum(wi[..., 2], 1e-20)
    value_over_pdf = fresnel * g_over_g1_wo[..., None]
    value = (
        fresnel
        * (g * ggx_ndf(a2, m[..., 2]) / jnp.maximum(4.0 * wo[..., 2] * wi[..., 2], 1e-20))[
            ..., None
        ]
    )
    z = jnp.zeros_like(value)
    return BrdfValue(
        value_over_pdf=jnp.where(valid[..., None], value_over_pdf, z),
        value=jnp.where(valid[..., None], value, z),
        pdf=jnp.where(valid, pdf, 0.0),
    )


def specular_dominant_direction(n: jax.Array, v: jax.Array, roughness) -> jax.Array:
    """Frostbite dominant specular direction (brdf.slang:306-310)."""
    r = mathx.reflect(-v, n)
    f = (1.0 - roughness) * (jnp.sqrt(jnp.maximum(1.0 - roughness, 0.0)) + roughness)
    return mathx.normalize(mathx.lerp(n, r, jnp.asarray(f)[..., None]))


# ---------------------------------------------------------------------------
# Combined metallic-roughness surface (glTF PBR parameterization used by the
# reference's GeometryInfo material: hit_logic.slang:33-38). Stochastic lobe
# selection between diffuse and specular, MIS-ready combined pdf.
# ---------------------------------------------------------------------------


def _f0_from_material(albedo: jax.Array, metalness: jax.Array) -> jax.Array:
    return mathx.lerp(jnp.full_like(albedo, 0.04), albedo, metalness[..., None])


def _diffuse_albedo(albedo: jax.Array, metalness: jax.Array) -> jax.Array:
    return albedo * (1.0 - metalness[..., None])


def surface_sample(
    albedo: jax.Array,
    roughness: jax.Array,
    metalness: jax.Array,
    wo: jax.Array,
    urand3: jax.Array,
) -> BrdfSample:
    """Sample the combined diffuse+specular surface: pick the lobe by the
    fresnel-weighted specular probability, then MIS-combine pdfs."""
    f0 = _f0_from_material(albedo, metalness)
    kd = _diffuse_albedo(albedo, metalness)
    # Lobe-selection probability from average fresnel at wo.
    f_avg = jnp.mean(fresnel_schlick_rgb(f0, jnp.maximum(wo[..., 2], 0.0)), axis=-1)
    d_avg = jnp.mean(kd, axis=-1)
    p_spec = jnp.clip(f_avg / jnp.maximum(f_avg + d_avg, 1e-6), 0.05, 0.95)

    pick_spec = urand3[..., 2] < p_spec
    u2 = urand3[..., :2]

    ds = diffuse_sample(kd, u2)
    ss = specular_sample(roughness, f0, wo, u2)

    wi = jnp.where(pick_spec[..., None], ss.wi, ds.wi)

    # Evaluate both lobes at the chosen wi for a one-sample MIS estimator.
    dv = diffuse_evaluate(kd, wi)
    sv = specular_evaluate(roughness, f0, wo, wi)
    pdf = p_spec * sv.pdf + (1.0 - p_spec) * dv.pdf
    value = dv.value + sv.value
    vop = value / jnp.maximum(pdf, 1e-20)[..., None]
    valid = jnp.where(pick_spec, ss.valid, ds.valid) & (pdf > 0.0)
    z = jnp.zeros_like(vop)
    return BrdfSample(
        wi=wi,
        value_over_pdf=jnp.where(valid[..., None], vop, z),
        value=jnp.where(valid[..., None], value, z),
        pdf=jnp.where(valid, pdf, 0.0),
        valid=valid,
        approx_roughness=jnp.where(pick_spec, roughness, jnp.ones_like(roughness)),
    )


def surface_evaluate(
    albedo: jax.Array,
    roughness: jax.Array,
    metalness: jax.Array,
    wo: jax.Array,
    wi: jax.Array,
) -> BrdfValue:
    """Evaluate the combined surface BRDF (for NEE/MIS)."""
    f0 = _f0_from_material(albedo, metalness)
    kd = _diffuse_albedo(albedo, metalness)
    f_avg = jnp.mean(fresnel_schlick_rgb(f0, jnp.maximum(wo[..., 2], 0.0)), axis=-1)
    d_avg = jnp.mean(kd, axis=-1)
    p_spec = jnp.clip(f_avg / jnp.maximum(f_avg + d_avg, 1e-6), 0.05, 0.95)
    dv = diffuse_evaluate(kd, wi)
    sv = specular_evaluate(roughness, f0, wo, wi)
    pdf = p_spec * sv.pdf + (1.0 - p_spec) * dv.pdf
    value = dv.value + sv.value
    return BrdfValue(
        value_over_pdf=value / jnp.maximum(pdf, 1e-20)[..., None],
        value=value,
        pdf=pdf,
    )
