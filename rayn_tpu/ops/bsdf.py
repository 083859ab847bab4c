"""Material evaluation over the wavefront.

The reference dispatches through `dyn BSDF` trait objects bump-allocated
per wide shading batch (reference src/material.rs:31-38). Here materials
are a tagged parameter table (rayn_tpu.scene.scene.Materials); a batch of
rays gathers its parameters by material id and every BSDF variant is
evaluated with masked selects — on TPU this costs a handful of fused VPU
ops and removes the need to sort rays by material (the reference's
HitStore binning, src/hitable.rs:94-134).

BSDF variants and their semantics:
- Lambertian: f = albedo/pi, cosine-sampled (src/material.rs:117-142)
- Dielectric: Schlick-Fresnel (F0=0.04) lobe mix of Lambert diffuse and a
  cosine-power (Phong) specular lobe around the mirror direction
  (src/material.rs:194-256)
- Sky: non-receiving, le = vertical gradient in wo (src/material.rs:425-449)
- Emissive: non-receiving, le = emission (src/material.rs:489-520)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from rayn_tpu.config import RenderSettings
from rayn_tpu.scene.scene import DIELECTRIC, EMISSIVE, LAMBERT, SKY, Materials
from rayn_tpu.utils import sampling, vecmath

F0 = 0.04          # reference src/material.rs:197, :247
F32_EPS = 1.1920929e-07  # f32::EPSILON (reference src/material.rs:236)


class MatParams(NamedTuple):
    """Per-ray gathered material parameters."""
    kind: jnp.ndarray     # [N] int32
    color_a: jnp.ndarray  # [N, 3]
    color_b: jnp.ndarray  # [N, 3]
    power: jnp.ndarray    # [N]


def gather(materials: Materials, mat_id: jnp.ndarray) -> MatParams:
    return MatParams(
        kind=materials.kind[mat_id],
        color_a=materials.color_a[mat_id],
        color_b=materials.color_b[mat_id],
        power=materials.power[mat_id],
    )


def receives_light(p: MatParams) -> jnp.ndarray:
    """[N] bool — whether the surface scatters further light (reference
    src/material.rs:12-14; Sky/Emissive override to false,
    src/material.rs:426-428, :499-501)."""
    return (p.kind == LAMBERT) | (p.kind == DIELECTRIC)


def emitted(p: MatParams, wo: jnp.ndarray) -> jnp.ndarray:
    """le(wo) [N, 3]. Sky gradient: t = (wo.y+1)/2, top*(1-t)+bottom*t
    (reference src/material.rs:444-448)."""
    t = 0.5 * (wo[:, 1:2] + 1.0)
    sky_le = p.color_a * (1.0 - t) + p.color_b * t
    le = jnp.where((p.kind == SKY)[:, None], sky_le, 0.0)
    le = jnp.where((p.kind == EMISSIVE)[:, None], p.color_b, le)
    return le


def eval_f(p: MatParams, wo: jnp.ndarray, wi: jnp.ndarray,
           n: jnp.ndarray) -> jnp.ndarray:
    """BSDF value f(wo, wi) [N, 3] for NEE (reference src/material.rs:139-141
    Lambert, :195-205 Dielectric). Non-receiving kinds return 0."""
    lambert_f = p.color_a / sampling.PI

    d = jnp.maximum(0.0, vecmath.dot(wi, n))
    fresnel = sampling.f_schlick(d, F0)
    half = vecmath.normalize(wo + wi, eps=1e-20)
    cos_alpha = jnp.maximum(0.0, vecmath.dot(half, n)) ** p.power
    spec_factor = cos_alpha * (p.power + 2.0) / (2.0 * sampling.PI)
    spec_f = (spec_factor * fresnel)[:, None]
    diel_f = spec_f + p.color_a / sampling.PI * (1.0 - fresnel)[:, None]

    f = jnp.where((p.kind == LAMBERT)[:, None], lambert_f, 0.0)
    f = jnp.where((p.kind == DIELECTRIC)[:, None], diel_f, f)
    return f


class ScatterEvent(NamedTuple):
    wi: jnp.ndarray   # [N, 3]
    f: jnp.ndarray    # [N, 3]
    pdf: jnp.ndarray  # [N]


def scatter(p: MatParams, settings: RenderSettings, wo: jnp.ndarray,
            normal: jnp.ndarray, u_fresnel: jnp.ndarray,
            u_diffuse: jnp.ndarray, u_spec: jnp.ndarray) -> ScatterEvent:
    """Importance-sample the BSDF (reference src/material.rs:118-137
    Lambert, :207-256 Dielectric).

    u_fresnel: [N]; u_diffuse/u_spec: [N, 2]. For non-receiving kinds the
    result is unused by the integrator (masked out).
    """
    uu, vv = vecmath.orthonormal_basis(normal)

    # Diffuse lobe (shared by Lambert and Dielectric's diffuse part).
    ds = sampling.cosine_hemisphere(u_diffuse[:, 0], u_diffuse[:, 1])
    diffuse_bounce = vecmath.normalize(
        vecmath.basis_transform(uu, vv, normal, ds))
    lambert_pdf = ds[:, 2] / sampling.PI
    diffuse_pdf = jnp.maximum(1e-5, lambert_pdf)  # src/material.rs:223
    diffuse_f = p.color_a / sampling.PI

    # Specular Phong lobe around the mirror direction.
    if settings.compat_spec_reflect:
        reflection = vecmath.reflect_glsl(wo, normal)  # src/material.rs:229
    else:
        reflection = vecmath.reflect(wo, normal)
    ru, rv = vecmath.orthonormal_basis(reflection)
    ss = sampling.cosine_power_hemisphere(
        u_spec[:, 0], u_spec[:, 1], p.power,
        compat_phi=settings.compat_spec_phi)
    spec_bounce = vecmath.normalize(
        vecmath.basis_transform(ru, rv, reflection, ss))
    cos_alpha_pow = jnp.maximum(ss[:, 2] ** p.power, F32_EPS)
    spec_pdf = (p.power + 1.0) / sampling.TWO_PI * cos_alpha_pow
    spec_coeff = (p.power + 2.0) / sampling.TWO_PI * cos_alpha_pow
    below = vecmath.dot(normal, spec_bounce) < 0.0
    spec_coeff = jnp.where(below, 0.0, spec_coeff)  # src/material.rs:241-242
    spec_f = jnp.broadcast_to(spec_coeff[:, None], diffuse_f.shape)

    cos = jnp.abs(vecmath.dot(normal, wo))
    fresnel = sampling.f_schlick(cos, F0)
    take_spec = u_fresnel < fresnel

    diel_wi = jnp.where(take_spec[:, None], spec_bounce, diffuse_bounce)
    diel_f = jnp.where(take_spec[:, None], spec_f, diffuse_f)
    diel_pdf = fresnel * spec_pdf + (1.0 - fresnel) * diffuse_pdf

    is_diel = (p.kind == DIELECTRIC)
    wi = jnp.where(is_diel[:, None], diel_wi, diffuse_bounce)
    f = jnp.where(is_diel[:, None], diel_f, diffuse_f)
    pdf = jnp.where(is_diel, diel_pdf, lambert_pdf)
    return ScatterEvent(wi, f, pdf)
