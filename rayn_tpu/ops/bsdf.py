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
from rayn_tpu.scene.scene import (DIELECTRIC, EMISSIVE, LAMBERT, METALLIC,
                                  REFRACTIVE, SKY, Materials)
from rayn_tpu.utils import sampling, vecmath

F0 = 0.04          # reference src/material.rs:197, :247
F32_EPS = 1.1920929e-07  # f32::EPSILON (reference src/material.rs:236)


class MatParams(NamedTuple):
    """Per-ray gathered material parameters."""
    kind: jnp.ndarray     # [N] int32
    color_a: jnp.ndarray  # [N, 3]
    color_b: jnp.ndarray  # [N, 3]
    power: jnp.ndarray    # [N]
    ior: jnp.ndarray      # [N]


def gather(materials: Materials, mat_id: jnp.ndarray) -> MatParams:
    from rayn_tpu.utils.gather import small_gather
    scalars = jnp.stack([materials.power, materials.ior,
                         materials.kind.astype(jnp.float32)], axis=-1)
    colors = jnp.concatenate([materials.color_a, materials.color_b], axis=-1)
    sc = small_gather(scalars, mat_id)
    co = small_gather(colors, mat_id)
    return MatParams(
        kind=sc[:, 2].astype(jnp.int32),
        color_a=co[:, 0:3],
        color_b=co[:, 3:6],
        power=sc[:, 0],
        ior=sc[:, 1],
    )


def receives_light(p: MatParams) -> jnp.ndarray:
    """[N] bool — whether the surface scatters further light (reference
    src/material.rs:12-14; Sky/Emissive override to false,
    src/material.rs:426-428, :499-501)."""
    return ((p.kind == LAMBERT) | (p.kind == DIELECTRIC)
            | (p.kind == METALLIC) | (p.kind == REFRACTIVE))


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

    # Metallic: colored-Fresnel Blinn-Phong lobe only (no diffuse).
    fres_c = p.color_a + (1.0 - p.color_a) * ((1.0 - d) ** 5)[:, None]
    metal_f = fres_c * spec_factor[:, None]

    f = jnp.where((p.kind == LAMBERT)[:, None], lambert_f, 0.0)
    f = jnp.where((p.kind == DIELECTRIC)[:, None], diel_f, f)
    f = jnp.where((p.kind == METALLIC)[:, None], metal_f, f)
    # Refractive surfaces get no NEE contribution (near-specular; the
    # reference stub likewise never participated in NEE).
    return f


def eval_pdf(p: MatParams, settings: RenderSettings, wo: jnp.ndarray,
             wi: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """pdf (w.r.t. solid angle) that `scatter` would have sampled
    direction wi — the BSDF-strategy density needed for MIS weights.
    Matches scatter()'s sampling exactly: Lambert cosine pdf, Dielectric
    Fresnel-mixed cosine/Phong, Metallic Phong-only. Refractive gets no
    NEE (eval_f = 0) so its pdf is never used; returns 0."""
    cos_i = jnp.maximum(0.0, vecmath.dot(wi, n))
    lambert_pdf = cos_i / sampling.PI
    diffuse_pdf = jnp.maximum(1e-5, lambert_pdf)  # src/material.rs:223

    if settings.compat_spec_reflect:
        reflection = vecmath.reflect_glsl(wo, n)
    else:
        reflection = vecmath.reflect(wo, n)
    cos_alpha = jnp.maximum(0.0, vecmath.dot(reflection, wi))
    cos_alpha_pow = jnp.maximum(cos_alpha ** p.power, F32_EPS)
    spec_pdf = (p.power + 1.0) / sampling.TWO_PI * cos_alpha_pow

    cos = jnp.abs(vecmath.dot(n, wo))
    fresnel = sampling.f_schlick(cos, F0)
    diel_pdf = fresnel * spec_pdf + (1.0 - fresnel) * diffuse_pdf

    pdf = jnp.where(p.kind == LAMBERT, lambert_pdf, 0.0)
    pdf = jnp.where(p.kind == DIELECTRIC, diel_pdf, pdf)
    pdf = jnp.where(p.kind == METALLIC, spec_pdf, pdf)
    return pdf


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

    # Metallic: the same Phong lobe around the mirror with colored
    # Fresnel and no diffuse term (working version of the reference's
    # commented-out Metallic, src/material.rs:259-322).
    is_metal = (p.kind == METALLIC)
    fres_c = p.color_a + (1.0 - p.color_a) * ((1.0 - cos) ** 5)[:, None]
    metal_f = fres_c * spec_coeff[:, None]
    wi = jnp.where(is_metal[:, None], spec_bounce, wi)
    f = jnp.where(is_metal[:, None], metal_f, f)
    pdf = jnp.where(is_metal, spec_pdf, pdf)

    # Refractive: Fresnel-weighted reflect/refract with a cosine lobe
    # around the chosen axis and TIR fallback (working version of the
    # reference's commented-out Refractive, src/material.rs:324-392,
    # with the lobe treated as perfectly importance-sampled so the
    # throughput factor is exactly the refract color — the stub's
    # f = c/(pi cos) with pdf = cos/pi doubled energy).
    is_refr = (p.kind == REFRACTIVE)
    cos_i = vecmath.dot(wo, normal)
    entering = cos_i > 0.0
    n_ref = jnp.where(entering[:, None], normal, -normal)
    eta = jnp.where(entering, 1.0 / p.ior, p.ior)
    ci = jnp.abs(cos_i)
    sin2_t = eta * eta * jnp.maximum(0.0, 1.0 - ci * ci)
    tir = sin2_t > 1.0
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
    refr_dir = vecmath.normalize(
        -wo * eta[:, None] + n_ref * (eta * ci - cos_t)[:, None], eps=1e-20)
    f0 = sampling.f0_from_ior(p.ior)
    fresnel_r = sampling.f_schlick(ci, f0)
    reflect_dir = vecmath.reflect(wo, n_ref)
    take_reflect = (u_fresnel < fresnel_r) | tir
    axis = jnp.where(take_reflect[:, None], reflect_dir, refr_dir)
    auu, avv = vecmath.orthonormal_basis(axis)
    rs = sampling.cosine_hemisphere(u_diffuse[:, 0], u_diffuse[:, 1])
    refr_wi = vecmath.normalize(
        vecmath.basis_transform(auu, avv, axis, rs))
    refr_pdf = jnp.maximum(rs[:, 2] / sampling.PI, 1e-6)
    refr_color = jnp.where(take_reflect[:, None],
                           jnp.ones_like(p.color_a), p.color_a)
    ndl_r = jnp.maximum(jnp.abs(vecmath.dot(refr_wi, normal)), 1e-6)
    refr_f = refr_color * (refr_pdf / ndl_r)[:, None]
    wi = jnp.where(is_refr[:, None], refr_wi, wi)
    f = jnp.where(is_refr[:, None], refr_f, f)
    pdf = jnp.where(is_refr, refr_pdf, pdf)
    return ScatterEvent(wi, f, pdf)
