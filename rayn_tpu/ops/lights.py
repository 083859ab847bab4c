"""Sphere-light sampling.

Vectorized re-design of the reference's `SphereLight` (reference
src/light.rs:19-103): visible-cap cone sampling for surface NEE
(pbrt-style) and Kulla–Fajardo equi-angular sampling for volume
single-scattering. All functions take per-ray gathered light parameters
so each wavefront lane can be sampling a different light.
"""

from __future__ import annotations

import jax.numpy as jnp

from rayn_tpu.utils import sampling, vecmath


def sample_cone(u: jnp.ndarray, light_pos: jnp.ndarray,
                light_rad: jnp.ndarray, p: jnp.ndarray,
                emission: jnp.ndarray):
    """Sample a point on the visible cap of a sphere light as seen from p.

    Returns (point [N,3], radiance [N,3], pdf [N]) with pdf w.r.t. solid
    angle. Semantics match reference src/light.rs:38-72.

    u: [N, 2]; light_pos: [N, 3]; light_rad: [N]; p: [N, 3];
    emission: [N, 3].
    """
    dir_to_light = light_pos - p
    dist_sq = vecmath.length_sq(dir_to_light)
    dist = jnp.sqrt(dist_sq)
    w = dir_to_light / dist[:, None]
    nor = -w
    uu, vv = vecmath.orthonormal_basis(nor)

    r2 = light_rad * light_rad
    sin_theta_max_2 = r2 / dist_sq
    cos_theta_max = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_theta_max_2))
    cos_theta = (1.0 - u[:, 0]) + u[:, 0] * cos_theta_max
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = u[:, 1] * sampling.TWO_PI

    ds = dist * cos_theta - jnp.sqrt(
        jnp.maximum(0.0, r2 - dist_sq * sin_theta * sin_theta))
    cos_alpha = (dist_sq + r2 - ds * ds) / (2.0 * dist * light_rad)
    sin_alpha = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_alpha * cos_alpha))

    offset = (uu * (sin_alpha * jnp.cos(phi))[:, None]
              + vv * (sin_alpha * jnp.sin(phi))[:, None]
              + nor * cos_alpha[:, None])
    point = light_pos + offset * light_rad[:, None]
    pdf = sampling.uniform_cone_pdf(cos_theta_max)
    return point, emission, pdf


def sample_equi_angular(u: jnp.ndarray, light_pos: jnp.ndarray,
                        ray_o: jnp.ndarray, ray_d: jnp.ndarray,
                        max_distance: jnp.ndarray):
    """Equi-angular distance sample along a ray toward a light.

    Returns (distance [N], pdf [N]). Semantics match reference
    src/light.rs:75-102 ("Importance Sampling Techniques for Path Tracing
    in Participating Media", Kulla & Fajardo).
    """
    delta = vecmath.dot(light_pos - ray_o, ray_d)
    closest = ray_o + delta[:, None] * ray_d
    d = vecmath.length(closest - light_pos)
    theta_a = jnp.arctan2(-delta, d)
    theta_b = jnp.arctan2(max_distance - delta, d)
    th = theta_a + (theta_b - theta_a) * u
    t = d * jnp.tan(th)
    sample_dist = delta + t
    pdf = d / ((theta_b - theta_a) * (d * d + t * t))
    return sample_dist, pdf
