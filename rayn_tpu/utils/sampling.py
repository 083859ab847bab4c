"""Sampling warps and Fresnel helpers.

Vectorized re-designs of the reference's SIMD warp functions
(reference src/math.rs:61-129, :201-219). All functions take uniform
samples of shape [...] or [..., 2] and are jit/grad-safe.
"""

from __future__ import annotations

import jax.numpy as jnp


PI = float(jnp.pi)
TWO_PI = 2.0 * PI
FRAC_PI_4 = PI / 4.0
FRAC_PI_2 = PI / 2.0


def concentric_disk(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Concentric (Shirley) square-to-disk map; returns [..., 2].

    Matches reference src/math.rs:201-219 including the (0,0) -> b=1e-4
    guard.
    """
    a = u * 2.0 - 1.0
    b = v * 2.0 - 1.0
    zero_mask = (a == 0.0) & (b == 0.0)
    b = jnp.where(zero_mask, 1e-4, b)

    # Guard divisors for the unselected lane (jnp.where evaluates both).
    a_safe = jnp.where(a == 0.0, 1.0, a)
    phi1 = FRAC_PI_4 * b / a_safe
    phi2 = FRAC_PI_2 - FRAC_PI_4 * a / b

    take1 = (a * a) > (b * b)
    r = jnp.where(take1, a, b)
    phi = jnp.where(take1, phi1, phi2)
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def uniform_sphere(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Uniform direction on the unit sphere (reference src/math.rs:85-91)."""
    theta = u * TWO_PI
    phi = v * 2.0 - 1.0
    ophisq = jnp.sqrt(jnp.maximum(1.0 - phi * phi, 0.0))
    return jnp.stack(
        [ophisq * jnp.cos(theta), ophisq * jnp.sin(theta), phi], axis=-1)


def cosine_hemisphere(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Cosine-weighted hemisphere direction in local (z-up) space.

    pdf = z / pi. Matches reference src/math.rs:99-103 (concentric disk
    lift).
    """
    xy = concentric_disk(u, v)
    mag_sq = jnp.sum(xy * xy, axis=-1)
    z = jnp.sqrt(1.0 - jnp.minimum(mag_sq, 1.0))
    return jnp.concatenate([xy, z[..., None]], axis=-1)


def cosine_power_hemisphere(u: jnp.ndarray, v: jnp.ndarray,
                            power: jnp.ndarray,
                            compat_phi: bool = False) -> jnp.ndarray:
    """Phong-lobe (cos^power) direction in local (z-up) space.

    pdf = (power+1)/(2 pi) * z^power. The reference computes the azimuth as
    `phi = 2*u` radians (src/math.rs:111) — a bug that covers only ~1/pi of
    the circle; we use the correct 2*pi*u unless compat_phi is set.
    """
    a = u ** (1.0 / (power + 1.0))
    b = jnp.sqrt(jnp.maximum(1.0 - a * a, 0.0))
    phi = (2.0 * v) if compat_phi else (TWO_PI * v)
    return jnp.stack([b * jnp.cos(phi), b * jnp.sin(phi), a], axis=-1)


def f_schlick(cos: jnp.ndarray, f0) -> jnp.ndarray:
    """Schlick Fresnel (reference src/math.rs:122-124)."""
    m = 1.0 - cos
    m2 = m * m
    return f0 + (1.0 - f0) * (m2 * m2 * m)


def f0_from_ior(ior: jnp.ndarray) -> jnp.ndarray:
    f0 = (1.0 - ior) / (1.0 + ior)
    return f0 * f0


def power_heuristic(nf: float, f_pdf: jnp.ndarray, ng: float,
                    g_pdf: jnp.ndarray) -> jnp.ndarray:
    """Balance-power MIS heuristic (reference src/math.rs:193-199; unused
    there, available here for MIS-enabled integrators)."""
    f = nf * f_pdf
    g = ng * g_pdf
    return f * f / (f * f + g * g)


def uniform_cone_pdf(cos_theta_max: jnp.ndarray) -> jnp.ndarray:
    """pdf of uniform sampling inside a cone (reference src/light.rs:105-107)."""
    return 1.0 / (TWO_PI * (1.0 - cos_theta_max))


__all__ = [
    "concentric_disk", "uniform_sphere", "cosine_hemisphere",
    "cosine_power_hemisphere", "f_schlick", "f0_from_ior",
    "power_heuristic", "uniform_cone_pdf", "PI", "TWO_PI",
]
