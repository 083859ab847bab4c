"""Vector math on trailing-axis-3 arrays.

The reference's L0 substrate is 4-lane SIMD `Wec3` structs-of-arrays
(reference src/math.rs:4-13 via ultraviolet). On TPU the natural
generalization is arrays of shape [..., 3] over an arbitrarily wide
wavefront dimension; every helper here is shape-polymorphic and jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp


def dot(a: jnp.ndarray, b: jnp.ndarray, keepdims: bool = False) -> jnp.ndarray:
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def length_sq(v: jnp.ndarray, keepdims: bool = False) -> jnp.ndarray:
    return jnp.sum(v * v, axis=-1, keepdims=keepdims)


def length(v: jnp.ndarray, keepdims: bool = False) -> jnp.ndarray:
    return jnp.sqrt(length_sq(v, keepdims=keepdims))


def normalize(v: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """v / |v|. With eps=0 this matches the reference's `normalized()`
    exactly (NaN on zero vectors); pass a small eps for guarded paths."""
    mag = length(v, keepdims=True)
    if eps:
        mag = jnp.maximum(mag, eps)
    return v / mag


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def reflect(v: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Mirror `v` about the normal `n`: 2(v.n)n - v.

    For `v = wo` (pointing away from the surface) this is the specular
    reflection axis. Note the reference instead computes
    `wo - 2(wo.n)n` (src/material.rs:229 via ultraviolet's GLSL-style
    `reflected`), which mirrors *through* the surface; see
    RenderSettings.compat_spec_reflect.
    """
    return 2.0 * dot(v, n, keepdims=True) * n - v


def reflect_glsl(v: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """GLSL-style reflect of an *incident* vector: v - 2(v.n)n."""
    return v - 2.0 * dot(v, n, keepdims=True) * n


def orthonormal_basis(n: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Branchless (Pixar/Duff) orthonormal basis around unit normal `n`.

    Returns tangent/bitangent (uu, vv) such that (uu, vv, n) is an
    orthonormal frame. Matches reference src/math.rs:49-59, including the
    sign convention `ks = signum(n.z)` (signum(+0) = +1).
    """
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    ks = jnp.copysign(1.0, nz)
    ka = 1.0 / (1.0 + jnp.abs(nz))
    kb = -ks * nx * ny * ka
    uu = jnp.stack([1.0 - nx * nx * ka, ks * kb, -ks * nx], axis=-1)
    vv = jnp.stack([kb, ks - ny * ny * ka * ks, -ny], axis=-1)
    return uu, vv


def basis_transform(uu: jnp.ndarray, vv: jnp.ndarray, ww: jnp.ndarray,
                    v: jnp.ndarray) -> jnp.ndarray:
    """Express local-space vector v=(x,y,z) in world space: x*uu+y*vv+z*ww.

    Matches the reference's `Wat3 * Wec3` column-matrix product
    (basis.cols[0..2], e.g. src/light.rs:63-65).
    """
    return (uu * v[..., 0:1] + vv * v[..., 1:2] + ww * v[..., 2:3])
