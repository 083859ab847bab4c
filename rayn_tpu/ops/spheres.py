"""Batched analytic sphere intersection.

The reference intersects one wide (4-lane) ray packet against one sphere
at a time inside a fold over hitables (reference src/sphere.rs:48-72,
src/hitable.rs:170-210). Here the whole wavefront hits all K spheres at
once as an [N, K] broadcast — XLA fuses the quadratic into a handful of
VPU ops and the min-reduction replaces the fold.
"""

from __future__ import annotations

import jax.numpy as jnp

from rayn_tpu.utils import vecmath

MISS = jnp.float32(3.4e38)  # f32::MAX stand-in (reference src/sphere.rs:57)


def hit(origin: jnp.ndarray, direction: jnp.ndarray, centers: jnp.ndarray,
        radii: jnp.ndarray, t_max: jnp.ndarray) -> jnp.ndarray:
    """Closest valid hit t per (ray, sphere): [N, K].

    Semantics match reference src/sphere.rs:48-72: both quadratic roots,
    valid iff t > 1e-4 and t <= t_max and discriminant > 0; prefers the
    near root; misses are MISS.

    origin/direction: [N, 3]; centers: [N, K, 3] (already sampled at each
    ray's time — motion blur for free, reference src/sphere.rs:49);
    radii: [K]; t_max: [N].
    """
    oc = origin[:, None, :] - centers                    # [N, K, 3]
    b = vecmath.dot(oc, direction[:, None, :])           # [N, K]
    c = vecmath.length_sq(oc) - radii[None, :] ** 2
    descrim = b * b - c
    desc_pos = descrim > 0.0
    desc_sqrt = jnp.sqrt(jnp.maximum(descrim, 0.0))

    t1 = -b - desc_sqrt
    t2 = -b + desc_sqrt
    tm = t_max[:, None]
    t1_valid = (t1 > 1e-4) & (t1 <= tm) & desc_pos
    t2_valid = (t2 > 1e-4) & (t2 <= tm) & desc_pos
    t = jnp.where(t1_valid, t1, t2)
    return jnp.where(t1_valid | t2_valid, t, MISS)


def occluded(start: jnp.ndarray, end: jnp.ndarray, centers: jnp.ndarray,
             radii: jnp.ndarray) -> jnp.ndarray:
    """Boolean [N, K]: does sphere k block the segment start->end?

    Matches reference src/sphere.rs:24-46: occluded iff the *near* root
    min(t1,t2) > 1e-3 and t1 <= |segment| and discriminant > 0.
    """
    dir_full = end - start
    dist = vecmath.length(dir_full)
    d = dir_full / dist[:, None]

    oc = start[:, None, :] - centers
    b = vecmath.dot(oc, d[:, None, :])
    c = vecmath.length_sq(oc) - radii[None, :] ** 2
    descrim = b * b - c
    desc_pos = descrim > 0.0
    desc_sqrt = jnp.sqrt(jnp.maximum(descrim, 0.0))
    t1 = -b - desc_sqrt
    t2 = -b + desc_sqrt
    tmin = jnp.minimum(t1, t2)
    return (tmin > 1e-3) & (t1 <= dist[:, None]) & desc_pos
