"""Signed-distance-field programs.

An SDF here is `(dist_fn, params)`: `dist_fn(params, p[..., 3]) -> [...]`
where `params` is a pytree of arrays and `dist_fn` is a pure jnp closure
held statically by the scene. This replaces both the reference's
first-party `MandelBox` distance estimator (reference src/sdf.rs:104-188)
and the `sdfu` crate's combinator surface (SURVEY.md §2b): primitives and
combinators below compose into arbitrary jit-compiled distance programs
that vectorize over the whole wavefront on the VPU.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax.numpy as jnp

from rayn_tpu.utils import vecmath

DistFn = Callable[[Any, jnp.ndarray], jnp.ndarray]


class SdfProgram(NamedTuple):
    """Static dist function + pytree of parameters."""
    fn: DistFn
    params: Any

    def dist(self, p: jnp.ndarray) -> jnp.ndarray:
        return self.fn(self.params, p)


# ---------------------------------------------------------------------------
# MandelBox distance estimator
# ---------------------------------------------------------------------------

class MandelBoxParams(NamedTuple):
    scale: jnp.ndarray        # e.g. -2.1 (reference src/setup.rs:84)
    box_l: jnp.ndarray        # box-fold side length (1.0)
    min_rad_sq: jnp.ndarray   # sphere-fold min radius^2 (0.01^2)
    fixed_rad_sq: jnp.ndarray  # sphere-fold fixed radius^2 (1.9^2)


def mandelbox(iterations: int, box_fold_l: float, sphere_min_rad: float,
              sphere_fixed_rad: float, scale: float) -> SdfProgram:
    """MandelBox distance estimator.

    Semantics match reference src/sdf.rs:126-141 exactly:
    per iteration: box fold (clamp-reflect, src/sdf.rs:160-163), sphere
    fold (radial inversion, src/sdf.rs:181-187), then p = p*scale + p0 and
    running derivative dr = -dr*scale + 1; DE = |p| / |dr|.
    """
    params = MandelBoxParams(
        scale=jnp.float32(scale),
        box_l=jnp.float32(box_fold_l),
        min_rad_sq=jnp.float32(sphere_min_rad * sphere_min_rad),
        fixed_rad_sq=jnp.float32(sphere_fixed_rad * sphere_fixed_rad),
    )

    def fn(prm: MandelBoxParams, p: jnp.ndarray) -> jnp.ndarray:
        offset = p
        dr = jnp.ones(p.shape[:-1], p.dtype)
        for _ in range(iterations):
            # box fold: clamp(p, -l, l) * 2 - p
            p = jnp.clip(p, -prm.box_l, prm.box_l) * 2.0 - p
            # sphere fold
            r2 = vecmath.length_sq(p)
            mul = jnp.maximum(1.0, prm.fixed_rad_sq /
                              jnp.maximum(prm.min_rad_sq, r2))
            p = p * mul[..., None]
            dr = dr * mul
            p = p * prm.scale + offset
            dr = -dr * prm.scale + 1.0
        return vecmath.length(p) / jnp.abs(dr)

    return SdfProgram(fn, params)


# ---------------------------------------------------------------------------
# Primitive SDFs (the sdfu-crate surface, re-designed as jnp programs)
# ---------------------------------------------------------------------------

def sphere(radius: float) -> SdfProgram:
    r = jnp.float32(radius)
    return SdfProgram(lambda prm, p: vecmath.length(p) - prm, r)


def box(half_extents) -> SdfProgram:
    he = jnp.asarray(half_extents, jnp.float32)

    def fn(prm, p):
        q = jnp.abs(p) - prm
        outside = vecmath.length(jnp.maximum(q, 0.0))
        inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
        return outside + inside
    return SdfProgram(fn, he)


def torus(major: float, minor: float) -> SdfProgram:
    prm = (jnp.float32(major), jnp.float32(minor))

    def fn(prm, p):
        maj, mino = prm
        qx = jnp.sqrt(p[..., 0] ** 2 + p[..., 2] ** 2) - maj
        return jnp.sqrt(qx * qx + p[..., 1] ** 2) - mino
    return SdfProgram(fn, prm)


def plane(normal, offset: float = 0.0) -> SdfProgram:
    prm = (vecmath.normalize(jnp.asarray(normal, jnp.float32)),
           jnp.float32(offset))

    def fn(prm, p):
        n, d = prm
        return vecmath.dot(p, jnp.broadcast_to(n, p.shape)) + d
    return SdfProgram(fn, prm)


# ---------------------------------------------------------------------------
# Combinators
# ---------------------------------------------------------------------------

def union(a: SdfProgram, b: SdfProgram) -> SdfProgram:
    return SdfProgram(
        lambda prm, p: jnp.minimum(a.fn(prm[0], p), b.fn(prm[1], p)),
        (a.params, b.params))


def intersection(a: SdfProgram, b: SdfProgram) -> SdfProgram:
    return SdfProgram(
        lambda prm, p: jnp.maximum(a.fn(prm[0], p), b.fn(prm[1], p)),
        (a.params, b.params))


def subtraction(a: SdfProgram, b: SdfProgram) -> SdfProgram:
    """a minus b."""
    return SdfProgram(
        lambda prm, p: jnp.maximum(a.fn(prm[0], p), -b.fn(prm[1], p)),
        (a.params, b.params))


def smooth_union(a: SdfProgram, b: SdfProgram, k: float) -> SdfProgram:
    kf = jnp.float32(k)

    def fn(prm, p):
        pa, pb, k = prm
        d1, d2 = a.fn(pa, p), b.fn(pb, p)
        h = jnp.clip(0.5 + 0.5 * (d2 - d1) / k, 0.0, 1.0)
        return d2 + (d1 - d2) * h - k * h * (1.0 - h)
    return SdfProgram(fn, (a.params, b.params, kf))


def translate(a: SdfProgram, offset) -> SdfProgram:
    off = jnp.asarray(offset, jnp.float32)
    return SdfProgram(
        lambda prm, p: a.fn(prm[0], p - prm[1]), (a.params, off))


def scale(a: SdfProgram, factor: float) -> SdfProgram:
    s = jnp.float32(factor)
    return SdfProgram(
        lambda prm, p: a.fn(prm[0], p / prm[1]) * prm[1], (a.params, s))


def rounded(a: SdfProgram, radius: float) -> SdfProgram:
    r = jnp.float32(radius)
    return SdfProgram(
        lambda prm, p: a.fn(prm[0], p) - prm[1], (a.params, r))


# ---------------------------------------------------------------------------
# Normal estimation
# ---------------------------------------------------------------------------

_TETRA = jnp.asarray([[1.0, -1.0, -1.0],
                      [-1.0, 1.0, -1.0],
                      [-1.0, -1.0, 1.0],
                      [1.0, 1.0, 1.0]], jnp.float32)


def tetrahedral_normal(sdf: SdfProgram, p: jnp.ndarray,
                       eps: jnp.ndarray) -> jnp.ndarray:
    """4-tap tetrahedral gradient estimate, normalized.

    The TPU analog of sdfu's `normals_fast(eps)` used by the reference at
    shading time with eps = half_pixel_size (reference src/sdf.rs:92-96).
    eps: [...] per-point step size.
    """
    e = eps[..., None]
    n = jnp.zeros_like(p)
    for i in range(4):
        k = _TETRA[i]
        n = n + k * sdf.dist(p + k * e)[..., None]
    return vecmath.normalize(n, eps=1e-20)
