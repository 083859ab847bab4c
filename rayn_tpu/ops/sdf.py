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
# Component ("SoA") form: fn_c(params, x, y, z) -> dist, where x/y/z are
# same-shaped arrays. This is the form the Pallas march kernel consumes —
# TPU vector layout wants the wavefront in (sublane, lane) tiles per
# component, not a trailing axis of 3.
DistFnC = Callable[[Any, jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]


class SdfProgram(NamedTuple):
    """Static dist function + pytree of parameters.

    fn_c is the component-wise twin of fn (None disables the Pallas fast
    path for this program; the jnp march still works).

    reduce_fn (optional): a factory `iterations -> (fn, fn_c)` producing
    a cheaper, lower-fidelity variant of the distance estimator — e.g. a
    truncated-iteration MandelBox DE. Used for *shadow* marches only
    (RenderSettings.shadow_de_iterations): visibility tests tolerate far
    less DE precision than primary hits, and the DE cost is linear in
    iterations (the fractal shadow march is the dominant device-time
    term, BASELINE.md round-2 attribution)."""
    fn: DistFn
    params: Any
    fn_c: DistFnC | None = None
    reduce_fn: Any = None

    def dist(self, p: jnp.ndarray) -> jnp.ndarray:
        return self.fn(self.params, p)

    def dist_c(self, x, y, z):
        return self.fn_c(self.params, x, y, z)

    def reduced(self, iterations: int) -> "SdfProgram":
        """The reduce_fn variant at `iterations` (self if unsupported)."""
        if self.reduce_fn is None or not iterations:
            return self
        fn, fn_c = self.reduce_fn(iterations)
        return SdfProgram(fn, self.params, fn_c)


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

    def make(iters: int):
        def fn_c(prm: MandelBoxParams, x, y, z):
            ox, oy, oz = x, y, z
            dr = jnp.ones_like(x)
            for _ in range(iters):
                # box fold: clamp(p, -l, l) * 2 - p
                x = jnp.clip(x, -prm.box_l, prm.box_l) * 2.0 - x
                y = jnp.clip(y, -prm.box_l, prm.box_l) * 2.0 - y
                z = jnp.clip(z, -prm.box_l, prm.box_l) * 2.0 - z
                # sphere fold
                r2 = x * x + y * y + z * z
                mul = jnp.maximum(1.0, prm.fixed_rad_sq /
                                  jnp.maximum(prm.min_rad_sq, r2))
                x, y, z = x * mul, y * mul, z * mul
                dr = dr * mul
                x = x * prm.scale + ox
                y = y * prm.scale + oy
                z = z * prm.scale + oz
                dr = -dr * prm.scale + 1.0
            return jnp.sqrt(x * x + y * y + z * z) / jnp.abs(dr)

        def fn(prm: MandelBoxParams, p: jnp.ndarray) -> jnp.ndarray:
            return fn_c(prm, p[..., 0], p[..., 1], p[..., 2])

        return fn, fn_c

    fn, fn_c = make(iterations)
    return SdfProgram(fn, params, fn_c, reduce_fn=make)


# ---------------------------------------------------------------------------
# Primitive SDFs (the sdfu-crate surface, re-designed as jnp programs)
# ---------------------------------------------------------------------------

def _from_c(fn_c, params) -> SdfProgram:
    def fn(prm, p):
        return fn_c(prm, p[..., 0], p[..., 1], p[..., 2])
    return SdfProgram(fn, params, fn_c)


def sphere(radius: float) -> SdfProgram:
    return _from_c(
        lambda prm, x, y, z: jnp.sqrt(x * x + y * y + z * z) - prm,
        jnp.float32(radius))


def box(half_extents) -> SdfProgram:
    he = tuple(jnp.float32(v) for v in half_extents)

    def fn_c(prm, x, y, z):
        qx = jnp.abs(x) - prm[0]
        qy = jnp.abs(y) - prm[1]
        qz = jnp.abs(z) - prm[2]
        outside = jnp.sqrt(jnp.maximum(qx, 0.0) ** 2
                           + jnp.maximum(qy, 0.0) ** 2
                           + jnp.maximum(qz, 0.0) ** 2)
        inside = jnp.minimum(jnp.maximum(qx, jnp.maximum(qy, qz)), 0.0)
        return outside + inside
    return _from_c(fn_c, he)


def torus(major: float, minor: float) -> SdfProgram:
    prm = (jnp.float32(major), jnp.float32(minor))

    def fn_c(prm, x, y, z):
        maj, mino = prm
        qx = jnp.sqrt(x * x + z * z) - maj
        return jnp.sqrt(qx * qx + y * y) - mino
    return _from_c(fn_c, prm)


def plane(normal, offset: float = 0.0) -> SdfProgram:
    import numpy as _np
    n = _np.asarray(normal, _np.float64)
    n = n / _np.linalg.norm(n)
    prm = (jnp.float32(n[0]), jnp.float32(n[1]), jnp.float32(n[2]),
           jnp.float32(offset))

    def fn_c(prm, x, y, z):
        nx, ny, nz, d = prm
        return x * nx + y * ny + z * nz + d
    return _from_c(fn_c, prm)


# ---------------------------------------------------------------------------
# Combinators
# ---------------------------------------------------------------------------

def union(a: SdfProgram, b: SdfProgram) -> SdfProgram:
    return _from_c(
        lambda prm, x, y, z: jnp.minimum(a.fn_c(prm[0], x, y, z),
                                         b.fn_c(prm[1], x, y, z)),
        (a.params, b.params))


def intersection(a: SdfProgram, b: SdfProgram) -> SdfProgram:
    return _from_c(
        lambda prm, x, y, z: jnp.maximum(a.fn_c(prm[0], x, y, z),
                                         b.fn_c(prm[1], x, y, z)),
        (a.params, b.params))


def subtraction(a: SdfProgram, b: SdfProgram) -> SdfProgram:
    """a minus b."""
    return _from_c(
        lambda prm, x, y, z: jnp.maximum(a.fn_c(prm[0], x, y, z),
                                         -b.fn_c(prm[1], x, y, z)),
        (a.params, b.params))


def smooth_union(a: SdfProgram, b: SdfProgram, k: float) -> SdfProgram:
    kf = jnp.float32(k)

    def fn_c(prm, x, y, z):
        pa, pb, k = prm
        d1, d2 = a.fn_c(pa, x, y, z), b.fn_c(pb, x, y, z)
        h = jnp.clip(0.5 + 0.5 * (d2 - d1) / k, 0.0, 1.0)
        return d2 + (d1 - d2) * h - k * h * (1.0 - h)
    return _from_c(fn_c, (a.params, b.params, kf))


def translate(a: SdfProgram, offset) -> SdfProgram:
    off = tuple(jnp.float32(v) for v in offset)
    return _from_c(
        lambda prm, x, y, z: a.fn_c(prm[0], x - prm[1][0], y - prm[1][1],
                                    z - prm[1][2]),
        (a.params, off))


def scale(a: SdfProgram, factor: float) -> SdfProgram:
    s = jnp.float32(factor)
    return _from_c(
        lambda prm, x, y, z: a.fn_c(prm[0], x / prm[1], y / prm[1],
                                    z / prm[1]) * prm[1],
        (a.params, s))


def rounded(a: SdfProgram, radius: float) -> SdfProgram:
    r = jnp.float32(radius)
    return _from_c(
        lambda prm, x, y, z: a.fn_c(prm[0], x, y, z) - prm[1], (a.params, r))


# ---------------------------------------------------------------------------
# Normal estimation
# ---------------------------------------------------------------------------

# sdfu normals_fast tetrahedral tap directions. Plain python tuples —
# the single source for BOTH the jnp path below and the static in-kernel
# loops (ops/intersect_pallas.py), and no device array is created at
# import time (a module import must not require a live backend).
TETRA_TAPS = ((1.0, -1.0, -1.0), (-1.0, 1.0, -1.0),
              (-1.0, -1.0, 1.0), (1.0, 1.0, 1.0))


def tetrahedral_normal(sdf: SdfProgram, p: jnp.ndarray,
                       eps: jnp.ndarray) -> jnp.ndarray:
    """4-tap tetrahedral gradient estimate, normalized.

    The TPU analog of sdfu's `normals_fast(eps)` used by the reference at
    shading time with eps = half_pixel_size (reference src/sdf.rs:92-96).
    eps: [...] per-point step size.
    """
    e = eps[..., None]
    n = jnp.zeros_like(p)
    for tap in TETRA_TAPS:
        k = jnp.asarray(tap, p.dtype)
        n = n + k * sdf.dist(p + k * e)[..., None]
    return vecmath.normalize(n, eps=1e-20)
