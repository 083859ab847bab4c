"""Fused per-bounce shadow pipeline as one Pallas kernel.

The unfused integrator builds 12 shadow segments per bounce (L NEE +
VM*L equi-angular volume samples) through ~40 XLA fusions whose
intermediates round-trip HBM (~40 ms/bounce of pure bandwidth in the
1M-ray trace), then tests them in one batched occlusion kernel. Here the
whole per-bounce shadow pipeline — R_d/hash sampler evaluation, light
pick, cone sampling, BSDF eval, transmittance, sphere occlusion, SDF
shadow march, and radiance accumulation — runs inside a single Pallas
kernel; the only HBM traffic is the per-lane shading state in and a
radiance delta out.

Semantics mirror rayn_tpu.render.integrator.bounce steps 3+4 exactly
(reference src/integrator.rs:73-132, :207-281), with the same sampler
set-id layout (utils/rng.py) so the random streams are identical to the
unfused path. The equi-angular *distance* samples are precomputed
outside (jnp.arctan2/tan are not reliably lowered by Mosaic) and passed
in per volume march.

Eligibility (checked by `fused_ok`, shared with the fused intersect
kernel): every traced-SDF instance must have a component-form `fn_c`
with only SCALAR parameter leaves (they ride in SMEM), and
march_relaxation must be 1.0 (the relaxed march carries extra state).
Everything else runs fused: any number of SDF instances (the kernels
fold closest-hit/occlusion across all of them, reference
src/hitable.rs:163-210), MIS, and animated light/sphere channels with
NO knot limit — animated positions are resolved OUTSIDE the kernels at
each lane's time and enter as per-lane VMEM inputs (see
_site_light_positions; the in-kernel per-lane knot lerp measured +40%
on whole passes from register pressure, BASELINE.md round-4).
Ineligible scenes fall back to the unfused path with a one-time
warning.

Fidelity note (measured on v5e): in interpret mode the kernel matches
the unfused path to f32 association order (tests/test_fused_shadows.py).
On real Mosaic the hardware transcendental/rsqrt approximations differ
from XLA at the ulp level, and two ill-conditioned cone-sampling terms —
cos_alpha's catastrophic cancellation (dist_sq + r2 - ds^2 with
ds ~ dist) and the small-cone pdf's 1/(1 - cos_theta_max) — amplify
those ulps ~1000x on a few %% of lanes. The result is per-SAMPLE
decorrelation equivalent to a seed change, not bias: image means match
to 1e-5 relative, per-pixel RMSE 1.6e-3 at 128 spp (Monte Carlo noise
scale). bench.py --selftest gates this statistically on every run; the
exact-equality invariants (pass-size/device-count splits) are unaffected
because the fused kernel is itself deterministic.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rayn_tpu.ops.march_pallas import (LANES, _chained_occl_core,
                                       _flatten_params, _segment_entry,
                                       _to_rows)
from rayn_tpu.scene.scene import (DIELECTRIC, EMISSIVE, LAMBERT, METALLIC,
                                  REFRACTIVE, SKY)
from rayn_tpu.utils import rng as rng_mod

_PI = 3.14159265358979
_TWO_PI = 2.0 * _PI
_F0 = 0.04

# Test hook: run the fused kernel in interpret mode on CPU (the fused_ok
# backend gate is bypassed). Set by tests only.
INTERPRET = False

# De-duped eligibility-cliff warnings: silently dropping to the ~2x
# slower unfused path (round-2 verdict: the cliffs were invisible).
_WARNED: set = set()


class SdfStatic(NamedTuple):
    """Static half of one traced-SDF instance as the fused kernels see
    it: the component-form dist function, its parameter-pytree layout
    (the scalar leaves themselves ride in the SMEM const vector, packed
    consecutively per instance), and the instance's bounding-volume
    clip radius (0 = no clip). One entry per instance, in object-id
    order — the reference's HitableStore fold domain
    (src/hitable.rs:170-210)."""
    fn_c: object
    treedef: object
    n_leaves: int
    bv_r: float


class ShadowCfg(NamedTuple):
    """Static configuration of the fused shadow/bounce-tail/sort-key
    kernels (closed over via functools.partial; everything here is
    compile-time)."""
    sdfs: tuple          # of SdfStatic, object-id order; () = no SDF
    sampler: str
    num_1d_sets: int
    L: int               # NEE light samples per vertex
    VM: int              # volume marches per vertex
    NL: int              # lights in the scene
    K: int               # spheres in the scene
    has_ext: bool
    has_scat: bool
    eps_c: float
    eps_l: float
    max_steps: int
    correction: float
    vm_correction: float
    mis: bool
    compat_reflect: bool
    TL: int              # light-channel knots (1 = constant)
    TS: int              # sphere-channel knots (1 = constant)
    chained: int         # 0 = sequential; else the advance group size


def _flatten_instances(progs_bvs):
    """Flatten every instance's scalar parameter leaves into ONE flat
    f32 vector (consecutive per instance — the head of the SMEM const
    vector) plus the tuple of SdfStatic descriptors.

    progs_bvs: list of (SdfProgram, bound_radius)."""
    parts, statics = [], []
    for prog, bv in progs_bvs:
        flat, treedef, nl = _flatten_params(prog.params)
        if nl:
            parts.append(flat.reshape(-1))
        statics.append(SdfStatic(prog.fn_c, treedef, nl, float(bv)))
    flat = (jnp.concatenate(parts) if parts
            else jnp.zeros((0,), jnp.float32))
    return flat, tuple(statics)


def _unpack_instances(sdfs, const_ref):
    """Per-instance parameter pytrees from the SMEM const vector's head;
    returns (list of pytrees, total leaf count)."""
    prms, base = [], 0
    for inst in sdfs:
        leaves = [const_ref[0, base + i] for i in range(inst.n_leaves)]
        prms.append(jax.tree.unflatten(inst.treedef, leaves))
        base += inst.n_leaves
    return prms, base


def warn_fallback(feature: str, reason: str,
                  consequence: str = "falling back to the ~2x slower "
                                     "unfused path for this render") -> None:
    """Warn (once per feature+reason per process) that a fast path is
    unavailable. The default consequence describes the fused-kernel
    fallback; scheduling-only features (cost sorting) pass their own —
    they never change which kernels run, only their block packing."""
    key = (feature, reason)
    if key in _WARNED:
        return
    _WARNED.add(key)
    import warnings
    warnings.warn(f"rayn_tpu: {feature} unavailable ({reason}); "
                  f"{consequence}", RuntimeWarning, stacklevel=3)


def _clamp_block_rows(block_rows: int, data, static) -> int:
    """Animated (TL/TS > 1) scenes feed the fused kernels up to 54
    extra per-lane site columns (externally resolved light/sphere
    positions, _site_args), which pushes a 64-row block's Mosaic
    scoped-vmem just past the 16M limit (measured 16.19M OOM at
    TL=TS=8, round-5). 48 rows restores ~25% headroom. Block size
    never changes per-lane results (the bit-identity invariants are
    block-size independent), only block packing."""
    TL = (int(data.light_pos.values.shape[1])
          if int(static.n_lights) else 1)
    TS = (int(data.sphere_centers.values.shape[1])
          if int(static.n_spheres) else 1)
    if TL > 1 or TS > 1:
        return min(block_rows, 48)
    return block_rows


def _eligibility_reason(settings, static, data) -> str | None:
    """Scene/settings facts that keep the fused kernels off (shared by
    fused_ok and fused_intersect_ok); None = eligible. There is no
    limit on instance count, animation knots, or MIS — only the SDF
    parameter representation (scalar SMEM leaves) and plain (relax=1)
    marching gate the fused family."""
    if settings.march_relaxation != 1.0:
        return "march_relaxation != 1.0 (relaxed march carries extra state)"
    if static.has_sdf:
        for i, (prog, _mat, _bv) in enumerate(static.sdf_instances(data)):
            if prog.fn_c is None:
                return f"SDF instance {i} has no component-form fn_c"
            if any(getattr(jnp.asarray(leaf), "shape", ()) != ()
                   for leaf in jax.tree.leaves(prog.params)):
                return (f"SDF instance {i} has non-scalar parameter "
                        "leaves")
    return None


def fused_ok(settings, static, data) -> bool:
    """Whether the fused shadow kernel can replace the unfused path.
    Scenes without an SDF are eligible too (the kernel simply skips the
    shadow march and tests spheres only)."""
    if not (settings.use_pallas_occlusion and settings.use_fused_shadows):
        return False
    if jax.default_backend() == "cpu" and not INTERPRET:
        return False
    reason = _eligibility_reason(settings, static, data)
    if reason is not None:
        warn_fallback("fused shadow/finish kernels", reason)
        return False
    return True


# --------------------------------------------------------------------------
# In-kernel helpers (component form, [rows, LANES] arrays)
# --------------------------------------------------------------------------

def _onb(nx, ny, nz):
    """Branchless Pixar/Duff ONB; mirrors utils.vecmath.orthonormal_basis
    (reference src/math.rs:49-59 incl. the signum(+0)=+1 convention)."""
    ks = jnp.where(jnp.signbit(nz), -1.0, 1.0)
    ka = 1.0 / (1.0 + jnp.abs(nz))
    kb = -ks * nx * ny * ka
    uu = (1.0 - nx * nx * ka, ks * kb, -ks * nx)
    vv = (kb, ks - ny * ny * ka * ks, -ny)
    return uu, vv


def _u32(x):
    """Coerce a python int or traced scalar to uint32."""
    if isinstance(x, int):
        return jnp.uint32(x)
    return x.astype(jnp.uint32)


def _sample_1d(sampler, frame_u32, set_id, sample_idx, pixel):
    """Mirrors utils.rng.sample_1d. set_id may be a static int or a
    traced scalar (SMEM-carried, so one Mosaic kernel serves every
    bounce depth)."""
    sid = _u32(set_id)
    if sampler == "hash":
        return rng_mod.hash_to_unit_f32(rng_mod.hash_combine(
            pixel, sample_idx, jnp.uint32(rng_mod._SET_SALT_1D) ^ sid,
            frame_u32))
    base = rng_mod._rd_bits(rng_mod._A1, frame_u32 + sid, sample_idx)
    scr = rng_mod.hash_to_unit_f32(rng_mod.hash_combine(
        pixel, jnp.uint32(rng_mod._SET_SALT_1D) ^ sid, frame_u32))
    return jnp.mod(base + scr, 1.0)


def _sample_2d(sampler, num_1d_sets, frame_u32, set_id, sample_idx, pixel):
    """Mirrors utils.rng.sample_2d; returns (u, v). set_id may be static
    or traced (see _sample_1d)."""
    sid = _u32(set_id)
    if sampler == "hash":
        u = rng_mod.hash_to_unit_f32(rng_mod.hash_combine(
            pixel, sample_idx,
            jnp.uint32(rng_mod._SET_SALT_2D) ^ (sid * jnp.uint32(2)),
            frame_u32))
        v = rng_mod.hash_to_unit_f32(rng_mod.hash_combine(
            pixel, sample_idx,
            jnp.uint32(rng_mod._SET_SALT_2D)
            ^ (sid * jnp.uint32(2) + jnp.uint32(1)), frame_u32))
        return u, v
    base = frame_u32 + jnp.uint32(num_1d_sets) + sid
    bu = rng_mod._rd_bits(rng_mod._A2[0], base, sample_idx)
    bv = rng_mod._rd_bits(rng_mod._A2[1], base, sample_idx)
    scr_u = rng_mod.hash_to_unit_f32(rng_mod.hash_combine(
        pixel, jnp.uint32(rng_mod._SET_SALT_2D) ^ (sid * jnp.uint32(2)),
        frame_u32))
    scr_v = rng_mod.hash_to_unit_f32(rng_mod.hash_combine(
        pixel,
        jnp.uint32(rng_mod._SET_SALT_2D)
        ^ (sid * jnp.uint32(2) + jnp.uint32(1)), frame_u32))
    return jnp.mod(bu + scr_u, 1.0), jnp.mod(bv + scr_v, 1.0)


def _interp_weights(t, t0, t1, T):
    """Per-lane knot interpolation state for a T-knot uniform channel;
    mirrors scene.animation.sample_batched_at (u clip, floor, clamp)."""
    u = (t - t0) / (t1 - t0) * float(T - 1)
    u = jnp.clip(u, 0.0, float(T - 1))
    i0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, T - 2)
    frac = u - i0.astype(jnp.float32)
    return i0, frac

def _interp3(knots, i0, frac):
    """Lerp a 3-vector channel given per-knot (x, y, z) scalar triples
    (SMEM loads) and _interp_weights state. T == 1 returns the constant."""
    T = len(knots)
    if T == 1:
        return knots[0]
    x = y = z = 0.0
    for j in range(T - 1):
        m = (i0 == j).astype(jnp.float32)
        w0 = m * (1.0 - frac)
        w1 = m * frac
        x = x + w0 * knots[j][0] + w1 * knots[j + 1][0]
        y = y + w0 * knots[j][1] + w1 * knots[j + 1][1]
        z = z + w0 * knots[j][2] + w1 * knots[j + 1][2]
    return x, y, z


def _pick_light(u, lights, pos=None):
    """One-hot select of (pos, rad, em, paired) over the per-light scalar
    tuples (SMEM loads). Mirrors integrator._pick_lights + _gather_lights
    for constant channels.

    pos: optional per-lane (x, y, z) refs of the PICKED light's position,
    resolved outside the kernel (animated channels — the exact-u32
    sampler makes the outside pick identical; _site_light_positions).
    When given, positions bypass the one-hot entirely and load from
    VMEM at the use site; the scalar tail (radius/emission/paired, never
    animated) still selects from SMEM."""
    n_l = len(lights)
    idx = jnp.clip(jnp.floor(u * n_l).astype(jnp.int32), 0, n_l - 1)
    px = py = pz = rad = er = eg = eb = paired = 0.0
    for l, (lx, ly, lz, lr, lem_r, lem_g, lem_b, lpair) in enumerate(lights):
        m = (idx == l).astype(jnp.float32)
        if pos is None:
            px = px + m * lx
            py = py + m * ly
            pz = pz + m * lz
        rad = rad + m * lr
        er = er + m * lem_r
        eg = eg + m * lem_g
        eb = eb + m * lem_b
        paired = paired + m * lpair
    if pos is not None:
        px, py, pz = pos[0][:], pos[1][:], pos[2][:]
    return px, py, pz, rad, er, eg, eb, paired


def _sample_cone(u1, u2, lx, ly, lz, lrad, px, py, pz):
    """Visible-cap sphere-light sample; mirrors ops.lights.sample_cone
    (reference src/light.rs:38-72). Returns (end xyz, pdf)."""
    dlx, dly, dlz = lx - px, ly - py, lz - pz
    dist_sq = dlx * dlx + dly * dly + dlz * dlz
    dist = jnp.sqrt(dist_sq)
    inv = 1.0 / dist
    wx, wy, wz = dlx * inv, dly * inv, dlz * inv
    nx, ny, nz = -wx, -wy, -wz
    uu, vv = _onb(nx, ny, nz)

    r2 = lrad * lrad
    sin_theta_max_2 = r2 / dist_sq
    cos_theta_max = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_theta_max_2))
    cos_theta = (1.0 - u1) + u1 * cos_theta_max
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = u2 * _TWO_PI

    ds = dist * cos_theta - jnp.sqrt(
        jnp.maximum(0.0, r2 - dist_sq * sin_theta * sin_theta))
    cos_alpha = (dist_sq + r2 - ds * ds) / (2.0 * dist * lrad)
    sin_alpha = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_alpha * cos_alpha))

    sc = sin_alpha * jnp.cos(phi)
    ss = sin_alpha * jnp.sin(phi)
    ex = lx + (uu[0] * sc + vv[0] * ss + nx * cos_alpha) * lrad
    ey = ly + (uu[1] * sc + vv[1] * ss + ny * cos_alpha) * lrad
    ez = lz + (uu[2] * sc + vv[2] * ss + nz * cos_alpha) * lrad
    # uniform_cone_pdf (utils/sampling.py; reference src/light.rs:105-107)
    pdf = 1.0 / (_TWO_PI * (1.0 - cos_theta_max))
    return ex, ey, ez, pdf


def _eval_f(kind, car, cag, cab, power, wox, woy, woz, wix, wiy, wiz,
            nx, ny, nz):
    """BSDF f(wo, wi) for NEE; mirrors ops.bsdf.eval_f (reference
    src/material.rs:139-141, :195-205). Returns (fr, fg, fb)."""
    inv_pi = 1.0 / _PI
    d = jnp.maximum(0.0, wix * nx + wiy * ny + wiz * nz)
    one_minus = 1.0 - d
    om2 = one_minus * one_minus
    om5 = om2 * om2 * one_minus
    fresnel = _F0 + (1.0 - _F0) * om5
    hx, hy, hz = wox + wix, woy + wiy, woz + wiz
    hlen = jnp.sqrt(hx * hx + hy * hy + hz * hz)
    hinv = 1.0 / jnp.maximum(hlen, 1e-20)
    hdn = jnp.maximum(0.0, (hx * nx + hy * ny + hz * nz) * hinv)
    cos_alpha = jnp.power(hdn, power)
    spec_factor = cos_alpha * (power + 2.0) / (2.0 * _PI)
    spec_f = spec_factor * fresnel
    one_minus_f = 1.0 - fresnel

    is_lam = (kind == LAMBERT).astype(jnp.float32)
    is_diel = (kind == DIELECTRIC).astype(jnp.float32)
    is_met = (kind == METALLIC).astype(jnp.float32)

    dm2 = om2  # (1-d)^5 for the metallic colored Fresnel
    dm5 = om5

    def chan(c):
        lam = c * inv_pi
        diel = spec_f + c * inv_pi * one_minus_f
        fres_c = c + (1.0 - c) * dm5
        met = fres_c * spec_factor
        return is_lam * lam + is_diel * diel + is_met * met

    return chan(car), chan(cag), chan(cab)


def _power_heuristic(nf, f_pdf, ng, g_pdf):
    """Balance-power MIS heuristic; mirrors utils.sampling.power_heuristic
    (reference src/math.rs:193-199)."""
    f = nf * f_pdf
    g = ng * g_pdf
    return f * f / (f * f + g * g)


def _eval_pdf(compat_reflect, kind, power, wox, woy, woz,
              wix, wiy, wiz, nx, ny, nz):
    """Solid-angle pdf that _scatter would have sampled wi; mirrors
    ops.bsdf.eval_pdf (used for MIS weights only)."""
    cos_i = jnp.maximum(0.0, wix * nx + wiy * ny + wiz * nz)
    lambert_pdf = cos_i / _PI
    diffuse_pdf = jnp.maximum(1e-5, lambert_pdf)

    won = wox * nx + woy * ny + woz * nz
    if compat_reflect:
        rx, ry, rz = (wox - 2.0 * won * nx, woy - 2.0 * won * ny,
                      woz - 2.0 * won * nz)
    else:
        rx, ry, rz = (2.0 * won * nx - wox, 2.0 * won * ny - woy,
                      2.0 * won * nz - woz)
    cos_alpha = jnp.maximum(0.0, rx * wix + ry * wiy + rz * wiz)
    cos_alpha_pow = jnp.maximum(jnp.power(cos_alpha, power), F32_EPS)
    spec_pdf = (power + 1.0) / _TWO_PI * cos_alpha_pow

    cos = jnp.abs(won)
    one_m = 1.0 - cos
    om2 = one_m * one_m
    fresnel = _F0 + (1.0 - _F0) * (om2 * om2 * one_m)
    diel_pdf = fresnel * spec_pdf + (1.0 - fresnel) * diffuse_pdf

    pdf = jnp.where(kind == LAMBERT, lambert_pdf, 0.0)
    pdf = jnp.where(kind == DIELECTRIC, diel_pdf, pdf)
    pdf = jnp.where(kind == METALLIC, spec_pdf, pdf)
    return pdf


def _sphere_occluded(spheres, sx, sy, sz, ex, ey, ez):
    """Any-sphere segment occlusion; mirrors ops.spheres.occluded
    (reference src/sphere.rs:24-46). Static python loop over spheres."""
    dx, dy, dz = ex - sx, ey - sy, ez - sz
    dist = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    inv = 1.0 / dist
    ux, uy, uz = dx * inv, dy * inv, dz * inv
    occ = jnp.zeros_like(sx, jnp.bool_)
    for (cx, cy, cz, rad) in spheres:
        ocx, ocy, ocz = sx - cx, sy - cy, sz - cz
        b = ocx * ux + ocy * uy + ocz * uz
        c = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
        descrim = b * b - c
        desc_pos = descrim > 0.0
        dsq = jnp.sqrt(jnp.maximum(descrim, 0.0))
        t1 = -b - dsq
        t2 = -b + dsq
        tmin = jnp.minimum(t1, t2)
        occ = occ | ((tmin > 1e-3) & (t1 <= dist) & desc_pos)
    return occ


def _sdf_occluded(fn_c, prm, max_steps, eps_c, eps_l,
                  sx, sy, sz, ex, ey, ez, active, bound_radius=0.0):
    """Segment occlusion march; mirrors march_pallas._occl_kernel
    relax==1 (reference src/sdf.rs:25-57), including the optional
    bounding-volume segment clip. Returns bool occluded."""
    (d_x, d_y, d_z, max_dist, dist0, nan_mask, dist0_raw,
     bv_miss) = _segment_entry(fn_c, prm, bound_radius,
                               sx, sy, sz, ex, ey, ez, active)
    hit0 = ((dist0_raw < 1e-4) & active
            & jnp.logical_not(bv_miss)).astype(jnp.int32)

    def cond(state):
        step, _, _, stop = state
        return jnp.logical_and(step < max_steps, jnp.logical_not(stop))

    def body(state):
        step, t, _, _ = state
        gt_nan = (t > max_dist) | nan_mask
        dist = fn_c(prm, sx + t * d_x, sy + t * d_y, sz + t * d_z)
        hit = jnp.abs(dist) < jnp.maximum(eps_c, eps_l * t)
        done = hit | gt_nan
        t = jnp.where(done, t, t + dist)
        return step + 1, t, hit.astype(jnp.int32), jnp.all(done)

    _, t, hit_i, _ = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), dist0, hit0, jnp.all(nan_mask & False)))
    gt_nan = (t > max_dist) | nan_mask
    return jnp.where(gt_nan, 0, hit_i) != 0


# --------------------------------------------------------------------------
# In-kernel scatter (component-form port of ops.bsdf.scatter)
# --------------------------------------------------------------------------

def _concentric_disk(u, v):
    """sampling.concentric_disk incl. the (0,0) -> b=1e-4 guard
    (reference src/math.rs:201-219)."""
    a = u * 2.0 - 1.0
    b = v * 2.0 - 1.0
    zero_mask = (a == 0.0) & (b == 0.0)
    b = jnp.where(zero_mask, 1e-4, b)
    a_safe = jnp.where(a == 0.0, 1.0, a)
    phi1 = (_PI / 4.0) * b / a_safe
    phi2 = (_PI / 2.0) - (_PI / 4.0) * a / b
    take1 = (a * a) > (b * b)
    r = jnp.where(take1, a, b)
    phi = jnp.where(take1, phi1, phi2)
    return r * jnp.cos(phi), r * jnp.sin(phi)


def _cosine_hemisphere(u, v):
    dx, dy = _concentric_disk(u, v)
    mag_sq = dx * dx + dy * dy
    z = jnp.sqrt(1.0 - jnp.minimum(mag_sq, 1.0))
    return dx, dy, z


def _cosine_power_hemisphere(u, v, power, compat_phi):
    a = jnp.power(u, 1.0 / (power + 1.0))
    b = jnp.sqrt(jnp.maximum(1.0 - a * a, 0.0))
    phi = (2.0 * v) if compat_phi else ((2.0 * _PI) * v)
    return b * jnp.cos(phi), b * jnp.sin(phi), a


def _basis_transform(uu, vv, w, x, y, z):
    """x*uu + y*vv + z*w in component form (w given as components)."""
    wx, wy, wz = w
    return (x * uu[0] + y * vv[0] + z * wx,
            x * uu[1] + y * vv[1] + z * wy,
            x * uu[2] + y * vv[2] + z * wz)


def _norm3(x, y, z, eps):
    mag = jnp.sqrt(x * x + y * y + z * z)
    inv = 1.0 / jnp.maximum(mag, eps) if eps else 1.0 / mag
    return x * inv, y * inv, z * inv


def _scatter(cfg_compat, kind, car, cag, cab, power, ior,
             wox, woy, woz, nx, ny, nz, u_f, u_d1, u_d2, u_s1, u_s2):
    """ops.bsdf.scatter in component form. Returns (wi xyz, f rgb, pdf).
    Reference src/material.rs:118-137 (Lambert), :207-256 (Dielectric),
    plus the working Metallic/Refractive variants."""
    compat_reflect, compat_phi = cfg_compat
    uu, vv = _onb(nx, ny, nz)

    dsx, dsy, dsz = _cosine_hemisphere(u_d1, u_d2)
    bx, by, bz = _basis_transform(uu, vv, (nx, ny, nz), dsx, dsy, dsz)
    dbx, dby, dbz = _norm3(bx, by, bz, 0.0)
    lambert_pdf = dsz / _PI
    diffuse_pdf = jnp.maximum(1e-5, lambert_pdf)
    inv_pi = 1.0 / _PI

    won = wox * nx + woy * ny + woz * nz
    if compat_reflect:
        rx = wox - 2.0 * won * nx
        ry = woy - 2.0 * won * ny
        rz = woz - 2.0 * won * nz
    else:
        rx = 2.0 * won * nx - wox
        ry = 2.0 * won * ny - woy
        rz = 2.0 * won * nz - woz
    ru, rv = _onb(rx, ry, rz)
    ssx, ssy, ssz = _cosine_power_hemisphere(u_s1, u_s2, power, compat_phi)
    sx, sy, sz = _basis_transform(ru, rv, (rx, ry, rz), ssx, ssy, ssz)
    sbx, sby, sbz = _norm3(sx, sy, sz, 0.0)
    cos_alpha_pow = jnp.maximum(jnp.power(ssz, power), F32_EPS)
    spec_pdf = (power + 1.0) / _TWO_PI * cos_alpha_pow
    spec_coeff = (power + 2.0) / _TWO_PI * cos_alpha_pow
    below = (nx * sbx + ny * sby + nz * sbz) < 0.0
    spec_coeff = jnp.where(below, 0.0, spec_coeff)

    cos = jnp.abs(won)
    one_m = 1.0 - cos
    om2 = one_m * one_m
    fresnel = _F0 + (1.0 - _F0) * (om2 * om2 * one_m)
    take_spec = u_f < fresnel

    diel_wix = jnp.where(take_spec, sbx, dbx)
    diel_wiy = jnp.where(take_spec, sby, dby)
    diel_wiz = jnp.where(take_spec, sbz, dbz)
    diel_pdf = fresnel * spec_pdf + (1.0 - fresnel) * diffuse_pdf

    is_diel = kind == DIELECTRIC
    wix = jnp.where(is_diel, diel_wix, dbx)
    wiy = jnp.where(is_diel, diel_wiy, dby)
    wiz = jnp.where(is_diel, diel_wiz, dbz)
    pdf = jnp.where(is_diel, diel_pdf, lambert_pdf)

    def chan_df(c):
        diffuse_f = c * inv_pi
        diel_f = jnp.where(take_spec, spec_coeff, diffuse_f)
        return jnp.where(is_diel, diel_f, diffuse_f)

    fr, fg, fb = chan_df(car), chan_df(cag), chan_df(cab)

    is_metal = kind == METALLIC
    om5 = om2 * om2 * one_m
    wix = jnp.where(is_metal, sbx, wix)
    wiy = jnp.where(is_metal, sby, wiy)
    wiz = jnp.where(is_metal, sbz, wiz)
    pdf = jnp.where(is_metal, spec_pdf, pdf)
    fr = jnp.where(is_metal, (car + (1.0 - car) * om5) * spec_coeff, fr)
    fg = jnp.where(is_metal, (cag + (1.0 - cag) * om5) * spec_coeff, fg)
    fb = jnp.where(is_metal, (cab + (1.0 - cab) * om5) * spec_coeff, fb)

    # Refractive (working variant of the reference's commented stub)
    is_refr = kind == REFRACTIVE
    cos_i = won
    entering = cos_i > 0.0
    nrx = jnp.where(entering, nx, -nx)
    nry = jnp.where(entering, ny, -ny)
    nrz = jnp.where(entering, nz, -nz)
    eta = jnp.where(entering, 1.0 / ior, ior)
    ci = jnp.abs(cos_i)
    sin2_t = eta * eta * jnp.maximum(0.0, 1.0 - ci * ci)
    tir = sin2_t > 1.0
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
    k_eta = eta * ci - cos_t
    rfx, rfy, rfz = _norm3(-wox * eta + nrx * k_eta,
                           -woy * eta + nry * k_eta,
                           -woz * eta + nrz * k_eta, 1e-20)
    f0r = (1.0 - ior) / (1.0 + ior)
    f0r = f0r * f0r
    omc = 1.0 - ci
    omc2 = omc * omc
    fresnel_r = f0r + (1.0 - f0r) * (omc2 * omc2 * omc)
    wodn = wox * nrx + woy * nry + woz * nrz
    rlx = 2.0 * wodn * nrx - wox
    rly = 2.0 * wodn * nry - woy
    rlz = 2.0 * wodn * nrz - woz
    take_reflect = (u_f < fresnel_r) | tir
    ax = jnp.where(take_reflect, rlx, rfx)
    ay = jnp.where(take_reflect, rly, rfy)
    az = jnp.where(take_reflect, rlz, rfz)
    auu, avv = _onb(ax, ay, az)
    rqx, rqy, rqz = _basis_transform(auu, avv, (ax, ay, az),
                                     dsx, dsy, dsz)
    rwx, rwy, rwz = _norm3(rqx, rqy, rqz, 0.0)
    refr_pdf = jnp.maximum(dsz / _PI, 1e-6)
    ndl_r = jnp.maximum(jnp.abs(rwx * nx + rwy * ny + rwz * nz), 1e-6)
    scale_r = refr_pdf / ndl_r

    wix = jnp.where(is_refr, rwx, wix)
    wiy = jnp.where(is_refr, rwy, wiy)
    wiz = jnp.where(is_refr, rwz, wiz)
    pdf = jnp.where(is_refr, refr_pdf, pdf)
    fr = jnp.where(is_refr, jnp.where(take_reflect, 1.0, car) * scale_r, fr)
    fg = jnp.where(is_refr, jnp.where(take_reflect, 1.0, cag) * scale_r, fg)
    fb = jnp.where(is_refr, jnp.where(take_reflect, 1.0, cab) * scale_r, fb)
    return wix, wiy, wiz, fr, fg, fb, pdf


F32_EPS = 1.1920929e-07  # f32::EPSILON (reference src/material.rs:236)


# --------------------------------------------------------------------------
# Shared kernel bodies
#
# The three Mosaic kernels (_shadow_kernel, _finish_kernel,
# _bounce_tail_kernel) are thin wrappers over ONE definition of each
# pipeline — the round-2 advisor's drift concern: a formula edited in one
# copy but not another would pass silently until a statistical gate
# trips. With shared bodies the mega-kernel is the two kernels by
# construction (the equivalence tests then only guard the load/store
# plumbing and Mosaic's per-compilation fma choices).
# --------------------------------------------------------------------------

def _unpack_shadow_const(cfg, const_ref):
    """Decode the shadow SMEM const vector (layout built by
    _shadow_const_vector): per-instance SDF leaves (consecutive),
    per-light (knot-0 pos xyz, radius, emission rgb, paired flag),
    per-sphere (knot-0 center xyz, radius), (sigma_t, sigma_s).

    Light AND sphere positions carry only knot 0: animated (T > 1)
    channels are resolved OUTSIDE the kernel at each lane's time and
    arrive as per-lane VMEM inputs (_site_light_positions /
    sphere_centers_at) — the in-kernel per-lane knot lerp measured +40%
    on the whole animated pass from register pressure alone
    (BASELINE.md round-4 attribution), while the resolved positions are
    an elementwise XLA lerp fused into the pass for free. The knot-0
    scalars are dead values then (Mosaic DCEs them)."""
    prms, base = _unpack_instances(cfg.sdfs, const_ref)
    NL, K = cfg.NL, cfg.K
    lstride = 3 + 5
    light_knot0 = tuple(
        tuple(const_ref[0, base + l * lstride + c] for c in range(3))
        for l in range(NL))
    light_tail = tuple(
        tuple(const_ref[0, base + l * lstride + 3 + j]
              for j in range(5)) for l in range(NL))
    base = base + lstride * NL  # lstride == 8: knot-0 xyz + 5 tail
    sstride = 4
    sphere_knot0 = tuple(
        tuple(const_ref[0, base + k * sstride + c] for c in range(3))
        for k in range(K))
    sphere_rad = tuple(const_ref[0, base + k * sstride + 3]
                       for k in range(K))
    base = base + sstride * K
    sigma_t = const_ref[0, base]
    sigma_s = const_ref[0, base + 1]
    return (prms, light_knot0, light_tail, sphere_knot0, sphere_rad,
            sigma_t, sigma_s)


def _unpack_shadow_sets(cfg, frame_ref):
    """(frame_u32, set_pick[L], set_nee[L], set_vol_pick[VM][L],
    set_vol[VM][L]) from the SMEM i32 vector [frame, set ids...]."""
    L, VM = cfg.L, cfg.VM
    frame_u32 = frame_ref[0, 0].astype(jnp.uint32)
    set_pick = tuple(frame_ref[0, 1 + i] for i in range(L))
    set_nee = tuple(frame_ref[0, 1 + L + i] for i in range(L))
    set_vol_pick = tuple(
        tuple(frame_ref[0, 1 + 2 * L + m * L + i] for i in range(L))
        for m in range(VM))
    set_vol = tuple(
        tuple(frame_ref[0, 1 + 2 * L + VM * L + m * L + i]
              for i in range(L))
        for m in range(VM))
    return frame_u32, set_pick, set_nee, set_vol_pick, set_vol


def _unpack_sites(cfg, args):
    """Strip the per-lane animated-channel site refs off the head of a
    kernel's varargs (arg order built by _site_args): 3*(L + VM*L)
    resolved light-position refs when TL > 1, then 3*K resolved
    sphere-center refs when TS > 1. Returns (site_lp, site_sc, rest)."""
    S = (cfg.L + cfg.VM * cfg.L) if cfg.TL > 1 else 0
    site_lp = [args[3 * i:3 * i + 3] for i in range(S)] or None
    args = args[3 * S:]
    site_sc = None
    if cfg.TS > 1:
        site_sc = [args[3 * k:3 * k + 3] for k in range(cfg.K)]
        args = args[3 * cfg.K:]
    return site_lp, site_sc, args


def _scene_at_time(cfg, consts, site_sc=None):
    """(lights, spheres): per-light (x, y, z, rad, em rgb, paired) and
    per-sphere (x, y, z, rad) tuples. Positions are the knot-0 SMEM
    scalars; for animated channels (T > 1) they are dead values — the
    lights' positions come per-site from _site_light_positions
    (_pick_light's `pos`), and animated sphere centers come from
    `site_sc`: K triples of per-lane (x, y, z) refs resolved outside
    the kernel at each lane's time (sphere_centers_at) — so Mosaic
    DCEs the knot-0 scalars and the kernel body is knot-free."""
    NL, K, TS = cfg.NL, cfg.K, cfg.TS
    (_prms, light_knot0, light_tail, sphere_knot0, sphere_rad,
     _sig_t, _sig_s) = consts
    lights = tuple(light_knot0[l] + light_tail[l] for l in range(NL))
    if TS > 1 and site_sc is not None:
        spheres = tuple(
            (site_sc[k][0][:], site_sc[k][1][:], site_sc[k][2][:],
             sphere_rad[k]) for k in range(K))
    else:
        spheres = tuple(sphere_knot0[k] + (sphere_rad[k],)
                        for k in range(K))
    return lights, spheres


def _shadow_delta(cfg, consts, frame_u32, sets, lights, spheres, v,
                  vd, vp, site_lp=None):
    """The per-bounce shadow pipeline (integrator steps 3 + 4) on loaded
    values `v`; returns the radiance delta (rad_r, rad_g, rad_b).
    Mirrors integrator.bounce exactly (reference src/integrator.rs:73-132,
    :207-281); identical sampler streams.

    site_lp: when light channels are animated (TL > 1), the per-site
    picked light positions resolved outside the kernel — L NEE triples
    then VM*L volume triples of per-lane (x, y, z) refs, site order
    matching the loops below."""
    (sdfs, sampler, num_1d_sets, L, VM, NL, _K,
     has_ext, has_scat, eps_c, eps_l, max_steps,
     correction, vm_correction, mis, compat_reflect,
     _TL, _TS, chained) = cfg
    prms = consts[0]
    sigma_t, sigma_s = consts[5], consts[6]

    def sdf_blocked(sx, sy, sz, ex, ey, ez, act):
        """Occlusion product-fold over every SDF instance (reference
        src/hitable.rs:163-168), each marched only where still
        unblocked — matches intersect.test_occluded's fold."""
        blk = jnp.zeros_like(act)
        for inst, prm in zip(sdfs, prms):
            blk = blk | _sdf_occluded(
                inst.fn_c, prm, max_steps, eps_c, eps_l,
                sx, sy, sz, ex, ey, ez, act & jnp.logical_not(blk),
                inst.bv_r)
        return blk
    set_pick, set_nee, set_vol_pick, set_vol = sets
    (p_x, p_y, p_z) = v["p"]
    (n_x, n_y, n_z) = v["n"]
    off = v["off"]
    (o_x, o_y, o_z) = v["o"]
    (d_x, d_y, d_z) = v["d"]
    (tp_x, tp_y, tp_z) = v["tp"]
    vtr = v["vtr"]
    mkind = v["kind"]
    (c_r, c_g, c_b) = v["ca"]
    pw = v["pw"]
    sidx, pix = v["sidx"], v["pix"]
    alive, receives = v["alive"], v["recv"]
    (wo_x, wo_y, wo_z) = v["wo"]

    rad_r = jnp.zeros_like(p_x)
    rad_g = jnp.zeros_like(p_x)
    rad_b = jnp.zeros_like(p_x)

    # Chained scheduling: collect every segment's (geometry, pending
    # contribution) during the sampling loops, run ONE chained march
    # over all of them (march_pallas._chained_occl_core — per-segment
    # verdicts bit-identical to _sdf_occluded) per SDF instance, then
    # apply the pending contributions in the same segment order as the
    # sequential path — the accumulated radiance is bit-identical
    # either way.
    # (verdict bits share one int32 in the chained core, so fall back
    # to sequential loops past 30 segments — exotic configs only)
    use_chained = (chained and len(sdfs) > 0
                   and L + (VM * L if has_scat else 0) <= 30)
    seg_list, pend = [], []

    # --- NEE surface samples (integrator step 3) ---
    for i in range(L):
        u_pick = _sample_1d(sampler, frame_u32, set_pick[i], sidx, pix)
        lx, ly, lz, lrad, er, eg, eb, lpair = _pick_light(
            u_pick, lights, site_lp[i] if site_lp else None)
        u1, u2 = _sample_2d(sampler, num_1d_sets, frame_u32, set_nee[i],
                            sidx, pix)
        ex, ey, ez, pdf = _sample_cone(u1, u2, lx, ly, lz, lrad,
                                       p_x, p_y, p_z)
        wfx, wfy, wfz = ex - p_x, ey - p_y, ez - p_z
        dist = jnp.sqrt(wfx * wfx + wfy * wfy + wfz * wfz)
        dinv = 1.0 / dist
        wix, wiy, wiz = wfx * dinv, wfy * dinv, wfz * dinv
        ndw = n_x * wix + n_y * wiy + n_z * wiz
        bias = jnp.where(jnp.signbit(ndw), -off, off)
        sx = p_x + n_x * bias
        sy = p_y + n_y * bias
        sz = p_z + n_z * bias
        fr, fg, fb = _eval_f(mkind, c_r, c_g, c_b, pw,
                             wo_x, wo_y, wo_z, wix, wiy, wiz,
                             n_x, n_y, n_z)
        ndl = jnp.maximum(0.0, ndw)
        if has_ext:
            seg_trans = jnp.exp(-sigma_t * dist)
        else:
            seg_trans = 1.0
        scale = (seg_trans / pdf) * (correction * vtr)
        kr = jnp.where(receives, er * fr * ndl * scale * tp_x, 0.0)
        kg = jnp.where(receives, eg * fg * ndl * scale * tp_y, 0.0)
        kb = jnp.where(receives, eb * fb * ndl * scale * tp_z, 0.0)
        if mis:
            # Weight NEE against the BSDF strategy for *paired* lights
            # only (mirrors integrator.bounce step 3 mis block; the
            # reference's dead power_heuristic src/math.rs:193-199).
            p_bsdf = _eval_pdf(compat_reflect, mkind, pw,
                               wo_x, wo_y, wo_z, wix, wiy, wiz,
                               n_x, n_y, n_z)
            w_light = _power_heuristic(float(L), pdf / NL, 1.0, p_bsdf)
            w = jnp.where(lpair > 0.0, w_light, 1.0)
            kr = kr * w
            kg = kg * w
            kb = kb * w
        worth = receives & ((kr != 0.0) | (kg != 0.0) | (kb != 0.0))
        blocked = _sphere_occluded(spheres, sx, sy, sz, ex, ey, ez)
        if use_chained:
            m_act = worth & jnp.logical_not(blocked)
            seg_list.append((sx, sy, sz, ex, ey, ez, m_act))
            pend.append((kr, kg, kb, m_act))
            continue
        blocked = blocked | sdf_blocked(
            sx, sy, sz, ex, ey, ez, worth & jnp.logical_not(blocked))
        vis = jnp.logical_not(blocked).astype(jnp.float32) \
            * worth.astype(jnp.float32)
        rad_r = rad_r + kr * vis
        rad_g = rad_g + kg * vis
        rad_b = rad_b + kb * vis

    # --- equi-angular volume samples (integrator step 4) ---
    if has_scat and VM:
        inv_4pi = 1.0 / (4.0 * _PI)
        for m in range(VM):
            for i in range(L):
                u_pick = _sample_1d(sampler, frame_u32, set_vol_pick[m][i],
                                    sidx, pix)
                (lx, ly, lz, lrad, er, eg, eb,
                 _lpair) = _pick_light(
                    u_pick, lights,
                    site_lp[L + m * L + i] if site_lp else None)
                spx = o_x + vd[m][i] * d_x
                spy = o_y + vd[m][i] * d_y
                spz = o_z + vd[m][i] * d_z
                u1, u2 = _sample_2d(sampler, num_1d_sets, frame_u32,
                                    set_vol[m][i], sidx, pix)
                ex, ey, ez, light_pdf = _sample_cone(
                    u1, u2, lx, ly, lz, lrad, spx, spy, spz)
                sgx, sgy, sgz = ex - spx, ey - spy, ez - spz
                dist_pl = jnp.sqrt(sgx * sgx + sgy * sgy + sgz * sgz)
                if has_ext:
                    seg_trans = jnp.exp(-sigma_t * dist_pl)
                    to_point = jnp.exp(-sigma_t * vd[m][i])
                else:
                    seg_trans = 1.0
                    to_point = 1.0
                scale = (inv_4pi * seg_trans / (vp[m][i] * light_pdf)
                         * vm_correction * sigma_s * to_point)
                kr = jnp.where(alive, er * scale * tp_x, 0.0)
                kg = jnp.where(alive, eg * scale * tp_y, 0.0)
                kb = jnp.where(alive, eb * scale * tp_z, 0.0)
                worth = alive & ((kr != 0.0) | (kg != 0.0) | (kb != 0.0))
                blocked = _sphere_occluded(spheres, spx, spy, spz,
                                           ex, ey, ez)
                if use_chained:
                    m_act = worth & jnp.logical_not(blocked)
                    seg_list.append((spx, spy, spz, ex, ey, ez, m_act))
                    pend.append((kr, kg, kb, m_act))
                    continue
                blocked = blocked | sdf_blocked(
                    spx, spy, spz, ex, ey, ez,
                    worth & jnp.logical_not(blocked))
                vis = jnp.logical_not(blocked).astype(jnp.float32) \
                    * worth.astype(jnp.float32)
                rad_r = rad_r + kr * vis
                rad_g = rad_g + kg * vis
                rad_b = rad_b + kb * vis

    if use_chained and seg_list:
        # Instance fold at chained-march granularity: instance i+1
        # marches only segments instance <= i left unblocked — the same
        # product fold as test_occluded, one chained launch per
        # instance.
        occ_acc = [jnp.zeros_like(m) for (_r, _g, _b, m) in pend]
        for inst, prm in zip(sdfs, prms):
            segs_i = [
                (sx, sy, sz, ex, ey, ez, act & jnp.logical_not(occ))
                for (sx, sy, sz, ex, ey, ez, act), occ
                in zip(seg_list, occ_acc)]
            occ_i = _chained_occl_core(
                inst.fn_c, prm, max_steps, eps_c, eps_l, inst.bv_r,
                segs_i, group=chained)
            occ_acc = [o | oi for o, oi in zip(occ_acc, occ_i)]
        for (kr, kg, kb, m_act), occ in zip(pend, occ_acc):
            vis = (m_act & jnp.logical_not(occ)).astype(jnp.float32)
            rad_r = rad_r + kr * vis
            rad_g = rad_g + kg * vis
            rad_b = rad_b + kb * vis

    return rad_r, rad_g, rad_b


def _segment_cost(fn_c, prm, max_steps, bv_r, sx, sy, sz, ex, ey, ez, act):
    """Pre-march estimate of a shadow segment's step count: segment
    length over the first DE step (exact if the DE stayed constant),
    capped at the step budget; entry-resolved/inactive segments cost the
    1 chain iteration they take. Shares the clip arithmetic with
    _chained_occl_core so the estimate sees the same effective segment."""
    _dx, _dy, _dz, md, t0, nan, _d0, _bv = _segment_entry(
        fn_c, prm, bv_r, sx, sy, sz, ex, ey, ez, act)
    est = jnp.minimum(md / jnp.maximum(t0, 1e-6), float(max_steps))
    return jnp.where(nan | (t0 > md), 1.0, est)


def _shadow_cost_key(cfg, consts, frame_u32, sets, lights, v, vd,
                     site_lp=None):
    """Per-ray estimate of the CHAINED shadow march's iteration count:
    the sum of _segment_cost over the bounce's L NEE + VM*L volume
    segments, rebuilt with the same sampler streams / cone samples as
    _shadow_delta (so the key prices the segments the kernel will
    actually march). Activity is approximated as receives & (n.wi > 0)
    for NEE and alive for volume (no BSDF eval / sphere test — the key
    is a scheduling heuristic, never a verdict). Modeled on captured
    queues: sorting rays by this key recovers 1.5-2.2x block iterations
    over unsorted chaining at bounces >= 1
    (tools/perf_chained_predict.py, sortkey md/t0)."""
    sampler, num_1d_sets = cfg.sampler, cfg.num_1d_sets
    L, VM, max_steps = cfg.L, cfg.VM, cfg.max_steps
    has_scat = cfg.has_scat
    prms = consts[0]

    def seg_cost(sx, sy, sz, ex, ey, ez, act):
        """Summed per-instance cost: the chained fold marches every
        instance over still-unblocked segments, so the worst case prices
        as the sum (reference fold src/hitable.rs:163-168)."""
        c = jnp.zeros_like(sx)
        for inst, prm in zip(cfg.sdfs, prms):
            c = c + _segment_cost(inst.fn_c, prm, max_steps, inst.bv_r,
                                  sx, sy, sz, ex, ey, ez, act)
        return c
    set_pick, set_nee, set_vol_pick, set_vol = sets
    (p_x, p_y, p_z) = v["p"]
    (n_x, n_y, n_z) = v["n"]
    off = v["off"]
    (o_x, o_y, o_z) = v["o"]
    (d_x, d_y, d_z) = v["d"]
    sidx, pix = v["sidx"], v["pix"]
    alive, receives = v["alive"], v["recv"]

    key = jnp.zeros_like(p_x)
    for i in range(L):
        u_pick = _sample_1d(sampler, frame_u32, set_pick[i], sidx, pix)
        lx, ly, lz, lrad, _er, _eg, _eb, _lp = _pick_light(
            u_pick, lights, site_lp[i] if site_lp else None)
        u1, u2 = _sample_2d(sampler, num_1d_sets, frame_u32, set_nee[i],
                            sidx, pix)
        ex, ey, ez, _pdf = _sample_cone(u1, u2, lx, ly, lz, lrad,
                                        p_x, p_y, p_z)
        wfx, wfy, wfz = ex - p_x, ey - p_y, ez - p_z
        dist = jnp.sqrt(wfx * wfx + wfy * wfy + wfz * wfz)
        dinv = 1.0 / dist
        ndw = n_x * wfx * dinv + n_y * wfy * dinv + n_z * wfz * dinv
        bias = jnp.where(jnp.signbit(ndw), -off, off)
        sx = p_x + n_x * bias
        sy = p_y + n_y * bias
        sz = p_z + n_z * bias
        act = receives & (ndw > 0.0)
        key = key + seg_cost(sx, sy, sz, ex, ey, ez, act)
    if has_scat and VM:
        for m in range(VM):
            for i in range(L):
                u_pick = _sample_1d(sampler, frame_u32,
                                    set_vol_pick[m][i], sidx, pix)
                (lx, ly, lz, lrad, _er, _eg, _eb,
                 _lp) = _pick_light(
                    u_pick, lights,
                    site_lp[L + m * L + i] if site_lp else None)
                spx = o_x + vd[m][i] * d_x
                spy = o_y + vd[m][i] * d_y
                spz = o_z + vd[m][i] * d_z
                u1, u2 = _sample_2d(sampler, num_1d_sets, frame_u32,
                                    set_vol[m][i], sidx, pix)
                ex, ey, ez, _pdf = _sample_cone(
                    u1, u2, lx, ly, lz, lrad, spx, spy, spz)
                key = key + seg_cost(spx, spy, spz, ex, ey, ez, alive)
    return key


def _finish_tail(cfg, scalars, mis_read, v, rad_in):
    """Steps 2 + 5-7 of a bounce (emission incl. MIS weight, scatter,
    roulette, AOVs, termination) on loaded values `v`; mirrors
    integrator.bounce step 2 + _finish_bounce (reference
    src/integrator.rs:64-71, :134-203).

    scalars: (frame_u32, set_fres, set_diff, set_spec, set_rr,
    roulette_on, terminate_all, aov, mis_on) — runtime SMEM scalars so
    one Mosaic kernel serves every depth.
    mis_read: j -> SMEM f32 scalar of the emission-MIS const vector
    (per-sphere (paired flag, paired light radius, pos knots [TL, 3])
    then (lt0, lt1)); only called when cfg.mis.
    rad_in: pre-emission radiance (r, g, b) INCLUDING the incoming
    state radiance (+ any shadow delta).

    Returns the 24 output arrays in the pallas_call output order."""
    (sampler, num_1d_sets, compat, mis, K, NL, L, TL) = cfg
    (frame_u32, set_fres, set_diff, set_spec, set_rr,
     roulette_on, terminate_all, aov, mis_on) = scalars

    (o_x, o_y, o_z) = v["o"]
    (d_x, d_y, d_z) = v["d"]
    (tp_x, tp_y, tp_z) = v["tp"]
    (n_x, n_y, n_z) = v["n"]
    (p_x, p_y, p_z) = v["p"]
    off = v["off"]
    vtr = v["vtr"]
    live = v["alive"]
    receives = v["recv"]
    sidx, pix = v["sidx"], v["pix"]
    kind = v["kind"]
    (car, cag, cab) = v["ca"]
    (cbr, cbg, cbb) = v["cb"]
    pw = v["pw"]
    ior = v["ior"]
    (wox, woy, woz) = v["wo"]
    tm = v["tm"]

    # step 2: emission (Sky gradient / Emissive; reference
    # src/material.rs:444-448, :489-520 + src/integrator.rs:64-71)
    t_sky = 0.5 * (woy + 1.0)
    is_sky = kind == SKY
    is_em = kind == EMISSIVE
    le_r = jnp.where(is_sky, car * (1.0 - t_sky) + cbr * t_sky,
                     jnp.where(is_em, cbr, 0.0))
    le_g = jnp.where(is_sky, cag * (1.0 - t_sky) + cbg * t_sky,
                     jnp.where(is_em, cbg, 0.0))
    le_b = jnp.where(is_sky, cab * (1.0 - t_sky) + cbb * t_sky,
                     jnp.where(is_em, cbb, 0.0))
    if mis and K and NL:
        # BSDF-hit emission of a sphere paired with a light is
        # power-heuristic weighted against the NEE strategy that could
        # have sampled the same emitter from the previous vertex
        # (mirrors integrator.bounce step 2 mis block). Animated light
        # channels are lerped at each lane's time (mirrors
        # light_position_of / sample_batched_at).
        obj = v["obj"]
        ppdf = v["ppdf"]
        stride = 2 + 3 * TL
        if TL > 1:
            lt0 = mis_read(K * stride)
            lt1 = mis_read(K * stride + 1)
            li0, lfrac = _interp_weights(tm, lt0, lt1, TL)
        pairf = lpx = lpy = lpz = lrad = 0.0
        for k in range(K):
            m = (obj == k).astype(jnp.float32)
            pairf = pairf + m * mis_read(k * stride)
            lrad = lrad + m * mis_read(k * stride + 1)
            knots = tuple(tuple(mis_read(k * stride + 2 + 3 * j + c)
                                for c in range(3)) for j in range(TL))
            kx, ky, kz = (_interp3(knots, li0, lfrac) if TL > 1
                          else knots[0])
            lpx = lpx + m * kx
            lpy = lpy + m * ky
            lpz = lpz + m * kz
        is_paired = (mis_on & (obj >= 0) & (obj < K)
                     & (pairf > 0.0) & (ppdf >= 0.0))
        dlx, dly, dlz = lpx - o_x, lpy - o_y, lpz - o_z
        d2 = dlx * dlx + dly * dly + dlz * dlz
        cos_theta_max = jnp.sqrt(
            jnp.maximum(0.0, 1.0 - lrad * lrad / d2))
        q = 1.0 / (_TWO_PI * (1.0 - cos_theta_max)) / NL
        w_bsdf = _power_heuristic(1.0, ppdf, float(L), q)
        w = jnp.where(is_paired, w_bsdf, 1.0)
        le_r = le_r * w
        le_g = le_g * w
        le_b = le_b * w
    rad_r = rad_in[0] + jnp.where(live, le_r * tp_x * vtr, 0.0)
    rad_g = rad_in[1] + jnp.where(live, le_g * tp_y * vtr, 0.0)
    rad_b = rad_in[2] + jnp.where(live, le_b * tp_z * vtr, 0.0)

    # step 5: scatter + throughput + roulette
    u_f = _sample_1d(sampler, frame_u32, set_fres, sidx, pix)
    u_d1, u_d2 = _sample_2d(sampler, num_1d_sets, frame_u32, set_diff,
                            sidx, pix)
    u_s1, u_s2 = _sample_2d(sampler, num_1d_sets, frame_u32, set_spec,
                            sidx, pix)
    (wix, wiy, wiz, f_r, f_g, f_b, pdf) = _scatter(
        compat, kind, car, cag, cab, pw, ior,
        wox, woy, woz, n_x, n_y, n_z, u_f, u_d1, u_d2, u_s1, u_s2)
    ndl = jnp.abs(wix * n_x + wiy * n_y + wiz * n_z)
    scale = vtr * (ndl / pdf)
    ntp_x = tp_x * scale * f_r
    ntp_y = tp_y * scale * f_g
    ntp_z = tp_z * scale * f_b

    max_tp = jnp.maximum(tp_x, jnp.maximum(tp_y, tp_z))
    roulette = jnp.where(roulette_on,
                         jnp.maximum(1.0 - max_tp, 0.05), 0.0)
    inv_keep = 1.0 / (1.0 - roulette)
    ntp_x = ntp_x * inv_keep
    ntp_y = ntp_y * inv_keep
    ntp_z = ntp_z * inv_keep

    u_r = _sample_1d(sampler, frame_u32, set_rr, sidx, pix)
    rr_kill = u_r < roulette
    terminate = terminate_all | rr_kill

    # step 6: depth-0 AOVs
    aov_set = aov & receives
    al = jnp.where(aov_set, 1.0, v["al_in"])
    nout_x = jnp.where(aov_set, n_x, v["no"][0])
    nout_y = jnp.where(aov_set, n_y, v["no"][1])
    nout_z = jnp.where(aov_set, n_z, v["no"][2])

    # step 7: termination bookkeeping
    non_recv = live & jnp.logical_not(receives)
    bgsel = aov & non_recv
    b_r = jnp.where(bgsel, rad_r, v["bg"][0])
    b_g = jnp.where(bgsel, rad_g, v["bg"][1])
    b_b = jnp.where(bgsel, rad_b, v["bg"][2])
    csel = jnp.logical_not(aov) & non_recv
    c_r = jnp.where(csel, rad_r, v["co"][0])
    c_g = jnp.where(csel, rad_g, v["co"][1])
    c_b = jnp.where(csel, rad_b, v["co"][2])
    recv_done = receives & terminate
    c_r = jnp.where(recv_done, rad_r, c_r)
    c_g = jnp.where(recv_done, rad_g, c_g)
    c_b = jnp.where(recv_done, rad_b, c_b)

    survive = receives & jnp.logical_not(terminate)

    ndw = n_x * wix + n_y * wiy + n_z * wiz
    bias = jnp.where(jnp.signbit(ndw), -off, off)
    no_ox = p_x + n_x * bias
    no_oy = p_y + n_y * bias
    no_oz = p_z + n_z * bias
    tp_nan = (jnp.isnan(ntp_x) | jnp.isnan(ntp_y) | jnp.isnan(ntp_z))
    fx = jnp.where(tp_nan, tp_x, ntp_x)
    fy = jnp.where(tp_nan, tp_y, ntp_y)
    fz = jnp.where(tp_nan, tp_z, ntp_z)
    next_pdf = jnp.where(kind == REFRACTIVE, -1.0, pdf)

    return (jnp.where(survive, no_ox, o_x),
            jnp.where(survive, no_oy, o_y),
            jnp.where(survive, no_oz, o_z),
            jnp.where(survive, wix, d_x),
            jnp.where(survive, wiy, d_y),
            jnp.where(survive, wiz, d_z),
            jnp.where(survive, fx, tp_x),
            jnp.where(survive, fy, tp_y),
            jnp.where(survive, fz, tp_z),
            rad_r, rad_g, rad_b,
            survive.astype(jnp.int32),
            jnp.where(survive, next_pdf, v["ppdf"]),
            c_r, c_g, c_b, b_r, b_g, b_b,
            al, nout_x, nout_y, nout_z)


# --------------------------------------------------------------------------
# The fused kernels (thin wrappers over the shared bodies)
# --------------------------------------------------------------------------

def _shadow_kernel(cfg, const_ref, frame_ref,
                   px, py, pz, nx, ny, nz, offs,
                   ox, oy, oz, dx, dy, dz,
                   tpx, tpy, tpz, vol_trans,
                   kind, car, cag, cab, power,
                   sample_idx, pixel, live, recv, time_r,
                   *vol_args):
    """One block's full per-bounce shadow pipeline.

    const_ref: SMEM f32 vector packing the SDF parameter leaves,
    per-light/per-sphere constants and channel knots (layout in
    _unpack_shadow_const / shadow_radiance).
    frame_ref: SMEM i32 vector [1, 1 + 2*L + 2*VM*L]: the frame salt
    followed by the sampler set ids (light picks, NEE 2d, volume picks,
    volume 2d — all depth-dependent). Carrying them as runtime scalars
    keeps the Mosaic kernel identical across bounce depths, so XLA
    compiles ONE kernel per pass instead of max_bounces+1.
    vol_args: the animated-channel site refs (_unpack_sites — resolved
    light positions when TL > 1, resolved sphere centers when TS > 1);
    then VM*L pairs of (vol_dist, vol_pdf) refs (march-major, i.e.
    (m0,i0),(m0,i1),... — precomputed outside because Mosaic lowers no
    atan2) followed by the three radiance-delta output refs."""
    L, VM = cfg.L, cfg.VM
    consts = _unpack_shadow_const(cfg, const_ref)
    frame_u32, set_pick, set_nee, set_vol_pick, set_vol = \
        _unpack_shadow_sets(cfg, frame_ref)
    site_lp, site_sc, vol_args = _unpack_sites(cfg, vol_args)

    d_x, d_y, d_z = dx[:], dy[:], dz[:]
    tm = time_r[:]
    v = dict(
        p=(px[:], py[:], pz[:]), n=(nx[:], ny[:], nz[:]), off=offs[:],
        o=(ox[:], oy[:], oz[:]), d=(d_x, d_y, d_z),
        tp=(tpx[:], tpy[:], tpz[:]), vtr=vol_trans[:],
        kind=kind[:], ca=(car[:], cag[:], cab[:]), pw=power[:],
        sidx=sample_idx[:].astype(jnp.uint32),
        pix=pixel[:].astype(jnp.uint32),
        alive=live[:] != 0, recv=recv[:] != 0,
        wo=(-d_x, -d_y, -d_z), tm=tm,
    )
    lights, spheres = _scene_at_time(cfg, consts, site_sc)

    n_vol = 2 * VM * L
    out_r, out_g, out_b = vol_args[n_vol:n_vol + 3]
    vd = [[vol_args[2 * (m * L + i)][:] for i in range(L)]
          for m in range(VM)]
    vp = [[vol_args[2 * (m * L + i) + 1][:] for i in range(L)]
          for m in range(VM)]

    rad_r, rad_g, rad_b = _shadow_delta(
        cfg, consts, frame_u32,
        (set_pick, set_nee, set_vol_pick, set_vol),
        lights, spheres, v, vd, vp, site_lp)
    out_r[:] = rad_r
    out_g[:] = rad_g
    out_b[:] = rad_b


def _shadow_const_vector(data, static, flat_leaves, NL, K):
    """SMEM shadow const vector (layout read by _unpack_shadow_const):
    per-instance SDF leaves (consecutive, from _flatten_instances),
    per-light (knot-0 pos xyz, radius, emission rgb, paired flag),
    per-sphere (knot-0 center xyz, radius), (sigma_t, sigma_s).

    Animated (T > 1) light/sphere positions are resolved OUTSIDE the
    kernels at each lane's time (_site_light_positions /
    scene.sphere_centers_at) and enter as per-lane VMEM inputs — only
    knot 0 is packed here, a dead value then (Mosaic DCEs it). Returns
    (flat f32 vector, TL, TS)."""
    TL = int(data.light_pos.values.shape[1]) if NL else 1
    TS = int(data.sphere_centers.values.shape[1]) if K else 1
    pieces = [flat_leaves] if flat_leaves.shape[0] else []
    if NL:
        pieces.append(jnp.concatenate([
            data.light_pos.values[:, 0, :],        # [NL, 3] knot 0
            data.light_radii[:, None],             # [NL, 1]
            data.light_emission,                   # [NL, 3]
            data.light_paired[:, None],            # [NL, 1] (MIS)
        ], axis=-1).reshape(-1))
    if K:
        pieces.append(jnp.concatenate([
            data.sphere_centers.values[:, 0, :],   # [K, 3] knot 0
            data.sphere_radii[:, None],            # [K, 1]
        ], axis=-1).reshape(-1))
    sig_t = (data.volume_sigma_t if static.has_extinction
             else jnp.float32(0.0))
    sig_s = (data.volume_sigma_s if static.has_scattering
             else jnp.float32(0.0))
    pieces.append(jnp.stack([jnp.asarray(sig_t, jnp.float32),
                             jnp.asarray(sig_s, jnp.float32)]))
    return jnp.concatenate(pieces), TL, TS


def _shadow_cfg_const(data, static, s):
    """Shared wrapper setup for the fused shadow-kernel family
    (shadow_radiance / bounce_tail_fused / shadow_sort_key): the
    ShadowCfg and the SMEM const vector. Every SDF instance contributes
    its shadow-variant program (truncated DE iterations, BASELINE.md
    round-3 study) and its bounding radius (clip gated by
    s.shadow_bv_clip) — the reference's whole-store fold domain
    (src/hitable.rs:163-210)."""
    NL = int(static.n_lights)
    K = int(static.n_spheres)
    L = s.nee_light_samples if NL > 0 else 0
    VM = s.volume_marches if (static.has_scattering and NL > 0) else 0
    insts = static.sdf_instances(data) if static.has_sdf else []
    flat, sdfs = _flatten_instances([
        (prog.reduced(s.shadow_de_iterations),
         bv if s.shadow_bv_clip else 0.0)
        for prog, _mat, bv in insts])
    const, TL, TS = _shadow_const_vector(data, static, flat, NL, K)
    detail = s.sdf_detail_scale * s.shadow_eps_scale
    cfg = ShadowCfg(
        sdfs=sdfs, sampler=s.sampler, num_1d_sets=s.num_1d_sets,
        L=L, VM=VM, NL=NL, K=K,
        has_ext=static.has_extinction, has_scat=static.has_scattering,
        eps_c=1e-4 * detail, eps_l=1e-5 * detail,
        max_steps=s.max_vis_marches,
        correction=(NL / L) if L else 0.0,
        vm_correction=(NL / L / VM) if (L and VM) else 0.0,
        mis=bool(s.mis), compat_reflect=bool(s.compat_spec_reflect),
        TL=TL, TS=TS,
        chained=(max(1, int(s.chained_advance_group))
                 if s.chained_shadow_march else 0),
    )
    return cfg, const


def _site_args(data, s, tables, depth, cfg, sample_idx, pixel, time,
               rows):
    """Per-lane VMEM inputs for animated channels, in the order
    _unpack_sites reads them: 3*(L + VM*L) resolved light-position
    columns when TL > 1, then 3*K resolved sphere-center columns when
    TS > 1 (each sphere's center at each lane's time — motion-blur
    semantics of reference src/sphere.rs:49 / src/animation.rs:55-68)."""
    args = []
    if cfg.TL > 1:
        for lp in _site_light_positions(data, s, tables, depth, cfg.NL,
                                        cfg.L, cfg.VM, sample_idx,
                                        pixel, time):
            for c in range(3):
                args.append(_to_rows(lp[:, c], rows))
    if cfg.TS > 1:
        from rayn_tpu.scene.scene import sphere_centers_at
        sc = sphere_centers_at(data, time)               # [N, K, 3]
        for k in range(cfg.K):
            for c in range(3):
                args.append(_to_rows(sc[:, k, c], rows))
    return args


def _site_light_positions(data, s, tables, depth, NL, L, VM,
                          sample_idx, pixel, time):
    """Per-site picked light positions, resolved OUTSIDE the kernels:
    for each of the bounce's L NEE + VM*L volume sampling sites, replay
    the site's light-pick stream (exact-u32 sampler arithmetic — the
    in-kernel _sample_1d pick is bit-identical by construction, the
    same property _equi_angular_samples already relies on) and lerp the
    picked light's position at each lane's time with the shared
    scene.light_position_of. Returns a list of [N, 3] arrays in site
    order (NEE i, then volume (m, i) march-major).

    This replaces the in-kernel per-lane knot lerp of EVERY light,
    whose register footprint measured +40% on whole animated-geo passes
    (BASELINE.md round-4 attribution); out here it is an elementwise
    lerp XLA fuses into the pass. Motion-blur semantics: reference
    src/animation.rs:40-76 / src/light.rs:13-23 (position sampled at
    the ray's time)."""
    from rayn_tpu.scene.scene import light_position_of
    sites = []
    for i in range(L):
        u = rng_mod.sample_1d(s, tables, rng_mod.set1d_light_pick(
            s, depth, i), sample_idx, pixel)
        lidx = jnp.clip(jnp.floor(u * NL).astype(jnp.int32), 0, NL - 1)
        sites.append(light_position_of(data, lidx, time))
    for m in range(VM):
        for i in range(L):
            u = rng_mod.sample_1d(s, tables, rng_mod.set1d_vol_pick(
                s, depth, m, i), sample_idx, pixel)
            lidx = jnp.clip(jnp.floor(u * NL).astype(jnp.int32),
                            0, NL - 1)
            sites.append(light_position_of(data, lidx, time))
    return sites


def _shadow_key_kernel(cfg, const_ref, frame_ref,
                       px, py, pz, nx, ny, nz, offs,
                       ox, oy, oz, dx, dy, dz,
                       sample_idx, pixel, live, recv, time_r,
                       *vol_args):
    """Per-ray chained-march cost key (body: _shadow_cost_key).
    vol_args: the animated-channel site refs (_unpack_sites; the
    sphere-center refs are unused — the key prices SDF marches only);
    then VM*L vol_dist refs (march-major) followed by the key output
    ref."""
    L, VM = cfg.L, cfg.VM
    consts = _unpack_shadow_const(cfg, const_ref)
    frame_u32, set_pick, set_nee, set_vol_pick, set_vol = \
        _unpack_shadow_sets(cfg, frame_ref)
    site_lp, _site_sc, vol_args = _unpack_sites(cfg, vol_args)
    d_x, d_y, d_z = dx[:], dy[:], dz[:]
    tm = time_r[:]
    v = dict(
        p=(px[:], py[:], pz[:]), n=(nx[:], ny[:], nz[:]), off=offs[:],
        o=(ox[:], oy[:], oz[:]), d=(d_x, d_y, d_z),
        sidx=sample_idx[:].astype(jnp.uint32),
        pix=pixel[:].astype(jnp.uint32),
        alive=live[:] != 0, recv=recv[:] != 0,
    )
    lights, _spheres = _scene_at_time(cfg, consts)
    n_vol = VM * L
    out = vol_args[n_vol]
    vd = [[vol_args[m * L + i][:] for i in range(L)] for m in range(VM)]
    out[:] = _shadow_cost_key(
        cfg, consts, frame_u32,
        (set_pick, set_nee, set_vol_pick, set_vol), lights, v, vd,
        site_lp)


def _finish_kernel(cfg, flags_ref, mis_ref,
                   ox, oy, oz, dx, dy, dz,
                   tpx, tpy, tpz, rdx, rdy, rdz,
                   px, py, pz, nx, ny, nz, offs, vol_trans,
                   live_r, recv_r, sample_idx, pixel,
                   kind_r, car_r, cag_r, cab_r, cbr_r, cbg_r, cbb_r,
                   pow_r, ior_r,
                   co_r, co_g, co_b, bg_r, bg_g, bg_b,
                   al_in, no_x, no_y, no_z, ppdf_in, obj_r, time_r,
                   out_ox, out_oy, out_oz, out_dx, out_dy, out_dz,
                   out_tx, out_ty, out_tz, out_rx, out_ry, out_rz,
                   out_alive, out_ppdf,
                   out_cr, out_cg, out_cb, out_br, out_bg, out_bb,
                   out_al, out_nx, out_ny, out_nz):
    """Steps 2 + 5-7 of a bounce in one kernel (body: _finish_tail).

    flags_ref: SMEM i32 [1, 9]: frame, set_fresnel, set_diffuse,
    set_spec, set_roulette, roulette_on (depth > 2), terminate_all
    (depth >= max_bounces), aov (depth == 0), mis_on (mis and depth > 0).
    mis_ref: SMEM f32 [1, K*(2 + 3*TL) + 2]: the emission-MIS const
    vector ([1,1] zeros when mis is off)."""
    scalars = (flags_ref[0, 0].astype(jnp.uint32),
               flags_ref[0, 1], flags_ref[0, 2], flags_ref[0, 3],
               flags_ref[0, 4], flags_ref[0, 5] != 0,
               flags_ref[0, 6] != 0, flags_ref[0, 7] != 0,
               flags_ref[0, 8] != 0)
    d_x, d_y, d_z = dx[:], dy[:], dz[:]
    v = dict(
        o=(ox[:], oy[:], oz[:]), d=(d_x, d_y, d_z),
        tp=(tpx[:], tpy[:], tpz[:]),
        n=(nx[:], ny[:], nz[:]), p=(px[:], py[:], pz[:]), off=offs[:],
        vtr=vol_trans[:], alive=live_r[:] != 0, recv=recv_r[:] != 0,
        sidx=sample_idx[:].astype(jnp.uint32),
        pix=pixel[:].astype(jnp.uint32),
        kind=kind_r[:], ca=(car_r[:], cag_r[:], cab_r[:]),
        cb=(cbr_r[:], cbg_r[:], cbb_r[:]), pw=pow_r[:], ior=ior_r[:],
        wo=(-d_x, -d_y, -d_z), tm=time_r[:],
        co=(co_r[:], co_g[:], co_b[:]), bg=(bg_r[:], bg_g[:], bg_b[:]),
        al_in=al_in[:], no=(no_x[:], no_y[:], no_z[:]),
        ppdf=ppdf_in[:], obj=obj_r[:],
    )
    outs = _finish_tail(cfg, scalars, lambda j: mis_ref[0, j], v,
                        (rdx[:], rdy[:], rdz[:]))
    out_refs = (out_ox, out_oy, out_oz, out_dx, out_dy, out_dz,
                out_tx, out_ty, out_tz, out_rx, out_ry, out_rz,
                out_alive, out_ppdf,
                out_cr, out_cg, out_cb, out_br, out_bg, out_bb,
                out_al, out_nx, out_ny, out_nz)
    for ref, val in zip(out_refs, outs):
        ref[:] = val


def _bounce_tail_kernel(cfg, const_ref, frame_ref,
                        px, py, pz, nx, ny, nz, offs,
                        ox, oy, oz, dx, dy, dz,
                        tpx, tpy, tpz, vol_trans,
                        kind, car, cag, cab, cbr, cbg, cbb, pow_r, ior_r,
                        sample_idx, pixel, live, recv, time_r,
                        rdx, rdy, rdz,
                        co_r, co_g, co_b, bg_r, bg_g, bg_b,
                        al_in, no_x, no_y, no_z, ppdf_in, obj_r,
                        *vol_and_outs):
    """Whole bounce tail (steps 2-7) in ONE kernel: the shadow body
    computes its radiance delta in registers and the finish body
    consumes it without the HBM round trip of the two-kernel path.

    cfg = (shadow_cfg, finish_cfg, n_shadow_const): the exact cfg tuples
    of _shadow_kernel and _finish_kernel, plus the offset of the
    emission-MIS const vector inside const_ref.
    frame_ref: SMEM i32 [1, 1 + 2L + 2*VM*L + 8]: the shadow kernel's
    frame+set-id vector followed by the finish kernel's flags[1:9]
    (set_fresnel..mis_on — frame is shared).
    const_ref: SMEM f32: the shadow const vector followed by the finish
    mis_const vector.
    vol_and_outs: the animated-channel site refs (_unpack_sites); then
    the VM*L (vol_dist, vol_pdf) pairs and the 24 output refs."""
    (shadow_cfg, finish_cfg, n_shadow_const) = cfg
    L, VM = shadow_cfg.L, shadow_cfg.VM
    consts = _unpack_shadow_const(shadow_cfg, const_ref)
    frame_u32, set_pick, set_nee, set_vol_pick, set_vol = \
        _unpack_shadow_sets(shadow_cfg, frame_ref)

    site_lp, site_sc, vol_and_outs = _unpack_sites(shadow_cfg,
                                                   vol_and_outs)
    n_vol = 2 * VM * L
    vol_args = vol_and_outs[:n_vol]
    outs_refs = vol_and_outs[n_vol:]

    d_x, d_y, d_z = dx[:], dy[:], dz[:]
    tm = time_r[:]
    v = dict(
        p=(px[:], py[:], pz[:]), n=(nx[:], ny[:], nz[:]), off=offs[:],
        o=(ox[:], oy[:], oz[:]), d=(d_x, d_y, d_z),
        tp=(tpx[:], tpy[:], tpz[:]), vtr=vol_trans[:],
        kind=kind[:], ca=(car[:], cag[:], cab[:]),
        cb=(cbr[:], cbg[:], cbb[:]), pw=pow_r[:], ior=ior_r[:],
        sidx=sample_idx[:].astype(jnp.uint32),
        pix=pixel[:].astype(jnp.uint32),
        alive=live[:] != 0, recv=recv[:] != 0,
        wo=(-d_x, -d_y, -d_z), tm=tm,
        co=(co_r[:], co_g[:], co_b[:]), bg=(bg_r[:], bg_g[:], bg_b[:]),
        al_in=al_in[:], no=(no_x[:], no_y[:], no_z[:]),
        ppdf=ppdf_in[:], obj=obj_r[:],
    )
    lights, spheres = _scene_at_time(shadow_cfg, consts, site_sc)
    vd = [[vol_args[2 * (m * L + i)][:] for i in range(L)]
          for m in range(VM)]
    vp = [[vol_args[2 * (m * L + i) + 1][:] for i in range(L)]
          for m in range(VM)]
    rad_r, rad_g, rad_b = _shadow_delta(
        shadow_cfg, consts, frame_u32,
        (set_pick, set_nee, set_vol_pick, set_vol),
        lights, spheres, v, vd, vp, site_lp)

    fbase = 1 + 2 * L + 2 * VM * L
    scalars = (frame_u32,
               frame_ref[0, fbase], frame_ref[0, fbase + 1],
               frame_ref[0, fbase + 2], frame_ref[0, fbase + 3],
               frame_ref[0, fbase + 4] != 0,
               frame_ref[0, fbase + 5] != 0,
               frame_ref[0, fbase + 6] != 0,
               frame_ref[0, fbase + 7] != 0)
    # two-kernel association order: (state.radiance + delta) + emission
    outs = _finish_tail(
        finish_cfg, scalars,
        lambda j: const_ref[0, n_shadow_const + j], v,
        (rdx[:] + rad_r, rdy[:] + rad_g, rdz[:] + rad_b))
    for ref, val in zip(outs_refs, outs):
        ref[:] = val


def finish_bounce_fused(data, static, settings, tables, depth: int,
                        state, hit, info, mat, live, receives,
                        radiance,
                        block_rows: int = 64, interpret: bool = False):
    """Fused steps 2+5-7: takes the pre-emission radiance (state.radiance
    + the shadow kernel's delta) and returns the next PathState. The
    emission term is folded in here (same formulas/streams as
    integrator.bounce step 2 + _finish_bounce)."""
    from rayn_tpu.render.integrator import PathState

    s = settings
    n = state.origin.shape[0]
    block_rows = max(_clamp_block_rows(block_rows, data, static), 8)
    block = block_rows * LANES
    n_pad = -(-n // block) * block
    rows = n_pad // LANES

    if static.has_extinction:
        vol_trans = jnp.exp(-data.volume_sigma_t * hit.t)
    else:
        vol_trans = jnp.ones((n,), jnp.float32)

    NL = int(static.n_lights)
    K = int(static.n_spheres)
    mis = bool(s.mis) and K > 0 and NL > 0
    TL = int(data.light_pos.values.shape[1]) if NL else 1
    cfg = (s.sampler, s.num_1d_sets,
           (s.compat_spec_reflect, s.compat_spec_phi),
           mis, K, NL, s.nee_light_samples, TL)
    flags = jnp.asarray([0,  # frame placeholder, set below
                         rng_mod.set1d_fresnel(s, depth),
                         rng_mod.set2d_diffuse(s, depth),
                         rng_mod.set2d_spec(s, depth),
                         rng_mod.set1d_roulette(s, depth),
                         1 if depth > 2 else 0,
                         1 if depth >= s.max_bounces else 0,
                         1 if depth == 0 else 0,
                         1 if (mis and depth > 0) else 0], jnp.int32)
    flags = flags.at[0].set(tables.frame.astype(jnp.int32))
    flags = flags.reshape(1, -1)

    # Per-sphere (paired flag, paired light radius, paired light pos
    # knots [TL, 3]) then the light channel (t0, t1), for the emission
    # MIS weight; the kernel lerps the knots at each lane's time.
    if mis:
        pair = data.sphere_light                       # [K] int32
        lidx_p = jnp.clip(pair, 0, NL - 1)
        lp = data.light_pos.values[lidx_p]             # [K, TL, 3]
        lr = data.light_radii[lidx_p]                  # [K]
        valid = (pair >= 0).astype(jnp.float32)
        mis_const = jnp.concatenate([jnp.concatenate([
            valid[:, None], lr[:, None],
            lp.reshape(K, 3 * TL)], axis=-1).reshape(-1),
            jnp.stack([jnp.asarray(data.light_pos.t0, jnp.float32),
                       jnp.asarray(data.light_pos.t1, jnp.float32)]),
        ]).reshape(1, -1)
    else:
        mis_const = jnp.zeros((1, 1), jnp.float32)

    args = [
        _to_rows(state.origin[:, 0], rows),
        _to_rows(state.origin[:, 1], rows),
        _to_rows(state.origin[:, 2], rows),
        _to_rows(state.direction[:, 0], rows),
        _to_rows(state.direction[:, 1], rows),
        _to_rows(state.direction[:, 2], rows),
        _to_rows(state.throughput[:, 0], rows),
        _to_rows(state.throughput[:, 1], rows),
        _to_rows(state.throughput[:, 2], rows),
        _to_rows(radiance[:, 0], rows), _to_rows(radiance[:, 1], rows),
        _to_rows(radiance[:, 2], rows),
        _to_rows(info.point[:, 0], rows), _to_rows(info.point[:, 1], rows),
        _to_rows(info.point[:, 2], rows),
        _to_rows(info.normal[:, 0], rows),
        _to_rows(info.normal[:, 1], rows),
        _to_rows(info.normal[:, 2], rows),
        _to_rows(info.offset_by, rows),
        _to_rows(vol_trans, rows),
        _to_rows(live.astype(jnp.int32), rows),
        _to_rows(receives.astype(jnp.int32), rows),
        _to_rows(state.sample_idx, rows), _to_rows(state.pixel, rows),
        _to_rows(mat.kind, rows),
        _to_rows(mat.color_a[:, 0], rows),
        _to_rows(mat.color_a[:, 1], rows),
        _to_rows(mat.color_a[:, 2], rows),
        _to_rows(mat.color_b[:, 0], rows),
        _to_rows(mat.color_b[:, 1], rows),
        _to_rows(mat.color_b[:, 2], rows),
        _to_rows(mat.power, rows), _to_rows(mat.ior, rows),
        _to_rows(state.color_out[:, 0], rows),
        _to_rows(state.color_out[:, 1], rows),
        _to_rows(state.color_out[:, 2], rows),
        _to_rows(state.bg_out[:, 0], rows),
        _to_rows(state.bg_out[:, 1], rows),
        _to_rows(state.bg_out[:, 2], rows),
        _to_rows(state.alpha_out, rows),
        _to_rows(state.normal_out[:, 0], rows),
        _to_rows(state.normal_out[:, 1], rows),
        _to_rows(state.normal_out[:, 2], rows),
        _to_rows(state.prev_pdf, rows),
        _to_rows(hit.obj, rows),
        _to_rows(state.time, rows),
    ]

    grid = rows // block_rows
    vspec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    smem_i = pl.BlockSpec((1, 9), lambda i: (0, 0),
                          memory_space=pltpu.SMEM)
    smem_f = pl.BlockSpec((1, mis_const.shape[1]), lambda i: (0, 0),
                          memory_space=pltpu.SMEM)
    f32 = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    i32 = jax.ShapeDtypeStruct((rows, LANES), jnp.int32)

    kernel = functools.partial(_finish_kernel, cfg)
    outs = pl.pallas_call(
        kernel, grid=(grid,),
        in_specs=[smem_i, smem_f] + [vspec] * len(args),
        out_specs=(vspec,) * 24,
        out_shape=(f32,) * 12 + (i32,) + (f32,) * 11,
        interpret=interpret or INTERPRET,
    )(flags, mis_const, *args)

    def flat(a):
        return a.reshape(-1)[:n]

    def vec3(a, b, c):
        return jnp.stack([flat(a), flat(b), flat(c)], axis=-1)

    (oox, ooy, ooz, odx, ody, odz, otx, oty, otz, orx, ory, orz,
     oalive, oppdf, ocr, ocg, ocb, obr, obg, obb, oal,
     onx, ony, onz) = outs
    return PathState(
        origin=vec3(oox, ooy, ooz),
        direction=vec3(odx, ody, odz),
        time=state.time,
        radiance=vec3(orx, ory, orz),
        throughput=vec3(otx, oty, otz),
        pixel=state.pixel,
        sample_idx=state.sample_idx,
        alive=flat(oalive) != 0,
        prev_pdf=flat(oppdf),
        color_out=vec3(ocr, ocg, ocb),
        bg_out=vec3(obr, obg, obb),
        alpha_out=flat(oal),
        normal_out=vec3(onx, ony, onz),
    )


def bounce_tail_fused(data, static, settings, tables, depth: int,
                      state, hit, info, mat, live, receives,
                      vol_dists, vol_pdfs,
                      block_rows: int = 64, interpret: bool = False):
    """Whole bounce tail (steps 2-7: NEE + volume shadows, emission,
    scatter, roulette, AOVs, termination) as ONE Pallas kernel — the
    two-kernel path (shadow_radiance + finish_bounce_fused) re-reads
    ~17 per-lane arrays and round-trips the 3-channel radiance delta
    through HBM between the kernels; here the delta stays in registers.
    Same formulas/streams/association order as the two-kernel path
    (equivalence tested); requires static.n_lights > 0 (otherwise use
    finish_bounce_fused directly). Returns the next PathState."""
    from rayn_tpu.render.integrator import PathState

    s = settings
    n = state.origin.shape[0]
    block_rows = max(_clamp_block_rows(block_rows, data, static), 8)
    block = block_rows * LANES
    n_pad = -(-n // block) * block
    rows = n_pad // LANES

    if static.has_extinction:
        vol_trans = jnp.exp(-data.volume_sigma_t * hit.t)
    else:
        vol_trans = jnp.ones((n,), jnp.float32)

    NL = int(static.n_lights)
    K = int(static.n_spheres)
    assert NL > 0, "bounce_tail_fused requires lights"

    shadow_cfg, shadow_const = _shadow_cfg_const(data, static, s)
    L, VM, TL = shadow_cfg.L, shadow_cfg.VM, shadow_cfg.TL
    n_shadow_const = int(shadow_const.shape[0])

    mis = bool(s.mis) and K > 0 and NL > 0
    if mis:
        pair = data.sphere_light
        lidx_p = jnp.clip(pair, 0, NL - 1)
        lp = data.light_pos.values[lidx_p]
        lr = data.light_radii[lidx_p]
        valid = (pair >= 0).astype(jnp.float32)
        mis_const = jnp.concatenate([jnp.concatenate([
            valid[:, None], lr[:, None],
            lp.reshape(K, 3 * TL)], axis=-1).reshape(-1),
            jnp.stack([jnp.asarray(data.light_pos.t0, jnp.float32),
                       jnp.asarray(data.light_pos.t1, jnp.float32)]),
        ])
    else:
        mis_const = jnp.zeros((1,), jnp.float32)
    const = jnp.concatenate([shadow_const, mis_const]).reshape(1, -1)
    n_const = const.shape[1]

    finish_cfg = (s.sampler, s.num_1d_sets,
                  (s.compat_spec_reflect, s.compat_spec_phi),
                  mis, K, NL, s.nee_light_samples, TL)
    set_ids = (
        [rng_mod.set1d_light_pick(s, depth, i) for i in range(L)]
        + [rng_mod.set2d_nee(s, depth, i) for i in range(L)]
        + [rng_mod.set1d_vol_pick(s, depth, m, i)
           for m in range(VM) for i in range(L)]
        + [rng_mod.set2d_vol(s, depth, m, i)
           for m in range(VM) for i in range(L)])
    finish_flags = [
        rng_mod.set1d_fresnel(s, depth),
        rng_mod.set2d_diffuse(s, depth),
        rng_mod.set2d_spec(s, depth),
        rng_mod.set1d_roulette(s, depth),
        1 if depth > 2 else 0,
        1 if depth >= s.max_bounces else 0,
        1 if depth == 0 else 0,
        1 if (mis and depth > 0) else 0,
    ]
    frame = jnp.concatenate([
        tables.frame.astype(jnp.int32).reshape(1),
        jnp.asarray(set_ids + finish_flags, jnp.int32),
    ]).reshape(1, -1)

    args = [
        _to_rows(info.point[:, 0], rows), _to_rows(info.point[:, 1], rows),
        _to_rows(info.point[:, 2], rows),
        _to_rows(info.normal[:, 0], rows),
        _to_rows(info.normal[:, 1], rows),
        _to_rows(info.normal[:, 2], rows),
        _to_rows(info.offset_by, rows),
        _to_rows(state.origin[:, 0], rows),
        _to_rows(state.origin[:, 1], rows),
        _to_rows(state.origin[:, 2], rows),
        _to_rows(state.direction[:, 0], rows),
        _to_rows(state.direction[:, 1], rows),
        _to_rows(state.direction[:, 2], rows),
        _to_rows(state.throughput[:, 0], rows),
        _to_rows(state.throughput[:, 1], rows),
        _to_rows(state.throughput[:, 2], rows),
        _to_rows(vol_trans, rows),
        _to_rows(mat.kind, rows),
        _to_rows(mat.color_a[:, 0], rows),
        _to_rows(mat.color_a[:, 1], rows),
        _to_rows(mat.color_a[:, 2], rows),
        _to_rows(mat.color_b[:, 0], rows),
        _to_rows(mat.color_b[:, 1], rows),
        _to_rows(mat.color_b[:, 2], rows),
        _to_rows(mat.power, rows), _to_rows(mat.ior, rows),
        _to_rows(state.sample_idx, rows), _to_rows(state.pixel, rows),
        _to_rows(live.astype(jnp.int32), rows),
        _to_rows(receives.astype(jnp.int32), rows),
        _to_rows(state.time, rows),
        _to_rows(state.radiance[:, 0], rows),
        _to_rows(state.radiance[:, 1], rows),
        _to_rows(state.radiance[:, 2], rows),
        _to_rows(state.color_out[:, 0], rows),
        _to_rows(state.color_out[:, 1], rows),
        _to_rows(state.color_out[:, 2], rows),
        _to_rows(state.bg_out[:, 0], rows),
        _to_rows(state.bg_out[:, 1], rows),
        _to_rows(state.bg_out[:, 2], rows),
        _to_rows(state.alpha_out, rows),
        _to_rows(state.normal_out[:, 0], rows),
        _to_rows(state.normal_out[:, 1], rows),
        _to_rows(state.normal_out[:, 2], rows),
        _to_rows(state.prev_pdf, rows),
        _to_rows(hit.obj, rows),
    ]
    args += _site_args(data, s, tables, depth, shadow_cfg,
                       state.sample_idx, state.pixel, state.time, rows)
    for m in range(VM):
        for i in range(L):
            args.append(_to_rows(vol_dists[m][i], rows))
            args.append(_to_rows(vol_pdfs[m][i], rows))

    grid = rows // block_rows
    vspec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, n_const), lambda i: (0, 0),
                        memory_space=pltpu.SMEM)
    smem_i = pl.BlockSpec((1, frame.shape[1]), lambda i: (0, 0),
                          memory_space=pltpu.SMEM)
    f32 = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    i32 = jax.ShapeDtypeStruct((rows, LANES), jnp.int32)

    kernel = functools.partial(_bounce_tail_kernel,
                               (shadow_cfg, finish_cfg, n_shadow_const))
    outs = pl.pallas_call(
        kernel, grid=(grid,),
        in_specs=[smem, smem_i] + [vspec] * len(args),
        out_specs=(vspec,) * 24,
        out_shape=(f32,) * 12 + (i32,) + (f32,) * 11,
        interpret=interpret or INTERPRET,
    )(const, frame, *args)

    def flat(a):
        return a.reshape(-1)[:n]

    def vec3(a, b, c):
        return jnp.stack([flat(a), flat(b), flat(c)], axis=-1)

    (oox, ooy, ooz, odx, ody, odz, otx, oty, otz, orx, ory, orz,
     oalive, oppdf, ocr, ocg, ocb, obr, obg, obb, oal,
     onx, ony, onz) = outs
    return PathState(
        origin=vec3(oox, ooy, ooz),
        direction=vec3(odx, ody, odz),
        time=state.time,
        radiance=vec3(orx, ory, orz),
        throughput=vec3(otx, oty, otz),
        pixel=state.pixel,
        sample_idx=state.sample_idx,
        alive=flat(oalive) != 0,
        prev_pdf=flat(oppdf),
        color_out=vec3(ocr, ocg, ocb),
        bg_out=vec3(obr, obg, obb),
        alpha_out=flat(oal),
        normal_out=vec3(onx, ony, onz),
    )


def shadow_radiance(data, static, settings, tables, depth: int,
                    point, normal, offset_by, origin, direction, hit_t,
                    throughput, vol_trans, mat, live, receives,
                    sample_idx, pixel, time, vol_dists, vol_pdfs,
                    block_rows: int = 64, interpret: bool = False):
    """Radiance delta [N, 3] of one bounce's NEE + volume single
    scattering, computed by the fused kernel. Streams and formulas match
    integrator.bounce steps 3+4 (same sampler set ids).

    vol_dists/vol_pdfs: nested [m][i] lists of [N] equi-angular distance
    samples and pdfs (computed outside with exact XLA arctan2; the
    kernel recomputes the same light pick bit-identically — the sampler
    is pure u32 arithmetic)."""
    s = settings
    n = point.shape[0]
    block_rows = max(_clamp_block_rows(block_rows, data, static), 8)
    block = block_rows * LANES
    n_pad = -(-n // block) * block
    rows = n_pad // LANES

    cfg, const = _shadow_cfg_const(data, static, s)
    L, VM = cfg.L, cfg.VM
    const = const.reshape(1, -1)
    n_const = const.shape[1]
    set_ids = (
        [rng_mod.set1d_light_pick(s, depth, i) for i in range(L)]
        + [rng_mod.set2d_nee(s, depth, i) for i in range(L)]
        + [rng_mod.set1d_vol_pick(s, depth, m, i)
           for m in range(VM) for i in range(L)]
        + [rng_mod.set2d_vol(s, depth, m, i)
           for m in range(VM) for i in range(L)])

    args = [
        _to_rows(point[:, 0], rows), _to_rows(point[:, 1], rows),
        _to_rows(point[:, 2], rows),
        _to_rows(normal[:, 0], rows), _to_rows(normal[:, 1], rows),
        _to_rows(normal[:, 2], rows),
        _to_rows(offset_by, rows),
        _to_rows(origin[:, 0], rows), _to_rows(origin[:, 1], rows),
        _to_rows(origin[:, 2], rows),
        _to_rows(direction[:, 0], rows), _to_rows(direction[:, 1], rows),
        _to_rows(direction[:, 2], rows),
        _to_rows(throughput[:, 0], rows), _to_rows(throughput[:, 1], rows),
        _to_rows(throughput[:, 2], rows),
        _to_rows(vol_trans, rows),
        _to_rows(mat.kind, rows),
        _to_rows(mat.color_a[:, 0], rows), _to_rows(mat.color_a[:, 1], rows),
        _to_rows(mat.color_a[:, 2], rows),
        _to_rows(mat.power, rows),
        _to_rows(sample_idx, rows), _to_rows(pixel, rows),
        _to_rows(live.astype(jnp.int32), rows),
        _to_rows(receives.astype(jnp.int32), rows),
        _to_rows(time, rows),
    ]
    args += _site_args(data, s, tables, depth, cfg, sample_idx, pixel,
                       time, rows)
    for m in range(VM):
        for i in range(L):
            args.append(_to_rows(vol_dists[m][i], rows))
            args.append(_to_rows(vol_pdfs[m][i], rows))

    grid = rows // block_rows
    vspec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, n_const), lambda i: (0, 0),
                        memory_space=pltpu.SMEM)
    smem_i = pl.BlockSpec((1, 1 + len(set_ids)), lambda i: (0, 0),
                          memory_space=pltpu.SMEM)
    frame = jnp.concatenate([
        tables.frame.astype(jnp.int32).reshape(1),
        jnp.asarray(set_ids, jnp.int32),
    ]).reshape(1, -1)

    kernel = functools.partial(_shadow_kernel, cfg)
    out_r, out_g, out_b = pl.pallas_call(
        kernel, grid=(grid,),
        in_specs=[smem, smem_i] + [vspec] * len(args),
        out_specs=(vspec, vspec, vspec),
        out_shape=(jax.ShapeDtypeStruct((rows, LANES), jnp.float32),) * 3,
        interpret=interpret or INTERPRET,
    )(const, frame, *args)
    return jnp.stack([out_r.reshape(-1)[:n], out_g.reshape(-1)[:n],
                      out_b.reshape(-1)[:n]], axis=-1)


def shadow_sort_key(data, static, settings, tables, depth: int,
                    point, normal, offset_by, origin, direction,
                    live, receives, sample_idx, pixel, time, vol_dists,
                    block_rows: int = 64, interpret: bool = False):
    """[N] f32 per-ray cost key for sorting the wavefront before the
    fused bounce tail (body: _shadow_cost_key). Rebuilds the bounce's
    shadow segments with the exact sampler streams the shadow kernel
    will use and prices each at segment-length / first-DE-step — ~12
    DE evaluations per ray, ~1% of the march it schedules. Pure
    scheduling data: the key never feeds a verdict or a radiance term,
    so any approximation here is performance-only."""
    s = settings
    n = point.shape[0]
    block_rows = max(_clamp_block_rows(block_rows, data, static), 8)
    block = block_rows * LANES
    n_pad = -(-n // block) * block
    rows = n_pad // LANES

    cfg, const = _shadow_cfg_const(data, static, s)
    L, VM = cfg.L, cfg.VM
    const = const.reshape(1, -1)
    n_const = const.shape[1]
    set_ids = (
        [rng_mod.set1d_light_pick(s, depth, i) for i in range(L)]
        + [rng_mod.set2d_nee(s, depth, i) for i in range(L)]
        + [rng_mod.set1d_vol_pick(s, depth, m, i)
           for m in range(VM) for i in range(L)]
        + [rng_mod.set2d_vol(s, depth, m, i)
           for m in range(VM) for i in range(L)])

    args = [
        _to_rows(point[:, 0], rows), _to_rows(point[:, 1], rows),
        _to_rows(point[:, 2], rows),
        _to_rows(normal[:, 0], rows), _to_rows(normal[:, 1], rows),
        _to_rows(normal[:, 2], rows),
        _to_rows(offset_by, rows),
        _to_rows(origin[:, 0], rows), _to_rows(origin[:, 1], rows),
        _to_rows(origin[:, 2], rows),
        _to_rows(direction[:, 0], rows), _to_rows(direction[:, 1], rows),
        _to_rows(direction[:, 2], rows),
        _to_rows(sample_idx, rows), _to_rows(pixel, rows),
        _to_rows(live.astype(jnp.int32), rows),
        _to_rows(receives.astype(jnp.int32), rows),
        _to_rows(time, rows),
    ]
    args += _site_args(data, s, tables, depth, cfg, sample_idx, pixel,
                       time, rows)
    for m in range(VM):
        for i in range(L):
            args.append(_to_rows(vol_dists[m][i], rows))

    grid = rows // block_rows
    vspec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, n_const), lambda i: (0, 0),
                        memory_space=pltpu.SMEM)
    smem_i = pl.BlockSpec((1, 1 + len(set_ids)), lambda i: (0, 0),
                          memory_space=pltpu.SMEM)
    frame = jnp.concatenate([
        tables.frame.astype(jnp.int32).reshape(1),
        jnp.asarray(set_ids, jnp.int32),
    ]).reshape(1, -1)

    kernel = functools.partial(_shadow_key_kernel, cfg)
    out = pl.pallas_call(
        kernel, grid=(grid,),
        in_specs=[smem, smem_i] + [vspec] * len(args),
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        interpret=interpret or INTERPRET,
    )(const, frame, *args)
    return out.reshape(-1)[:n]
