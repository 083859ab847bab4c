"""Fused closest-hit + shading-info as one Pallas kernel.

The unfused primary path per bounce is: [N,K] sphere quadratics (XLA) ->
SDF march (Pallas) -> closest select (XLA) -> shading_info (XLA: sphere
normals, tetrahedral SDF normals = 4 more DE evals, material gather) —
each stage round-tripping the wavefront through HBM. Here the whole
chain runs in one kernel: sphere fold, sphere-bounded SDF march,
tetrahedral normal, and the per-kind shading-info selects, with scene
constants (sphere centers/radii/materials, SDF params) in SMEM.

Semantics mirror ops.intersect.closest_hit + shading_info exactly
(reference src/hitable.rs:170-210, src/sphere.rs:48-86,
src/sdf.rs:59-102). Constant (1-knot) sphere channels only — the
animated case falls back to the unfused path (fused_intersect_ok).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rayn_tpu.ops.march_pallas import (LANES, _flatten_params, _to_rows,
                                       _unflatten_params)

_MISS = 3.4e38  # ops.spheres.MISS (reference src/sphere.rs:57)

# tetrahedral taps single-sourced from ops/sdf.py (sdfu normals_fast
# directions); the python-tuple form serves the in-kernel unrolled loop
from rayn_tpu.ops.sdf import TETRA_TAPS as _TETRA

# Test hook (see shade_pallas.INTERPRET)
INTERPRET = False


def fused_intersect_ok(settings, static, data, prog) -> bool:
    """Whether the fused intersect kernel can replace
    closest_hit + shading_info for this scene/settings. Scenes without
    an SDF are eligible (the kernel skips the march + tetra normal)."""
    from rayn_tpu.ops.shade_pallas import _eligibility_reason, warn_fallback
    if not (settings.use_pallas and settings.use_fused_intersect):
        return False
    if jax.default_backend() == "cpu" and not INTERPRET:
        return False
    reason = _eligibility_reason(settings, static, data, prog)
    if reason is not None:
        warn_fallback("fused intersect kernel", reason)
        return False
    return True


def _intersect_kernel(cfg, const_ref,
                      ox, oy, oz, dx, dy, dz, habs, hlin, act, time_r,
                      out_t, out_obj, out_px, out_py, out_pz,
                      out_nx, out_ny, out_nz, out_off, out_mat):
    """One block's closest-hit + shading info.

    const_ref: SMEM f32 [1, n_leaves + (3*TS+2)*K + 2]: SDF leaves then
    per-sphere (center knots [TS, 3], radius, material id as f32), then
    the sphere channel (t0, t1). Animated (TS > 1) centers are lerped at
    each lane's time (mirrors scene.sphere_centers_at)."""
    (fn_c, treedef, n_leaves, K, max_steps, detail, t_max0, sdf_mat,
     TS) = cfg
    from rayn_tpu.ops.shade_pallas import _interp3, _interp_weights
    prm = (_unflatten_params(const_ref, treedef, n_leaves)
           if fn_c is not None else None)
    sstride = 3 * TS + 2
    if TS > 1:
        st0 = const_ref[0, n_leaves + K * sstride]
        st1 = const_ref[0, n_leaves + K * sstride + 1]
        si0, sfrac = _interp_weights(time_r[:], st0, st1, TS)

    def sphere_k(k):
        base = n_leaves + k * sstride
        knots = tuple(tuple(const_ref[0, base + 3 * j + c]
                            for c in range(3)) for j in range(TS))
        center = _interp3(knots, si0, sfrac) if TS > 1 else knots[0]
        return center + (const_ref[0, base + 3 * TS],
                         const_ref[0, base + 3 * TS + 1])

    spheres = tuple(sphere_k(k) for k in range(K))

    o_x, o_y, o_z = ox[:], oy[:], oz[:]
    d_x, d_y, d_z = dx[:], dy[:], dz[:]
    hps_abs, hps_lin = habs[:], hlin[:]
    active = act[:] != 0

    # --- sphere closest-hit fold (ops/spheres.hit + the min/argmin
    # select in closest_hit; reference src/sphere.rs:48-72,
    # src/hitable.rs:177-198) ---
    best_t = jnp.full_like(o_x, t_max0)
    best_obj = jnp.full_like(o_x, -1.0)  # f32 object id (int select later)
    for k, (cx, cy, cz, rad, _m) in enumerate(spheres):
        ocx, ocy, ocz = o_x - cx, o_y - cy, o_z - cz
        b = ocx * d_x + ocy * d_y + ocz * d_z
        c = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
        descrim = b * b - c
        desc_pos = descrim > 0.0
        ds = jnp.sqrt(jnp.maximum(descrim, 0.0))
        t1 = -b - ds
        t2 = -b + ds
        t1v = (t1 > 1e-4) & (t1 <= t_max0) & desc_pos
        t2v = (t2 > 1e-4) & (t2 <= t_max0) & desc_pos
        tk = jnp.where(t1v, t1, t2)
        tk = jnp.where(t1v | t2v, tk, _MISS)
        closer = tk < best_t
        best_t = jnp.where(closer, tk, best_t)
        best_obj = jnp.where(closer, float(k), best_obj)

    # --- SDF march bounded by the sphere-closest (march_pallas
    # _march_kernel relax==1 body; reference src/sdf.rs:59-83) ---
    if fn_c is not None:
        eps_const = 5e-5 * detail
        eps_abs = 0.05 * detail * hps_abs
        eps_lin = 0.05 * detail * hps_lin
        t_max = best_t

        t0 = fn_c(prm, o_x, o_y, o_z)
        nan_mask = jnp.isnan(t0) & active
        t0 = jnp.where(active, t0, t_max + 1.0)

        def done_of(t, dist):
            thresh = jnp.maximum(eps_const, eps_abs + eps_lin * t)
            return (jnp.abs(dist) < thresh) | nan_mask | (t > t_max)

        init_done = jnp.all(jnp.logical_not(active) | nan_mask)

        def cond(state):
            step, _, all_done = state
            return jnp.logical_and(step < max_steps,
                                   jnp.logical_not(all_done))

        def body(state):
            step, t, _ = state
            dist = fn_c(prm, o_x + t * d_x, o_y + t * d_y, o_z + t * d_z)
            done = done_of(t, dist)
            t = jnp.where(done, t, t + dist)
            return step + 1, t, jnp.all(done)

        _, t_sdf, _ = jax.lax.while_loop(cond, body,
                                         (jnp.int32(0), t0, init_done))
        closer = t_sdf < best_t
        best_t = jnp.where(closer, t_sdf, best_t)
        best_obj = jnp.where(closer, float(K), best_obj)

    # --- shading info (ops/intersect.shading_info; reference
    # src/sphere.rs:74-86, src/sdf.rs:85-102) ---
    p_x = o_x + best_t * d_x
    p_y = o_y + best_t * d_y
    p_z = o_z + best_t * d_z
    obj_i = best_obj.astype(jnp.int32)
    is_sph = (obj_i >= 0) & (obj_i < K)
    is_sdf = obj_i == K

    n_x = jnp.zeros_like(p_x)
    n_y = jnp.zeros_like(p_x)
    n_z = jnp.zeros_like(p_x)
    mat = jnp.zeros_like(p_x)
    if K:
        scx = scy = scz = 0.0
        for k, (cx, cy, cz, _rad, mk) in enumerate(spheres):
            m = (obj_i == k).astype(jnp.float32)
            scx = scx + m * cx
            scy = scy + m * cy
            scz = scz + m * cz
            mat = mat + m * mk
        vx, vy, vz = p_x - scx, p_y - scy, p_z - scz
        vlen = jnp.sqrt(vx * vx + vy * vy + vz * vz)
        vinv = 1.0 / jnp.maximum(vlen, 1e-20)
        sphf = is_sph.astype(jnp.float32)
        n_x = jnp.where(is_sph, vx * vinv, n_x)
        n_y = jnp.where(is_sph, vy * vinv, n_y)
        n_z = jnp.where(is_sph, vz * vinv, n_z)
        del sphf

    off = jnp.zeros_like(p_x)
    if fn_c is not None:
        hps = jnp.maximum(1e-4, detail * (hps_abs + hps_lin * best_t))
        gx = jnp.zeros_like(p_x)
        gy = jnp.zeros_like(p_x)
        gz = jnp.zeros_like(p_x)
        for (kx, ky, kz) in _TETRA:
            dk = fn_c(prm, p_x + kx * hps, p_y + ky * hps, p_z + kz * hps)
            gx = gx + kx * dk
            gy = gy + ky * dk
            gz = gz + kz * dk
        glen = jnp.sqrt(gx * gx + gy * gy + gz * gz)
        ginv = 1.0 / jnp.maximum(glen, 1e-20)
        n_x = jnp.where(is_sdf, gx * ginv, n_x)
        n_y = jnp.where(is_sdf, gy * ginv, n_y)
        n_z = jnp.where(is_sdf, gz * ginv, n_z)
        mat = jnp.where(is_sdf, float(sdf_mat), mat)
        off = jnp.where(is_sdf, hps, off)

    out_t[:] = best_t
    out_obj[:] = obj_i
    out_px[:] = p_x
    out_py[:] = p_y
    out_pz[:] = p_z
    out_nx[:] = n_x
    out_ny[:] = n_y
    out_nz[:] = n_z
    out_off[:] = off
    out_mat[:] = mat.astype(jnp.int32)


def closest_hit_shading(data, static, settings, origin, direction,
                        hps_abs, hps_lin, active, time,
                        block_rows: int = 64, interpret: bool = False):
    """Fused closest-hit + shading info.

    Returns (Hit, ShadingInfo) matching ops.intersect.closest_hit +
    shading_info for eligible scenes (fused_intersect_ok)."""
    from rayn_tpu.ops.intersect import Hit, ShadingInfo

    prog = static.sdf_program(data) if static.has_sdf else None
    n = origin.shape[0]
    block_rows = max(block_rows, 8)
    block = block_rows * LANES
    n_pad = -(-n // block) * block
    rows = n_pad // LANES
    K = int(static.n_spheres)
    TS = int(data.sphere_centers.values.shape[1]) if K else 1

    params, treedef, n_leaves = _flatten_params(
        prog.params if prog is not None else {})
    # Spheres are indexed at offset n_leaves — exclude the zero-leaf
    # dummy _flatten_params returns for an empty pytree (n_leaves == 0).
    pieces = [params.reshape(-1)] if n_leaves else []
    if K:
        pieces.append(jnp.concatenate([
            data.sphere_centers.values.reshape(K, 3 * TS),  # all knots
            data.sphere_radii[:, None],              # [K, 1]
            data.sphere_mats.astype(jnp.float32)[:, None],
        ], axis=-1).reshape(-1))
        pieces.append(jnp.stack([
            jnp.asarray(data.sphere_centers.t0, jnp.float32),
            jnp.asarray(data.sphere_centers.t1, jnp.float32)]))
    if not pieces:
        pieces = [jnp.zeros((1,), jnp.float32)]  # SMEM needs >= 1 entry
    const = jnp.concatenate(pieces).reshape(1, -1)

    cfg = (prog.fn_c if prog is not None else None,
           treedef, n_leaves, K, settings.max_marches,
           settings.sdf_detail_scale, 2.0 * settings.world_radius,
           int(static.sdf_mat) if static.has_sdf else 0,
           TS)

    args = [
        _to_rows(origin[:, 0], rows), _to_rows(origin[:, 1], rows),
        _to_rows(origin[:, 2], rows),
        _to_rows(direction[:, 0], rows), _to_rows(direction[:, 1], rows),
        _to_rows(direction[:, 2], rows),
        _to_rows(hps_abs, rows), _to_rows(hps_lin, rows),
        _to_rows(active.astype(jnp.int32), rows),
        _to_rows(time, rows),
    ]
    grid = rows // block_rows
    vspec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, const.shape[1]), lambda i: (0, 0),
                        memory_space=pltpu.SMEM)
    f32 = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    i32 = jax.ShapeDtypeStruct((rows, LANES), jnp.int32)

    kernel = functools.partial(_intersect_kernel, cfg)
    (t, obj, px, py, pz, nx, ny, nz, off, mat) = pl.pallas_call(
        kernel, grid=(grid,),
        in_specs=[smem] + [vspec] * 10,
        out_specs=(vspec,) * 10,
        out_shape=(f32, i32, f32, f32, f32, f32, f32, f32, f32, i32),
        interpret=interpret or INTERPRET,
    )(const, *args)

    def flat(a):
        return a.reshape(-1)[:n]

    obj = flat(obj)
    hit = Hit(flat(t), obj, active & (obj >= 0))
    info = ShadingInfo(
        point=jnp.stack([flat(px), flat(py), flat(pz)], axis=-1),
        normal=jnp.stack([flat(nx), flat(ny), flat(nz)], axis=-1),
        offset_by=flat(off),
        mat=flat(mat),
    )
    return hit, info
