"""Fused closest-hit + shading-info as one Pallas kernel.

The unfused primary path per bounce is: [N,K] sphere quadratics (XLA) ->
SDF march (Pallas) -> closest select (XLA) -> shading_info (XLA: sphere
normals, tetrahedral SDF normals = 4 more DE evals, material gather) —
each stage round-tripping the wavefront through HBM. Here the whole
chain runs in one kernel: sphere fold, sphere-bounded SDF march folded
across every traced-SDF instance, tetrahedral normal, and the per-kind
shading-info selects, with scene constants (sphere centers/radii/
materials, per-instance SDF params) in SMEM.

Semantics mirror ops.intersect.closest_hit + shading_info exactly
(reference src/hitable.rs:170-210, src/sphere.rs:48-86,
src/sdf.rs:59-102), including the whole-store closest fold: each
instance is marched with the running closest as its t_max. Animated
(TS > 1) sphere centers are resolved OUTSIDE the kernel at each lane's
time (scene.sphere_centers_at) and enter as per-lane VMEM inputs — no
knot limit, no in-kernel lerp (the same design that fixed the animated
light channels, BASELINE.md round-4). Eligibility is the shared
shade_pallas._eligibility_reason: component-form SDFs with scalar
parameter leaves, plain (relax=1) marching.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rayn_tpu.ops.march_pallas import LANES, _to_rows
from rayn_tpu.ops.shade_pallas import (_flatten_instances,
                                       _unpack_instances)

_MISS = 3.4e38  # ops.spheres.MISS (reference src/sphere.rs:57)

# tetrahedral taps single-sourced from ops/sdf.py (sdfu normals_fast
# directions); the python-tuple form serves the in-kernel unrolled loop
from rayn_tpu.ops.sdf import TETRA_TAPS as _TETRA

# Test hook (see shade_pallas.INTERPRET)
INTERPRET = False


def fused_intersect_ok(settings, static, data) -> bool:
    """Whether the fused intersect kernel can replace
    closest_hit + shading_info for this scene/settings. Scenes without
    an SDF are eligible (the kernel skips the march + tetra normal);
    any instance count and any sphere-channel knot count run fused."""
    from rayn_tpu.ops.shade_pallas import _eligibility_reason, warn_fallback
    if not (settings.use_pallas and settings.use_fused_intersect):
        return False
    if jax.default_backend() == "cpu" and not INTERPRET:
        return False
    reason = _eligibility_reason(settings, static, data)
    if reason is not None:
        warn_fallback("fused intersect kernel", reason)
        return False
    return True


def _intersect_kernel(cfg, const_ref,
                      ox, oy, oz, dx, dy, dz, habs, hlin, act, time_r,
                      *site_and_outs):
    """One block's closest-hit + shading info.

    const_ref: SMEM f32 [1, sum(n_leaves) + 5*K (+1 when empty)]:
    per-instance SDF leaves (consecutive — shade_pallas
    _flatten_instances layout) then per-sphere (knot-0 center xyz,
    radius, material id as f32). Animated (TS > 1) centers arrive
    per-lane instead (see site_and_outs) and the knot-0 scalars are
    dead values (Mosaic DCEs them).
    site_and_outs: 3*K per-lane resolved sphere-center refs when
    TS > 1 (x, y, z per sphere — scene.sphere_centers_at at each
    lane's time), then the 10 output refs."""
    (sdfs, mats, K, max_steps, detail, t_max0, TS) = cfg
    prms, base = _unpack_instances(sdfs, const_ref)
    site_sc = None
    if TS > 1:
        site_sc = [site_and_outs[3 * k:3 * k + 3] for k in range(K)]
        site_and_outs = site_and_outs[3 * K:]
    (out_t, out_obj, out_px, out_py, out_pz,
     out_nx, out_ny, out_nz, out_off, out_mat) = site_and_outs

    def sphere_k(k):
        b = base + 5 * k
        if site_sc is not None:
            center = (site_sc[k][0][:], site_sc[k][1][:],
                      site_sc[k][2][:])
        else:
            center = tuple(const_ref[0, b + c] for c in range(3))
        return center + (const_ref[0, b + 3], const_ref[0, b + 4])

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

    # --- SDF march folded across instances, each bounded by the
    # running closest (march_pallas _march_kernel relax==1 body;
    # reference src/sdf.rs:59-83 folded per src/hitable.rs:170-210) ---
    eps_const = 5e-5 * detail
    eps_abs = 0.05 * detail * hps_abs
    eps_lin = 0.05 * detail * hps_lin
    for j, (inst, prm) in enumerate(zip(sdfs, prms)):
        fn_c = inst.fn_c
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
            dist = fn_c(prm, o_x + t * d_x, o_y + t * d_y,
                        o_z + t * d_z)
            done = done_of(t, dist)
            t = jnp.where(done, t, t + dist)
            return step + 1, t, jnp.all(done)

        _, t_sdf, _ = jax.lax.while_loop(cond, body,
                                         (jnp.int32(0), t0, init_done))
        closer = t_sdf < best_t
        best_t = jnp.where(closer, t_sdf, best_t)
        best_obj = jnp.where(closer, float(K + j), best_obj)

    # --- shading info (ops/intersect.shading_info; reference
    # src/sphere.rs:74-86, src/sdf.rs:85-102) ---
    p_x = o_x + best_t * d_x
    p_y = o_y + best_t * d_y
    p_z = o_z + best_t * d_z
    obj_i = best_obj.astype(jnp.int32)
    is_sph = (obj_i >= 0) & (obj_i < K)

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
        n_x = jnp.where(is_sph, vx * vinv, n_x)
        n_y = jnp.where(is_sph, vy * vinv, n_y)
        n_z = jnp.where(is_sph, vz * vinv, n_z)

    off = jnp.zeros_like(p_x)
    if sdfs:
        hps = jnp.maximum(1e-4, detail * (hps_abs + hps_lin * best_t))
        for j, (inst, prm) in enumerate(zip(sdfs, prms)):
            is_j = obj_i == K + j
            gx = jnp.zeros_like(p_x)
            gy = jnp.zeros_like(p_x)
            gz = jnp.zeros_like(p_x)
            for (kx, ky, kz) in _TETRA:
                dk = inst.fn_c(prm, p_x + kx * hps, p_y + ky * hps,
                               p_z + kz * hps)
                gx = gx + kx * dk
                gy = gy + ky * dk
                gz = gz + kz * dk
            glen = jnp.sqrt(gx * gx + gy * gy + gz * gz)
            ginv = 1.0 / jnp.maximum(glen, 1e-20)
            n_x = jnp.where(is_j, gx * ginv, n_x)
            n_y = jnp.where(is_j, gy * ginv, n_y)
            n_z = jnp.where(is_j, gz * ginv, n_z)
            mat = jnp.where(is_j, float(mats[j]), mat)
            off = jnp.where(is_j, hps, off)

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

    n = origin.shape[0]
    block_rows = max(block_rows, 8)
    block = block_rows * LANES
    n_pad = -(-n // block) * block
    rows = n_pad // LANES
    K = int(static.n_spheres)
    TS = int(data.sphere_centers.values.shape[1]) if K else 1

    insts = static.sdf_instances(data) if static.has_sdf else []
    flat, sdfs = _flatten_instances([(prog, 0.0)
                                     for prog, _mat, _bv in insts])
    mats = tuple(int(m) for _prog, m, _bv in insts)
    # Spheres are indexed right after the instance leaves (the empty
    # flat vector has length 0 — no dummy entry).
    pieces = [flat] if flat.shape[0] else []
    if K:
        pieces.append(jnp.concatenate([
            data.sphere_centers.values[:, 0, :],      # [K, 3] knot 0
            data.sphere_radii[:, None],               # [K, 1]
            data.sphere_mats.astype(jnp.float32)[:, None],
        ], axis=-1).reshape(-1))
    if not pieces:
        pieces = [jnp.zeros((1,), jnp.float32)]  # SMEM needs >= 1 entry
    const = jnp.concatenate(pieces).reshape(1, -1)

    cfg = (sdfs, mats, K, settings.max_marches,
           settings.sdf_detail_scale, 2.0 * settings.world_radius, TS)

    args = [
        _to_rows(origin[:, 0], rows), _to_rows(origin[:, 1], rows),
        _to_rows(origin[:, 2], rows),
        _to_rows(direction[:, 0], rows), _to_rows(direction[:, 1], rows),
        _to_rows(direction[:, 2], rows),
        _to_rows(hps_abs, rows), _to_rows(hps_lin, rows),
        _to_rows(active.astype(jnp.int32), rows),
        _to_rows(time, rows),
    ]
    if TS > 1:
        from rayn_tpu.scene.scene import sphere_centers_at
        sc = sphere_centers_at(data, time)            # [N, K, 3]
        for k in range(K):
            for c in range(3):
                args.append(_to_rows(sc[:, k, c], rows))
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
        in_specs=[smem] + [vspec] * len(args),
        out_specs=(vspec,) * 10,
        out_shape=(f32, i32, f32, f32, f32, f32, f32, f32, f32, i32),
        interpret=interpret or INTERPRET,
    )(const, *args)

    def flat_out(a):
        return a.reshape(-1)[:n]

    obj = flat_out(obj)
    hit = Hit(flat_out(t), obj, active & (obj >= 0))
    info = ShadingInfo(
        point=jnp.stack([flat_out(px), flat_out(py), flat_out(pz)],
                        axis=-1),
        normal=jnp.stack([flat_out(nx), flat_out(ny), flat_out(nz)],
                         axis=-1),
        offset_by=flat_out(off),
        mat=flat_out(mat),
    )
    return hit, info
