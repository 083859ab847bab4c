"""Scene-level intersection: closest hit, occlusion, shading info.

The reference folds one wide ray packet over a vec of `Hitable` trait
objects keeping the per-lane closest (id, t) (reference
src/hitable.rs:170-210) and bins the results by object id for shading
(src/hitable.rs:94-134). Here the whole wavefront intersects every
sphere as one [N, K] broadcast plus a single SDF march, and "binning by
material" is replaced by masked gathers from the material table — no
repacking required on TPU.

Object-id convention: 0..K-1 = spheres (in scene order), K+i = traced
SDF instance i (in add_sdf order), -1 = miss.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

import jax

from rayn_tpu.config import RenderSettings
from rayn_tpu.ops import march as march_ops
from rayn_tpu.ops import march_pallas
from rayn_tpu.ops import sdf as sdf_ops
from rayn_tpu.ops import spheres as sphere_ops
from rayn_tpu.scene.scene import (SceneData, SceneStatic, sphere_center_of,
                                  sphere_centers_at)
from rayn_tpu.utils import vecmath


def _pallas_ok(settings: RenderSettings, prog) -> bool:
    if not (settings.use_pallas and prog.fn_c is not None
            and jax.default_backend() not in ("cpu",)):
        return False
    # The kernels carry SDF parameters as a flat SMEM vector of scalars;
    # any non-scalar parameter leaf must take the jnp path.
    return all(
        getattr(jnp.asarray(leaf), "shape", ()) == ()
        for leaf in jax.tree.leaves(prog.params))


class Hit(NamedTuple):
    t: jnp.ndarray        # [N] distance (MISS-large on miss)
    obj: jnp.ndarray      # [N] int32 object id, -1 on miss
    valid: jnp.ndarray    # [N] bool


class ShadingInfo(NamedTuple):
    point: jnp.ndarray      # [N, 3]
    normal: jnp.ndarray     # [N, 3]
    offset_by: jnp.ndarray  # [N] shadow/bounce ray origin bias
    mat: jnp.ndarray        # [N] int32 material id


def closest_hit(data: SceneData, static: SceneStatic,
                settings: RenderSettings,
                origin: jnp.ndarray, direction: jnp.ndarray,
                time: jnp.ndarray, t_max: jnp.ndarray,
                hps_abs: jnp.ndarray, hps_lin: jnp.ndarray,
                active: jnp.ndarray) -> Hit:
    """Closest hit across all spheres + the SDF.

    hps_abs/hps_lin describe the cone footprint half_pixel_size_at(t) =
    hps_abs + hps_lin*t used for the SDF hit threshold (reference
    src/film.rs:540-551, src/sdf.rs:69-71).
    """
    n = origin.shape[0]
    best_t = t_max
    best_obj = jnp.full((n,), -1, jnp.int32)

    if static.n_spheres:
        centers = sphere_centers_at(data, time)          # [N, K, 3]
        ts = sphere_ops.hit(origin, direction, centers,
                            data.sphere_radii, t_max)     # [N, K]
        sph_t = jnp.min(ts, axis=1)
        sph_id = jnp.argmin(ts, axis=1).astype(jnp.int32)
        closer = sph_t < best_t
        best_t = jnp.where(closer, sph_t, best_t)
        best_obj = jnp.where(closer, sph_id, best_obj)

    if static.has_sdf:
        detail = settings.sdf_detail_scale
        import functools
        # Fold over every SDF instance keeping the per-lane closest —
        # the reference's HitableStore fold (src/hitable.rs:170-210).
        # Marching each instance with the running closest as t_max keeps
        # the fold semantics while saving march steps.
        for i, (prog, _mat, _bv) in enumerate(static.sdf_instances(data)):
            if (_pallas_ok(settings, prog)
                    and settings.march_sort_steps > 0
                    and settings.march_relaxation == 1.0):
                def march_fn(*a, relax=1.0, **kw):
                    del relax  # sorted kernel is plain marching (routed)
                    return march_pallas.march_sorted(
                        *a, phase1_steps=settings.march_sort_steps,
                        block_rows=settings.pallas_block_rows, **kw)
            elif _pallas_ok(settings, prog):
                march_fn = functools.partial(
                    march_pallas.march,
                    block_rows=settings.pallas_block_rows)
            else:
                march_fn = march_ops.march
            t_sdf = march_fn(
                prog, origin, direction, best_t,
                eps_const=5e-5 * detail,
                eps_abs=0.05 * detail * hps_abs,
                eps_lin=0.05 * detail * hps_lin,
                max_steps=settings.max_marches,
                active=active,
                relax=settings.march_relaxation)
            closer = t_sdf < best_t
            best_t = jnp.where(closer, t_sdf, best_t)
            best_obj = jnp.where(closer, jnp.int32(static.n_spheres + i),
                                 best_obj)

    valid = active & (best_obj >= 0)
    return Hit(best_t, best_obj, valid)


def test_occluded(data: SceneData, static: SceneStatic,
                  settings: RenderSettings,
                  start: jnp.ndarray, end: jnp.ndarray,
                  time: jnp.ndarray,
                  active: jnp.ndarray,
                  segments: int = 1) -> jnp.ndarray:
    """[N] float 1.0 = visible, 0.0 = occluded — the product-fold of
    per-object occlusion tests (reference src/hitable.rs:163-168).

    segments > 1 declares that the queue is `segments` same-length
    segment groups concatenated segment-major (lane i of segment k at
    index k*N/segments + i, all groups belonging to the same rays —
    the integrator's per-bounce shadow queue). When the Pallas
    occlusion path is eligible, the SDF marches then run CHAINED per
    ray (march_pallas.march_occlusion_chained): bit-identical verdicts,
    1.6-1.7x fewer block iterations (see chained_shadow_march)."""
    occluded = jnp.zeros(start.shape[0], bool)
    if static.n_spheres:
        centers = sphere_centers_at(data, time)
        occ = sphere_ops.occluded(start, end, centers, data.sphere_radii)
        occluded = occluded | jnp.any(occ, axis=1)
    if static.has_sdf:
        # Shadow-march cost reduction (BASELINE.md round-3 study):
        # truncated-iteration DE, scaled epsilons, bounding-volume clip —
        # identical in the fused kernel (shade_pallas.shadow_radiance).
        # Product-fold across every SDF instance (src/hitable.rs:163-168).
        detail = settings.sdf_detail_scale * settings.shadow_eps_scale
        import functools
        for prog, _mat, inst_bv in static.sdf_instances(data):
            prog = prog.reduced(settings.shadow_de_iterations)
            bv_r = float(inst_bv) if settings.shadow_bv_clip else 0.0
            if (settings.use_pallas_occlusion
                    and _pallas_ok(settings, prog)
                    and settings.occl_sort_steps > 0
                    and settings.march_relaxation == 1.0):
                # study path; no bounding-volume clip implemented here
                occl_fn = functools.partial(
                    march_pallas.march_occlusion_sorted,
                    phase1_steps=settings.occl_sort_steps,
                    block_rows=settings.pallas_occl_block_rows)
            elif (settings.use_pallas_occlusion
                    and _pallas_ok(settings, prog)
                    and settings.occl_phase1_steps > 0
                    and settings.march_relaxation == 1.0):
                # study path; no bounding-volume clip implemented here
                occl_fn = functools.partial(
                    march_pallas.march_occlusion_phased,
                    phase1_steps=settings.occl_phase1_steps,
                    block_rows=settings.pallas_occl_block_rows)
            elif settings.use_pallas_occlusion and _pallas_ok(settings,
                                                              prog):
                if (1 < segments <= 30 and settings.chained_shadow_march
                        and settings.march_relaxation == 1.0
                        and start.shape[0] % segments == 0):
                    k, nseg = segments, start.shape[0] // segments
                    m_act = active & jnp.logical_not(occluded)
                    occ_sdf = march_pallas.march_occlusion_chained(
                        prog, start.reshape(k, nseg, 3),
                        end.reshape(k, nseg, 3), detail,
                        settings.max_vis_marches,
                        m_act.reshape(k, nseg),
                        block_rows=settings.pallas_occl_block_rows,
                        bound_radius=bv_r,
                        advance_group=max(
                            1, settings.chained_advance_group)
                    ).reshape(-1)
                    occluded = occluded | occ_sdf
                    continue
                occl_fn = functools.partial(
                    march_pallas.march_occlusion,
                    block_rows=settings.pallas_occl_block_rows,
                    relax=settings.march_relaxation,
                    bound_radius=bv_r)
            else:
                occl_fn = functools.partial(
                    march_ops.march_occlusion,
                    relax=settings.march_relaxation,
                    bound_radius=bv_r)
            occ_sdf = occl_fn(
                prog, start, end, detail,
                settings.max_vis_marches,
                active=active & jnp.logical_not(occluded))
            occluded = occluded | occ_sdf
    return jnp.where(occluded, 0.0, 1.0)


def shading_info(data: SceneData, static: SceneStatic,
                 settings: RenderSettings, hit: Hit,
                 origin: jnp.ndarray, direction: jnp.ndarray,
                 time: jnp.ndarray, hps_abs: jnp.ndarray,
                 hps_lin: jnp.ndarray) -> ShadingInfo:
    """Per-ray surface data at the hit point.

    Spheres: geometric normal from the animated center, offset_by = 0
    (reference src/sphere.rs:74-86). SDF: tetrahedral normal with
    eps = max(1e-4, detail * half_pixel_size_at(t)), offset_by = eps
    (reference src/sdf.rs:85-101).
    """
    n = origin.shape[0]
    point = origin + hit.t[:, None] * direction
    normal = jnp.zeros_like(point)
    offset_by = jnp.zeros((n,), jnp.float32)
    mat = jnp.zeros((n,), jnp.int32)

    if static.n_spheres:
        idx = jnp.clip(hit.obj, 0, static.n_spheres - 1)
        c = sphere_center_of(data, idx, time)            # [N, 3]
        sph_n = vecmath.normalize(point - c, eps=1e-20)
        is_sph = (hit.obj >= 0) & (hit.obj < static.n_spheres)
        normal = jnp.where(is_sph[:, None], sph_n, normal)
        from rayn_tpu.utils.gather import small_gather
        sph_mat = small_gather(
            data.sphere_mats.astype(jnp.float32)[:, None], idx)[:, 0]
        mat = jnp.where(is_sph, sph_mat.astype(jnp.int32), mat)

    if static.has_sdf:
        detail = settings.sdf_detail_scale
        hps = jnp.maximum(1e-4, detail * (hps_abs + hps_lin * hit.t))
        for i, (prog, inst_mat, _bv) in enumerate(
                static.sdf_instances(data)):
            is_sdf = hit.obj == static.n_spheres + i
            sdf_n = sdf_ops.tetrahedral_normal(prog, point, hps)
            normal = jnp.where(is_sdf[:, None], sdf_n, normal)
            offset_by = jnp.where(is_sdf, hps, offset_by)
            mat = jnp.where(is_sdf, jnp.int32(inst_mat), mat)

    return ShadingInfo(point, normal, offset_by, mat)
