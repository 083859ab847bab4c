"""Wavefront path-tracing integrator.

TPU re-design of the reference's `PathTracingIntegrator`
(reference src/integrator.rs:32-281) and the wavefront driver loop around
it (src/film.rs:531-626). The reference repacks surviving 4-lane SIMD
rays densely after every bounce; on TPU the wavefront is thousands of
lanes wide and termination is an `alive` mask — dead lanes ride along for
the (statically unrolled) bounce loop, and all output channels are
written once by masked select, then scatter-added to the film by the
caller.

Per-bounce semantics (call stack CS4 in SURVEY.md §3):
1. intersect everything; missing lanes die silently
2. radiance += le * throughput * exp(-sigma_t * t)
3. NEE: L light picks, cone-sampled, shadow-tested, corrected by
   n_lights / L  (reference src/integrator.rs:73-94, :207-240)
4. volume: per march, L equi-angular samples, shadow-tested
   (src/integrator.rs:96-132, :242-281)
5. BSDF scatter; throughput update with NaN guard; Russian roulette for
   depth > 2 with factor max(1 - max_channel(throughput), 0.05)
   (src/integrator.rs:134-156, :181-183)
6. depth-0 AOVs: Alpha=1 + WorldNormal for receiving hits
   (src/integrator.rs:161-169)
7. termination: non-receivers write Background (depth 0) or Color;
   receivers past max_bounces or roulette-killed write Color
   (src/integrator.rs:171-203)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rayn_tpu.config import RenderSettings
from rayn_tpu.ops import bsdf as bsdf_ops
from rayn_tpu.ops import intersect, lights
from rayn_tpu.scene.scene import (REFRACTIVE, SceneData, SceneStatic,
                                  light_position_of)
from rayn_tpu.utils import rng, sampling, vecmath
from rayn_tpu.utils.gather import small_gather
from rayn_tpu.utils.rng import SampleTables


class PathState(NamedTuple):
    """Struct-of-arrays wavefront state — the generalization of the
    reference's `WRay` path state (src/ray.rs:4-29)."""
    origin: jnp.ndarray      # [N, 3]
    direction: jnp.ndarray   # [N, 3]
    time: jnp.ndarray        # [N]
    radiance: jnp.ndarray    # [N, 3]
    throughput: jnp.ndarray  # [N, 3]
    pixel: jnp.ndarray       # [N] int32 flat pixel id
    sample_idx: jnp.ndarray  # [N] int32 per-pixel sample number
    alive: jnp.ndarray       # [N] bool
    # solid-angle pdf of the BSDF sample that spawned this ray; -1.0 for
    # camera rays or vertices where NEE could not have sampled the same
    # emitter (used only when settings.mis)
    prev_pdf: jnp.ndarray    # [N]
    # terminal channel outputs (each lane writes each at most once)
    color_out: jnp.ndarray   # [N, 3]
    bg_out: jnp.ndarray      # [N, 3]
    alpha_out: jnp.ndarray   # [N]
    normal_out: jnp.ndarray  # [N, 3]
    # optional extra AOV values (render/aovs.py), written once at
    # depth 0 like the reference's Alpha/WorldNormal
    # (src/integrator.rs:161-169); in settings.extra_aovs order
    aovs: tuple = ()


def init_state(origin, direction, time, pixel, sample_idx, alive) -> PathState:
    n = origin.shape[0]
    z3 = jnp.zeros((n, 3), jnp.float32)
    return PathState(
        origin=origin, direction=direction, time=time,
        radiance=z3, throughput=jnp.ones((n, 3), jnp.float32),
        pixel=pixel, sample_idx=sample_idx, alive=alive,
        prev_pdf=jnp.full((n,), -1.0, jnp.float32),
        color_out=z3, bg_out=z3,
        alpha_out=jnp.zeros((n,), jnp.float32), normal_out=z3)


def _sort_chunk(n: int) -> int:
    """Lanes per sort unit. Cost-sorting schedules CHUNKS of adjacent
    lanes, not single lanes: adjacent lanes are pixel-coherent (the
    queue is pixel-major) so their shadow-chain costs correlate, and
    chunk-granular permutation runs at row-gather bandwidth — per-LANE
    permutation of the 49-column bounce state measured 95 ms/M on v5e
    (pack/interleave bound; tools/perf_sorted_decomp.py) and ate the
    entire 206 ms/M scheduling win. 128 lanes (one Pallas row) measured
    the sweep optimum: 618.7 vs 623.6 ms/pass at 512 with advance
    grouping on (tools/perf_sorted_chunk_sweep.py, 2026-08-19).

    Returns 0 when no supported chunk divides `n` — the caller then
    SKIPS cost-sorting for the pass (with a one-time warning) instead
    of silently shipping the chunk=1 per-lane permutation this repo
    measured as a 95 ms/M pathology (tools/perf_sorted_decomp.py)."""
    for chunk in (128, 512, 8):
        if n % chunk == 0:
            return chunk
    return 0


def _permute_chunks(tree, perm, chunk: int):
    """Permute every leaf's leading axis by the CHUNK permutation `perm`
    (leaf rows [i*chunk, (i+1)*chunk) move together). One row-granular
    take per leaf — no packing, no interleave."""
    def one(leaf):
        a = leaf.reshape((-1, chunk) + leaf.shape[1:])
        return jnp.take(a, perm, axis=0).reshape(leaf.shape)

    return jax.tree.map(one, tree)


def _sort_tree_by_cost(tree, key, chunk: int):
    """Sort any per-ray pytree by DESCENDING per-chunk cost key: reduce
    the per-lane key over chunks, one tiny 2-column `lax.sort` produces
    the chunk permutation, row-granular takes apply it
    (`_permute_chunks`). Sorting changes only which Pallas block a chunk
    lands in; every per-lane output is position-independent, and
    `_unsort_state` restores the exact original order before the film
    splat, so results are bit-identical to the unsorted path."""
    ckey = jnp.sum(key.reshape(-1, chunk), axis=-1)
    iota = jnp.arange(ckey.shape[0], dtype=jnp.int32)
    _, perm = jax.lax.sort([-ckey, iota], num_keys=1)
    return _permute_chunks(tree, perm, chunk), perm


def _sort_by_cost(state: PathState, hit, info, key, chunk: int):
    (state, hit, info), perm = _sort_tree_by_cost((state, hit, info),
                                                  key, chunk)
    return state, hit, info, perm


def _unsort_state(state: PathState, perm, chunk: int) -> PathState:
    """Invert `_sort_by_cost`'s chunk permutation on a bounce's output
    state (inverse permutation via one tiny 2-column sort)."""
    iota = jnp.arange(perm.shape[0], dtype=jnp.int32)
    _, inv = jax.lax.sort([perm, iota], num_keys=1)
    return _permute_chunks(state, inv, chunk)


def _intersect_cost_key(data: SceneData, static: SceneStatic,
                        settings: RenderSettings, state: PathState):
    """Estimated primary-march step count per lane, computable BEFORE
    the intersect: segment-to-scene-bound over the first DE step (the
    same md/t0 estimate as shade_pallas._segment_cost, applied to the
    closest-hit march whose t_max is the sphere-fold closest). Plain
    jnp — the sphere quadratics and one DE per instance fuse into the
    pass for ~1 ms/M; the model (tools/perf_block_model.py) puts the
    chunk-sorted win at 1.34x fewer intersect-march lane-iterations at
    depths >= 1 (depth 0 is already pixel-coherent; sorting it HURTS)."""
    from rayn_tpu.ops import spheres as sphere_ops
    from rayn_tpu.scene.scene import sphere_centers_at

    n = state.origin.shape[0]
    t_max0 = 2.0 * settings.world_radius
    if static.n_spheres:
        centers = sphere_centers_at(data, state.time)
        ts = sphere_ops.hit(state.origin, state.direction, centers,
                            data.sphere_radii,
                            jnp.full((n,), t_max0, jnp.float32))
        bound = jnp.minimum(jnp.min(ts, axis=-1), t_max0)
    else:
        bound = jnp.full((n,), t_max0, jnp.float32)
    key = jnp.zeros((n,), jnp.float32)
    for prog, _mat, _bv in static.sdf_instances(data):
        d0 = prog.dist(state.origin)
        est = jnp.minimum(bound / jnp.maximum(d0, 1e-6),
                          float(settings.max_marches))
        key = key + jnp.where(state.alive & jnp.logical_not(jnp.isnan(d0)),
                              est, 1.0)
    return key


def _pick_lights(settings: RenderSettings, static: SceneStatic, u: jnp.ndarray):
    idx = jnp.floor(u * static.n_lights).astype(jnp.int32)
    return jnp.clip(idx, 0, static.n_lights - 1)


def _gather_lights(data: SceneData, time: jnp.ndarray, lidx: jnp.ndarray):
    """Per-ray light parameters. Uses one-hot contractions instead of
    native gathers — a 5-row gather over a 1M-ray wavefront measured
    ~15 ms on v5e; the one-hot form runs at bandwidth speed."""
    pos = light_position_of(data, lidx, time)
    rad = small_gather(data.light_radii[:, None], lidx)[:, 0]
    em = small_gather(data.light_emission, lidx)
    return pos, rad, em


def _derive_shading(data: SceneData, static: SceneStatic,
                    state: PathState, hit, info):
    """Per-lane values derived from (state, hit, info). Called once per
    bounce, and AGAIN after _sort_by_cost so the sorted path re-derives
    them in the new lane order from one definition (elementwise/one-hot
    — bit-identical per lane)."""
    live = state.alive & hit.valid  # lanes shading this bounce
    # Missing lanes die silently (the reference never bins them,
    # src/hitable.rs:203-209).
    mat = bsdf_ops.gather(data.materials, info.mat)
    # per-shading-point material parameters (the reference's
    # WShadingParamGenerator surface, src/material.rs:75-83): override
    # color_a per lane. Flows through the fused kernels too — they take
    # per-lane material parameters as inputs. Elementwise per lane, so
    # re-derivation after cost-sorting stays bit-identical.
    for mid, fn in static.mat_param_fns:
        sel = info.mat == mid
        mat = mat._replace(color_a=jnp.where(
            sel[:, None], fn(info.point, info.normal), mat.color_a))
    receives = bsdf_ops.receives_light(mat) & live
    wo = -state.direction
    if static.has_extinction:
        vol_trans = jnp.exp(-data.volume_sigma_t * hit.t)
    else:
        vol_trans = jnp.ones(hit.t.shape, jnp.float32)
    return live, mat, receives, wo, vol_trans


def bounce(data: SceneData, static: SceneStatic, settings: RenderSettings,
           tables: SampleTables, state: PathState, depth: int,
           hps_abs0: jnp.ndarray, hps_lin0: jnp.ndarray) -> PathState:
    """One wavefront bounce at static `depth`."""
    n = state.origin.shape[0]
    s = settings

    # Cone footprint: camera half-pixel at depth 0, widening schedule
    # afterwards (reference src/film.rs:540-551).
    if depth == 0:
        hps_abs = jnp.broadcast_to(hps_abs0, (n,))
        hps_lin = jnp.broadcast_to(hps_lin0, (n,))
    else:
        hps_abs = jnp.zeros((n,), jnp.float32)
        hps_lin = jnp.full((n,), 2e-4 * depth, jnp.float32)

    # Pre-intersect cost sort (depths >= 1): pack bounce rays with
    # expensive primary marches into the same Pallas blocks before the
    # fused intersect. Bit-identical — block membership only; the
    # bounce's output is unsorted back (composed with the shadow sort's
    # permutation) before returning. Depth 0 stays in pixel-major order,
    # which the model measures as already better than any computable key
    # (tools/perf_block_model.py).
    pre_perm = None
    chunk_pre = 0
    if (s.sorted_intersect and depth > 0 and static.has_sdf
            and s.use_pallas):
        chunk_pre = s.sorted_chunk or _sort_chunk(n)
        if s.sorted_chunk and n % chunk_pre:
            raise ValueError(
                f"sorted_chunk={chunk_pre} must divide rays_per_pass={n}")
        if chunk_pre:
            key0 = _intersect_cost_key(data, static, s, state)
            state, pre_perm = _sort_tree_by_cost(state, key0, chunk_pre)
        else:
            from rayn_tpu.ops.shade_pallas import warn_fallback
            warn_fallback(
                "pre-intersect cost sorting",
                f"pass size {n} is not divisible by any supported "
                "sort chunk (128/512/8); intersecting unsorted")

    def unsort_out(out: PathState, shadow_perm=None) -> PathState:
        """Undo this bounce's permutation(s) on the output state: the
        pre-intersect and shadow-sort chunk permutations compose into
        one (both use the same chunk), inverted by _unsort_state."""
        if pre_perm is not None and shadow_perm is not None:
            return _unsort_state(out, jnp.take(pre_perm, shadow_perm),
                                 chunk_pre)
        if shadow_perm is not None:
            return _unsort_state(out, shadow_perm, chunk_pre or
                                 (s.sorted_chunk or _sort_chunk(n)))
        if pre_perm is not None:
            return _unsort_state(out, pre_perm, chunk_pre)
        return out

    from rayn_tpu.ops import intersect_pallas
    if intersect_pallas.fused_intersect_ok(s, static, data):
        hit, info = intersect_pallas.closest_hit_shading(
            data, static, s, state.origin, state.direction,
            hps_abs, hps_lin, state.alive, state.time,
            block_rows=s.pallas_block_rows)
    else:
        t_max = jnp.full((n,), 2.0 * s.world_radius, jnp.float32)
        hit = intersect.closest_hit(
            data, static, s, state.origin, state.direction, state.time,
            t_max, hps_abs, hps_lin, state.alive)
        info = intersect.shading_info(
            data, static, s, hit, state.origin, state.direction,
            state.time, hps_abs, hps_lin)

    live, mat, receives, wo, vol_trans = _derive_shading(
        data, static, state, hit, info)

    # Extra AOVs: depth-0 extraction, before the fused tail (the fused
    # kernels rebuild PathState without aovs; re-attached after).
    if depth == 0 and s.extra_aovs:
        from rayn_tpu.render import aovs as aovs_mod
        state = state._replace(
            aovs=aovs_mod.extract(s, hit, info, mat, receives))

    # Fully fused bounce tail: shadow kernel (steps 3+4) + finish kernel
    # (steps 2 and 5-7, emission folded in). Same formulas/streams;
    # emission is added after the shadow delta instead of before (f32
    # association only).
    from rayn_tpu.ops import shade_pallas
    if (s.use_fused_finish
            and shade_pallas.fused_ok(s, static, data)):
        # Cost-sorted scheduling: pack rays with expensive shadow
        # chains into the same Pallas blocks (bit-identical per lane;
        # unsorted back before returning — see _sort_by_cost).
        sort_on = (s.sorted_shadow_march and s.chained_shadow_march
                   and depth > 0 and static.has_sdf
                   and static.n_lights > 0)
        unsort_iota = None
        if sort_on:
            chunk = s.sorted_chunk or _sort_chunk(n)
            if s.sorted_chunk and n % chunk:
                raise ValueError(
                    f"sorted_chunk={chunk} must divide rays_per_pass={n}")
            if chunk == 0:
                # No supported chunk divides this pass size; per-lane
                # permutation is the measured 95 ms/M pathology, so skip
                # sorting (bit-identical — sorting is scheduling only).
                shade_pallas.warn_fallback(
                    "cost-sorted shadow scheduling",
                    f"pass size {n} is not divisible by any supported "
                    "sort chunk (128/512/8); rendering unsorted")
                sort_on = False
        if sort_on:
            vd0, _ = _equi_angular_samples(data, static, s, tables,
                                           state, hit, depth)
            cost = shade_pallas.shadow_sort_key(
                data, static, s, tables, depth,
                info.point, info.normal, info.offset_by,
                state.origin, state.direction, live, receives,
                state.sample_idx, state.pixel, state.time, vd0,
                block_rows=s.pallas_occl_block_rows)
            state, hit, info, unsort_iota = _sort_by_cost(
                state, hit, info, cost, chunk)
            live, mat, receives, wo, vol_trans = _derive_shading(
                data, static, state, hit, info)
        if s.use_fused_bounce_tail and static.n_lights > 0:
            # whole-tail mega-kernel: shadow + finish in one launch
            out = shade_pallas.bounce_tail_fused(
                data, static, s, tables, depth, state, hit, info, mat,
                live, receives,
                *_equi_angular_samples(data, static, s, tables, state,
                                       hit, depth),
                block_rows=s.pallas_occl_block_rows)
            out = out._replace(aovs=state.aovs)
            return unsort_out(out, unsort_iota)
        rad = state.radiance
        if static.n_lights > 0:
            rad = rad + shade_pallas.shadow_radiance(
                data, static, s, tables, depth,
                info.point, info.normal, info.offset_by,
                state.origin, state.direction, hit.t,
                state.throughput, vol_trans, mat, live, receives,
                state.sample_idx, state.pixel, state.time,
                *_equi_angular_samples(data, static, s, tables, state,
                                       hit, depth),
                block_rows=s.pallas_occl_block_rows)
        out = shade_pallas.finish_bounce_fused(
            data, static, s, tables, depth, state, hit, info, mat,
            live, receives, rad, block_rows=s.pallas_occl_block_rows)
        out = out._replace(aovs=state.aovs)
        return unsort_out(out, unsort_iota)

    # 2. emission. With MIS, BSDF-hit emission of an emissive sphere
    # paired with a sphere light is power-heuristic weighted against the
    # NEE strategy that could have sampled the same emitter from the
    # previous vertex (the pairing removes the reference's co-located
    # double count, src/setup.rs:107-122 + dead power_heuristic
    # src/math.rs:193-199).
    le = bsdf_ops.emitted(mat, wo)
    if s.mis and depth > 0 and static.n_lights > 0 and static.n_spheres > 0:
        sph_idx = jnp.clip(hit.obj, 0, static.n_spheres - 1)
        pair = small_gather(
            data.sphere_light.astype(jnp.float32)[:, None],
            sph_idx)[:, 0].astype(jnp.int32)
        is_paired = ((hit.obj >= 0) & (hit.obj < static.n_spheres)
                     & (pair >= 0) & (state.prev_pdf >= 0.0))
        lidx_p = jnp.clip(pair, 0, static.n_lights - 1)
        lp = light_position_of(data, lidx_p, state.time)
        lr = small_gather(data.light_radii[:, None], lidx_p)[:, 0]
        d2 = vecmath.length_sq(lp - state.origin)
        cos_theta_max = jnp.sqrt(jnp.maximum(0.0, 1.0 - lr * lr / d2))
        # NEE samples nee_light_samples directions, each with density
        # cone_pdf * (1/n_lights); the BSDF strategy drew one sample
        # with density prev_pdf.
        q = sampling.uniform_cone_pdf(cos_theta_max) / static.n_lights
        w_bsdf = sampling.power_heuristic(
            1.0, state.prev_pdf, float(s.nee_light_samples), q)
        le = le * jnp.where(is_paired, w_bsdf, 1.0)[:, None]
    radiance = state.radiance + jnp.where(
        live[:, None], le * state.throughput * vol_trans[:, None], 0.0)


    # 3 + 4. NEE and volume single scattering. Fast path: the whole
    # shadow pipeline of this bounce fused into one Pallas kernel
    # (ops/shade_pallas.py) — identical sampler streams and formulas,
    # radiance delta out. Fallback: build all shadow segments (L NEE +
    # volume_marches*L equi-angular) and test them in ONE batched
    # occlusion call — the wavefront "shadow queue" (BASELINE.json north
    # star): one big march kernel launch per bounce instead of 12, with
    # contributions applied afterwards as contrib * visibility.
    if static.n_lights > 0:
        if shade_pallas.fused_ok(s, static, data):
            radiance = radiance + shade_pallas.shadow_radiance(
                data, static, s, tables, depth,
                info.point, info.normal, info.offset_by,
                state.origin, state.direction, hit.t,
                state.throughput, vol_trans, mat, live, receives,
                state.sample_idx, state.pixel, state.time,
                *_equi_angular_samples(data, static, s, tables, state,
                                       hit, depth),
                block_rows=s.pallas_occl_block_rows)
            return unsort_out(_finish_bounce(
                data, static, s, tables, state, depth, hit, info, mat,
                live, receives, wo, vol_trans, radiance))
    shadow_starts, shadow_ends, shadow_active, shadow_contrib = [], [], [], []

    if static.n_lights > 0:
        correction = static.n_lights / s.nee_light_samples
        for i in range(s.nee_light_samples):
            u_pick = rng.sample_1d(s, tables, rng.set1d_light_pick(s, depth, i),
                                   state.sample_idx, state.pixel)
            lidx = _pick_lights(s, static, u_pick)
            lp, lr, lem = _gather_lights(data, state.time, lidx)
            u2 = rng.sample_2d(s, tables, rng.set2d_nee(s, depth, i),
                               state.sample_idx, state.pixel)
            end_point, li, pdf = lights.sample_cone(u2, lp, lr, info.point, lem)
            wi_full = end_point - info.point
            dist = vecmath.length(wi_full)
            wi = wi_full / dist[:, None]
            occ_origin = info.point + info.normal * (
                jnp.copysign(1.0, vecmath.dot(info.normal, wi))
                * info.offset_by)[:, None]
            f = bsdf_ops.eval_f(mat, wo, wi, info.normal) * jnp.maximum(
                0.0, vecmath.dot(info.normal, wi))[:, None]
            if static.has_extinction:
                seg_trans = jnp.exp(-data.volume_sigma_t * dist)
            else:
                seg_trans = jnp.ones((n,), jnp.float32)
            contrib = (li * f * (seg_trans / pdf)[:, None]
                       * state.throughput * (correction * vol_trans)[..., None])
            contrib = jnp.where(receives[:, None], contrib, 0.0)
            if s.mis:
                # Weight NEE against the BSDF strategy for *paired*
                # lights only — unpaired lights are invisible to BSDF
                # rays, so their NEE weight stays 1.
                p_bsdf = bsdf_ops.eval_pdf(mat, s, wo, wi, info.normal)
                q = pdf / static.n_lights
                w_light = sampling.power_heuristic(
                    float(s.nee_light_samples), q, 1.0, p_bsdf)
                paired = small_gather(
                    data.light_paired[:, None], lidx)[:, 0]
                contrib = contrib * jnp.where(paired > 0.0,
                                              w_light, 1.0)[:, None]
            # a zero contribution (light below horizon, black throughput)
            # needs no visibility test
            worth_it = receives & jnp.any(contrib != 0.0, axis=-1)
            shadow_starts.append(occ_origin)
            shadow_ends.append(end_point)
            shadow_active.append(worth_it)
            shadow_contrib.append(contrib)

    if static.has_scattering and static.n_lights > 0 and s.volume_marches:
        vm_correction = static.n_lights / s.nee_light_samples / s.volume_marches
        for m in range(s.volume_marches):
            u_dist = rng.sample_1d(s, tables, rng.set1d_vol_dist(s, depth, m),
                                   state.sample_idx, state.pixel)
            for i in range(s.nee_light_samples):
                u_pick = rng.sample_1d(
                    s, tables, rng.set1d_vol_pick(s, depth, m, i),
                    state.sample_idx, state.pixel)
                lidx = _pick_lights(s, static, u_pick)
                lp, lr, lem = _gather_lights(data, state.time, lidx)
                vol_dist, vol_pdf = lights.sample_equi_angular(
                    u_dist, lp, state.origin, state.direction, hit.t)
                sampled_point = state.origin + vol_dist[:, None] * state.direction
                u2 = rng.sample_2d(s, tables, rng.set2d_vol(s, depth, m, i),
                                   state.sample_idx, state.pixel)
                end_point, li, light_pdf = lights.sample_cone(
                    u2, lp, lr, sampled_point, lem)
                dist_pl = vecmath.length(end_point - sampled_point)
                phase_f = 1.0 / (4.0 * jnp.pi)
                if static.has_extinction:
                    seg_trans = jnp.exp(-data.volume_sigma_t * dist_pl)
                    to_point_trans = jnp.exp(-data.volume_sigma_t * vol_dist)
                else:
                    seg_trans = jnp.ones((n,), jnp.float32)
                    to_point_trans = jnp.ones((n,), jnp.float32)
                scale = (phase_f * seg_trans / (vol_pdf * light_pdf)
                         * vm_correction * data.volume_sigma_s * to_point_trans)
                contrib = li * scale[:, None] * state.throughput
                contrib = jnp.where(live[:, None], contrib, 0.0)
                worth_it = live & jnp.any(contrib != 0.0, axis=-1)
                shadow_starts.append(sampled_point)
                shadow_ends.append(end_point)
                shadow_active.append(worth_it)
                shadow_contrib.append(contrib)

    if shadow_starts:
        k = len(shadow_starts)
        vis_all = intersect.test_occluded(
            data, static, s,
            jnp.concatenate(shadow_starts, axis=0),
            jnp.concatenate(shadow_ends, axis=0),
            jnp.tile(state.time, k),
            jnp.concatenate(shadow_active, axis=0),
            segments=k)
        for j in range(k):
            vis = vis_all[j * n:(j + 1) * n]
            radiance = radiance + shadow_contrib[j] * vis[:, None]

    return unsort_out(_finish_bounce(data, static, s, tables, state,
                                     depth, hit, info, mat, live,
                                     receives, wo, vol_trans, radiance))


def _equi_angular_samples(data, static, s, tables, state, hit, depth):
    """(vol_dists, vol_pdfs) nested [m][i] lists for the fused shadow
    kernel — equi-angular distances need arctan2/tan, which Mosaic does
    not lower, so they are computed here with exact XLA ops. The light
    pick is recomputed bit-identically in-kernel (pure u32 arithmetic)."""
    vol_dists, vol_pdfs = [], []
    if static.has_scattering and s.volume_marches and static.n_lights > 0:
        for m in range(s.volume_marches):
            u_dist = rng.sample_1d(
                s, tables, rng.set1d_vol_dist(s, depth, m),
                state.sample_idx, state.pixel)
            vol_dists.append([])
            vol_pdfs.append([])
            for i in range(s.nee_light_samples):
                u_pick = rng.sample_1d(
                    s, tables, rng.set1d_vol_pick(s, depth, m, i),
                    state.sample_idx, state.pixel)
                lidx = _pick_lights(s, static, u_pick)
                lp = light_position_of(data, lidx, state.time)
                vdist, vpdf = lights.sample_equi_angular(
                    u_dist, lp, state.origin, state.direction, hit.t)
                vol_dists[m].append(vdist)
                vol_pdfs[m].append(vpdf)
    return vol_dists, vol_pdfs


def _finish_bounce(data, static, s, tables, state, depth, hit, info, mat,
                   live, receives, wo, vol_trans, radiance) -> PathState:
    """Steps 5-7 of a bounce (scatter, AOVs, termination) — shared by the
    fused-shadow and segment-queue paths."""
    n = state.origin.shape[0]
    # 5. scatter + throughput + roulette
    u_f = rng.sample_1d(s, tables, rng.set1d_fresnel(s, depth),
                        state.sample_idx, state.pixel)
    u_diff = rng.sample_2d(s, tables, rng.set2d_diffuse(s, depth),
                           state.sample_idx, state.pixel)
    u_spec = rng.sample_2d(s, tables, rng.set2d_spec(s, depth),
                           state.sample_idx, state.pixel)
    se = bsdf_ops.scatter(mat, s, wo, info.normal, u_f, u_diff, u_spec)
    ndl = jnp.abs(vecmath.dot(se.wi, info.normal))
    new_throughput = (state.throughput * vol_trans[:, None] * se.f
                      * (ndl / se.pdf)[:, None])

    if depth > 2:  # reference src/integrator.rs:147-156
        roulette = jnp.maximum(
            1.0 - jnp.max(state.throughput, axis=-1), 0.05)
        new_throughput = new_throughput / (1.0 - roulette)[:, None]
    else:
        roulette = jnp.zeros((n,), jnp.float32)

    u_r = rng.sample_1d(s, tables, rng.set1d_roulette(s, depth),
                        state.sample_idx, state.pixel)
    rr_kill = u_r < roulette
    terminate = (depth >= s.max_bounces) | rr_kill

    # 6. depth-0 AOVs
    if depth == 0:
        alpha_out = jnp.where(receives, 1.0, state.alpha_out)
        normal_out = jnp.where(receives[:, None], info.normal,
                               state.normal_out)
    else:
        alpha_out = state.alpha_out
        normal_out = state.normal_out

    # 7. termination bookkeeping
    non_recv = live & jnp.logical_not(receives)
    if depth == 0:
        bg_out = jnp.where(non_recv[:, None], radiance, state.bg_out)
        color_out = state.color_out
    else:
        bg_out = state.bg_out
        color_out = jnp.where(non_recv[:, None], radiance, state.color_out)
    recv_done = receives & terminate
    color_out = jnp.where(recv_done[:, None], radiance, color_out)

    survive = receives & jnp.logical_not(terminate)

    # continued-ray update (reference src/hitable.rs:42-47 origin bias +
    # NaN throughput guard src/integrator.rs:181-183)
    new_origin = info.point + info.normal * (
        jnp.copysign(1.0, vecmath.dot(info.normal, se.wi))
        * info.offset_by)[:, None]
    tp_nan = jnp.any(jnp.isnan(new_throughput), axis=-1)
    next_tp = jnp.where(tp_nan[:, None], state.throughput, new_throughput)

    # Refractive vertices do no NEE (eval_f = 0), so the light strategy
    # can never produce their continuation's emitter hits: mark the
    # spawned ray as MIS-exempt (weight 1 at the next emissive hit).
    next_pdf = jnp.where(mat.kind == REFRACTIVE, -1.0, se.pdf)

    return PathState(
        origin=jnp.where(survive[:, None], new_origin, state.origin),
        direction=jnp.where(survive[:, None], se.wi, state.direction),
        time=state.time,
        radiance=radiance,
        throughput=jnp.where(survive[:, None], next_tp, state.throughput),
        pixel=state.pixel,
        sample_idx=state.sample_idx,
        alive=survive,
        prev_pdf=jnp.where(survive, next_pdf, state.prev_pdf),
        color_out=color_out,
        bg_out=bg_out,
        alpha_out=alpha_out,
        normal_out=normal_out,
        aovs=state.aovs,
    )


def compact(state: PathState) -> PathState:
    """Stable-partition the wavefront: alive lanes first.

    Safe because every lane carries its pixel id and terminal outputs;
    the film scatter at the end of the pass is permutation-invariant.
    This is the reference's dense repacking (src/film.rs:604-625) as a
    sort instead of a CPU-side queue rebuild; stability preserves the
    pixel-major coherence the Pallas block early-exit relies on.
    """
    n = state.alive.shape[0]
    alive = state.alive
    # O(N) stable partition: destination = rank among alive lanes, or
    # n_alive + rank among dead lanes; invert with one scatter. Much
    # cheaper on TPU than argsort.
    alive_rank = jnp.cumsum(alive.astype(jnp.int32)) - 1
    n_alive = alive_rank[-1] + 1
    dead_rank = jnp.cumsum(jnp.logical_not(alive).astype(jnp.int32)) - 1
    dest = jnp.where(alive, alive_rank, n_alive + dead_rank)
    order = jnp.zeros((n,), jnp.int32).at[dest].set(
        jnp.arange(n, dtype=jnp.int32))
    return jax.tree.map(lambda a: jnp.take(a, order, axis=0), state)


def trace(data: SceneData, static: SceneStatic, settings: RenderSettings,
          tables: SampleTables, state: PathState,
          hps_abs0: jnp.ndarray, hps_lin0: jnp.ndarray) -> PathState:
    """Run the full (statically unrolled) bounce loop."""
    for depth in range(settings.max_bounces + 1):
        if depth > 0 and settings.compact_bounces:
            state = compact(state)
        state = bounce(data, static, settings, tables, state, depth,
                       hps_abs0, hps_lin0)
    return state
