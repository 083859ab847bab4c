"""Pallas TPU kernels for SDF sphere tracing.

Why a kernel: the pure-jnp march (rayn_tpu.ops.march) runs one
`lax.while_loop` over the whole million-ray wavefront, so every step
round-trips the carries through HBM and the loop runs until the *slowest*
ray in the entire queue finishes (~max_steps almost always). These kernels
tile the wavefront into VMEM-resident blocks of rays (grid over blocks);
each block runs the march loop entirely on the VPU with its own early
exit, so a block of coherent rays (adjacent pixels — the queue is
pixel-major) stops after the block's own worst case, typically far below
max_steps. This is the TPU analog of the reference's 4-lane
`move_mask() == 0b1111` early-outs (reference src/sdf.rs:41-43, :78-81) at
block granularity, and is "hard part #1" of SURVEY.md §7.

The SDF distance program is inlined into the kernel via its
component-form `fn_c(params, x, y, z)`; the (few) scalar parameters ride
in SMEM so the same compiled kernel serves any parameter values.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rayn_tpu.ops.sdf import SdfProgram

LANES = 128
DEFAULT_BLOCK_ROWS = 8  # 8 x 128 = 1024 rays per block


def _flatten_params(params):
    leaves, treedef = jax.tree.flatten(params)
    if not leaves:
        return jnp.zeros((1, 1), jnp.float32), treedef, 0
    for leaf in leaves:
        if jnp.asarray(leaf).shape != ():
            raise ValueError(
                "Pallas march kernels carry SDF parameters in SMEM as a "
                f"flat vector of scalars; got a leaf of shape "
                f"{jnp.asarray(leaf).shape}. Use the jnp march path "
                "(intersect._pallas_ok already routes this).")
    flat = jnp.stack([jnp.asarray(l, jnp.float32).reshape(()) for l in leaves])
    return flat.reshape(1, -1), treedef, len(leaves)


def _unflatten_params(params_ref, treedef, n_leaves):
    leaves = [params_ref[0, i] for i in range(n_leaves)]
    return jax.tree.unflatten(treedef, leaves)


def _to_rows(a, rows):
    pad = rows * LANES - a.shape[0]
    if pad:
        a = jnp.pad(a, (0, pad))
    return a.reshape(rows, LANES)


def _march_kernel(fn_c, treedef, n_leaves, max_steps, eps_const, relax,
                  params_ref, ox, oy, oz, dx, dy, dz, tmax, eabs, elin,
                  act, out_t):
    prm = _unflatten_params(params_ref, treedef, n_leaves)
    o_x, o_y, o_z = ox[:], oy[:], oz[:]
    d_x, d_y, d_z = dx[:], dy[:], dz[:]
    t_max = tmax[:]
    eps_abs = eabs[:]
    eps_lin = elin[:]
    active = act[:] != 0

    t0 = fn_c(prm, o_x, o_y, o_z)
    nan_mask = jnp.isnan(t0) & active
    t0 = jnp.where(active, t0, t_max + 1.0)

    def done_of(t, dist):
        thresh = jnp.maximum(eps_const, eps_abs + eps_lin * t)
        return (jnp.abs(dist) < thresh) | nan_mask | (t > t_max)

    init_done = jnp.all(jnp.logical_not(active) | nan_mask)

    if relax == 1.0:
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

        _, t, _ = jax.lax.while_loop(cond, body,
                                     (jnp.int32(0), t0, init_done))
        out_t[:] = t
        return

    # over-relaxed variant (see rayn_tpu.ops.march.march)
    def cond_r(state):
        return jnp.logical_and(state[0] < max_steps,
                               jnp.logical_not(state[4]))

    def body_r(state):
        step, t_prev, r_prev, t, _ = state
        r = fn_c(prm, o_x + t * d_x, o_y + t * d_y, o_z + t * d_z)
        overshoot = (t - t_prev) > (jnp.abs(r_prev) + jnp.abs(r))
        done = done_of(t, r) & jnp.logical_not(overshoot)
        t_cons = t_prev + r_prev
        new_t_prev = jnp.where(done | overshoot, t_prev, t)
        new_r_prev = jnp.where(done | overshoot, r_prev, r)
        next_t = jnp.where(done, t,
                           jnp.where(overshoot, t_cons, t + relax * r))
        return (step + 1, new_t_prev, new_r_prev, next_t, jnp.all(done))

    zeros = jnp.zeros_like(t0)
    _, _, _, t, _ = jax.lax.while_loop(
        cond_r, body_r, (jnp.int32(0), zeros, t0, t0, init_done))
    out_t[:] = t


def march(prog: SdfProgram, origin, direction, t_max, eps_const: float,
          eps_abs, eps_lin, max_steps: int, active,
          block_rows: int = DEFAULT_BLOCK_ROWS, interpret: bool = False,
          relax: float = 1.0):
    """Pallas twin of rayn_tpu.ops.march.march (same semantics, reference
    src/sdf.rs:59-83)."""
    n = origin.shape[0]
    block_rows = max(block_rows, 8)  # Mosaic minimum (8, 128) tiles
    block = block_rows * LANES
    n_pad = -(-n // block) * block
    rows = n_pad // LANES

    params, treedef, n_leaves = _flatten_params(prog.params)
    args = [
        _to_rows(origin[:, 0], rows), _to_rows(origin[:, 1], rows),
        _to_rows(origin[:, 2], rows),
        _to_rows(direction[:, 0], rows), _to_rows(direction[:, 1], rows),
        _to_rows(direction[:, 2], rows),
        _to_rows(t_max, rows), _to_rows(eps_abs, rows),
        _to_rows(eps_lin, rows),
        _to_rows(active.astype(jnp.int32), rows),
    ]
    grid = rows // block_rows
    vspec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    kernel = functools.partial(_march_kernel, prog.fn_c, treedef, n_leaves,
                               max_steps, eps_const, relax)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((1, max(n_leaves, 1)), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)] + [vspec] * 10,
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        interpret=interpret,
    )(params, *args)
    return out.reshape(-1)[:n]


def march_sorted(prog: SdfProgram, origin, direction, t_max,
                 eps_const: float, eps_abs, eps_lin, max_steps: int,
                 active, phase1_steps: int = 8,
                 block_rows: int = DEFAULT_BLOCK_ROWS,
                 interpret: bool = False):
    """Primary march with step-homogeneous phase-2 blocks via a payload
    sort (the march twin of march_occlusion_sorted; see its docstring
    for why sorting beats per-lane-gather packing on TPU). Bit-identical
    to march(): the per-lane step sequence is untouched, only block
    membership changes. Reference semantics: src/sdf.rs:59-83."""
    n = origin.shape[0]
    block_rows = max(block_rows, 8)
    block = block_rows * LANES
    n_pad = -(-n // block) * block
    rows = n_pad // LANES

    params, treedef, n_leaves = _flatten_params(prog.params)
    args = [
        _to_rows(origin[:, 0], rows), _to_rows(origin[:, 1], rows),
        _to_rows(origin[:, 2], rows),
        _to_rows(direction[:, 0], rows), _to_rows(direction[:, 1], rows),
        _to_rows(direction[:, 2], rows),
        _to_rows(t_max, rows), _to_rows(eps_abs, rows),
        _to_rows(eps_lin, rows),
        _to_rows(active.astype(jnp.int32), rows),
    ]
    grid = rows // block_rows
    vspec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, max(n_leaves, 1)), lambda i: (0, 0),
                        memory_space=pltpu.SMEM)
    k1 = functools.partial(_march_phase1_kernel, prog.fn_c, treedef,
                           n_leaves, min(phase1_steps, max_steps), eps_const)
    t1, res1 = pl.pallas_call(
        k1, grid=(grid,),
        in_specs=[smem] + [vspec] * 10,
        out_specs=(vspec, vspec),
        out_shape=(jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((rows, LANES), jnp.int32)),
        interpret=interpret,
    )(params, *args)
    t1 = t1.reshape(-1)[:n]
    resolved = res1.reshape(-1)[:n] != 0
    if phase1_steps >= max_steps:
        return t1

    # Remaining-step predictor: distance left over marching speed so far
    # (slow creep after phase 1 predicts many remaining steps).
    speed = jnp.maximum(t1, 1e-20) / float(phase1_steps)
    predicted = (t_max - t1) / speed
    key = jnp.where(resolved, -1.0, predicted.astype(jnp.float32))

    unresolved = jnp.logical_not(resolved)
    iota = jnp.arange(n, dtype=jnp.int32)
    sorted_ops = jax.lax.sort(
        [key, origin[:, 0], origin[:, 1], origin[:, 2],
         direction[:, 0], direction[:, 1], direction[:, 2],
         t_max, eps_abs, eps_lin, t1,
         unresolved.astype(jnp.int32), iota],
        num_keys=1, is_stable=False)
    (_, ox, oy, oz, dx, dy, dz, tmx, eab, eli, t1s, acts, iotas) = sorted_ops

    args2 = [
        _to_rows(ox, rows), _to_rows(oy, rows), _to_rows(oz, rows),
        _to_rows(dx, rows), _to_rows(dy, rows), _to_rows(dz, rows),
        _to_rows(tmx, rows), _to_rows(eab, rows), _to_rows(eli, rows),
        _to_rows(t1s, rows), _to_rows(acts, rows),
    ]
    k2 = functools.partial(_march_resume_kernel, prog.fn_c, treedef,
                           n_leaves, max_steps - phase1_steps, eps_const)
    t2 = pl.pallas_call(
        k2, grid=(grid,),
        in_specs=[smem] + [vspec] * 11,
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        interpret=interpret,
    )(params, *args2)
    t2 = t2.reshape(-1)[:n]
    merged = jnp.where(acts != 0, t2, t1s)
    _, out = jax.lax.sort_key_val(iotas, merged, is_stable=False)
    return out


def _segment_entry(fn_c, prm, bound_radius, sx, sy, sz, ex, ey, ez, act):
    """Shadow-segment entry setup, single-sourced across the sequential
    occlusion kernel, the chained core (march_occlusion_chained /
    shade_pallas._shadow_delta) and the sort-key estimate
    (shade_pallas._segment_cost): normalized direction, effective
    segment length, starting t, entry-resolved mask. Mirrors
    march.march_occlusion (reference src/sdf.rs:25-57) including the
    optional bounding-volume clip: lanes that miss the bound are
    entry-resolved, the march start jumps to the bound entry, and the
    effective end is clipped to the exit.

    Returns (dx, dy, dz, md, t0, entry_resolved, dist0_raw, bv_miss):
    t0 = max(first DE, clip entry); entry_resolved = NaN DE | inactive
    | clip miss; dist0_raw = the unclipped first DE (the sequential
    kernel's initial `dist < 1e-4` test needs it); bv_miss = False
    everywhere when no clip is configured."""
    seg_x, seg_y, seg_z = ex - sx, ey - sy, ez - sz
    md = jnp.sqrt(seg_x * seg_x + seg_y * seg_y + seg_z * seg_z)
    inv = 1.0 / md
    dx, dy, dz = seg_x * inv, seg_y * inv, seg_z * inv
    dist0 = fn_c(prm, sx, sy, sz)
    nan = jnp.isnan(dist0) | jnp.logical_not(act)
    t0 = dist0
    bv_miss = jnp.zeros_like(nan)
    if bound_radius > 0.0:
        b = sx * dx + sy * dy + sz * dz
        c = sx * sx + sy * sy + sz * sz - bound_radius * bound_radius
        disc = b * b - c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t_exit = -b + sq
        bv_miss = (disc <= 0.0) | (t_exit <= 0.0)
        nan = nan | bv_miss
        md = jnp.minimum(md, t_exit)
        t0 = jnp.maximum(dist0, jnp.maximum(-b - sq, 0.0))
    return dx, dy, dz, md, t0, nan, dist0, bv_miss


def _occl_kernel(fn_c, treedef, n_leaves, max_steps, eps_c, eps_l, relax,
                 bound_radius, params_ref, sx, sy, sz, ex, ey, ez, act, out):
    prm = _unflatten_params(params_ref, treedef, n_leaves)
    s_x, s_y, s_z = sx[:], sy[:], sz[:]
    active = act[:] != 0
    (d_x, d_y, d_z, max_dist, dist0, nan_mask, dist0_raw,
     bv_miss) = _segment_entry(fn_c, prm, bound_radius,
                               s_x, s_y, s_z, ex[:], ey[:], ez[:], active)
    # Mosaic cannot carry vector<i1> through scf.while — keep the hit mask
    # as an int32 vector in the carry.
    hit0 = ((dist0_raw < 1e-4) & active
            & jnp.logical_not(bv_miss)).astype(jnp.int32)

    if relax == 1.0:
        def cond(state):
            step, _, _, stop = state
            return jnp.logical_and(step < max_steps, jnp.logical_not(stop))

        def body(state):
            step, t, _, _ = state
            gt_nan = (t > max_dist) | nan_mask
            dist = fn_c(prm, s_x + t * d_x, s_y + t * d_y, s_z + t * d_z)
            hit = jnp.abs(dist) < jnp.maximum(eps_c, eps_l * t)
            done = hit | gt_nan
            t = jnp.where(done, t, t + dist)
            return step + 1, t, hit.astype(jnp.int32), jnp.all(done)

        _, t, hit_i, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), dist0, hit0, jnp.all(nan_mask & False)))
        gt_nan = (t > max_dist) | nan_mask
        out[:] = jnp.where(gt_nan, 0, hit_i)
        return

    # Over-relaxed variant (rayn_tpu.ops.march.march_occlusion relax
    # branch): step by relax*DE, conservative fallback on overshoot keeps
    # occlusion exact.
    def cond_r(state):
        return jnp.logical_and(state[0] < max_steps,
                               jnp.logical_not(state[5]))

    def body_r(state):
        step, t_prev, r_prev, t, _, _ = state
        gt_nan = (t > max_dist) | nan_mask
        r = fn_c(prm, s_x + t * d_x, s_y + t * d_y, s_z + t * d_z)
        overshoot = (t - t_prev) > (jnp.abs(r_prev) + jnp.abs(r))
        hit = (jnp.abs(r) < jnp.maximum(eps_c, eps_l * t)) \
            & jnp.logical_not(overshoot)
        done = hit | gt_nan
        t_cons = t_prev + r_prev
        new_t_prev = jnp.where(done | overshoot, t_prev, t)
        new_r_prev = jnp.where(done | overshoot, r_prev, r)
        next_t = jnp.where(done, t,
                           jnp.where(overshoot, t_cons, t + relax * r))
        return (step + 1, new_t_prev, new_r_prev, next_t,
                hit.astype(jnp.int32), jnp.all(done))

    zeros = jnp.zeros_like(dist0)
    _, _, _, t, hit_i, _ = jax.lax.while_loop(
        cond_r, body_r,
        (jnp.int32(0), zeros, dist0, dist0, hit0,
         jnp.all(nan_mask & False)))
    gt_nan = (t > max_dist) | nan_mask
    out[:] = jnp.where(gt_nan, 0, hit_i)


def _march_phase1_kernel(fn_c, treedef, n_leaves, max_steps, eps_const,
                         params_ref, ox, oy, oz, dx, dy, dz, tmax, eabs,
                         elin, act, out_t, out_res):
    """Step-capped primary march reporting per-lane resolvedness so
    stragglers can be packed and resumed (march_phased)."""
    prm = _unflatten_params(params_ref, treedef, n_leaves)
    o_x, o_y, o_z = ox[:], oy[:], oz[:]
    d_x, d_y, d_z = dx[:], dy[:], dz[:]
    t_max = tmax[:]
    eps_abs = eabs[:]
    eps_lin = elin[:]
    active = act[:] != 0

    t0 = fn_c(prm, o_x, o_y, o_z)
    nan_mask = jnp.isnan(t0) & active
    t0 = jnp.where(active, t0, t_max + 1.0)
    done0 = (jnp.logical_not(active) | nan_mask).astype(jnp.int32)

    def done_of(t, dist):
        thresh = jnp.maximum(eps_const, eps_abs + eps_lin * t)
        return (jnp.abs(dist) < thresh) | nan_mask | (t > t_max)

    def cond(state):
        step, _, _, all_done = state
        return jnp.logical_and(step < max_steps, jnp.logical_not(all_done))

    def body(state):
        step, t, _, _ = state
        dist = fn_c(prm, o_x + t * d_x, o_y + t * d_y, o_z + t * d_z)
        done = done_of(t, dist)
        t = jnp.where(done, t, t + dist)
        return step + 1, t, done.astype(jnp.int32), jnp.all(done)

    _, t, done_i, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), t0, done0, jnp.all(done0 != 0)))
    out_t[:] = t
    out_res[:] = done_i | done0


def _march_resume_kernel(fn_c, treedef, n_leaves, max_steps, eps_const,
                         params_ref, ox, oy, oz, dx, dy, dz, tmax, eabs,
                         elin, tin, act, out_t):
    """Primary march resumed at a given t (phase 2 of march_phased)."""
    prm = _unflatten_params(params_ref, treedef, n_leaves)
    o_x, o_y, o_z = ox[:], oy[:], oz[:]
    d_x, d_y, d_z = dx[:], dy[:], dz[:]
    t_max = tmax[:]
    eps_abs = eabs[:]
    eps_lin = elin[:]
    inactive = act[:] == 0
    t0 = tin[:]

    def done_of(t, dist):
        thresh = jnp.maximum(eps_const, eps_abs + eps_lin * t)
        return (jnp.abs(dist) < thresh) | inactive | (t > t_max)

    def cond(state):
        step, _, all_done = state
        return jnp.logical_and(step < max_steps, jnp.logical_not(all_done))

    def body(state):
        step, t, _ = state
        dist = fn_c(prm, o_x + t * d_x, o_y + t * d_y, o_z + t * d_z)
        done = done_of(t, dist)
        t = jnp.where(done, t, t + dist)
        return step + 1, t, jnp.all(done)

    _, t, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), t0, jnp.all(inactive & False)))
    out_t[:] = t


def march_phased(prog: SdfProgram, origin, direction, t_max,
                 eps_const: float, eps_abs, eps_lin, max_steps: int,
                 active, phase1_steps: int = 32,
                 block_rows: int = DEFAULT_BLOCK_ROWS,
                 interpret: bool = False):
    """Two-phase primary march with straggler packing (see
    march_occlusion_phased; same scheme for the camera/bounce march,
    reference src/sdf.rs:59-83). Bit-identical to march()."""
    n = origin.shape[0]
    block_rows = max(block_rows, 8)
    block = block_rows * LANES
    n_pad = -(-n // block) * block
    rows = n_pad // LANES

    params, treedef, n_leaves = _flatten_params(prog.params)
    args = [
        _to_rows(origin[:, 0], rows), _to_rows(origin[:, 1], rows),
        _to_rows(origin[:, 2], rows),
        _to_rows(direction[:, 0], rows), _to_rows(direction[:, 1], rows),
        _to_rows(direction[:, 2], rows),
        _to_rows(t_max, rows), _to_rows(eps_abs, rows),
        _to_rows(eps_lin, rows),
        _to_rows(active.astype(jnp.int32), rows),
    ]
    grid = rows // block_rows
    vspec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, max(n_leaves, 1)), lambda i: (0, 0),
                        memory_space=pltpu.SMEM)
    k1 = functools.partial(_march_phase1_kernel, prog.fn_c, treedef,
                           n_leaves, min(phase1_steps, max_steps), eps_const)
    t1, res1 = pl.pallas_call(
        k1, grid=(grid,),
        in_specs=[smem] + [vspec] * 10,
        out_specs=(vspec, vspec),
        out_shape=(jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((rows, LANES), jnp.int32)),
        interpret=interpret,
    )(params, *args)
    t1 = t1.reshape(-1)[:n]
    resolved = res1.reshape(-1)[:n] != 0
    if phase1_steps >= max_steps:
        return t1

    unresolved = jnp.logical_not(resolved)
    ur = jnp.cumsum(unresolved.astype(jnp.int32)) - 1
    n_ur = ur[-1] + 1
    rr = jnp.cumsum(resolved.astype(jnp.int32)) - 1
    dest = jnp.where(unresolved, ur, n_ur + rr)
    order = jnp.zeros((n,), jnp.int32).at[dest].set(
        jnp.arange(n, dtype=jnp.int32))

    o2 = jnp.take(origin, order, axis=0)
    d2 = jnp.take(direction, order, axis=0)
    args2 = [
        _to_rows(o2[:, 0], rows), _to_rows(o2[:, 1], rows),
        _to_rows(o2[:, 2], rows),
        _to_rows(d2[:, 0], rows), _to_rows(d2[:, 1], rows),
        _to_rows(d2[:, 2], rows),
        _to_rows(jnp.take(t_max, order), rows),
        _to_rows(jnp.take(eps_abs, order), rows),
        _to_rows(jnp.take(eps_lin, order), rows),
        _to_rows(jnp.take(t1, order), rows),
        _to_rows(jnp.take(unresolved, order).astype(jnp.int32), rows),
    ]
    k2 = functools.partial(_march_resume_kernel, prog.fn_c, treedef,
                           n_leaves, max_steps - phase1_steps, eps_const)
    t2 = pl.pallas_call(
        k2, grid=(grid,),
        in_specs=[smem] + [vspec] * 11,
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        interpret=interpret,
    )(params, *args2)
    t2 = t2.reshape(-1)[:n]
    t2_unpacked = jnp.zeros((n,), jnp.float32).at[order].set(t2)
    return jnp.where(resolved, t1, t2_unpacked)


def _occl_phase1_kernel(fn_c, treedef, n_leaves, max_steps, eps_c, eps_l,
                        params_ref, sx, sy, sz, ex, ey, ez, act,
                        out, out_t, out_res):
    """Step-capped occlusion march that additionally reports per-lane
    resolvedness and the frozen/current march parameter t, so unresolved
    lanes can be packed densely and resumed (march_occlusion_phased)."""
    prm = _unflatten_params(params_ref, treedef, n_leaves)
    s_x, s_y, s_z = sx[:], sy[:], sz[:]
    seg_x = ex[:] - s_x
    seg_y = ey[:] - s_y
    seg_z = ez[:] - s_z
    max_dist = jnp.sqrt(seg_x * seg_x + seg_y * seg_y + seg_z * seg_z)
    inv = 1.0 / max_dist
    d_x, d_y, d_z = seg_x * inv, seg_y * inv, seg_z * inv
    active = act[:] != 0

    dist0 = fn_c(prm, s_x, s_y, s_z)
    nan_mask = jnp.isnan(dist0) | jnp.logical_not(active)
    hit0 = ((dist0 < 1e-4) & active).astype(jnp.int32)

    def cond(state):
        step, _, _, stop = state
        return jnp.logical_and(step < max_steps, jnp.logical_not(stop))

    def body(state):
        step, t, _, _ = state
        gt_nan = (t > max_dist) | nan_mask
        dist = fn_c(prm, s_x + t * d_x, s_y + t * d_y, s_z + t * d_z)
        hit = jnp.abs(dist) < jnp.maximum(eps_c, eps_l * t)
        done = hit | gt_nan
        t = jnp.where(done, t, t + dist)
        return step + 1, t, hit.astype(jnp.int32), jnp.all(done)

    _, t, hit_i, _ = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), dist0, hit0, jnp.all(nan_mask & False)))
    gt_nan = (t > max_dist) | nan_mask
    out[:] = jnp.where(gt_nan, 0, hit_i)
    out_t[:] = t
    # A lane is resolved iff it hit or marched past the segment end (the
    # single-phase kernel's `done`); a lane that merely ran out of steps
    # continues in phase 2 from exactly this t, so the composition is
    # bit-identical to one uncapped march.
    out_res[:] = (gt_nan | (hit_i != 0)).astype(jnp.int32)


def _occl_resume_kernel(fn_c, treedef, n_leaves, max_steps, eps_c, eps_l,
                        params_ref, sx, sy, sz, ex, ey, ez, tin, act, out):
    """Occlusion march resumed at a given t (phase 2 of the two-phase
    scheme). Lanes enter not-hit and not-past-end by construction."""
    prm = _unflatten_params(params_ref, treedef, n_leaves)
    s_x, s_y, s_z = sx[:], sy[:], sz[:]
    seg_x = ex[:] - s_x
    seg_y = ey[:] - s_y
    seg_z = ez[:] - s_z
    max_dist = jnp.sqrt(seg_x * seg_x + seg_y * seg_y + seg_z * seg_z)
    inv = 1.0 / max_dist
    d_x, d_y, d_z = seg_x * inv, seg_y * inv, seg_z * inv
    inactive = act[:] == 0
    t0 = tin[:]

    def cond(state):
        step, _, _, stop = state
        return jnp.logical_and(step < max_steps, jnp.logical_not(stop))

    def body(state):
        step, t, _, _ = state
        gt_nan = (t > max_dist) | inactive
        dist = fn_c(prm, s_x + t * d_x, s_y + t * d_y, s_z + t * d_z)
        hit = jnp.abs(dist) < jnp.maximum(eps_c, eps_l * t)
        done = hit | gt_nan
        t = jnp.where(done, t, t + dist)
        return step + 1, t, hit.astype(jnp.int32), jnp.all(done)

    _, t, hit_i, _ = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), t0, jnp.zeros_like(t0, jnp.int32),
         jnp.all(inactive & False)))
    gt_nan = (t > max_dist) | inactive
    out[:] = jnp.where(gt_nan, 0, hit_i)


def march_occlusion_phased(prog: SdfProgram, start, end,
                           detail_scale: float, max_steps: int, active,
                           phase1_steps: int = 16,
                           block_rows: int = DEFAULT_BLOCK_ROWS,
                           interpret: bool = False):
    """Two-phase occlusion march with straggler packing.

    The single-phase kernel's per-block early exit is bounded by the
    slowest lane in each (block_rows x 128) block; with incoherent
    shadow segments nearly every block contains one lane that needs the
    full step budget. Phase 1 marches the whole queue only
    `phase1_steps` steps (resolving the cheap majority), then the
    unresolved lanes are stable-partitioned to the front of the queue
    and finished in a dense phase-2 march whose all-dead tail blocks
    exit immediately. Results are bit-identical to march_occlusion
    (same per-lane step sequence, reference src/sdf.rs:25-57).
    """
    n = start.shape[0]
    block_rows = max(block_rows, 8)
    block = block_rows * LANES
    n_pad = -(-n // block) * block
    rows = n_pad // LANES

    params, treedef, n_leaves = _flatten_params(prog.params)
    eps_c = 1e-4 * detail_scale
    eps_l = 1e-5 * detail_scale
    args = [
        _to_rows(start[:, 0], rows), _to_rows(start[:, 1], rows),
        _to_rows(start[:, 2], rows),
        _to_rows(end[:, 0], rows), _to_rows(end[:, 1], rows),
        _to_rows(end[:, 2], rows),
        _to_rows(active.astype(jnp.int32), rows),
    ]
    grid = rows // block_rows
    vspec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, max(n_leaves, 1)), lambda i: (0, 0),
                        memory_space=pltpu.SMEM)
    k1 = functools.partial(_occl_phase1_kernel, prog.fn_c, treedef,
                           n_leaves, min(phase1_steps, max_steps),
                           eps_c, eps_l)
    out1, t1, res1 = pl.pallas_call(
        k1, grid=(grid,),
        in_specs=[smem] + [vspec] * 7,
        out_specs=(vspec, vspec, vspec),
        out_shape=(jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
                   jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((rows, LANES), jnp.int32)),
        interpret=interpret,
    )(params, *args)
    out1 = out1.reshape(-1)[:n]
    t1 = t1.reshape(-1)[:n]
    resolved = res1.reshape(-1)[:n] != 0
    if phase1_steps >= max_steps:
        return out1 != 0

    # Stable partition: unresolved lanes first (same O(N) scheme as
    # integrator.compact); stability keeps whatever spatial coherence
    # the stragglers share.
    unresolved = jnp.logical_not(resolved)
    ur = jnp.cumsum(unresolved.astype(jnp.int32)) - 1
    n_ur = ur[-1] + 1
    rr = jnp.cumsum(resolved.astype(jnp.int32)) - 1
    dest = jnp.where(unresolved, ur, n_ur + rr)
    order = jnp.zeros((n,), jnp.int32).at[dest].set(
        jnp.arange(n, dtype=jnp.int32))

    s2 = jnp.take(start, order, axis=0)
    e2 = jnp.take(end, order, axis=0)
    tin = jnp.take(t1, order)
    act2 = jnp.take(unresolved, order)

    args2 = [
        _to_rows(s2[:, 0], rows), _to_rows(s2[:, 1], rows),
        _to_rows(s2[:, 2], rows),
        _to_rows(e2[:, 0], rows), _to_rows(e2[:, 1], rows),
        _to_rows(e2[:, 2], rows),
        _to_rows(tin, rows),
        _to_rows(act2.astype(jnp.int32), rows),
    ]
    k2 = functools.partial(_occl_resume_kernel, prog.fn_c, treedef,
                           n_leaves, max_steps - phase1_steps,
                           eps_c, eps_l)
    out2 = pl.pallas_call(
        k2, grid=(grid,),
        in_specs=[smem] + [vspec] * 8,
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        interpret=interpret,
    )(params, *args2)
    out2 = out2.reshape(-1)[:n]
    hit2 = jnp.zeros((n,), jnp.int32).at[order].set(out2)
    return jnp.where(resolved, out1, hit2) != 0


def march_occlusion_sorted(prog: SdfProgram, start, end,
                           detail_scale: float, max_steps: int, active,
                           phase1_steps: int = 8,
                           block_rows: int = DEFAULT_BLOCK_ROWS,
                           interpret: bool = False):
    """Occlusion march with step-homogeneous blocks via a payload sort.

    The per-block early exit is worthless on raw shadow queues: the
    step-count distribution is flat (p50≈20-28, p99≈100) and stragglers
    are scattered, so every 8K-lane block runs to ~the cap while the
    useful mean is ~4x lower (measured, BASELINE.md round-2 notes).
    Per-lane gathers are too slow to pack with (6-8 ms/M) — but XLA TPU
    *sorts* carry payload columns nearly free (~2 ms/M for 9 columns).

    So: march everyone `phase1_steps` steps (work that counts toward the
    budget either way), estimate each unresolved lane's remaining steps
    from its marching speed so far, payload-sort the queue by that key so
    phase-2 blocks contain lanes of similar cost, finish densely, and
    un-permute the verdicts with one 2-column sort. The per-lane step
    sequence is untouched — results are bit-identical to
    march_occlusion; only block membership (performance) changes.
    """
    n = start.shape[0]
    block_rows = max(block_rows, 8)
    block = block_rows * LANES
    n_pad = -(-n // block) * block
    rows = n_pad // LANES

    params, treedef, n_leaves = _flatten_params(prog.params)
    eps_c = 1e-4 * detail_scale
    eps_l = 1e-5 * detail_scale
    args = [
        _to_rows(start[:, 0], rows), _to_rows(start[:, 1], rows),
        _to_rows(start[:, 2], rows),
        _to_rows(end[:, 0], rows), _to_rows(end[:, 1], rows),
        _to_rows(end[:, 2], rows),
        _to_rows(active.astype(jnp.int32), rows),
    ]
    grid = rows // block_rows
    vspec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, max(n_leaves, 1)), lambda i: (0, 0),
                        memory_space=pltpu.SMEM)
    k1 = functools.partial(_occl_phase1_kernel, prog.fn_c, treedef,
                           n_leaves, min(phase1_steps, max_steps),
                           eps_c, eps_l)
    out1, t1, res1 = pl.pallas_call(
        k1, grid=(grid,),
        in_specs=[smem] + [vspec] * 7,
        out_specs=(vspec, vspec, vspec),
        out_shape=(jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
                   jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((rows, LANES), jnp.int32)),
        interpret=interpret,
    )(params, *args)
    out1 = out1.reshape(-1)[:n]
    t1 = t1.reshape(-1)[:n]
    resolved = res1.reshape(-1)[:n] != 0
    if phase1_steps >= max_steps:
        return out1 != 0

    # Remaining-step predictor: distance left over speed so far. Slow
    # creep (small t after phase 1) predicts many remaining steps.
    seg = end - start
    max_dist = jnp.sqrt(jnp.sum(seg * seg, axis=-1))
    speed = jnp.maximum(t1, 1e-20) / float(phase1_steps)
    predicted = (max_dist - t1) / speed
    # resolved lanes cluster at the cheap end (phase 2 skips them after
    # one vector op)
    key = jnp.where(resolved, -1.0, predicted.astype(jnp.float32))

    unresolved = jnp.logical_not(resolved)
    iota = jnp.arange(n, dtype=jnp.int32)
    sorted_ops = jax.lax.sort(
        [key, start[:, 0], start[:, 1], start[:, 2],
         end[:, 0], end[:, 1], end[:, 2],
         t1, unresolved.astype(jnp.int32), out1, iota],
        num_keys=1, is_stable=False)
    (_, sx, sy, sz, ex, ey, ez, t1s, acts, out1s, iotas) = sorted_ops

    args2 = [
        _to_rows(sx, rows), _to_rows(sy, rows), _to_rows(sz, rows),
        _to_rows(ex, rows), _to_rows(ey, rows), _to_rows(ez, rows),
        _to_rows(t1s, rows), _to_rows(acts, rows),
    ]
    k2 = functools.partial(_occl_resume_kernel, prog.fn_c, treedef,
                           n_leaves, max_steps - phase1_steps,
                           eps_c, eps_l)
    out2 = pl.pallas_call(
        k2, grid=(grid,),
        in_specs=[smem] + [vspec] * 8,
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        interpret=interpret,
    )(params, *args2)
    out2 = out2.reshape(-1)[:n]
    merged = jnp.where(acts != 0, out2, out1s)
    # un-permute: iotas is a permutation of arange(n); sorting by it
    # restores original lane order
    _, out = jax.lax.sort_key_val(iotas, merged, is_stable=False)
    return out != 0


def march_occlusion(prog: SdfProgram, start, end, detail_scale: float,
                    max_steps: int, active,
                    block_rows: int = DEFAULT_BLOCK_ROWS,
                    interpret: bool = False, relax: float = 1.0,
                    bound_radius: float = 0.0):
    """Pallas twin of rayn_tpu.ops.march.march_occlusion (reference
    src/sdf.rs:25-57), including the over-relaxed variant (Keinert)
    with its conservative overshoot fallback and the optional
    bounding-volume segment clip. Returns bool [N]."""
    n = start.shape[0]
    block_rows = max(block_rows, 8)  # Mosaic minimum (8, 128) tiles
    block = block_rows * LANES
    n_pad = -(-n // block) * block
    rows = n_pad // LANES

    params, treedef, n_leaves = _flatten_params(prog.params)
    args = [
        _to_rows(start[:, 0], rows), _to_rows(start[:, 1], rows),
        _to_rows(start[:, 2], rows),
        _to_rows(end[:, 0], rows), _to_rows(end[:, 1], rows),
        _to_rows(end[:, 2], rows),
        _to_rows(active.astype(jnp.int32), rows),
    ]
    grid = rows // block_rows
    vspec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    kernel = functools.partial(_occl_kernel, prog.fn_c, treedef, n_leaves,
                               max_steps, 1e-4 * detail_scale,
                               1e-5 * detail_scale, relax, bound_radius)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((1, max(n_leaves, 1)), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)] + [vspec] * 7,
        out_specs=pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        interpret=interpret,
    )(params, *args)
    return out.reshape(-1)[:n] != 0


def _chained_occl_core(fn_c, prm, max_steps, eps_c, eps_l, bound_radius,
                       segs, group: int = 1):
    """March each lane's K shadow segments back-to-back in ONE while loop.

    The sequential scheme (K separate `_occl_kernel`/`_sdf_occluded`
    loops over the same block of rays) costs

        sum_k  max_{lane in block} steps[k, lane]

    block iterations, because every loop runs until its own worst lane
    resolves. Chaining — each lane marches segment 0, advances to
    segment 1 the moment 0 resolves, and so on — costs

        max_{lane in block}  sum_k steps[k, lane]

    which the captured in-situ shadow queues put at 1.58-1.73x fewer
    block steps (tools/perf_chained_predict.py; straggler segments do
    not pile onto the same ray). The price is the one-hot refresh of
    advancing lanes' segment registers (7 values + t, K-1 selects each)
    — measured round-4 at ~50% of a 12-iteration MandelBox DE when run
    every iteration, which is why round 3's 1.67x iteration win
    wall-clocked at only +7%.

    `group` > 1 amortizes that tax: resolved lanes mark themselves
    pending and the refresh runs under a `lax.cond` only every `group`
    iterations (or immediately when EVERY unresolved lane is pending,
    so straggler tails never idle). A pending lane's t/steps freeze, so
    its per-segment step sequence is untouched — it just starts its
    next segment up to group-1 iterations later. Entry-resolved lanes
    (inactive | NaN first DE | clip miss) are folded into the end
    register (md = -inf, t0 sanitized to 0) instead of a carried nan
    register, saving one select chain per refresh.

    Per-segment semantics are exactly `march.march_occlusion` relax=1
    (reference src/sdf.rs:25-57) including the bounding-volume clip:
    each segment's step sequence, hit test and final
    `hit & ~(past_end | nan)` verdict are untouched — only the loop
    *scheduling* changes — so verdicts are bit-identical to the
    sequential kernels (asserted by tests/test_march_pallas.py).

    `segs` is a list of K tuples of component vectors
    (sx, sy, sz, ex, ey, ez, active_bool); returns K bool vectors,
    occluded per segment. K <= 30 (verdict bits share one int32).
    """
    K = len(segs)
    assert 1 <= K <= 30, K
    assert group >= 1, group
    SX, SY, SZ, DX, DY, DZ, MD, T0 = ([] for _ in range(8))
    for (sx, sy, sz, ex, ey, ez, act) in segs:
        dx, dy, dz, md, t0, nan, _d0, _bv = _segment_entry(
            fn_c, prm, bound_radius, sx, sy, sz, ex, ey, ez, act)
        SX.append(sx), SY.append(sy), SZ.append(sz)
        DX.append(dx), DY.append(dy), DZ.append(dz)
        # entry-resolved lanes resolve via `t > md` at their first
        # iteration; t0 is sanitized so a NaN first DE cannot poison
        # the comparison (NaN > -inf is False).
        MD.append(jnp.where(nan, -jnp.inf, md))
        T0.append(jnp.where(nan, 0.0, t0))

    def cond(state):
        g, seg = state[0], state[1]
        return jnp.logical_and(g < K * (max_steps + group),
                               jnp.logical_not(jnp.all(seg >= K)))

    def body(state):
        (g, seg, stp, bits, pend, t,
         csx, csy, csz, cdx, cdy, cdz, cmd) = state
        pending = pend != 0
        live = seg < K
        gt_end = t > cmd
        dist = fn_c(prm, csx + t * cdx, csy + t * cdy, csz + t * cdz)
        hit = jnp.abs(dist) < jnp.maximum(eps_c, eps_l * t)
        done = hit | gt_end
        stp1 = stp + 1
        newly = ((done | (stp1 >= max_steps)) & live
                 & jnp.logical_not(pending))
        # verdict recorded at resolution time (identical to recording
        # at advance time: frozen lanes recompute the same hit/gt_end)
        verd = hit & jnp.logical_not(gt_end) & newly
        bits = bits | jnp.where(verd,
                                jnp.left_shift(jnp.int32(1), seg), 0)
        t = jnp.where(done | pending, t, t + dist)
        stp = jnp.where(pending, stp, stp1)
        pend = pend | newly.astype(jnp.int32)
        waiting = pend != 0
        any_pend = jnp.any(waiting)
        if group == 1:
            do_refresh = any_pend
        else:
            boundary = jnp.logical_or(
                (g + 1) % group == 0,
                jnp.all(waiting | jnp.logical_not(live)))
            do_refresh = jnp.logical_and(any_pend, boundary)

        def refresh(ops):
            seg, stp, pend, t, csx, csy, csz, cdx, cdy, cdz, cmd = ops
            advm = pend != 0
            for k in range(1, K):
                upd = advm & (seg == k - 1)
                csx = jnp.where(upd, SX[k], csx)
                csy = jnp.where(upd, SY[k], csy)
                csz = jnp.where(upd, SZ[k], csz)
                cdx = jnp.where(upd, DX[k], cdx)
                cdy = jnp.where(upd, DY[k], cdy)
                cdz = jnp.where(upd, DZ[k], cdz)
                cmd = jnp.where(upd, MD[k], cmd)
                t = jnp.where(upd, T0[k], t)
            seg = jnp.where(advm, seg + 1, seg)
            stp = jnp.where(advm, 0, stp)
            return (seg, stp, jnp.zeros_like(pend), t,
                    csx, csy, csz, cdx, cdy, cdz, cmd)

        ops = (seg, stp, pend, t, csx, csy, csz, cdx, cdy, cdz, cmd)
        (seg, stp, pend, t, csx, csy, csz, cdx, cdy, cdz,
         cmd) = jax.lax.cond(do_refresh, refresh, lambda o: o, ops)
        return (g + 1, seg, stp, bits, pend, t,
                csx, csy, csz, cdx, cdy, cdz, cmd)

    zero_i = jnp.zeros(SX[0].shape, jnp.int32)
    state = (jnp.int32(0), zero_i, zero_i, zero_i, zero_i, T0[0],
             SX[0], SY[0], SZ[0], DX[0], DY[0], DZ[0], MD[0])
    bits = jax.lax.while_loop(cond, body, state)[3]
    return [(bits & jnp.int32(1 << k)) != 0 for k in range(K)]


def _occl_chained_kernel(fn_c, treedef, n_leaves, K, max_steps, eps_c,
                         eps_l, bound_radius, group, params_ref,
                         sx, sy, sz, ex, ey, ez, act, out):
    prm = _unflatten_params(params_ref, treedef, n_leaves)
    segs = [(sx[k], sy[k], sz[k], ex[k], ey[k], ez[k], act[k] != 0)
            for k in range(K)]
    occ = _chained_occl_core(fn_c, prm, max_steps, eps_c, eps_l,
                             bound_radius, segs, group=group)
    for k in range(K):
        out[k] = occ[k].astype(jnp.int32)


def march_occlusion_chained(prog: SdfProgram, start, end,
                            detail_scale: float, max_steps: int, active,
                            block_rows: int = DEFAULT_BLOCK_ROWS,
                            interpret: bool = False,
                            bound_radius: float = 0.0,
                            advance_group: int = 1):
    """Occlusion march over K segments per ray, chained per lane (see
    `_chained_occl_core`). start/end are [K, N, 3], active [K, N];
    returns occluded bool [K, N], bit-identical per segment to
    `march_occlusion(start[k], end[k], ...)`. Blocks hold the SAME ray
    range for all K segments so each lane owns its K-segment chain."""
    K, n = start.shape[0], start.shape[1]
    block_rows = max(block_rows, 8)
    block = block_rows * LANES
    n_pad = -(-n // block) * block
    rows = n_pad // LANES

    params, treedef, n_leaves = _flatten_params(prog.params)

    def to3(a):
        return jnp.stack([_to_rows(a[k], rows) for k in range(K)])

    args = [to3(start[..., 0]), to3(start[..., 1]), to3(start[..., 2]),
            to3(end[..., 0]), to3(end[..., 1]), to3(end[..., 2]),
            to3(active.astype(jnp.int32))]
    grid = rows // block_rows
    vspec = pl.BlockSpec((K, block_rows, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    kernel = functools.partial(_occl_chained_kernel, prog.fn_c, treedef,
                               n_leaves, K, max_steps,
                               1e-4 * detail_scale, 1e-5 * detail_scale,
                               bound_radius, advance_group)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((1, max(n_leaves, 1)), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)] + [vspec] * 7,
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct((K, rows, LANES), jnp.int32),
        interpret=interpret,
    )(params, *args)
    return out.reshape(K, -1)[:, :n] != 0
