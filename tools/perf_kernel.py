#!/usr/bin/env python
"""Occlusion-kernel cost decomposition on the live chip.

Separates (a) raw DE-eval compute, (b) per-step freeze/threshold logic,
(c) the per-step horizontal `jnp.all` early-exit reduction, by timing:

  1. fixed-k kernel: k unconditional DE steps, no masks, no exit
  2. freeze kernel: per-lane freeze logic, NO horizontal exit check
  3. current kernel (per-step jnp.all exit)
  4. strided kernel: exit check every `stride` steps

plus the numpy-predicted mean block-worst step count, which is the
lower bound any per-block early exit can reach.
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rayn_tpu.ops import march_pallas
from rayn_tpu.ops.march_pallas import (LANES, _flatten_params,
                                       _unflatten_params, _to_rows)
from tools.perf_occl import build_segments, step_stats, timeit


def _fixed_kernel(fn_c, treedef, n_leaves, max_steps,
                  params_ref, sx, sy, sz, ex, ey, ez, act, out):
    prm = _unflatten_params(params_ref, treedef, n_leaves)
    s_x, s_y, s_z = sx[:], sy[:], sz[:]
    seg_x = ex[:] - s_x
    seg_y = ey[:] - s_y
    seg_z = ez[:] - s_z
    max_dist = jnp.sqrt(seg_x * seg_x + seg_y * seg_y + seg_z * seg_z)
    inv = 1.0 / max_dist
    d_x, d_y, d_z = seg_x * inv, seg_y * inv, seg_z * inv

    def body(_, t):
        dist = fn_c(prm, s_x + t * d_x, s_y + t * d_y, s_z + t * d_z)
        return t + dist * 0.01  # keep marching (never converge/NaN-safe-ish)

    t = jax.lax.fori_loop(0, max_steps, body, jnp.zeros_like(s_x))
    out[:] = t.astype(jnp.int32)


def _freeze_kernel(fn_c, treedef, n_leaves, max_steps, eps_c, eps_l,
                   params_ref, sx, sy, sz, ex, ey, ez, act, out):
    """Full per-lane semantics, but a fori_loop (no horizontal exit)."""
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

    def body(_, state):
        t, hit = state
        gt_nan = (t > max_dist) | nan_mask
        dist = fn_c(prm, s_x + t * d_x, s_y + t * d_y, s_z + t * d_z)
        h = jnp.abs(dist) < jnp.maximum(eps_c, eps_l * t)
        done = h | gt_nan
        t = jnp.where(done, t, t + dist)
        return t, h.astype(jnp.int32)

    t, hit_i = jax.lax.fori_loop(0, max_steps, body, (dist0, hit0))
    gt_nan = (t > max_dist) | nan_mask
    out[:] = jnp.where(gt_nan, 0, hit_i)


def _strided_kernel(fn_c, treedef, n_leaves, max_steps, stride, eps_c, eps_l,
                    params_ref, sx, sy, sz, ex, ey, ez, act, out):
    """Freeze logic per step; horizontal exit check every `stride` steps."""
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

    n_outer = -(-max_steps // stride)

    def cond(state):
        outer, _, _, stop = state
        return jnp.logical_and(outer < n_outer, jnp.logical_not(stop))

    def outer_body(state):
        outer, t, hit, _ = state

        def inner(_, st):
            t, hit = st
            gt_nan = (t > max_dist) | nan_mask
            dist = fn_c(prm, s_x + t * d_x, s_y + t * d_y, s_z + t * d_z)
            h = jnp.abs(dist) < jnp.maximum(eps_c, eps_l * t)
            done = h | gt_nan
            t = jnp.where(done, t, t + dist)
            return t, h.astype(jnp.int32)

        t, hit = jax.lax.fori_loop(0, stride, inner, (t, hit))
        done = (hit != 0) | (t > max_dist) | nan_mask
        return outer + 1, t, hit, jnp.all(done)

    _, t, hit_i, _ = jax.lax.while_loop(
        cond, outer_body,
        (jnp.int32(0), dist0, hit0, jnp.all(nan_mask & False)))
    gt_nan = (t > max_dist) | nan_mask
    out[:] = jnp.where(gt_nan, 0, hit_i)


def run_kernel(kernel, prog, start, end, active, rows_per_block, n_out_i32=1):
    n = start.shape[0]
    block = rows_per_block * LANES
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
    grid = rows // rows_per_block
    vspec = pl.BlockSpec((rows_per_block, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, max(n_leaves, 1)), lambda i: (0, 0),
                        memory_space=pltpu.SMEM)
    k = functools.partial(kernel, prog.fn_c, treedef, n_leaves)
    out = pl.pallas_call(
        k, grid=(grid,),
        in_specs=[smem] + [vspec] * 7,
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
    )(params, *args)
    return out.reshape(-1)[:n]


def _mandelbox_fnc(recip=None):
    """MandelBox fn_c with a pluggable divide implementation.
    recip=None -> plain '/', else recip(x) multiplies."""

    def fn_c(prm, x, y, z):
        ox, oy, oz = x, y, z
        dr = jnp.ones_like(x)
        for _ in range(12):
            x = jnp.clip(x, -prm.box_l, prm.box_l) * 2.0 - x
            y = jnp.clip(y, -prm.box_l, prm.box_l) * 2.0 - y
            z = jnp.clip(z, -prm.box_l, prm.box_l) * 2.0 - z
            r2 = x * x + y * y + z * z
            den = jnp.maximum(prm.min_rad_sq, r2)
            if recip is None:
                mul = jnp.maximum(1.0, prm.fixed_rad_sq / den)
            else:
                mul = jnp.maximum(1.0, prm.fixed_rad_sq * recip(den))
            x, y, z = x * mul, y * mul, z * mul
            dr = dr * mul
            x = x * prm.scale + ox
            y = y * prm.scale + oy
            z = z * prm.scale + oz
            dr = -dr * prm.scale + 1.0
        r = jnp.sqrt(x * x + y * y + z * z)
        if recip is None:
            return r / jnp.abs(dr)
        return r * recip(jnp.abs(dr))

    return fn_c


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--rows", type=int, default=128)
    args = ap.parse_args()

    start, end, active, prog, settings = build_segments(args.n)
    detail = settings.sdf_detail_scale
    eps_c, eps_l = 1e-4 * detail, 1e-5 * detail
    n = args.n
    rows = args.rows
    block = rows * LANES

    # current kernel baseline
    f = jax.jit(lambda s, e, a: march_pallas.march_occlusion(
        prog, s, e, detail, args.steps, active=a, block_rows=rows))
    dt, ref = timeit(f, start, end, active)
    ref = np.asarray(ref)
    print(f"current (exit/step):  {dt*1e3:8.2f} ms")

    # fixed 100 steps, no logic: pure compute ceiling
    f = jax.jit(lambda s, e, a: run_kernel(
        lambda *a_, **k_: _fixed_kernel(*a_[:3], args.steps, *a_[3:]),
        prog, s, e, a, rows))
    dt, _ = timeit(f, start, end, active)
    print(f"fixed {args.steps} steps/lane: {dt*1e3:8.2f} ms "
          f"({dt*1e3/args.steps*1000:.1f} us/step for {n} lanes)")

    # freeze logic, no horizontal exit
    f = jax.jit(lambda s, e, a: run_kernel(
        lambda *a_: _freeze_kernel(*a_[:3], args.steps, eps_c, eps_l,
                                   *a_[3:]),
        prog, s, e, a, rows))
    dt, out = timeit(f, start, end, active)
    print(f"freeze, no exit:      {dt*1e3:8.2f} ms "
          f"match={np.array_equal(np.asarray(out) != 0, ref)}")

    for stride in (4, 8, 16):
        f = jax.jit(lambda s, e, a, st=stride: run_kernel(
            lambda *a_: _strided_kernel(*a_[:3], args.steps, st, eps_c,
                                        eps_l, *a_[3:]),
            prog, s, e, a, rows))
        dt, out = timeit(f, start, end, active)
        print(f"strided exit every {stride:2d}: {dt*1e3:8.2f} ms "
              f"match={np.array_equal(np.asarray(out) != 0, ref)}")

    # divide-cost probes: same full kernel, DE divide swapped
    for label, rc in (("div (baseline)", None),
                      ("pl.reciprocal exact", lambda x: pl.reciprocal(
                          x, approx=False)),
                      ("pl.reciprocal approx", lambda x: pl.reciprocal(
                          x, approx=True))):
        fnc = _mandelbox_fnc(rc)
        prog2 = prog._replace(fn_c=fnc)
        f = jax.jit(lambda s, e, a, p2=prog2: march_pallas.march_occlusion(
            p2, s, e, detail, args.steps, active=a, block_rows=rows))
        dt, out = timeit(f, start, end, active)
        agree = float((np.asarray(out) == ref).mean())
        print(f"occl {label:22s}: {dt*1e3:8.2f} ms agree={agree:.6f}")


if __name__ == "__main__":
    main()
