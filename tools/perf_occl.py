#!/usr/bin/env python
"""Shadow-occlusion kernel shootout on the live chip.

Generates *realistic* NEE shadow segments by running the actual pipeline
(camera rays -> closest_hit -> shading points -> cone-sampled light
ends) on the default fractal scene, then times occlusion variants:

  - jnp while_loop (baseline)
  - Pallas, block_rows in {32, 64, 128, 256}
  - Pallas with over-relaxation 1.5
  - two-phase straggler packing: short phase-1 march over everything,
    stable-partition the unresolved lanes to the front, finish them in a
    dense phase-2 march (prototype of the round-2 perf lever)

Timing uses a forced scalar readback (axon rule, BASELINE.md).
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from rayn_tpu.config import RenderSettings
from rayn_tpu.ops import filters as filter_ops
from rayn_tpu.ops import intersect, lights
from rayn_tpu.ops import march as march_ops
from rayn_tpu.ops import march_pallas
from rayn_tpu.render import renderer
from rayn_tpu.scene import presets
from rayn_tpu.utils import rng, vecmath


def build_segments(n, kind="nee"):
    """One bounce's worth of NEE or volume shadow segments from the
    real scene (kind in {"nee", "volume"})."""
    res = (1024, 1024)
    settings = RenderSettings(resolution=res, spp=4, rays_per_pass=n)
    data, static, camera = presets.default_scene(resolution=res)
    tables = rng.build_sample_tables(settings, frame=1)
    fis = filter_ops.build_fis_table(filter_ops.blackman_harris(1.5),
                                     settings.filter_table_size)
    t0, t1 = jnp.float32(1 / 24), jnp.float32(2 / 24)

    @jax.jit
    def gen():
        ray_idx = renderer.ray_indices(jnp.int32(0), n)
        origin, direction, tm, pixel, sample_idx, in_range = \
            renderer.generate_rays(settings, tables, camera, fis, ray_idx,
                                   t0, t1)
        hps_abs0, hps_lin0 = camera.half_pixel_size_coeffs()
        hps_abs = jnp.broadcast_to(hps_abs0, (n,))
        hps_lin = jnp.broadcast_to(hps_lin0, (n,))
        t_max = jnp.full((n,), 2.0 * settings.world_radius)
        hit = intersect.closest_hit(data, static, settings, origin,
                                    direction, tm, t_max, hps_abs, hps_lin,
                                    in_range)
        info = intersect.shading_info(data, static, settings, hit, origin,
                                      direction, tm, hps_abs, hps_lin)
        k = jax.random.split(jax.random.PRNGKey(3), 2)
        lidx = jax.random.randint(k[0], (n,), 0, static.n_lights)
        from rayn_tpu.scene.scene import light_position_of
        from rayn_tpu.utils.gather import small_gather
        lp = light_position_of(data, lidx, tm)
        lr = small_gather(data.light_radii[:, None], lidx)[:, 0]
        lem = small_gather(data.light_emission, lidx)
        u2 = jax.random.uniform(k[1], (n, 2))
        if kind == "volume":
            u_dist = jax.random.uniform(jax.random.PRNGKey(5), (n,))
            vol_dist, _ = lights.sample_equi_angular(
                u_dist, lp, origin, direction, hit.t)
            start = origin + vol_dist[:, None] * direction
            end, li, pdf = lights.sample_cone(u2, lp, lr, start, lem)
            active = in_range
        else:
            end, li, pdf = lights.sample_cone(u2, lp, lr, info.point, lem)
            wi = vecmath.normalize(end - info.point)
            start = info.point + info.normal * (
                jnp.copysign(1.0, vecmath.dot(info.normal, wi))
                * info.offset_by)[:, None]
            ndl = vecmath.dot(info.normal, wi)
            active = hit.valid & (ndl > 0.0)
        return start, end, active

    start, end, active = gen()
    jax.block_until_ready(start)
    return start, end, active, static.sdf_program(data), settings


def timeit(fn, *args, reps=8):
    """Amortized timing: dispatch `reps` async calls, sync once on the
    last result (device executes in dispatch order), subtract the
    1-dispatch baseline. A per-rep scalar readback costs a ~25-35 ms
    axon-tunnel roundtrip that swamps ms-scale kernels."""
    out = fn(*args)  # compile
    _ = float(out.reshape(-1)[-1])
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(out.reshape(-1)[-1])
    t1 = time.perf_counter() - t0  # 1 rep incl. tunnel roundtrip
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(out.reshape(-1)[-1])
    tk = time.perf_counter() - t0
    return max((tk - t1) / (reps - 1), 1e-9), out


def step_stats(prog, start, end, active, detail, max_steps):
    """Per-lane steps-to-resolution histogram: the ground truth for
    whether straggler packing can pay."""

    @jax.jit
    def steps_needed(s, e, a):
        seg = e - s
        max_dist = jnp.sqrt(jnp.sum(seg * seg, axis=-1))
        d = seg / max_dist[:, None]
        dist0 = prog.dist(s)
        nan_mask = jnp.isnan(dist0) | jnp.logical_not(a)
        eps_c, eps_l = 1e-4 * detail, 1e-5 * detail

        def body(state):
            step, t, hit, steps, _ = state
            gt_nan = (t > max_dist) | nan_mask
            dist = prog.dist(s + t[:, None] * d)
            hit = jnp.abs(dist) < jnp.maximum(eps_c, eps_l * t)
            done = hit | gt_nan
            steps = jnp.where(done, steps, steps + 1)
            t = jnp.where(done, t, t + dist)
            return step + 1, t, hit, steps, jnp.all(done)

        def cond(state):
            return (state[0] < max_steps) & jnp.logical_not(state[4])

        _, _, _, steps, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), dist0, dist0 < 1e-4,
                         jnp.zeros_like(dist0, jnp.int32),
                         jnp.all(nan_mask & False)))
        return jnp.where(nan_mask, 0, steps)

    st = np.asarray(steps_needed(start, end, active))
    act = np.asarray(active)
    sa = st[act]
    qs = np.percentile(sa, [50, 75, 90, 95, 99, 100])
    print(f"steps/active lane: p50={qs[0]:.0f} p75={qs[1]:.0f} "
          f"p90={qs[2]:.0f} p95={qs[3]:.0f} p99={qs[4]:.0f} max={qs[5]:.0f} "
          f"mean={sa.mean():.1f}")
    rows = st.reshape(-1, 128)  # queue layout: 128-lane rows, pixel-major
    row_max = rows.max(axis=1)
    for cap in (8, 16, 24, 32, 48, 64):
        print(f"  unresolved after {cap:3d} steps: "
              f"{(sa >= cap).mean():.3f} of active "
              f"({(st >= cap).mean():.3f} of all lanes, "
              f"{(row_max >= cap).mean():.3f} of 128-lane rows)")
    # predicted phase-2 cost if unresolved rows are packed densely and
    # blocks exit at their own worst lane (per 128-row block)
    total_blocks = len(row_max) // 128
    single = row_max.reshape(-1, 128).max(1).sum()
    for cap in (8, 16, 24, 32):
        def blocked_cost(rows_steps):
            pad = -(-len(rows_steps) // 128) * 128 - len(rows_steps)
            b = np.concatenate([rows_steps, np.zeros(pad)]).reshape(-1, 128)
            return b.max(axis=1).sum()
        stable = blocked_cost(row_max[row_max >= cap] - cap)
        print(f"  s1={cap:3d}: predicted block-steps: "
              f"phase1={cap*total_blocks} + phase2(stable)={stable:.0f} "
              f"= {cap*total_blocks+stable:.0f} vs single={single:.0f}")


def main():
    import os
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("RAYN_JAX_CACHE",
                                     "/tmp/rayn_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--kind", choices=("nee", "volume"), default="nee")
    ap.add_argument("--skip-phased", action="store_true",
                    help="skip the per-lane-gather phased sweep (a "
                         "measured loser) and the 32/128-row sweep")
    args = ap.parse_args()

    start, end, active, prog, settings = build_segments(args.n, args.kind)
    detail = settings.sdf_detail_scale
    frac = float(np.asarray(active).mean())
    print(f"n={args.n} active={frac:.3f} device={jax.devices()[0].device_kind}")
    step_stats(prog, start, end, active, detail, args.steps)

    results = {}

    f = jax.jit(lambda s, e, a: march_ops.march_occlusion(
        prog, s, e, detail, args.steps, active=a))
    dt, ref_jnp = timeit(f, start, end, active)
    results["jnp"] = dt
    ref_jnp = np.asarray(ref_jnp)
    print(f"jnp while_loop:            {dt*1e3:8.2f} ms  "
          f"occl={ref_jnp.mean():.4f}")

    ref = None  # pallas64 is the reference for bit-exactness
    for rows in ((64,) if args.skip_phased else (32, 64, 128)):
        f = jax.jit(lambda s, e, a, r=rows: march_pallas.march_occlusion(
            prog, s, e, detail, args.steps, active=a, block_rows=r))
        dt, out = timeit(f, start, end, active)
        out = np.asarray(out)
        if rows == 64:
            ref = out
        agree = float((out == ref_jnp).mean())
        results[f"pallas{rows}"] = dt
        print(f"pallas rows={rows:<4d}          {dt*1e3:8.2f} ms  "
              f"agree_jnp={agree:.6f}")

    for relax in (() if args.skip_phased else (1.5,)):
        f = jax.jit(lambda s, e, a, rx=relax: march_pallas.march_occlusion(
            prog, s, e, detail, args.steps, active=a, block_rows=64,
            relax=rx))
        dt, out = timeit(f, start, end, active)
        agree = float((np.asarray(out) == ref).mean())
        results[f"relax{relax}"] = dt
        print(f"pallas relax={relax}:        {dt*1e3:8.2f} ms  "
              f"agree_pallas64={agree:.6f}")

    for s1 in (() if args.skip_phased else (8, 16, 24, 32)):
        f = jax.jit(lambda s, e, a, k=s1:
                    march_pallas.march_occlusion_phased(
                        prog, s, e, detail, args.steps, active=a,
                        phase1_steps=k, block_rows=64))
        dt, out = timeit(f, start, end, active)
        ok = np.array_equal(np.asarray(out), ref)
        results[f"phased{s1}"] = dt
        print(f"two-phase s1={s1:<3d}:         {dt*1e3:8.2f} ms  "
              f"match_pallas64={ok}")

    for s1 in (4, 8, 16, 24):
        f = jax.jit(lambda s, e, a, k=s1:
                    march_pallas.march_occlusion_sorted(
                        prog, s, e, detail, args.steps, active=a,
                        phase1_steps=k, block_rows=64))
        dt, out = timeit(f, start, end, active)
        ok = np.array_equal(np.asarray(out), ref)
        results[f"sorted{s1}"] = dt
        print(f"sorted s1={s1:<3d}:            {dt*1e3:8.2f} ms  "
              f"match_pallas64={ok}")

    best = min(results, key=results.get)
    print(f"best: {best} {results[best]*1e3:.2f} ms")


if __name__ == "__main__":
    main()
