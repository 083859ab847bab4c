#!/usr/bin/env python
"""Occlusion variants on the REAL in-situ shadow queue.

Captures the exact (start, end, active) arguments the integrator passes
to intersect.test_occluded at each bounce of a real 1M-ray pass (12
segments/lane concatenated: 4 NEE + 8 equi-angular volume), then times
occlusion variants on the captured queues. This is the honest
optimization target: tools/perf_occl.py's synthetic single-segment
batches measured sorted packing as a win while the full pass measured a
loss.
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def capture_queues(n):
    from rayn_tpu.config import RenderSettings
    from rayn_tpu.ops import filters as filter_ops
    from rayn_tpu.ops import intersect
    from rayn_tpu.render import film as film_mod
    from rayn_tpu.render import renderer
    from rayn_tpu.scene import presets
    from rayn_tpu.utils import rng

    res = (512, 512)
    # fused kernels march shadows in-kernel and never reach
    # intersect.test_occluded — capture through the unfused path (the
    # segment queue passed there is the same geometry the fused kernel
    # builds internally; identical sampler streams).
    settings = RenderSettings(resolution=res, spp=128, rays_per_pass=n,
                              use_fused_shadows=False,
                              use_fused_finish=False,
                              use_fused_bounce_tail=False)
    data, static, camera = presets.default_scene(resolution=res)
    tables = rng.build_sample_tables(settings, frame=1)
    fis = filter_ops.build_fis_table(filter_ops.blackman_harris(1.5),
                                     settings.filter_table_size)

    captured = []
    real = intersect.test_occluded

    def spy(data_, static_, settings_, start, end, time_, active, **kw):
        captured.append((start, end, active))
        return real(data_, static_, settings_, start, end, time_, active,
                    **kw)

    intersect.test_occluded = spy
    try:
        film = film_mod.new_film(res[0] * res[1])
        # No jit wrapper: run the pass op-by-op so the spy sees concrete
        # arrays (slow, but capture is one-time).
        from rayn_tpu.render.integrator import init_state, trace
        ray_idx = renderer.ray_indices(jnp.int32(0), n)
        origin, direction, tm, pixel, sample_idx, in_range = \
            renderer.generate_rays(settings, tables, camera, fis, ray_idx,
                                   jnp.float32(1 / 24), jnp.float32(2 / 24))
        hps_abs0, hps_lin0 = camera.half_pixel_size_coeffs()
        state = init_state(origin, direction, tm, pixel, sample_idx,
                           in_range)
        trace(data, static, settings, tables, state, hps_abs0, hps_lin0)
    finally:
        intersect.test_occluded = real
    prog = static.sdf_program(data)
    return captured, prog, settings


def timeit(fn, *args, reps=6):
    out = fn(*args)
    _ = float(jnp.ravel(out)[-1].astype(jnp.float32))
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(jnp.ravel(out)[-1].astype(jnp.float32))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.ravel(out)[-1].astype(jnp.float32))
    tk = time.perf_counter() - t0
    return max((tk - t1) / (reps - 1), 1e-9), out


def main():
    from rayn_tpu.ops import march_pallas

    jax.config.update("jax_compilation_cache_dir", "/tmp/rayn_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 18)
    ap.add_argument("--bounce", type=int, default=0)
    ap.add_argument("--sorted", type=int, nargs="*", default=[8])
    args = ap.parse_args()

    queues, prog, settings = capture_queues(args.n)
    print(f"captured {len(queues)} bounce queues, "
          f"lanes {[q[0].shape[0] for q in queues]}", flush=True)
    start, end, active = queues[args.bounce]
    start = jax.device_put(np.asarray(start))
    end = jax.device_put(np.asarray(end))
    active = jax.device_put(np.asarray(active))
    detail = settings.sdf_detail_scale
    steps = settings.max_vis_marches
    frac = float(np.asarray(active).mean())
    print(f"bounce {args.bounce}: {start.shape[0]} lanes, "
          f"active={frac:.3f}", flush=True)

    f = jax.jit(lambda s, e, a: march_pallas.march_occlusion(
        prog, s, e, detail, steps, active=a, block_rows=64))
    dt, ref = timeit(f, start, end, active)
    ref = np.asarray(ref)
    print(f"pallas64:        {dt*1e3:8.2f} ms", flush=True)

    # with the BV clip, as the production kernels run it
    bv_r = 3.6
    f = jax.jit(lambda s, e, a: march_pallas.march_occlusion(
        prog, s, e, detail, steps, active=a, block_rows=64,
        bound_radius=bv_r))
    dt, ref_bv = timeit(f, start, end, active)
    ref_bv = np.asarray(ref_bv)
    print(f"pallas64+bv:     {dt*1e3:8.2f} ms", flush=True)

    # chained: the queue is 12 segments/ray concatenated segment-major;
    # chain each ray's 12 segments through one while loop
    K = 12
    n_lanes = start.shape[0]
    if n_lanes % K == 0:
        nseg = n_lanes // K
        s3 = start.reshape(K, nseg, 3)
        e3 = end.reshape(K, nseg, 3)
        a2 = active.reshape(K, nseg)
        for rows in (32, 64, 128):
            f = jax.jit(lambda s, e, a, r=rows:
                        march_pallas.march_occlusion_chained(
                            prog, s, e, detail, steps, a, block_rows=r,
                            bound_radius=bv_r))
            dt, out = timeit(f, s3, e3, a2)
            ok = np.array_equal(np.asarray(out).reshape(-1), ref_bv)
            print(f"chained12 r={rows:<4d}{dt*1e3:8.2f} ms  match={ok}",
                  flush=True)

    for s1 in args.sorted:
        f = jax.jit(lambda s, e, a, k=s1: march_pallas.march_occlusion_sorted(
            prog, s, e, detail, steps, active=a, phase1_steps=k,
            block_rows=64))
        dt, out = timeit(f, start, end, active)
        ok = np.array_equal(np.asarray(out), ref)
        print(f"sorted s1={s1:<3d}:   {dt*1e3:8.2f} ms  match={ok}",
              flush=True)


if __name__ == "__main__":
    main()
