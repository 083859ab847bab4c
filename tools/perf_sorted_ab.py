#!/usr/bin/env python
"""Focused A/B of the cost-sorted chained shadow scheduler (round 4).

Round 3's sorted leg used a 40/28-column variadic `lax.sort` per bounce
and did not finish COMPILING in 45 minutes on v5e. Round 4 replaces it
with a 2-column key sort + ONE packed [N, C] row gather
(integrator._permute_rows). This tool times, separately:

  1. compile wall-clock of the sorted pass program (the round-3 blocker)
  2. steady-state ms/pass: chained vs chained+sorted, 512x512 and 1080p

Run on the live chip:  python tools/perf_sorted_ab.py [--res 512]
"""

import argparse
import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_leg(label, settings, data, static, camera, reps=3):
    from rayn_tpu.ops import filters as filter_ops
    from rayn_tpu.render import film as film_mod
    from rayn_tpu.render import renderer
    from rayn_tpu.utils import rng

    tables = rng.build_sample_tables(settings, frame=1)
    fis = filter_ops.build_fis_table(filter_ops.blackman_harris(1.5),
                                     settings.filter_table_size)
    n_pixels = settings.resolution[0] * settings.resolution[1]
    t0c, t1c = jnp.float32(1 / 24), jnp.float32(2 / 24)
    n = settings.rays_per_pass

    film = film_mod.new_film(n_pixels)
    tc0 = time.perf_counter()
    film = renderer.render_pass(film, data, static, settings, tables,
                                camera, fis, jnp.int32(0), n, t0c, t1c)
    float(film.samples[-1])  # compile + first run + sync
    compile_s = time.perf_counter() - tc0
    t0 = time.perf_counter()
    for i in range(reps):
        film = renderer.render_pass(film, data, static, settings, tables,
                                    camera, fis, jnp.int32((i + 1) * n), n,
                                    t0c, t1c)
        float(film.samples[-1])
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:44s} compile+first {compile_s:7.1f} s   "
          f"{dt*1e3:8.1f} ms/pass  ({n/dt/1e6:.3f} Msamples/s)", flush=True)
    return dt


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("RAYN_JAX_CACHE", "/tmp/rayn_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--res", type=int, nargs="*", default=[512, 1080])
    ap.add_argument("--skip-chained", action="store_true",
                    help="time only the sorted legs")
    args = ap.parse_args()

    from rayn_tpu.config import RenderSettings
    from rayn_tpu.scene import presets

    print(f"device={jax.devices()[0].device_kind}", flush=True)
    for r in args.res:
        res = (512, 512) if r == 512 else (1920, 1080)
        base = RenderSettings(resolution=res, spp=128, rays_per_pass=args.n)
        data, static, camera = presets.default_scene(resolution=res)
        label = f"{res[0]}x{res[1]}"
        if not args.skip_chained:
            time_leg(f"{label} chained", base, data, static, camera)
        time_leg(f"{label} chained + cost-sorted",
                 dataclasses.replace(base, sorted_shadow_march=True),
                 data, static, camera)


if __name__ == "__main__":
    main()
