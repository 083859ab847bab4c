#!/usr/bin/env python
"""Shadow-march reduction study (round 3): speed AND fidelity of
truncated-iteration shadow DE, scaled shadow epsilons, and the
bounding-volume segment clip, on the live chip.

For each configuration it measures
  - throughput: 512x512 fractal pass time (like tools/perf_pass.py)
  - fidelity: RMSE of a 192x192 @128spp render against the
    full-precision render with the SAME sampler streams (so differences
    are purely the reduction's visibility changes, not MC noise), plus
    the mean-relative image bias.
A seed-swap null (two full-precision renders at different frame salts)
calibrates what "negligible" RMSE means at this spp.

Results recorded in BASELINE.md.
"""

import argparse
import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp

from rayn_tpu.config import RenderSettings
from rayn_tpu.ops import filters as filter_ops
from rayn_tpu.render import film as film_mod
from rayn_tpu.render import renderer
from rayn_tpu.scene import presets
from rayn_tpu.utils import rng


def time_pass(settings, data, static, camera, reps=4):
    tables = rng.build_sample_tables(settings, frame=1)
    fis = filter_ops.build_fis_table(filter_ops.blackman_harris(1.5),
                                     settings.filter_table_size)
    n_pixels = settings.resolution[0] * settings.resolution[1]
    t0c, t1c = jnp.float32(1 / 24), jnp.float32(2 / 24)
    n = settings.rays_per_pass
    film = film_mod.new_film(n_pixels)
    film = renderer.render_pass(film, data, static, settings, tables,
                                camera, fis, jnp.int32(0), n, t0c, t1c)
    float(film.samples[-1])
    t0 = time.perf_counter()
    for i in range(reps):
        film = renderer.render_pass(film, data, static, settings, tables,
                                    camera, fis, jnp.int32((i + 1) * n), n,
                                    t0c, t1c)
    float(film.samples[-1])
    return (time.perf_counter() - t0) / reps


def render_image(settings, data, static, camera, frame=1):
    film = renderer.render_frame(data, static, settings, camera,
                                 frame=frame)
    return np.asarray(
        film_mod.resolve(film, settings.resolution).color)


def rmse(a, b):
    return float(np.sqrt(np.mean((a - b) ** 2)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fid-res", type=int, default=192)
    ap.add_argument("--fid-spp", type=int, default=128)
    ap.add_argument("--skip-speed", action="store_true")
    ap.add_argument("--skip-fidelity", action="store_true")
    args = ap.parse_args()

    import os
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("RAYN_JAX_CACHE",
                                     "/tmp/rayn_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    speed_base = RenderSettings(resolution=(512, 512), spp=128,
                                rays_per_pass=1 << 20)
    fr = (args.fid_res, args.fid_res)
    fid_base = RenderSettings(resolution=fr, spp=args.fid_spp,
                              rays_per_pass=min(1 << 20,
                                                fr[0] * fr[1] * args.fid_spp))
    data, static, camera = presets.default_scene(resolution=(512, 512))
    fdata, fstatic, fcamera = presets.default_scene(resolution=fr)

    configs = [
        ("full, no bv clip", dict(shadow_bv_clip=False)),
        ("full + bv clip", dict()),
        ("iters=10 + bv", dict(shadow_de_iterations=10)),
        ("iters=8 + bv", dict(shadow_de_iterations=8)),
        ("iters=6 + bv", dict(shadow_de_iterations=6)),
        ("iters=4 + bv", dict(shadow_de_iterations=4)),
        ("eps x2 + bv", dict(shadow_eps_scale=2.0)),
        ("eps x4 + bv", dict(shadow_eps_scale=4.0)),
        ("iters=8 + eps x2 + bv", dict(shadow_de_iterations=8,
                                       shadow_eps_scale=2.0)),
        ("iters=6 + eps x2 + bv", dict(shadow_de_iterations=6,
                                       shadow_eps_scale=2.0)),
    ]

    print(f"device={jax.devices()[0].device_kind}")

    ref_img = None
    null_rmse = None
    if not args.skip_fidelity:
        ref = dataclasses.replace(fid_base, shadow_bv_clip=False)
        ref_img = render_image(ref, fdata, fstatic, fcamera, frame=1)
        alt_img = render_image(ref, fdata, fstatic, fcamera, frame=101)
        null_rmse = rmse(ref_img, alt_img)
        print(f"seed-swap null RMSE @ {fr[0]}x{fr[1]} {args.fid_spp}spp: "
              f"{null_rmse:.2e} (mean {ref_img.mean():.4f})")

    for label, kw in configs:
        line = f"{label:26s}"
        if not args.skip_speed:
            s = dataclasses.replace(speed_base, **kw)
            dt = time_pass(s, data, static, camera)
            line += (f"  {dt*1e3:7.1f} ms/pass"
                     f"  {(1 << 20)/dt/1e6:6.3f} Ms/s")
        if not args.skip_fidelity:
            f = dataclasses.replace(fid_base, **kw)
            img = render_image(f, fdata, fstatic, fcamera, frame=1)
            r = rmse(img, ref_img)
            bias = abs(img.mean() - ref_img.mean()) / max(ref_img.mean(),
                                                          1e-9)
            line += (f"  RMSE {r:.2e} ({r/max(null_rmse,1e-12):5.2f}x null)"
                     f"  bias {bias:.2e}")
        print(line, flush=True)


if __name__ == "__main__":
    main()
