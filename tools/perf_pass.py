#!/usr/bin/env python
"""End-to-end render_pass ablation timing on the live chip.

Times one full 1M-ray pass of the fractal benchmark under targeted
ablations (cheap shadows, cheap primary, no volume, fewer NEE samples,
pallas on/off, block sizes). The deltas attribute the pass time to
pipeline stages far more reliably than microbenchmarks through the
axon tunnel.
"""

import argparse
import dataclasses
import time

import jax
import jax.numpy as jnp

from rayn_tpu.config import RenderSettings
from rayn_tpu.ops import filters as filter_ops
from rayn_tpu.render import film as film_mod
from rayn_tpu.render import renderer
from rayn_tpu.scene import presets
from rayn_tpu.utils import rng


def time_pass(label, settings, data, static, camera, reps=3):
    tables = rng.build_sample_tables(settings, frame=1)
    fis = filter_ops.build_fis_table(filter_ops.blackman_harris(1.5),
                                     settings.filter_table_size)
    n_pixels = settings.resolution[0] * settings.resolution[1]
    t0c, t1c = jnp.float32(1 / 24), jnp.float32(2 / 24)
    n = settings.rays_per_pass

    film = film_mod.new_film(n_pixels)
    film = renderer.render_pass(film, data, static, settings, tables,
                                camera, fis, jnp.int32(0), n, t0c, t1c)
    float(film.samples[-1])  # compile+sync
    t0 = time.perf_counter()
    for i in range(reps):
        film = renderer.render_pass(film, data, static, settings, tables,
                                    camera, fis, jnp.int32((i + 1) * n), n,
                                    t0c, t1c)
        float(film.samples[-1])
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:42s} {dt*1e3:9.1f} ms  "
          f"({n/dt/1e6:.3f} Msamples/s)")
    return dt


def main():
    import os
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("RAYN_JAX_CACHE",
                                     "/tmp/rayn_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--probes-only", action="store_true",
                    help="baseline + monkeypatched occlusion probes only")
    args = ap.parse_args()

    res = (args.res, args.res)
    base = RenderSettings(resolution=res, spp=128, rays_per_pass=args.n)
    data, static, camera = presets.default_scene(resolution=res)
    dataN, staticN, cameraN = presets.default_scene(resolution=res,
                                                    volume=False)

    print(f"device={jax.devices()[0].device_kind} rays/pass={args.n}")
    full = time_pass("full fractal (baseline)", base, data, static, camera)
    if not args.probes_only:
        _run_sweep(base, data, static, camera, dataN, staticN, cameraN)
    _run_probes(base, full, data, static, camera)


def _run_sweep(base, data, static, camera, dataN, staticN, cameraN):
    time_pass("occl block_rows=128",
              dataclasses.replace(base, pallas_occl_block_rows=128),
              data, static, camera)
    time_pass("march block_rows=128",
              dataclasses.replace(base, pallas_block_rows=128),
              data, static, camera)
    time_pass("max_vis_marches=8 (shadow cost probe)",
              dataclasses.replace(base, max_vis_marches=8),
              data, static, camera)
    time_pass("max_marches=32 (primary cost probe)",
              dataclasses.replace(base, max_marches=32),
              data, static, camera)
    time_pass("nee_light_samples=1 (NEE volume probe)",
              dataclasses.replace(base, nee_light_samples=1),
              data, static, camera)
    time_pass("volume_marches=0 (volume seg probe)",
              dataclasses.replace(base, volume_marches=0),
              data, static, camera)
    time_pass("no volume scene", base, dataN, staticN, cameraN)


def _run_probes(base, full, data, static, camera):
    import dataclasses
    # --- monkeypatched probes (isolate occlusion-stage components) ---
    from rayn_tpu.ops import intersect as isect
    real_occl = isect.test_occluded

    def no_occl(data_, static_, settings_, start, end, time_, active):
        import jax.numpy as jnp
        return jnp.ones(start.shape[0], jnp.float32)

    # distinct filter_table_size forces a fresh trace so the
    # monkeypatch isn't hidden by the render_pass jit cache
    isect.test_occluded = no_occl
    time_pass("NO occlusion (build+shade+film only)",
              dataclasses.replace(base, filter_table_size=511),
              data, static, camera)

    def spheres_only(data_, static_, settings_, start, end, time_, active):
        import jax.numpy as jnp_
        from rayn_tpu.ops import spheres as sphere_ops
        from rayn_tpu.scene.scene import sphere_centers_at
        centers = sphere_centers_at(data_, time_)
        occ = sphere_ops.occluded(start, end, centers, data_.sphere_radii)
        return jnp_.where(jnp_.any(occ, axis=1), 0.0, 1.0)

    isect.test_occluded = spheres_only
    time_pass("sphere-only occlusion (no SDF shadow march)",
              dataclasses.replace(base, filter_table_size=513),
              data, static, camera)
    isect.test_occluded = real_occl

    print(f"baseline {full*1e3:.1f} ms")


if __name__ == "__main__":
    main()
