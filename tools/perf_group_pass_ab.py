#!/usr/bin/env python
"""Full-pass A/B of the chained advance group x cost-sort (round 4).

The kernel-level sweep (tools/perf_chained_group.py) measured G=8 at
+14.5% over G=1 on captured shadow queues (G=4 +11%). This times the
full 512x512 fractal pass program with the production fused kernels at
G in {1, 4, 8}, sorted ON (the shipping config) plus G=8 sorted OFF for
the interaction.

Run on the live chip:  python tools/perf_group_pass_ab.py
"""

import argparse
import dataclasses
import os
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("RAYN_JAX_CACHE", "/tmp/rayn_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--groups", type=int, nargs="*", default=[1, 4, 8])
    args = ap.parse_args()

    from perf_sorted_ab import time_leg
    from rayn_tpu.config import RenderSettings
    from rayn_tpu.scene import presets

    print(f"device={jax.devices()[0].device_kind}", flush=True)
    res = (512, 512)
    base = RenderSettings(resolution=res, spp=128, rays_per_pass=args.n)
    data, static, camera = presets.default_scene(resolution=res)
    for g in args.groups:
        time_leg(f"sorted G={g}",
                 dataclasses.replace(base, sorted_shadow_march=True,
                                     chained_advance_group=g),
                 data, static, camera)
    time_leg("unsorted G=8",
             dataclasses.replace(base, sorted_shadow_march=False,
                                 chained_advance_group=8),
             data, static, camera)


if __name__ == "__main__":
    main()
