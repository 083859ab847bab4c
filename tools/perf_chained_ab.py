#!/usr/bin/env python
"""A/B the chained shadow march end-to-end on the live chip.

Times one full render_pass of the fractal benchmark with
chained_shadow_march off vs on (fused bounce-tail mega-kernel path,
production defaults otherwise), at 512x512 and at the official 1080p
shape. Predicted from captured queues: 1.58-1.73x fewer shadow-march
block iterations (tools/perf_chained_predict.py), ~25% one-hot refresh
overhead => expected ~1.2-1.4x end-to-end on the march-bound fractal.

The cost-sorted legs are opt-in via --include-sorted: the round-3
40/28-column variadic-sort implementation was compile-pathological on
v5e (45-min DNF; see BASELINE.md round-3 A/B). Round 4's packed-gather
rework compiles fine — tools/perf_sorted_ab.py / perf_sorted_decomp.py
are the focused drivers for it.
"""

import argparse
import dataclasses
import os
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("RAYN_JAX_CACHE", "/tmp/rayn_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    ap = argparse.ArgumentParser()
    ap.add_argument("--include-sorted", action="store_true",
                    help="also time the cost-sorted legs. MEASURED "
                         "compile-pathological on v5e through the axon "
                         "tunnel (2026-08-18): the sorted pass program "
                         "(40/28-column payload sorts per bounce) did not "
                         "finish compiling in 45 minutes vs 2-4 min for "
                         "the unsorted pass — see BASELINE.md round-3 A/B")
    args = ap.parse_args()

    from perf_pass import time_pass
    from rayn_tpu.config import RenderSettings
    from rayn_tpu.scene import presets

    print(f"device={jax.devices()[0].device_kind}", flush=True)
    for res, n in (((512, 512), 1 << 20), ((1920, 1080), 1 << 20)):
        base = RenderSettings(resolution=res, spp=128, rays_per_pass=n)
        data, static, camera = presets.default_scene(resolution=res)
        label = f"{res[0]}x{res[1]}"
        time_pass(f"{label} sequential (chained off)",
                  dataclasses.replace(base, chained_shadow_march=False),
                  data, static, camera)
        time_pass(f"{label} chained",
                  dataclasses.replace(base, chained_shadow_march=True),
                  data, static, camera)
        if args.include_sorted:
            time_pass(f"{label} chained + cost-sorted",
                      dataclasses.replace(base, chained_shadow_march=True,
                                          sorted_shadow_march=True),
                      data, static, camera)

    # Chained-kernel block-row sweep (512x512 only): the chained kernel
    # holds 12 segment registers per lane, so its VMEM footprint per
    # block is larger than the sequential kernel's — the 64-row default
    # was tuned for the latter and may not be optimal here.
    res = (512, 512)
    base = RenderSettings(resolution=res, spp=128, rays_per_pass=1 << 20)
    data, static, camera = presets.default_scene(resolution=res)
    for rows in (32, 128):
        time_pass(f"512x512 chained occl_block_rows={rows}",
                  dataclasses.replace(base, chained_shadow_march=True,
                                      pallas_occl_block_rows=rows),
                  data, static, camera)
        if args.include_sorted:
            time_pass(f"512x512 chained+sorted occl_block_rows={rows}",
                      dataclasses.replace(base, chained_shadow_march=True,
                                          sorted_shadow_march=True,
                                          pallas_occl_block_rows=rows),
                      data, static, camera)


if __name__ == "__main__":
    main()
