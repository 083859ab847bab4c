#!/usr/bin/env python
"""Full-pass A/B of Pallas block rows for the march kernels (round 5).

tools/perf_block_model.py (captured queues, n=65536) models smaller
blocks as a pure scheduling win now that the queue is chunk-sorted:

  shadow chained march   rows 64 -> 8: 95.4 -> 79.4 lane-Miters (1.20x)
  primary march          rows 64 -> 8: 31.4 -> 18.8 lane-Miters (1.67x)
    (primary needs NO sort: pixel-major order is already coherent;
     chunk-sorting depth 0 actually hurts it)

The round-1 "64-128 rows or bust" rule was measured UNSORTED, where a
big block's early exit hardly ever fired; after round-4's cost sorting
the blocks are cost-homogeneous and fine blocks harvest the gradient.
This times full 512x512 fractal passes across the rows grid to find
where per-block overheads eat the modeled win.

Run on the live chip:  python tools/perf_blockrows_ab.py
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
    ap.add_argument("--occl-rows", type=int, nargs="*",
                    default=[64, 16, 8])
    ap.add_argument("--march-rows", type=int, nargs="*",
                    default=[64, 16, 8])
    args = ap.parse_args()

    from perf_sorted_ab import time_leg
    from rayn_tpu.config import RenderSettings
    from rayn_tpu.scene import presets

    print(f"device={jax.devices()[0].device_kind}", flush=True)
    res = (512, 512)
    base = RenderSettings(resolution=res, spp=128, rays_per_pass=args.n)
    data, static, camera = presets.default_scene(resolution=res)

    best = {}
    # sweep occl rows at march rows=64, then march rows at occl best
    for r in args.occl_rows:
        dt = time_leg(f"occl_rows={r} march_rows=64",
                      dataclasses.replace(base, pallas_occl_block_rows=r),
                      data, static, camera)
        best[("occl", r)] = dt
    occl_best = min(args.occl_rows, key=lambda r: best[("occl", r)])
    for r in args.march_rows:
        if r == 64 and occl_best in args.occl_rows and occl_best != 64:
            pass  # still time it: interaction matters
        dt = time_leg(f"occl_rows={occl_best} march_rows={r}",
                      dataclasses.replace(base,
                                          pallas_occl_block_rows=occl_best,
                                          pallas_block_rows=r),
                      data, static, camera)
        best[("march", r)] = dt
    march_best = min(args.march_rows, key=lambda r: best[("march", r)])
    # interaction probes at the combined best: sort OFF (the model says
    # fine blocks make the sort nearly redundant — dropping it saves the
    # per-bounce key kernel + permutes) and compaction ON (verdict item:
    # re-measure at round-5 defaults).
    comb = dataclasses.replace(base, pallas_occl_block_rows=occl_best,
                               pallas_block_rows=march_best)
    time_leg(f"best ({occl_best}/{march_best}) sort OFF",
             dataclasses.replace(comb, sorted_shadow_march=False),
             data, static, camera)
    time_leg(f"best ({occl_best}/{march_best}) compact ON",
             dataclasses.replace(comb, compact_bounces=True),
             data, static, camera)


if __name__ == "__main__":
    main()
