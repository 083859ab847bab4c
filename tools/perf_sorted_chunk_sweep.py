#!/usr/bin/env python
"""Sweep the cost-sort chunk granularity (round 4).

The chunk-sorted scheduler measured +6.4% at the auto chunk (512 lanes,
tools/perf_sorted_ab.py). Finer chunks track the per-lane cost key more
closely (the modeled per-lane win was 1.5-2.2x on the shadow loops) but
dilute the pixel coherence inside a Pallas block and sort more rows;
coarser chunks are cheaper but blunter. This sweeps sorted_chunk over
powers of two at 512x512 fractal, 1M-ray passes.

Run on the live chip:  python tools/perf_sorted_chunk_sweep.py
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
    ap.add_argument("--chunks", type=int, nargs="*",
                    default=[2048, 512, 128, 32])
    args = ap.parse_args()

    from perf_sorted_ab import time_leg
    from rayn_tpu.config import RenderSettings
    from rayn_tpu.scene import presets

    print(f"device={jax.devices()[0].device_kind}", flush=True)
    res = (512, 512)
    base = RenderSettings(resolution=res, spp=128, rays_per_pass=args.n,
                          sorted_shadow_march=True)
    data, static, camera = presets.default_scene(resolution=res)
    for c in args.chunks:
        time_leg(f"sorted chunk={c}",
                 dataclasses.replace(base, sorted_chunk=c),
                 data, static, camera)


if __name__ == "__main__":
    main()
