#!/usr/bin/env python
"""Attribute the animated-geo 20% loss (round-4 verdict item 8).

Round 3 measured the animated-geo config (orbiting lights, 8-knot
geometry channels running in-kernel) at 1.175 Ms/s vs animated-camera's
1.472 with no attribution. Two candidate costs:

  (a) the multi-knot SMEM machinery itself: TL=TS=8 makes every kernel
      lerp 8-knot channels per lane (and stack_channels pads the STATIC
      spheres to 8 knots too);
  (b) the actual motion: orbiting lights change shadow-segment geometry
      and scheduling coherence.

Three legs separate them:
  A. static default scene              (TL=TS=1, static geometry)
  B. animated-geo with FROZEN orbits   (TL=TS=8, knot values all equal:
     pays all of (a), none of (b))
  C. animated-geo                      (a) + (b)

machinery cost = A - B;  motion cost = B - C.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def freeze_channels(data):
    """Replace every animated channel's knots with knot 0 tiled — same
    TL/TS (same kernel program shape), static geometry."""
    from rayn_tpu.scene.animation import AnimChannel

    def freeze(ch):
        v = np.asarray(ch.values)
        if v.shape[1] == 1:
            return ch
        tiled = np.tile(v[:, :1], (1, v.shape[1], 1))
        return AnimChannel(jnp.asarray(tiled), ch.t0, ch.t1)

    return data._replace(light_pos=freeze(data.light_pos),
                         sphere_centers=freeze(data.sphere_centers))


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("RAYN_JAX_CACHE", "/tmp/rayn_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from perf_sorted_ab import time_leg
    from rayn_tpu.config import RenderSettings
    from rayn_tpu.scene import presets

    print(f"device={jax.devices()[0].device_kind}", flush=True)
    res = (512, 512)
    base = RenderSettings(resolution=res, spp=128, rays_per_pass=1 << 20)

    data_a, static_a, cam = presets.default_scene(resolution=res)
    time_leg("A static scene (TL=TS=1)", base, data_a, static_a, cam)

    data_c, static_c, cam_c = presets.default_scene(resolution=res,
                                                    animated_geo=True)
    data_b = freeze_channels(data_c)
    # B and C share one compiled program (same static args + shapes,
    # different array VALUES) — their delta is purely data-dependent
    time_leg("B frozen orbits (TL=TS=8, static)", base,
             data_b, static_c, cam_c)
    time_leg("C animated-geo (TL=TS=8, orbiting)", base, data_c,
             static_c, cam_c)


if __name__ == "__main__":
    main()


def reduce_to_one_knot(data, which):
    """Slice a channel family to its first knot (changes TL or TS to 1,
    i.e. the compiled program shape) — isolates which family's in-kernel
    per-lane lerp carries the multi-knot cost."""
    from rayn_tpu.scene.animation import AnimChannel

    def one(ch):
        return AnimChannel(jnp.asarray(np.asarray(ch.values)[:, :1]),
                           ch.t0, ch.t1)

    if which == "lights":
        return data._replace(light_pos=one(data.light_pos))
    return data._replace(sphere_centers=one(data.sphere_centers))
