#!/usr/bin/env python
"""Two-instance pass cost on the live chip (VERDICT round-4 item 3's
"Done" measurement): a second traced-SDF instance must cost roughly
one extra DE fold wherever marched — NOT a 2x whole-render cliff (the
pre-round-4 behavior, when any second instance disqualified the entire
fused kernel family).

Legs: the default fractal scene (1 MandelBox instance) rebuilt in-tool,
and the same scene + a small bounded sphere-SDF instance (bound_radius
0.9 around (1.5, 0.3, 0.5)) with its own material — the reference's
HitableStore fold (src/hitable.rs:170-210). Both legs must engage the
fused kernels (warnings escalate to errors).

Run: python tools/perf_multi_sdf_ab.py
"""

import os
import sys
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np


def build_scene(extra_instance: bool, resolution=(512, 512)):
    """The default fractal scene (mirrors presets.default_scene,
    reference src/setup.rs:46-170), optionally + 1 bounded instance.
    Both legs are built by THIS function so the A/B differs only in the
    second instance."""
    from rayn_tpu.ops import sdf as sdf_ops
    from rayn_tpu.render.camera import PinholeCamera
    from rayn_tpu.scene.scene import SceneBuilder

    def _normalized(v):
        v = np.asarray(v, np.float32)
        return v / np.linalg.norm(v)

    b = SceneBuilder()
    b.set_volume(0.25, 0.035)
    sky = b.add_sky(top=(0.3, 0.4, 0.6),
                    bottom=np.asarray((0.2, 0.3, 0.6), np.float32) * 0.05)
    b.add_sphere((0.0, 0.0, 0.0), 100.0, sky)
    grey = b.add_dielectric(albedo=(0.2, 0.2, 0.2), roughness=0.6)
    mandelbox = sdf_ops.mandelbox(iterations=12, box_fold_l=1.0,
                                  sphere_min_rad=0.01,
                                  sphere_fixed_rad=1.9, scale=-2.1)
    b.set_sdf(mandelbox, grey, bound_radius=3.6)
    if extra_instance:
        red = b.add_lambertian((0.7, 0.2, 0.2))
        b.add_sdf(sdf_ops.translate(sdf_ops.sphere(0.35),
                                    (1.5, 0.3, 0.5)),
                  red, bound_radius=0.9)
    green = _normalized((1.5, 4.5, 3.0))
    blue = _normalized((1.5, 3.0, 4.5))
    blue_emissive = b.add_emissive(blue * 3.0)
    green_emissive = b.add_emissive(green * 3.0)
    for i, (pos, rad) in enumerate([((1.2, -1.2, 1.2), 0.15),
                                    ((-1.2, 1.2, 1.2), 0.15)]):
        pos = np.asarray(pos, np.float32)
        green_pos = pos * np.asarray((1.0, -1.0, 1.0), np.float32)
        b.add_sphere_light(green_pos, rad, green * 40.0)
        b.add_sphere_light(pos, rad, blue * 40.0)
        b.add_sphere(green_pos, rad - 0.01, green_emissive)
        b.add_sphere(pos, rad - 0.01, blue_emissive)
    b.add_sphere_light((0.0, 0.0, 0.0), 0.25, green * 20.0)
    b.add_sphere((0.0, 0.0, 0.0), 0.24, green_emissive)
    camera = PinholeCamera.make(
        resolution, 60.0,
        np.asarray((-0.45, 0.2, 2.0), np.float32) * 2.25,
        (0.0, 0.0, 0.0), (0.0, 1.0, 0.0))
    data, static = b.build()
    return data, static, camera


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/rayn_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    from perf_pass import time_pass

    from rayn_tpu.config import RenderSettings

    res = (512, 512)
    settings = RenderSettings(resolution=res, spp=128,
                              rays_per_pass=1 << 20)
    print(f"device={jax.devices()[0].device_kind}", flush=True)
    for extra in (False, True):
        data, static, camera = build_scene(extra, res)
        label = "2 instances (+bounded sphere)" if extra \
            else "1 instance (default fractal)"
        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)
            time_pass(label, settings, data, static, camera)


if __name__ == "__main__":
    main()
