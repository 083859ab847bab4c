"""Built-in scenes.

`default_scene` is a 1:1 rewrite of the reference's hard-coded scene
(reference src/setup.rs:46-170): sky dome, MandelBox fractal, five
emissive sphere lights, pinhole camera. The other presets cover the
remaining BASELINE.json benchmark configs (spheres-only, volume-off,
animated).
"""

from __future__ import annotations

import numpy as np

from rayn_tpu.ops import sdf as sdf_ops
from rayn_tpu.render.camera import PinholeCamera
from rayn_tpu.scene.animation import AnimChannel
from rayn_tpu.scene.scene import SceneBuilder


def _normalized(v):
    v = np.asarray(v, np.float32)
    return v / np.linalg.norm(v)


def default_scene(resolution=(1280, 720), world_radius: float = 100.0,
                  fractal_iterations: int = 12, volume: bool = True,
                  animated: bool = False, animated_geo: bool = False,
                  geo_knots: int = 8):
    """The reference's default scene (src/setup.rs:46-170).

    Returns (scene_data, scene_static, camera). With `animated=True` the
    camera orbits slightly over the shutter interval (exercising motion
    blur; the reference supports this via `Fn(f32)->Vec3` camera params).
    With `animated_geo=True` the sphere lights and their paired emissive
    spheres orbit over [0, 2] s — animated GEOMETRY channels (the
    reference's `WSequenced` sphere centers, src/sphere.rs:49 +
    src/animation.rs:55-68), exercising the animated fast path in the
    fused kernels (any knot count runs fused since round 5 — positions
    are resolved outside the kernels at each lane's time)."""
    b = SceneBuilder()

    def _orbit_channel(pos, rate=0.25, phase=0.0):
        pos = np.asarray(pos, np.float32)

        def fn(t):
            ang = rate * t + phase
            c, s = np.cos(ang), np.sin(ang)
            x, y, z = pos
            return np.asarray((c * x + s * z, y, -s * x + c * z),
                              np.float32)

        return AnimChannel.from_fn(fn, 0.0, 2.0, knots=geo_knots)

    # Volumetrics (src/setup.rs:55-60)
    if volume:
        b.set_volume(0.25, 0.035)

    # Sky (src/setup.rs:63-69)
    sky = b.add_sky(top=(0.3, 0.4, 0.6),
                    bottom=np.asarray((0.2, 0.3, 0.6), np.float32) * 0.05)
    b.add_sphere((0.0, 0.0, 0.0), world_radius, sky)

    # Fractal (src/setup.rs:76-86)
    grey = b.add_dielectric(albedo=(0.2, 0.2, 0.2), roughness=0.6)
    mandelbox = sdf_ops.mandelbox(
        iterations=fractal_iterations, box_fold_l=1.0,
        sphere_min_rad=0.01, sphere_fixed_rad=1.9, scale=-2.1)
    # Bounding sphere for shadow-segment clipping: measured numerically
    # (3M volume samples + 200K directional samples per radius) — the
    # {DE < 1e-3} shell of this MandelBox ends at |p| = 2.78 and DE
    # grows linearly (≈ |p| - 3.46) past r = 3.5; 3.6 adds margin.
    # The max shadow-march hit epsilon is 1e-5*detail*t <= 1e-3 at
    # t = 2*world_radius, so no occlusion hit can occur outside 3.6.
    b.set_sdf(mandelbox, grey, bound_radius=3.6)

    # Lights (src/setup.rs:100-122)
    green = _normalized((1.5, 4.5, 3.0))
    blue = _normalized((1.5, 3.0, 4.5))
    blue_emissive = b.add_emissive(blue * 3.0)
    green_emissive = b.add_emissive(green * 3.0)

    light_pairs = [((1.2, -1.2, 1.2), 0.15), ((-1.2, 1.2, 1.2), 0.15)]
    for i, (pos, rad) in enumerate(light_pairs):
        pos = np.asarray(pos, np.float32)
        green_pos = pos * np.asarray((1.0, -1.0, 1.0), np.float32)
        if animated_geo:
            # co-moving light + emissive body: identical channels keep
            # the MIS pairing autodetect (scene.build) intact
            green_pos = _orbit_channel(green_pos, phase=0.6 * i)
            pos = _orbit_channel(pos, phase=0.3 + 0.6 * i)
        b.add_sphere_light(green_pos, rad, green * 40.0)
        b.add_sphere_light(pos, rad, blue * 40.0)
        b.add_sphere(green_pos, rad - 0.01, green_emissive)
        b.add_sphere(pos, rad - 0.01, blue_emissive)

    b.add_sphere_light((0.0, 0.0, 0.0), 0.25, green * 20.0)
    b.add_sphere((0.0, 0.0, 0.0), 0.24, green_emissive)

    # Camera (src/setup.rs:129-142)
    base_origin = np.asarray((-0.45, 0.2, 2.0), np.float32) * 2.25
    if animated:
        def orbit(t):
            ang = 0.35 * t
            c, s = np.cos(ang), np.sin(ang)
            x, y, z = base_origin
            return np.asarray((c * x + s * z, y, -s * x + c * z), np.float32)
        origin = AnimChannel.from_fn(orbit, 0.0, 2.0, knots=64)
    else:
        origin = base_origin
    camera = PinholeCamera.make(
        resolution, 60.0, origin, (0.0, 0.0, 0.0), (0.0, 1.0, 0.0))

    data, static = b.build()
    return data, static, camera


def spheres_scene(resolution=(1280, 720), world_radius: float = 100.0):
    """Analytic-spheres-only scene (BASELINE.json config #2,
    "diffuse/metal/dielectric BSDFs"): a row of lambert / dielectric /
    metal / refractive spheres under the sky with two sphere lights —
    exercises the hit/shade/splat path across every receiving BSDF kind
    with no marching."""
    b = SceneBuilder()
    sky = b.add_sky(top=(0.3, 0.4, 0.6),
                    bottom=np.asarray((0.2, 0.3, 0.6), np.float32) * 0.05)
    b.add_sphere((0.0, 0.0, 0.0), world_radius, sky)

    floor = b.add_lambertian((0.5, 0.5, 0.5))
    b.add_sphere((0.0, -100.5, 0.0), 100.0, floor)

    mats = [
        b.add_lambertian((0.7, 0.3, 0.3)),
        b.add_dielectric((0.8, 0.8, 0.2), 0.2),
        b.add_metallic((0.9, 0.7, 0.3), 0.15),
        b.add_dielectric((0.3, 0.5, 0.8), 0.6),
        b.add_refractive((0.9, 0.95, 1.0), 0.0, 1.5),
        b.add_lambertian((0.2, 0.7, 0.4)),
    ]
    for i, m in enumerate(mats):
        x = -2.0 + i * 0.8
        b.add_sphere((x, 0.0, 0.0), 0.38, m)

    warm = _normalized((5.0, 4.0, 2.5))
    b.add_sphere_light((2.0, 2.5, 2.0), 0.4, warm * 30.0)
    b.add_sphere_light((-2.0, 1.5, -1.0), 0.3, warm * 20.0)
    emissive = b.add_emissive(warm * 3.0)
    b.add_sphere((2.0, 2.5, 2.0), 0.39, emissive)
    b.add_sphere((-2.0, 1.5, -1.0), 0.29, emissive)

    camera = PinholeCamera.make(
        resolution, 60.0, (0.0, 0.8, 4.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0))
    data, static = b.build()
    return data, static, camera
