"""The reference-quirk compat flags must render and actually change the
specular behavior they document (rayn_tpu/config.py)."""

import dataclasses

import numpy as np

from rayn_tpu.config import RenderSettings
from rayn_tpu.render import film as film_mod, renderer
from rayn_tpu.render.camera import PinholeCamera
from rayn_tpu.scene.scene import SceneBuilder


def _shiny_scene():
    b = SceneBuilder()
    sky = b.add_sky((0.8, 0.8, 0.8), (0.1, 0.1, 0.1))
    b.add_sphere((0, 0, 0), 50.0, sky)
    shiny = b.add_dielectric((0.4, 0.4, 0.4), 0.1)  # strong specular lobe
    b.add_sphere((0, 0, 0), 1.0, shiny)
    b.add_sphere_light((3, 3, 3), 0.5, (40.0, 40.0, 40.0))
    data, static = b.build()
    cam = PinholeCamera.make((24, 16), 50.0, (0, 1, 4), (0, 0, 0), (0, 1, 0))
    return data, static, cam


def test_compat_flags_render_and_differ():
    base = RenderSettings(resolution=(24, 16), spp=16, max_bounces=2,
                          rays_per_pass=1 << 11)
    data, static, cam = _shiny_scene()
    ref = film_mod.resolve(renderer.render_frame(data, static, base, cam, 1),
                           (24, 16))
    for flag in ("compat_spec_phi", "compat_spec_reflect"):
        s = dataclasses.replace(base, **{flag: True})
        got = film_mod.resolve(renderer.render_frame(data, static, s, cam, 1),
                               (24, 16))
        assert np.isfinite(got.color).all(), flag
        # the quirk changes the scattered specular field
        assert not np.allclose(got.color, ref.color), flag
        # but not the geometry AOVs
        np.testing.assert_allclose(got.alpha, ref.alpha, atol=1e-6)
