"""Wavefront compaction must not change the image (permutation
invariance of the film scatter)."""

import dataclasses

import numpy as np

from rayn_tpu.config import RenderSettings
from rayn_tpu.render import film as film_mod
from rayn_tpu.render import renderer
from rayn_tpu.scene import presets


def test_compaction_invariant():
    res = (24, 16)
    base = RenderSettings(resolution=res, spp=4, max_bounces=3,
                          volume_marches=1, max_marches=24,
                          max_vis_marches=12, rays_per_pass=1 << 11,
                          compact_bounces=True)
    off = dataclasses.replace(base, compact_bounces=False)
    data, static, cam = presets.spheres_scene(resolution=res)
    a = film_mod.resolve(renderer.render_frame(data, static, base, cam, 1),
                         res)
    b = film_mod.resolve(renderer.render_frame(data, static, off, cam, 1),
                         res)
    # identical up to f32 scatter-add reordering within a pixel
    np.testing.assert_allclose(a.color, b.color, atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(a.alpha, b.alpha, atol=1e-6)
    np.testing.assert_allclose(a.normal, b.normal, atol=2e-5)
