"""Fused closest-hit + shading kernel (ops/intersect_pallas.py) vs the
unfused closest_hit + shading_info pipeline."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from rayn_tpu.config import RenderSettings
from rayn_tpu.ops import filters as filter_ops
from rayn_tpu.ops import bsdf as bsdf_ops, intersect, intersect_pallas
from rayn_tpu.render import renderer
from rayn_tpu.scene import presets
from rayn_tpu.utils import rng


@pytest.fixture
def interpret_fused(monkeypatch):
    monkeypatch.setattr(intersect_pallas, "INTERPRET", True)


def _camera_rays(settings, data, static, camera, n):
    tables = rng.build_sample_tables(settings, frame=1)
    fis = filter_ops.build_fis_table(filter_ops.blackman_harris(1.5),
                                     settings.filter_table_size)
    ray_idx = renderer.ray_indices(jnp.int32(0), n)
    return renderer.generate_rays(settings, tables, camera, fis, ray_idx,
                                  jnp.float32(1 / 24), jnp.float32(2 / 24))


def test_fused_intersect_matches_unfused(interpret_fused):
    n = 1024
    res = (32, 32)
    s = RenderSettings(resolution=res, spp=4, max_marches=64,
                       rays_per_pass=n)
    data, static, camera = presets.default_scene(resolution=res)
    o, d, tm, px, si, in_range = _camera_rays(s, data, static, camera, n)
    ha, hl = camera.half_pixel_size_coeffs()
    hps_abs = jnp.broadcast_to(ha, (n,))
    hps_lin = jnp.broadcast_to(hl, (n,))

    t_max = jnp.full((n,), 2.0 * s.world_radius, jnp.float32)
    hit_ref = intersect.closest_hit(data, static, s, o, d, tm, t_max,
                                    hps_abs, hps_lin, in_range)
    info_ref = intersect.shading_info(data, static, s, hit_ref, o, d, tm,
                                      hps_abs, hps_lin)
    assert intersect_pallas.fused_intersect_ok(s, static, data)
    hit, info = intersect_pallas.closest_hit_shading(
        data, static, s, o, d, hps_abs, hps_lin, in_range, tm)

    np.testing.assert_array_equal(np.asarray(hit.valid),
                                  np.asarray(hit_ref.valid))
    np.testing.assert_array_equal(np.asarray(hit.obj),
                                  np.asarray(hit_ref.obj))
    np.testing.assert_allclose(np.asarray(hit.t), np.asarray(hit_ref.t),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(info.mat),
                                  np.asarray(info_ref.mat))
    np.testing.assert_allclose(np.asarray(info.point),
                               np.asarray(info_ref.point),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(info.normal),
                               np.asarray(info_ref.normal),
                               rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(info.offset_by),
                               np.asarray(info_ref.offset_by),
                               rtol=1e-4, atol=1e-7)


def test_fused_intersect_animated_geo(interpret_fused):
    """Multi-knot sphere-center channels (orbiting lights' emissive
    bodies) through the fused intersect kernel: centers are resolved
    OUTSIDE the kernel at each lane's time (sphere_centers_at, round-5
    — same design as the shadow kernels' light/sphere sites, no knot
    limit) and must match the unfused closest_hit + shading_info."""
    n = 1024
    res = (32, 32)
    s = RenderSettings(resolution=res, spp=4, max_marches=64,
                       rays_per_pass=n)
    data, static, camera = presets.default_scene(resolution=res,
                                                 animated_geo=True)
    assert int(data.sphere_centers.values.shape[1]) > 1
    o, d, tm, px, si, in_range = _camera_rays(s, data, static, camera, n)
    ha, hl = camera.half_pixel_size_coeffs()
    hps_abs = jnp.broadcast_to(ha, (n,))
    hps_lin = jnp.broadcast_to(hl, (n,))
    t_max = jnp.full((n,), 2.0 * s.world_radius, jnp.float32)
    hit_ref = intersect.closest_hit(data, static, s, o, d, tm, t_max,
                                    hps_abs, hps_lin, in_range)
    info_ref = intersect.shading_info(data, static, s, hit_ref, o, d, tm,
                                      hps_abs, hps_lin)
    assert intersect_pallas.fused_intersect_ok(s, static, data)
    hit, info = intersect_pallas.closest_hit_shading(
        data, static, s, o, d, hps_abs, hps_lin, in_range, tm)
    np.testing.assert_array_equal(np.asarray(hit.valid),
                                  np.asarray(hit_ref.valid))
    np.testing.assert_array_equal(np.asarray(hit.obj),
                                  np.asarray(hit_ref.obj))
    np.testing.assert_allclose(np.asarray(hit.t), np.asarray(hit_ref.t),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(info.mat),
                                  np.asarray(info_ref.mat))
    np.testing.assert_allclose(np.asarray(info.normal),
                               np.asarray(info_ref.normal),
                               rtol=1e-3, atol=2e-4)


def test_fused_intersect_no_sdf_scene(interpret_fused):
    """spheres_scene (no SDF): the kernel skips the march/tetra normal
    and must match closest_hit + shading_info on the sphere fold."""
    n = 512
    res = (16, 16)
    s = RenderSettings(resolution=res, spp=2, rays_per_pass=n)
    data, static, camera = presets.spheres_scene(resolution=res)
    o, d, tm, px, si, in_range = _camera_rays(s, data, static, camera, n)
    ha, hl = camera.half_pixel_size_coeffs()
    hps_abs = jnp.broadcast_to(ha, (n,))
    hps_lin = jnp.broadcast_to(hl, (n,))
    t_max = jnp.full((n,), 2.0 * s.world_radius, jnp.float32)
    hit_ref = intersect.closest_hit(data, static, s, o, d, tm, t_max,
                                    hps_abs, hps_lin, in_range)
    info_ref = intersect.shading_info(data, static, s, hit_ref, o, d, tm,
                                      hps_abs, hps_lin)
    assert intersect_pallas.fused_intersect_ok(s, static, data)
    hit, info = intersect_pallas.closest_hit_shading(
        data, static, s, o, d, hps_abs, hps_lin, in_range, tm)
    np.testing.assert_array_equal(np.asarray(hit.valid),
                                  np.asarray(hit_ref.valid))
    np.testing.assert_array_equal(np.asarray(hit.obj),
                                  np.asarray(hit_ref.obj))
    np.testing.assert_allclose(np.asarray(hit.t), np.asarray(hit_ref.t),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(info.mat),
                                  np.asarray(info_ref.mat))
    np.testing.assert_allclose(np.asarray(info.normal),
                               np.asarray(info_ref.normal),
                               rtol=1e-4, atol=1e-5)


def test_fused_intersect_render_image(interpret_fused):
    """Whole-frame image comparison with both fused kernels enabled in
    interpret mode vs everything unfused."""
    import jax
    from rayn_tpu.ops import shade_pallas
    from rayn_tpu.render import film as film_mod

    res = (20, 20)
    base = RenderSettings(resolution=res, spp=4, max_marches=48,
                          max_vis_marches=40,
                          rays_per_pass=res[0] * res[1] * 4)
    data, static, camera = presets.default_scene(resolution=res)
    imgs = []
    for fused in (False, True):
        with _patched(shade_pallas, "INTERPRET", fused):
            settings = dataclasses.replace(
                base, use_fused_shadows=fused, use_fused_intersect=fused)
            film = renderer.render_frame(data, static, settings, camera,
                                         frame=1)
            imgs.append(np.asarray(film_mod.resolve(film, res).color))
    rmse = np.sqrt(np.mean((imgs[0] - imgs[1]) ** 2))
    # rare grazing visibility flips + chaotic scatter decorrelation
    # average out over spp (~2e-3 noise floor at 4 spp here); a
    # systematic kernel bug (wrong normals/materials/hits) measures
    # >> 1e-2
    assert rmse < 4e-3, f"fused-vs-unfused image RMSE {rmse}"


class _patched:
    def __init__(self, mod, name, value):
        self.mod, self.name, self.value = mod, name, value

    def __enter__(self):
        self.old = getattr(self.mod, self.name)
        setattr(self.mod, self.name, self.value)

    def __exit__(self, *exc):
        setattr(self.mod, self.name, self.old)
