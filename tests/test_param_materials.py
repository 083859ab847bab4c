"""Per-shading-point material parameters (SceneBuilder.set_albedo_fn).

The reference's `Material<G: WShadingParamGenerator>` lets BSDF
parameters vary per shading point (src/material.rs:75-83, consumed by
get_bsdf_at :31-38); rayn_tpu expresses it as a jittable
fn(point, normal) -> albedo override on a material id, applied at the
per-lane material gather so BOTH the unfused and fused paths see it."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from rayn_tpu.config import RenderSettings
from rayn_tpu.ops import filters as filter_ops
from rayn_tpu.ops import shade_pallas
from rayn_tpu.render import film as film_mod
from rayn_tpu.render import renderer
from rayn_tpu.render.camera import PinholeCamera
from rayn_tpu.scene.scene import SceneBuilder

import oracle_renderer


def _albedo_jax(p, n):
    """Smooth procedural albedo (smooth so the f32/f64 oracle
    comparison has no discontinuity pixels)."""
    r = 0.5 + 0.4 * jnp.sin(3.0 * p[:, 0])
    g = 0.5 + 0.4 * jnp.sin(3.0 * p[:, 1] + 1.0)
    b = 0.4 + 0.3 * n[:, 2]
    return jnp.stack([r, g, b], axis=-1)


def _albedo_np(p, n):
    return np.array([0.5 + 0.4 * np.sin(3.0 * p[0]),
                     0.5 + 0.4 * np.sin(3.0 * p[1] + 1.0),
                     0.4 + 0.3 * n[2]])


def procedural_scene(resolution=(10, 8)):
    b = SceneBuilder()
    sky = b.add_sky(top=(0.3, 0.4, 0.6),
                    bottom=np.asarray((0.2, 0.3, 0.6), np.float32) * 0.05)
    b.add_sphere((0.0, 0.0, 0.0), 100.0, sky)
    lam = b.add_lambertian((9.9, 9.9, 9.9))  # sentinel, overridden
    b.set_albedo_fn(lam, _albedo_jax)
    b.add_sphere((0.0, -100.5, 0.0), 100.0, lam)
    b.add_sphere((0.0, 0.2, 0.0), 0.7, lam)
    warm = np.asarray((5.0, 4.0, 2.5)) / np.linalg.norm((5.0, 4.0, 2.5))
    b.add_sphere_light((2.0, 2.5, 2.0), 0.4, warm * 30.0)
    camera = PinholeCamera.make(resolution, 60.0, (0.0, 0.8, 3.0),
                                (0.0, 0.0, 0.0), (0.0, 1.0, 0.0))
    data, static = b.build()
    return data, static, camera, lam


def test_static_carries_fns():
    _data, static, _cam, lam = procedural_scene()
    assert static.mat_param_fns == ((lam, _albedo_jax),)


def test_procedural_albedo_matches_oracle():
    res = (10, 8)
    settings = RenderSettings(resolution=res, spp=8, max_bounces=3,
                              rays_per_pass=1 << 10)
    data, static, cam, lam = procedural_scene(res)
    frame = 1
    time_range = (frame / 24.0, frame / 24.0 + 1.0 / 24.0)
    filt = filter_ops.blackman_harris(1.5)
    fis = filter_ops.build_fis_table(filt, settings.filter_table_size)

    film = renderer.render_frame(data, static, settings, cam, frame=frame,
                                 time_range=time_range, filter=filt)
    got = film_mod.resolve(film, res)
    want = oracle_renderer.render_oracle(
        data, static, settings, cam, frame, time_range, fis,
        albedo_fns={lam: _albedo_np})

    def tone(x):
        return np.asarray(x) / (1.0 + np.asarray(x))

    def rmse(a, b):
        return float(np.sqrt(np.mean((np.asarray(a) - np.asarray(b)) ** 2)))

    assert rmse(tone(got.color), tone(want["color"])) < 1e-3
    assert rmse(got.alpha, want["alpha"]) < 1e-3
    assert rmse(got.normal, want["normal"]) < 1e-3
    # the sentinel constant must never leak into the image
    assert np.asarray(got.color).max() < 9.0


def test_procedural_albedo_flows_through_fused(monkeypatch):
    """The override happens at the per-lane material gather, so the
    fused kernels (which take per-lane parameters as inputs) see the
    same values — fused-interpret vs unfused must agree to f32
    association tolerance."""
    monkeypatch.setattr(shade_pallas, "INTERPRET", True)
    res = (10, 8)
    base = RenderSettings(resolution=res, spp=4, max_bounces=2,
                          rays_per_pass=1 << 9,
                          use_fused_shadows=False, use_fused_finish=False,
                          use_fused_bounce_tail=False)
    fused = dataclasses.replace(base, use_fused_shadows=True,
                                use_fused_finish=True,
                                use_fused_bounce_tail=True)
    data, static, cam, _lam = procedural_scene(res)
    frame = 1
    tr = (frame / 24.0, frame / 24.0 + 1.0 / 24.0)
    filt = filter_ops.blackman_harris(1.5)
    a = film_mod.resolve(renderer.render_frame(
        data, static, base, cam, frame=frame, time_range=tr,
        filter=filt), res)
    b = film_mod.resolve(renderer.render_frame(
        data, static, fused, cam, frame=frame, time_range=tr,
        filter=filt), res)
    np.testing.assert_allclose(np.asarray(a.color), np.asarray(b.color),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(a.alpha), np.asarray(b.alpha))
