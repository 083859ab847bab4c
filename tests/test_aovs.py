"""Extensible film AOVs (render/aovs.py + RenderSettings.extra_aovs).

The reference's macro-generated channel system (src/film.rs:25-120)
re-expressed as a registry: adding a channel is one AovSpec, not a
five-file edit. Extras follow the depth-0 convention of Alpha and
WorldNormal (src/integrator.rs:161-169)."""

import dataclasses

import numpy as np
import pytest

from rayn_tpu.config import RenderSettings
from rayn_tpu.ops import filters as filter_ops
from rayn_tpu.render import checkpoint, film as film_mod, renderer
from rayn_tpu.render.camera import PinholeCamera
from rayn_tpu.scene.scene import SceneBuilder

ALBEDO = (0.6, 0.3, 0.2)


def simple_scene(resolution=(16, 12)):
    b = SceneBuilder()
    sky = b.add_sky(top=(0.3, 0.4, 0.6), bottom=(0.01, 0.015, 0.03))
    b.add_sphere((0.0, 0.0, 0.0), 100.0, sky)
    lam = b.add_lambertian(ALBEDO)
    b.add_sphere((0.0, 0.0, 0.0), 1.0, lam)
    warm = np.asarray((5.0, 4.0, 2.5)) / np.linalg.norm((5.0, 4.0, 2.5))
    b.add_sphere_light((2.0, 2.5, 2.0), 0.4, warm * 30.0)
    camera = PinholeCamera.make(resolution, 60.0, (0.0, 0.0, 3.0),
                                (0.0, 0.0, 0.0), (0.0, 1.0, 0.0))
    data, static = b.build()
    return data, static, camera, lam


def _render(settings, data, static, cam):
    filt = filter_ops.blackman_harris(1.5)
    return renderer.render_frame(
        data, static, settings, cam, frame=1,
        time_range=(1 / 24.0, 2 / 24.0), filter=filt)


def test_depth_albedo_aovs():
    res = (16, 12)
    settings = RenderSettings(resolution=res, spp=4, max_bounces=2,
                              rays_per_pass=1 << 10,
                              extra_aovs=("depth", "albedo"))
    data, static, cam, _lam = simple_scene(res)
    film = _render(settings, data, static, cam)
    img = film_mod.resolve(film, res, settings)
    assert set(img.extra) == {"depth", "albedo"}
    depth = img.extra["depth"]
    albedo = img.extra["albedo"]
    assert depth.shape == (res[1], res[0])
    assert albedo.shape == (res[1], res[0], 3)
    # center pixel: camera at z=3 looking at a unit sphere -> depth ~ 2
    cy, cx = res[1] // 2, res[0] // 2
    assert abs(depth[cy, cx] - 2.0) < 0.05
    np.testing.assert_allclose(albedo[cy, cx], ALBEDO, atol=1e-5)
    # sky pixels (non-receiving): zero depth and albedo, alpha 0
    assert depth[0, 0] == 0.0
    np.testing.assert_array_equal(albedo[0, 0], 0.0)
    assert img.alpha[0, 0] == 0.0 and img.alpha[cy, cx] > 0.99


def test_scatter_and_aligned_splats_agree():
    """compact_bounces forces the scatter-splat path; extras must land
    on the same pixels either way (f32 order tolerance)."""
    res = (16, 12)
    base = RenderSettings(resolution=res, spp=4, max_bounces=2,
                          rays_per_pass=1 << 10,
                          extra_aovs=("depth", "position"))
    data, static, cam, _lam = simple_scene(res)
    a = film_mod.resolve(_render(base, data, static, cam), res, base)
    compact = dataclasses.replace(base, compact_bounces=True)
    b = film_mod.resolve(_render(compact, data, static, cam), res, compact)
    np.testing.assert_allclose(a.extra["depth"], b.extra["depth"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(a.extra["position"], b.extra["position"],
                               rtol=1e-5, atol=1e-6)


def test_checkpoint_roundtrip_with_aovs(tmp_path):
    res = (16, 12)
    settings = RenderSettings(resolution=res, spp=4, max_bounces=1,
                              rays_per_pass=1 << 10,
                              extra_aovs=("mat_id",))
    data, static, cam, _lam = simple_scene(res)
    film = _render(settings, data, static, cam)
    path = str(tmp_path / "ck.npz")
    checkpoint.save(path, film, settings, frame=1, next_pass=3,
                    scene=data, time_range=(0.0, 1.0))
    prog = checkpoint.load_progress(path, settings, frame=1, scene=data,
                                    time_range=(0.0, 1.0))
    assert prog is not None
    assert len(prog.film.extra) == 1
    np.testing.assert_array_equal(np.asarray(prog.film.extra[0]),
                                  np.asarray(film.extra[0]))


def test_unknown_aov_fails_loudly():
    res = (8, 6)
    settings = RenderSettings(resolution=res, spp=2, rays_per_pass=256,
                              extra_aovs=("nope",))
    data, static, cam, _lam = simple_scene(res)
    with pytest.raises(ValueError, match="unknown AOV"):
        _render(settings, data, static, cam)


def test_save_channels_writes_extra_pngs(tmp_path):
    res = (16, 12)
    settings = RenderSettings(resolution=res, spp=2, max_bounces=1,
                              rays_per_pass=1 << 10,
                              extra_aovs=("depth", "albedo"))
    data, static, cam, _lam = simple_scene(res)
    img = film_mod.resolve(_render(settings, data, static, cam), res,
                           settings)
    paths = film_mod.save_channels(img, str(tmp_path), "t",
                                   ("color", "depth", "albedo"))
    import os
    assert all(os.path.exists(p) for p in paths)
    assert any(p.endswith("t_depth.png") for p in paths)
    assert any(p.endswith("t_albedo.png") for p in paths)
