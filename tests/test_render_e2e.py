"""End-to-end render tests (small frames, CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rayn_tpu.config import RenderSettings
from rayn_tpu.render import film as film_mod
from rayn_tpu.render import renderer
from rayn_tpu.scene import presets
from rayn_tpu.scene.scene import SceneBuilder
from rayn_tpu.render.camera import PinholeCamera, OrthographicCamera


def tiny_settings(**kw):
    defaults = dict(resolution=(32, 24), spp=4, max_bounces=2,
                    volume_marches=1, max_marches=48, max_vis_marches=24,
                    rays_per_pass=1 << 12)
    defaults.update(kw)
    return RenderSettings(**defaults)


class TestSpheresScene:
    def test_render_finite_and_plausible(self):
        s = tiny_settings()
        data, static, cam = presets.spheres_scene(resolution=s.resolution)
        f = renderer.render_frame(data, static, s, cam, frame=1)
        res = film_mod.resolve(f, s.resolution)
        assert np.isfinite(res.color).all()
        assert np.isfinite(res.background).all()
        assert 0.0 <= res.alpha.min() and res.alpha.max() <= 1.0
        # sky visible above, floor visible below
        assert res.background.mean() > 0.001
        assert res.alpha.mean() > 0.2
        # normals are unit-ish where alpha ~ 1 (averaging samples across a
        # silhouette shortens the mean normal, so check the median and cap)
        mask = res.alpha > 0.99
        if mask.any():
            norms = np.linalg.norm(res.normal[mask], axis=-1)
            assert norms.max() <= 1.0 + 1e-4
            assert abs(np.median(norms) - 1.0) < 0.05

    def test_deterministic(self):
        s = tiny_settings(resolution=(16, 12), spp=2)
        data, static, cam = presets.spheres_scene(resolution=s.resolution)
        a = film_mod.resolve(renderer.render_frame(data, static, s, cam, 1),
                             s.resolution)
        b = film_mod.resolve(renderer.render_frame(data, static, s, cam, 1),
                             s.resolution)
        np.testing.assert_array_equal(a.color, b.color)

    def test_pass_splitting_invariant(self):
        # Rendering in 1 pass vs many passes must give identical films.
        data, static, cam = presets.spheres_scene(resolution=(16, 12))
        s1 = tiny_settings(resolution=(16, 12), spp=2, rays_per_pass=16 * 12 * 2)
        s2 = tiny_settings(resolution=(16, 12), spp=2, rays_per_pass=128)
        a = film_mod.resolve(renderer.render_frame(data, static, s1, cam, 1),
                             (16, 12))
        b = film_mod.resolve(renderer.render_frame(data, static, s2, cam, 1),
                             (16, 12))
        np.testing.assert_allclose(a.color, b.color, atol=1e-5)
        np.testing.assert_allclose(a.alpha, b.alpha, atol=1e-6)

    def test_hash_sampler_renders(self):
        s = tiny_settings(resolution=(16, 12), spp=2, sampler="hash")
        data, static, cam = presets.spheres_scene(resolution=(16, 12))
        res = film_mod.resolve(renderer.render_frame(data, static, s, cam, 1),
                               (16, 12))
        assert np.isfinite(res.color).all()
        assert res.alpha.mean() > 0.2


class TestFractalScene:
    def test_render_default_scene(self):
        s = tiny_settings()
        data, static, cam = presets.default_scene(resolution=s.resolution)
        f = renderer.render_frame(data, static, s, cam, frame=1)
        res = film_mod.resolve(f, s.resolution)
        assert np.isfinite(res.color).all()
        assert res.alpha.mean() > 0.1           # fractal covers the view
        assert res.color.mean() > 1e-4          # lights contribute

    def test_volume_off_is_brighter_surface_darker_glow(self):
        s = tiny_settings()
        data_v, static_v, cam = presets.default_scene(resolution=s.resolution)
        data_nv, static_nv, _ = presets.default_scene(
            resolution=s.resolution, volume=False)
        rv = film_mod.resolve(
            renderer.render_frame(data_v, static_v, s, cam, 1), s.resolution)
        rn = film_mod.resolve(
            renderer.render_frame(data_nv, static_nv, s, cam, 1), s.resolution)
        # both render finite; with volume there is in-scattering glow in
        # pixels that see only sky (background-only pixels get Color too)
        assert np.isfinite(rv.color).all() and np.isfinite(rn.color).all()
        assert not np.allclose(rv.color, rn.color)


class TestCameras:
    def test_orthographic(self):
        s = tiny_settings(resolution=(16, 12), spp=2)
        b = SceneBuilder()
        sky = b.add_sky((0.5, 0.5, 0.8), (0.1, 0.1, 0.1))
        b.add_sphere((0, 0, 0), 50.0, sky)
        lam = b.add_lambertian((0.8, 0.2, 0.2))
        b.add_sphere((0, 0, 0), 1.0, lam)
        b.add_sphere_light((0, 3, 3), 0.5, (20.0, 20.0, 20.0))
        data, static = b.build()
        cam = OrthographicCamera.make((16, 12), 4.0, (0, 0, 5), (0, 0, 0),
                                      (0, 1, 0))
        res = film_mod.resolve(renderer.render_frame(data, static, s, cam, 1),
                               (16, 12))
        assert np.isfinite(res.color).all()
        # the unit sphere occupies the center ~ r=1 of a 4-unit-tall frame
        assert res.alpha[6, 8] > 0.9
        assert res.alpha[0, 0] < 0.1

    def test_thinlens_dof(self):
        from rayn_tpu.render.camera import ThinLensCamera
        s = tiny_settings(resolution=(24, 16), spp=8)
        b = SceneBuilder()
        sky = b.add_sky((0.6, 0.6, 0.6), (0.2, 0.2, 0.2))
        b.add_sphere((0, 0, 0), 60.0, sky)
        lam = b.add_lambertian((0.9, 0.1, 0.1))
        b.add_sphere((0.0, 0.0, 0.0), 0.5, lam)      # in focus
        b.add_sphere((-1.2, 0.0, -6.0), 0.5, lam)    # far, defocused
        b.add_sphere_light((2, 3, 3), 0.5, (30.0, 30.0, 30.0))
        data, static = b.build()
        cam_sharp = ThinLensCamera.make((24, 16), 45.0, 0.0, (0, 0, 4),
                                        (0, 0, 0), (0, 1, 0), (0, 0, 0))
        cam_dof = ThinLensCamera.make((24, 16), 45.0, 0.35, (0, 0, 4),
                                      (0, 0, 0), (0, 1, 0), (0, 0, 0))
        a = film_mod.resolve(
            renderer.render_frame(data, static, s, cam_sharp, 1), (24, 16))
        d = film_mod.resolve(
            renderer.render_frame(data, static, s, cam_dof, 1), (24, 16))
        assert np.isfinite(a.color).all() and np.isfinite(d.color).all()
        # aperture=0 reduces to pinhole-like sharpness: the in-focus
        # sphere's alpha coverage should be (nearly) identical, while the
        # defocused rendering overall differs
        assert not np.allclose(a.alpha, d.alpha)


class TestMotionBlur:
    def test_animated_sphere_blurs(self):
        s = tiny_settings(resolution=(24, 16), spp=16, max_bounces=0)
        from rayn_tpu.scene.animation import AnimChannel

        def build(moving):
            b = SceneBuilder()
            sky = b.add_sky((0.1, 0.1, 0.1), (0.1, 0.1, 0.1))
            b.add_sphere((0, 0, 0), 60.0, sky)
            lam = b.add_lambertian((0.9, 0.9, 0.9))
            if moving:
                ch = AnimChannel.keyframes(
                    [0.0, 1.0], [[-1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
                b.add_sphere(ch, 0.5, lam)
            else:
                b.add_sphere((0.0, 0.0, 0.0), 0.5, lam)
            b.add_sphere_light((0, 4, 4), 0.7, (30.0, 30.0, 30.0))
            return b.build()

        cam = PinholeCamera.make((24, 16), 50.0, (0, 0, 4), (0, 0, 0),
                                 (0, 1, 0))
        data_m, static_m = build(True)
        data_s, static_s = build(False)
        rm = film_mod.resolve(
            renderer.render_frame(data_m, static_m, s, cam, 1,
                                  time_range=(0.0, 1.0)), (24, 16))
        rs = film_mod.resolve(
            renderer.render_frame(data_s, static_s, s, cam, 1,
                                  time_range=(0.0, 1.0)), (24, 16))
        # moving sphere smears alpha across more pixels than static
        assert (rm.alpha > 0.05).sum() > (rs.alpha > 0.05).sum() * 1.5


class TestNoLights:
    def test_scene_without_lights_renders(self):
        # NEE and volume scattering must vanish cleanly when the scene has
        # no lights (reference guards on lights.len() > 0,
        # src/integrator.rs:73).
        s = tiny_settings(resolution=(16, 12), spp=2)
        b = SceneBuilder()
        sky = b.add_sky((0.5, 0.6, 0.9), (0.1, 0.1, 0.1))
        b.add_sphere((0, 0, 0), 50.0, sky)
        lam = b.add_lambertian((0.7, 0.7, 0.7))
        b.add_sphere((0, 0, 0), 1.0, lam)
        b.set_volume(0.25, 0.035)
        data, static = b.build()
        cam = PinholeCamera.make((16, 12), 50.0, (0, 0, 4), (0, 0, 0),
                                 (0, 1, 0))
        res = film_mod.resolve(
            renderer.render_frame(data, static, s, cam, 1), (16, 12))
        assert np.isfinite(res.color).all()
        assert res.alpha.mean() > 0.05
        # sky still reaches bounce rays -> some indirect light
        assert res.color.sum() > 0
