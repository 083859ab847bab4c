"""Metallic / Refractive BSDFs (working versions of the reference's
commented-out stubs, src/material.rs:259-392)."""

import jax.numpy as jnp
import numpy as np

from rayn_tpu.config import RenderSettings
from rayn_tpu.ops import bsdf
from rayn_tpu.render import film as film_mod, renderer
from rayn_tpu.render.camera import PinholeCamera
from rayn_tpu.scene.scene import SceneBuilder
from rayn_tpu.utils import vecmath


def _mat(builder_fn, n):
    b = SceneBuilder()
    mid = builder_fn(b)
    data, _ = b.build()
    return bsdf.gather(data.materials, jnp.full((n,), mid, jnp.int32))


def _u(n, seed, dims=None):
    rng = np.random.default_rng(seed)
    shape = (n,) if dims is None else (n, dims)
    return jnp.asarray(rng.uniform(0, 1, shape).astype(np.float32))


class TestMetallic:
    def test_energy_bounded_and_mirror_concentrated(self):
        n = 1 << 14
        p = _mat(lambda b: b.add_metallic((0.9, 0.6, 0.2), 0.1), n)
        normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
        wo = jnp.broadcast_to(
            vecmath.normalize(jnp.asarray([1.0, 0.0, 1.0])), (n, 3))
        s = RenderSettings()
        se = bsdf.scatter(p, s, wo, normal, _u(n, 0), _u(n, 1, 2), _u(n, 2, 2))
        cosv = jnp.abs(vecmath.dot(se.wi, normal))
        est = np.asarray(se.f * (cosv / se.pdf)[:, None])
        est = est[np.isfinite(est).all(axis=1)].mean(0)
        # colored, energy below ~F0*(p+2)/(p+1), above ~half of F0
        assert (est < 1.3).all()
        assert est[0] > est[2]  # keeps the F0 color ordering
        # lobe concentrated around the mirror direction
        mirror = np.asarray(vecmath.reflect(wo[:1], normal[:1]))[0]
        d = np.asarray(se.wi) @ mirror
        assert np.median(d) > 0.9

    def test_receives_light(self):
        p = _mat(lambda b: b.add_metallic((0.9, 0.9, 0.9), 0.5), 1)
        assert bool(bsdf.receives_light(p)[0])


class TestRefractive:
    def test_throughput_equals_color(self):
        # With the lobe importance-sampled exactly, f*cos/pdf == color.
        n = 1 << 12
        p = _mat(lambda b: b.add_refractive((0.8, 0.9, 1.0), 0.0, 1.5), n)
        normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
        wo = jnp.broadcast_to(
            vecmath.normalize(jnp.asarray([0.3, 0.0, 1.0])), (n, 3))
        s = RenderSettings()
        se = bsdf.scatter(p, s, wo, normal, _u(n, 3), _u(n, 4, 2), _u(n, 5, 2))
        factor = np.asarray(se.f * (jnp.abs(vecmath.dot(se.wi, normal))
                                    / se.pdf)[:, None])
        ok = np.isfinite(factor).all(axis=1)
        # each lane is either the reflect branch (1,1,1) or refract color
        for row in factor[ok][:256]:
            assert (np.allclose(row, 1.0, atol=1e-3)
                    or np.allclose(row, [0.8, 0.9, 1.0], atol=1e-3))

    def test_refraction_bends_into_surface(self):
        n = 1 << 12
        p = _mat(lambda b: b.add_refractive((1.0, 1.0, 1.0), 0.0, 1.5), n)
        normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
        wo = jnp.broadcast_to(
            vecmath.normalize(jnp.asarray([0.5, 0.0, 1.0])), (n, 3))
        s = RenderSettings()
        se = bsdf.scatter(p, s, wo, normal, _u(n, 6), _u(n, 7, 2), _u(n, 8, 2))
        z = np.asarray(se.wi[:, 2])
        # most lanes refract (fresnel ~ a few %): wi points below surface
        assert (z < 0).mean() > 0.8

    def test_render_with_glass_sphere(self):
        s = RenderSettings(resolution=(24, 16), spp=4, max_bounces=3,
                           rays_per_pass=1 << 11)
        b = SceneBuilder()
        sky = b.add_sky((0.6, 0.7, 0.9), (0.1, 0.1, 0.2))
        b.add_sphere((0, 0, 0), 50.0, sky)
        glass = b.add_refractive((0.9, 0.95, 1.0), 0.0, 1.5)
        b.add_sphere((0.0, 0.0, 0.0), 0.7, glass)
        metal = b.add_metallic((0.9, 0.7, 0.3), 0.2)
        b.add_sphere((1.5, 0.0, 0.0), 0.5, metal)
        b.add_sphere_light((0, 3, 3), 0.5, (25.0, 25.0, 25.0))
        data, static = b.build()
        cam = PinholeCamera.make((24, 16), 50.0, (0, 0.4, 4), (0, 0, 0),
                                 (0, 1, 0))
        res = film_mod.resolve(
            renderer.render_frame(data, static, s, cam, 1), (24, 16))
        assert np.isfinite(res.color).all()
        assert res.alpha.mean() > 0.1
        assert res.color.mean() > 1e-3
