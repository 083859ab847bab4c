"""BSDF and light sampling tests: statistical unbiasedness (white
furnace) and oracle comparisons (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np

from rayn_tpu.config import RenderSettings
from rayn_tpu.ops import bsdf, lights
from rayn_tpu.scene.scene import SceneBuilder
from rayn_tpu.utils import vecmath

import oracle


def _mat_batch(builder_fn, n):
    b = SceneBuilder()
    mid = builder_fn(b)
    data, static = b.build()
    return bsdf.gather(data.materials, jnp.full((n,), mid, jnp.int32))


def _uniform(n, seed, dims=1):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(0, 1, (n, dims)).astype(np.float32).squeeze())


class TestBsdf:
    def test_lambert_furnace(self):
        # E[f * cos / pdf] over scatter samples = albedo (energy conserved
        # by cosine importance sampling).
        n = 1 << 15
        p = _mat_batch(lambda b: b.add_lambertian((0.6, 0.4, 0.2)), n)
        normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
        wo = jnp.broadcast_to(
            vecmath.normalize(jnp.asarray([0.3, 0.1, 1.0])), (n, 3))
        s = RenderSettings()
        se = bsdf.scatter(p, s, wo, normal, _uniform(n, 0),
                          _uniform(n, 1, 2), _uniform(n, 2, 2))
        cos = jnp.abs(vecmath.dot(se.wi, normal))
        est = np.asarray(se.f * (cos / se.pdf)[:, None]).mean(0)
        np.testing.assert_allclose(est, [0.6, 0.4, 0.2], atol=0.01)

    def test_dielectric_energy_bounded(self):
        n = 1 << 15
        p = _mat_batch(lambda b: b.add_dielectric((0.9, 0.9, 0.9), 0.3), n)
        normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
        wo = jnp.broadcast_to(
            vecmath.normalize(jnp.asarray([0.4, 0.0, 1.0])), (n, 3))
        s = RenderSettings()
        se = bsdf.scatter(p, s, wo, normal, _uniform(n, 3),
                          _uniform(n, 4, 2), _uniform(n, 5, 2))
        cos = jnp.abs(vecmath.dot(se.wi, normal))
        est = np.asarray(se.f * (cos / se.pdf)[:, None]).mean(0)
        assert (est <= 1.05).all() and (est > 0.3).all()
        assert np.isfinite(np.asarray(se.pdf)).all()

    def test_dielectric_f_matches_lobes(self):
        # At normal incidence with wi == wo == n: fresnel = F0, half = n.
        n = 4
        p = _mat_batch(lambda b: b.add_dielectric_power((0.5, 0.5, 0.5), 10.0), n)
        nrm = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
        f = np.asarray(bsdf.eval_f(p, nrm, nrm, nrm))[0]
        spec = 1.0 * (10.0 + 2.0) / (2.0 * np.pi) * bsdf.F0
        diff = 0.5 / np.pi * (1.0 - bsdf.F0)
        np.testing.assert_allclose(f, spec + diff, rtol=1e-5)

    def test_emitted_sky_gradient(self):
        n = 3
        p = _mat_batch(lambda b: b.add_sky((1.0, 0.0, 0.0), (0.0, 0.0, 1.0)), n)
        wo = jnp.asarray([[0.0, 1.0, 0.0], [0.0, -1.0, 0.0], [1.0, 0.0, 0.0]])
        le = np.asarray(bsdf.emitted(p, wo))
        # wo.y=1 -> t=1 -> bottom; wo.y=-1 -> t=0 -> top; wo.y=0 -> mix
        np.testing.assert_allclose(le[0], [0.0, 0.0, 1.0], atol=1e-6)
        np.testing.assert_allclose(le[1], [1.0, 0.0, 0.0], atol=1e-6)
        np.testing.assert_allclose(le[2], [0.5, 0.0, 0.5], atol=1e-6)

    def test_receives_light(self):
        b = SceneBuilder()
        ml = b.add_lambertian((1, 1, 1))
        md = b.add_dielectric((1, 1, 1), 0.5)
        ms = b.add_sky((1, 1, 1), (0, 0, 0))
        me = b.add_emissive((1, 1, 1))
        data, _ = b.build()
        p = bsdf.gather(data.materials, jnp.asarray([ml, md, ms, me]))
        np.testing.assert_array_equal(
            np.asarray(bsdf.receives_light(p)), [True, True, False, False])

    def test_dielectric_remap(self):
        b = SceneBuilder()
        b.add_dielectric((1, 1, 1), 0.6)
        data, _ = b.build()
        # power = 1 + 0.4^4*300 (reference src/material.rs:167-169)
        np.testing.assert_allclose(
            float(data.materials.power[0]), 1.0 + 0.4 ** 4 * 300.0, rtol=1e-6)


class TestLights:
    def test_cone_sample_matches_oracle(self):
        rng = np.random.default_rng(7)
        n = 64
        u = rng.uniform(0, 1, (n, 2)).astype(np.float32)
        lp = np.tile(np.asarray([2.0, 3.0, 1.0], np.float32), (n, 1))
        lr = np.full((n,), 0.5, np.float32)
        p = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
        em = np.ones((n, 3), np.float32)
        pt, li, pdf = lights.sample_cone(
            jnp.asarray(u), jnp.asarray(lp), jnp.asarray(lr), jnp.asarray(p),
            jnp.asarray(em))
        pt, pdf = np.asarray(pt), np.asarray(pdf)
        for i in range(n):
            want_pt, want_pdf = oracle.cone_light_sample(
                u[i, 0], u[i, 1], lp[i], 0.5, p[i])
            np.testing.assert_allclose(pt[i], want_pt, rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(pdf[i], want_pdf, rtol=1e-4)

    def test_cone_sample_on_sphere_surface(self):
        n = 256
        rng = np.random.default_rng(8)
        u = jnp.asarray(rng.uniform(0, 1, (n, 2)).astype(np.float32))
        lp = jnp.broadcast_to(jnp.asarray([0.0, 5.0, 0.0]), (n, 3))
        lr = jnp.full((n,), 0.7)
        p = jnp.zeros((n, 3))
        pt, _, _ = lights.sample_cone(u, lp, lr, p, jnp.ones((n, 3)))
        r = np.linalg.norm(np.asarray(pt) - np.asarray([0.0, 5.0, 0.0]), axis=-1)
        np.testing.assert_allclose(r, 0.7, rtol=1e-3)

    def test_equi_angular_matches_oracle(self):
        rng = np.random.default_rng(9)
        n = 64
        u = rng.uniform(0.01, 0.99, (n,)).astype(np.float32)
        lp = np.tile(np.asarray([1.0, 2.0, 3.0], np.float32), (n, 1))
        ro = np.zeros((n, 3), np.float32)
        rd = np.tile(np.asarray([0.0, 0.0, 1.0], np.float32), (n, 1))
        md = np.full((n,), 10.0, np.float32)
        d, pdf = lights.sample_equi_angular(
            jnp.asarray(u), jnp.asarray(lp), jnp.asarray(ro), jnp.asarray(rd),
            jnp.asarray(md))
        d, pdf = np.asarray(d), np.asarray(pdf)
        for i in range(n):
            wd, wp = oracle.equi_angular_sample(u[i], lp[i], ro[i], rd[i], 10.0)
            np.testing.assert_allclose(d[i], wd, rtol=1e-3, atol=1e-3)
            np.testing.assert_allclose(pdf[i], wp, rtol=1e-3)
        assert (d >= -1e-4).all() and (d <= 10.0 + 1e-3).all()

    def test_equi_angular_pdf_integrates_to_one(self):
        # MC check: E[1/pdf] over u ~ U(0,1) equals the integration length.
        n = 1 << 14
        rng = np.random.default_rng(10)
        u = jnp.asarray(rng.uniform(0, 1, (n,)).astype(np.float32))
        lp = jnp.broadcast_to(jnp.asarray([0.0, 2.0, 5.0]), (n, 3))
        ro = jnp.zeros((n, 3))
        rd = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
        md = jnp.full((n,), 10.0)
        d, pdf = lights.sample_equi_angular(u, lp, ro, rd, md)
        est = float(np.mean(1.0 / np.asarray(pdf)))
        np.testing.assert_allclose(est, 10.0, rtol=0.05)
