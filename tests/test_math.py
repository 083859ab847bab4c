"""Golden-value and property tests for the math substrate (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rayn_tpu.utils import sampling, vecmath


def rand(shape, seed=0, lo=0.0, hi=1.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(lo, hi, shape).astype(np.float32))


class TestVecmath:
    def test_dot_cross_orthogonal(self):
        a = rand((64, 3), 1, -1, 1)
        b = rand((64, 3), 2, -1, 1)
        c = vecmath.cross(a, b)
        np.testing.assert_allclose(vecmath.dot(a, c), 0.0, atol=1e-5)
        np.testing.assert_allclose(vecmath.dot(b, c), 0.0, atol=1e-5)

    def test_normalize_unit(self):
        v = rand((128, 3), 3, -2, 2)
        n = vecmath.normalize(v)
        np.testing.assert_allclose(vecmath.length(n), 1.0, rtol=1e-5)

    def test_reflect_mirror(self):
        # Mirror about n preserves the normal component and negates tangent.
        n = jnp.array([[0.0, 0.0, 1.0]])
        v = vecmath.normalize(jnp.array([[1.0, 0.0, 1.0]]))
        r = vecmath.reflect(v, n)
        np.testing.assert_allclose(
            np.asarray(r), [[-v[0, 0], 0.0, v[0, 2]]], atol=1e-6)
        # |r| = |v| and r.n = v.n
        np.testing.assert_allclose(vecmath.length(r), 1.0, atol=1e-6)

    def test_orthonormal_basis(self):
        n = vecmath.normalize(rand((256, 3), 4, -1, 1))
        uu, vv = vecmath.orthonormal_basis(n)
        np.testing.assert_allclose(vecmath.length(uu), 1.0, atol=1e-5)
        np.testing.assert_allclose(vecmath.length(vv), 1.0, atol=1e-5)
        np.testing.assert_allclose(vecmath.dot(uu, vv), 0.0, atol=1e-5)
        np.testing.assert_allclose(vecmath.dot(uu, n), 0.0, atol=1e-5)
        np.testing.assert_allclose(vecmath.dot(vv, n), 0.0, atol=1e-5)
        # right-handed: uu x vv = n
        np.testing.assert_allclose(
            np.asarray(vecmath.cross(uu, vv)), np.asarray(n), atol=1e-5)

    def test_basis_transform_roundtrip(self):
        n = vecmath.normalize(rand((32, 3), 5, -1, 1))
        uu, vv = vecmath.orthonormal_basis(n)
        # local z maps to n
        z = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (32, 3))
        w = vecmath.basis_transform(uu, vv, n, z)
        np.testing.assert_allclose(np.asarray(w), np.asarray(n), atol=1e-6)


class TestWarps:
    def test_concentric_disk_in_disk_and_area_preserving(self):
        u = rand((4096,), 6)
        v = rand((4096,), 7)
        p = sampling.concentric_disk(u, v)
        r2 = np.asarray(jnp.sum(p * p, axis=-1))
        assert (r2 <= 1.0 + 1e-6).all()
        # area preservation: fraction inside r<0.5 disk ~ 0.25
        frac = (r2 < 0.25).mean()
        assert abs(frac - 0.25) < 0.03

    def test_concentric_disk_zero_guard(self):
        p = sampling.concentric_disk(jnp.array([0.5]), jnp.array([0.5]))
        assert np.isfinite(np.asarray(p)).all()

    def test_cosine_hemisphere_pdf(self):
        # MC estimate of E[1] under cos-weighted pdf: integral of
        # (z/pi) over hemisphere = 1, so mean of pi/z * (z/pi) = 1 trivially;
        # instead check E[z] = integral z * z/pi = 2/3... do the white
        # furnace: estimate integral of cos/pi via uniform-pdf comparison.
        u = rand((1 << 16,), 8)
        v = rand((1 << 16,), 9)
        d = sampling.cosine_hemisphere(u, v)
        z = np.asarray(d[..., 2])
        assert (z >= -1e-6).all()
        # E[z] under pdf z/pi over hemisphere = int z * (z/pi) dω =
        # (1/pi) int cos^2 dω = (1/pi)(2pi/3)... = 2/3? int cos^2 over
        # hemisphere = 2pi/3 -> E[z] = 2/3.
        assert abs(z.mean() - 2.0 / 3.0) < 5e-3

    def test_cosine_power_hemisphere_stats(self):
        power = 20.0
        u = rand((1 << 16,), 10)
        v = rand((1 << 16,), 11)
        d = sampling.cosine_power_hemisphere(u, v, jnp.float32(power))
        z = np.asarray(d[..., 2])
        # E[z] under pdf (p+1)/(2pi) z^p = (p+1)/(p+2)
        assert abs(z.mean() - (power + 1.0) / (power + 2.0)) < 2e-3
        # azimuth covers the full circle (regression for the reference's
        # 2*u quirk, src/math.rs:111)
        phi = np.arctan2(np.asarray(d[..., 1]), np.asarray(d[..., 0]))
        assert phi.max() > 3.0 and phi.min() < -3.0

    def test_cosine_power_compat_phi_quirk(self):
        u = rand((4096,), 12)
        v = rand((4096,), 13)
        d = sampling.cosine_power_hemisphere(
            u, v, jnp.float32(8.0), compat_phi=True)
        phi = np.arctan2(np.asarray(d[..., 1]), np.asarray(d[..., 0]))
        assert phi.max() <= 2.0 + 1e-3 and phi.min() >= -1e-3

    def test_uniform_sphere(self):
        u = rand((1 << 16,), 14)
        v = rand((1 << 16,), 15)
        d = np.asarray(sampling.uniform_sphere(u, v))
        np.testing.assert_allclose(
            np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
        assert np.abs(d.mean(0)).max() < 0.02

    def test_schlick(self):
        np.testing.assert_allclose(
            float(sampling.f_schlick(jnp.float32(1.0), 0.04)), 0.04, atol=1e-7)
        np.testing.assert_allclose(
            float(sampling.f_schlick(jnp.float32(0.0), 0.04)), 1.0, atol=1e-6)

    def test_cone_pdf_integrates_to_one(self):
        # Uniform directions in cone with pdf 1/(2pi(1-cos_max)):
        # solid angle of cone = 2pi(1-cos_max) -> pdf * solid angle = 1.
        cos_max = jnp.float32(0.9)
        pdf = float(sampling.uniform_cone_pdf(cos_max))
        solid_angle = 2.0 * np.pi * (1.0 - 0.9)
        np.testing.assert_allclose(pdf * solid_angle, 1.0, rtol=1e-6)

    def test_power_heuristic(self):
        w = float(sampling.power_heuristic(1, jnp.float32(1.0), 1, jnp.float32(1.0)))
        np.testing.assert_allclose(w, 0.5)


def test_jit_compatible():
    @jax.jit
    def f(u, v, n):
        d = sampling.cosine_hemisphere(u, v)
        uu, vv = vecmath.orthonormal_basis(n)
        return vecmath.basis_transform(uu, vv, n, d)

    out = f(rand((8,), 0), rand((8,), 1),
            vecmath.normalize(rand((8, 3), 2, -1, 1)))
    assert out.shape == (8, 3)
    assert np.isfinite(np.asarray(out)).all()
