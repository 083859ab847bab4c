"""SDF, sphere intersection, and march tests vs the scalar oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from rayn_tpu.config import RenderSettings
from rayn_tpu.ops import intersect, march, sdf, spheres
from rayn_tpu.scene import presets
from rayn_tpu.utils import vecmath

import oracle


class TestMandelBox:
    def test_de_matches_oracle(self):
        prog = sdf.mandelbox(12, 1.0, 0.01, 1.9, -2.1)
        rng = np.random.default_rng(0)
        pts = rng.uniform(-3, 3, (64, 3)).astype(np.float32)
        got = np.asarray(prog.dist(jnp.asarray(pts)))
        want = np.array([oracle.mandelbox_dist(p) for p in pts])
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-5)

    def test_de_is_conservative_near_surface(self):
        # Sphere-tracing soundness: DE at p should not exceed true distance
        # to the zero set along a ray (statistically: marching from DE
        # never crosses sign in one step). Sample points and verify
        # |DE(p + DE(p)*d)| sign behavior is sane (no NaNs, finite).
        prog = sdf.mandelbox(12, 1.0, 0.01, 1.9, -2.1)
        rng = np.random.default_rng(1)
        p = jnp.asarray(rng.uniform(-2, 2, (256, 3)).astype(np.float32))
        d = np.asarray(prog.dist(p))
        assert np.isfinite(d).all()

    def test_primitives_and_combinators(self):
        s = sdf.sphere(1.0)
        p = jnp.asarray([[2.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
        np.testing.assert_allclose(np.asarray(s.dist(p)), [1.0, -1.0], atol=1e-6)

        bx = sdf.box((1.0, 1.0, 1.0))
        np.testing.assert_allclose(
            np.asarray(bx.dist(jnp.asarray([[0.0, 0.0, 2.0]]))), [1.0], atol=1e-6)

        u = sdf.union(s, sdf.translate(sdf.sphere(1.0), (4.0, 0.0, 0.0)))
        np.testing.assert_allclose(
            np.asarray(u.dist(jnp.asarray([[2.5, 0.0, 0.0]]))), [0.5], atol=1e-6)

        sub = sdf.subtraction(sdf.sphere(1.0), sdf.sphere(0.5))
        assert float(sub.dist(jnp.asarray([[0.0, 0.0, 0.0]]))[0]) >= 0.0

        sc = sdf.scale(sdf.sphere(1.0), 2.0)
        np.testing.assert_allclose(
            np.asarray(sc.dist(jnp.asarray([[3.0, 0.0, 0.0]]))), [1.0], atol=1e-6)

    def test_tetrahedral_normal_on_sphere(self):
        s = sdf.sphere(1.0)
        rng = np.random.default_rng(2)
        d = rng.normal(size=(32, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        p = jnp.asarray(d.astype(np.float32))
        n = np.asarray(sdf.tetrahedral_normal(s, p, jnp.full((32,), 1e-3)))
        np.testing.assert_allclose(n, d, atol=5e-3)


class TestSpheres:
    def test_hit_matches_oracle(self):
        rng = np.random.default_rng(3)
        o = rng.uniform(-3, 3, (32, 3)).astype(np.float32)
        d = rng.normal(size=(32, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        centers = rng.uniform(-2, 2, (4, 3)).astype(np.float32)
        radii = rng.uniform(0.3, 1.5, (4,)).astype(np.float32)
        t_max = np.full((32,), 100.0, np.float32)

        ts = np.asarray(spheres.hit(
            jnp.asarray(o), jnp.asarray(d),
            jnp.broadcast_to(jnp.asarray(centers), (32, 4, 3)),
            jnp.asarray(radii), jnp.asarray(t_max)))
        for i in range(32):
            for k in range(4):
                want = oracle.sphere_hit(o[i], d[i], centers[k], radii[k], 100.0)
                if want is None:
                    assert ts[i, k] > 1e30
                else:
                    np.testing.assert_allclose(ts[i, k], want, rtol=2e-4,
                                               atol=2e-4)

    def test_occlusion_blocked_and_clear(self):
        start = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
        end = jnp.asarray([[0.0, 0.0, 10.0], [0.0, 10.0, 0.0]])
        centers = jnp.broadcast_to(
            jnp.asarray([[0.0, 0.0, 5.0]]), (2, 1, 3))
        radii = jnp.asarray([1.0])
        occ = np.asarray(spheres.occluded(start, end, centers, radii))
        assert occ[0, 0] and not occ[1, 0]

    def test_inside_sphere_hits_far_root(self):
        # Ray from the center of a sphere must hit the far root (the sky
        # dome case: reference src/setup.rs:71).
        o = jnp.zeros((1, 3))
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        centers = jnp.zeros((1, 1, 3))
        t = np.asarray(spheres.hit(o, d, centers, jnp.asarray([5.0]),
                                   jnp.asarray([100.0])))
        np.testing.assert_allclose(t[0, 0], 5.0, rtol=1e-5)


class TestMarch:
    def test_march_sphere_matches_oracle(self):
        prog = sdf.sphere(1.0)

        def dist_fn(p):
            return float(np.linalg.norm(p) - 1.0)

        o = np.array([[0.0, 0.0, 3.0], [0.0, 3.0, 0.0], [0.0, 0.0, -5.0]],
                     np.float32)
        d = np.array([[0.0, 0.0, -1.0], [0.0, -1.0, 0.0], [0.0, 0.0, -1.0]],
                     np.float32)
        t_max = np.full((3,), 50.0, np.float32)
        t = np.asarray(march.march(
            prog, jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_max),
            eps_const=1e-4, eps_abs=jnp.zeros(3), eps_lin=jnp.zeros(3),
            max_steps=128, active=jnp.ones(3, bool)))
        for i in range(3):
            want = oracle.sphere_march(dist_fn, o[i], d[i], 50.0, 1e-4,
                                       0.0, 0.0, 128)
            np.testing.assert_allclose(t[i], want, rtol=1e-4, atol=1e-4)
        # rays 0,1 hit at ~2.0; ray 2 points away and marches past t_max
        assert abs(t[0] - 2.0) < 1e-2 and abs(t[1] - 2.0) < 1e-2
        assert t[2] > 50.0

    def test_march_mandelbox_vs_oracle(self):
        prog = sdf.mandelbox(12, 1.0, 0.01, 1.9, -2.1)
        o = np.array([[0.0, 0.0, 6.0], [2.0, 1.5, 6.0]], np.float32)
        tgt = np.zeros((2, 3), np.float32)
        d = tgt - o
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        t = np.asarray(march.march(
            prog, jnp.asarray(o), jnp.asarray(d), jnp.full((2,), 200.0),
            eps_const=2.5e-5, eps_abs=jnp.zeros(2),
            eps_lin=jnp.full((2,), 2.5e-4), max_steps=256,
            active=jnp.ones(2, bool)))

        def dist_fn(p):
            return oracle.mandelbox_dist(p)

        for i in range(2):
            want = oracle.sphere_march(dist_fn, o[i], d[i], 200.0, 2.5e-5,
                                       0.0, 2.5e-4, 256)
            np.testing.assert_allclose(t[i], want, rtol=5e-3, atol=5e-3)

    def test_occlusion_march(self):
        prog = sdf.sphere(1.0)
        start = jnp.asarray([[0.0, 0.0, 3.0], [0.0, 3.0, 3.0]])
        end = jnp.asarray([[0.0, 0.0, -3.0], [3.0, 3.0, 3.0]])
        occ = np.asarray(march.march_occlusion(
            prog, start, end, detail_scale=0.5, max_steps=100,
            active=jnp.ones(2, bool)))
        assert occ[0] and not occ[1]

    def test_occlusion_inactive_lanes_clear(self):
        prog = sdf.sphere(1.0)
        start = jnp.asarray([[0.0, 0.0, 3.0]])
        end = jnp.asarray([[0.0, 0.0, -3.0]])
        occ = np.asarray(march.march_occlusion(
            prog, start, end, 0.5, 100, active=jnp.zeros(1, bool)))
        assert not occ[0]


class TestSceneIntersect:
    def test_default_scene_closest_hit(self):
        data, static, camera = presets.default_scene(resolution=(32, 32))
        settings = RenderSettings(resolution=(32, 32), spp=1, max_marches=256)
        n = 4
        o = jnp.broadcast_to(jnp.asarray([-1.0125, 0.45, 4.5]), (n, 3))
        targets = jnp.asarray([
            [0.0, 0.0, 0.0],     # at the fractal
            [0.0, 0.0, 0.0],
            [0.0, 50.0, 80.0],   # off into the sky
            [1.2, -1.2, 1.2],    # at a light sphere
        ])
        d = vecmath.normalize(targets - o + jnp.asarray(
            [[0.0, 0.0, 0.0], [0.05, 0.02, 0.0], [0.0, 0.0, 0.0],
             [0.0, 0.0, 0.0]]))
        time = jnp.zeros(n)
        hit = intersect.closest_hit(
            data, static, settings, o, d, time,
            jnp.full((n,), 200.0), jnp.zeros(n),
            jnp.full((n,), 1e-3), jnp.ones(n, bool))
        objs = np.asarray(hit.obj)
        assert objs[2] == 0  # sky sphere is object 0
        assert objs[3] in (2, static.n_spheres)  # light-pair sphere or sdf
        assert np.asarray(hit.valid).all()
        info = intersect.shading_info(
            data, static, settings, hit, o, d, time, jnp.zeros(n),
            jnp.full((n,), 1e-3))
        assert np.isfinite(np.asarray(info.point)).all()
        mats = np.asarray(info.mat)
        assert mats[2] == 0  # sky material

    def test_occlusion_center_light_blocked_by_emissive_sphere(self):
        data, static, camera = presets.default_scene(resolution=(32, 32))
        settings = RenderSettings(resolution=(32, 32), spp=1)
        # Segment from far outside to the scene center: the emissive
        # sphere at origin (r=0.24) blocks it.
        start = jnp.asarray([[0.0, 0.0, 50.0], [0.0, 0.0, 50.0]])
        end = jnp.asarray([[0.0, 0.0, -50.0], [0.0, 40.0, 49.0]])
        vis = np.asarray(intersect.test_occluded(
            data, static, settings, start, end, jnp.zeros(2),
            jnp.ones(2, bool)))
        assert vis[0] == 0.0 and vis[1] == 1.0
