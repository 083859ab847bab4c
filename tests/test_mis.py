"""MIS (NEE <-> BSDF power-heuristic weighting) tests.

The reference leaves `power_heuristic` dead (reference src/math.rs:193-199)
and double-counts co-located light/emissive pairs by construction
(src/setup.rs:107-122). With RenderSettings.mis=True a paired emitter is
counted once: these tests check the weights are complementary, the
double count disappears, and a lights-only render (no paired emitter)
is untouched.
"""

import numpy as np
import jax.numpy as jnp

from rayn_tpu.config import RenderSettings
from rayn_tpu.render import film as film_mod, renderer
from rayn_tpu.scene.scene import SceneBuilder
from rayn_tpu.render.camera import PinholeCamera
from rayn_tpu.utils import sampling

RES = (32, 24)
E = np.asarray((4.0, 4.0, 4.0), np.float32)
LIGHT_POS = (0.0, 1.5, 0.0)
LIGHT_R = 0.5


def build_scene(with_emissive: bool, pair_radius: float = LIGHT_R - 1e-3):
    b = SceneBuilder()
    sky = b.add_sky((0.0, 0.0, 0.0), (0.0, 0.0, 0.0))  # black: escaped = 0
    b.add_sphere((0.0, 0.0, 0.0), 100.0, sky)
    floor = b.add_lambertian((0.8, 0.8, 0.8))
    b.add_sphere((0.0, -100.5, 0.0), 100.0, floor)
    b.add_sphere_light(LIGHT_POS, LIGHT_R, E)
    if with_emissive:
        em = b.add_emissive(E)
        b.add_sphere(LIGHT_POS, pair_radius, em)
    data, static = b.build()
    camera = PinholeCamera.make(RES, 60.0, (0.0, 1.2, 4.0),
                                (0.0, 0.0, 0.0), (0.0, 1.0, 0.0))
    return data, static, camera


def settings(mis: bool, spp: int = 128) -> RenderSettings:
    return RenderSettings(resolution=RES, spp=spp, max_bounces=2,
                          volume_marches=1, max_marches=8,
                          max_vis_marches=8, rays_per_pass=1 << 14,
                          mis=mis)


def color_mean(data, static, s, cam) -> float:
    film = renderer.render_frame(data, static, s, cam, frame=1)
    res = film_mod.resolve(film, RES)
    col = np.asarray(res.color)
    assert np.isfinite(col).all()
    return float(col.mean())


def test_power_heuristic_weights_are_complementary():
    p = jnp.asarray([0.1, 1.0, 17.0, 300.0])
    q = jnp.asarray([2.0, 1.0, 0.05, 300.0])
    w_l = sampling.power_heuristic(4.0, q, 1.0, p)
    w_b = sampling.power_heuristic(1.0, p, 4.0, q)
    np.testing.assert_allclose(np.asarray(w_l + w_b), 1.0, atol=1e-6)


def test_auto_pairing_detects_colocated_emitter():
    data, static, _ = build_scene(with_emissive=True)
    sphere_light = np.asarray(data.sphere_light)
    # spheres: sky(0), floor(1), emissive(2); lights: the one light (0)
    assert sphere_light.tolist() == [-1, -1, 0]
    assert np.asarray(data.light_paired).tolist() == [1.0]


def test_mis_removes_colocated_double_count():
    s_ref = settings(mis=False)
    data_l, static_l, cam = build_scene(with_emissive=False)
    ref = color_mean(data_l, static_l, s_ref, cam)  # NEE-only, unbiased

    data_p, static_p, _ = build_scene(with_emissive=True)
    dbl = color_mean(data_p, static_p, settings(mis=False), cam)
    mis = color_mean(data_p, static_p, settings(mis=True), cam)

    # Without MIS the paired emitter is counted by both strategies.
    assert dbl > 1.25 * ref, (dbl, ref)
    # With MIS the pair is counted once: matches the lights-only render
    # up to MC noise (different estimator mix, same expectation).
    assert abs(mis - ref) / ref < 0.05, (mis, ref)


def test_mis_leaves_unpaired_lights_untouched():
    """A scene with no paired emitter renders identically with mis on/off
    (weights only ever apply to paired lights/spheres)."""
    data, static, cam = build_scene(with_emissive=False)
    s_off = settings(mis=False, spp=16)
    s_on = settings(mis=True, spp=16)
    a = renderer.render_frame(data, static, s_off, cam, frame=1)
    b = renderer.render_frame(data, static, s_on, cam, frame=1)
    np.testing.assert_array_equal(np.asarray(a.color), np.asarray(b.color))
