"""Several traced-SDF instances per scene, each with its own material.

The reference's HitableStore is a Vec of trait objects that can hold any
number of TracedSDFs (reference src/hitable.rs:143-161); closest hit is
a fold over all of them keeping the per-lane nearest (src/hitable.rs:
170-210) and occlusion is a product fold (src/hitable.rs:163-168).
rayn_tpu expresses this as SceneBuilder.add_sdf instances: ANY
instance count runs the fused Pallas kernel family (in-kernel
closest/occlusion folds, per-instance scalar params in SMEM); only
instances without a component-form fn_c or with non-scalar parameter
leaves drop to the unfused fold (one-time warning)."""

import numpy as np
import pytest

from rayn_tpu.config import RenderSettings
from rayn_tpu.ops import filters as filter_ops
from rayn_tpu.ops import intersect, sdf
from rayn_tpu.render import film as film_mod
from rayn_tpu.render import renderer
from rayn_tpu.render.camera import PinholeCamera
from rayn_tpu.scene.scene import SceneBuilder

import oracle_renderer


def two_sdf_scene(resolution=(8, 6)):
    """Sky + light + two sphere-SDF instances with DIFFERENT materials —
    inexpressible with one set_sdf program (a union combinator could
    merge the geometry but not split the materials)."""
    b = SceneBuilder()
    sky = b.add_sky(top=(0.3, 0.4, 0.6),
                    bottom=np.asarray((0.2, 0.3, 0.6), np.float32) * 0.05)
    b.add_sphere((0.0, 0.0, 0.0), 100.0, sky)
    red = b.add_lambertian((0.7, 0.2, 0.2))
    blue = b.add_dielectric((0.2, 0.3, 0.8), 0.3)
    i0 = b.add_sdf(sdf.translate(sdf.sphere(0.5), (-0.7, 0.0, 0.0)), red,
                   bound_radius=1.3)
    i1 = b.add_sdf(sdf.translate(sdf.sphere(0.5), (0.7, 0.0, 0.0)), blue,
                   bound_radius=1.3)
    assert (i0, i1) == (0, 1)
    warm = np.asarray((5.0, 4.0, 2.5)) / np.linalg.norm((5.0, 4.0, 2.5))
    b.add_sphere_light((2.0, 2.5, 2.0), 0.4, warm * 30.0)
    camera = PinholeCamera.make(resolution, 60.0, (0.0, 0.6, 3.0),
                                (0.0, 0.0, 0.0), (0.0, 1.0, 0.0))
    data, static = b.build()
    return data, static, camera


def oracle_instances():
    """Independent scalar DEs for the two instances (translated
    spheres)."""
    def mk(cx, r=0.5):
        def dist(p):
            q = p - np.asarray([cx, 0.0, 0.0])
            return float(np.sqrt(np.dot(q, q)) - r)
        return dist
    return [(mk(-0.7), 1), (mk(0.7), 2)]  # material ids red=1, blue=2


def test_builder_and_ids():
    data, static, _cam = two_sdf_scene()
    assert static.has_sdf and len(static.extra_sdfs) == 1
    assert static.sdf_mat == 1 and static.extra_sdfs[0].mat == 2
    assert len(data.extra_sdf_params) == 1
    insts = static.sdf_instances(data)
    assert len(insts) == 2
    assert [m for _p, m, _b in insts] == [1, 2]


def test_closest_hit_picks_instance_and_material():
    import jax.numpy as jnp
    data, static, _cam = two_sdf_scene()
    s = RenderSettings(resolution=(8, 6), rays_per_pass=64)
    # one ray at each SDF sphere, one missing both (hits the sky sphere)
    origin = jnp.asarray([[-0.7, 0.0, 3.0], [0.7, 0.0, 3.0],
                          [0.0, 5.0, 3.0]], jnp.float32)
    direction = jnp.asarray([[0.0, 0.0, -1.0]] * 3, jnp.float32)
    n = origin.shape[0]
    time = jnp.zeros((n,), jnp.float32)
    t_max = jnp.full((n,), 200.0, jnp.float32)
    zeros = jnp.zeros((n,), jnp.float32)
    active = jnp.ones((n,), bool)
    hit = intersect.closest_hit(data, static, s, origin, direction, time,
                                t_max, zeros, zeros + 1e-3, active)
    obj = np.asarray(hit.obj)
    # obj ids: 0 = sky sphere, 1 = first SDF, 2 = second SDF
    assert obj[0] == static.n_spheres
    assert obj[1] == static.n_spheres + 1
    assert obj[2] == 0  # sky sphere
    info = intersect.shading_info(data, static, s, hit, origin, direction,
                                  time, zeros, zeros + 1e-3)
    mat = np.asarray(info.mat)
    assert mat[0] == 1 and mat[1] == 2
    t = np.asarray(hit.t)
    assert abs(t[0] - 2.5) < 1e-2 and abs(t[1] - 2.5) < 1e-2
    # normals point back toward the camera
    nrm = np.asarray(info.normal)
    assert nrm[0, 2] > 0.9 and nrm[1, 2] > 0.9


def test_occlusion_folds_both_instances():
    import jax.numpy as jnp
    data, static, _cam = two_sdf_scene()
    s = RenderSettings(resolution=(8, 6), rays_per_pass=64)
    start = jnp.asarray([[-0.7, 0.0, 3.0], [0.7, 0.0, 3.0],
                         [0.0, 5.0, 3.0]], jnp.float32)
    end = jnp.asarray([[-0.7, 0.0, -3.0], [0.7, 0.0, -3.0],
                       [0.0, 5.0, -3.0]], jnp.float32)
    n = start.shape[0]
    vis = np.asarray(intersect.test_occluded(
        data, static, s, start, end, jnp.zeros((n,), jnp.float32),
        jnp.ones((n,), bool)))
    assert vis[0] == 0.0 and vis[1] == 0.0 and vis[2] == 1.0


def test_multi_sdf_fused_eligible_no_warning(monkeypatch):
    """Multi-instance scenes run the FUSED kernel family (round-4
    verdict: the whole-render 2x fallback cliff is gone — the kernels
    fold closest-hit/occlusion across all instances like the
    reference's HitableStore, src/hitable.rs:163-210). Eligibility must
    hold with no fallback warning. On CPU the gate exits before the
    reason check, so force the interpret path."""
    import warnings

    from rayn_tpu.ops import intersect_pallas, shade_pallas
    data, static, _cam = two_sdf_scene()
    s = RenderSettings(resolution=(8, 6), rays_per_pass=64)
    monkeypatch.setattr(shade_pallas, "INTERPRET", True)
    monkeypatch.setattr(intersect_pallas, "INTERPRET", True)
    shade_pallas._WARNED.clear()
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any fallback warning fails
        assert shade_pallas.fused_ok(s, static, data)
        assert intersect_pallas.fused_intersect_ok(s, static, data)


def test_multi_sdf_fused_matches_unfused(monkeypatch):
    """Two-instance scene through the fused kernels (interpret mode) vs
    the unfused fold: hit objects/materials bit-identical, radiance to
    f32 association tolerance (the same bar as single-instance,
    tests/test_fused_shadows.py)."""
    import dataclasses

    from rayn_tpu.ops import intersect_pallas, shade_pallas
    from test_fused_shadows import _run_bounces

    monkeypatch.setattr(shade_pallas, "INTERPRET", True)
    monkeypatch.setattr(intersect_pallas, "INTERPRET", True)
    n = 256
    res = (16, 16)
    base = RenderSettings(resolution=res, spp=2, max_marches=48,
                          max_vis_marches=32, rays_per_pass=n,
                          use_fused_shadows=False,
                          use_fused_intersect=False)
    data, static, camera = two_sdf_scene(res)

    plain = _run_bounces(base, data, static, camera, n, depths=(0, 1))
    fused = _run_bounces(
        dataclasses.replace(base, use_fused_shadows=True,
                            use_fused_intersect=True),
        data, static, camera, n, depths=(0, 1))
    for d, (a, b) in enumerate(zip(plain, fused)):
        ra, rb = np.asarray(a.radiance), np.asarray(b.radiance)
        close = np.isclose(ra, rb, rtol=2e-4, atol=2e-5)
        frac = 1.0 - close.mean()
        assert frac < 1.5e-2, (
            f"multi-SDF radiance mismatch at depth {d}: {frac:.4f}, "
            f"max |d|={np.abs(ra - rb).max()}")
        np.testing.assert_array_equal(
            np.asarray(a.alive), np.asarray(b.alive),
            err_msg=f"alive differs at depth {d}")


def test_multi_sdf_matches_oracle():
    """Full render of the two-instance scene vs the scalar oracle —
    closest-hit fold order, per-instance materials/normals/offsets and
    the occlusion product fold all gated at once."""
    res = (8, 6)
    settings = RenderSettings(resolution=res, spp=8, max_bounces=2,
                              max_marches=64, max_vis_marches=64,
                              rays_per_pass=1 << 10)
    data, static, cam = two_sdf_scene(res)
    frame = 1
    time_range = (frame / 24.0, frame / 24.0 + 1.0 / 24.0)
    filt = filter_ops.blackman_harris(1.5)
    fis = filter_ops.build_fis_table(filt, settings.filter_table_size)

    film = renderer.render_frame(data, static, settings, cam,
                                 frame=frame, time_range=time_range,
                                 filter=filt)
    got = film_mod.resolve(film, res)
    want = oracle_renderer.render_oracle(
        data, static, settings, cam, frame, time_range, fis,
        extra_oracle_sdfs=oracle_instances())

    def tone(x):
        return np.asarray(x) / (1.0 + np.asarray(x))

    def rmse(a, b):
        return float(np.sqrt(np.mean((np.asarray(a) - np.asarray(b)) ** 2)))

    assert rmse(tone(got.color), tone(want["color"])) < 1e-3
    assert rmse(got.alpha, want["alpha"]) < 1e-3
    assert rmse(tone(got.background), tone(want["background"])) < 1e-3
    assert rmse(got.normal, want["normal"]) < 1e-3
